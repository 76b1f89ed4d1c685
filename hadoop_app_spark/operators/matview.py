"""Incrementally-maintained materialized aggregate views.

The 100 TB problem this solves: a grouped rollup (revenue by supplier,
events by user-day, tokens by source) over an append-mostly fact table
is re-derived by every dashboard refresh and every downstream join.
Recomputing it scans the full history — O(base) per refresh, growing
forever. Maintaining it incrementally costs O(delta) + O(|view|) per
refresh: aggregate the day's delta (one small shuffle), merge it into
the materialized state by key, and touch the base table only for the
few groups whose MIN a retraction actually invalidated.

Mechanics (the classic view-maintenance algebra, e.g. Gupta &
Mumick's delta rules, re-expressed as DataFrame ops):

- COUNT and SUM are self-maintainable under both inserts and deletes:
  merge is ``old + insert_delta - delete_delta`` per key, no base
  access ever.
- MIN is self-maintainable under inserts only (``least(old, new)``).
  A delete can remove the current minimum, so groups where the
  retracted batch's min reaches the merged candidate min are DIRTY:
  they — and only they — are recomputed from the current base via a
  broadcast semi-join on the dirty keys. Cost is O(rows of dirty
  groups), not O(base); with a base bucketed or partitioned by the
  group key the scan prunes to those groups' files.
- A group whose maintained count reaches zero leaves the view; a
  retraction against a group the view never contained (or retracting
  more rows than a group holds) is a LOUD error, not a silent
  negative count — one aggregate scan validates before any write.

The view persists as a BUCKETED table on the group keys, so the merge
join consumes the view side exchange-free (the delta side shuffles,
but it is the small side by construction) and every refresh rewrites
only ~|view| rows — never the base.

Reference parity: the reference's nearest shape is re-running the
whole MaxTemperature-style aggregate job per day; incremental
maintenance is the Spark-first answer to the same recurring rollup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_app_spark.operators.bucketing import _bucket_meta, write_bucketed

#: maintained-measure column names, derived from the spec at build time
_CNT = "mv_count"


def _agg_exprs(sums: dict[str, str], mins: dict[str, str], prefix: str = "") -> list:
    """Aggregate expressions for one side (base / inserts / deletes)."""
    exprs = [F.count(F.lit(1)).alias(f"{prefix}{_CNT}")]
    exprs += [F.sum(c).alias(f"{prefix}{out}") for out, c in sums.items()]
    exprs += [F.min(c).alias(f"{prefix}{out}") for out, c in mins.items()]
    return exprs


def _pin_spec(
    spark: SparkSession,
    table: str,
    keys: Sequence[str],
    sums: dict[str, str],
    mins: dict[str, str],
    applied_epoch: int | None = None,
) -> None:
    """Write the view's spec (and optionally its streaming replay
    ledger) as table properties — the ONE serialization both
    build_agg_view and refresh_agg_view use, in a single ALTER so the
    spec and the ledger can never be pinned separately."""
    props = {
        "matview.keys": ",".join(keys),
        "matview.sums": ",".join(f"{o}:{c}" for o, c in sums.items()),
        "matview.mins": ",".join(f"{o}:{c}" for o, c in mins.items()),
    }
    if applied_epoch is not None:
        props["matview.applied_epoch"] = str(applied_epoch)
    kv = ", ".join(f"'{k}'='{v}'" for k, v in props.items())
    spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ({kv})")


def build_agg_view(
    base: DataFrame,
    table: str,
    keys: Sequence[str],
    sums: dict[str, str],
    mins: dict[str, str] | None = None,
    n_buckets: int = 8,
) -> DataFrame:
    """Materialize ``SELECT keys, count(*), SUM(...), MIN(...) GROUP BY
    keys`` over *base* as bucketed table *table* and return its scan.

    *sums* / *mins* map output column name -> input column. The spec
    is pinned as table properties so a refresh against a view built
    with different measures fails loudly (the dedup-index convention,
    operators/dedup.py table-properties pattern).
    """
    mins = mins or {}
    spark = base.sparkSession
    mv = base.groupBy(*keys).agg(*_agg_exprs(sums, mins))
    write_bucketed(mv, table, list(keys), n_buckets)
    _pin_spec(spark, table, list(keys), sums, mins)
    return spark.table(table)


def _view_spec(
    spark: SparkSession, table: str
) -> tuple[list[str], dict, dict, int | None]:
    rows = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    }
    if "matview.keys" not in rows:
        raise ValueError(f"{table} is not a materialized aggregate view")
    keys = rows["matview.keys"].split(",")
    parse = lambda s: dict(p.split(":") for p in s.split(",") if p)
    epoch = rows.get("matview.applied_epoch")
    return (
        keys,
        parse(rows.get("matview.sums", "")),
        parse(rows.get("matview.mins", "")),
        int(epoch) if epoch is not None else None,
    )


def applied_epoch(spark: SparkSession, table: str) -> int:
    """The last streaming epoch recorded as applied to *table*, or -1
    if none ever was."""
    _, _, _, epoch = _view_spec(spark, table)
    return -1 if epoch is None else epoch


def refresh_agg_view(
    spark: SparkSession,
    table: str,
    inserts: DataFrame | None = None,
    retractions: DataFrame | None = None,
    current_base: DataFrame | None = None,
    epoch: int | None = None,
) -> dict:
    """Merge an insert/retraction delta into view *table* in place.

    *current_base* (the base table AFTER the delta is applied) is
    required only when *retractions* is given AND the view maintains
    MIN columns — it is scanned just for the dirty groups. *epoch*
    (streaming callers) records the batch id in the same ALTER that
    re-pins the spec after the swap, so the replay ledger survives the
    table rewrite; a plain batch refresh carries any existing ledger
    forward untouched. Returns counts: groups touched, dirty groups
    recomputed, groups dropped.
    """
    keys, sums, mins, prev_epoch = _view_spec(spark, table)
    n_buckets, _, _, _ = _bucket_meta(spark, table)
    mv = spark.table(table)

    ins = (
        inserts.groupBy(*keys).agg(*_agg_exprs(sums, mins, "i_"))
        if inserts is not None
        else None
    )
    ret = (
        retractions.groupBy(*keys).agg(*_agg_exprs(sums, mins, "r_"))
        if retractions is not None
        else None
    )

    merged = mv
    if ins is not None:
        merged = merged.join(ins, list(keys), "full_outer")
    if ret is not None:
        # full outer, not left: a retraction keyed to a group the view
        # never contained must surface as a negative count below, not
        # silently drop out of a view-side left join
        merged = merged.join(ret, list(keys), "full_outer")

    def _col(name: str):
        return F.coalesce(F.col(name), F.lit(0)) if name in merged.columns else F.lit(0)

    new_cnt = _col(_CNT) + _col(f"i_{_CNT}") - _col(f"r_{_CNT}")
    proj = [F.col(k) for k in keys] + [new_cnt.alias(_CNT)]
    for out in sums:
        proj.append((_col(out) + _col(f"i_{out}") - _col(f"r_{out}")).alias(out))
    for out in mins:
        cand = [F.col(out)]
        if ins is not None:
            cand.append(F.col(f"i_{out}"))
        # least() ignores NULLs, so a pure-insert group takes i_min and
        # an untouched group keeps its old min
        cand_expr = F.least(*cand) if len(cand) > 1 else cand[0]
        proj.append(cand_expr.alias(out))
        if ret is not None:
            # dirty: the retracted batch's min reaches the candidate —
            # the true min may have left the group. coalesce(False):
            # a NULL comparison (the retracted rows' min column was
            # all-NULL, which F.min ignored, so the group's min cannot
            # have left) must read NOT-dirty — an un-coalesced NULL
            # flag would exclude the group from BOTH the clean and the
            # dirty branch below and silently drop it from the view
            proj.append(
                F.coalesce(
                    F.col(f"r_{_CNT}").isNotNull() & (F.col(f"r_{out}") <= cand_expr),
                    F.lit(False),
                ).alias(f"_dirty_{out}")
            )
    # ONE materialization of the merge (bounded: ~|view| + |delta
    # groups| rows): the validation aggregate, both survivor branches,
    # and the final write all read this snapshot — without it the
    # full-outer-join plan (and the view scan under it) re-executes
    # per consumer, and the final write would read the table it is
    # about to replace (the lazy-plan/mutation hazard)
    merged = merged.select(*proj).localCheckpoint(eager=True)

    # LOUD validation in ONE aggregate scan (the expectations pattern):
    # a negative maintained count means the caller retracted rows the
    # view never aggregated — corrupt inputs, never silently absorbed.
    dirty_flags = [c for c in merged.columns if c.startswith("_dirty_")]
    checks = merged.agg(
        F.sum((F.col(_CNT) < 0).cast("long")).alias("neg"),
        F.sum((F.col(_CNT) == 0).cast("long")).alias("dropped"),
        *[F.sum(F.col(c).cast("long")).alias(c) for c in dirty_flags],
    ).collect()[0]
    if checks["neg"]:
        raise ValueError(
            f"refresh_agg_view({table}): {checks['neg']} group(s) would go "
            "negative — retraction of rows the view never contained"
        )

    dirty_recomputed = 0
    survivors = merged.where(F.col(_CNT) > 0)
    if dirty_flags and any(checks[c] for c in dirty_flags):
        if current_base is None:
            raise ValueError(
                f"refresh_agg_view({table}): retraction touched a group MIN; "
                "pass current_base so dirty groups can be recomputed"
            )
        dirty_cond = F.lit(False)
        for c in dirty_flags:
            dirty_cond = dirty_cond | F.col(c)
        dirty_keys = survivors.where(dirty_cond).select(*keys)
        # broadcast the (few) dirty keys into the base scan; recompute
        # is O(rows of dirty groups), never O(base) — checkpointed so
        # the base scan runs ONCE (the count below and the final write
        # would otherwise each re-run it)
        exact = (
            current_base.join(F.broadcast(dirty_keys), list(keys), "left_semi")
            .groupBy(*keys)
            .agg(*_agg_exprs(sums, mins))
            .localCheckpoint(eager=True)
        )
        dirty_recomputed = exact.count()
        clean = survivors.where(~dirty_cond).drop(*dirty_flags)
        survivors = clean.unionByName(exact)
    elif dirty_flags:
        survivors = survivors.drop(*dirty_flags)

    # every input to the write is checkpointed, so overwriting the
    # table the merge originally read is safe
    write_bucketed(survivors, table, list(keys), n_buckets)
    # ONE ALTER re-pins spec + replay ledger together: the epoch the
    # caller hands in (streaming) or whatever ledger existed before
    # (plain batch refreshes must not wipe the stream's progress)
    _pin_spec(
        spark,
        table,
        keys,
        sums,
        mins,
        applied_epoch=epoch if epoch is not None else prev_epoch,
    )
    return {
        "groups": spark.table(table).count(),
        "dropped": int(checks["dropped"]),
        "dirty_recomputed": int(dirty_recomputed),
    }

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
- MAX is MIN's mirror (``greatest`` on insert; a group is dirty when
  the retracted batch's max reaches the merged candidate max) — so
  the reference's own flagship aggregate, max-per-group
  (MaxTemperatureReducer.java:13-20, SURVEY A1), is incrementally
  maintainable.
- AVG is derived, never stored: it falls out of SUM/COUNT at read
  time (`read_agg_view`), so it needs no maintenance rule at all.
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

import json
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_app_spark.operators.bucketing import _bucket_meta, write_bucketed

#: maintained-measure column names, derived from the spec at build time
_CNT = "mv_count"


def _agg_exprs(
    sums: dict[str, str],
    mins: dict[str, str],
    maxs: dict[str, str] | None = None,
    prefix: str = "",
) -> list:
    """Aggregate expressions for one side (base / inserts / deletes)."""
    exprs = [F.count(F.lit(1)).alias(f"{prefix}{_CNT}")]
    exprs += [F.sum(c).alias(f"{prefix}{out}") for out, c in sums.items()]
    exprs += [F.min(c).alias(f"{prefix}{out}") for out, c in mins.items()]
    exprs += [F.max(c).alias(f"{prefix}{out}") for out, c in (maxs or {}).items()]
    return exprs


def _pin_spec(
    spark: SparkSession,
    table: str,
    keys: Sequence[str],
    sums: dict[str, str],
    mins: dict[str, str],
    maxs: dict[str, str] | None = None,
    applied_epoch: int | None = None,
) -> None:
    """Write the view's spec (and optionally its streaming replay
    ledger) as table properties — the ONE serialization both
    build_agg_view and refresh_agg_view use, in a single ALTER so the
    spec and the ledger can never be pinned separately. The spec is
    ONE JSON value: a key or measure name containing ',' / ':' cannot
    corrupt the round-trip the way a delimited encoding could."""
    props = {
        "matview.spec": json.dumps(
            {"keys": list(keys), "sums": sums, "mins": mins, "maxs": maxs or {}},
            sort_keys=True,
        )
    }
    if applied_epoch is not None:
        props["matview.applied_epoch"] = str(applied_epoch)
    kv = ", ".join(f"'{k}'='{v}'" for k, v in props.items())
    spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ({kv})")


def _reject_null_keys(df: DataFrame, keys: Sequence[str], what: str) -> None:
    """NULL group keys are rejected LOUDLY: the refresh merge joins on
    the keys with SQL equality, under which a NULL-key view group and
    a NULL-key delta group never match — each refresh would append a
    second NULL-key row instead of merging, silently and un-catchably
    (the insert side can't trip the negative-count check)."""
    cond = F.lit(False)
    for k in keys:
        cond = cond | F.col(k).isNull()
    if df.where(cond).limit(1).count():
        raise ValueError(
            f"matview {what}: NULL group-key rows are not maintainable "
            "(SQL join equality never matches NULL keys) — filter or "
            "coalesce them before the view"
        )


def build_agg_view(
    base: DataFrame,
    table: str,
    keys: Sequence[str],
    sums: dict[str, str],
    mins: dict[str, str] | None = None,
    maxs: dict[str, str] | None = None,
    n_buckets: int = 8,
) -> DataFrame:
    """Materialize ``SELECT keys, count(*), SUM(...), MIN(...), MAX(...)
    GROUP BY keys`` over *base* as bucketed table *table* and return
    its scan.

    *sums* / *mins* / *maxs* map output column name -> input column.
    The spec is pinned as table properties so a refresh against a view
    built with different measures fails loudly (the dedup-index
    convention, operators/dedup.py table-properties pattern).
    """
    mins = mins or {}
    maxs = maxs or {}
    spark = base.sparkSession
    # checkpointed (~|view| rows) so the NULL-key validation and the
    # bucketed write read ONE materialization of the aggregate
    mv = base.groupBy(*keys).agg(*_agg_exprs(sums, mins, maxs)).localCheckpoint(
        eager=True
    )
    _reject_null_keys(mv, keys, f"build({table})")
    write_bucketed(mv, table, list(keys), n_buckets)
    _pin_spec(spark, table, list(keys), sums, mins, maxs)
    return spark.table(table)


def _view_spec(
    spark: SparkSession, table: str
) -> tuple[list[str], dict, dict, dict, int | None]:
    rows = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    }
    if "matview.spec" not in rows:
        raise ValueError(f"{table} is not a materialized aggregate view")
    spec = json.loads(rows["matview.spec"])
    epoch = rows.get("matview.applied_epoch")
    return (
        spec["keys"],
        spec["sums"],
        spec["mins"],
        spec.get("maxs", {}),
        int(epoch) if epoch is not None else None,
    )


def applied_epoch(spark: SparkSession, table: str) -> int:
    """The last streaming epoch recorded as applied to *table*, or -1
    if none ever was."""
    *_, epoch = _view_spec(spark, table)
    return -1 if epoch is None else epoch


def read_agg_view(
    spark: SparkSession, table: str, avgs: dict[str, str] | None = None
) -> DataFrame:
    """Scan view *table*, optionally deriving AVG columns at read time:
    *avgs* maps output name -> maintained SUM column, and each average
    is ``sum / mv_count`` — exact inputs, one IEEE division, so AVG
    needs no maintenance rule and no stored state at all."""
    df = spark.table(table)
    for out, sum_col in (avgs or {}).items():
        df = df.withColumn(
            out, F.col(sum_col).cast("double") / F.col(_CNT).cast("double")
        )
    return df


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
    MIN/MAX columns — it is scanned just for the dirty groups. *epoch*
    (streaming callers) records the batch id in the same ALTER that
    re-pins the spec after the swap, so the replay ledger survives the
    table rewrite; a plain batch refresh carries any existing ledger
    forward untouched. Returns counts: groups touched, dirty groups
    recomputed, groups dropped.
    """
    keys, sums, mins, maxs, prev_epoch = _view_spec(spark, table)
    n_buckets, _, _, _ = _bucket_meta(spark, table)
    mv = spark.table(table)
    survivors, checks, dirty_recomputed = _merge_and_resolve(
        mv,
        inserts,
        retractions,
        keys,
        sums,
        mins,
        maxs,
        current_base,
        f"refresh_agg_view({table})",
    )

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
        maxs,
        applied_epoch=epoch if epoch is not None else prev_epoch,
    )
    return {
        "groups": spark.table(table).count(),
        "dropped": int(checks["dropped"]),
        "dirty_recomputed": int(dirty_recomputed),
    }


def _merge_and_resolve(
    mv: DataFrame,
    inserts: DataFrame | None,
    retractions: DataFrame | None,
    keys: Sequence[str],
    sums: dict[str, str],
    mins: dict[str, str],
    maxs: dict[str, str],
    current_base: DataFrame | None,
    what: str,
) -> tuple[DataFrame, object, int]:
    """The view-maintenance merge core shared by `refresh_agg_view`
    (full-view overwrite path) and `matview_changes` (touched-groups
    transactional path): full-outer-merge the delta aggregates into
    *mv*, validate loudly, recompute MIN/MAX-dirty groups from
    *current_base*. Returns (survivor rows, the validation checks row,
    dirty-group count)."""
    ins = (
        inserts.groupBy(*keys).agg(*_agg_exprs(sums, mins, maxs, "i_"))
        if inserts is not None
        else None
    )
    ret = (
        retractions.groupBy(*keys).agg(*_agg_exprs(sums, mins, maxs, "r_"))
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
    # MIN and MAX are mirror rules: combine old+insert extremes with
    # least/greatest (both NULL-ignoring, so a pure-insert group takes
    # the insert extreme and an untouched group keeps its old one); a
    # retraction dirties a group when the retracted batch's extreme
    # REACHES the merged candidate (<= for MIN, >= for MAX) — the true
    # extreme may have left the group.
    for out, combine, reaches in [
        *[(o, F.least, "leq") for o in mins],
        *[(o, F.greatest, "geq") for o in maxs],
    ]:
        cand = [F.col(out)]
        if ins is not None:
            cand.append(F.col(f"i_{out}"))
        cand_expr = combine(*cand) if len(cand) > 1 else cand[0]
        proj.append(cand_expr.alias(out))
        if ret is not None:
            # coalesce(False): a NULL comparison (the retracted rows'
            # extreme column was all-NULL, which min/max ignored, so
            # the group's extreme cannot have left) must read
            # NOT-dirty — an un-coalesced NULL flag would exclude the
            # group from BOTH the clean and the dirty branch below and
            # silently drop it from the view
            r_reaches = (
                F.col(f"r_{out}") <= cand_expr
                if reaches == "leq"
                else F.col(f"r_{out}") >= cand_expr
            )
            proj.append(
                F.coalesce(
                    F.col(f"r_{_CNT}").isNotNull() & r_reaches,
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
    null_key = F.lit(False)
    for k in keys:
        null_key = null_key | F.col(k).isNull()
    checks = merged.agg(
        F.sum((F.col(_CNT) < 0).cast("long")).alias("neg"),
        F.sum((F.col(_CNT) == 0).cast("long")).alias("dropped"),
        F.sum(null_key.cast("long")).alias("null_key"),
        *[F.sum(F.col(c).cast("long")).alias(c) for c in dirty_flags],
    ).collect()[0]
    if checks["null_key"]:
        # build rejected NULL keys, so any here rode in on a delta:
        # under SQL join equality they can never merge with the view
        raise ValueError(
            f"{what}: {checks['null_key']} NULL "
            "group-key row(s) in the delta — filter or coalesce them "
            "before the refresh"
        )
    if checks["neg"]:
        raise ValueError(
            f"{what}: {checks['neg']} group(s) would go "
            "negative — retraction of rows the view never contained"
        )

    dirty_recomputed = 0
    survivors = merged.where(F.col(_CNT) > 0)
    if dirty_flags and any(checks[c] for c in dirty_flags):
        if current_base is None:
            raise ValueError(
                f"{what}: retraction touched a group "
                "MIN/MAX; pass current_base so dirty groups can be recomputed"
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
            .agg(*_agg_exprs(sums, mins, maxs))
            .localCheckpoint(eager=True)
        )
        dirty_recomputed = exact.count()
        clean = survivors.where(~dirty_cond).drop(*dirty_flags)
        survivors = clean.unionByName(exact)
    elif dirty_flags:
        survivors = survivors.drop(*dirty_flags)
    return survivors, checks, dirty_recomputed


def matview_changes(
    view: DataFrame,
    keys: Sequence[str],
    sums: dict[str, str],
    mins: dict[str, str] | None = None,
    maxs: dict[str, str] | None = None,
    inserts: DataFrame | None = None,
    retractions: DataFrame | None = None,
    current_base: DataFrame | None = None,
    epoch: int = 0,
    op_col: str = "op",
    epoch_col: str = "mv_epoch",
) -> DataFrame:
    """The transactional-target face of the refresh: compute the
    op-tagged CHANGE rows a delta implies for an aggregate view, for a
    keyed MERGE (`streaming/cdc.py` DeltaMergeTarget/IcebergMergeTarget
    or any ``apply(batch, batch_id)`` target) to fold in atomically.

    Where `refresh_agg_view` rewrites the whole bucketed view
    (overwrite-then-pin — a crash between the two loses the replay
    ledger), this path touches ONLY the groups the delta reaches:
    *view* is restricted to the delta's keys by a broadcast semi-join
    before the merge arithmetic, so the output is O(delta groups) and
    the MERGE's file pruning keeps the write O(changed files). Each
    surviving changed group comes back as an upsert row ('U' in
    *op_col*) carrying *epoch* in *epoch_col*; fully-retracted groups
    come back as delete rows ('D', measures NULL). Because the epoch
    rides IN the merged rows, the data and the replay ledger commit in
    ONE transaction — ``max(mv_epoch)`` over the target is the applied
    epoch, closing the overwrite-then-pin crash window (the one resid-
    ual: a batch that ONLY deletes leaves no epoch-carrying row, so
    the ledger alone cannot skip its crash-replay; the streaming sink
    detects that exact signature — delete-only batch, no retraction
    key present in the view — and skips it, matching MERGE's own
    idempotent-delete semantics, see `streaming/ingest.
    matview_refresh_stream`).

    Same validation and MIN/MAX dirty-group rules as
    `refresh_agg_view`; *current_base* is needed only when a
    retraction dirties an extreme.
    """
    mins, maxs = mins or {}, maxs or {}
    parts = [
        d.select(*keys).distinct()
        for d in (inserts, retractions)
        if d is not None
    ]
    if not parts:
        raise ValueError("matview_changes: no delta given")
    delta_keys = parts[0] if len(parts) == 1 else parts[0].union(parts[1]).distinct()
    touched = view.join(F.broadcast(delta_keys), list(keys), "left_semi")
    survivors, checks, _ = _merge_and_resolve(
        touched,
        inserts,
        retractions,
        keys,
        sums,
        mins,
        maxs,
        current_base,
        "matview_changes",
    )
    measure_cols = [_CNT, *sums, *mins, *maxs]
    ups = survivors.select(
        *keys,
        *[F.col(c) for c in measure_cols],
        F.lit(epoch).cast("long").alias(epoch_col),
        F.lit("U").alias(op_col),
    )
    types = dict(ups.dtypes)
    dels = delta_keys.join(survivors.select(*keys), list(keys), "left_anti").select(
        *keys,
        *[F.lit(None).cast(types[c]).alias(c) for c in measure_cols],
        F.lit(epoch).cast("long").alias(epoch_col),
        F.lit("D").alias(op_col),
    )
    return ups.unionByName(dels)

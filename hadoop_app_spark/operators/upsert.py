"""Batch upsert / CDC-apply — the Spark-first answer to keyed CRUD.

The reference carries an HBase stub (``CURDSample.java:6-13``, creates a
config and does nothing) — its only gesture at keyed create/update/
delete. On Spark the idiomatic equivalent is not a row store but a
snapshot refresh: apply a (much smaller) change batch to an immutable
snapshot and write the next snapshot — the daily pattern of every
dimension table and feature store.

Scale shape (100 TB snapshot, ~GB change batch):
- The snapshot NEVER shuffles: untouched rows are found with a
  LEFT ANTI join against the change keys, which Spark executes as a
  broadcast hash anti-join when the change batch fits (hinted via
  ``broadcast_changes``); surviving change rows are unioned on top.
- Tombstones (``op_col == delete_value``) drop the key entirely;
  any non-delete change row replaces the full row for its key
  (insert-or-replace semantics — "last writer wins" within a batch is
  the caller's contract, as in any CDC compactor).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str | None = None,
    delete_value: str = "D",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Insert-or-replace ``changes`` into ``snapshot`` by ``keys``;
    rows with ``op_col == delete_value`` are tombstones.

    Returns the next snapshot with the same schema as ``snapshot``.
    """
    keys = list(keys)
    data_cols = [c for c in snapshot.columns]
    if op_col is None:
        live = changes.select(*data_cols)
        touched = changes.select(*keys)
    else:
        # null-safe: a change row with op=NULL (insert events that only
        # stamp op on deletes) is an upsert — a bare != would drop it
        # from live while its key still anti-joins the snapshot away,
        # silently deleting the key
        live = changes.where(~F.col(op_col).eqNullSafe(delete_value)).select(*data_cols)
        touched = changes.select(*keys)
    touched = touched.distinct()
    if broadcast_changes:
        touched = F.broadcast(touched)
    untouched = snapshot.join(touched, keys, "left_anti")
    return untouched.unionByName(live)


def scd2_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    ts_col: str = "ts",
    seq_col: str | None = None,
    op_col: str | None = None,
    delete_value: str = "D",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 maintenance: apply a change
    batch to a versioned snapshot, closing superseded versions instead
    of overwriting them (the history-preserving sibling of
    :func:`apply_changes`).

    ``snapshot`` is the current SCD2 table: ``keys + attrs + [from_col,
    to_col]`` with ``to_col IS NULL`` marking each key's OPEN version.
    ``changes`` carries ``keys + attrs + [ts_col]`` (plus optional
    ``seq_col`` tie-break and ``op_col`` tombstones). Contract: change
    timestamps are >= the open version's ``from_col`` for their key
    (late data behind a CLOSED version would rewrite history — reject
    upstream, the standard SCD2 loader rule).

    Shape: closed history passes through UNTOUCHED (in a lakehouse
    layout it is partition-pruned by ``to_col IS NOT NULL`` and never
    even read); each key's open version is unioned with its changes
    and ONE window (partitioned by key, ordered by ts/seq) assigns
    every version's close stamp via lead() — deletes contribute a
    close boundary but emit no row. One shuffle on the key, work
    proportional to |open| + |changes|, never |history|.
    """
    keys, attrs = list(keys), list(attrs)
    cols = keys + attrs
    hist = snapshot.where(F.col(to_col).isNotNull())
    open_ = snapshot.where(F.col(to_col).isNull())

    seq = F.col(seq_col) if seq_col else F.lit(0)
    is_del = (
        F.col(op_col).eqNullSafe(delete_value) if op_col else F.lit(False)
    )
    ev_open = open_.select(
        *cols,
        F.col(from_col).alias("_ts"),
        # the open version sorts BEFORE any same-timestamp change
        F.lit(None).cast("long").alias("_seq"),
        F.lit(False).alias("_del"),
    )
    ev_chg = changes.select(
        *cols,
        F.col(ts_col).alias("_ts"),
        seq.cast("long").alias("_seq"),
        is_del.alias("_del"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(
        F.col("_ts"), F.col("_seq").asc_nulls_first()
    )
    versions = (
        ev_open.unionByName(ev_chg)
        .withColumn("_next", F.lead("_ts").over(w))
        .where(~F.col("_del"))
        .select(
            *cols,
            F.col("_ts").alias(from_col),
            F.col("_next").alias(to_col),
        )
    )
    return hist.unionByName(versions)


def column_change_profile(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Column-level change accounting between two snapshot versions —
    the per-COLUMN companion to the row-level corpus_diff: one row per
    compared column, ``[column_name, n_added, n_removed, n_common,
    n_changed]``, where n_changed counts keys present in BOTH versions
    whose value for that column differs (NULL-safe: NULL->value and
    value->NULL count as changes, NULL->NULL does not).

    The release dashboard a continuously refreshed corpus or dimension
    publishes with every version: "this crawl touched 2% of documents,
    and 98% of those changes were in the `text` column, none in
    `license`" — churn becomes actionable when attributed to columns.

    Scale shape: ONE full-outer join on the key (the only corpus-sized
    shuffle) feeding ONE wide aggregate with map-side combine — every
    per-column change count is a sum over the same joined pass, so
    adding columns adds expressions, not scans; the melt to rows runs
    over a single driver-sized row."""
    compare = list(
        compare_cols
        if compare_cols is not None
        else [c for c in old.columns if c not in key_cols and c in new.columns]
    )
    keys = list(key_cols)
    o = old.select(
        *keys, *[F.col(c).alias(f"_o_{c}") for c in compare], F.lit(1).alias("_o")
    )
    n = new.select(
        *keys, *[F.col(c).alias(f"_n_{c}") for c in compare], F.lit(1).alias("_n")
    )
    j = o.join(n, keys, "full_outer")
    both = F.col("_o").isNotNull() & F.col("_n").isNotNull()
    aggs = [
        F.sum(F.col("_o").isNull().cast("long")).alias("n_added"),
        F.sum(F.col("_n").isNull().cast("long")).alias("n_removed"),
        F.sum(both.cast("long")).alias("n_common"),
    ]
    for c in compare:
        aggs.append(
            F.sum(
                (both & ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))).cast("long")
            ).alias(f"_chg_{c}")
        )
    row = j.agg(*aggs)
    stack = ", ".join(f"'{c}', _chg_{c}" for c in compare)
    return row.selectExpr(
        f"stack({len(compare)}, {stack}) AS (column_name, n_changed)",
        "n_added",
        "n_removed",
        "n_common",
    ).select("column_name", "n_added", "n_removed", "n_common", "n_changed")

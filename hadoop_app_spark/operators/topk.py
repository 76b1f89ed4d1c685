"""Top-K per group with deterministic tie-breaking.

Generalizes the reference's TreeSet+counter pattern
(UserHotcar.java:152-192, UserNewcar.java:151-189 — SURVEY §2.5 T1/T2).
The reference's comparator never returns 0, so tie order is
shuffle-dependent; we always add a deterministic tiebreak column
(SURVEY §1.3.6 decision).

Scale: row_number over Window.partitionBy(keys) is a single hash
Exchange on the group keys; no group ever materializes more than one
partition's rows at a time. For GLOBAL top-k use ``global_top_k``
(orderBy+limit -> TakeOrderedAndProject: per-partition heaps + driver
merge of k*partitions rows, never a full sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column | str],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """T1/T2 deterministic per-group top-k via a keyed row_number window."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)


def global_top_k(df: DataFrame, order_cols: Sequence[Column | str], k: int) -> DataFrame:
    """Global top-k: orderBy+limit -> TakeOrderedAndProject (per-partition
    heaps + driver merge of k*partitions rows, never a full sort)."""
    return df.orderBy(*order_cols).limit(k)

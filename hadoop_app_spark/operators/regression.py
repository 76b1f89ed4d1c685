"""Grouped closed-form linear regression — the ML-lite analytics shape.

Spark MLlib fits one global model per job; a corpus/telemetry pipeline
wants a tiny model PER GROUP (trend per event type, drift per source,
rate per tenant) without |groups| driver round-trips. For simple OLS
the sufficient statistics are five sums — so the whole fit is ONE
partial-combine hash aggregation, the same plan class as max_per_group,
and the model math is a scalar epilogue on the aggregate row.

Determinism contract (the differential-gate requirement): the five
sums accumulate in DECIMAL (exact, associative — partition order can
never change them); slope/intercept are then a single double
expression over the exact sums, so both engines compute bit-identical
results. x is centered on a caller-supplied epoch so x*x stays inside
exact-integer range (|x| < 3e9 -> x^2 < 9.2e18 fits a long exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def linear_fit(
    df: DataFrame,
    x_col,
    y_col,
    group_cols: list[str],
) -> DataFrame:
    """Per-group OLS y ~ a + b*x -> [*group_cols, n, slope, intercept].

    ``x_col`` must be an integral column (seconds, counts — caller
    centers it; see module docstring), ``y_col`` numeric. Rows with a
    NULL x or y are excluded. Groups whose x has no variance emit
    NULL slope/intercept rather than a division error (ANSI mode).

    Scale shape: one partial-combine aggregation; the shuffle carries
    five decimals per group per map partition regardless of row count.
    """
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    base = df.where(x.isNotNull() & y.isNotNull()).select(
        *group_cols, x.cast("long").alias("_x"), y.cast("double").alias("_y")
    )
    agg = base.groupBy(*group_cols).agg(
        F.count("*").alias("n"),
        F.sum(F.col("_x").cast("decimal(38,0)")).alias("_sx"),
        F.sum(F.col("_y").cast("decimal(18,6)")).alias("_sy"),
        F.sum((F.col("_x") * F.col("_x")).cast("decimal(38,0)")).alias("_sxx"),
        F.sum((F.col("_x") * F.col("_y")).cast("decimal(27,6)")).alias("_sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    sxy = F.col("_sxy").cast("double")
    den = n * sxx - sx * sx
    slope = F.when(den != 0, (n * sxy - sx * sy) / den)
    return agg.select(
        *group_cols,
        "n",
        slope.alias("slope"),
        F.when(den != 0, (sy - slope * sx) / n).alias("intercept"),
    )

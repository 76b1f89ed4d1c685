"""Key-skew diagnostics — the measurement that decides between a
plain shuffle, a broadcast, AQE skew-join splitting, or salting
(`operators/joins.salted_join`) BEFORE a 100 TB job burns a day
discovering its hot key the slow way.

One (key)-grouped count is the only corpus-sized work; everything
after runs over the per-key count distribution (|keys| rows): exact
type-1 quantiles of the per-key counts via the repo's bounded 2-pass
order-statistic extraction (`operators/windows.grouped_percentile_disc`
— range-repartition + partition-local windows, NO unpartitioned
window anywhere), the heaviest key's share, and the top-k
concentration. All shares are integer-exact milli-units (integer
div), so the profile is value-reproducible in any engine.

Reading the numbers: max_share_milli >= ~1000/parallelism means one
task owns that key's partition no matter how many executors exist
(salt or AQE-split); topk_share_milli near 1000 over many keys means
broadcasting the hot slice beats a full shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    value_col: str,
    lo: float = 0.0625,
    hi: float = 0.9375,
    out_col: str | None = None,
) -> tuple[DataFrame, dict]:
    """Clamp ``value_col`` at its exact type-1 ``lo``/``hi`` percentiles
    — robust feature preparation (outlier taming before quality scoring
    / normalization) built on the same bounded 2-pass order-statistic
    extraction every percentile in this engine uses
    (`operators/windows.grouped_percentile_disc`): range-repartition +
    partition-local windows, never a single-task value buffer.

    The default tails are 1/16 (0.0625) and 15/16 (0.9375) —
    EXACT binary fractions, so the extraction's float rank
    ``ceil(p * n)`` equals the oracle's integer rank arithmetic
    ``(n + 15) div 16`` / ``(15n + 15) div 16`` at ANY n (an inexact
    p like 0.05 can land the float product on the wrong side of an
    integer for adversarial n). Callers picking other tails should
    prefer binary fractions for the same reason.

    Returns ``(frame with out_col appended, {"lo": v, "hi": v})`` —
    the clamp bounds are two scalars (the documented bounded collect),
    and the clamp itself is one narrow codegen map."""
    from hadoop_app_spark.operators.windows import grouped_percentile_disc

    qs = grouped_percentile_disc(
        df.select(value_col).withColumn("_g", F.lit(1)), ["_g"], value_col, [lo, hi]
    ).get((1,), {})
    if not qs:
        raise ValueError(
            f"winsorize({value_col}): empty input — no percentiles to clamp on"
        )
    lo_v, hi_v = qs[lo], qs[hi]
    out_col = out_col or f"{value_col}_wins"
    return (
        df.withColumn(
            out_col, F.least(F.greatest(F.col(value_col), F.lit(lo_v)), F.lit(hi_v))
        ),
        {"lo": lo_v, "hi": hi_v},
    )


def robust_scale(
    df: DataFrame,
    value_col: str,
    out_col: str | None = None,
) -> tuple[DataFrame, dict]:
    """Median/IQR standardization — `winsorize`'s scaling sibling and
    the robust alternative to mean/stddev z-scores (a handful of
    outliers move a mean arbitrarily; they barely move the quartiles):
    ``scaled = (v - median) / (q3 - q1)`` with all three cut points
    exact type-1 order statistics from the bounded 2-pass extraction.

    Quartile probabilities 1/4, 1/2, 3/4 are EXACT binary fractions
    (the `winsorize` rank argument), the cuts are SELECTED values, and
    the scaling is one subtraction + one correctly-rounded IEEE
    division per row — bit-identical in any engine, which is what lets
    the registry oracle value-hash the scaled doubles. Degenerate
    distributions (IQR 0) raise rather than divide by zero.

    Returns ``(frame with out_col appended, {"q1":v,"med":v,"q3":v})``.
    """
    from hadoop_app_spark.operators.windows import grouped_percentile_disc

    qs = grouped_percentile_disc(
        df.select(value_col).withColumn("_g", F.lit(1)),
        ["_g"], value_col, [0.25, 0.5, 0.75],
    ).get((1,), {})
    if not qs:
        raise ValueError(
            f"robust_scale({value_col}): empty input — no quartiles to scale on"
        )
    q1, med, q3 = qs[0.25], qs[0.5], qs[0.75]
    if q3 == q1:
        raise ValueError(
            f"robust_scale({value_col}): IQR is 0 (q1 == q3 == {q1}) — a "
            "degenerate distribution has no robust scale; winsorize or "
            "filter first"
        )
    out_col = out_col or f"{value_col}_scaled"
    return (
        df.withColumn(
            out_col,
            (F.col(value_col) - F.lit(med)).cast("double")
            / F.lit(float(q3 - q1)),
        ),
        {"q1": q1, "med": med, "q3": q3},
    )


def key_skew_profile(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """One-row skew profile of ``key_col``: [n_rows, n_keys, max_rows,
    max_share_milli, topk_share_milli, p50_rows, p90_rows, p99_rows].
    """
    from hadoop_app_spark.operators.windows import grouped_percentile_disc

    counts = df.groupBy(key_col).agg(F.count("*").alias("c")).persist()
    try:
        # exact percentile_disc over the per-key counts: the bounded
        # 2-pass extraction — never an unpartitioned window, never a
        # single-task buffer of all counts
        qs = grouped_percentile_disc(
            counts.withColumn("_g", F.lit(1)), ["_g"], "c", [0.5, 0.9, 0.99]
        ).get((1,), {})

        totals = counts.agg(
            F.sum("c").alias("n_rows"),
            F.count("*").alias("n_keys"),
            F.max("c").alias("max_rows"),
        )
        topk = (
            counts.orderBy(F.col("c").desc(), F.col(key_col))
            .limit(top_k)
            .agg(F.sum("c").alias("topk_rows"))
        )
        return (
            totals.crossJoin(F.broadcast(topk))
            .select(
                "n_rows",
                "n_keys",
                "max_rows",
                F.expr("(max_rows * 1000) div n_rows").alias("max_share_milli"),
                F.expr("(topk_rows * 1000) div n_rows").alias("topk_share_milli"),
                F.lit(qs.get(0.5)).cast("long").alias("p50_rows"),
                F.lit(qs.get(0.9)).cast("long").alias("p90_rows"),
                F.lit(qs.get(0.99)).cast("long").alias("p99_rows"),
            )
            # the percentile literals are already computed; materialize
            # the one-row result before unpersisting the counts
            .localCheckpoint(eager=True)
        )
    finally:
        counts.unpersist()

"""Time-series completion over an event stream: dense per-key time
spines with gap-fill — the preprocessing step between raw events and
any per-period model (trend fits, anomaly baselines, retention grids),
where missing periods must become EXPLICIT rows (zero counts, carried
readings), not silently absent ones.

Beyond-reference surface (north star event-analytics family, next to
funnel/cohort/sessionize). The Spark shape:

- per-(key, bucket) observation aggregate: ONE groupBy with map-side
  partial combine (counts, and the LAST reading by (ts, id) — a
  deterministic struct-max, no window over raw events);
- the spine is keys x buckets, built by exploding ONE generated
  sequence against the distinct keys — its size is the GRID
  (|keys| * |buckets|), bounded by the calendar, never by event
  volume;
- gap rows appear via a left join on the spine (the observation side
  shuffles by (key, bucket) exactly once);
- carry-forward (LOCF) is a per-key ordered window over the DENSE
  spine — partitioned by key, so no unpartitioned WindowExec at any
  scale; the carried value is SELECTED, never recomputed, so floats
  pass through bit-identical in any engine.

At 100 TB the event scan dominates and happens once; everything after
operates on the grid. A 10-year daily spine over 100M keys is 365B
rows — if that is the real workload, bucket keys into cohorts or
widen the grain; the operator takes any (key, bucket) granularity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gapfill_locf(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    id_col: str,
    out_count: str = "n_events",
    out_value: str = "locf_value",
) -> DataFrame:
    """Dense per-key DAILY spine over the corpus' observed date range,
    with per-day event counts (0 on gap days) and the last observed
    reading carried forward (NULL until a key's first observation).

    The last reading per (key, day) is the ``value_col`` of the row
    with the greatest ``(ts, id)`` — the deterministic tiebreak the
    registry oracle replays exactly. ``ts_col`` must be naive
    (TIMESTAMP_NTZ, the parquet reader's type here): day extraction is
    then session-timezone-independent in every engine.
    """
    keys = list(key_cols)
    joined = _daily_spine(df, ts_col, keys, value_col, id_col, out_count)
    w = (
        Window.partitionBy(*keys)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *keys,
        "day",
        out_count,
        F.last("_lastv", ignorenulls=True).over(w).alias(out_value),
    )


def _daily_spine(
    df: DataFrame,
    ts_col: str,
    keys: list,
    value_col: str,
    id_col: str,
    out_count: str,
) -> DataFrame:
    """Shared spine construction: (keys..., day, out_count, _lastv) —
    one grid row per key per day of the global observed range, counts
    zero-filled, the day's last reading by (ts, id) struct-max."""
    day = F.to_date(F.col(ts_col)).alias("day")
    obs = (
        df.select(*keys, day, ts_col, id_col, value_col)
        .groupBy(*keys, "day")
        .agg(
            F.count("*").alias(out_count),
            F.max(F.struct(ts_col, id_col, F.col(value_col).alias("_v")))
            .getField("_v")
            .alias("_lastv"),
        )
    )
    bounds = df.select(
        F.min(F.to_date(ts_col)).alias("_mind"), F.max(F.to_date(ts_col)).alias("_maxd")
    )
    spine = (
        df.select(*keys)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            *keys,
            F.explode(F.sequence("_mind", "_maxd")).alias("day"),
        )
    )
    return spine.join(obs, keys + ["day"], "left_outer").select(
        *keys,
        "day",
        F.coalesce(F.col(out_count), F.lit(0)).cast("long").alias(out_count),
        "_lastv",
    )


def downsample_ohlc(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    id_col: str,
    unit: str = "week",
) -> DataFrame:
    """Downsample an event series to per-(key, bucket) OHLC candles —
    the storage/grain-reduction member of the time-series family
    (gapfill densifies; this coarsens): for each key and ``unit``
    bucket, [bucket, n_events, v_open, v_high, v_low, v_close, v_sum].

    open/close are the readings of the bucket's FIRST/LAST row by the
    deterministic ``(ts, id)`` struct-min/max (the gapfill convention —
    SELECTED values, never recomputed, so floats pass through
    bit-identical in any engine); high/low/sum are plain min/max/sum.
    ``ts_col`` must be naive (TIMESTAMP_NTZ): date_trunc is then
    session-timezone-independent, and both Spark and DuckDB truncate
    weeks to Monday.

    Scale shape: ONE groupBy with full map-side partial combine (every
    measure including open/close is an ordinary min/max aggregate over
    structs) — no window over raw events, no second scan; output is
    |keys| x |buckets|, the reduced grain. At 100 TB this is the
    retention-policy rewrite: raw events age out, candles stay."""
    keys = list(key_cols)
    bucket = F.to_date(F.date_trunc(unit, F.col(ts_col))).alias("bucket")
    v = F.col(value_col)
    first_s = F.min(F.struct(ts_col, id_col, v.alias("_v")))
    last_s = F.max(F.struct(ts_col, id_col, v.alias("_v")))
    return (
        df.select(*keys, bucket, ts_col, id_col, value_col)
        .groupBy(*keys, "bucket")
        .agg(
            F.count("*").alias("n_events"),
            first_s.getField("_v").alias("v_open"),
            F.max(v).alias("v_high"),
            F.min(v).alias("v_low"),
            last_s.getField("_v").alias("v_close"),
            # decimal accumulation: a plain double sum is order-
            # dependent (partitioning-sensitive, engine-divergent);
            # decimal sums are exact and order-free, read back to
            # double once (the engine's exact-double-sum convention)
            F.sum(v.cast("decimal(18,6)")).cast("double").alias("v_sum"),
        )
    )


def gapfill_interpolate(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    id_col: str,
    out_count: str = "n_events",
    out_value: str = "lin_value",
) -> DataFrame:
    """:func:`gapfill_locf`'s linear sibling: gap days take the
    straight line between the surrounding observations,
    ``prev + (next - prev) * (d_prev / (d_prev + d_next))``; days
    before a key's first (after its last) observation take the nearest
    one. Observed days reproduce their own reading exactly (the
    interpolation fraction is 0 there).

    Determinism: the carried endpoints are SELECTED readings (the
    (ts, id) struct-max, never recomputed), and the interpolation is
    one fixed-shape IEEE expression over them and integer day
    distances — so the filled values are bit-identical in any engine,
    and the registry oracle replays them exactly. Same per-key carry
    windows as LOCF (one forward, one backward pass over the dense
    spine), same grid-bounded cost."""
    keys = list(key_cols)
    joined = _daily_spine(df, ts_col, keys, value_col, id_col, out_count)
    # endpoint structs are NULL on gap days so ignorenulls carries the
    # nearest OBSERVED (day, value) pair in each direction
    point = F.when(
        F.col("_lastv").isNotNull(), F.struct(F.col("day").alias("d"), F.col("_lastv").alias("v"))
    )
    back = (
        Window.partitionBy(*keys)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(*keys)
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t = joined.select(
        *keys,
        "day",
        out_count,
        F.last(point, ignorenulls=True).over(back).alias("_p"),
        F.first(point, ignorenulls=True).over(fwd).alias("_n"),
    )
    p, n = F.col("_p"), F.col("_n")
    lin = (
        F.when(
            p.isNotNull() & n.isNotNull() & (n["d"] != p["d"]),
            p["v"]
            + (n["v"] - p["v"])
            * (
                F.datediff(F.col("day"), p["d"]).cast("double")
                / F.datediff(n["d"], p["d"]).cast("double")
            ),
        )
        .when(p.isNotNull(), p["v"])
        .otherwise(n["v"])
    )
    return t.select(*keys, "day", out_count, lin.alias(out_value))

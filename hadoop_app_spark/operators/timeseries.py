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
    joined = spine.join(obs, keys + ["day"], "left_outer").select(
        *keys,
        "day",
        F.coalesce(F.col(out_count), F.lit(0)).cast("long").alias(out_count),
        "_lastv",
    )
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

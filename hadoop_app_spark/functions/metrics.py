"""Job counters / data-quality metrics via ``df.observe`` (SURVEY §2 A4).

The reference increments MapReduce counters as rows flow through the
mappers — ``USER_COUNT``/``HOTCAR_COUNT`` (UserHotcar.java:35,97-98)
and six declared data-quality counters (UserNewcar.java:36). The
Spark-native equivalent is ``df.observe(Observation, *aggs)``: metric
expressions accumulate on executors during whatever action consumes
the plan — no extra job, no second scan — and are read on the driver
afterwards via ``Observation.get``. Unlike accumulators, observed
metrics are exactly-once under task retries and speculative execution,
which is what a 1000-executor job needs from its row counters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observe_counts(
    df: DataFrame, name: str | None = None, **conditions: Column
) -> tuple[DataFrame, Observation]:
    """Attach row counters at this point of the plan.

    Returns ``(df, observation)`` where the observation records
    ``rows`` = rows flowing through, plus one conditional count per
    named predicate (e.g. ``malformed=F.size('_p') < 2``). Read after
    an action: ``obs.get["rows"]``. ``name`` is for listener display;
    omit it to auto-generate a unique one (two same-named observations
    in one query would collide).
    """
    obs = Observation(name) if name else Observation()
    aggs = [F.count(F.lit(1)).alias("rows")]
    for key, cond in conditions.items():
        aggs.append(F.count(F.when(cond, 1)).alias(key))
    return df.observe(obs, *aggs), obs

"""Custom stateful streaming operators via applyInPandasWithState.

Built-in windows/dedup cover most state shapes; this module is the
extension point for semantics they can't express — here, a per-user
running profile (event count, running value sum, last-seen ts, and a
cumulative anomaly counter for value spikes vs the user's own running
mean). The reference's nearest concept is the per-group buffering
reducer (UserHotcar.java:146-200), which is stateless across runs;
this is its streaming generalization with explicit state + timeout.

Scale: state is partitioned by user_id across the cluster's state
stores; each micro-batch touches only the groups present in the batch.
GroupStateTimeout.ProcessingTimeTimeout evicts idle users, bounding
state size.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROFILE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("n_anomalies", T.LongType()),
    ]
)

PROFILE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("n_anomalies", T.LongType()),
    ]
)


def _make_update_profile(evict: bool):
    def _update_profile(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # idle-eviction path: the 1h processing-time timer fired with no
            # new data for this user — drop the state, emit nothing, and do
            # NOT re-arm (re-arming would keep dead users resident forever)
            state.remove()
            return
        if state.exists:
            n, s, anom = state.get
        else:
            n, s, anom = 0, 0.0, 0
        # A group larger than arrow.maxRecordsPerBatch arrives as SEVERAL
        # chunks in arbitrary post-shuffle order — concatenate first, then
        # sort, so the running profile sees one deterministic (ts,
        # event_id) order per micro-batch (per-chunk sorting alone is
        # order-dependent across the chunk boundary). Memory is bounded
        # by one user's events per micro-batch.
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["ts", "event_id"])
            v = pdf["value"].to_numpy(dtype=np.float64)
            if v.size:
                # vectorized running profile: counts/sums BEFORE each row via
                # a cumsum seeded with the carried state — np.cumsum adds
                # left-to-right, so every partial sum (and the final one) is
                # bit-identical to the per-row loop it replaces
                run = np.cumsum(np.concatenate(([s], v)))
                ns = n + np.arange(v.size)
                ss = run[:-1]
                means = np.divide(ss, ns, out=np.zeros_like(ss), where=ns > 0)
                anom += int(((ns >= 3) & (v > 3.0 * np.maximum(means, 1e-9))).sum())
                n += int(v.size)
                s = float(run[-1])
        state.update((n, s, anom))
        if evict:
            state.setTimeoutDuration(3_600_000)  # evict users idle for 1h
        yield pd.DataFrame(
            [(user_id, n, s, anom)], columns=[f.name for f in PROFILE_OUTPUT_SCHEMA.fields]
        )

    return _update_profile


# default handler (eviction on) — importable for direct unit tests
_update_profile = _make_update_profile(evict=True)


def user_profile_stream(events: DataFrame, evict_idle: bool = True) -> DataFrame:
    """Streaming per-user running profile with spike detection.

    Input: the events stream (event_id, ts, user_id, value, ...).
    Output (update mode): one row per user per micro-batch with the
    cumulative profile.

    evict_idle=True (production default) arms a 1h ProcessingTimeTimeout
    per user so idle groups are dropped and state stays bounded. Pass
    False for BOUNDED runs (trigger(availableNow=True) backfills, tests,
    the correctness gate): pending processing-time timers force
    shouldRunAnotherBatch=true in the stateful exec, so an availableNow
    query with timers never terminates — it spins empty micro-batches
    after the data is exhausted.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if evict_idle else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_profile(evict=evict_idle),
        outputStructType=PROFILE_OUTPUT_SCHEMA,
        stateStructType=PROFILE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )

"""Event-sequence analytics: funnel conversion and cohort retention.

Batch event analytics over the [event_id, ts, user_id, event_type,
value] stream (the same table the sessionization / window operators
consume). Both operators are pure keyed joins + hash aggregations —
no per-user window over the full event history, no event-time sort:

- funnel_stages: the ordered view -> click -> purchase progression.
  Each stage is "first qualifying event strictly AFTER the previous
  stage's first event", computed as a per-user min-aggregate joined to
  the previous stage — three aggs + three user-keyed joins, each
  partial-combined. A per-user ordered window would also work but
  buffers a user's whole history per task; the min-agg form ships one
  row per user per stage.
- cohort_retention: users bucketed by first-seen week, activity
  counted per (cohort_week, week_offset). Weeks are integer Monday-
  based indexes since 1970-01-05 computed with pure DATE arithmetic —
  no session-timezone dependence (the events ts is NTZ), identical in
  the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel_stages(
    events: DataFrame,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """[user, stage]: how far each user progressed through the ordered
    funnel — 0 = active but never did stage 1, 1..len(stages) = last
    stage completed IN ORDER (a purchase before any view does not
    count; each stage must be strictly after the previous stage's
    first occurrence, the standard ordered-funnel semantics)."""
    s1, s2, s3 = stages
    ev = events.select(F.col(user_col), F.col(ts_col).alias("_ts"), F.col(type_col).alias("_et"))
    v = ev.where(F.col("_et") == s1).groupBy(user_col).agg(F.min("_ts").alias("_t1"))
    c = (
        ev.where(F.col("_et") == s2)
        .join(v, user_col)
        .where(F.col("_ts") > F.col("_t1"))
        .groupBy(user_col)
        .agg(F.min("_ts").alias("_t2"))
    )
    p = (
        ev.where(F.col("_et") == s3)
        .join(c, user_col)
        .where(F.col("_ts") > F.col("_t2"))
        .groupBy(user_col)
        .agg(F.min("_ts").alias("_t3"))
    )
    users = ev.select(user_col).distinct()
    return (
        users.join(v, user_col, "left")
        .join(c, user_col, "left")
        .join(p, user_col, "left")
        .select(
            user_col,
            F.when(F.col("_t3").isNotNull(), 3)
            .when(F.col("_t2").isNotNull(), 2)
            .when(F.col("_t1").isNotNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("stage"),
        )
    )


def _week_index(col: Column) -> Column:
    """Monday-based weeks since 1970-01-05 — integer DATE arithmetic,
    no timezone in the path (valid for NTZ and instant timestamps
    alike at day granularity)."""
    days = F.datediff(F.to_date(col), F.to_date(F.lit("1970-01-05")))
    return F.floor(days / 7).cast("int")


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """[cohort_week, week_offset, n_users]: of the users first seen in
    cohort_week, how many were active again week_offset weeks later
    (offset 0 = the cohort's own week; retention curves read along
    ascending offsets). One agg for first-seen, one distinct over
    (user, week), one user-keyed join — no per-user window."""
    first = events.groupBy(user_col).agg(F.min(ts_col).alias("_f"))
    cohort = first.select(F.col(user_col), _week_index(F.col("_f")).alias("cohort_week"))
    active = events.select(F.col(user_col), _week_index(F.col(ts_col)).alias("_week")).distinct()
    return (
        active.join(cohort, user_col)
        .groupBy("cohort_week", (F.col("_week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count("*").alias("n_users"))
    )


def event_transitions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
) -> DataFrame:
    """Per-user event-type transition counts — the Markov-chain
    feature pass behind next-event models and journey dashboards:
    order each user's events by the deterministic ``(ts, id)`` key,
    pair each with its predecessor's type via a PER-USER lag window
    (partitioned — never a global sort), then count (from_type,
    to_type) globally with one partial-combine hash agg.

    The transition probability ships as integer-exact
    ``prob_milli = n * 1000 div n_from`` (n_from = the from-type's
    total outgoing transitions), so the whole matrix is value-
    reproducible in any engine — no float division anywhere.

    Returns [from_type, to_type, n, n_from, prob_milli]; a user's
    first event has no predecessor and contributes nothing.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    steps = df.select(
        F.lag(type_col).over(w).alias("from_type"),
        F.col(type_col).alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    counts = steps.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    outgoing = counts.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return (
        counts.join(F.broadcast(outgoing), "from_type")
        .withColumn("_num", F.col("n") * F.lit(1000))
        .select(
            "from_type",
            "to_type",
            "n",
            "n_from",
            F.expr("_num div n_from").alias("prob_milli"),
        )
    )


def attribute_conversions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    value_col: str,
    touch_type: str = "click",
    campaign_col: Column | str = "campaign",
    conversion_type: str = "purchase",
) -> DataFrame:
    """Multi-touch conversion attribution — the marketing-analytics
    question every event pipeline eventually answers: which campaign
    gets credit for a purchase? Two standard models side by side:
    FIRST-touch (the preceding *touch_type* event that started the
    journey) and LAST-touch (the most recent one before conversion).

    Mechanics: the touch event's campaign is carried to every later
    row of the same user by first/last IGNORE-NULLS windows over the
    deterministic ``(ts, id)`` order — PER-USER partitions, never a
    global sort — then conversions aggregate per (model, campaign)
    with one partial-combine hash agg. Conversions with no preceding
    touch are reported under campaign -1: orphan revenue stays
    visible instead of silently vanishing (the quarantine discipline).
    Revenue accumulates in DECIMAL so totals are bit-stable under any
    partitioning.

    Returns [model, campaign, n_purchases, revenue]."""
    camp = F.col(campaign_col) if isinstance(campaign_col, str) else campaign_col
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = df.withColumn(
        "_camp", F.when(F.col(type_col) == touch_type, camp)
    )
    touched = tagged.select(
        type_col,
        value_col,
        F.first("_camp", ignorenulls=True).over(w).alias("_first"),
        F.last("_camp", ignorenulls=True).over(w).alias("_last"),
    ).where(F.col(type_col) == conversion_type)
    models = touched.select(
        F.lit("first_touch").alias("model"),
        F.coalesce(F.col("_first"), F.lit(-1)).alias("campaign"),
        value_col,
    ).unionByName(
        touched.select(
            F.lit("last_touch").alias("model"),
            F.coalesce(F.col("_last"), F.lit(-1)).alias("campaign"),
            value_col,
        )
    )
    return models.groupBy("model", "campaign").agg(
        F.count("*").alias("n_purchases"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double").alias("revenue"),
    )


def ab_test_summary(
    df: DataFrame,
    user_col: str,
    variant_col: str,
    converted: Column,
    control_value=0,
) -> DataFrame:
    """Per-variant experiment summary -> [variant, n_users,
    n_converted, cr_milli, diff_milli, lift_milli] — the event-
    analytics family's A/B readout (beside funnel/attribution/
    transitions): conversion rate per assignment arm plus the absolute
    and relative deltas against the ``control_value`` arm, all in
    exact integer milli-units (integer div — bit-identical in any
    engine; significance testing is a downstream choice, the exact
    counts it needs are all here).

    ``converted`` is a boolean Column evaluated per EVENT; a user
    converts if ANY of their events satisfies it (max over an int
    cast). Scale shape: one (variant, user) pre-aggregate with
    map-side combine (the only event-volume shuffle), one |variants|-
    row rollup (checkpointed — the control lookup and the returned
    frame read ONE materialization), one single-row bounded collect
    for the control rate.

    EXECUTION CONTRACT (ADVICE r11): this function is EAGER — calling
    it runs the event scan (two Spark jobs: the eager
    ``localCheckpoint`` of the rollup, then the one-row control
    collect) and the returned frame reads executor-local checkpoint
    blocks, so it is cheap to re-consume but NOT recomputable after
    executor loss and NOT a lazy plan callers can defer or re-optimize
    into a larger query. Callers that need laziness should inline the
    two groupBys and join the control row themselves.

    Loud-failure edges (ADVICE r10): an absent ``control_value`` arm
    raises (a crossJoin against the empty control row would silently
    return an EMPTY readout); a control arm whose conversion rate
    truncates to 0 milli yields NULL ``lift_milli`` (the relative
    delta is undefined — 0 div 0 must not pass as data) while
    ``diff_milli`` still carries the absolute delta."""
    per_var = (
        df.groupBy(variant_col, user_col)
        .agg(F.max(converted.cast("int")).alias("_c"))
        .groupBy(variant_col)
        .agg(
            F.count("*").alias("n_users"),
            F.sum("_c").cast("long").alias("n_converted"),
        )
        .withColumn("cr_milli", F.expr("n_converted * 1000 div n_users"))
        .localCheckpoint(eager=True)
    )
    ctrl = per_var.where(F.col(variant_col) == control_value).select("cr_milli").collect()
    if not ctrl:
        raise ValueError(
            f"ab_test_summary: no {variant_col}={control_value!r} arm in the "
            "data — every delta is relative to the control arm"
        )
    cr0 = ctrl[0]["cr_milli"]
    lift = (
        F.expr(f"(cr_milli - {cr0}) * 1000 div {cr0}")
        if cr0 != 0
        else F.lit(None).cast("long")
    )
    return per_var.select(
        variant_col,
        "n_users",
        "n_converted",
        "cr_milli",
        (F.col("cr_milli") - F.lit(cr0)).cast("long").alias("diff_milli"),
        lift.alias("lift_milli"),
    )

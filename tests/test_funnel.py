"""Ordered-funnel and cohort-retention semantics on hand-built events."""

from __future__ import annotations

from datetime import datetime

from hadoop_app_spark.operators.funnel import cohort_retention, funnel_stages

SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, datetime(2024, 1, d, h), u, t) for i, (d, h, u, t) in enumerate(rows)],
        SCHEMA,
    )


def test_funnel_requires_stage_order(spark):
    ev = _ev(
        spark,
        [
            # u1: full ordered funnel
            (1, 1, 1, "view"), (1, 2, 1, "click"), (1, 3, 1, "purchase"),
            # u2: purchase BEFORE view -> only stage 1
            (1, 1, 2, "purchase"), (1, 2, 2, "view"),
            # u3: click before view, view later, no click after -> stage 1
            (1, 1, 3, "click"), (1, 2, 3, "view"),
            # u4: never views -> stage 0
            (1, 1, 4, "error"), (1, 2, 4, "click"),
            # u5: view then click, purchase between view and click -> stage 2
            (1, 1, 5, "view"), (1, 2, 5, "purchase"), (1, 3, 5, "click"),
        ],
    )
    got = {r.user_id: r.stage for r in funnel_stages(ev).collect()}
    assert got == {1: 3, 2: 1, 3: 1, 4: 0, 5: 2}


def test_funnel_strictly_after_boundary(spark):
    # click at EXACTLY the first view instant does not count (strict >)
    ev = _ev(spark, [(1, 1, 1, "view"), (1, 1, 1, "click"), (1, 2, 1, "click")])
    got = {r.user_id: r.stage for r in funnel_stages(ev).collect()}
    assert got == {1: 2}  # the later click qualifies, the simultaneous one alone wouldn't
    ev2 = _ev(spark, [(1, 1, 9, "view"), (1, 1, 9, "click")])
    assert {r.user_id: r.stage for r in funnel_stages(ev2).collect()} == {9: 1}


def test_cohort_retention_offsets(spark):
    ev = _ev(
        spark,
        [
            # u1 first seen Mon Jan 1 week, active again 2 weeks later
            (1, 1, 1, "view"), (15, 1, 1, "view"),
            # u2 first seen next week (Jan 8), active that week only
            (8, 1, 2, "view"), (9, 1, 2, "click"),
        ],
    )
    rows = {(r.cohort_week, r.week_offset): r.n_users for r in cohort_retention(ev).collect()}
    w0 = (datetime(2024, 1, 1) - datetime(1970, 1, 5)).days // 7
    assert rows == {(w0, 0): 1, (w0, 2): 1, (w0 + 1, 0): 1}


def test_ab_test_summary_loud_edges(spark):
    """ADVICE r10: an absent control arm raises (never a silently empty
    readout) and a zero-milli control rate yields NULL lift_milli while
    diff_milli still carries the absolute delta."""
    import pytest
    from pyspark.sql import functions as F

    from hadoop_app_spark.operators.funnel import ab_test_summary

    ev = _ev(
        spark,
        [(1, 1, 1, "view"), (1, 2, 1, "purchase"), (1, 3, 2, "view"),
         (1, 4, 3, "view"), (1, 5, 4, "purchase")],
    ).withColumn("variant", F.col("user_id") % 2)
    conv = F.col("event_type") == "purchase"

    with pytest.raises(ValueError, match="variant=9"):
        ab_test_summary(ev, "user_id", "variant", conv, control_value=9)

    # control arm (users 2, 4): make it convert nothing -> cr0 = 0
    ev0 = ev.withColumn(
        "event_type",
        F.when(F.col("variant") == 0, F.lit("view")).otherwise(F.col("event_type")),
    )
    rows = {r["variant"]: r for r in ab_test_summary(
        ev0, "user_id", "variant", conv, control_value=0
    ).collect()}
    assert rows[0]["lift_milli"] is None and rows[1]["lift_milli"] is None
    assert rows[1]["diff_milli"] == rows[1]["cr_milli"]

"""Event-transition mining (operators/funnel.event_transitions) and
key-skew diagnostics (operators/skew.key_skew_profile)."""

from __future__ import annotations

import datetime as dt


def test_event_transitions_counts_and_probs(spark):
    from hadoop_app_spark.operators.funnel import event_transitions

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: a -> b -> b ; user 2: a -> b ; user 3: lone event
        (1, t0, 1, "a"),
        (1, t0 + dt.timedelta(minutes=1), 2, "b"),
        (1, t0 + dt.timedelta(minutes=2), 3, "b"),
        (2, t0, 4, "a"),
        (2, t0 + dt.timedelta(minutes=1), 5, "b"),
        (3, t0, 6, "c"),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp_ntz, event_id int, event_type string"
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["n_from"], r["prob_milli"])
        for r in event_transitions(df, "user_id", "ts", "event_type", "event_id").collect()
    }
    assert got == {
        ("a", "b"): (2, 2, 1000),
        ("b", "b"): (1, 1, 1000),
    }


def test_event_transitions_tiebreak_by_event_id(spark):
    """Equal timestamps order by event_id — the documented
    deterministic tiebreak, never engine-dependent."""
    from hadoop_app_spark.operators.funnel import event_transitions

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t0, 2, "late"), (1, t0, 1, "early")],
        "user_id int, ts timestamp_ntz, event_id int, event_type string",
    )
    got = [
        (r["from_type"], r["to_type"])
        for r in event_transitions(df, "user_id", "ts", "event_type", "event_id").collect()
    ]
    assert got == [("early", "late")]


def test_key_skew_profile_exact(spark):
    from hadoop_app_spark.operators.skew import key_skew_profile

    # 4 keys: 6 + 2 + 1 + 1 = 10 rows; counts sorted = [1, 1, 2, 6]
    rows = [(k,) for k in [1] * 6 + [2] * 2 + [3] + [4]]
    df = spark.createDataFrame(rows, "k int")
    r = key_skew_profile(df, "k", top_k=2).collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_rows"]) == (10, 4, 6)
    assert r["max_share_milli"] == 600
    assert r["topk_share_milli"] == 800  # top-2 keys: 6 + 2 of 10
    # type-1 quantiles over [1, 1, 2, 6]: p50 -> rank 2 -> 1,
    # p90 -> rank 4 -> 6, p99 -> rank 4 -> 6
    assert (r["p50_rows"], r["p90_rows"], r["p99_rows"]) == (1, 6, 6)


def test_conversion_attribution_models(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from hadoop_app_spark.operators.funnel import attribute_conversions

    t0 = dt.datetime(2024, 1, 1)

    def at(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        # user 1: click(c1) -> click(c2) -> purchase 10: first=1 last=2
        (1, at(0), 1, "click", 0.0, 1),
        (1, at(1), 2, "click", 0.0, 2),
        (1, at(2), 3, "purchase", 10.0, None),
        # user 2: purchase with NO preceding click -> campaign -1
        (2, at(0), 4, "purchase", 5.0, None),
        # user 3: click(c1) -> purchase -> purchase (both credit c1/c1)
        (3, at(0), 5, "click", 0.0, 1),
        (3, at(1), 6, "purchase", 2.0, None),
        (3, at(2), 7, "purchase", 3.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "user_id int, ts timestamp_ntz, event_id int, event_type string, "
        "value double, campaign long",
    )
    got = {
        (r["model"], r["campaign"]): (r["n_purchases"], r["revenue"])
        for r in attribute_conversions(
            df, "user_id", "ts", "event_type", "event_id", "value",
            campaign_col=F.col("campaign"),
        ).collect()
    }
    assert got == {
        ("first_touch", 1): (3, 15.0),
        ("first_touch", -1): (1, 5.0),
        ("last_touch", 2): (1, 10.0),
        ("last_touch", 1): (2, 5.0),
        ("last_touch", -1): (1, 5.0),
    }


def test_winsorize_bounds_and_clamp(spark):
    """The clamp bounds are the exact type-1 1/16 and 15/16 order
    statistics, and every output value lies inside them while interior
    values pass through untouched."""
    from pyspark.sql import functions as F

    from hadoop_app_spark.operators.skew import winsorize

    vals = [float(i) for i in range(1, 33)]  # 1..32: p=1/16 -> rank 2, 15/16 -> rank 30
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v double")
    out, bounds = winsorize(df, "v")
    assert bounds == {"lo": 2.0, "hi": 30.0}
    rows = {r["id"]: r["v_wins"] for r in out.collect()}
    assert rows[0] == 2.0 and rows[31] == 30.0   # tails clamped
    assert rows[10] == vals[10]                  # interior untouched


def test_column_change_profile_null_safety(spark):
    """NULL->value and value->NULL count as changes; NULL->NULL does
    not; added/removed keys never contribute to per-column counts."""
    from hadoop_app_spark.operators.upsert import column_change_profile

    old = spark.createDataFrame(
        [(1, "a", None), (2, None, None), (3, "c", 5), (4, "gone", 1)],
        "k int, s string, x int",
    )
    new = spark.createDataFrame(
        [(1, "a", 7), (2, None, None), (3, None, 5), (9, "new", 0)],
        "k int, s string, x int",
    )
    prof = {
        r["column_name"]: (r["n_added"], r["n_removed"], r["n_common"], r["n_changed"])
        for r in column_change_profile(old, new, ["k"]).collect()
    }
    # k=9 added, k=4 removed, k in {1,2,3} common
    # s: only k=3 changed (c -> NULL); k=2 NULL -> NULL is NOT a change
    # x: only k=1 changed (NULL -> 7)
    assert prof == {"s": (1, 1, 3, 1), "x": (1, 1, 3, 1)}


def test_robust_scale_cuts_and_degenerate_guard(spark):
    from pyspark.sql import functions as F

    from hadoop_app_spark.operators.skew import robust_scale

    vals = [float(i) for i in range(1, 9)]  # q1=2, med=4, q3=6 (type-1)
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v double")
    out, cuts = robust_scale(df, "v")
    assert cuts == {"q1": 2.0, "med": 4.0, "q3": 6.0}
    rows = {r["id"]: r["v_scaled"] for r in out.collect()}
    assert rows[3] == 0.0 and rows[7] == 1.0  # (4-4)/4, (8-4)/4

    import pytest as _pytest

    flat = spark.createDataFrame([(i, 5.0) for i in range(10)], "id long, v double")
    with _pytest.raises(ValueError, match="IQR is 0"):
        robust_scale(flat, "v")


def test_winsorize_robust_scale_empty_input_raise(spark):
    """ADVICE r10: an empty frame raises a named ValueError, not an
    opaque KeyError from the missing percentile group."""
    import pytest as _pytest

    from hadoop_app_spark.operators.skew import robust_scale, winsorize

    empty = spark.createDataFrame([], "id long, v double")
    with _pytest.raises(ValueError, match="winsorize\\(v\\): empty input"):
        winsorize(empty, "v")
    with _pytest.raises(ValueError, match="robust_scale\\(v\\): empty input"):
        robust_scale(empty, "v")


def test_distribution_drift_null_bin_merges_and_empty_reference_raises(spark):
    """ADVICE r10: a NULL bin is ONE group on both sides (null-safe
    merge, exactly GROUP BY's treatment) — never an old-only + new-only
    pair inflating TVD; an empty reference raises instead of waving any
    batch through with TVD 0."""
    import pytest as _pytest

    from hadoop_app_spark.operators.expectations import distribution_drift

    old = spark.createDataFrame(
        [(None,), ("a",), ("a",), ("b",)], "bin string"
    )
    new = spark.createDataFrame(
        [(None,), ("a",), ("a",), ("b",)], "bin string"
    )
    rows = {r["bin"]: r for r in distribution_drift(old, new, "bin").collect()}
    assert set(rows) == {None, "a", "b"}  # ONE row for the NULL bin
    assert rows[None]["n_old"] == 1 and rows[None]["n_new"] == 1
    assert all(r["diff_milli"] == 0 for r in rows.values())

    empty = spark.createDataFrame([], "bin string")
    with _pytest.raises(Exception, match="reference snapshot is empty|snapshot is empty"):
        distribution_drift(empty, new, "bin").collect()


def test_distribution_drift_empty_new_side_is_recoverable(spark):
    """ADVICE r11: an empty NEW side must not raise (a DriftBound
    expectation over an empty micro-batch would kill the stream in a
    forever-replay loop where quarantining is recoverable) — its
    shares evaluate to 0, and DriftBound pins the gate metric to
    exactly 1000 (maximal drift -> quarantine)."""
    from hadoop_app_spark.operators.expectations import (
        DriftBound,
        check_expectations,
        distribution_drift,
    )

    old = spark.createDataFrame([("a",), ("a",), ("b",)], "bin string")
    empty = spark.createDataFrame([], "bin string")

    rows = {r["bin"]: r for r in distribution_drift(old, empty, "bin").collect()}
    assert set(rows) == {"a", "b"}
    assert all(r["new_milli"] == 0 and r["n_new"] == 0 for r in rows.values())
    assert all(r["diff_milli"] == r["old_milli"] for r in rows.values())

    verdict = check_expectations(
        empty.withColumnRenamed("bin", "v"),
        [DriftBound("v", old.withColumnRenamed("bin", "v"), max_tvd_milli=400)],
    ).collect()
    assert len(verdict) == 1
    assert verdict[0]["metric"] == 1000.0
    assert verdict[0]["passed"] is False


def test_drift_bound_reference_aggregated_once(spark):
    """r12 scale fix: a DriftBound gate lives across micro-batches in a
    foreachBatch sink, so its reference is binned ONCE per instance
    (checkpoint-pinned |bins| rows) — re-evaluations reuse the cache
    instead of re-scanning a corpus-sized reference every trigger, and
    verdicts are identical across calls."""
    from pyspark.sql import functions as F

    from hadoop_app_spark.operators.expectations import (
        DriftBound,
        check_expectations,
    )

    ref = spark.range(0, 700).select((F.col("id") % 5).alias("v"))
    gate = DriftBound("v", ref, max_tvd_milli=100)
    batch = spark.range(0, 350).select((F.col("id") % 5).alias("v"))
    first = check_expectations(batch, [gate]).collect()
    cached = gate._ref_binned
    assert cached is not None
    assert {r["bin"]: r["n_old"] for r in cached.collect()} == {
        i: 140 for i in range(5)
    }
    second = check_expectations(batch, [gate]).collect()
    assert gate._ref_binned is cached  # no re-aggregation
    assert [tuple(r) for r in first] == [tuple(r) for r in second]
    assert first[0]["metric"] == 0.0 and first[0]["passed"]

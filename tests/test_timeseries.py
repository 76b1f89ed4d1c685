"""Time-series gap-fill (operators/timeseries) and PMI collocation
mining (operators/corpus.token_pmi_pairs)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_gapfill_locf_semantics(spark):
    from hadoop_app_spark.operators.timeseries import gapfill_locf

    rows = [
        # user 1: readings on day 1 and day 4; gap days 2-3 carry 7.0;
        # two events on day 1 -> the (ts, id)-max one (value 7.0) wins
        (1, dt.datetime(2024, 3, 1, 8, 0), 10, 3.0),
        (1, dt.datetime(2024, 3, 1, 9, 0), 11, 7.0),
        (1, dt.datetime(2024, 3, 4, 9, 0), 12, 1.0),
        # user 2: first reading on day 3 -> days 1-2 exist with NULL
        (2, dt.datetime(2024, 3, 3, 9, 0), 13, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp_ntz, event_id int, value double"
    )
    got = {
        (r["user_id"], str(r["day"])): (r["n_events"], r["locf_value"])
        for r in gapfill_locf(df, "ts", ["user_id"], "value", "event_id").collect()
    }
    assert got == {
        (1, "2024-03-01"): (2, 7.0),
        (1, "2024-03-02"): (0, 7.0),
        (1, "2024-03-03"): (0, 7.0),
        (1, "2024-03-04"): (1, 1.0),
        (2, "2024-03-01"): (0, None),
        (2, "2024-03-02"): (0, None),
        (2, "2024-03-03"): (1, 5.0),
        (2, "2024-03-04"): (0, 5.0),
    }


def test_gapfill_spine_is_grid_sized(spark):
    """Spine rows = |keys| x |days of the global range| regardless of
    how sparse the observations are."""
    from hadoop_app_spark.operators.timeseries import gapfill_locf

    rows = [
        (1, dt.datetime(2024, 3, 1), 1, 1.0),
        (9, dt.datetime(2024, 3, 10), 2, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp_ntz, event_id int, value double"
    )
    assert gapfill_locf(df, "ts", ["user_id"], "value", "event_id").count() == 2 * 10


def test_token_pmi_pairs_exact_counts(spark):
    from hadoop_app_spark.operators.corpus import token_pmi_pairs

    docs = spark.createDataFrame(
        [
            (1, "red apple pie"),
            (2, "red apple tart"),
            (3, "red brick wall"),
            (4, "apple pie"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["tok_a"], r["tok_b"]): (r["n_ab"], r["n_a"], r["n_b"], r["lift_milli"])
        for r in token_pmi_pairs(docs, "text", "doc_id", min_df=2).collect()
    }
    # min_df=2 keeps red(3) apple(3) pie(2); singletons never pair
    # lift_milli = N * n_ab * 1000 div (n_a * n_b), N = 4 docs
    assert got == {
        ("apple", "red"): (2, 3, 3, 4 * 2 * 1000 // 9),
        ("apple", "pie"): (2, 3, 2, 4 * 2 * 1000 // 6),
        ("pie", "red"): (1, 2, 3, 4 * 1 * 1000 // 6),
    }


def test_token_pmi_matches_brute_self_join(spark):
    """The in-array pair expansion produces exactly the pairs a brute
    (doc, tok) self-join would — on real corpus data."""
    from hadoop_app_spark.functions.text import tokenize
    from hadoop_app_spark.operators.corpus import token_pmi_pairs

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        (r["tok_a"], r["tok_b"]): r["n_ab"]
        for r in token_pmi_pairs(d, "text", "doc_id", min_df=2).collect()
    }
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(tokenize("text"))).alias("tok")
    )
    dft = toks.groupBy("tok").count().where(F.col("count") >= 2)
    kept = toks.join(dft.select("tok"), "tok")
    a, b = kept.alias("a"), kept.alias("b")
    brute = (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.tok") < F.col("b.tok")))
        .groupBy(F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b"))
        .count()
    )
    want = {(r["tok_a"], r["tok_b"]): r["count"] for r in brute.collect()}
    assert got == want


def test_frequent_item_pairs_exact_metrics(spark):
    """r12 association mining: known baskets -> exact pair counts and
    integer support/confidence/lift; duplicate (basket, item) rows
    count ONCE (set semantics); the A-Priori prune is lossless."""
    from hadoop_app_spark.operators.itemsets import frequent_item_pairs

    rows = [
        (1, "milk"), (1, "bread"), (1, "eggs"),
        (2, "milk"), (2, "bread"), (2, "bread"),  # dup bread: one
        (3, "milk"), (3, "bread"),
        (4, "milk"), (4, "jam"),
        (5, "jam"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r["item_a"], r["item_b"]): (
            r["n_pair"], r["n_a"], r["n_b"], r["support_micro"],
            r["conf_ab_milli"], r["conf_ba_milli"], r["lift_milli"],
        )
        for r in frequent_item_pairs(df, "basket", "item").collect()
    }
    # n_baskets = 5; (bread, milk): 3 of 5 baskets, bread df 3, milk
    # df 4; eggs and jam never pair twice
    assert got == {
        ("bread", "milk"): (
            3, 3, 4, 3 * 1_000_000 // 5, 1000, 750, 3 * 5 * 1000 // 12
        ),
    }

    # lossless prune: min_pair_count=1 equals an unpruned brute join
    all_pairs = frequent_item_pairs(df, "basket", "item", min_pair_count=1)
    items = df.distinct()
    a = items.select("basket", F.col("item").alias("item_a"))
    b = items.select("basket", F.col("item").alias("item_b"))
    brute = (
        a.join(b, "basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .count()
    )
    assert {
        (r["item_a"], r["item_b"]): r["n_pair"] for r in all_pairs.collect()
    } == {(r["item_a"], r["item_b"]): r["count"] for r in brute.collect()}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no baskets"):
        frequent_item_pairs(
            spark.createDataFrame([], "basket long, item string"), "basket", "item"
        )


def test_gapfill_interpolate_semantics(spark):
    from hadoop_app_spark.operators.timeseries import gapfill_interpolate

    rows = [
        # user 1: 2.0 on day 1, 8.0 on day 4 -> days 2,3 at 4.0, 6.0
        (1, dt.datetime(2024, 3, 1, 8), 1, 2.0),
        (1, dt.datetime(2024, 3, 4, 8), 2, 8.0),
        # user 2: single reading on day 2 -> every day takes it
        (2, dt.datetime(2024, 3, 2, 8), 3, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp_ntz, event_id int, value double"
    )
    got = {
        (r["user_id"], str(r["day"])): (r["n_events"], r["lin_value"])
        for r in gapfill_interpolate(df, "ts", ["user_id"], "value", "event_id").collect()
    }
    assert got == {
        (1, "2024-03-01"): (1, 2.0),
        (1, "2024-03-02"): (0, 4.0),
        (1, "2024-03-03"): (0, 6.0),
        (1, "2024-03-04"): (1, 8.0),
        (2, "2024-03-01"): (0, 5.0),  # before first obs -> nearest
        (2, "2024-03-02"): (1, 5.0),
        (2, "2024-03-03"): (0, 5.0),  # after last obs -> nearest
        (2, "2024-03-04"): (0, 5.0),
    }


def test_downsample_ohlc_deterministic_open_close(spark):
    """open/close are the (ts, id) struct-min/max READINGS, not value
    extremes: a bucket whose first row is not its min value must keep
    the first row's value as open."""
    from hadoop_app_spark.operators.timeseries import downsample_ohlc

    rows = [
        # one key, one week (2024-01-01 is a Monday)
        ("a", "2024-01-01 10:00:00", 1, 5.0),
        ("a", "2024-01-02 10:00:00", 2, 1.0),
        ("a", "2024-01-03 10:00:00", 3, 9.0),
        ("a", "2024-01-07 10:00:00", 4, 3.0),
        # second week
        ("a", "2024-01-08 10:00:00", 5, 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, id long, v double").select(
        "k", F.to_timestamp("ts").alias("ts"), "id", "v"
    )
    out = {
        str(r["bucket"]): (r["n_events"], r["v_open"], r["v_high"], r["v_low"], r["v_close"], r["v_sum"])
        for r in downsample_ohlc(df, "ts", ["k"], "v", "id").collect()
    }
    assert out == {
        "2024-01-01": (4, 5.0, 9.0, 1.0, 3.0, 18.0),
        "2024-01-08": (1, 7.0, 7.0, 7.0, 7.0, 7.0),
    }


def test_downsample_ohlc_monthly_unit(spark):
    from hadoop_app_spark.operators.timeseries import downsample_ohlc

    rows = [("a", "2024-01-05 00:00:00", 1, 2.0), ("a", "2024-02-05 00:00:00", 2, 4.0)]
    df = spark.createDataFrame(rows, "k string, ts string, id long, v double").select(
        "k", F.to_timestamp("ts").alias("ts"), "id", "v"
    )
    out = sorted(
        str(r["bucket"]) for r in downsample_ohlc(df, "ts", ["k"], "v", "id", unit="month").collect()
    )
    assert out == ["2024-01-01", "2024-02-01"]

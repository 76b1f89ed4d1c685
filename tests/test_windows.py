"""global_ntile — the scale-safe replacement for unpartitioned ntile.

Differential contract: identical buckets to ``F.ntile(k) OVER (ORDER BY
...)`` for every n mod k residue, duplicate order values (unique-key
tiebreak), and n < k, while the produced plan contains NO unpartitioned
window (the built-in's single-partition funnel is the round-2 verdict's
one scale-killer).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hadoop_app_spark.operators.windows import (
    global_ntile,
    global_ntile_boundaries,
    ntile_cut_positions,
)


def _buckets(df, col):
    return {(r["v"], r["id"]): r[col] for r in df.collect()}


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (4, 4), (5, 4), (101, 4), (103, 7)])
def test_matches_builtin_ntile(spark, n, k):
    random.seed(n * 31 + k)
    rows = [(random.randint(0, 5), i) for i in range(n)]  # heavy order-value ties
    df = spark.createDataFrame(rows, "v int, id int")
    expected = _buckets(df.withColumn("b", F.ntile(k).over(Window.orderBy("v", "id"))), "b")
    got = _buckets(global_ntile(df, k, ["v", "id"], "b"), "b")
    assert got == expected


def test_cut_positions():
    # n=10, k=4: buckets sized 3,3,2,2 -> last rows at 3, 6, 8
    assert ntile_cut_positions(10, 4) == [3, 6, 8]
    # even split
    assert ntile_cut_positions(8, 4) == [2, 4, 6]
    # n < k: one row per early bucket
    assert ntile_cut_positions(2, 4) == [1, 2, 2]


def test_no_unpartitioned_window_in_plan(spark):
    df = spark.createDataFrame([(i % 7, i) for i in range(200)], "v int, id int")
    out = global_ntile(df, 4, ["v", "id"], "b")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # assignment is a pure projection
    assert "Exchange" not in plan


def test_boundaries_are_order_statistics(spark):
    df = spark.createDataFrame([(i, i) for i in range(100)], "v int, id int")
    bounds = global_ntile_boundaries(df, 4, ["v", "id"])
    assert [b[0] for b in bounds] == [24, 49, 74]  # positions 25, 50, 75 (1-based)


def test_empty_input(spark):
    df = spark.createDataFrame([], "v int, id int")
    assert global_ntile(df, 4, ["v", "id"], "b").count() == 0

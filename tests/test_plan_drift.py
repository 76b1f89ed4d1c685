"""Plan-drift gates.

1. PLANS.md must match what tools/plan_report.py would regenerate —
   a plan-affecting change that forgets to rerun the report fails CI,
   so every physical-plan change is reviewable in the PLANS.md diff.
2. plan_fingerprint must be stable for an unchanged plan and move
   when the plan shape moves (the bench-side tripwire contract).
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest
from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent.parent


def _normalize(md: str) -> str:
    # node ids `(7)` renumber when a plan grows; compare shapes
    norm = re.sub(r"\(\d+\)", "", md)
    return re.sub(r"[ \t]+", " ", norm).strip()


def test_plans_md_is_current(spark):
    import sys

    sys.path.insert(0, str(REPO / "tools"))
    from plan_report import render

    committed = (REPO / "PLANS.md").read_text()
    regenerated = render(spark)
    assert _normalize(committed) == _normalize(regenerated), (
        "PLANS.md is stale: a plan-affecting change landed without "
        "regenerating the report. Run `python tools/plan_report.py` "
        "and review the diff."
    )


def test_plan_fingerprint_contract(spark):
    from hadoop_app_spark.plans.fingerprint import plan_fingerprint

    df = spark.range(100).groupBy((F.col("id") % 5).alias("k")).count()
    same = spark.range(100).groupBy((F.col("id") % 5).alias("k")).count()
    assert plan_fingerprint(df) == plan_fingerprint(same)
    # a different shape (extra exchange via distinct) must move the hash
    other = spark.range(100).select((F.col("id") % 5).alias("k")).distinct().groupBy("k").count()
    assert plan_fingerprint(df) != plan_fingerprint(other)
    # literal-only changes keep the shape -> same fingerprint class is
    # NOT guaranteed for literals inside the tree header; pin only that
    # expression-id churn never moves it (ids are normalized away)
    a = spark.range(50).withColumn("x", F.col("id") + 1)
    b = spark.range(50).withColumn("x", F.col("id") + 1)
    assert plan_fingerprint(a) == plan_fingerprint(b)


@pytest.mark.parametrize("name", ["max_per_group", "broadcast_dim_join"])
def test_fingerprint_deterministic_for_registry_queries(spark, name):
    from hadoop_app_spark.plans.fingerprint import plan_fingerprint
    from hadoop_app_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    f1 = plan_fingerprint(REGISTRY[name].fn(spark, sf))
    f2 = plan_fingerprint(REGISTRY[name].fn(spark, sf))
    assert f1 == f2

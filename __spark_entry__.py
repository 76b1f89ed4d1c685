"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship query (the UserHotcar-shaped recommendation
pipeline re-cast over the star schema). queries()/oracle_sql() expose
the full declared inventory from hadoop_app_spark.queries — one entry
per operator family in SURVEY.md §2 plus the north-star corpus
operators (dedup/similarity/text/windows/sessionization).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from hadoop_app_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["recommend_flagship"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted for ops whose output
    is engine-seeded (approx sketches, LSH buckets) — those get the
    driver's rows-only check."""
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}

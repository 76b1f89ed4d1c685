"""hadoop_app_spark — a PySpark-native analytics engine.

A brand-new, Spark-first rebuild of the query/data-processing
capabilities of the reference `ldxforstudy/hadoop-app` (a Hadoop 2.7.7
MapReduce example repo). Everything here is expressed as DataFrame /
SQL logical plans so Catalyst + Tungsten choose the physical strategy;
no hand-scheduled MapReduce DAGs.

Layout:
  session    — SparkSession factory with scale-tuned conf
  catalog    — parquet table registry over the test star schema
  sources/   — line/fixed-width/TSV/\\x01+JSON readers, sinks
  functions/ — scalar libs: dates, json, normalize, text, vectors
  operators/ — joins, top-k, dedup, similarity, multimodal plumbing
  plans/     — the reference's four jobs as composable DataFrame fns
  streaming/ — Structured Streaming ops over the events schema
  queries    — declared query inventory (engine surface for the oracle)
"""

from hadoop_app_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

"""Max temperature per year (reference job 1).

Reference: BootStrap.java:22-46 driver, MaxTemperatureMapper.java:16-23,
MaxTemperatureReducer.java:13-20 (reducer doubles as combiner,
BootStrap.java:35).

Spark plan: read.text -> substring projection -> groupBy(year).max(temp).
The combiner (map-side partial max) is automatic: Spark's HashAggregate
runs partial -> Exchange(hash year) -> final, the same two-phase shape
the reference hand-wires. At 100 TB the year cardinality is tiny, so
the shuffle after partial agg moves only |years| x |map tasks| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_app_spark.sources.ncdc import read_ncdc
from hadoop_app_spark.sources.sinks import write_kv_text


def max_temperature(ncdc: DataFrame) -> DataFrame:
    """DataFrame[year, temp] -> DataFrame[year, max_temp], one row per year."""
    return ncdc.groupBy("year").agg(F.max("temp").alias("max_temp"))


def run_max_temperature(spark: SparkSession, in_path: str, out_path: str | None = None) -> DataFrame:
    """End-to-end job: NCDC text in, ``year\\tmax`` text out (S8 sink)."""
    result = max_temperature(read_ncdc(spark, in_path))
    if out_path is not None:
        write_kv_text(result, out_path, "year", "max_temp")
    return result

"""Provenance-tagged multi-path scan (SURVEY §2.1 S2 / §2.2 P3).

Reference behavior (ReduceJoinJob.java:66-67, 106-135): two input
directories stream through ONE mapper; each row is routed by the
substring of its input path ("employee" vs "dept"), and rows whose
path matches neither are logged and dropped.

Spark-first: a single multi-path ``spark.read`` is one scan stage
(Spark unions the file listings into one FileScan — no extra shuffle),
``F.input_file_name()`` recovers the per-row source path at zero cost
(it is scan-local metadata, no lineage to Python), and the dispatch is
a codegen'd CASE over that column. At 100 TB this stays a single pass:
the tag never forces a shuffle, and Catalyst still pushes filters and
prunes columns per-file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_tagged_parquet(spark: SparkSession, paths: list[str]) -> DataFrame:
    """One multi-path parquet scan with a per-row ``source_file`` column.

    mergeSchema=true unions the file schemas (columns absent in a file
    are null for its rows), so heterogeneous tables can share the scan
    the way the reference shares one mapper across employee+dept dirs.
    """
    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    return df.withColumn("source_file", F.input_file_name())


def dispatch_by_path(
    df: DataFrame,
    routes: list[tuple[str, str]],
    tag_col: str = "source",
) -> DataFrame:
    """Route rows by input-path substring; drop rows matching no route.

    routes: ordered (substring, tag) pairs — first match wins, exactly
    like the if/else-if chain in ReduceJoinJob.java:106-135. Rows whose
    path matches no substring are dropped (the reference logs+skips).
    Requires a ``source_file`` column (from ``read_tagged_parquet``).
    """
    expr = F.lit(None).cast("string")
    for substr, tag in reversed(routes):
        expr = F.when(F.col("source_file").contains(substr), F.lit(tag)).otherwise(expr)
    return df.withColumn(tag_col, expr).where(F.col(tag_col).isNotNull())

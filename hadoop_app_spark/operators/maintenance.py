"""Table maintenance for ingest-heavy pipelines.

A 100 TB training-data ingest continuously lands small files (one per
micro-batch per partition); scans then pay per-file open costs and
lose vectorization efficiency. Compaction rewrites a directory to
size-targeted files. The reference has no analogue (its outputs are
one file per reducer by construction); this is north-star pipeline
surface.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

from hadoop_app_spark.sources.fs import list_files


def plan_compaction(spark: SparkSession, src: str, target_mb: int = 256) -> dict:
    """Inspect a parquet directory and return the compaction plan:
    current file count/bytes and the target partition count."""
    files = [f for f in list_files(spark, src, recursive=True) if f["path"].endswith(".parquet")]
    total = sum(f["size"] for f in files)
    n_out = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    return {"n_files": len(files), "total_bytes": total, "target_partitions": n_out}


def compact_parquet(
    spark: SparkSession, src: str, dst: str, target_mb: int = 256, sort_by: list[str] | None = None
) -> dict:
    """Rewrite ``src`` parquet into ``dst`` as ~target_mb files.

    ``sort_by`` optionally clusters rows before writing (repartition by
    range) so downstream range predicates prune row groups via parquet
    min/max stats — compaction is the natural place to establish sort
    order. Returns the plan actually executed.
    """
    plan = plan_compaction(spark, src, target_mb)
    df = spark.read.parquet(src)
    n = plan["target_partitions"]
    df = df.repartitionByRange(n, *sort_by) if sort_by else df.repartition(n)
    df.write.mode("overwrite").parquet(dst)
    return plan

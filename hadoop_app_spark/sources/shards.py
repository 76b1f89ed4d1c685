"""Training-shard export: pack documents into fixed-token-budget
shards and write them as a partitioned, manifest-carrying dataset.

operators/windows.pack_shards assigns the shard ids (two-pass prefix
scan, no global window); this module operationalizes the export the
way a 100 TB corpus actually ships to a trainer:

- data/ is parquet partitioned by shard_id — a trainer (or a resumed
  export) reads exactly one shard directory per task, and Spark's
  partition pruning makes ``shard_id = k`` a single-directory scan;
- manifest/ is a tiny parquet of per-shard row counts and token
  totals, written LAST — its presence marks a complete export (the
  same commit-marker discipline as Hadoop's _SUCCESS, but carrying
  the accounting a training run needs for sizing/resume instead of
  an empty flag file).

The packing contract is inherited from pack_shards: deterministic in
(order_cols) order, a shard may exceed the budget by at most one
row's weight (rows never split). Shard ids are NOT necessarily
contiguous — a single row heavier than 2x the budget makes the
prefix sum jump past whole budget intervals — so consumers must
iterate the manifest's shard_id column, never ``range(max_id + 1)``.
The manifest lets the consumer verify all of this without rescanning
data/.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_app_spark.operators.windows import pack_shards

_DATA = "data"
_MANIFEST = "manifest"


def write_packed_shards(
    df: DataFrame,
    path: str,
    weight_col: str,
    order_cols: Sequence[str],
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Pack ``df`` into shards of ~``budget`` total ``weight_col`` and
    write ``{path}/data`` (parquet, partitioned by shard_id) plus
    ``{path}/manifest`` (per-shard rows/weight). Returns the manifest
    DataFrame. The manifest is written AFTER the data so a crashed
    export is detectable: data/ without manifest/ = incomplete."""
    shards = pack_shards(df, weight_col, list(order_cols), budget, num_partitions=num_partitions)
    spark = df.sparkSession
    # drop any PREVIOUS export's manifest before touching data/: if this
    # re-export crashes mid-write, a stale manifest would otherwise make
    # partial new data look complete — the exact corruption the marker
    # exists to detect. Routed through the Hadoop FS API so non-local
    # roots (hdfs://, s3a://) behave the same as local paths.
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(f"{path}/{_MANIFEST}")
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    fs.delete(jpath, True)
    shards.write.partitionBy("shard_id").mode("overwrite").parquet(f"{path}/{_DATA}")
    # read-back with the writer's schema (audits what actually landed on
    # disk; the explicit schema also keeps an empty export readable —
    # schema inference would raise on a directory of zero parquet files)
    written = spark.read.schema(shards.schema).parquet(f"{path}/{_DATA}")
    manifest = (
        written.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(weight_col).cast("long").alias("total_weight"),
        )
        .withColumn("budget", F.lit(budget).cast("long"))
    )
    # one file: the manifest is per-shard rows (tiny) and its single
    # part file doubles as the completion marker
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/{_MANIFEST}")
    return spark.read.parquet(f"{path}/{_MANIFEST}")


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Manifest of a completed export; raises (path-not-found) on an
    incomplete one — the caller's signal to re-export."""
    return spark.read.parquet(f"{path}/{_MANIFEST}")


def read_shard(spark: SparkSession, path: str, shard_id: int) -> DataFrame:
    """One shard's rows via partition pruning — the ``shard_id``
    predicate resolves against the directory layout, so only that
    shard's files are listed/scanned."""
    return spark.read.parquet(f"{path}/{_DATA}").where(F.col("shard_id") == shard_id)

"""Table catalog over the driver's parquet star schema.

The reference has no catalog — schema lives implicitly in each mapper's
parsing code (SURVEY §1.1). Here schemas are declared once; every read
goes through ``load_table`` so column pruning / predicate pushdown hit
the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark rejects by
        # default. nanosAsLong is a runtime-settable SQLConf, so set it
        # here rather than at session build — callers (e.g. the driver
        # harness) may hand us a vanilla SparkSession.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # parquet TIMESTAMP(NANOS) arrives as long (nanosAsLong conf);
        # truncate to micros — the engine's timestamp grain
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so the whole engine surface
    is reachable from ``spark.sql`` (SURVEY §7 design note)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

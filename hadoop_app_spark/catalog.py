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
    try:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            df.schema  # force analysis so a nanos-rejecting build fails here
    except Exception:
        if name != "events":
            raise
        # pre-4.1 builds reject TIMESTAMP(NANOS) unless this legacy conf
        # (runtime-settable) maps it to a nanosecond long
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.parquet stores parquet TIMESTAMP(NANOS). Spark 4.1 reads
        # it natively as TIMESTAMP_NTZ truncated to micros; older builds
        # need spark.sql.legacy.parquet.nanosAsLong and deliver a raw
        # nanosecond long. Normalize both to TIMESTAMP_NTZ — the
        # wall-clock-naive type whose formatting/windowing is independent
        # of the caller session's timezone, matching the naive-timestamp
        # oracle semantics under ANY SparkSession the harness hands us.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        elif isinstance(ts_type, T.TimestampType):
            # LTZ read (explicit-schema path): reinterpret as naive
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so the whole engine surface
    is reachable from ``spark.sql`` (SURVEY §7 design note)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

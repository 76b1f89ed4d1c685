"""Text sinks matching the reference's output shapes.

- k\\tv lines (default TextOutputFormat: BootStrap.java:32,38-39)
- value-only lines (NullWritable key: ReduceJoinJob.java:81-82)
- uncompressed output + overwrite-if-exists (ReduceJoinJob.java:72,85-88)
  map to writer options; Spark's committer replaces the delete-then-write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_kv_text(df: DataFrame, path: str, key_col: str, value_col: str, sep: str = "\t") -> None:
    """``key<sep>value`` per line, uncompressed, overwrite (S8/S10/S11)."""
    (
        df.select(F.concat_ws(sep, F.col(key_col).cast("string"), F.col(value_col).cast("string")).alias("value"))
        .write.mode("overwrite")
        .option("compression", "none")
        .text(path)
    )


def write_text_lines(df: DataFrame, path: str, line_col: str = "value") -> None:
    """Pre-formatted line per row (value-only sink, S9)."""
    (
        df.select(F.col(line_col).cast("string").alias("value"))
        .write.mode("overwrite")
        .option("compression", "none")
        .text(path)
    )


# columnar/row format matrix the engine can round-trip natively.
# avro is deliberately ABSENT: Spark ships it as an external module
# (spark-avro jar) not present in this environment — callers get a
# clear error here instead of Spark's "Failed to find data source".
TABLE_FORMATS = ("parquet", "orc", "json", "csv")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    compression: str | None = None,
    header: bool = True,
) -> None:
    """Format-generic table sink (overwrite). parquet/orc carry the
    schema in-file; json/csv are interchange sinks — csv writes a
    header so :func:`read_table` can rebuild column names, and both
    lose exact types (read back with an explicit schema when it
    matters; see read_table).

    Scale note: identical plan shape for every format — one narrow
    write per partition, no exchange added; format choice is an I/O
    and ecosystem decision (parquet/orc: footer-stats pruning +
    column pruning; json/csv: none — never pick them for the 100 TB
    fact tables, they exist for export/ingest edges)."""
    if fmt not in TABLE_FORMATS:
        raise ValueError(f"format {fmt!r} not supported; choose from {TABLE_FORMATS}")
    w = df.write.mode("overwrite").format(fmt)
    if compression is not None:
        w = w.option("compression", compression)
    if fmt == "csv":
        w = w.option("header", str(header).lower())
    w.save(path)


def read_table(spark, path: str, fmt: str = "parquet", schema=None, header: bool = True):
    """Format-generic table source. For json/csv pass ``schema``
    (DDL string or StructType) to pin exact types — otherwise Spark
    infers, which costs an extra pass AND can widen types (csv
    integers -> int vs long depends on the data seen). ``header``
    must mirror what write_table was given for csv — reading a
    header-less file with header=True silently eats the first data
    row of every file."""
    if fmt not in TABLE_FORMATS:
        raise ValueError(f"format {fmt!r} not supported; choose from {TABLE_FORMATS}")
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", str(header).lower())
    return r.load(path)


def overwrite_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Dynamic partition overwrite — the BACKFILL sink contract: write
    ``df`` into the ``partition_cols``-partitioned parquet table at
    ``path``, replacing ONLY the partitions ``df`` actually contains
    and leaving every other partition byte-untouched.

    This is the idempotent day-rewrite every 100 TB pipeline runs
    (late data arrived, a bug fix reprocessed one day): static
    overwrite (Spark's default ``partitionOverwriteMode=STATIC``)
    would DELETE THE WHOLE TABLE first — the classic destroyed-table
    incident — so this helper pins ``dynamic`` on the single write
    instead of trusting session config, and re-reads are safe at any
    point because each partition directory swap is committer-atomic
    per partition.

    The reference's closest shape is the `dt=` daily batch job
    (UserNewcar.java's dt-partitioned inputs); this is the WRITE side
    of that layout done safely.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )

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

"""Compressed-text ingest (reference S13: LZO on the classpath,
pom.xml:102-105 `com.hadoop.gplcompression:hadoop-lzo`).

Spark's text/CSV/JSON readers decompress transparently by file
extension through the Hadoop codec factory — `.gz` (universal, Java
zlib, works without native libs), `.bz2` (splittable), `.deflate`,
and `.zst`/`.lz4`/`.snappy` where native Hadoop libs are present.
So "LZO support" needs no code at all: `spark.read.text("x.gz")`
just works, and `read_text` below only adds the catalog-style entry
point plus the scale warnings a 100 TB ingest needs to surface.

Conscious substitutions vs the reference (documented, SURVEY §2.1):
- LZO itself is GPL-encumbered and its Hadoop bindings aren't in this
  container; `.gz` exercises the identical codec-factory path.
- Columnar storage is parquet+zstd (see `session.py`), strictly
  dominating RCFile+LZO for analytics.

Scale note: gzip (and LZO without an index) is NOT splittable — one
.gz file = one task regardless of size. A 100 TB corpus must arrive
as MANY files (or bz2/zstd-seekable); `read_text` warns when a large
non-splittable file would pin a single core.
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import DataFrame, SparkSession

# extensions Hadoop's codec factory decompresses on read
TEXT_CODEC_EXTENSIONS = (".gz", ".bz2", ".deflate", ".zst", ".lz4", ".snappy")

# codecs that cannot be split: one file -> one task
NON_SPLITTABLE = (".gz", ".deflate", ".zst", ".lz4", ".snappy")

_NON_SPLITTABLE_WARN_BYTES = 256 * 1024 * 1024


def is_splittable(path: str) -> bool:
    """False when the extension marks a non-splittable codec (one file = one task)."""
    return not path.endswith(NON_SPLITTABLE)


def read_text(spark: SparkSession, path: str | list[str], wholetext: bool = False) -> DataFrame:
    """Line scan over plain or compressed text (S1 + S13).

    Decompression is by extension via the Hadoop codec factory — no
    per-codec code here. Warns when a single non-splittable file is
    large enough to pin one core for the whole scan.
    """
    for p in [path] if isinstance(path, str) else path:
        if not is_splittable(p):
            size = _file_size(spark, p)
            if size is not None and size > _NON_SPLITTABLE_WARN_BYTES:
                warnings.warn(
                    f"{p} is {size >> 20} MiB of non-splittable "
                    f"{os.path.splitext(p)[1]} — it will scan as ONE task; "
                    "split the input into many files for parallel ingest",
                    stacklevel=2,
                )
    return spark.read.text(path, wholetext=wholetext)


def _file_size(spark: SparkSession, p: str) -> int | None:
    """Size in bytes for local AND remote (hdfs://, s3a://) paths — the
    single-task warning is pointless if it only fires on the driver's
    local disk, which is exactly where 500 GiB gzips don't live."""
    if os.path.isfile(p):
        try:
            return os.path.getsize(p)
        except OSError:
            return None
    try:
        jvm = spark.sparkContext._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(p)
        fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        status = fs.getFileStatus(jpath)
        return None if status.isDirectory() else int(status.getLen())
    except Exception:
        return None  # missing path etc. — let spark.read.text report it

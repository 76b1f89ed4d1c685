"""File-level Bloom-index data skipping — point-lookup pruning beyond
min/max.

`sources/layout.py` gives range/Z-order clustering whose per-file
min/max prune RANGE predicates; this module adds the lakehouse's other
skipping primitive (Delta/Iceberg bloom filter indexes, ORC bloom
streams): a per-FILE Bloom filter over a high-cardinality column, so a
point lookup (`col IN (v1, v2, ...)`) reads only the files whose
filters pass — min/max is useless for a needle column whose values
interleave across the whole domain, a Bloom is not.

Mechanics (all on the repo's established md5-slice Bloom convention —
`operators/joins.key_bloom`: k <= 4 positions from one md5, 32-bit
words, bit_or merge, engine-reproducible bit-for-bit):

- **write_bloom_indexed**: range-cluster the rows by the indexed column
  (clustering is what makes per-file filters SELECTIVE — a hash
  distribution would smear every value across every file), write
  parquet, then ONE distributed pass over the written files
  (`input_file_name()`) builds each file's [word, bits] filter rows;
  the sidecar lands under `_bloom_index/` which parquet scans ignore by
  the `_`-prefix convention, exactly like `_metadata`.
- **read_bloom_skip**: load the sidecar (bounded: files x set words —
  the entire point of a Bloom is that this never scales with rows),
  probe the lookup values driver-side, and scan ONLY passing files;
  the exact predicate still applies after the scan, so false positives
  cost I/O, never correctness, and false negatives cannot exist.

At 100 TB: the sidecar for 100k files at m_bits=2^16 is <= 100k * 2k
words ~ 1.6 GB worst case and far less in practice (only set words are
stored); the lookup reads it once, then touches the handful of files
that can contain the needle — the difference between a full-corpus
scan and a seconds-long point query.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INDEX_DIR = "_bloom_index"


def write_bloom_indexed(
    df: DataFrame,
    path: str,
    col: str,
    files: int = 16,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> None:
    """Write ``df`` to ``path`` as ~``files`` range-clustered parquet
    files plus a per-file Bloom sidecar over ``col``."""
    from hadoop_app_spark.operators.joins import key_bloom

    spark = df.sparkSession
    df.repartitionByRange(files, F.col(col)).write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path).select(
        F.input_file_name().alias("file"), col
    )
    # one filter per file in one pass — key_bloom's grouped form owns
    # the md5-slice/32-bit-word/bit_or convention
    index = (
        key_bloom(back, col, m_bits, k, by=["file"])
        .withColumn("m_bits", F.lit(m_bits))
        .withColumn("k", F.lit(k))
    )
    index.write.mode("overwrite").parquet(f"{path}/{INDEX_DIR}")


def _probe_positions(value: str, m_bits: int, k: int) -> list[tuple[int, int]]:
    """(word, mask) pairs for one stringified value — the same md5
    slices the distributed builder uses."""
    h = hashlib.md5(value.encode("utf-8")).hexdigest()
    out = []
    for j in range(k):
        p = int(h[j * 8 : (j + 1) * 8], 16) % m_bits
        out.append((p // 32, 1 << (p % 32)))
    return out


def read_bloom_skip(
    spark: SparkSession, path: str, col: str, values: list
) -> tuple[DataFrame, dict]:
    """Rows of ``path`` where ``col`` is in ``values``, scanning only
    Bloom-passing files. Returns (DataFrame, stats) with stats =
    {"files_total", "files_read"} so pruning is observable."""
    idx = spark.read.parquet(f"{path}/{INDEX_DIR}").collect()
    if not idx:
        empty = spark.read.parquet(path).where(F.lit(False))
        return empty, {"files_total": 0, "files_read": 0}
    m_bits, k = idx[0]["m_bits"], idx[0]["k"]
    blooms: dict[str, dict[int, int]] = {}
    for r in idx:
        blooms.setdefault(r["file"], {})[r["word"]] = r["bits"]
    probes = [_probe_positions(str(v), m_bits, k) for v in values]
    passing = [
        f
        for f, words in sorted(blooms.items())
        if any(
            all(words.get(w, 0) & m for w, m in probe) for probe in probes
        )
    ]
    stats = {"files_total": len(blooms), "files_read": len(passing)}
    if not passing:
        empty = spark.read.parquet(path).where(F.lit(False))
        return empty, stats
    df = spark.read.parquet(*passing)
    # the exact predicate still applies: Bloom false positives cost
    # I/O only, and parquet row-group stats prune further inside files
    return df.where(F.col(col).isin(values)), stats

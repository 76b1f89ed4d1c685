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
        # recorded so point_lookup's auto-discovery can verify the
        # sidecar indexes the column being probed (a filter on any
        # OTHER column must fall back to a full scan, never prune)
        .withColumn("indexed_col", F.lit(col))
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


def _load_index(spark: SparkSession, path: str, missing_ok: bool = True):
    """(rows, blooms, m_bits, k) from a sidecar — blooms is
    {file: {word: bits}}. Bounded by design: files x SET words only.
    With ``missing_ok`` a missing/unreadable sidecar returns
    ([], {}, 0, 0) — the shared "no usable index" signal for callers
    that have a correct fallback; ``missing_ok=False`` re-raises, for
    callers whose contract REQUIRES the index (an empty answer there
    would be a wrong answer, not a degraded one)."""
    try:
        idx = spark.read.parquet(f"{path}/{INDEX_DIR}").collect()
    except Exception:
        if not missing_ok:
            raise
        idx = []
    if not idx:
        return [], {}, 0, 0
    blooms: dict[str, dict[int, int]] = {}
    for r in idx:
        blooms.setdefault(r["file"], {})[r["word"]] = r["bits"]
    return idx, blooms, idx[0]["m_bits"], idx[0]["k"]


def _sidecar_col(idx) -> str | None:
    """The column a loaded sidecar indexes, or None when unknown
    (pre-r8 sidecars lack the field — treated as matching by the
    documented compatibility convention)."""
    if not idx:
        return None
    if "indexed_col" not in idx[0].__fields__:
        return None
    return idx[0]["indexed_col"]


def _passing_files(blooms, m_bits: int, k: int, values: list) -> list[str]:
    probes = [_probe_positions(str(v), m_bits, k) for v in values]
    return [
        f
        for f, words in sorted(blooms.items())
        if any(
            all(words.get(w, 0) & m for w, m in probe) for probe in probes
        )
    ]


def _skip_scan(
    spark: SparkSession,
    path: str,
    col: str,
    values: list,
    blooms,
    m_bits: int,
    k: int,
) -> tuple[DataFrame, dict]:
    """Core of read_bloom_skip over an ALREADY-LOADED sidecar, so
    auto-discovery callers pay exactly one sidecar read."""
    if not blooms:
        empty = spark.read.parquet(path).where(F.lit(False))
        return empty, {"files_total": 0, "files_read": 0}
    passing = _passing_files(blooms, m_bits, k, values)
    stats = {"files_total": len(blooms), "files_read": len(passing)}
    if not passing:
        empty = spark.read.parquet(path).where(F.lit(False))
        return empty, stats
    df = spark.read.parquet(*passing)
    # the exact predicate still applies: Bloom false positives cost
    # I/O only, and parquet row-group stats prune further inside files
    return df.where(F.col(col).isin(values)), stats


def read_bloom_skip(
    spark: SparkSession, path: str, col: str, values: list
) -> tuple[DataFrame, dict]:
    """Rows of ``path`` where ``col`` is in ``values``, scanning only
    Bloom-passing files. Returns (DataFrame, stats) with stats =
    {"files_total", "files_read"} so pruning is observable.

    The sidecar is REQUIRED here: this reader's contract is
    bloom-pruned-but-complete, and a missing index must raise rather
    than quietly answer "no rows" (use `point_lookup` for the
    auto-discovering form that falls back to a plain scan)."""
    _, blooms, m_bits, k = _load_index(spark, path, missing_ok=False)
    return _skip_scan(spark, path, col, values, blooms, m_bits, k)


def point_lookup(
    spark: SparkSession, path: str, col: str, values: list
) -> tuple[DataFrame, dict]:
    """``read_bloom_skip`` with sidecar AUTO-DISCOVERY: load
    ``{path}/_bloom_index`` ONCE and use it when it exists AND indexes
    ``col``; otherwise fall back to a plain filtered scan (parquet
    min/max row-group pruning still applies there — just no file-level
    Bloom skipping). Stats gains ``"index": "bloom" | "none"`` so
    callers can see which path served them.

    This is the reader a downstream consumer calls without knowing how
    the table was written — the lakehouse contract where indexes are a
    property of the TABLE, not an argument of the query (Delta/Iceberg
    bloom filter indexes behave the same way).

    Cost shape: discovery is a ONE-ROW probe (missing or
    foreign-column sidecars never pay a full sidecar load); on a match
    the sidecar is loaded exactly once and handed to the scan.
    """
    try:
        head = spark.read.parquet(f"{path}/{INDEX_DIR}").limit(1).collect()
    except Exception:
        head = []
    sc = _sidecar_col(head)
    if head and (sc is None or sc == col):
        _, blooms, m_bits, k = _load_index(spark, path)
        if blooms:
            df, stats = _skip_scan(spark, path, col, values, blooms, m_bits, k)
            return df, {**stats, "index": "bloom"}
    df = spark.read.parquet(path).where(F.col(col).isin(values))
    return df, {"files_total": None, "files_read": None, "index": "none"}


def retract_ids(
    spark: SparkSession, path: str, col: str, values: list
) -> dict:
    """Delete every row where ``col`` is in ``values`` by REWRITING ONLY
    the Bloom-passing files — the retraction/right-to-be-forgotten
    operator a 100 TB corpus needs (a contaminated-id or takedown list
    arrives AFTER the corpus is built; a full-corpus rewrite for a
    thousand ids is absurd when an index names the handful of files
    that can contain them).

    Mechanics: Bloom-passing files are re-read, filtered, and their
    replacements written via a scratch dir + atomic per-file rename into
    ``path``; the originals are removed and the sidecar is updated in
    the same pass (surviving rows kept, new files' filters built by the
    same grouped ``key_bloom``). False positives cost a no-op rewrite
    of that file, never correctness; false negatives cannot exist, so
    retraction is COMPLETE. Completeness also governs the degraded
    paths: when the sidecar is missing OR indexes a DIFFERENT column,
    EVERY data file is a candidate (full rewrite, no pruning) — a
    takedown must never silently no-op because the table lacks the
    right index. Rows whose ``col`` is NULL are bystanders, not
    victims: the keep-filter ORs ``isNull`` so three-valued logic
    cannot drop them.

    Returns stats: {"files_total", "files_rewritten", "rows_removed"}.
    At 100 TB: work is proportional to |passing files|, not the corpus
    — with range-clustered layout and a k-id takedown list that is
    O(k) files.
    """
    import os
    import shutil
    import uuid

    from hadoop_app_spark.operators.joins import key_bloom

    def _local(p: str) -> str:
        return p[len("file:") :] if p.startswith("file:") else p

    def _canon(p: str) -> str:
        # file:///x URIs and plain /x paths must compare equal
        return "/" + _local(p).lstrip("/")

    idx, blooms, m_bits, k = _load_index(spark, path)
    sc = _sidecar_col(idx)
    prunable = bool(blooms) and (sc is None or sc == col)
    if prunable:
        passing = _passing_files(blooms, m_bits, k, values)
        files_total = len(blooms)
    else:
        # no sidecar over THIS column: every data file can contain a
        # victim row, so all of them are rewrite candidates. Only FLAT
        # layouts are rewritable here — a partitioned table's partition
        # values live in directory names, which the per-file rewrite
        # would destroy — so nested data dirs raise LOUDLY instead of
        # the two silent failure modes (no-op, or a rewrite that drops
        # the partition columns).
        nested = sorted(
            e
            for e in os.listdir(_local(path))
            if os.path.isdir(os.path.join(_local(path), e))
            and not e.startswith(("_", "."))
        )
        if nested:
            raise NotImplementedError(
                f"retract_ids without a matching Bloom sidecar needs a flat "
                f"parquet layout; {path} has partition directories "
                f"{nested[:3]}... — retract per-partition, or rewrite the "
                f"table through write_bloom_indexed/write_curated first"
            )
        passing = sorted(
            os.path.join(_local(path), f)
            for f in os.listdir(_local(path))
            if f.endswith(".parquet")
        )
        files_total = len(passing)
    stats = {"files_total": files_total, "files_rewritten": 0, "rows_removed": 0}
    if not passing:
        return stats
    col_set = spark.read.parquet(*passing).where(F.col(col).isin(values))
    stats["rows_removed"] = col_set.count()
    # isNull keeps NULL-key bystanders — ~isin alone is NULL for them
    kept = spark.read.parquet(*passing).where(
        ~F.col(col).isin(values) | F.col(col).isNull()
    )

    scratch = os.path.join(_local(path), f"_retract_{uuid.uuid4().hex}")
    # scratch lives UNDER path but `_`-prefixed, so concurrent readers
    # of the table never see half-written files
    kept.write.mode("overwrite").parquet(scratch)
    moved = []
    for fname in sorted(os.listdir(scratch)):
        if not fname.endswith(".parquet"):
            continue
        dst = os.path.join(_local(path), f"part-retract-{uuid.uuid4().hex}.parquet")
        os.rename(os.path.join(scratch, fname), dst)
        moved.append(dst)
    shutil.rmtree(scratch, ignore_errors=True)
    for f in passing:
        os.remove(_local(f))
    stats["files_rewritten"] = len(moved)

    if not idx:
        return stats  # no sidecar to maintain

    # sidecar refresh: drop retired files' rows, add the new files'
    # filters (same grouped kernel as the writer) — built over the
    # column the SIDECAR indexes, which on the degraded path is not
    # the retraction column. The surviving rows are bounded
    # driver-side metadata (files x set words), so the
    # read-modify-overwrite cycle never touches corpus-scale data.
    index_col = sc or col  # pre-r8 sidecars are assumed to index col
    retired = {_canon(p) for p in passing}
    survivors = [r for r in idx if _canon(r["file"]) not in retired]
    parts = []
    if moved:
        back = spark.read.parquet(*moved).select(
            F.input_file_name().alias("file"), index_col
        )
        parts.append(
            key_bloom(back, index_col, m_bits, k, by=["file"])
            .withColumn("m_bits", F.lit(m_bits))
            .withColumn("k", F.lit(k))
            .withColumn("indexed_col", F.lit(index_col))
        )
    if survivors:
        # inferred schema: pre-r8 sidecars lack indexed_col; unionByName
        # with allowMissingColumns null-fills either side's gap
        parts.append(spark.createDataFrame(survivors))
    idx_path = f"{path}/{INDEX_DIR}"
    if parts:
        new_idx = parts[0]
        for p in parts[1:]:
            new_idx = new_idx.unionByName(p, allowMissingColumns=True)
        rows = new_idx.collect()  # bounded metadata; frees the old files
        spark.createDataFrame(rows, new_idx.schema).write.mode(
            "overwrite"
        ).parquet(idx_path)
    else:
        shutil.rmtree(_local(idx_path), ignore_errors=True)
    return stats

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
RETRACT_MANIFEST = "_retract_manifest.json"


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
    # strict: prune ONLY when the sidecar RECORDS that it indexes the
    # probed column. A pre-r8 sidecar (no indexed_col field) may have
    # been built over a DIFFERENT column — pruning on its blooms would
    # silently DROP matching rows (wrong results, not just slower), so
    # legacy sidecars take the unpruned fallback here.
    # `read_bloom_skip` keeps the legacy treat-as-matching assumption:
    # its callers opted into the indexed contract explicitly.
    if head and sc == col:
        _, blooms, m_bits, k = _load_index(spark, path)
        if blooms:
            df, stats = _skip_scan(spark, path, col, values, blooms, m_bits, k)
            return df, {**stats, "index": "bloom"}
    df = spark.read.parquet(path).where(F.col(col).isin(values))
    return df, {"files_total": None, "files_read": None, "index": "none"}


def _finish_pending_retract(spark: SparkSession, base: str) -> bool:
    """Replay an interrupted ``retract_ids`` swap recorded in the
    table's ``_retract_manifest.json``; returns True when one was
    found and completed.

    Every step is idempotent (delete-if-exists, rename-if-not-done),
    so a crash DURING recovery just leaves the manifest for the next
    call. The sidecar is rebuilt whole from the live files rather than
    patched: a crash may have landed anywhere relative to the original
    run's incremental refresh, and a full rebuild (one pass over the
    table, bounded metadata out) is the state that is correct from
    any interruption point."""
    import json

    from hadoop_app_spark.operators.joins import key_bloom
    from hadoop_app_spark.sources import fs as hfs

    mpath = f"{base}/{RETRACT_MANIFEST}"
    if not hfs.exists(spark, mpath):
        return False
    man = json.loads(hfs.read_text(spark, mpath))
    for orig in man["deletes"]:
        if hfs.exists(spark, orig):
            hfs.delete(spark, orig)
    for src, dst in man["moves"]:
        if hfs.exists(spark, src) and not hfs.exists(spark, dst):
            hfs.rename(spark, src, dst)
    if hfs.exists(spark, man["scratch"]):
        hfs.delete(spark, man["scratch"], recursive=True)
    meta = man.get("index")
    idx_path = f"{base}/{INDEX_DIR}"
    # a crash between the staged sidecar write and its rename-in can
    # strand the staging dir; the rebuild below re-creates the sidecar
    # whole, so the stale staging copy is garbage either way
    hfs.delete(spark, idx_path + "__new", recursive=True)
    if meta:
        back = spark.read.parquet(base).select(
            F.input_file_name().alias("file"), meta["col"]
        )
        index = (
            key_bloom(back, meta["col"], meta["m_bits"], meta["k"], by=["file"])
            .withColumn("m_bits", F.lit(meta["m_bits"]))
            .withColumn("k", F.lit(meta["k"]))
            .withColumn("indexed_col", F.lit(meta["col"]))
        )
        rows = index.collect()  # bounded metadata; frees the old files
        spark.createDataFrame(rows, index.schema).write.mode("overwrite").parquet(
            idx_path
        )
    elif hfs.exists(spark, idx_path):
        hfs.delete(spark, idx_path, recursive=True)
    hfs.delete(spark, mpath)
    return True


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
    replacements written to a `_`-prefixed scratch dir under ``path``;
    then a MANIFEST (`_retract_manifest.json`) records the exact swap
    (originals to delete, scratch files to move), the originals are
    deleted, and the replacements renamed in. Deleting BEFORE renaming
    means a concurrent reader may transiently MISS kept rows from a
    mid-swap file but can never double-count them (the previous order
    exposed every kept row twice); a crash mid-swap leaves the
    manifest behind, and the next ``retract_ids`` call on the table
    finishes the recorded swap and rebuilds the sidecar before doing
    its own work — the swap is resumable, not atomic. All file ops go
    through the Hadoop FS API (`sources/fs.py`, the reference's
    BasicOperation pattern), so the same code runs on file://, hdfs://
    and s3a:// — where a 100 TB corpus actually lives.

    False positives cost a no-op rewrite of that file, never
    correctness; false negatives cannot exist, so retraction is
    COMPLETE. Completeness also governs the degraded paths: when the
    sidecar is missing, RECORDS a different column, or predates the
    ``indexed_col`` field (so its column is unknown), EVERY data file
    is a candidate (full rewrite, no pruning) — a takedown must never
    silently no-op or under-delete because the table lacks the right
    index. Rows whose ``col`` is NULL are bystanders, not victims: the
    keep-filter ORs ``isNull`` so three-valued logic cannot drop them.

    Returns stats: {"files_total", "files_rewritten", "rows_removed"}.
    At 100 TB: work is proportional to |passing files|, not the corpus
    — with range-clustered layout and a k-id takedown list that is
    O(k) files.
    """
    import json
    import uuid

    from hadoop_app_spark.operators.joins import key_bloom
    from hadoop_app_spark.sources import fs as hfs

    def _canon(p: str) -> str:
        # file:///x URIs and plain /x paths must compare equal
        q = p
        for pre in ("file://", "file:"):
            if q.startswith(pre):
                q = q[len(pre) :]
                break
        return "/" + q.lstrip("/")

    base = path.rstrip("/")
    _finish_pending_retract(spark, base)

    idx, blooms, m_bits, k = _load_index(spark, path)
    sc = _sidecar_col(idx)
    # completeness-strict: prune only when the sidecar RECORDS that it
    # indexes the retraction column; a legacy sidecar (unknown column)
    # must not prune — a wrong-column prune under-deletes silently.
    prunable = bool(blooms) and sc == col
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
        entries = hfs.list_status(spark, base)
        nested = sorted(
            e["name"]
            for e in entries
            if e["is_dir"] and not e["name"].startswith(("_", "."))
        )
        if nested:
            raise NotImplementedError(
                f"retract_ids without a matching Bloom sidecar needs a flat "
                f"parquet layout; {path} has partition directories "
                f"{nested[:3]}... — retract per-partition, or rewrite the "
                f"table through write_bloom_indexed/write_curated first"
            )
        passing = sorted(
            e["path"]
            for e in entries
            if not e["is_dir"] and e["name"].endswith(".parquet")
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

    scratch = f"{base}/_retract_{uuid.uuid4().hex}"
    # scratch lives UNDER path but `_`-prefixed, so concurrent readers
    # of the table never list half-written replacement files
    kept.write.mode("overwrite").parquet(scratch)
    moves = [
        (e["path"], f"{base}/part-retract-{uuid.uuid4().hex}.parquet")
        for e in hfs.list_status(spark, scratch)
        if not e["is_dir"] and e["name"].endswith(".parquet")
    ]
    # the manifest makes the swap resumable: written BEFORE the first
    # mutation, removed after the last, replayed by the next call if a
    # crash strands the table in between
    index_meta = (
        {"col": sc or col, "m_bits": m_bits, "k": k} if idx else None
    )
    hfs.write_text(
        spark,
        f"{base}/{RETRACT_MANIFEST}",
        json.dumps(
            {
                "scratch": scratch,
                "deletes": list(passing),
                "moves": [list(mv) for mv in moves],
                "index": index_meta,
            }
        ),
    )
    for f in passing:
        hfs.delete(spark, f)
    for src, dst in moves:
        hfs.rename(spark, src, dst)
    hfs.delete(spark, scratch, recursive=True)
    moved = [dst for _, dst in moves]
    stats["files_rewritten"] = len(moved)

    if not idx:
        hfs.delete(spark, f"{base}/{RETRACT_MANIFEST}")
        return stats  # no sidecar to maintain

    # sidecar refresh: drop retired files' rows, add the new files'
    # filters (same grouped kernel as the writer) — built over the
    # column the SIDECAR indexes, which on the degraded path is not
    # the retraction column. The rows are bounded metadata (files x
    # set words), but that is still ~10^5 word rows per big file, so
    # they stay JVM-SIDE end to end (r12): the old collect /
    # createDataFrame cycle serialized every filter word through the
    # Python driver three times (~1.5 s of the entry's wall). The new
    # sidecar is staged beside the old one and swapped by rename —
    # the manifest is still present until after the swap, and
    # `_finish_pending_retract` rebuilds the sidecar whole from live
    # files, so every crash window recovers.
    index_col = sc or col  # pre-r8 sidecars are assumed to index col
    retired = sorted({_canon(p) for p in passing})
    has_survivors = any(_canon(r["file"]) not in retired for r in idx)
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
    idx_path = f"{path}/{INDEX_DIR}"
    if has_survivors:
        # the same _canon normalization, in SQL: strip a file:(//)
        # scheme and collapse leading slashes to one
        canon = (
            "concat('/', regexp_replace(regexp_replace(file, "
            "'^file:(//)?', ''), '^/+', ''))"
        )
        parts.append(
            spark.read.parquet(idx_path).where(~F.expr(canon).isin(retired))
        )
    if parts:
        new_idx = parts[0]
        for p in parts[1:]:
            # pre-r8 sidecars lack indexed_col; unionByName with
            # allowMissingColumns null-fills either side's gap
            new_idx = new_idx.unionByName(p, allowMissingColumns=True)
        staging = idx_path + "__new"
        hfs.delete(spark, staging, recursive=True)
        new_idx.write.mode("overwrite").parquet(staging)
        hfs.delete(spark, idx_path, recursive=True)
        if not hfs.rename(spark, staging, idx_path):
            raise RuntimeError(
                f"retract_ids: sidecar swap rename {staging} -> {idx_path} failed"
            )
    else:
        hfs.delete(spark, idx_path, recursive=True)
    hfs.delete(spark, f"{base}/{RETRACT_MANIFEST}")
    return stats


def vacuum_indexed_table(
    spark: SparkSession, path: str, min_age_sec: float = 0.0
) -> dict:
    """Delete ORPHAN files from a Bloom-indexed table directory — the
    VACUUM half of the retraction/compaction lifecycle (Delta VACUUM's
    shape on the plain-parquet layout this module owns).

    Orphans exist because failure windows leave files behind: a crash
    before ``retract_ids`` wrote its manifest strands a ``_retract_*``
    scratch dir, and a writer that died mid-commit leaves part files no
    sidecar references. They are not just wasted bytes — a stray part
    file in the table directory is READ by every plain scan, silently
    duplicating rows, so vacuum is a correctness repair, not only
    hygiene.

    Safety order: (1) a pending retraction manifest is FINISHED first
    (its scratch files are in-flight state, not garbage); (2) the
    sidecar is the manifest of live files — every ``*.parquet`` data
    file it does NOT name, older than ``min_age_sec``, is deleted, as
    is any remaining ``_retract_*`` scratch dir (post-step-1 those can
    only be pre-manifest crash leftovers); (3) the sidecar itself, the
    manifest name, and partition/nested dirs are never touched. A
    table WITHOUT a sidecar has no live-file manifest, so vacuum
    REFUSES (ValueError) rather than guessing — deleting data on a
    heuristic is the one unforgivable failure here. ``min_age_sec``
    guards against racing an in-flight writer on eventually-visible
    stores; all ops go through the Hadoop FS API (file://, hdfs://,
    s3a://).

    Returns {"files_live", "orphans_removed", "scratch_dirs_removed",
    "bytes_reclaimed"}.
    """
    import time

    from hadoop_app_spark.sources import fs as hfs

    def _canon(p: str) -> str:
        q = p
        for pre in ("file://", "file:"):
            if q.startswith(pre):
                q = q[len(pre) :]
                break
        return "/" + q.lstrip("/")

    base = path.rstrip("/")
    _finish_pending_retract(spark, base)

    idx, _, _, _ = _load_index(spark, path)
    if not idx:
        raise ValueError(
            f"{path} has no {INDEX_DIR} sidecar: vacuum needs the sidecar's "
            f"live-file manifest to tell orphans from data — write the table "
            f"through write_bloom_indexed, or clean the directory manually"
        )
    live = {_canon(r["file"]) for r in idx}
    now_ms = time.time() * 1000.0
    stats = {
        "files_live": len(live),
        "orphans_removed": 0,
        "scratch_dirs_removed": 0,
        "bytes_reclaimed": 0,
    }
    for e in hfs.list_status(spark, base):
        young = (now_ms - e["mtime_ms"]) < min_age_sec * 1000.0
        if e["is_dir"]:
            if e["name"].startswith("_retract_") and not young:
                stats["scratch_dirs_removed"] += 1
                stats["bytes_reclaimed"] += sum(
                    f["size"] for f in hfs.list_files(spark, e["path"], True)
                )
                hfs.delete(spark, e["path"], recursive=True)
            continue  # sidecar dir, partition dirs: never touched
        if not e["name"].endswith(".parquet"):
            continue  # manifest, _SUCCESS markers, etc.
        if _canon(e["path"]) in live or young:
            continue
        stats["orphans_removed"] += 1
        stats["bytes_reclaimed"] += e["size"]
        hfs.delete(spark, e["path"])
    return stats

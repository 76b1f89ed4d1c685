"""Streaming CDC apply: a change-event stream continuously folded into
a keyed snapshot via ``foreachBatch``.

Extends ``operators.upsert.apply_changes`` (the batch CDC compactor,
S15's Spark-first answer) to Structured Streaming: each micro-batch of
change rows (upserts + tombstones) is applied to the current snapshot
and the next snapshot version is committed. This is the streaming
pattern for dimension tables / feature stores fed by a CDC firehose.

Why foreachBatch and not a stateful operator: the snapshot is
table-sized (up to the full 100 TB dimension), far beyond streaming
state-store budgets; foreachBatch hands each micro-batch to ordinary
BATCH Spark, so the anti-join + union runs with the same scale shape
as the batch operator (snapshot never shuffles, change batch
broadcasts). Versioned directories + an atomic pointer file stand in
for a table format's transaction log — a real deployment would write
Delta/Iceberg and MERGE INTO; the version dance below is the same
idea with plain parquet. The snapshot is key-hash partitioned and a
batch rewrites only the partitions its keys touch (the commit manifest
carries forward untouched partitions by reference), so per-batch I/O
is O(changed partitions) — at a 100 TB dimension the previous
full-snapshot rewrite per micro-batch would have been the bottleneck.

Within-batch ordering: micro-batches arrive in stream order, but rows
WITHIN one batch are unordered — ``seq_col`` (e.g. a CDC log offset)
picks the last writer per key per batch deterministically.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hadoop_app_spark.operators.upsert import apply_changes
from hadoop_app_spark.sources import fs as hfs
from hadoop_app_spark.streaming import _state


# internal partition column / dir prefix. Collision-resistant name: a
# bare "p" would silently clobber (and then lose) a user data column
# of that name across the first micro-batch
_PART = "__snap_p"


def _partition_col(keys: Sequence[str], n_partitions: int):
    """Deterministic snapshot partition for a key tuple. xxhash64 is a
    fixed algorithm (stable across sessions/restarts), so the same key
    always lands in the same partition dir."""
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_partitions)).cast("int")


def _partition_paths(
    spark,
    root: str,
    pvers: list[int],
    only: Sequence[int] | None = None,
    exact: bool = False,
) -> list[str]:
    """Data dirs for the requested partitions. With an *exact*
    (format-3) manifest the commit already recorded emptiness (-1), so
    every entry >= 0 has its dir on disk and a read costs ZERO
    per-partition existence probes (VERDICT r10 item 6 — at a year of
    daily versions the probes were O(partitions) metadata calls per
    read). Legacy format-2 manifests keep the probing fallback: a
    positive entry whose dir is absent is an empty partition
    (partitionBy writes no dir for a partition all of whose rows were
    deleted) — skipped."""
    idxs = range(len(pvers)) if only is None else only
    paths = []
    for i in idxs:
        if pvers[i] < 0:
            continue
        p = os.path.join(root, f"v{pvers[i]}", f"{_PART}={i}")
        if exact or hfs.exists(spark, p):
            paths.append(p)
    return paths


def _written_partitions(spark, vdir: str) -> set[int]:
    """Partition ids whose ``__snap_p=i`` dir the write under *vdir*
    actually produced — ONE non-recursive listing, the commit-time
    emptiness detection behind exact (format-3) manifests."""
    out = set()
    for e in hfs.list_status(spark, vdir):
        if e["is_dir"] and e["name"].startswith(f"{_PART}="):
            out.add(int(e["name"].split("=", 1)[1]))
    return out


def snapshot_at(spark, root: str, version: int) -> DataFrame:
    """TIME TRAVEL: the snapshot as of committed *version* — the
    read-at-version face of the versioned-snapshot layout (what a table
    format's ``VERSION AS OF`` gives for free; this is the same
    capability over the plain-parquet version dance).

    Each commit writes an IMMUTABLE per-version manifest sidecar
    (``_MANIFEST_v{n}``, `streaming/_state.write_manifest`) mapping
    every partition to the version dir holding its data as of that
    commit — the version log this reads (an FS-listing reconstruction
    alone would be WRONG for a partition whose keys were all deleted
    at v: "touched and emptied" and "untouched" both leave no v-dir).
    Retention: `expire_snapshots` reclaims directories no kept version
    references and truncates how far back this can travel — the same
    retention/VACUUM trade a lakehouse table format makes, with the
    expired versions failing loudly here (sidecar gone), never
    reconstructing a half-reclaimed state.

    ``version`` 0 reads the seed; the current version equals
    ``current_snapshot``.
    """
    cur, _, pvers, _ = _state.read_manifest(spark, root, fresh_version=0)
    if version > cur:
        raise ValueError(
            f"snapshot_at({root}): version {version} not committed yet "
            f"(current {cur})"
        )
    if version == 0 or pvers is None:
        return spark.read.parquet(os.path.join(root, f"v{version}"))
    at = _state.read_manifest_at(spark, root, version)
    if at is None:
        raise ValueError(
            f"snapshot_at({root}): no _MANIFEST_v{version} sidecar — the "
            "version was expired by retention (expire_snapshots) or "
            "predates per-version manifests; only versions with a "
            "manifest are travelable"
        )
    pvers_at, exact = at
    paths = _partition_paths(spark, root, pvers_at, exact=exact)
    if not paths:
        # every partition empty at v (all keys deleted): schema from
        # the required v0 seed
        return spark.read.parquet(os.path.join(root, "v0")).limit(0)
    return spark.read.parquet(*paths)


def expire_snapshots(
    spark, root: str, keep_last: int = 7, older_than_ms: int | None = None
) -> dict:
    """RETENTION for the versioned snapshot layout: drop the ability to
    time-travel to expired committed versions and reclaim every data
    directory no kept version references — the trade `snapshot_at`'s
    docstring names, made explicit (what Iceberg ``expire_snapshots``
    / a Delta VACUUM horizon does for a table format, over the
    plain-parquet version dance).

    Two horizons (VERDICT r11 item 7):

    - ``keep_last`` alone (the default): keep the newest ``keep_last``
      versions — a version-COUNT horizon.
    - ``older_than_ms`` (epoch millis): keep every version whose
      commit is at or after the cutoff, with ``keep_last`` demoted to
      the retain-at-least floor (Iceberg's ``retain_last``) so a
      quiet table never expires down to nothing. Real retention
      policies are "N days", not "N versions" — the rollup layout
      commits one version per MICRO-BATCH, so a version-count horizon
      means minutes at one trigger cadence and weeks at another; an
      age horizon survives cadence changes. The commit timestamp is
      the ``_MANIFEST_v{n}`` sidecar's mtime (written at commit, then
      immutable); a version whose sidecar is already gone (previously
      expired) stays expired regardless of policy.

    Reachability, not age, decides what is deleted: a partition
    UNTOUCHED since v1 is still served from its v1 directory by every
    later version's manifest, so ``v1/__snap_p=i`` must survive even
    when version 1 itself expires. The kept versions' manifests are
    the reachable set; a ``v{n}/__snap_p={i}`` directory appears in
    none of them -> deleted; an expired version's ``_MANIFEST_v{n}``
    sidecar is deleted, so `snapshot_at` fails LOUDLY on it (the
    "no sidecar" error) instead of reconstructing a half-reclaimed
    state. The ``v0`` seed directory always survives: it is the
    schema anchor the all-partitions-empty read path requires.

    Works on ANY root using this manifest family — the CDC snapshot
    AND the incremental rollup (`streaming/rollup.py`), whose
    one-version-per-micro-batch layout grows without bound until
    exactly this op reclaims it (pinned in tests/test_streaming.py).
    Metadata-only cost: O(kept versions) sidecar reads + one listing
    per surviving version dir — never a data scan. Crash-safe by
    deletion order (sidecars of expired versions first, then
    unreachable data dirs): a crash mid-expiry leaves either an
    already-unreadable version or still-reachable data, never a
    readable version with missing partitions. Returns
    ``{"kept", "expired", "dirs_deleted", "manifests_deleted"}``.
    """
    cur, _, pvers, _ = _state.read_manifest(spark, root, fresh_version=0)
    if pvers is None:
        # legacy / seed-only layout: one whole-dir version, no manifest
        # chain to prune
        return {"kept": [cur], "expired": [], "dirs_deleted": 0,
                "manifests_deleted": 0}
    if keep_last < 1:
        raise ValueError("expire_snapshots: keep_last must be >= 1")
    floor = set(range(max(1, cur - keep_last + 1), cur + 1))
    if older_than_ms is None:
        keep = sorted(floor)
    else:
        age_kept = set()
        for v in range(1, cur + 1):
            if v in floor:
                continue  # the retain-at-least floor keeps it anyway
            sidecar = f"{root}/_MANIFEST_v{v}"
            if not hfs.exists(spark, sidecar):
                continue  # previously expired: stays expired
            st = hfs.list_status(spark, sidecar)
            if st and st[0]["mtime_ms"] >= older_than_ms:
                age_kept.add(v)
        keep = sorted(floor | age_kept)
    expired = [v for v in range(1, cur + 1) if v not in keep]
    reachable: set[tuple[int, int]] = set()
    for v in keep:
        at = _state.read_manifest_at(spark, root, v)
        if at is None:
            raise ValueError(
                f"expire_snapshots({root}): kept version {v} has no "
                "manifest sidecar — refusing to compute reachability "
                "from an incomplete version log"
            )
        for i, pv in enumerate(at[0]):
            if pv >= 0:
                reachable.add((pv, i))
    manifests_deleted = 0
    for v in expired:
        if hfs.delete(spark, f"{root}/_MANIFEST_v{v}"):
            manifests_deleted += 1
    dirs_deleted = 0
    for v in range(1, cur + 1):
        vdir = f"{root}/v{v}"
        if not hfs.exists(spark, vdir):
            continue
        remaining = False
        for e in hfs.list_status(spark, vdir):
            if e["is_dir"] and e["name"].startswith(f"{_PART}="):
                i = int(e["name"].split("=", 1)[1])
                if (v, i) in reachable:
                    remaining = True
                else:
                    hfs.delete(spark, e["path"], recursive=True)
                    dirs_deleted += 1
        if not remaining and v in expired:
            hfs.delete(spark, vdir, recursive=True)
    return {
        "kept": keep,
        "expired": expired,
        "dirs_deleted": dirs_deleted,
        "manifests_deleted": manifests_deleted,
    }


def current_snapshot(spark, root: str) -> DataFrame:
    """The latest committed snapshot version under *root*."""
    version, _, pvers, exact = _state.read_manifest(spark, root, fresh_version=0)
    if pvers is None:
        # legacy / seed layout: one whole-snapshot dir
        return spark.read.parquet(os.path.join(root, f"v{version}"))
    paths = _partition_paths(spark, root, pvers, exact=exact)
    if not paths:
        # every key deleted: schema from the (required) v0 seed
        return spark.read.parquet(os.path.join(root, "v0")).limit(0)
    return spark.read.parquet(*paths)


def last_writer_wins(
    changes: DataFrame, keys: Sequence[str], seq_col: str
) -> DataFrame:
    """Compact a change batch to one row per key: highest *seq_col*
    wins (ties broken by it being unique, e.g. a log offset). A keyed
    window — scale-safe, partitioned by the change keys."""
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def table_format_available(name: str) -> bool:
    """Feature-detect a lakehouse table-format integration. 'delta'
    checks BOTH sides of the integration: the delta-spark Python
    package AND a JVM that can actually run Delta (the active session
    carries DeltaSparkSessionExtension, or the DeltaTable class
    resolves on the driver JVM) — the Python package alone does not
    mean the jars are on the classpath, and the 'construct
    DeltaMergeTarget when True' contract must not fail mid-stream
    (ADVICE r5). 'iceberg' checks the session's extension conf. Both
    are absent in the test container — callers (and tests) must treat
    False as 'use the parquet snapshot stand-in', not an error."""
    if name == "delta":
        import importlib.util

        if importlib.util.find_spec("delta") is None:
            return False
        try:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            if spark is None:
                return False
            ext = spark.conf.get("spark.sql.extensions", "") or ""
            if "DeltaSparkSessionExtension" in ext:
                return True
            # extension not declared — probe the JVM classpath directly
            # (covers sessions built by delta's configure_spark_with_...
            # helper where conf inspection can miss cloned sessions)
            jvm = spark.sparkContext._jvm
            jvm.java.lang.Class.forName("io.delta.tables.DeltaTable")
            return True
        except Exception:
            return False
    if name == "iceberg":
        try:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            if spark is None:
                return False
            ext = spark.conf.get("spark.sql.extensions", "") or ""
            return "IcebergSparkSessionExtensions" in ext
        except Exception:
            return False
    raise ValueError(f"unknown table format {name!r}")


class DeltaMergeTarget:
    """SnapshotTarget that folds each compacted change batch into a
    Delta table with MERGE — the real-table-format twin of the
    partitioned-parquet version dance below. Same contract: the batch
    arrives already last-writer-wins compacted; ``op_col`` 'D' rows
    delete, everything else upserts. Delta's transaction log replaces
    the manifest/pointer, and MERGE's file-level pruning replaces the
    key-hash partition selection — both give O(changed files) I/O.

    Construct only when ``table_format_available('delta')``; the
    import is deferred so this module loads without the package."""

    def __init__(self, path: str, keys: Sequence[str], op_col: str = "op"):
        self.path = path
        self.keys = list(keys)
        self.op_col = op_col

    def read(self, batch_or_spark) -> DataFrame:
        """Current target contents — the matview sink's view scan.
        Accepts a SparkSession (duck-typed: anything with .read)."""
        return batch_or_spark.read.format("delta").load(self.path)

    def apply(self, batch: DataFrame, batch_id: int) -> None:
        from delta.tables import DeltaTable  # deferred: optional package

        spark = batch.sparkSession
        data_cols = [c for c in batch.columns if c != self.op_col]
        if not DeltaTable.isDeltaTable(spark, self.path):
            # seed commit: inserts only (tombstones for absent keys no-op)
            batch.where(F.col(self.op_col) != "D").select(*data_cols).write.format(
                "delta"
            ).save(self.path)
            return
        t = DeltaTable.forPath(spark, self.path)
        cond = " AND ".join(f"t.{k} = s.{k}" for k in self.keys)
        sets = {c: f"s.{c}" for c in data_cols}
        (
            t.alias("t")
            .merge(batch.alias("s"), cond)
            .whenMatchedDelete(condition=f"s.{self.op_col} = 'D'")
            .whenMatchedUpdate(condition=f"s.{self.op_col} <> 'D'", set=sets)
            .whenNotMatchedInsert(condition=f"s.{self.op_col} <> 'D'", values=sets)
            .execute()
        )


class IcebergMergeTarget:
    """SnapshotTarget that folds each compacted change batch into an
    Iceberg table with MERGE INTO — the Iceberg twin of
    :class:`DeltaMergeTarget`, same ``apply(batch, batch_id)``
    contract: the batch arrives already last-writer-wins compacted;
    ``op_col`` 'D' rows delete, everything else upserts. Iceberg's
    snapshot metadata replaces the manifest/pointer and MERGE INTO's
    file-level pruning replaces the key-hash partition selection —
    O(changed files) I/O per batch, identical stream wiring.

    ``table`` is a catalog-qualified Iceberg table identifier (e.g.
    ``iceberg_cat.db.events``), not a path: Iceberg MERGE goes through
    a catalog, unlike Delta's path-addressed forPath. Construct only
    when ``table_format_available('iceberg')``; everything here is
    plain Spark SQL so the module loads without the runtime jar."""

    def __init__(self, table: str, keys: Sequence[str], op_col: str = "op"):
        self.table = table
        self.keys = list(keys)
        self.op_col = op_col
        # batch_id alone is NOT collision-safe across streams (each
        # stream numbers its own batches from 0, so two concurrent
        # streams in one session both see batch_id=0); a per-target
        # token makes the temp-view name unique per (target, batch)
        self._token = uuid.uuid4().hex[:12]

    def read(self, spark) -> DataFrame:
        """Current target contents — the matview sink's view scan."""
        return spark.table(self.table)

    def apply(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        data_cols = [c for c in batch.columns if c != self.op_col]
        if not spark.catalog.tableExists(self.table):
            # seed commit: inserts only (tombstones for absent keys no-op)
            batch.where(F.col(self.op_col) != "D").select(*data_cols).writeTo(
                self.table
            ).using("iceberg").create()
            return
        # MERGE INTO is SQL-only; register the batch as a temp view
        # scoped by (per-target token, batch_id) so concurrent streams
        # can't clobber each other's view
        src = f"_cdc_merge_src_{self._token}_{batch_id}"
        batch.createOrReplaceTempView(src)
        try:
            cond = " AND ".join(f"t.{k} = s.{k}" for k in self.keys)
            sets = ", ".join(f"t.{c} = s.{c}" for c in data_cols)
            cols = ", ".join(data_cols)
            vals = ", ".join(f"s.{c}" for c in data_cols)
            spark.sql(
                f"""
                MERGE INTO {self.table} t
                USING {src} s
                ON {cond}
                WHEN MATCHED AND s.{self.op_col} = 'D' THEN DELETE
                WHEN MATCHED AND s.{self.op_col} <> 'D' THEN UPDATE SET {sets}
                WHEN NOT MATCHED AND s.{self.op_col} <> 'D'
                  THEN INSERT ({cols}) VALUES ({vals})
                """
            )
        finally:
            spark.catalog.dropTempView(src)


def apply_changes_stream(
    change_stream: DataFrame,
    snapshot_root: str,
    keys: Sequence[str],
    op_col: str = "op",
    seq_col: str | None = None,
    checkpoint_dir: str | None = None,
    n_partitions: int = 16,
    target=None,
):
    """Fold a change stream into the snapshot at *snapshot_root*.

    The snapshot must be seeded as ``{root}/v0`` (pointer optional —
    absent reads as 0). The first batch repartitions the seed into
    ``n_partitions`` key-hash dirs (one full rewrite — the migration);
    every later batch reads ONLY the partitions its change keys hash
    into, merges, and writes those partitions under ``v{n+1}`` — an
    untouched partition's files are never rewritten, so per-batch I/O
    is O(changed partitions), not O(snapshot). The commit manifest
    (format-2 pointer) maps each partition to the version holding its
    current data and advances atomically, so readers never see a
    partial snapshot and a crashed batch leaves every partition intact.
    ``n_partitions`` is a first-write layout decision (size so one
    partition ≈ a comfortable executor read); later runs follow the
    manifest's count. Returns the StreamingQuery (caller awaits
    termination).

    ``target``: an object with ``apply(batch, batch_id)`` (e.g.
    :class:`DeltaMergeTarget` when delta-spark is installed) replaces
    the parquet version dance with a real table-format MERGE — the
    stream wiring (last-writer-wins compaction, foreachBatch,
    availableNow) is identical, so the same plan targets plain
    parquet here and Delta/Iceberg in a deployment that has them.
    """
    keys = list(keys)

    if target is not None:
        # MERGE semantics require at most one source row per key per
        # batch (Delta raises "multiple source rows matched" at
        # runtime, killing the stream) — unlike the parquet fold,
        # whose apply_changes tolerates duplicates. Demand the
        # compaction key up front instead of failing mid-stream.
        if seq_col is None:
            raise ValueError(
                "apply_changes_stream with a table-format target requires "
                "seq_col: MERGE needs one row per key per batch, and "
                "without a sequence column there is no deterministic "
                "last writer to compact to"
            )

        def fold_target(batch: DataFrame, batch_id: int) -> None:
            # drop the transport-only sequence column after compaction
            # so the table schema matches the parquet twin's (snapshot
            # columns + op handling, never the CDC plumbing)
            batch = last_writer_wins(batch, keys, seq_col).drop(seq_col)
            target.apply(batch, batch_id)

        writer = change_stream.writeStream.foreachBatch(fold_target).outputMode("update")
        if checkpoint_dir is not None:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        return writer.trigger(availableNow=True).start()

    def fold(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        version, last_batch, pvers, exact = _state.read_manifest(
            spark, snapshot_root, fresh_version=0
        )
        if batch_id <= last_batch:
            # at-least-once replay guard (apply_changes is idempotent,
            # but skipping avoids a spurious snapshot version; batch_id
            # is stable across retries)
            return
        if seq_col is not None:
            batch = last_writer_wins(batch, keys, seq_col)
        # persist: the (possibly last-writer-deduped) batch feeds both
        # the touched-partition collect and the merge write — without
        # pinning, the dedup window re-executes per action
        batch = batch.persist()
        nv = version + 1
        vdir = os.path.join(snapshot_root, f"v{nv}")
        if pvers is None:
            # one-time migration from the unpartitioned seed/legacy dir
            p = n_partitions
            snap = current_snapshot(spark, snapshot_root)
            nxt = apply_changes(snap, batch, keys, op_col=op_col)
            touched = list(range(p))
        else:
            p = len(pvers)  # layout is fixed by the first write
            # bounded collect: at most p distinct partition ids
            touched = sorted(
                r[_PART]
                for r in batch.select(
                    _partition_col(keys, p).alias(_PART)
                ).distinct().collect()
            )
            paths = _partition_paths(
                spark, snapshot_root, pvers, only=touched, exact=exact
            )
            snap = (
                spark.read.parquet(*paths)
                if paths
                else current_snapshot(spark, snapshot_root).limit(0)
            )
            nxt = apply_changes(snap, batch, keys, op_col=op_col)
        # every merged row hashes back into a touched partition (the
        # snapshot side came FROM them, the change side DEFINED them),
        # so one partitionBy write materializes exactly those dirs
        try:
            nxt.withColumn(_PART, _partition_col(keys, p)).write.partitionBy(_PART).mode(
                "overwrite"
            ).parquet(vdir)
        finally:
            batch.unpersist()
        # record EMPTINESS at commit (one listing of the version dir,
        # not one probe per partition per future read): a touched
        # partition the write produced no dir for was fully deleted ->
        # -1. Exactness carries forward only if the prior manifest was
        # exact (or this is the migration write, where every entry is
        # fresh); untouched format-2 entries stay probe-on-read.
        written = _written_partitions(spark, vdir)
        new_exact = exact or pvers is None  # migration rewrites everything
        new_pvers = [-1] * p if pvers is None else list(pvers)
        for i in touched:
            new_pvers[i] = nv if i in written else -1
        _state.write_manifest(
            spark, snapshot_root, nv, batch_id, new_pvers, exact=new_exact
        )

    writer = change_stream.writeStream.foreachBatch(fold).outputMode("update")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()

"""Versioned-snapshot pointer state shared by the foreachBatch sinks
(``streaming/cdc.py``, ``rollup.py``, ``similarity.py``).

The ``_CURRENT`` pointer file names the committed snapshot version and
the last applied micro-batch id (the at-least-once replay guard). All
pointer I/O goes through the Hadoop FileSystem API bound to the
session's configuration (``sources/fs.py``), so the same code works
when the snapshot root is ``file://``, ``hdfs://``, or any other
Hadoop-supported filesystem — a driver-local ``open()`` would silently
read "no state" for a perfectly healthy remote root.

Atomicity: the pointer is written to a ``.tmp`` sibling and swapped in
with ``FileContext.rename(OVERWRITE)``, which is atomic on HDFS and
POSIX — readers see the old or the new pointer, never a partial write.
Object stores without atomic rename (s3a) need a real table format's
transaction log (Delta/Iceberg) — the same caveat the snapshot
directories themselves carry.

Failure semantics: only a genuinely ABSENT pointer reads as fresh
state; any other read failure (permissions, transient remote error)
propagates — treating an unreadable pointer as "no state yet" would
silently restart a stream's fold from scratch.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from hadoop_app_spark.sources import fs as hfs

POINTER = "_CURRENT"


def read_state(
    spark: SparkSession, root: str, fresh_version: int = -1
) -> tuple[int, int]:
    """(committed version, last applied batch_id); (*fresh_version*, -1)
    when no pointer has ever been committed under *root*."""
    version, batch_id, _, _ = read_manifest(spark, root, fresh_version)
    return version, batch_id


def write_state(spark: SparkSession, root: str, version: int, batch_id: int) -> None:
    """Atomically commit (version, batch_id) as *root*'s pointer."""
    _commit(spark, root, f"{version} {batch_id}")


def read_manifest(
    spark: SparkSession, root: str, fresh_version: int = -1
) -> tuple[int, int, list[int] | None, bool]:
    """(version, last applied batch_id, per-partition versions, exact).

    The partition list is the partitioned-snapshot commit manifest:
    entry i names the version whose ``v{n}/__snap_p={i}`` directory holds
    partition i's current data (-1 = no data: never written, or emptied).
    None for legacy single-directory states — including a fresh root and
    the unpartitioned ``v0`` seed — which read as one whole-version dir.

    ``exact`` (format 3, VERDICT r10 item 6) means the commit recorded
    partition EMPTINESS: every entry >= 0 is guaranteed to have its
    directory on disk (partitionBy writes no dir for a partition all of
    whose rows were deleted — the writer detected those with one
    listing and recorded -1), so readers need ZERO per-partition
    existence probes. Format-2 manifests (exact=False) predate that:
    a positive entry may point at an absent dir and readers must probe.

    Format 2/3 pointer ("<fmt> batch_id n_partitions version" + a
    second line of per-partition versions) is distinguished from the
    legacy "version batch_id" line by its 4-token header; a legacy
    pointer whose version happens to be 2 has only 1-2 tokens.
    """
    pointer = f"{root}/{POINTER}"
    if not hfs.exists(spark, pointer):
        return fresh_version, -1, None, False
    lines = hfs.read_text(spark, pointer).splitlines()
    head = lines[0].split()
    if head[0] in ("2", "3") and len(head) == 4:
        pvers = [int(x) for x in lines[1].split()]
        assert len(pvers) == int(head[2])
        return int(head[3]), int(head[1]), pvers, head[0] == "3"
    return int(head[0]), int(head[1]) if len(head) > 1 else -1, None, False


def write_manifest(
    spark: SparkSession,
    root: str,
    version: int,
    batch_id: int,
    pvers: list[int],
    exact: bool = False,
) -> None:
    """Atomically commit a partitioned-snapshot manifest (format 3 when
    *exact* — every entry >= 0 has its directory on disk, -1 means no
    data — else the legacy format 2 whose positive entries readers must
    probe).

    Beside the live pointer, an IMMUTABLE per-version sidecar
    (``_MANIFEST_v{n}``) records the same body — the version log
    `snapshot_at` time-travels through (a listing reconstruction alone
    cannot distinguish "untouched at v" from "touched and emptied at
    v": both leave no v-dir for the partition). Written BEFORE the
    pointer swap, so a crash between them leaves only an unreachable
    orphan for a version the pointer never committed; the retry
    overwrites it."""
    fmt = "3" if exact else "2"
    body = f"{fmt} {batch_id} {len(pvers)} {version}\n" + " ".join(
        str(v) for v in pvers
    )
    hfs.write_text(spark, f"{root}/_MANIFEST_v{version}", body)
    _commit(spark, root, body)


def read_manifest_at(
    spark: SparkSession, root: str, version: int
) -> tuple[list[int], bool] | None:
    """(per-partition versions recorded when *version* committed,
    exact) — or None when no sidecar exists (a pre-feature snapshot, or
    version 0 / a legacy whole-dir layout — both read as one dir, no
    map needed)."""
    sidecar = f"{root}/_MANIFEST_v{version}"
    if not hfs.exists(spark, sidecar):
        return None
    lines = hfs.read_text(spark, sidecar).splitlines()
    head = lines[0].split()
    assert head[0] in ("2", "3") and int(head[3]) == version
    return [int(x) for x in lines[1].split()], head[0] == "3"


def _commit(spark: SparkSession, root: str, text: str) -> None:
    tmp = f"{root}/{POINTER}.tmp"
    hfs.write_text(spark, tmp, text)
    _rename_overwrite(spark, tmp, f"{root}/{POINTER}")


def _rename_overwrite(spark: SparkSession, src: str, dst: str) -> None:
    # FileSystem.rename refuses an existing destination on HDFS, and a
    # delete-then-rename pair opens a no-pointer window; FileContext's
    # three-arg rename overwrites atomically where the FS supports it
    jvm = spark._jvm
    src_p = jvm.org.apache.hadoop.fs.Path(src)
    dst_p = jvm.org.apache.hadoop.fs.Path(dst)
    ctx = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        src_p.toUri(), spark._jsc.hadoopConfiguration()
    )
    rename_cls = jvm.org.apache.hadoop.fs.Options.Rename
    opts = spark.sparkContext._gateway.new_array(rename_cls, 1)
    opts[0] = rename_cls.OVERWRITE
    ctx.rename(src_p, dst_p, opts)

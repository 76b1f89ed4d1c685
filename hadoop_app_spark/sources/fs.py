"""Filesystem utilities — the Spark-side equivalent of the reference's
HDFS client operations (BasicOperation.java:23-52: listFiles, open +
line-read, create + writeBytes).

Goes through the JVM Hadoop FileSystem API bound to the session's
configuration, so the same calls work on file://, hdfs://, s3a://, etc.
These are control-plane helpers (listing inputs, small config/marker
files) — bulk data moves through spark.read/write, never through here.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def list_files(spark: SparkSession, path: str, recursive: bool = False) -> list[dict]:
    """ls: [{path, size, is_dir}] — BasicOperation.java:23-31."""
    fs, hpath, _ = _fs(spark, path)
    out = []
    it = fs.listFiles(hpath, recursive)
    while it.hasNext():
        st = it.next()
        out.append(
            {"path": st.getPath().toString(), "size": st.getLen(), "is_dir": st.isDirectory()}
        )
    return sorted(out, key=lambda d: d["path"])


def read_text(spark: SparkSession, path: str, max_bytes: int = 1 << 20) -> str:
    """Sequential read of one (small) file — BasicOperation.java:33-44.
    Bounded by max_bytes: this is for markers/config, not data.

    Reads JVM-side via commons-io (a python-side read loop can't work:
    py4j passes byte[] buffers by value, so Java fills a copy)."""
    fs, hpath, jvm = _fs(spark, path)
    stream = fs.open(hpath)
    try:
        bounded = jvm.org.apache.commons.io.input.BoundedInputStream(stream, max_bytes)
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(bounded)
        return bytes(data).decode("utf-8")
    finally:
        stream.close()


def write_text(spark: SparkSession, path: str, content: str, overwrite: bool = True) -> None:
    """create + write — BasicOperation.java:46-52 (overwrite-if-exists
    matches the reference's delete-then-write pattern, S11)."""
    fs, hpath, _ = _fs(spark, path)
    stream = fs.create(hpath, overwrite)
    try:
        stream.write(bytearray(content.encode("utf-8")))
    finally:
        stream.close()


def list_status(spark: SparkSession, path: str) -> list[dict]:
    """Non-recursive ls of files AND directories: [{path, name, size,
    is_dir}]. `list_files` (FileSystem.listFiles) only surfaces files;
    callers that must detect partition subdirectories (retraction's
    flat-layout guard) need the directory entries too."""
    fs, hpath, _ = _fs(spark, path)
    out = []
    for st in fs.listStatus(hpath):
        p = st.getPath()
        out.append(
            {
                "path": p.toString(),
                "name": p.getName(),
                "size": st.getLen(),
                "is_dir": st.isDirectory(),
                "mtime_ms": st.getModificationTime(),
            }
        )
    return sorted(out, key=lambda d: d["path"])


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    """Rename/move within one filesystem via the Hadoop FS API;
    returns success. On HDFS this is the atomic metadata op every
    commit protocol builds on; on S3A it is a copy+delete (not
    atomic) — callers that need crash-safety must pair it with a
    manifest (see sources/skipping.retract_ids)."""
    fs, hsrc, jvm = _fs(spark, src)
    return fs.rename(hsrc, jvm.org.apache.hadoop.fs.Path(dst))


def copy_dir(spark: SparkSession, src: str, dst: str) -> None:
    """Recursive copy of directory *src* AS *dst* (dst is replaced) in
    ONE JVM call — FileUtil.copy, no per-file py4j round-trips. With a
    non-existent dst the source directory's CONTENTS land at the dst
    root (verified semantics, not the copy-into-subdir variant)."""
    fs, hsrc, jvm = _fs(spark, src)
    hdst = jvm.org.apache.hadoop.fs.Path(dst)
    if fs.exists(hdst):
        fs.delete(hdst, True)
    jvm.org.apache.hadoop.fs.FileUtil.copy(
        fs, hsrc, fs, hdst, False, spark._jsc.hadoopConfiguration()
    )


def exists(spark: SparkSession, path: str) -> bool:
    """True when *path* exists on the Hadoop filesystem (S12)."""
    fs, hpath, _ = _fs(spark, path)
    return fs.exists(hpath)


def delete(spark: SparkSession, path: str, recursive: bool = False) -> bool:
    """Delete *path* via the Hadoop FS API; returns success (S12)."""
    fs, hpath, _ = _fs(spark, path)
    return fs.delete(hpath, recursive)

"""Dynamic partition overwrite (sources/sinks.overwrite_partitions):
only the partitions present in the frame are replaced; every other
partition directory is left with its original FILES, not rewritten
equivalents."""

from __future__ import annotations

import os


def _part_files(path):
    out = {}
    for d in os.listdir(path):
        if d.startswith("day="):
            full = os.path.join(path, d)
            out[d] = {
                f: os.stat(os.path.join(full, f)).st_mtime_ns
                for f in os.listdir(full)
                if f.endswith(".parquet")
            }
    return out


def test_overwrite_touches_only_named_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from hadoop_app_spark.sources.sinks import overwrite_partitions

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0), (4, "c", 4.0)],
        "id int, day string, v double",
    )
    df.write.partitionBy("day").parquet(path)
    before = _part_files(path)

    fixed = spark.createDataFrame([(3, "b", 30.0)], "id int, day string, v double")
    overwrite_partitions(fixed, path, ["day"])
    after = _part_files(path)

    # untouched partitions keep the SAME files (names and mtimes)
    assert after["day=a"] == before["day=a"]
    assert after["day=c"] == before["day=c"]
    # the named partition was replaced, not appended
    assert after["day=b"] != before["day=b"]
    rows = {
        (r["id"], r["day"]): r["v"]
        for r in spark.read.parquet(path).collect()
    }
    assert rows == {(1, "a"): 1.0, (2, "a"): 2.0, (3, "b"): 30.0, (4, "c"): 4.0}


def test_overwrite_mode_is_per_write_not_session(spark, tmp_path):
    """The dynamic mode is pinned on the writer: even with the session
    conf explicitly STATIC (the destroy-the-table default), the helper
    must still replace only the named partition."""
    from hadoop_app_spark.sources.sinks import overwrite_partitions

    path = str(tmp_path / "t2")
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id int, day string, v double"
    )
    df.write.partitionBy("day").parquet(path)
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        fixed = spark.createDataFrame([(2, "b", 20.0)], "id int, day string, v double")
        overwrite_partitions(fixed, path, ["day"])
    finally:
        if old is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    rows = {(r["id"], r["day"]): r["v"] for r in spark.read.parquet(path).collect()}
    assert rows == {(1, "a"): 1.0, (2, "b"): 20.0}

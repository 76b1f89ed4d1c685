"""File-level Bloom-index skipping: pruning is real, correctness is
identical to the full scan, false negatives are impossible."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_app_spark.catalog import load_table
from hadoop_app_spark.sources.skipping import read_bloom_skip, write_bloom_indexed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def indexed(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("skip") / "lineitem")
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    write_bloom_indexed(li, path, "l_partkey", files=8)
    return path, li


def test_point_lookup_prunes_files(spark, indexed):
    path, li = indexed
    some = [r.l_partkey for r in li.select("l_partkey").distinct().limit(1).collect()]
    df, stats = read_bloom_skip(spark, path, "l_partkey", some)
    assert stats["files_total"] == 8
    # range clustering puts one key in few files; the bloom must skip
    # the rest (this is the point of the index)
    assert 0 < stats["files_read"] < stats["files_total"]
    exp = sorted(map(tuple, li.where(F.col("l_partkey").isin(some)).collect()))
    assert sorted(map(tuple, df.collect())) == exp


def test_no_false_negatives_for_any_probed_key(spark, indexed):
    path, li = indexed
    keys = [r.l_partkey for r in li.select("l_partkey").distinct().limit(40).collect()]
    df, stats = read_bloom_skip(spark, path, "l_partkey", keys)
    exp = sorted(map(tuple, li.where(F.col("l_partkey").isin(keys)).collect()))
    assert sorted(map(tuple, df.collect())) == exp
    assert stats["files_read"] <= stats["files_total"]


def test_absent_key_reads_few_or_no_files(spark, indexed):
    path, _ = indexed
    df, stats = read_bloom_skip(spark, path, "l_partkey", [10**15])
    assert df.count() == 0
    # an absent key passes only by Bloom false positives — at these
    # knob settings that must not be every file
    assert stats["files_read"] < stats["files_total"]


def test_sidecar_is_invisible_to_plain_scans(spark, indexed):
    path, li = indexed
    # the _bloom_index dir must not leak rows into a normal read
    assert spark.read.parquet(path).count() == li.count()

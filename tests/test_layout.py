"""Range-clustered parquet layout: prove the pruning, don't assume it.

Writes the same rows twice — range-clustered on the filter key vs
deliberately shuffled so every file spans the whole key range — and
asserts a selective predicate decodes far fewer rows from the
clustered layout (parquet footer min/max + pushed filters at work).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_app_spark.catalog import load_table
from hadoop_app_spark.sources.layout import (
    read_range_layout,
    scan_output_rows,
    write_range_layout,
)

SF = "/root/testdata/sf0.001"


def test_range_layout_prunes_selective_scans(spark, tmp_path):
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    total = orders.count()

    clustered = str(tmp_path / "clustered")
    random = str(tmp_path / "random")
    write_range_layout(orders, clustered, ["o_orderkey"], n_files=8)
    # adversarial twin: hash-shuffle on an unrelated column -> every
    # file's o_orderkey min/max spans the whole table, nothing skips
    orders.repartition(8, "o_custkey").write.mode("overwrite").parquet(random)

    lo, hi = 100, 199
    pred = F.col("o_orderkey").between(lo, hi)

    got_clustered = read_range_layout(spark, clustered).where(pred)
    got_random = spark.read.parquet(random).where(pred)
    rows_c = got_clustered.collect()
    rows_r = got_random.collect()
    # identical answers regardless of layout
    assert sorted(map(tuple, rows_c)) == sorted(map(tuple, rows_r))
    assert 0 < len(rows_c) < total

    decoded_clustered = scan_output_rows(got_clustered)
    decoded_random = scan_output_rows(got_random)
    # the random layout's scan output is bounded below by the match
    # count; the clustered one must decode only a narrow slice. Exact
    # skipping granularity depends on row-group sizing, so assert a
    # conservative 4x gap rather than a magic constant.
    assert decoded_clustered >= len(rows_c)
    assert decoded_clustered * 4 <= max(decoded_random, 1), (
        decoded_clustered,
        decoded_random,
    )


def test_range_layout_roundtrip_and_sort(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select("doc_id", "n_chars")
    path = str(tmp_path / "docs_layout")
    write_range_layout(docs, path, ["doc_id"], n_files=4)
    back = read_range_layout(spark, path)
    assert back.count() == docs.count()
    # files hold disjoint, internally sorted id ranges
    per_file = (
        back.withColumn("_f", F.input_file_name())
        .groupBy("_f")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in per_file)
    for (alo, ahi), (blo, bhi) in zip(spans, spans[1:]):
        assert ahi < blo, spans

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


def test_zorder_key_interleaves_bits(spark):
    from hadoop_app_spark.sources.layout import zorder_key

    df = spark.createDataFrame(
        [(0b101, 0b011), (0, 0), (1, 0), (0, 1)], "x long, y long"
    )
    got = {(r.x, r.y): r.z for r in df.select("x", "y", zorder_key(["x", "y"], bits=4).alias("z")).collect()}

    def morton(x, y, bits=4):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): morton(x, y) for (x, y) in got}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        zorder_key(["x"])
    with _pytest.raises(ValueError):
        zorder_key(["x", "y"], bits=32)


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """The Z-order claim, measured: a predicate on EITHER clustered
    column decodes a small fraction of the table, where a plain
    lexicographic (range) layout on (a, b) only prunes its LEADING
    column."""
    from hadoop_app_spark.sources.layout import (
        scan_output_rows,
        write_range_layout,
        write_zorder_layout,
    )

    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    total = li.count()

    zpath, lexpath = str(tmp_path / "z"), str(tmp_path / "lex")
    write_zorder_layout(li, zpath, ["l_orderkey", "l_partkey"], bits=14, n_files=16)
    write_range_layout(li, lexpath, ["l_orderkey"], sort_cols=["l_orderkey", "l_partkey"], n_files=16)

    def decoded(path, pred):
        df = spark.read.parquet(path).where(pred)
        df.collect()
        return scan_output_rows(df)

    k = li.agg(F.max("l_partkey")).head()[0]
    pred_lead = F.col("l_orderkey").between(10, 60)
    pred_second = F.col("l_partkey").between(1, max(2, k // 50))

    # leading-column predicate: both layouts prune
    assert decoded(zpath, pred_lead) < total * 0.6
    # second-column predicate: z-order still prunes; the lexicographic
    # layout decodes essentially everything
    z2 = decoded(zpath, pred_second)
    lex2 = decoded(lexpath, pred_second)
    assert z2 < lex2 * 0.7, (z2, lex2, total)


def test_zorder_negative_values_raise(spark, tmp_path):
    import pytest
    from hadoop_app_spark.sources.layout import write_zorder_layout

    df = spark.range(10).selectExpr("id AS a", "id - 5 AS b")
    with pytest.raises(ValueError, match="negative"):
        write_zorder_layout(df, str(tmp_path / "zneg"), ["a", "b"], bits=4)

"""Product-quantization ANN: determinism, compression contract, and
recall against the exact brute-force oracle (the engine-seeded
rows-only convention — like semdedup/pca, the float codebooks have no
SQL twin, so exactness is pinned here instead)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_app_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    train_pq_codebooks,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _queries(emb, n=5):
    return (
        emb.where(F.col("vec_id") < n)
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
    )


def test_codebooks_shape_and_determinism(spark):
    emb = _emb(spark)
    b1 = train_pq_codebooks(emb, m=8, n_codes=16, sample=256)
    b2 = train_pq_codebooks(emb.repartition(5), m=8, n_codes=16, sample=256)
    dim = len(emb.select("embedding").head()[0])
    assert len(b1) == 8 and all(len(b) == 16 for b in b1)
    assert all(len(c) == dim // 8 for b in b1 for c in b)
    # hash-ordered sample + numpy training: identical books regardless
    # of partitioning
    assert b1 == b2


def test_dim_not_divisible_raises(spark):
    emb = _emb(spark)
    dim = len(emb.select("embedding").head()[0])
    with pytest.raises(ValueError, match="divisible"):
        train_pq_codebooks(emb, m=dim - 1, sample=64)


def test_encode_shape_and_repartition_invariance(spark):
    emb = _emb(spark).limit(200)
    books = train_pq_codebooks(emb, m=8, n_codes=16, sample=128)
    c1 = {r.vec_id: r.codes for r in pq_encode(emb, books).collect()}
    c2 = {r.vec_id: r.codes for r in pq_encode(emb.repartition(7), books).collect()}
    assert c1 == c2
    assert all(len(v) == 8 for v in c1.values())
    n_codes = 16
    assert all(0 <= c < n_codes for v in c1.values() for c in v)


def test_full_shortlist_recovers_exact_ranking(spark):
    """With the shortlist covering the whole corpus, the exact re-rank
    sees every vector — output must EQUAL brute force, proving the
    re-rank arm restores exact scoring end-to-end."""
    from hadoop_app_spark.operators.similarity import brute_force_topk

    emb = _emb(spark).limit(150)
    n = emb.count()
    books = train_pq_codebooks(emb, m=8, n_codes=16, sample=128)
    q = _queries(emb, 3)
    got = {
        (r.query_id, r.rank): r.vec_id
        for r in pq_adc_topk(emb, q, books, k=5, shortlist=n).collect()
    }
    want = {
        (r.query_id, r.rank): r.vec_id
        for r in brute_force_topk(emb, q, k=5).select(
            "query_id", "vec_id", "rank"
        ).collect()
    }
    assert got == want


def test_adc_shortlist_recall_on_clustered_data(spark):
    """On clustered vectors (each point near one of 8 anchors) the ADC
    shortlist keeps the true neighbors: recall@5 >= 0.9 with a
    shortlist of 64 out of 400. The shortlist must exceed the ~50-point
    cluster population: inside a tight cluster every member encodes to
    the SAME codes (that is the quantization), so ADC cannot rank
    within it — the shortlist's job is to admit the whole ambiguity
    set and let the exact re-rank order it."""
    import numpy as np

    from hadoop_app_spark.operators.similarity import brute_force_topk

    rng = np.random.RandomState(7)
    anchors = rng.randn(8, 32) * 5.0
    rows = []
    for i in range(400):
        v = anchors[i % 8] + rng.randn(32) * 0.05
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = train_pq_codebooks(emb, m=8, n_codes=16, sample=400)
    q = _queries(emb, 4)
    approx = pq_adc_topk(emb, q, books, k=5, shortlist=64)
    exact = brute_force_topk(emb, q, k=5)
    by_q_a: dict = {}
    for r in approx.collect():
        by_q_a.setdefault(r.query_id, set()).add(r.vec_id)
    hits = tot = 0
    for r in exact.collect():
        tot += 1
        hits += int(r.vec_id in by_q_a.get(r.query_id, set()))
    assert hits / tot >= 0.9


def test_codes_are_the_small_column(spark):
    """The compression contract: the codes column is m small ints —
    the scoring scan's bytes-per-vector is ~m vs 8*dim for raw
    doubles (the 100 TB rationale)."""
    emb = _emb(spark).limit(50)
    books = train_pq_codebooks(emb, m=8, n_codes=16, sample=64)
    enc = pq_encode(emb, books)
    assert [f.name for f in enc.schema.fields] == ["vec_id", "codes"]
    dim = len(emb.select("embedding").head()[0])
    assert 8 < dim  # 8 ints standing in for `dim` doubles

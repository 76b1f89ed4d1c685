"""Trained quality classifier (operators/quality_model): bit-exact
parity with the pure-Python decimal reference, partitioning
invariance, feature parity, and fit sanity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_app_spark.operators.quality_model import (
    py_quality_features,
    py_train_quality_lr,
    quality_features,
    score_quality_lr,
    train_quality_lr,
)

TEXTS = [
    "The quick brown fox jumps over the lazy dog. It was a bright day!",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "NO punctuation here just words and words and words and words",
    "Short.",
    "",
    "Symbols @@@ ### $$$ %%% ^^^ &&& *** ((( ))) ___ +++ === ~~~!",
    "A proper paragraph, with several sentences. Each one ends well. "
    "Punctuation density is reasonable. Words are of natural length.",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
]


def _df(spark):
    rows = [(i, t, 1 if len(t) > 60 else 0) for i, t in enumerate(TEXTS)]
    return spark.createDataFrame(rows, "doc_id long, text string, y int"), rows


def test_feature_parity(spark):
    df, rows = _df(spark)
    got = {r.doc_id: list(r.x) for r in df.select("doc_id", quality_features("text").alias("x")).collect()}
    for i, t, _ in rows:
        assert got[i] == py_quality_features(t), t


def test_training_bit_exact_vs_python(spark):
    df, rows = _df(spark)
    w_spark = train_quality_lr(df, "text", "y", n_iter=12, lr=1.0)
    w_py = py_train_quality_lr(
        [(py_quality_features(t), float(y)) for _, t, y in rows], n_iter=12, lr=1.0
    )
    assert w_spark == w_py  # exact float equality, not approx


def test_training_invariant_under_partitioning(spark):
    df, _ = _df(spark)
    w1 = train_quality_lr(df.coalesce(1), "text", "y", n_iter=8)
    w2 = train_quality_lr(df.repartition(7), "text", "y", n_iter=8)
    assert w1 == w2


def test_fit_learns_label(spark):
    # the long-document label is linearly expressible in len_norm;
    # training must reach perfect separation on this tiny set
    df, rows = _df(spark)
    w = train_quality_lr(df, "text", "y", n_iter=50, lr=2.0)
    scored = score_quality_lr(df, "text", w, out_col="p")
    got = {r.doc_id: int(r.p >= 0.5) for r in scored.collect()}
    labels = {i: y for i, _, y in rows}
    acc = sum(got[i] == labels[i] for i in labels) / len(labels)
    assert acc >= 0.85


def test_null_text_is_empty_document(spark):
    # NULL text == empty doc: features non-null, the row participates
    # in every gradient sum (not silently dropped while counted in n),
    # and the Python twin agrees bit-for-bit
    df = spark.createDataFrame(
        [(0, None, 0), (1, "a proper document of real length here.", 1)],
        "doc_id long, text string, y int",
    )
    feats = {r.doc_id: list(r.x) for r in df.select("doc_id", quality_features("text").alias("x")).collect()}
    assert feats[0] == py_quality_features(None)
    assert all(v is not None for v in feats[0])
    w_spark = train_quality_lr(df, "text", "y", n_iter=5)
    w_py = py_train_quality_lr(
        [(py_quality_features(None), 0.0), (py_quality_features("a proper document of real length here."), 1.0)],
        n_iter=5,
    )
    assert w_spark == w_py
    scored = score_quality_lr(df, "text", w_spark).collect()
    assert all(r.quality_prob is not None for r in scored)


def test_empty_frame_raises(spark):
    df, _ = _df(spark)
    with pytest.raises(ValueError):
        train_quality_lr(df.where(F.lit(False)), "text", "y")


def test_null_label_raises(spark):
    # a NULL label would silently vanish from the decimal gradient sums
    # (err -> NULL) while still counting in n — must fail fast instead
    df, _ = _df(spark)
    df = df.withColumn("y", F.when(F.col("doc_id") == 2, F.lit(None)).otherwise(F.col("y")))
    with pytest.raises(ValueError, match="NULL"):
        train_quality_lr(df, "text", "y", n_iter=2)


def test_pinned_weights_rederive_at_sf001(spark):
    # PINNED_QUALITY_LR_WEIGHTS feeds the oracle-checked corpus_curation
    # learned gate; training is decimal-exact deterministic, so the
    # constant must re-derive EXACTLY from its documented recipe
    from hadoop_app_spark.operators.quality_model import PINNED_QUALITY_LR_WEIGHTS

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").withColumn(
        "y", (F.length("text") >= 300).cast("int")
    )
    w = train_quality_lr(d, "text", "y", n_iter=10, lr=1.0)
    assert tuple(w) == PINNED_QUALITY_LR_WEIGHTS

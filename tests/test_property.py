"""Property tests (SURVEY §5.4): the micro-format codecs and the
engine-agnostic hashes hold their invariants on generated inputs, not
just goldens. Examples are kept few (each runs a Spark job); the
generators cover the risky surface — regex-split metacharacters,
empty-ish strings, float round-trips.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from hadoop_app_spark.functions.text import doc_fingerprint, token_count
from hadoop_app_spark.sources.delim001 import decode_at_pairs, encode_at_pairs

_FP_MOD = 1_000_000_007

# values must avoid the codec's own delimiters (@ , $ \x01) — that is the
# format's contract (the reference never escapes; SURVEY §1.1)
_safe_text = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="._-"),
    min_size=1,
    max_size=12,
)

_settings = settings(
    max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)


@_settings
@given(pairs=st.lists(st.tuples(st.integers(0, 10**9), _safe_text), min_size=1, max_size=15))
def test_at_pairs_roundtrip(spark, pairs):
    df = spark.createDataFrame([(i, a, b) for i, (a, b) in enumerate(pairs)], "row int, id long, val string")
    encoded = df.groupBy().agg(
        F.concat_ws(",", F.collect_list(encode_at_pairs(F.col("id"), F.col("val")))).alias("s")
    )
    decoded = encoded.select(F.explode(decode_at_pairs(F.col("s"), ",")).alias("p")).select(
        F.col("p.id").cast("long").alias("id"), F.col("p.val").alias("val")
    )
    got = sorted((r.id, r.val) for r in decoded.collect())
    assert got == sorted((i, v) for i, v in pairs)


@_settings
@given(texts=st.lists(_safe_text | st.just(""), min_size=1, max_size=10))
def test_fingerprint_matches_python_fold(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {r.i: r.fp for r in df.select("i", doc_fingerprint("t").alias("fp")).collect()}

    def py_fp(s: str) -> int:
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % _FP_MOD
        return acc

    for i, t in enumerate(texts):
        assert got[i] == py_fp(t), (i, t)


@_settings
@given(
    texts=st.lists(
        st.text(alphabet=st.characters(whitelist_categories=("Ll", "Zs")), max_size=30),
        min_size=1,
        max_size=10,
    )
)
def test_token_count_matches_python_split(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {r.i: r.n for r in df.select("i", token_count("t").alias("n")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == len(t.split()), (i, repr(t))

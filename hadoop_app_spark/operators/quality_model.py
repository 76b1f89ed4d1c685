"""Trained document-quality classifier: distributed logistic
regression with EXACT (decimal) gradient accumulation.

Beyond-reference surface (north star): the CCNet/fastText-style
LEARNED quality gate — the heuristic quality_score's trained sibling.
The reference has nothing like it; a 100 TB curation pipeline trains
exactly this shape of linear filter over cheap text features.

Why this is Spark-shaped and deterministic:
- each iteration is ONE scan: per-row error terms feed d per-feature
  sums with map-side partial combine; the driver collects a d-element
  row (d ~ 5), updates the weight vector, and broadcasts it back as
  plan literals for the next iteration — the classic "broadcast
  parameters, aggregate gradients" loop;
- gradients accumulate in DECIMAL(38,18): decimal addition is exact
  and associative, so Spark's nondeterministic partition/combine
  order CANNOT flip a single low bit of the trained weights — the
  same trick queries.py's _DSUM uses for oracle-exact double sums.
  With double sums, every rerun would train microscopically different
  weights and boundary predictions would flap;
- the logistic uses the ALGEBRAIC sigmoid 0.5 + 0.5*z/(1+|z|), not
  exp: Java's Math.exp and C libm's exp may differ in the last ulp,
  which would break the bit-exact pure-Python twin this operator is
  pinned against (tests/test_quality_model.py reproduces training
  with decimal.Decimal and asserts EXACT weight equality).

Scale: n_iter full scans (n_iter ~ 20); at 100 TB you would
mini-batch via the deterministic fingerprint sampler
(operators/corpus.stratified_sample) — same loop, sampled scan.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_app_spark.functions.text import token_count

_DEC = "decimal(38,18)"

# Trained output of train_quality_lr on /root/testdata/sf0.01/documents
# with the long-document proxy label (len(text) >= 300), n_iter=10,
# lr=1.0 — pinned so the learned gate can sit inside oracle-checked
# queries (scoring under FIXED weights is plain IEEE float SQL, while
# the training loop itself is not SQL-expressible). Training is
# decimal-exact and deterministic to the bit, so this tuple is
# re-derivable: tests/test_quality_model.py retrains at sf0.01 and
# asserts exact equality, keeping "trained" honest.
PINNED_QUALITY_LR_WEIGHTS: tuple[float, ...] = (
    -0.16698026823470816,
    0.9466421140454269,
    -0.16698026823470816,
    0.0,
    -0.1592346945736492,
)


def quality_feature_cols(col: Column | str) -> list[Column]:
    """The d feature Columns [bias, len_norm, alpha_ratio, punct_norm,
    token_density] — cheap, SQL/Python-reproducible document features
    (subset of the quality_score inputs). Exposed as a LIST so scoring
    can build w·x without element_at-over-CreateArray, a composition
    that trips a Janino "not an rvalue" codegen bug and silently drops
    the projection to interpreted mode.

    NULL text is treated as the empty document (coalesce at the top),
    so every feature stays non-null — without this a null row would
    poison its gradient terms to NULL and silently vanish from the
    sums while still counting in n."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(c, F.lit(""))
    length = F.length(c).cast("double")
    len_norm = F.least(length / F.lit(500.0), F.lit(1.0))
    alpha = F.length(F.regexp_replace(F.lower(c), "[^a-z ]", "")).cast("double")
    # greatest() instead of when(): identical value (alpha is 0 when
    # length is 0) and conditional-free — part of the same codegen-bug
    # avoidance as above
    alpha_ratio = alpha / F.greatest(length, F.lit(1.0))
    punct = F.length(F.regexp_replace(c, "[^.!?]", "")).cast("double")
    punct_norm = F.least(punct / F.lit(3.0), F.lit(1.0))
    tok = token_count(c).cast("double")
    # *5: ~0.8 at the English ~6-chars-per-token mean, saturating only
    # for degenerate ultra-short-token text — keeps the feature varying
    tok_density = F.least(tok * F.lit(5.0) / F.greatest(length, F.lit(1.0)), F.lit(1.0))
    return [F.lit(1.0), len_norm, alpha_ratio, punct_norm, tok_density]


def quality_features(col: Column | str) -> Column:
    """-> array<double> of :func:`quality_feature_cols` (the training
    frame's layout; per-feature aggregation reads it by index)."""
    return F.array(*quality_feature_cols(col))


def py_quality_features(text: str | None) -> list[float]:
    """Bit-exact Python twin of :func:`quality_features` (None ==
    empty document, matching the Spark-side coalesce)."""
    import re

    text = text or ""
    length = float(len(text))
    len_norm = min(length / 500.0, 1.0)
    alpha = float(len(re.sub(r"[^a-z ]", "", text.lower())))
    alpha_ratio = alpha / max(length, 1.0)
    punct = float(len(re.sub(r"[^.!?]", "", text)))
    punct_norm = min(punct / 3.0, 1.0)
    toks = float(len(text.split()))
    tok_density = min(toks * 5.0 / max(length, 1.0), 1.0)
    return [1.0, len_norm, alpha_ratio, punct_norm, tok_density]


def _sigmoid_expr(z: Column) -> Column:
    # algebraic sigmoid: exact IEEE ops, reproducible everywhere
    return F.lit(0.5) + F.lit(0.5) * z / (F.lit(1.0) + F.abs(z))


def py_sigmoid(z: float) -> float:
    return 0.5 + 0.5 * z / (1.0 + abs(z))


def train_quality_lr(
    df: DataFrame,
    text_col: str,
    label_col: str,
    n_iter: int = 20,
    lr: float = 1.0,
) -> list[float]:
    """Train logistic-regression weights (list of d floats) on
    (text features, 0/1 label). One scan per iteration; the gradient
    is d decimal sums + a count — all map-side-combined. Deterministic
    to the bit regardless of partitioning (decimal accumulation)."""
    feats = df.select(
        quality_features(text_col).alias("x"), F.col(label_col).cast("double").alias("y")
    )
    # n and the feature frame are reused every iteration
    feats = feats.localCheckpoint(eager=True)
    n = feats.count()
    if n == 0:
        raise ValueError("empty training frame")
    # a NULL label would make err NULL (dropped by F.sum) while still
    # counting in n — silently shrinking every gradient and diverging
    # from the pure-Python twin, which would raise. Refuse up front.
    n_null = feats.where(F.col("y").isNull()).count()
    if n_null:
        raise ValueError(
            f"{n_null} NULL value(s) in label column {label_col!r}; "
            "filter or impute labels before training"
        )
    d = len(feats.head()["x"])
    w = [0.0] * d
    for _ in range(n_iter):
        z = sum(
            (F.element_at("x", j + 1) * F.lit(w[j]) for j in range(1, d)),
            F.element_at("x", 1) * F.lit(w[0]),
        )
        err = _sigmoid_expr(z) - F.col("y")
        sums = feats.agg(
            *[
                F.sum((err * F.element_at("x", j + 1)).cast(_DEC)).alias(f"g{j}")
                for j in range(d)
            ]
        ).head()
        w = [w[j] - lr * (float(sums[f"g{j}"]) / n) for j in range(d)]
    return w


def py_train_quality_lr(
    rows: list[tuple[list[float], float]], n_iter: int = 20, lr: float = 1.0
) -> list[float]:
    """Pure-Python twin of :func:`train_quality_lr`: same algebraic
    sigmoid, same DECIMAL(38,18) HALF_UP per-term rounding, same exact
    decimal summation — trained weights must equal Spark's EXACTLY.

    Spark's double->decimal cast goes through Java's Double.toString
    (SHORTEST roundtrip representation), not the exact binary
    expansion — verified empirically: cast(0.1 as decimal(38,18)) is
    0.100000000000000000, where Decimal(0.1) would carry the binary
    tail ...055511151231257827. Python's repr() produces the same
    shortest representation, hence Decimal(repr(v))."""
    if not rows:
        raise ValueError("empty training frame")
    d = len(rows[0][0])
    n = len(rows)
    q = Decimal(1).scaleb(-18)
    w = [0.0] * d
    for _ in range(n_iter):
        sums = [Decimal(0)] * d
        for x, y in rows:
            z = x[0] * w[0]
            for j in range(1, d):
                z += x[j] * w[j]
            err = py_sigmoid(z) - y
            for j in range(d):
                sums[j] += Decimal(repr(err * x[j])).quantize(q, rounding=ROUND_HALF_UP)
        w = [w[j] - lr * (float(sums[j]) / n) for j in range(d)]
    return w


def score_quality_lr(
    df: DataFrame, text_col: str, weights: list[float], out_col: str = "quality_prob"
) -> DataFrame:
    """Score documents under trained weights: adds ``out_col`` (the
    algebraic-sigmoid probability) — a pure narrow map."""
    xs = quality_feature_cols(text_col)
    if len(xs) != len(weights):
        raise ValueError(f"expected {len(xs)} weights, got {len(weights)}")
    z = sum(
        (x * F.lit(w) for x, w in zip(xs[1:], weights[1:])),
        xs[0] * F.lit(weights[0]),
    )
    return df.withColumn(out_col, _sigmoid_expr(z))

"""Vector math over array<float> embedding columns.

Built-in higher-order functions (zip_with/aggregate) keep the math
JVM-side; element-wise cast to double first so accumulation order and
precision are well-defined (and reproducible by the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


import re

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _d(col: Column | str) -> Column:
    return _c(col).cast("array<double>")


def _frag(col: Column | str) -> str | None:
    """SQL fragment for *col* when it is a plain identifier; None
    forces the Column-API fallback. The str fast path lets the hot
    helpers below build ONE parsed expression instead of a nested
    Column/lambda tree (~10-40 py4j round-trips per call — r12); the
    produced expressions are identical after parsing."""
    if isinstance(col, str) and _IDENT.match(col):
        # backtick-quoted so resolution matches F.col exactly: a bare
        # identifier shaped like a parameterless function keyword
        # (current_date, current_user, ...) would otherwise parse as
        # the function call and silently compute garbage (ADVICE r12)
        return f"cast(`{col}` as array<double>)"
    return None


def _dlit(x: float) -> str:
    """Exact SQL double literal for *x*: repr() is Python's shortest
    round-trip representation, and Spark's literal parser converts it
    back to the identical double, so the parsed literal is bit-equal
    to F.lit(x) (pinned in tests/test_vectors.py)."""
    if x != x:
        return "CAST('NaN' AS DOUBLE)"
    if x == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if x == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return repr(float(x)) + "D"


def matrix_lit(rows: list) -> Column:
    """array<array<double>> literal built as ONE parsed expression.

    ``F.lit(list_of_lists)`` walks the nested list through py4j one
    element at a time — a (16, 64) centroid matrix measured 0.43 s of
    pure driver-side construction per call (r13), paid once per Lloyd
    iteration / probe / index build. One F.expr string parses JVM-side
    in ~10 ms with bit-identical values (see :func:`_dlit`)."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_dlit(float(x)) for x in r) + ")" for r in rows
        )
        + ")"
    )


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns (zip_with + aggregate HOFs, JVM-side)."""
    fa, fb = _frag(a), _frag(b)
    if fa and fb:
        return F.expr(
            f"aggregate(zip_with({fa}, {fb}, (x, y) -> x * y), "
            "0.0D, (acc, x) -> acc + x)"
        )
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array column."""
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two array columns (0.0 when either norm is 0).

    The zero-norm guard is load-bearing under Spark 4's ANSI default:
    a bare division aborts the whole job with DIVIDE_BY_ZERO on the
    first all-zeros embedding (missing/padded vector) — and matches the
    vectorized numpy twins, which clamp norms and return 0.0."""
    fa, fb = _frag(a), _frag(b)
    if fa and fb:
        d = f"aggregate(zip_with({fa}, {fb}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
        na = f"sqrt(aggregate(zip_with({fa}, {fa}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x))"
        nb = f"sqrt(aggregate(zip_with({fb}, {fb}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x))"
        return F.expr(
            f"CASE WHEN ({na} * {nb}) != 0.0D THEN {d} / ({na} * {nb}) "
            "ELSE 0.0D END"
        )
    np_ = l2_norm(a) * l2_norm(b)
    return F.when(np_ != 0.0, dot(a, b) / np_).otherwise(F.lit(0.0))


def max_abs(a: Column | str) -> Column:
    """max(|x_i|) — the symmetric-quantization range."""
    return F.aggregate(
        _d(a), F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )


def quantize_int8(a: Column | str, scale: Column) -> Column:
    """Symmetric int8 quantization: q_i = floor(x_i/scale + 0.5)
    (half-up via floor — identical in every engine, unlike round()'s
    per-engine half-even/half-up split), CLAMPED to [-127, 127] so the
    documented int8 envelope holds even for a caller-supplied shared
    scale smaller than max_abs/127 (with a per-vector max_abs scale the
    clamp is a no-op)."""
    return F.transform(
        _d(a),
        lambda x: F.greatest(
            F.lit(-127), F.least(F.lit(127), F.floor(x / scale + F.lit(0.5)).cast("int"))
        ),
    )


def dequantize(q: Column | str, scale: Column) -> Column:
    """q_i * scale -> array<double> (lossy inverse of quantize_int8)."""
    return F.transform(_c(q), lambda x: x.cast("double") * scale)

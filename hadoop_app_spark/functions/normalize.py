"""Numeric helpers: safe cast with default, min-max score.

Reference semantics:
- safe parse with fallback (UserHotcar.java:57-62 try/catch -> 0.0f):
  cast() yields null on garbage; coalesce supplies the default.
- min-max inverted score ``1 - (x - min)/(max - min)``
  (UserHotcar.java:169-183). Degenerate group (max == min) divides
  0/0 -> NaN, and the reference EMITS the NaN (SURVEY §1.3.5).
  ``nan_compat=True`` (default) reproduces that; False maps the
  degenerate case to 1.0 (single/all-equal items are trivially best).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def safe_cast(col: Column, dtype: str, default) -> Column:
    """P5/F4 lenient cast: try_cast with a default instead of null/raise."""
    return F.coalesce(col.try_cast(dtype), F.lit(default).cast(dtype))


def min_max_score(x: Column, mn: Column, mx: Column, nan_compat: bool = True) -> Column:
    """T3 inverted min-max score; nan_compat reproduces the reference's
    NaN on degenerate (mn == mx) groups."""
    # degenerate branch handled explicitly: ANSI mode would raise on
    # 0/0, while the reference's float math yields (and emits) NaN
    degenerate = F.lit(float("nan")) if nan_compat else F.lit(1.0)
    return F.when(mx == mn, degenerate).otherwise(F.lit(1.0) - (x - mn) / (mx - mn))

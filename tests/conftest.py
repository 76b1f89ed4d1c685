from __future__ import annotations

import math

import pytest

from hadoop_app_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hadoop_app_spark-tests", shuffle_partitions=4)
    yield s


def rows_set(df, round_floats: int | None = 6):
    """Order-insensitive row comparison helper: DataFrame -> sorted list
    of tuples with floats rounded and NaN == NaN (FIXTURES.md rules)."""

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            if round_floats is not None:
                return round(v, round_floats)
        return v

    return sorted(tuple(norm(v) for v in row) for row in df.collect())

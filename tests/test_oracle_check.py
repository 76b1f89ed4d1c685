"""Unit tests for the oracle-check type-drift guard.

Round-2 postmortem: `math_functions` and `source_stats` were value-exact
(Python ``68423 == 68423.0``) yet hash-red in the driver, because the
driver hashes *formatted* cells and DuckDB's floor()/ceil() return DOUBLE
while Spark's return BIGINT (and DuckDB sum(int) returns HUGEINT).  The
guard must flag any int/float/decimal/bool class drift per column so the
next dialect divergence fails locally before a round lands.
"""

import datetime
import decimal

import pytest

from tools.oracle_check import _kind, type_drift


def test_uncast_floor_is_flagged():
    # Spark floor() -> BIGINT (int), DuckDB floor() -> DOUBLE (float).
    spark_rows = [(1, 68423), (2, 901)]
    duck_rows = [(1, 68423.0), (2, 901.0)]
    drift = type_drift(spark_rows, ["k", "price_floor"], duck_rows, ["k", "price_floor"])
    assert drift == [("price_floor", ["int"], ["float"])]


def test_matching_types_pass():
    assert type_drift([(1, 1.5)], ["k", "v"], [(1, 1.5)], ["k", "v"]) == []


def test_decimal_vs_float_is_flagged():
    drift = type_drift([(1.5,)], ["v"], [(decimal.Decimal("1.5"),)], ["v"])
    assert drift == [("v", ["float"], ["decimal"])]


def test_nulls_are_ignored_but_values_still_compared():
    # None cells carry no type signal; the remaining ints must agree.
    assert type_drift([(None,), (3,)], ["v"], [(3,), (None,)], ["v"]) == []
    assert type_drift([(None,), (3,)], ["v"], [(3.0,), (None,)], ["v"]) == [
        ("v", ["int"], ["float"])
    ]


def test_column_order_independent():
    # Same columns in different physical order must align by name.
    assert type_drift([(1, "x")], ["n", "s"], [("x", 1)], ["s", "n"]) == []


@pytest.mark.parametrize(
    "value,kind",
    [
        (True, "bool"),
        (3, "int"),
        (3.0, "float"),
        (decimal.Decimal("3"), "decimal"),
        (datetime.date(2024, 1, 1), "date"),
        (datetime.datetime(2024, 1, 1), "datetime"),
        ([1, 2], "list"),
        ("s", "str"),
    ],
)
def test_kind_classes(value, kind):
    # bool is an int subclass — must classify before int.
    assert _kind(value) == kind


def test_uncast_hugeint_sum_is_flagged():
    """r8 postmortem: `nation_pagerank` shipped an oracle whose final
    column was un-cast HUGEINT (`sum(BIGINT)` widens, `85 * s // 100`
    stays HUGEINT). `fetchall()` hands HUGEINT back as a Python int —
    so `type_drift` was structurally blind — but the DRIVER fetches
    via `.df()`, where pandas converts HUGEINT to float64 and the
    formatted-value hash diverges. The guard must catch the un-cast
    form and pass the CAST convention every other oracle follows."""
    import duckdb

    from tools.oracle_check import hugeint_cols

    con = duckdb.connect()
    uncast = "SELECT 85 * sum(x) // 100 AS rank_scaled FROM (VALUES (1),(2)) v(x)"
    assert hugeint_cols(con, uncast) == ["rank_scaled"]
    cast = (
        "SELECT CAST(85 * sum(x) // 100 AS BIGINT) AS rank_scaled "
        "FROM (VALUES (1),(2)) v(x)"
    )
    assert hugeint_cols(con, cast) == []


def test_no_registry_oracle_emits_hugeint():
    """Registry-wide sweep: DESCRIBE every oracle against the sf0.001
    views and assert no result column is HUGEINT/UHUGEINT — the class
    the driver's pandas canonicalizer silently floats (r8
    nation_pagerank). Pure-DuckDB, no Spark session needed."""
    import duckdb

    from hadoop_app_spark.catalog import TABLES
    from hadoop_app_spark.queries import REGISTRY
    from tools.oracle_check import hugeint_cols

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        )
    bad = {}
    for name, qd in REGISTRY.items():
        if qd.oracle is None:
            continue
        cols = hugeint_cols(con, qd.oracle)
        if cols:
            bad[name] = cols
    assert bad == {}, f"oracles with HUGEINT result columns (driver hash WILL differ): {bad}"


def test_gated_queries_emit_scalar_schemas_only(spark):
    """No first-DRIVER_GATE_SIZE registry query may output an array/
    map/struct column: the DRIVER's canonicalizer pandas-sorts and
    str-hashes cells and crashes on complex types ('unhashable type:
    list' — the r6 inverted_index ERR). tools/oracle_check.py enforces
    the same at check time; this pins it at test time so a rotation
    can never ship a complex-typed gated row again.

    Streaming-exec builders run their stream to completion at
    sf0.001 — bounded and already exercised by the streaming tests,
    so including them here keeps the stream rows (which DO sit in the
    gate) covered rather than a blind spot."""
    from hadoop_app_spark.queries import DRIVER_GATE_SIZE, REGISTRY
    from tools.oracle_check import complex_cols

    bad = {}
    for name, qd in list(REGISTRY.items())[:DRIVER_GATE_SIZE]:
        df = qd.fn(spark, "/root/testdata/sf0.001")
        cols = complex_cols(df.schema)
        if cols:
            bad[name] = cols
    assert bad == {}, f"gated queries with driver-crashing complex columns: {bad}"


def test_rotation_age_report_runs_and_is_complete(capsys):
    """--rotation-age (VERDICT r10 item 9): the report parses
    BASELINE.md's rotation history, covers EVERY registry entry exactly
    once, and puts never-driver-checked entries at the head of the
    swap-in section."""
    import re

    from tools.oracle_check import rotation_age

    rc = rotation_age()
    assert rc == 0
    out = capsys.readouterr().out
    from hadoop_app_spark.queries import DRIVER_GATE_SIZE, REGISTRY

    listed = re.findall(r"^ +(?:\d+ rounds|never) +([a-z0-9_]+)", out, re.M)
    assert sorted(listed) == sorted(REGISTRY), (
        set(REGISTRY) ^ set(listed)
    )
    gated_section = out.split("## ungated")[0]
    assert len(re.findall(r"^  ", gated_section, re.M)) == DRIVER_GATE_SIZE
    # the never-checked block leads the ungated section
    ungated = out.split("## ungated")[1].strip().splitlines()
    first_aged = next(
        i for i, line in enumerate(ungated) if not line.startswith("  never")
    )
    assert all(line.startswith("  never") for line in ungated[:first_aged])

"""Local differential check: run every REGISTRY query on Spark and its
DuckDB oracle on the same parquet, compare order-insensitively.

Usage: python tools/oracle_check.py [--vanilla] [sf_dir] [query ...]

Approximates the driver's gate (row-count + column names + values) so
mismatches surface before a round's CORRECTNESS run. ``--vanilla``
runs on a BARE SparkSession (no UTC pin, none of session.py's tuning)
— the driver uses its own session, and r1's failures came exactly from
conf the engine assumed but the driver didn't set. A non-UTC session
timezone is forced to make tz dependence loud.
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

from hadoop_app_spark import get_spark
from hadoop_app_spark.catalog import TABLES
from hadoop_app_spark.queries import DRIVER_GATE_SIZE, REGISTRY


def complex_cols(schema):
    """Columns whose type the DRIVER's canonicalizer cannot handle.

    The driver pandas-sorts and str-hashes cells; an ArrayType/MapType/
    StructType cell raises 'unhashable type: list' there even though
    this script's norm() tuple-izes lists happily — the r6
    inverted_index harness-parity gap. Any gated (first-
    DRIVER_GATE_SIZE) query with a complex output column must FAIL
    locally so the rotation never ships one."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def norm(v, nd):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if nd is not None:
            return round(v, nd)
        return v
    if isinstance(v, list):
        return tuple(norm(x, nd) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def rows_key(rows, cols, nd):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted((tuple(norm(r[i], nd) for i in order) for r in rows), key=repr)


def _kind(v):
    """Coarse type class a formatted-value hash is sensitive to.

    The driver hashes str()-formatted cells, so int 68423 vs float
    68423.0 hash differently even though == is True. Any int/float/
    Decimal/bool drift between engines must be flagged, not forgiven.
    """
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, datetime.datetime):
        return "datetime"
    if isinstance(v, datetime.date):
        return "date"
    if isinstance(v, (list, tuple)):
        return "list"
    return type(v).__name__


def hugeint_cols(con, oracle):
    """Oracle result columns typed HUGEINT/UHUGEINT in DuckDB.

    The r8 gate's one red row (`nation_pagerank`) came from exactly
    this class: `sum(BIGINT)` widens to HUGEINT, `fetchall()` hands it
    back as a Python int (indistinguishable from BIGINT, so the
    type_drift guard below was blind), but the DRIVER fetches via
    `.df()` where pandas converts HUGEINT to float64 — cells format as
    `3.07e+10` vs Spark's int and the value hash diverges. `DESCRIBE
    (<oracle>)` exposes the true DuckDB type, so any un-cast widened
    sum FAILS locally before a rotation ships it."""
    try:
        desc = con.execute(f"DESCRIBE ({oracle})").fetchall()
    except Exception:
        return []  # the main path will surface the real error
    return [name for name, typ, *_ in desc if "HUGEINT" in typ.upper()]


def type_drift(srows, scols, drows, dcols):
    """Per-column value-type classes that differ between engines.

    Returns [(col, spark_kinds, duck_kinds), ...] — empty when the
    formatted-value hash cannot diverge on type grounds.
    """
    out = []
    for col in scols:
        si, di = scols.index(col), dcols.index(col)
        sk = {_kind(r[si]) for r in srows} - {None}
        dk = {_kind(r[di]) for r in drows} - {None}
        if sk != dk:
            out.append((col, sorted(sk), sorted(dk)))
    return out


def rotation_age() -> int:
    """--rotation-age: rounds since each ungated registry entry last
    held a driver gate row (VERDICT r10 item 9) — the report each
    round's rotation cites so swap-ins maximize driver coverage.

    Replays BASELINE.md's gate-rotation history tables (`| rN |
    swapped-IN | swapped-OUT |` rows): an entry's age is rounds since
    it last appeared in an IN cell without a later OUT; 'never' means
    no driver has ever value-checked it — the highest-priority class.
    The early-history approximation is stated in the output: r1's
    initial 50 are not listed row-by-row in the table, so a gated
    entry with no IN row reads as 'since r1'."""
    import re
    from pathlib import Path

    md = (Path(__file__).resolve().parent.parent / "BASELINE.md").read_text()
    rows = re.findall(r"^\| r(\d+) \| (.*?) \| (.*?) \|$", md, re.M)
    names = set(REGISTRY)
    last_in: dict[str, int] = {}
    last_out: dict[str, int] = {}
    max_round = 1
    for rnd, cell_in, cell_out in rows:
        r = int(rnd)
        max_round = max(max_round, r)
        for tok in re.findall(r"[a-z0-9_]+", cell_in):
            if tok in names:
                last_in[tok] = max(last_in.get(tok, 0), r)
        for tok in re.findall(r"[a-z0-9_]+", cell_out):
            if tok in names:
                last_out[tok] = max(last_out.get(tok, 0), r)
    now = max_round + 1  # the round being planned
    gated = list(REGISTRY)[:DRIVER_GATE_SIZE]
    print(f"# rotation-age report (history through r{max_round}, planning r{now})")
    print(f"# gate = first {DRIVER_GATE_SIZE} of {len(REGISTRY)} registry entries\n")
    print("## gated now (rounds holding the row — displacement candidates first)")
    by_tenure = sorted(
        gated, key=lambda n: (last_in.get(n, 1), n)
    )
    for n in by_tenure:
        since = last_in.get(n, 1)
        print(f"  {now - since:>2} rounds  {n}  (gated since r{since})")
    print("\n## ungated (driver-coverage gap — swap-in candidates first)")
    ungated = [n for n in REGISTRY if n not in set(gated)]

    def age_key(n):
        if n not in last_in and n not in last_out:
            return (0, n)  # never driver-checked: highest priority
        return (1, -(now - last_out.get(n, last_in.get(n, 1))), n)

    for n in sorted(ungated, key=age_key):
        oracle = "oracled" if REGISTRY[n].oracle is not None else "rows-only"
        if n not in last_in and n not in last_out:
            print(f"  never     {n}  ({oracle})")
        else:
            out_r = last_out.get(n, last_in.get(n, 1))
            print(f"  {now - out_r:>2} rounds  {n}  (last gate row ~r{out_r}, {oracle})")
    return 0


def main():
    args = sys.argv[1:]
    if "--rotation-age" in args:
        return rotation_age()
    vanilla = "--vanilla" in args
    if vanilla:
        args.remove("--vanilla")
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("oracle-check-vanilla")
            .master("local[8]")
            # hostile-but-plausible driver conf: non-UTC tz
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_exact = n_close = n_fail = n_skip = 0
    for idx, (name, qd) in enumerate(REGISTRY.items()):
        if only and name not in only:
            continue
        try:
            df = qd.fn(spark, sf_dir)
            if idx < DRIVER_GATE_SIZE:
                bad = complex_cols(df.schema)
                if bad:
                    print(
                        f"FAIL {name}: gated query (registry slot {idx}) emits "
                        f"complex-typed columns {bad} — the driver canonicalizer "
                        f"crashes on these (r6 inverted_index ERR class)"
                    )
                    n_fail += 1
                    continue
            srows = [tuple(r) for r in df.collect()]
            scols = df.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if qd.oracle is None:
            print(f"SKIP {name}: no oracle (rows-only), spark rows={len(srows)}")
            n_skip += 1
            continue
        try:
            res = con.execute(qd.oracle)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        huge = hugeint_cols(con, qd.oracle)
        if huge:
            print(
                f"FAIL {name}: oracle columns {huge} are HUGEINT — the driver's "
                f"pandas fetch turns these into float64 and the value hash "
                f"diverges (r8 nation_pagerank class); CAST(... AS BIGINT)"
            )
            n_fail += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duckdb={sorted(dcols)}")
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duckdb={len(drows)}")
            n_fail += 1
            continue
        drift = type_drift(srows, scols, drows, dcols)
        if drift:
            print(f"FAIL {name}: type drift (driver hash WILL differ): {drift}")
            n_fail += 1
            continue
        if rows_key(srows, scols, None) == rows_key(drows, dcols, None):
            print(f"OK   {name}: {len(srows)} rows (exact)")
            n_exact += 1
        elif rows_key(srows, scols, 6) == rows_key(drows, dcols, 6):
            print(f"OK~  {name}: {len(srows)} rows (match at 6dp, not bit-exact)")
            n_close += 1
        else:
            sk, dk = rows_key(srows, scols, 6), rows_key(drows, dcols, 6)
            diff = [(a, b) for a, b in zip(sk, dk) if a != b][:2]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            n_fail += 1
    print(f"\n{n_exact} exact, {n_close} close, {n_skip} rows-only, {n_fail} FAIL")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

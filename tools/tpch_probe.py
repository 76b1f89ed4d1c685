"""TPC-H fact-table scaling + skew probe (VERDICT r7 item 6).

The 22 TPC-H shapes are oracled but were never stress-tiered: this
probe scales the FACT axis (lineitem + orders + customer — the tables
that grow at 100 TB; part/supplier/nation/region stay fixed like real
dimensions) 10x and times the three heaviest shapes with rows-out and
shuffle bytes, exactly like tools/stress_probe.py does for the corpus
families:

  - suppliers_kept_waiting  (Q21: triple lineitem self-semi/anti)
  - customer_order_distribution (Q13: outer-join histogram)
  - product_type_profit     (Q9: 6-table star)

plus a SKEWED-KEY tier: a copy of the 10x corpus where ~25% of all
lineitem rows (1/HOT_FRACTION_MOD) are remapped onto ONE hot orderkey
(an existing F-status order, so Q21's filters keep it live). The run
asserts that AQE's OptimizeSkewedJoin actually engages — the executed
plan must contain ``skew=true`` on a sort-merge join, and the process
exits NONZERO when it does not — and reports the wall delta vs the
uniform 10x tier.

The skew thresholds are scaled down for the probe
(skewedPartitionThresholdInBytes/advisoryPartitionSizeInBytes = 100 KB
vs the 256 MB production default; empirically the 1 MB setting still
did not trip on ~MB-scale compressed partitions): at sf0.1 a 300k-row hot partition
is a few MB, far under the production threshold that assumes
multi-GB shuffle partitions. The MECHANISM (median-based detection +
partition splitting with build-side replication) is what is being
verified; the threshold is a size-relative knob that needs no change
at 100 TB where hot partitions really are multi-GB.

Finding (recorded in BASELINE.md): plain skewJoin.enabled is NOT
sufficient for Q21's shape — the semi and anti joins stack on the
same orderkey partitioning, and AQE abandons a skew split that would
break a downstream partitioning requirement. At scale the fix is
``spark.sql.adaptive.forceOptimizeSkewedJoin=true`` (accept one extra
shuffle to kill the straggler); the probe runs with it and shows the
split engaging ONLY on the skewed tier.

Scaling semantics: copy k shifts o_orderkey/l_orderkey by
k*(max_orderkey+1) and c_custkey/o_custkey by k*(max_custkey+1), so
per-order line counts and per-customer order counts — the quantities
Q21/Q13 group over — keep their distribution while key cardinality
grows 10x. Output stays bounded for all three shapes (top-100 /
|distinct counts| / |nations|x|years|), so the claim probed is
rows-out FLAT while wall grows ~linearly.

Usage: python tools/tpch_probe.py [base_sf_dir]
Results are recorded per-round in BASELINE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from hadoop_app_spark import get_spark
from hadoop_app_spark.queries import REGISTRY
from tools.stress_probe import _bytes_delta, _stage_bytes

PROBES = [
    "suppliers_kept_waiting",
    "customer_order_distribution",
    "product_type_profit",
]

DIM_TABLES = ["region", "nation", "supplier", "part"]
FACT_TABLES = ["customer", "orders", "lineitem"]
HOT_FRACTION_MOD = 4  # 1/4 of lineitem rows onto the hot key: the hot
# reduce partition must dominate the per-partition MEDIAN (detection is
# median-relative) — a 5% hot key at 32 partitions was only ~2x median,
# inside compression noise


def _link(src: str, dst: Path) -> None:
    """Symlink a source parquet file/dir into a probe tier dir."""
    os.symlink(src, dst)


def build_tiers(spark, base: str, out: Path, scales=(1, 10)) -> dict[str, str]:
    """Write {tier_name: sf_dir_path} star-schema tiers.

    Each tier dir looks exactly like a testdata sf dir (table.parquet
    entries), so REGISTRY query fns run against it unchanged. Facts are
    shifted-key unions at the same 32-file layout per tier (equal
    layouts — see stress_probe.build_corpora's rationale); dims are
    symlinks to the base files.
    """
    orders = spark.read.parquet(f"{base}/orders.parquet")
    li = spark.read.parquet(f"{base}/lineitem.parquet")
    cust = spark.read.parquet(f"{base}/customer.parquet")
    n_ok = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    n_ck = cust.agg(F.max("c_custkey")).collect()[0][0] + 1

    def union_shifted(df, shifts: dict[str, int], copies: int):
        parts = [
            df.select(
                *[
                    (F.col(c) + F.lit(k * n)).alias(c) if n else F.col(c)
                    for c, n in (
                        (c, shifts.get(c, 0)) for c in df.columns
                    )
                ]
            )
            for k in range(copies)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    tiers: dict[str, str] = {}
    for scale in scales:
        d = out / f"x{scale}"
        d.mkdir(parents=True)
        for t in DIM_TABLES:
            _link(f"{base}/{t}.parquet", d / f"{t}.parquet")
        specs = {
            "orders": (orders, {"o_orderkey": n_ok, "o_custkey": n_ck}),
            "lineitem": (li, {"l_orderkey": n_ok}),
            "customer": (cust, {"c_custkey": n_ck}),
        }
        for t, (df, shifts) in specs.items():
            src = df if scale == 1 else union_shifted(df, shifts, scale)
            src.repartition(32).write.mode("overwrite").parquet(
                str(d / f"{t}.parquet")
            )
        tiers[f"x{scale}"] = str(d)

    # skew tier: x10 with 1/HOT_FRACTION_MOD of lineitem rows (~25%)
    # remapped to one hot F-status orderkey. Only lineitem changes; everything else
    # symlinks the x10 build.
    hot = (
        spark.read.parquet(f"{tiers['x10']}/orders.parquet")
        .where(F.col("o_orderstatus") == "F")
        .agg(F.min("o_orderkey"))
        .collect()[0][0]
    )
    d = out / "x10skew"
    d.mkdir(parents=True)
    for t in DIM_TABLES + ["orders", "customer"]:
        _link(f"{tiers['x10']}/{t}.parquet", d / f"{t}.parquet")
    (
        spark.read.parquet(f"{tiers['x10']}/lineitem.parquet")
        .withColumn(
            "l_orderkey",
            F.when(
                F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), HOT_FRACTION_MOD)
                == 0,
                F.lit(hot).cast("long"),
            ).otherwise(F.col("l_orderkey")),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(str(d / "lineitem.parquet"))
    )
    tiers["x10skew"] = str(d)
    return tiers


def run_one(spark, name: str, sf_dir: str):
    """Run query ``name`` against ``sf_dir``; return (sec, rows_out,
    shuffle_bytes, skew_joined). Best-of-2 cancels codegen compile
    (scale-independent), matching stress_probe's convention.

    The skew marker must be read from the DataFrame's OWN finalized
    AQE plan: a ``.write`` executes a separate wrapping plan, leaving
    ``df``'s ``executedPlan`` at ``isFinalPlan=false`` with no
    ``AQEShuffleRead skewed`` markers. All three probed shapes return
    bounded rows (<=175), so a ``collect()`` both finalizes the plan
    and yields rows-out."""
    best = None
    for _ in range(2):
        b0 = _stage_bytes(spark)
        t0 = time.monotonic()
        df = REGISTRY[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        b1 = _stage_bytes(spark)
        n = len(df.collect())  # executes df's QE -> final adaptive plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        if best is None or dt < best[0]:
            best = (dt, n, _bytes_delta(b0, b1), "skew=true" in plan)
    return best


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        "tpch-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "20000",
            # probe-scaled skew knobs (see module docstring): hot
            # partitions here are MBs, not the multi-GB the 256 MB
            # production default assumes
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100k",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100k",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
            # Q21 STACKS the semi and anti joins on the same orderkey:
            # the semi's output partitioning is consumed by the anti
            # with no intervening exchange, so splitting the semi's
            # skewed partition would break that guarantee and AQE
            # (by default) abandons the skew optimization rather than
            # add a shuffle. force accepts the extra shuffle — the
            # right trade once one straggler partition dominates the
            # stage (the probe demonstrates exactly this engagement;
            # measured: uniform x10 stays unsplit under force, so the
            # flag only acts when real skew exists)
            "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        },
    )
    tmp = Path(tempfile.mkdtemp(prefix="tpch_probe_"))
    try:
        tiers = build_tiers(spark, base, tmp)
        print("| query | tier | sec | rows_out | shuffle_bytes | skew_split |")
        print("|---|---|---|---|---|---|")
        results = {}
        for name in PROBES:
            for tier in ("x1", "x10"):
                s, n, by, sk = run_one(spark, name, tiers[tier])
                results[(name, tier)] = (s, n, by)
                print(
                    f"| {name} | {tier} | {s:.2f} | {n} | "
                    f"{by if by is not None else 'n/a'} | {sk} |"
                )
        # skew tier: Q21 only — the triple self-join is the shape a hot
        # orderkey punishes; assert the AQE split engaged
        s, n, by, sk = run_one(spark, "suppliers_kept_waiting", tiers["x10skew"])
        print(
            f"| suppliers_kept_waiting | x10skew | {s:.2f} | {n} | "
            f"{by if by is not None else 'n/a'} | {sk} |"
        )
        for name in PROBES:
            r1, r10 = results[(name, "x1")], results[(name, "x10")]
            print(
                f"{name}: wall x10/x1 = {r10[0] / max(r1[0], 1e-9):.1f}, "
                f"rows {r1[1]} -> {r10[1]}"
            )
        if not sk:
            print(
                "skew-check FAILED: skew tier ran WITHOUT an AQE skew split — "
                "check join strategy (broadcast?) or thresholds"
            )
            # the docstring promises an ASSERTION: a scripted recording
            # run must not bank x10skew timings as mechanism-verified
            sys.exit(1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

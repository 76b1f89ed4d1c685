"""Scan-pruning parquet layouts: range-clustered files + sorted row
groups.

Beyond the hive-style ``dt=`` partition pruning of sources/delim001
(SURVEY S7) there is a second, orthogonal 100 TB scan lever: lay the
FILES out so parquet footer min/max statistics line up with the query
predicates. ``repartitionByRange`` on the filter columns gives each
output file a narrow, disjoint key range; ``sortWithinPartitions``
additionally makes every ROW GROUP inside a file narrow. A selective
predicate then skips whole files/row groups inside the parquet reader
(filter pushdown), so the scan's output-row count — and the bytes
actually decoded — collapse to the selectivity of the query instead
of the size of the table.

This matters where hive partitioning can't go: partition dirs work
for low-cardinality columns (date, source), while range clustering
handles high-cardinality keys (id ranges, timestamps at ms grain)
without creating a million directories. The two compose: partition by
date, range-cluster by key within each date.

The pruning payoff is MEASURED, not assumed: tests/test_layout.py
writes the same table range-clustered and shuffled-random, runs the
same selective predicate on both, and asserts the clustered scan's
scan-node output rows are a small fraction of the random layout's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_range_layout(
    df: DataFrame,
    path: str,
    range_cols: list[str],
    sort_cols: list[str] | None = None,
    n_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered for predicate skipping on
    ``range_cols``: range-repartition (disjoint per-file key ranges ->
    file-level footer min/max skipping) then sort within partitions
    (narrow row groups -> row-group-level skipping). ``sort_cols``
    defaults to ``range_cols``; pass more columns to get secondary
    clustering inside each file.

    At cluster scale pick ``n_files`` so files land near the HDFS/S3
    sweet spot (128-1024 MB); the range exchange samples the key
    distribution, so skew in the cluster key yields balanced files
    anyway (contrast hash layouts, where one hot key = one hot file).
    """
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    out = df.repartitionByRange(n, *[F.col(c) for c in range_cols])
    out = out.sortWithinPartitions(*(sort_cols or range_cols))
    out.write.mode("overwrite").parquet(path)


def walk_executed_plan(df: DataFrame, on_node) -> None:
    """Visit every physical node of an EXECUTED DataFrame's plan as
    ``on_node(node, simple_class_name)``, descending through AQE
    wrappers and ALL QueryStageExec variants — shuffle, broadcast, AND
    Spark 4's ResultQueryStageExec, which wraps the FINAL stage the
    same way (a walker that lists only shuffle/broadcast stages
    silently misses every scan in the last stage). One walker so every
    metric reader (row counts, file counts) shares the descent rules."""

    def walk(node):
        cls = node.getClass().getSimpleName()
        on_node(node, cls)
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i))
        # AQE wraps stages; descend into materialized subqueries/stages
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
        if cls.endswith("QueryStageExec"):
            walk(node.plan())

    walk(df._jdf.queryExecution().executedPlan())


def scan_output_rows(df: DataFrame) -> int:
    """Rows the parquet scan(s) of an EXECUTED DataFrame actually
    produced after pushed-filter evaluation — the observable the
    layout exists to minimize. Call after ``df.collect()`` /
    ``df.write``: those execute THIS DataFrame's query execution.
    (``df.count()`` builds a separate aggregate plan whose metrics do
    not attach here — a never-executed frame reports 0.)"""
    total = 0

    def on_node(node, cls):
        nonlocal total
        if cls in ("FileSourceScanExec", "BatchScanExec"):
            m = node.metrics()
            if m.contains("numOutputRows"):
                total += m.apply("numOutputRows").value()

    walk_executed_plan(df, on_node)
    return total


def zorder_key(cols: list, bits: int = 16):
    """Z-order (Morton) curve key over 2+ non-negative integer
    columns: bit i of column j lands at interleaved position
    i * n_cols + j, so sorting by the key clusters rows that are close
    in EVERY dimension at once — footer min/max statistics then prune
    a predicate on ANY of the columns, where a plain lexicographic
    sort only ever prunes its leading column.

    Columns must fit ``bits`` bits (values are masked; pre-bucket
    wider domains — e.g. epoch-day instead of epoch-millis). n_cols *
    bits must stay <= 63. Pure Catalyst bit arithmetic: the key costs
    one codegen'd expression at write time and nothing at read time.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    terms = [
        F.shiftleft(
            F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)), i * n + j
        )
        for j, c in enumerate(cs)
        for i in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def write_zorder_layout(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 16,
    n_files: int | None = None,
) -> None:
    """Write ``df`` as parquet Z-order-clustered on ``zorder_cols``:
    range-repartition + sort on the Morton key, then drop it — the
    layout IS the index. Use where queries filter on several
    high-cardinality columns independently (the Delta/Iceberg OPTIMIZE
    ZORDER use-case); single-predicate workloads should prefer
    :func:`write_range_layout` on that column, which packs strictly
    tighter per-file ranges for it.

    Each column is first scaled to FILL the ``bits`` budget
    ((v << bits) div (max+1), a monotonic integer map from one bounded
    2-row aggregate) — without this, a narrow-domain column's high
    bits are constant zeros and the interleave degenerates to a plain
    sort on the wide column (measured: pruning on the narrow column
    collapsed from ~4x to none on the test corpus)."""
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    stats = df.agg(
        *[F.max(c).alias(f"max_{c}") for c in zorder_cols],
        *[F.min(c).alias(f"min_{c}") for c in zorder_cols],
    ).head()
    maxes = {c: stats[f"max_{c}"] for c in zorder_cols}
    bad = [c for c in zorder_cols if maxes[c] is None]
    if bad:
        # empty frame or all-NULL cluster column: no layout to derive —
        # fail with the reason, not int(None)'s opaque TypeError
        raise ValueError(f"cannot z-order {path!r}: no values in columns {bad}")
    neg = [c for c in zorder_cols if int(stats[f"min_{c}"]) < 0]
    if neg:
        # a negative long through shiftleft keeps its two's-complement
        # high bits, scattering the Morton key and silently destroying
        # the clustering this function promises — refuse, don't degrade
        raise ValueError(
            f"cannot z-order {path!r}: negative values in columns {neg}; "
            "shift the domain to be non-negative (e.g. v - min) first"
        )
    # double division then truncate: exact while value_bits + bits <=
    # 53 (IEEE mantissa); pre-bucket full-width longs (epoch-day, not
    # epoch-millis) — which the bits budget forces anyway
    scaled = [
        (F.shiftleft(F.col(c).cast("long"), bits) / F.lit(int(maxes[c]) + 1)).cast("long")
        for c in zorder_cols
    ]
    key = zorder_key(scaled, bits)
    out = (
        df.withColumn("_zk", key)
        .repartitionByRange(n, F.col("_zk"))
        .sortWithinPartitions("_zk")
        .drop("_zk")
    )
    out.write.mode("overwrite").parquet(path)


def read_range_layout(spark: SparkSession, path: str) -> DataFrame:
    """Plain parquet read of a range layout — the clustering needs no
    reader-side declaration; footer statistics do the skipping as long
    as filter pushdown stays on (Spark default)."""
    return spark.read.parquet(path)

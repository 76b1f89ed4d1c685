"""Structured Streaming operators over the events schema.

Greenfield surface (SURVEY §2.9: the reference has NO streaming; its
daily dt=-partitioned batch, UserNewcar.java:241-247, is the closest
analogue). These run the SAME logical transformations as the batch
queries (hadoop_app_spark.queries tumbling/sliding/sessionize/dedup)
so one codebase serves both modes — the Structured Streaming design
point.

Scale design:
- event-time windows + watermark bound state: state store holds only
  windows newer than the watermark, so state is O(windows x keys in
  the lateness horizon), not O(stream).
- streaming dedup keys carry the watermark too
  (dropDuplicatesWithinWatermark) so the seen-set is bounded.
- session windows use the built-in F.session_window (gap-based), the
  same 30-min gap as the batch sessionize query.

Sources here are file/memory/rate (what the container offers); on a
real cluster the same plans read Kafka by swapping ``readStream``
options — the transformation graph is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-based event stream (json lines); schema declared, never
    inferred (inference would scan the dir per trigger)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Windowed count/sum per event_type with late-data watermark —
    the streaming twin of queries.q_tumbling_window."""
    # decimal accumulation: exact + associative, so the result is
    # bit-identical to any batch/oracle computation of the same sum
    # regardless of micro-batch arrival order
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def windowed_value_quantiles(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    accuracy: int = 100_000,
) -> DataFrame:
    """Tumbling-window per-type value quantiles via the MERGEABLE GK
    sketch aggregate (percentile_approx) — the streaming face of
    operators/corpus.quantile_sketch: the sketch's partial/merge/
    finish contract is exactly what a streaming state store needs, so
    per-window state is one O(accuracy)-sized summary per (window,
    type), never the raw values.

    Values quantize to integers via floor() (IEEE-exact in every
    engine; a bare double->long CAST truncates in Spark but ROUNDS in
    DuckDB, so floor is the cross-engine form). With per-window row
    counts below ``accuracy`` the GK summary retains every
    observation and the output equals the exact integer-rank type-1
    quantile (property-pinned against quantile_profile in
    tests/test_operators.py) — which is what makes the STREAMING
    entry oracle-exact: the oracle recomputes the exact quantile per
    window, valid precisely in the regime the accuracy knob
    guarantees. At production volume you lower accuracy and trade
    exactness for bounded state — same code, same plan.

    NULL values are excluded UP FRONT (the same exclusion
    quantile_sketch applies): percentile_approx skips NULLs, so
    counting them in ``n`` would report a row count inconsistent
    with the quantiles it sits next to."""
    v = F.floor(F.col("value")).cast("long")
    return (
        events.where(F.col("value").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.percentile_approx(v, F.lit(0.5), F.lit(accuracy)).alias("p50"),
            F.percentile_approx(v, F.lit(0.9), F.lit(accuracy)).alias("p90"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "p50",
            "p90",
        )
    )


def sliding_counts(
    events: DataFrame, window: str = "1 hour", slide: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Sliding-window twin of queries.q_sliding_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_aggregates(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Gap-based session windows per user (built-in session_window
    stateful operator) — streaming twin of queries.q_sessionize."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("session_value"),
        )
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-per-event_id stream with bounded state: duplicates
    arriving within the watermark horizon are dropped; the state store
    evicts ids older than the watermark."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def enriched_segment_counts(events: DataFrame, dim: DataFrame, key: str = "user_id", dim_key: str = "c_custkey") -> DataFrame:
    """Stream-static enrichment join: events join a STATIC dimension
    (broadcast — stateless, no join state store) then aggregate per
    (segment, event_type). The canonical streaming-enrichment shape: at
    scale the dimension is a slowly-changing table the stream re-reads
    per micro-batch, and only the aggregation holds state."""
    joined = events.join(F.broadcast(dim), events[key] == dim[dim_key])
    return joined.groupBy("c_mktsegment", "event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


def view_click_conversions(
    views: DataFrame,
    clicks: DataFrame,
    max_gap: str = "4 hours",
    watermark: str = "1 day",
) -> DataFrame:
    """Stream-stream inner join: each view pairs with the same user's
    clicks landing within ``max_gap`` AFTER it -> [view_id, click_id,
    user_id] (append mode; the attribution/conversion-funnel shape).

    Both sides carry event-time watermarks and the join condition
    bounds the time range, so each side's state store retains only
    ``watermark + max_gap`` of history — the requirement for unbounded
    stream-stream joins. ``watermark`` is the lateness bound: events
    later than it may silently miss their pair (standard streaming
    semantics); the gated query replays a single file in one
    availableNow batch, where nothing is late by construction.
    """
    v = views.withWatermark("ts", watermark).select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
    )
    c = clicks.withWatermark("ts", watermark).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("_click_user"),
        F.col("ts").alias("click_ts"),
    )
    cond = (
        (v["user_id"] == c["_click_user"])
        & (c["click_ts"] >= v["view_ts"])
        & (c["click_ts"] <= v["view_ts"] + F.expr(f"INTERVAL {max_gap}"))
    )
    return v.join(c, cond).select("view_id", "click_id", "user_id")


def run_to_memory_sink(stream_df: DataFrame, query_name: str, mode: str = "append"):
    """Test/debug sink: materialize a streaming query into an in-memory
    table; caller awaits termination or processes availableNow."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )


def windowed_cms(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    key_col: str = "event_type",
    depth: int = 4,
    width: int = 1 << 14,
) -> DataFrame:
    """Tumbling-window Count-Min sketch over ``key_col`` ->
    [window_start, row, col, c]: the streaming face of
    operators/corpus.build_count_min, exactly as windowed_value_
    quantiles is the streaming face of quantile_sketch.

    Why a sketch in the stream: per-window per-key exact counts keep
    state proportional to the window's KEY CARDINALITY — unbounded
    for crawl-scale token/URL streams; the CMS holds depth x width
    counter cells per window (512 KB at the defaults) NO MATTER how
    many distinct keys arrive, and windows merge by cell addition
    (the sketch family's contract). Cells are deterministic (the k
    32-bit md5 slices per key, the bloom/cms convention), so the
    emitted sketch — including collisions — is oracle-reproducible.
    NULL keys are excluded up front (the quantile twin's convention).

    Plan: watermarked explode of depth (row, col) cells per event ->
    one windowed partial-combine count aggregation; state per window
    is bounded by depth*width, not by arrivals."""
    if depth > 4:
        raise ValueError("depth <= 4: rows are 32-bit slices of one 128-bit md5")
    cells = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.lit(depth)),
            lambda j: F.struct(
                (j - 1).cast("int").alias("row"),
                (
                    F.conv(
                        # cast first: md5 only implicitly accepts STRING,
                        # so a BIGINT key (user ids) would fail analysis
                        F.substring(
                            F.md5(F.col(key_col).cast("string")),
                            (j - 1) * 8 + 1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % F.lit(width)
                ).cast("int").alias("col"),
            ),
        )
    )
    return (
        events.where(F.col(key_col).isNotNull())
        .withWatermark("ts", watermark)
        .select("ts", cells.alias("cell"))
        .groupBy(
            F.window("ts", window).alias("w"),
            F.col("cell.row").alias("row"),
            F.col("cell.col").alias("col"),
        )
        .agg(F.count("*").alias("c"))
        .select(F.col("w.start").alias("window_start"), "row", "col", "c")
    )


def windowed_hll(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    key_col: str = "user_id",
    p: int = 12,
) -> DataFrame:
    """Tumbling-window HyperLogLog registers over ``key_col`` ->
    [window_start, register, max_rho]: the streaming face of
    operators/corpus.build_hll, completing the streaming sketch
    triple (windowed_value_quantiles = GK, windowed_cms = Count-Min).

    Why in the stream: per-window exact distinct counts hold state
    proportional to the window's key cardinality — unbounded for
    crawl-scale visitor/token streams; HLL holds at most 2^p register
    rows per window (p=12 -> 4096) NO MATTER how many distinct keys
    arrive, and max-merges across late micro-batches for free (max is
    exactly the MERGE the state store performs). The register cells
    are the deterministic md5-slice form, so the emitted sketch is
    oracle-reproducible. NULL keys are excluded up front (the
    quantile/cms twins' convention). Estimates come from
    operators/corpus.hll_estimate over the emitted registers."""
    wbits = 32 - p
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    w = h % F.lit(1 << wbits)
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    return (
        events.where(F.col(key_col).isNotNull())
        .withWatermark("ts", watermark)
        .select(
            "ts",
            F.floor(h / F.lit(1 << wbits)).cast("int").alias("register"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(F.window("ts", window).alias("w"), "register")
        .agg(F.max("rho").alias("max_rho"))
        .select(F.col("w.start").alias("window_start"), "register", "max_rho")
    )

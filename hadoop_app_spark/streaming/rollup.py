"""Continuous time-bucket rollup — the "hypertable continuous
aggregate" analogue (TimescaleDB's caggs, Druid's rollup ingestion):
an event stream incrementally maintains a materialized per-bucket
aggregate table instead of re-scanning raw events per query.

Exactness by mergeability: each micro-batch reduces to PARTIAL
(bucket, keys) -> (count, decimal sum) aggregates, and merging
partials with the stored rollup is itself a sum — so after any batch
the committed table equals the batch aggregation over all events seen.
Decimal accumulation keeps the merge order-insensitive bit-for-bit
(the same discipline the query oracles use).

State is rollup-table-sized (buckets x key cardinality), far below
the raw stream, but potentially beyond streaming state-store budgets —
hence the ``foreachBatch`` + versioned-parquet pattern shared with
``streaming/cdc.py`` rather than a stateful operator.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_app_spark.streaming import _state


def current_rollup(spark, root: str) -> DataFrame | None:
    """Latest committed rollup, or None before the first batch."""
    from hadoop_app_spark.streaming.cdc import _partition_paths

    v, _, pvers, exact = _state.read_manifest(spark, root)
    if v < 0:
        return None
    if pvers is None:
        # legacy layout: one whole-rollup dir per version
        return spark.read.parquet(os.path.join(root, f"v{v}"))
    paths = _partition_paths(spark, root, pvers, exact=exact)
    if not paths:
        return None
    return spark.read.parquet(*paths)


def _partial(batch: DataFrame, ts_col: str, bucket: str, keys: Sequence[str], value_col: str) -> DataFrame:
    from pyspark.sql.types import TimestampNTZType

    # bucket_start is the MERGE KEY for every future batch, so its
    # formatting must not depend on the session timezone — a stream
    # resumed under a different tz would otherwise split/duplicate its
    # own buckets (r3 ADVICE). Two cases:
    # - TIMESTAMP (instant): format via an explicit UTC
    #   reinterpretation, one canonical wall-clock per instant;
    # - TIMESTAMP_NTZ (naive): the value already IS timezone-free —
    #   format it DIRECTLY. Routing a naive value through
    #   convert_timezone would interpret it in the session tz and
    #   shift the label by the session offset (measured: a 00:09 naive
    #   event labels 05:00 under America/New_York), re-creating for
    #   NTZ exactly the resume-split hazard the UTC path fixes for
    #   instants.
    if isinstance(batch.schema[ts_col].dataType, TimestampNTZType):
        start = F.col("_w.start")
    else:
        start = F.expr("convert_timezone('UTC', _w.start)")
    return (
        batch.groupBy(F.window(ts_col, bucket).alias("_w"), *keys)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("_sum_dec"),
        )
        .select(
            F.date_format(start, "yyyy-MM-dd HH:mm").alias("bucket_start"),
            *keys,
            "n",
            "_sum_dec",
        )
    )


def incremental_rollup(
    event_stream: DataFrame,
    rollup_root: str,
    ts_col: str = "ts",
    bucket: str = "1 hour",
    keys: Sequence[str] = ("event_type",),
    value_col: str = "value",
    checkpoint_dir: str | None = None,
    n_partitions: int = 16,
):
    """Fold an event stream into a materialized per-bucket aggregate at
    *rollup_root* (columns: bucket_start, *keys, n, sum_value). Each
    micro-batch merges its partial aggregates into the stored rollup
    and commits the next version behind an atomic pointer.

    The stored rollup is hash-partitioned on the merge key
    (bucket_start, *keys): a batch reads and rewrites ONLY the
    partitions its buckets hash into — the commit manifest carries
    untouched partitions forward by reference, so per-batch I/O scales
    with the batch's bucket spread, not the full rollup (which grows
    without bound as buckets accumulate). Returns the StreamingQuery."""
    from hadoop_app_spark.streaming.cdc import _PART, _partition_col, _partition_paths

    keys = list(keys)
    merge_keys = ["bucket_start", *keys]

    def fold(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        version, last_batch, pvers, exact = _state.read_manifest(spark, rollup_root)
        if batch_id <= last_batch:
            # foreachBatch is at-least-once; batch_id is stable across
            # retries, so a replay of an already-merged batch (crash
            # between our pointer commit and the streaming commit log)
            # must be a no-op — otherwise its counts merge TWICE
            return
        if not batch.head(1):
            return
        # persist: the partial agg feeds BOTH the touched-partition
        # collect and the merge write — without pinning it the whole
        # micro-batch aggregation executes twice per trigger
        part0 = _partial(batch, ts_col, bucket, keys, value_col).persist()
        part = part0
        p = n_partitions if pvers is None else len(pvers)
        if pvers is None and version >= 0:
            # one-time migration of a legacy unpartitioned rollup
            prev = spark.read.parquet(os.path.join(rollup_root, f"v{version}"))
            touched = list(range(p))
        elif pvers is None:
            prev = None
            touched = list(range(p))
        else:
            # bounded collect: at most p distinct partition ids
            touched = sorted(
                r[_PART]
                for r in part.select(
                    _partition_col(merge_keys, p).alias(_PART)
                ).distinct().collect()
            )
            paths = _partition_paths(
                spark, rollup_root, pvers, only=touched, exact=exact
            )
            prev = spark.read.parquet(*paths) if paths else None
        if prev is not None:
            # merge on the STORED decimal accumulator — round-tripping
            # through the derived double would re-round every version
            part = prev.select("bucket_start", *keys, "n", "_sum_dec").unionByName(part)
        merged = (
            part.groupBy("bucket_start", *keys)
            .agg(F.sum("n").alias("n"), F.sum("_sum_dec").alias("_sum_dec"))
            .select(
                "bucket_start",
                *keys,
                "n",
                F.col("_sum_dec").cast("decimal(18,6)").alias("_sum_dec"),
                F.col("_sum_dec").cast("double").alias("sum_value"),
            )
        )
        nv = version + 1
        try:
            merged.withColumn(_PART, _partition_col(merge_keys, p)).write.partitionBy(
                _PART
            ).mode("overwrite").parquet(os.path.join(rollup_root, f"v{nv}"))
        finally:
            part0.unpersist()
        # record emptiness at commit (one listing, probe-free reads):
        # rollup merges never delete buckets, but a touched partition
        # can still be dir-less when the batch produced no row for it
        from hadoop_app_spark.streaming.cdc import _written_partitions

        written = _written_partitions(spark, os.path.join(rollup_root, f"v{nv}"))
        new_exact = exact or pvers is None
        new_pvers = [-1] * p if pvers is None else list(pvers)
        for i in touched:
            if i in written:
                new_pvers[i] = nv
            elif pvers is None:
                new_pvers[i] = -1
            # else: untouched-by-the-write carry-forward stays as-is
            # (a touched partition whose merge output is empty keeps
            # nothing here — rollup rows never disappear, so if it had
            # data before it was rewritten and IS in `written`)
        _state.write_manifest(
            spark, rollup_root, nv, batch_id, new_pvers, exact=new_exact
        )

    writer = event_stream.writeStream.foreachBatch(fold).outputMode("update")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()

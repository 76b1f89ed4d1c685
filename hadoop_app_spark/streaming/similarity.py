"""Incremental top-k similarity over a streaming embedding corpus.

Pattern from the incremental/adaptive top-k literature (PAPERS.md:
"Incremental Based Framework for Efficient Top-K Similarity Search",
EDBT 2020; "Continuously Adaptive Similarity Search", SIGMOD 2020):
top-k is a MERGEABLE summary — the global top-k of (old corpus + new
batch) equals the top-k of (old top-k result + new batch's top-k).
So a stream of corpus vectors folds into a bounded per-query result:

    per micro-batch:  score batch x queries  ->  batch-local top-k
    merge:            union with stored top-k ->  re-rank  ->  keep k

State is q x k rows — driver/table-sized, never corpus-sized — so
``foreachBatch`` + a versioned parquet result (same pointer dance as
``streaming/cdc.py``) is the right engine; a stateful operator would
cap us at state-store budgets for no benefit. Each batch's scoring
reuses the BATCH brute-force kernel, so the scale shape (bounded
query set broadcast, corpus batch never shuffled) is inherited.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hadoop_app_spark.operators.similarity import brute_force_topk
from hadoop_app_spark.streaming import _state


def current_topk(spark, root: str) -> DataFrame | None:
    """Latest committed top-k result, or None before the first batch."""
    v, _ = _state.read_state(spark, root)
    if v < 0:
        return None
    return spark.read.parquet(os.path.join(root, f"v{v}"))


def merge_topk(
    previous: DataFrame | None, batch_topk: DataFrame, k: int
) -> DataFrame:
    """Merge two per-query top-k frames and keep the best k — the
    mergeability property that makes streaming top-k exact. Keyed
    window on query_id; both inputs are <= q*k rows."""
    merged = batch_topk if previous is None else previous.unionByName(batch_topk)
    # defense-in-depth vs replays/overlapping inputs: the same corpus
    # vector appearing twice must occupy ONE slot, not evict the true
    # k-th distinct neighbor
    merged = merged.dropDuplicates(["query_id", "vec_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        merged.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= k)
        .drop("_r", "rank")
        .withColumn("rank", F.row_number().over(w))
    )


def streaming_topk(
    corpus_stream: DataFrame,
    queries: DataFrame,
    result_root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    checkpoint_dir: str | None = None,
):
    """Fold a corpus-vector stream into an exact running top-k per query.

    ``queries``: a bounded batch frame [query_id, query_vec]. Each
    micro-batch is scored with the batch kernel, merged with the stored
    result, and committed as ``{root}/v{n}`` behind an atomic pointer.
    Exactness: scoring is brute-force within each batch and top-k is
    mergeable, so after any batch the committed result equals the batch
    top-k over all vectors seen so far. Returns the StreamingQuery.
    """

    def fold(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        version, last_batch = _state.read_state(spark, result_root)
        if batch_id <= last_batch:
            # at-least-once replay of an already-merged batch (crash
            # between our pointer commit and the streaming commit log)
            # must be a no-op; batch_id is stable across retries
            return
        if not batch.head(1):
            return
        batch_topk = brute_force_topk(batch, queries, id_col=id_col, vec_col=vec_col, k=k)
        nxt = merge_topk(current_topk(spark, result_root), batch_topk, k)
        nxt.write.mode("overwrite").parquet(os.path.join(result_root, f"v{version + 1}"))
        _state.write_state(spark, result_root, version + 1, batch_id)

    writer = corpus_stream.writeStream.foreachBatch(fold).outputMode("update")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()

"""Streaming CDC apply: a change-event stream continuously folded into
a keyed snapshot via ``foreachBatch``.

Extends ``operators.upsert.apply_changes`` (the batch CDC compactor,
S15's Spark-first answer) to Structured Streaming: each micro-batch of
change rows (upserts + tombstones) is applied to the current snapshot
and the next snapshot version is committed. This is the streaming
pattern for dimension tables / feature stores fed by a CDC firehose.

Why foreachBatch and not a stateful operator: the snapshot is
table-sized (up to the full 100 TB dimension), far beyond streaming
state-store budgets; foreachBatch hands each micro-batch to ordinary
BATCH Spark, so the anti-join + union runs with the same scale shape
as the batch operator (snapshot never shuffles, change batch
broadcasts). Versioned directories + an atomic pointer file stand in
for a table format's transaction log — a real deployment would write
Delta/Iceberg and MERGE INTO; the version dance below is the same
idea with plain parquet.

Within-batch ordering: micro-batches arrive in stream order, but rows
WITHIN one batch are unordered — ``seq_col`` (e.g. a CDC log offset)
picks the last writer per key per batch deterministically.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hadoop_app_spark.operators.upsert import apply_changes
from hadoop_app_spark.streaming import _state


def current_snapshot(spark, root: str) -> DataFrame:
    """The latest committed snapshot version under *root*."""
    version, _ = _state.read_state(spark, root, fresh_version=0)
    return spark.read.parquet(os.path.join(root, f"v{version}"))


def last_writer_wins(
    changes: DataFrame, keys: Sequence[str], seq_col: str
) -> DataFrame:
    """Compact a change batch to one row per key: highest *seq_col*
    wins (ties broken by it being unique, e.g. a log offset). A keyed
    window — scale-safe, partitioned by the change keys."""
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_changes_stream(
    change_stream: DataFrame,
    snapshot_root: str,
    keys: Sequence[str],
    op_col: str = "op",
    seq_col: str | None = None,
    checkpoint_dir: str | None = None,
):
    """Fold a change stream into the snapshot at *snapshot_root*.

    The snapshot must be seeded as ``{root}/v0`` (pointer optional —
    absent reads as 0). Each micro-batch writes ``v{n+1}`` and then
    atomically advances the pointer, so readers never see a partial
    snapshot and a crashed batch leaves the current version intact.
    Returns the StreamingQuery (caller awaits termination).
    """

    def fold(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        version, last_batch = _state.read_state(spark, snapshot_root, fresh_version=0)
        if batch_id <= last_batch:
            # at-least-once replay guard (apply_changes is idempotent,
            # but skipping avoids a spurious snapshot version; batch_id
            # is stable across retries)
            return
        if seq_col is not None:
            batch = last_writer_wins(batch, keys, seq_col)
        snap = current_snapshot(spark, snapshot_root)
        nxt = apply_changes(snap, batch, keys, op_col=op_col)
        nxt.write.mode("overwrite").parquet(os.path.join(snapshot_root, f"v{version + 1}"))
        _state.write_state(spark, snapshot_root, version + 1, batch_id)

    writer = change_stream.writeStream.foreachBatch(fold).outputMode("update")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()

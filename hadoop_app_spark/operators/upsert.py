"""Batch upsert / CDC-apply — the Spark-first answer to keyed CRUD.

The reference carries an HBase stub (``CURDSample.java:6-13``, creates a
config and does nothing) — its only gesture at keyed create/update/
delete. On Spark the idiomatic equivalent is not a row store but a
snapshot refresh: apply a (much smaller) change batch to an immutable
snapshot and write the next snapshot — the daily pattern of every
dimension table and feature store.

Scale shape (100 TB snapshot, ~GB change batch):
- The snapshot NEVER shuffles: untouched rows are found with a
  LEFT ANTI join against the change keys, which Spark executes as a
  broadcast hash anti-join when the change batch fits (hinted via
  ``broadcast_changes``); surviving change rows are unioned on top.
- Tombstones (``op_col == delete_value``) drop the key entirely;
  any non-delete change row replaces the full row for its key
  (insert-or-replace semantics — "last writer wins" within a batch is
  the caller's contract, as in any CDC compactor).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str | None = None,
    delete_value: str = "D",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Insert-or-replace ``changes`` into ``snapshot`` by ``keys``;
    rows with ``op_col == delete_value`` are tombstones.

    Returns the next snapshot with the same schema as ``snapshot``.
    """
    keys = list(keys)
    data_cols = [c for c in snapshot.columns]
    if op_col is None:
        live = changes.select(*data_cols)
        touched = changes.select(*keys)
    else:
        # null-safe: a change row with op=NULL (insert events that only
        # stamp op on deletes) is an upsert — a bare != would drop it
        # from live while its key still anti-joins the snapshot away,
        # silently deleting the key
        live = changes.where(~F.col(op_col).eqNullSafe(delete_value)).select(*data_cols)
        touched = changes.select(*keys)
    touched = touched.distinct()
    if broadcast_changes:
        touched = F.broadcast(touched)
    untouched = snapshot.join(touched, keys, "left_anti")
    return untouched.unionByName(live)

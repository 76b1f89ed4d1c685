"""Scale-safe global window operators.

A bare ``ntile(k) OVER (ORDER BY ...)`` (or any unpartitioned window)
makes Spark emit ``WindowExec: No Partition Defined`` and funnel the
ENTIRE input through one task — correct at sf0.1, fatal at 100 TB.
Exact ``percentile()`` is no rescue: Spark's implementation is an
imperative aggregate that buffers every distinct value in one reducer,
and it cannot honor a multi-column tiebreak anyway.

``global_ntile`` reproduces ntile's exact semantics with bounded
driver state and no global single-partition stage:

1. range-repartition the order columns (the same machinery a scale-safe
   ``ORDER BY`` uses) and persist, so both passes see one partitioning;
2. per-partition counts -> driver (P rows, P = shuffle parallelism);
3. the k-1 bucket cut positions each live in a known partition at a
   known local offset; extract those boundary tuples with a window
   PARTITIONED by partition id (never global);
4. assign buckets on the ORIGINAL DataFrame as a shuffle-free CASE
   chain against the broadcast boundary literals.

The returned plan's hot path is scan -> project: zero exchanges, no
WindowExec. The boundary job costs one range shuffle of the order
columns only — the 2-pass price any exact distributed order statistic
pays.

ntile semantics replicated exactly (SQL standard): with n rows and k
buckets, q = n div k, r = n mod k; buckets 1..r hold q+1 rows, the
rest q. A row's bucket is 1 + (#cut tuples strictly below it), with
cut_b at global position b*q + min(b, r) under the total order. The
caller must supply order columns forming a STRICT total order (include
a unique key) — that is also what makes plain ntile deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__gn_pid"
_RN = "__gn_rn"


def ntile_cut_positions(n: int, k: int) -> list[int]:
    """Global 1-based position of the LAST row of each of buckets 1..k-1."""
    q, r = divmod(n, k)
    return [b * q + min(b, r) for b in range(1, k)]


def _tuple_gt(order_cols: Sequence[str], boundary: tuple) -> Column:
    """Lexicographic ``row > boundary`` over the order columns."""
    cond = F.lit(False)
    for col, val in reversed(list(zip(order_cols, boundary))):
        cond = (F.col(col) > F.lit(val)) | ((F.col(col) == F.lit(val)) & cond)
    return cond


def global_ntile_boundaries(
    df: DataFrame, k: int, order_cols: Sequence[str], num_partitions: int | None = None
) -> list[tuple]:
    """The k-1 boundary tuples (values of *order_cols* at the cut rows).

    Bounded driver state: P partition counts + (k-1) boundary rows.
    """
    if k <= 1:
        return []  # ntile(1) is bucket 1 for every row — no boundaries
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    # Persist: repartitionByRange samples range bounds per action; without
    # pinning, the counts pass and the boundary pass could see different
    # partitionings and the extracted offsets would be wrong.
    r = (
        df.select(*order_cols)
        .repartitionByRange(p, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .persist()
    )
    try:
        cnts = {row[_PID]: row["cnt"] for row in r.groupBy(_PID).agg(F.count("*").alias("cnt")).collect()}
        n = sum(cnts.values())
        if n == 0:
            return []
        offsets, acc = {}, 0
        for pid in sorted(cnts):
            offsets[pid] = acc
            acc += cnts[pid]
        # cut position -> (owning partition, local 1-based offset)
        wanted: dict[int, dict[int, list[int]]] = {}
        cut_local: list[tuple[int, int]] = []
        for cut in ntile_cut_positions(n, k):
            cut = max(cut, 1)  # n < k: early buckets may be empty
            for pid in sorted(cnts):
                if offsets[pid] < cut <= offsets[pid] + cnts[pid]:
                    loc = cut - offsets[pid]
                    wanted.setdefault(pid, {}).setdefault(loc, []).append(cut)
                    cut_local.append((pid, loc))
                    break
        w = Window.partitionBy(_PID).orderBy(*order_cols)
        pairs = reduce(
            lambda a, b: a | b,
            (
                (F.col(_PID) == pid) & F.col(_RN).isin(list(locs))
                for pid, locs in wanted.items()
            ),
        )
        rows = (
            r.where(F.col(_PID).isin(list(wanted)))
            .withColumn(_RN, F.row_number().over(w))
            .where(pairs)
            .collect()
        )
        by_key = {(row[_PID], row[_RN]): tuple(row[c] for c in order_cols) for row in rows}
        return [by_key[key] for key in cut_local]
    finally:
        r.unpersist()


def grouped_percentile_disc(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probs: Sequence[float],
    num_partitions: int | None = None,
) -> dict[tuple, dict[float, object]]:
    """Exact ``percentile_disc(p) WITHIN GROUP (ORDER BY value)`` per
    group, without buffering any group's values in one task.

    Spark's built-in percentile/percentile_disc is an imperative
    aggregate that materializes EVERY value of a group in a single
    reducer — fine for many small groups, fatal for few huge ones
    (3 metrics over a 100 TB fact table = n/3 rows in one task's
    memory). This runs the same bounded 2-pass order-statistic
    extraction as ``global_ntile_boundaries``: range-repartition on
    (group, value), per-(partition, group) counts to the driver
    (P x G rows — use it for FEW groups; for high-cardinality groups
    the built-in's per-group buffering is the right tool), then pull
    each cut row with partition-local windows.

    percentile_disc semantics: the value at 1-based sorted position
    ceil(p * n_g) (the smallest value whose cumulative distribution
    >= p). Returns {group_tuple: {p: value}}. Group values and the
    value column must be non-null (the boundary-row filter compares
    with ==, which never matches NULL groups).
    """
    spark = df.sparkSession
    p_n = num_partitions or spark.sparkContext.defaultParallelism
    cols = [*group_cols, value_col]
    r = (
        df.select(*cols)
        .repartitionByRange(p_n, *cols)
        .withColumn(_PID, F.spark_partition_id())
        .persist()
    )
    try:
        cnt_rows = r.groupBy(_PID, *group_cols).agg(F.count("*").alias("cnt")).collect()
        per_group: dict[tuple, list[tuple[int, int]]] = {}
        for row in cnt_rows:
            g = tuple(row[c] for c in group_cols)
            per_group.setdefault(g, []).append((row[_PID], row["cnt"]))
        import math

        wanted: dict[tuple[int, tuple], dict[int, list[tuple]]] = {}
        want_keys: dict[tuple, tuple[int, int]] = {}  # (g, p) -> (pid, loc)
        for g, pid_counts in per_group.items():
            pid_counts.sort()
            n_g = sum(c for _, c in pid_counts)
            for p in probs:
                k = min(max(math.ceil(p * n_g), 1), n_g)
                acc = 0
                for pid, c in pid_counts:
                    if acc < k <= acc + c:
                        loc = k - acc
                        wanted.setdefault((pid, g), {}).setdefault(loc, []).append(p)
                        want_keys[(g, p)] = (pid, loc)
                        break
                    acc += c
        if not wanted:
            return {}  # empty input or empty probs — nothing to extract
        w = Window.partitionBy(_PID, *group_cols).orderBy(value_col)
        pid_set = {pid for pid, _ in wanted}
        cond = reduce(
            lambda a, b: a | b,
            (
                reduce(
                    lambda x, y: x & y,
                    [F.col(_PID) == pid]
                    + [F.col(c) == F.lit(v) for c, v in zip(group_cols, g)],
                )
                & F.col(_RN).isin(list(locs))
                for (pid, g), locs in wanted.items()
            ),
        )
        rows = (
            r.where(F.col(_PID).isin(list(pid_set)))
            .withColumn(_RN, F.row_number().over(w))
            .where(cond)
            .collect()
        )
        by_pos = {
            (row[_PID], tuple(row[c] for c in group_cols), row[_RN]): row[value_col]
            for row in rows
        }
        out: dict[tuple, dict[float, object]] = {}
        for (g, p), (pid, loc) in want_keys.items():
            out.setdefault(g, {})[p] = by_pos[(pid, g, loc)]
        return out
    finally:
        r.unpersist()


def pack_shards(
    df: DataFrame,
    weight_col: str,
    order_cols: Sequence[str],
    budget: int,
    out_col: str = "shard_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Pack rows into fixed-budget shards in global order: row's shard =
    (cumulative weight of all STRICTLY EARLIER rows) div budget — the
    training-shard assignment every corpus export needs (documents
    packed into ~N-token files, deterministic, resumable).

    A naive ``sum() OVER (ORDER BY ...)`` is an unpartitioned window —
    the whole corpus through one task. Here the global running sum is
    the classic two-pass prefix scan:

    1. range-repartition on the order columns and ``localCheckpoint``
       (materialized, so the partitioning is IDENTICAL for both passes
       — repartitionByRange re-samples range bounds per action);
    2. per-partition weight totals -> driver (P rows, bounded), prefix
       offsets computed driver-side;
    3. local running sum via a window PARTITIONED by partition id
       (never global), plus the broadcast offset of the partition.

    *order_cols* must form a strict total order (include a unique key);
    *weight_col* must be integral and non-negative — the div is exact
    integer arithmetic, engine-portable. Unlike greedy first-fit
    packing, a shard may exceed ``budget`` by at most one row's weight
    (the standard streaming-packing contract: a row never splits).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    return (
        global_prefix_sum(df, weight_col, order_cols, "_before", num_partitions)
        .withColumn(out_col, F.expr(f"_before div {budget}"))
        .drop("_before")
    )


def global_prefix_sum(
    df: DataFrame,
    weight_col: str,
    order_cols: Sequence[str],
    out_col: str = "_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = cumulative *weight_col* of all STRICTLY
    EARLIER rows in the total order — the scale-safe two-pass prefix
    scan factored out of :func:`pack_shards` (see its docstring for
    the range-repartition / per-partition-offset mechanics)."""
    order_cols = list(order_cols)
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    r = (
        df.repartitionByRange(p, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = {
        row[_PID]: row["w"]
        for row in r.groupBy(_PID).agg(F.sum(weight_col).alias("w")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_before = F.coalesce(F.sum(weight_col).over(w), F.lit(0))
    offset = reduce(
        lambda acc_c, kv: acc_c.when(F.col(_PID) == kv[0], F.lit(kv[1])),
        offsets.items(),
        F.when(F.lit(False), F.lit(0)),
    ).otherwise(F.lit(0))
    return r.withColumn(out_col, offset + local_before).drop(_PID)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_cols: Sequence[str],
    seq_len: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """GPT-style sample packing: concatenate documents in global order
    and cut fixed ``seq_len``-token training sequences, docs SPANNING
    sequence boundaries (no padding, the pretraining-default layout).

    -> one row per (document, sequence) span: the original columns plus
      seq_id          which training sequence the span lands in
      seq_pos         token offset of the span inside that sequence
      doc_tok_offset  token offset of the span inside the document
      n_in_seq        span length in tokens
    Every sequence except the last holds exactly seq_len tokens
    (sum(n_in_seq) over a seq_id == seq_len); zero-token docs vanish.

    Scale shape: the global offset is the same bounded two-pass prefix
    scan as :func:`pack_shards` (never an unpartitioned window); span
    expansion is an explode of (last_seq - first_seq + 1) rows — for
    seq_len >> doc length that is 1-2 rows per doc.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    n = F.col(token_col).cast("long")
    b = F.col("_before")
    pref = global_prefix_sum(df, token_col, order_cols, "_before", num_partitions)
    # a negative token count (upstream bug) would silently corrupt the
    # prefix offsets of every later row — fail loudly instead. The min
    # runs on global_prefix_sum's CHECKPOINTED frame (one cheap scan of
    # materialized blocks), not the raw input, whose possibly-expensive
    # upstream plan would otherwise execute a second time
    min_w = pref.agg(F.min(n)).head()[0]
    if min_w is not None and min_w < 0:
        raise ValueError(f"negative token count in {token_col!r}: {min_w}")
    pref = pref.where(n > 0)
    # integer div throughout: float division + floor would wobble past
    # 2^53 cumulative tokens, i.e. precisely at the scale that matters.
    # token_col is backtick-quoted: a space/reserved-word column name
    # must not change the parsed expression
    first = F.expr(f"_before div {seq_len}")
    last = F.expr(f"(_before + cast(`{token_col}` as bigint) - 1) div {seq_len}")
    out = pref.withColumn("seq_id", F.explode(F.sequence(first, last)))
    s = F.col("seq_id")
    start_in_doc = F.greatest(s * seq_len - b, F.lit(0).cast("long"))
    end_in_doc = F.least(n, (s + 1) * seq_len - b)
    return (
        out.withColumn("seq_pos", F.greatest(b - s * seq_len, F.lit(0).cast("long")))
        .withColumn("doc_tok_offset", start_in_doc)
        .withColumn("n_in_seq", end_in_doc - start_in_doc)
        .drop("_before")
    )


def global_ntile(
    df: DataFrame,
    k: int,
    order_cols: Sequence[str],
    out_col: str = "ntile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``ntile(k) OVER (ORDER BY order_cols)`` without a global window.

    *order_cols* must form a strict total order (include a unique key)
    and contain NO NULLs — the broadcast CASE chain compares with <,
    which is null-poisoned (built-in ntile orders NULLS FIRST instead;
    pre-filter or coalesce nullable keys before calling).
    The returned DataFrame's plan adds only a projection to *df* — the
    boundary side-job runs eagerly at build time (bounded collects, as
    with IVF centroids).
    """
    if k <= 1:
        # matches F.ntile(1): every row lands in bucket 1
        return df.withColumn(out_col, F.lit(1).cast("int"))
    bounds = global_ntile_boundaries(df, k, order_cols, num_partitions)
    if not bounds:
        return df.withColumn(out_col, F.lit(None).cast("int"))
    bucket = reduce(
        lambda acc, b: acc + _tuple_gt(order_cols, b).cast("int"),
        bounds,
        F.lit(1),
    )
    return df.withColumn(out_col, bucket.cast("int"))

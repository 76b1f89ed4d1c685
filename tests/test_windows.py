"""global_ntile — the scale-safe replacement for unpartitioned ntile.

Differential contract: identical buckets to ``F.ntile(k) OVER (ORDER BY
...)`` for every n mod k residue, duplicate order values (unique-key
tiebreak), and n < k, while the produced plan contains NO unpartitioned
window (the built-in's single-partition funnel is the round-2 verdict's
one scale-killer).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hadoop_app_spark.operators.windows import (
    global_ntile,
    global_ntile_boundaries,
    ntile_cut_positions,
)


def _buckets(df, col):
    return {(r["v"], r["id"]): r[col] for r in df.collect()}


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (4, 4), (5, 4), (101, 4), (103, 7)])
def test_matches_builtin_ntile(spark, n, k):
    random.seed(n * 31 + k)
    rows = [(random.randint(0, 5), i) for i in range(n)]  # heavy order-value ties
    df = spark.createDataFrame(rows, "v int, id int")
    expected = _buckets(df.withColumn("b", F.ntile(k).over(Window.orderBy("v", "id"))), "b")
    got = _buckets(global_ntile(df, k, ["v", "id"], "b"), "b")
    assert got == expected


def test_cut_positions():
    # n=10, k=4: buckets sized 3,3,2,2 -> last rows at 3, 6, 8
    assert ntile_cut_positions(10, 4) == [3, 6, 8]
    # even split
    assert ntile_cut_positions(8, 4) == [2, 4, 6]
    # n < k: one row per early bucket
    assert ntile_cut_positions(2, 4) == [1, 2, 2]


def test_no_unpartitioned_window_in_plan(spark):
    df = spark.createDataFrame([(i % 7, i) for i in range(200)], "v int, id int")
    out = global_ntile(df, 4, ["v", "id"], "b")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # assignment is a pure projection
    assert "Exchange" not in plan


def test_boundaries_are_order_statistics(spark):
    df = spark.createDataFrame([(i, i) for i in range(100)], "v int, id int")
    bounds = global_ntile_boundaries(df, 4, ["v", "id"])
    assert [b[0] for b in bounds] == [24, 49, 74]  # positions 25, 50, 75 (1-based)


def test_empty_input(spark):
    df = spark.createDataFrame([], "v int, id int")
    assert global_ntile(df, 4, ["v", "id"], "b").count() == 0


def test_grouped_percentile_disc_matches_builtin(spark):
    """Differential vs percentile_disc WITHIN GROUP across duplicate
    values, uneven group sizes, and edge probabilities."""
    import random

    from hadoop_app_spark.operators.windows import grouped_percentile_disc

    random.seed(11)
    rows = []
    for g, size in [("a", 1), ("b", 7), ("c", 100), ("d", 101)]:
        rows += [(g, float(random.randint(0, 20))) for _ in range(size)]
    df = spark.createDataFrame(rows, "g string, v double")
    probs = [0.01, 0.25, 0.5, 0.75, 1.0]
    got = grouped_percentile_disc(df, ["g"], "v", probs)
    exp_rows = df.groupBy("g").agg(
        *[
            F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY v)").alias(f"p{i}")
            for i, p in enumerate(probs)
        ]
    ).collect()
    for r in exp_rows:
        for i, p in enumerate(probs):
            assert got[(r.g,)][p] == r[f"p{i}"], (r.g, p)


def test_grouped_percentile_disc_no_group_buffering(spark):
    """The extraction must not place any unpartitioned window or
    per-group value buffer in the main plan — only bounded collects."""
    from hadoop_app_spark.operators.windows import grouped_percentile_disc

    df = spark.createDataFrame([("m", float(i)) for i in range(1000)], "g string, v double")
    out = grouped_percentile_disc(df, ["g"], "v", [0.5])
    # ceil(0.5 * 1000) = 500th smallest (1-based) of 0.0..999.0 = 499.0
    assert out[("m",)][0.5] == 499.0


def test_pack_shards_budget_and_order(spark):
    from hadoop_app_spark.operators.windows import pack_shards

    # weights 60,50,40,30,20 in id order; budget 100:
    # cum-before: 0,60,110,150,180 -> shards 0,0,1,1,1
    df = spark.createDataFrame(
        [(1, 60), (2, 50), (3, 40), (4, 30), (5, 20)], "doc_id long, w long"
    )
    got = {
        r.doc_id: r.shard_id
        for r in pack_shards(df, "w", ["doc_id"], budget=100).collect()
    }
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 1}


def test_pack_shards_partition_invariant(spark):
    import pytest as _pytest

    from hadoop_app_spark.operators.windows import pack_shards

    df = spark.createDataFrame(
        [(i, (i * 7) % 13 + 1) for i in range(200)], "doc_id long, w long"
    )
    base = {
        r.doc_id: r.shard_id
        for r in pack_shards(df, "w", ["doc_id"], 50, num_partitions=1).collect()
    }
    for p in (3, 17, 64):
        got = {
            r.doc_id: r.shard_id
            for r in pack_shards(df, "w", ["doc_id"], 50, num_partitions=p).collect()
        }
        assert got == base, f"shard assignment changed at num_partitions={p}"
    with _pytest.raises(ValueError):
        pack_shards(df, "w", ["doc_id"], 0)


def test_pack_sequences_invariants(spark):
    from hadoop_app_spark.operators.windows import pack_sequences

    rows = [(i, [3, 0, 7, 12, 5, 25, 1, 9][i % 8] + (i % 5)) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, ntok long")
    out = pack_sequences(df, "ntok", ["doc_id"], seq_len=32).collect()
    ntok = dict(rows)
    total = sum(n for n in ntok.values())
    # zero-token docs vanish; every span positive
    assert all(r.n_in_seq >= 1 for r in out)
    assert {r.doc_id for r in out} == {i for i, n in ntok.items() if n > 0}
    # spans tile each doc exactly: offsets 0..n contiguous
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, spans in by_doc.items():
        spans.sort(key=lambda r: r.doc_tok_offset)
        pos = 0
        for s in spans:
            assert s.doc_tok_offset == pos
            pos += s.n_in_seq
        assert pos == ntok[i]
    # every sequence but the last is exactly full; ids contiguous from 0
    by_seq = {}
    for r in out:
        by_seq[r.seq_id] = by_seq.get(r.seq_id, 0) + r.n_in_seq
    n_seqs = max(by_seq) + 1
    assert set(by_seq) == set(range(n_seqs))
    for sid, filled in by_seq.items():
        assert filled == 32 or (sid == n_seqs - 1 and filled == total % 32 or filled == 32)
    # seq_pos consistency: within a sequence, spans tile 0..fill
    in_seq = {}
    for r in out:
        in_seq.setdefault(r.seq_id, []).append(r)
    for sid, spans in in_seq.items():
        spans.sort(key=lambda r: r.seq_pos)
        pos = 0
        for s in spans:
            assert s.seq_pos == pos
            pos += s.n_in_seq


def test_pack_sequences_partition_invariant(spark):
    import pytest as _pytest

    from hadoop_app_spark.operators.windows import pack_sequences

    df = spark.createDataFrame(
        [(i, (i * 11) % 29 + 1) for i in range(150)], "doc_id long, ntok long"
    )
    key = lambda rows: sorted((r.doc_id, r.seq_id, r.seq_pos, r.doc_tok_offset, r.n_in_seq) for r in rows)
    base = key(pack_sequences(df, "ntok", ["doc_id"], 64, num_partitions=1).collect())
    for p in (4, 19):
        assert key(pack_sequences(df, "ntok", ["doc_id"], 64, num_partitions=p).collect()) == base
    with _pytest.raises(ValueError):
        pack_sequences(df, "ntok", ["doc_id"], 0)

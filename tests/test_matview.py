"""Incrementally-maintained materialized aggregate views
(operators/matview): the refreshed state must equal a from-scratch
rebuild, MIN-dirty groups must actually take the recompute path, and
corrupt deltas (retracting rows the view never held) must fail loudly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_app_spark.operators.matview import build_agg_view, refresh_agg_view
from tests.conftest import rows_set

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            "l_orderkey", "l_suppkey", F.col("l_quantity").cast("int").alias("qty")
        )
    )


def test_refresh_equals_full_rebuild(spark):
    li = _docs(spark)
    gen1 = li.where(F.col("l_orderkey") % 7 < 5)
    inserts = li.where(F.col("l_orderkey") % 7 == 5)
    retractions = gen1.where(F.col("l_orderkey") % 11 == 0)
    current = gen1.where(F.col("l_orderkey") % 11 != 0).unionByName(inserts)

    build_agg_view(
        gen1, "mv_t1", ["l_suppkey"], sums={"sum_qty": "qty"}, mins={"min_qty": "qty"}
    )
    stats = refresh_agg_view(
        spark, "mv_t1", inserts=inserts, retractions=retractions, current_base=current
    )
    got = spark.table("mv_t1")
    want = current.groupBy("l_suppkey").agg(
        F.count("*").alias("mv_count"),
        F.sum("qty").alias("sum_qty"),
        F.min("qty").alias("min_qty"),
    )
    assert rows_set(got) == rows_set(want)
    # at this scale the retraction batch removes some group minimum —
    # the dirty path must actually execute, or the test proves nothing
    assert stats["dirty_recomputed"] > 0
    assert stats["groups"] == want.count()


def test_insert_only_refresh_never_touches_base(spark):
    li = _docs(spark)
    gen1 = li.where(F.col("l_orderkey") % 7 < 5)
    inserts = li.where(F.col("l_orderkey") % 7 == 5)

    build_agg_view(
        gen1, "mv_t2", ["l_suppkey"], sums={"sum_qty": "qty"}, mins={"min_qty": "qty"}
    )
    # current_base intentionally omitted: inserts are min-monotone, so
    # the refresh must complete without it
    stats = refresh_agg_view(spark, "mv_t2", inserts=inserts)
    want = gen1.unionByName(inserts).groupBy("l_suppkey").agg(
        F.count("*").alias("mv_count"),
        F.sum("qty").alias("sum_qty"),
        F.min("qty").alias("min_qty"),
    )
    assert rows_set(spark.table("mv_t2")) == rows_set(want)
    assert stats["dirty_recomputed"] == 0


def test_retraction_of_unseen_rows_is_loud(spark):
    li = _docs(spark)
    gen1 = li.where(F.col("l_orderkey") % 7 < 5)
    build_agg_view(gen1, "mv_t3", ["l_suppkey"], sums={"sum_qty": "qty"})
    # retract a foreign group: supplier ids shifted out of range
    bogus = gen1.limit(5).withColumn("l_suppkey", F.col("l_suppkey") + 1_000_000)
    with pytest.raises(ValueError, match="negative|never contained"):
        refresh_agg_view(spark, "mv_t3", retractions=bogus)


def test_min_retraction_without_base_is_loud(spark):
    li = _docs(spark)
    gen1 = li.where(F.col("l_orderkey") % 7 < 5)
    build_agg_view(
        gen1, "mv_t4", ["l_suppkey"], sums={"sum_qty": "qty"}, mins={"min_qty": "qty"}
    )
    retractions = gen1.where(F.col("l_orderkey") % 11 == 0)
    with pytest.raises(ValueError, match="current_base"):
        refresh_agg_view(spark, "mv_t4", retractions=retractions)


def test_group_leaving_the_view(spark):
    spark_df = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 5)], "k int, v int"
    )
    build_agg_view(spark_df, "mv_t5", ["k"], sums={"sv": "v"})
    # retract ALL of group 1 -> it must leave the view entirely
    ret = spark.createDataFrame([(1, 10), (1, 20)], "k int, v int")
    stats = refresh_agg_view(spark, "mv_t5", retractions=ret)
    rows = spark.table("mv_t5").collect()
    assert [(r["k"], r["mv_count"], r["sv"]) for r in rows] == [(2, 1, 5)]
    assert stats["dropped"] == 1


def test_refresh_spec_pinned_across_generations(spark):
    """The measure spec survives the overwrite swap (table properties
    re-pinned), so a SECOND refresh still maintains the same measures."""
    df = spark.createDataFrame([(1, 10), (2, 5)], "k int, v int")
    build_agg_view(df, "mv_t6", ["k"], sums={"sv": "v"}, mins={"mv": "v"})
    refresh_agg_view(
        spark, "mv_t6", inserts=spark.createDataFrame([(1, 3)], "k int, v int")
    )
    refresh_agg_view(
        spark, "mv_t6", inserts=spark.createDataFrame([(2, 1)], "k int, v int")
    )
    rows = {r["k"]: (r["mv_count"], r["sv"], r["mv"]) for r in spark.table("mv_t6").collect()}
    assert rows == {1: (2, 13, 3), 2: (2, 6, 1)}


def _land(spark, tmp_path, src, gen, rows, schema):
    import os

    stage = str(tmp_path / f"stage{gen}")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(stage)
    part = next(f for f in sorted(os.listdir(stage)) if f.endswith(".parquet"))
    dst = os.path.join(src, f"g{gen}.parquet")
    os.rename(os.path.join(stage, part), dst)
    os.utime(dst, (1_000_000_000 + gen, 1_000_000_000 + gen))


def test_matview_refresh_stream_cdc(spark, tmp_path):
    """CDC files (op = I/D) maintain the view per micro-batch; the
    final state equals the view definition over the net rows, and the
    applied-epoch ledger records the last batch."""
    import os

    from hadoop_app_spark.streaming.ingest import matview_refresh_stream

    build_agg_view(
        spark.createDataFrame([(1, 10), (2, 5)], "k int, v int"),
        "mv_s1",
        ["k"],
        sums={"sv": "v"},
    )
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    os.makedirs(src)
    schema = "op string, k int, v int"
    _land(spark, tmp_path, src, 1, [("I", 1, 3), ("I", 3, 7)], schema)
    _land(spark, tmp_path, src, 2, [("D", 2, 5), ("I", 1, 4)], schema)

    q = matview_refresh_stream(spark, src, schema, "mv_s1", ck)
    q.awaitTermination()
    rows = {r["k"]: (r["mv_count"], r["sv"]) for r in spark.table("mv_s1").collect()}
    # k=1: base 10 + 3 + 4; k=2 fully retracted; k=3 new from stream
    assert rows == {1: (3, 17), 3: (1, 7)}
    props = {
        r["key"]: r["value"]
        for r in spark.sql("SHOW TBLPROPERTIES mv_s1").collect()
    }
    assert props["matview.applied_epoch"] == "1"


def test_matview_stream_replay_is_noop(spark, tmp_path):
    """A batch whose epoch is <= the recorded applied epoch is skipped
    — re-running the SAME files with a FRESH checkpoint (epochs restart
    at 0, both <= 1) applies nothing, so a crash-replayed delta can
    never double-count."""
    import os

    from hadoop_app_spark.streaming.ingest import matview_refresh_stream

    build_agg_view(
        spark.createDataFrame([(1, 10)], "k int, v int"), "mv_s2", ["k"],
        sums={"sv": "v"},
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "op string, k int, v int"
    _land(spark, tmp_path, src, 1, [("I", 1, 3)], schema)
    _land(spark, tmp_path, src, 2, [("I", 1, 4)], schema)

    q = matview_refresh_stream(spark, src, schema, "mv_s2", str(tmp_path / "ck1"))
    q.awaitTermination()
    before = {r["k"]: (r["mv_count"], r["sv"]) for r in spark.table("mv_s2").collect()}
    assert before == {1: (3, 17)}

    # fresh checkpoint over the already-applied directory: every batch
    # re-delivers, every batch skips
    q2 = matview_refresh_stream(spark, src, schema, "mv_s2", str(tmp_path / "ck2"))
    q2.awaitTermination()
    after = {r["k"]: (r["mv_count"], r["sv"]) for r in spark.table("mv_s2").collect()}
    assert after == before


def test_view_side_of_merge_is_exchange_free(spark):
    """The PLANS.md claim, machine-checked: joining the bucketed view
    to a delta aggregate on the bucket key consumes the view side as a
    bucketed FileScan with NO Exchange above it (the same join
    refresh_agg_view builds — same table layout, same keys)."""
    from hadoop_app_spark.operators.matview import _agg_exprs

    df = _docs(spark)
    build_agg_view(
        df.where(F.col("l_orderkey") % 7 < 5), "mv_plan", ["l_suppkey"],
        sums={"sum_qty": "qty"},
    )
    ins = (
        df.where(F.col("l_orderkey") % 7 == 5)
        .groupBy("l_suppkey")
        .agg(*_agg_exprs({"sum_qty": "qty"}, {}, prefix="i_"))
    )
    merged = spark.table("mv_plan").join(ins, ["l_suppkey"], "full_outer")
    merged.collect()  # execute so AQE materializes the real join plan

    from hadoop_app_spark.sources.layout import walk_executed_plan

    smjs = []
    walk_executed_plan(
        merged, lambda n, cls: smjs.append(n) if cls == "SortMergeJoinExec" else None
    )
    assert smjs, "merge join missing from the executed plan"

    # the view branch is Sort -> bucketed FileScan, NO Exchange: the
    # bucket layout satisfies the join's partitioning requirement
    def walk(node, acc):
        cls = node.getClass().getSimpleName()
        acc.append(cls)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i), acc)
        if cls.endswith("QueryStageExec"):
            walk(node.plan(), acc)
        return acc

    names = walk(smjs[0].children().apply(0), [])
    assert "FileSourceScanExec" in names, names
    assert not any("Exchange" in n for n in names), names


def test_matview_random_delta_sequences_equal_rebuild(spark):
    """Property: ANY sequence of insert/retraction batches maintained
    through refresh_agg_view lands on exactly the view a from-scratch
    rebuild over the net rows produces — the Gupta-Mumick delta algebra
    has no order- or batching-dependence."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        base=st.lists(
            st.tuples(st.integers(0, 4), st.integers(-50, 50)), min_size=1, max_size=12
        ),
        batches=st.lists(
            st.lists(st.tuples(st.integers(0, 4), st.integers(-50, 50)), max_size=6),
            min_size=1,
            max_size=3,
        ),
        retract_mask=st.lists(st.booleans(), min_size=3, max_size=3),
    )
    def run(base, batches, retract_mask):
        live = list(base)
        build_agg_view(
            spark.createDataFrame(base, "k int, v int"), "mv_prop", ["k"],
            sums={"sv": "v"},
        )
        for i, batch in enumerate(batches):
            ins = batch
            # retract a deterministic subset of currently-live rows
            ret = live[:: 2] if (retract_mask[i % 3] and live) else []
            ret = ret[:4]
            kwargs = {}
            if ins:
                kwargs["inserts"] = spark.createDataFrame(ins, "k int, v int")
            if ret:
                kwargs["retractions"] = spark.createDataFrame(ret, "k int, v int")
            if not kwargs:
                continue
            refresh_agg_view(spark, "mv_prop", **kwargs)
            for r in ret:
                live.remove(r)
            live.extend(ins)
        got = {
            r["k"]: (r["mv_count"], r["sv"])
            for r in spark.table("mv_prop").collect()
        }
        want = {}
        for k, v in live:
            c, s = want.get(k, (0, 0))
            want[k] = (c + 1, s + v)
        assert got == want

    run()


def test_null_min_retraction_keeps_the_group(spark):
    """A retraction whose min-column values are all NULL cannot have
    removed the group's min (F.min ignored them) — the dirty flag must
    read NOT-dirty, not NULL: an un-coalesced NULL flag would exclude
    the group from both the clean and the dirty branch and silently
    drop it from the view."""
    rows = [(1, None), (1, None), (1, 5), (2, 3), (2, 7)]
    df = spark.createDataFrame(rows, "k int, v int")
    build_agg_view(df, "mv_null", ["k"], sums={}, mins={"mv": "v"})
    # retract group 1's NULL rows AND group 2's current min, so the
    # dirty branch executes for group 2 while group 1's flag is the
    # NULL-comparison case
    ret = spark.createDataFrame([(1, None), (2, 3)], "k int, v int")
    current = spark.createDataFrame([(1, None), (1, 5), (2, 7)], "k int, v int")
    stats = refresh_agg_view(
        spark, "mv_null", retractions=ret, current_base=current
    )
    got = {r["k"]: (r["mv_count"], r["mv"]) for r in spark.table("mv_null").collect()}
    assert got == {1: (2, 5), 2: (1, 7)}
    assert stats["dirty_recomputed"] == 1  # group 2 only


def test_batch_refresh_preserves_stream_ledger(spark):
    """A plain batch refresh (no epoch) must carry the streaming
    replay ledger forward through the table swap — wiping it would
    re-open the double-apply window for the next crash-replay."""
    from hadoop_app_spark.operators.matview import applied_epoch

    build_agg_view(
        spark.createDataFrame([(1, 10)], "k int, v int"), "mv_led", ["k"],
        sums={"sv": "v"},
    )
    assert applied_epoch(spark, "mv_led") == -1
    refresh_agg_view(
        spark, "mv_led",
        inserts=spark.createDataFrame([(1, 1)], "k int, v int"),
        epoch=7,
    )
    assert applied_epoch(spark, "mv_led") == 7
    # plain refresh, no epoch: the ledger must survive the swap
    refresh_agg_view(
        spark, "mv_led",
        inserts=spark.createDataFrame([(2, 2)], "k int, v int"),
    )
    assert applied_epoch(spark, "mv_led") == 7


def test_max_refresh_equals_full_rebuild(spark):
    """MAX is MIN's mirror (VERDICT r9 item 2): the reference's own
    flagship aggregate (max-per-group, MaxTemperatureReducer.java:13-20)
    maintained incrementally — greatest on insert, dirty-group recompute
    when a retraction removes the current max."""
    li = _docs(spark)
    gen1 = li.where(F.col("l_orderkey") % 7 < 5)
    inserts = li.where(F.col("l_orderkey") % 7 == 5)
    retractions = gen1.where(F.col("l_orderkey") % 11 == 0)
    current = gen1.where(F.col("l_orderkey") % 11 != 0).unionByName(inserts)

    build_agg_view(
        gen1, "mv_mx1", ["l_suppkey"], sums={"sum_qty": "qty"},
        mins={"min_qty": "qty"}, maxs={"max_qty": "qty"},
    )
    stats = refresh_agg_view(
        spark, "mv_mx1", inserts=inserts, retractions=retractions,
        current_base=current,
    )
    want = current.groupBy("l_suppkey").agg(
        F.count("*").alias("mv_count"),
        F.sum("qty").alias("sum_qty"),
        F.min("qty").alias("min_qty"),
        F.max("qty").alias("max_qty"),
    )
    assert rows_set(spark.table("mv_mx1")) == rows_set(want)
    assert stats["dirty_recomputed"] > 0


def test_max_insert_only_never_touches_base(spark):
    df = spark.createDataFrame([(1, 10), (1, 20), (2, 5)], "k int, v int")
    build_agg_view(df, "mv_mx2", ["k"], sums={}, maxs={"mx": "v"})
    # inserts are max-monotone: no base needed
    stats = refresh_agg_view(
        spark, "mv_mx2",
        inserts=spark.createDataFrame([(1, 30), (2, 1)], "k int, v int"),
    )
    got = {r["k"]: (r["mv_count"], r["mx"]) for r in spark.table("mv_mx2").collect()}
    assert got == {1: (3, 30), 2: (2, 5)}
    assert stats["dirty_recomputed"] == 0


def test_max_retraction_dirty_recompute(spark):
    """Retracting the current max dirties the group; retracting a
    non-max row does not."""
    df = spark.createDataFrame([(1, 10), (1, 20), (2, 5), (2, 3)], "k int, v int")
    build_agg_view(df, "mv_mx3", ["k"], sums={}, maxs={"mx": "v"})
    ret = spark.createDataFrame([(1, 20), (2, 3)], "k int, v int")
    current = spark.createDataFrame([(1, 10), (2, 5)], "k int, v int")
    stats = refresh_agg_view(
        spark, "mv_mx3", retractions=ret, current_base=current
    )
    got = {r["k"]: (r["mv_count"], r["mx"]) for r in spark.table("mv_mx3").collect()}
    assert got == {1: (1, 10), 2: (1, 5)}
    assert stats["dirty_recomputed"] == 1  # group 1 only: 20 was its max


def test_read_agg_view_derives_avg(spark):
    """AVG is derived at read time from SUM/COUNT — no stored state,
    no maintenance rule."""
    from hadoop_app_spark.operators.matview import read_agg_view

    df = spark.createDataFrame([(1, 10), (1, 20), (2, 5)], "k int, v int")
    build_agg_view(df, "mv_avg", ["k"], sums={"sv": "v"})
    got = {
        r["k"]: r["avg_v"]
        for r in read_agg_view(spark, "mv_avg", avgs={"avg_v": "sv"}).collect()
    }
    assert got == {1: 15.0, 2: 5.0}


def test_null_group_key_rejected_at_build(spark):
    df = spark.createDataFrame([(1, 10), (None, 20)], "k int, v int")
    with pytest.raises(ValueError, match="NULL group-key"):
        build_agg_view(df, "mv_nk1", ["k"], sums={"sv": "v"})


def test_null_group_key_rejected_in_delta(spark):
    """ADVICE r9: a NULL-key delta group never joins the view's
    NULL-key row under SQL equality — it must be rejected loudly, not
    silently duplicated."""
    build_agg_view(
        spark.createDataFrame([(1, 10)], "k int, v int"), "mv_nk2", ["k"],
        sums={"sv": "v"},
    )
    with pytest.raises(ValueError, match="NULL group-key"):
        refresh_agg_view(
            spark, "mv_nk2",
            inserts=spark.createDataFrame([(None, 5)], "k int, v int"),
        )


def test_spec_json_roundtrip_with_delimiter_names(spark):
    """ADVICE r9: the spec is ONE JSON property, so measure/key names
    containing ',' or ':' round-trip intact instead of corrupting the
    delimited encoding."""
    df = spark.createDataFrame([(1, 10), (1, 3)], "k int, `s:v,x` int")
    build_agg_view(df, "mv_json", ["k"], sums={"sum:out,1": "s:v,x"})
    refresh_agg_view(
        spark, "mv_json",
        inserts=spark.createDataFrame([(2, 7)], "k int, `s:v,x` int"),
    )
    rows = {r["k"]: (r["mv_count"], r["sum:out,1"]) for r in spark.table("mv_json").collect()}
    assert rows == {1: (2, 13), 2: (1, 7)}


def test_stream_delete_against_min_view_with_base_table(spark, tmp_path):
    """VERDICT r9 item 3: a CDC stream that RETRACTS against a
    MIN-maintaining view no longer crashes — the sink resolves the
    caller-named base table per batch and recomputes exactly the dirty
    groups."""
    import os

    from hadoop_app_spark.streaming.ingest import matview_refresh_stream

    base0 = [(1, 10), (1, 20), (2, 5)]
    build_agg_view(
        spark.createDataFrame(base0, "k int, v int"), "mv_sb1", ["k"],
        sums={"sv": "v"}, mins={"mn": "v"},
    )
    # one batch: delete group 1's current min (10) and insert (2, 1)
    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "op string, k int, v int"
    _land(spark, tmp_path, src, 1, [("D", 1, 10), ("I", 2, 1)], schema)
    # the base AFTER the batch, registered under the name the sink resolves
    spark.createDataFrame(
        [(1, 20), (2, 5), (2, 1)], "k int, v int"
    ).createOrReplaceTempView("mv_sb1_base")

    q = matview_refresh_stream(
        spark, src, schema, "mv_sb1", str(tmp_path / "ck"),
        base_table="mv_sb1_base",
    )
    q.awaitTermination()
    got = {r["k"]: (r["mv_count"], r["sv"], r["mn"]) for r in spark.table("mv_sb1").collect()}
    assert got == {1: (1, 20, 20), 2: (2, 6, 1)}


class _DictMergeTarget:
    """Jar-free stand-in honoring the cdc.py merge-target contract
    (apply + read): an atomic keyed MERGE into driver-side state —
    what Delta/Iceberg would do transactionally on the cluster."""

    def __init__(self, spark, schema):
        self.spark, self.schema = spark, schema
        self.state = {}

    def read(self, spark):
        return spark.createDataFrame(list(self.state.values()), self.schema)

    def apply(self, batch, batch_id):
        cols = [part.split(" ")[0] for part in self.schema.split(", ")]
        for r in batch.collect():
            if r["op"] == "D":
                self.state.pop(r["k"], None)
            else:
                self.state[r["k"]] = tuple(r[c] for c in cols)


def test_matview_changes_transactional_target(spark, tmp_path):
    """The transactional swap contract, jar-free: matview_changes
    emits O(delta-groups) op-tagged rows carrying the epoch, a merge
    target folds them atomically, and max(mv_epoch) over the target is
    the replay ledger — data and ledger commit together."""
    import os

    from hadoop_app_spark.streaming.ingest import matview_refresh_stream

    schema_v = "k int, mv_count bigint, sv bigint, mn int, mv_epoch bigint"
    target = _DictMergeTarget(spark, schema_v)
    # seed the target with the built view (epoch -1 sentinel rows)
    seed = [(1, 2, 30, 10, -1), (2, 1, 5, 5, -1)]
    target.state = {r[0]: r for r in seed}

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "op string, k int, v int"
    _land(spark, tmp_path, src, 1, [("I", 1, 3), ("I", 3, 7)], schema)
    _land(spark, tmp_path, src, 2, [("D", 2, 5), ("I", 1, 4)], schema)
    spark.createDataFrame(
        [(1, 10), (1, 20), (1, 3), (1, 4), (3, 7)], "k int, v int"
    ).createOrReplaceTempView("mv_tt_base")

    spec = {"keys": ["k"], "sums": {"sv": "v"}, "mins": {"mn": "v"}}
    q = matview_refresh_stream(
        spark, src, schema, "ignored", str(tmp_path / "ck1"),
        base_table="mv_tt_base", view_target=target, spec=spec,
    )
    q.awaitTermination()
    got = {k: v[:4] for k, v in target.state.items()}
    # k=1: 10,20 +3 +4; k=2 fully retracted; k=3 new
    assert got == {1: (1, 4, 37, 3), 3: (3, 1, 7, 7)}
    # ledger IS the data: max epoch = 1
    assert max(v[4] for v in target.state.values()) == 1

    # crash-replay: fresh checkpoint re-delivers both batches; both
    # skip because their epochs are <= max(mv_epoch) in the target
    q2 = matview_refresh_stream(
        spark, src, schema, "ignored", str(tmp_path / "ck2"),
        base_table="mv_tt_base", view_target=target, spec=spec,
    )
    q2.awaitTermination()
    assert {k: v[:4] for k, v in target.state.items()} == got


def test_delete_only_batch_replay_does_not_wedge(spark, tmp_path):
    """ADVICE r10: a delete-only batch whose changes were ALL deletes
    leaves no epoch-carrying row, so the max(mv_epoch) ledger cannot
    skip its crash-replay — the sink must detect the replay signature
    (no inserts, no retraction key present in the view) and skip, like
    the target's own idempotent MERGE deletes, instead of raising the
    negative-count guard on every restart forever."""
    import os

    from hadoop_app_spark.streaming.ingest import matview_refresh_stream

    schema_v = "k int, mv_count bigint, sv bigint, mv_epoch bigint"
    target = _DictMergeTarget(spark, schema_v)
    target.state = {1: (1, 2, 30, -1), 2: (2, 1, 5, -1)}

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "op string, k int, v int"
    # batch 0: fully retracts group 2 — change set is one 'D' row
    _land(spark, tmp_path, src, 1, [("D", 2, 5)], schema)
    spec = {"keys": ["k"], "sums": {"sv": "v"}}

    q = matview_refresh_stream(
        spark, src, schema, "ignored", str(tmp_path / "ck1"),
        view_target=target, spec=spec,
    )
    q.awaitTermination()
    assert set(target.state) == {1}

    # crash-replay: a fresh checkpoint re-delivers the delete-only
    # batch; the ledger (max mv_epoch = -1) cannot skip it — the
    # replay signature must
    q2 = matview_refresh_stream(
        spark, src, schema, "ignored", str(tmp_path / "ck2"),
        view_target=target, spec=spec,
    )
    q2.awaitTermination()  # raises StreamingQueryException if wedged
    assert set(target.state) == {1}

    # and a genuinely NEW mixed batch afterwards still applies + raises
    # the guard where it should: retracting more than group 1 holds
    _land(spark, tmp_path, src, 2, [("D", 1, 10), ("D", 1, 20), ("D", 1, 99), ("I", 3, 7)], schema)
    import pytest as _pytest

    q3 = matview_refresh_stream(
        spark, src, schema, "ignored", str(tmp_path / "ck3"),
        view_target=target, spec=spec,
    )
    with _pytest.raises(Exception, match="negative|never contained"):
        q3.awaitTermination()

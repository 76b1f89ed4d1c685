"""Persisted IVF index: result parity with the in-memory IVF, real
partition pruning on probe, append proportionality, sidecar hygiene."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hadoop_app_spark.catalog import load_table
from hadoop_app_spark.operators.ann_index import (
    append_ivf_index,
    build_ivf_index,
    index_scan_stats,
    query_ivf_index,
)
from hadoop_app_spark.operators.similarity import ivf_topk

SF = "/root/testdata/sf0.001"


def _queries(emb):
    return emb.where(F.col("vec_id") <= 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def _res(df):
    return sorted((r.query_id, r.vec_id, r.rank) for r in df.collect())


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "emb")
    emb = load_table(spark, SF, "embeddings")
    build_ivf_index(emb, path, n_centroids=16, centroid_source=emb)
    return path, emb


def test_matches_in_memory_ivf(spark, built):
    path, emb = built
    persisted = query_ivf_index(spark, path, _queries(emb), k=5, n_probe=4)
    in_memory = ivf_topk(emb, _queries(emb), k=5, n_centroids=16, n_probe=4)
    assert _res(persisted) == _res(in_memory)


def test_probe_prunes_partitions(spark, built):
    path, emb = built
    # one query, n_probe=2: at most 2 of 16 cell directories are read
    q1 = _queries(emb).limit(1)
    df = query_ivf_index(spark, path, q1, k=5, n_probe=2)
    df.collect()
    stats = index_scan_stats(df)
    data_files = sum(
        1
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet") and "_ivf_centroids" not in root
    )
    assert data_files >= 8  # the layout actually split into many cells
    assert 0 < stats["files_read"] <= 2
    # the pruning is Catalyst partition pruning, not post-scan filtering
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan


def test_append_equals_full_build(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    half1 = emb.where(F.col("vec_id") < 250)
    half2 = emb.where(F.col("vec_id") >= 250)
    inc_path = str(tmp_path / "inc")
    # half1 contains the 16 lowest ids, so its centroids == full-corpus
    # centroids and the incremental index must equal the full rebuild
    build_ivf_index(half1, inc_path, n_centroids=16, centroid_source=half1)
    append_ivf_index(half2, inc_path)
    full_path = str(tmp_path / "full")
    build_ivf_index(emb, full_path, n_centroids=16, centroid_source=emb)
    q = _queries(emb)
    assert _res(query_ivf_index(spark, inc_path, q)) == _res(
        query_ivf_index(spark, full_path, q)
    )
    # and the appended rows landed in the existing layout
    n_inc = spark.read.parquet(inc_path).count()
    assert n_inc == emb.count()


def test_sidecar_invisible_and_bounded(spark, built):
    path, emb = built
    plain = spark.read.parquet(path)
    assert plain.count() == emb.count()
    assert "c_idx" not in plain.columns
    cents = spark.read.parquet(f"{path}/_ivf_centroids")
    assert cents.count() == 16


def test_ann_ingest_stream_appends_and_restarts(spark, tmp_path):
    """Streaming IVF ingest (streaming/ingest.ann_ingest_stream): each
    landed file appends into the persisted index; a checkpoint restart
    ingests ONLY new files; the probe answers from everything landed
    and still partition-prunes."""
    from hadoop_app_spark.streaming.ingest import ann_ingest_stream

    emb = load_table(spark, SF, "embeddings")
    root = tmp_path
    src, idx, ck = (str(root / x) for x in ("src", "idx", "ck"))
    os.makedirs(src)
    build_ivf_index(
        emb.where(F.col("vec_id") % 3 == 0).select("vec_id", "embedding"),
        idx, n_centroids=16, centroid_source=emb,
    )

    def land(gen, frame):
        stage = str(root / f"stage{gen}")
        frame.select("vec_id", "embedding").coalesce(1).write.parquet(stage)
        part = next(f for f in sorted(os.listdir(stage)) if f.endswith(".parquet"))
        dst = os.path.join(src, f"g{gen}.parquet")
        os.rename(os.path.join(stage, part), dst)
        os.utime(dst, (1_000_000_000 + gen, 1_000_000_000 + gen))

    land(1, emb.where(F.col("vec_id") % 3 == 1))
    schema = "vec_id long, embedding array<float>"
    q = ann_ingest_stream(spark, src, schema, idx, ck)
    q.awaitTermination()
    n_after_1 = spark.read.parquet(idx).count()
    assert n_after_1 == emb.where(F.col("vec_id") % 3 != 2).count()

    # restart with the SAME checkpoint: only the new file is ingested
    land(2, emb.where(F.col("vec_id") % 3 == 2))
    q2 = ann_ingest_stream(spark, src, schema, idx, ck)
    q2.awaitTermination()
    assert spark.read.parquet(idx).count() == emb.count()

    # the fully-streamed index answers identically to a full build
    full = str(root / "full")
    build_ivf_index(
        emb.select("vec_id", "embedding"), full, n_centroids=16,
        centroid_source=emb,
    )
    streamed = query_ivf_index(spark, idx, _queries(emb), k=5, n_probe=4)
    built_all = query_ivf_index(spark, full, _queries(emb), k=5, n_probe=4)
    assert _res(streamed) == _res(built_all)

    # pruning survives the appended small files: 1 query, n_probe=2
    q1 = _queries(emb).limit(1)
    df = query_ivf_index(spark, idx, q1, k=5, n_probe=2)
    df.collect()
    stats = index_scan_stats(df)
    assert 0 < stats["partitions_read"] <= 2


def _synthetic_drift(spark):
    """Seed cluster near e1, drifted appends near e2: appends all land
    in the seed structure's few nearest cells — real occupancy skew."""
    import math

    dim = 8
    rows = []
    # seed: 64 vectors around axis 0, ids 1000..1063 — HIGH ids, so the
    # lowest-id centroid convention retrains onto the drifted batch
    for i in range(64):
        v = [0.0] * dim
        v[0] = 1.0
        v[1] = 0.01 * (i % 8)
        v[i % dim] += 0.05 * (i % 5)
        rows.append((1000 + i, [x / math.sqrt(sum(y * y for y in v)) for x in v]))
    # drift: 192 vectors around axis 4, ids 0..191
    for i in range(192):
        v = [0.0] * dim
        v[4] = 1.0
        v[5] = 0.01 * (i % 16)
        rows.append((i, [x / math.sqrt(sum(y * y for y in v)) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_rebuild_equals_build_from_scratch(spark, tmp_path):
    """VERDICT r9 item 4: seed -> drifted-append -> rebuild produces
    exactly the rows (and query answers) a from-scratch build over the
    current corpus produces — only structure changed."""
    from hadoop_app_spark.operators.ann_index import rebuild_ivf_index

    emb = load_table(spark, SF, "embeddings")
    seed = emb.where(F.col("vec_id") % 3 == 0)
    grown = str(tmp_path / "grown")
    build_ivf_index(seed, grown, n_centroids=16)  # centroids from seed only
    append_ivf_index(emb.where(F.col("vec_id") % 3 != 0), grown)
    rebuild_ivf_index(spark, grown, n_centroids=16)

    scratch = str(tmp_path / "scratch")
    build_ivf_index(emb, scratch, n_centroids=16, centroid_source=emb)

    got = sorted(
        (r.vec_id, r.cell) for r in spark.read.parquet(grown).select("vec_id", "cell").collect()
    )
    want = sorted(
        (r.vec_id, r.cell) for r in spark.read.parquet(scratch).select("vec_id", "cell").collect()
    )
    assert got == want
    assert _res(query_ivf_index(spark, grown, _queries(emb), k=5, n_probe=4)) == _res(
        query_ivf_index(spark, scratch, _queries(emb), k=5, n_probe=4)
    )


def test_rebuild_restores_occupancy_and_pruning(spark, tmp_path):
    """The decision diagnostic and the payoff: drifted appends
    concentrate occupancy (max_share_milli spikes), the rebuild
    flattens it, and a probe after the rebuild reads fewer rows than
    the same probe against the skewed layout."""
    from hadoop_app_spark.operators.ann_index import (
        cell_occupancy_profile,
        rebuild_ivf_index,
    )
    from hadoop_app_spark.sources.layout import scan_output_rows

    emb = _synthetic_drift(spark)
    path = str(tmp_path / "drift")
    build_ivf_index(emb.where(F.col("vec_id") >= 1000), path, n_centroids=8)
    append_ivf_index(emb.where(F.col("vec_id") < 1000), path)

    before = cell_occupancy_profile(spark, path).collect()[0]
    # a drifted query probing the fat region scans many rows pre-rebuild
    q = spark.createDataFrame(
        [(999, [0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0])],
        "query_id long, query_vec array<double>",
    )
    pre = query_ivf_index(spark, path, q, k=5, n_probe=2)
    pre.collect()
    pre_rows = scan_output_rows(pre)

    rebuild_ivf_index(spark, path, n_centroids=8)
    after = cell_occupancy_profile(spark, path).collect()[0]
    post = query_ivf_index(spark, path, q, k=5, n_probe=2)
    post.collect()
    post_rows = scan_output_rows(post)

    # all 192 drifted vectors piled into the seed structure's nearest
    # cell(s); the rebuild spreads them across re-trained cells
    assert before["max_share_milli"] > after["max_share_milli"]
    assert post_rows < pre_rows
    # answers stay correct: same top-k as brute force over the corpus
    from hadoop_app_spark.operators.similarity import brute_force_topk

    got = _res(post)
    want = _res(brute_force_topk(emb, q, k=5))
    # IVF is approximate, but with the rebuilt structure the probed
    # cells contain the true neighborhood for this in-cluster query
    assert got == want


def test_rebuild_swap_crash_recovery(spark, tmp_path):
    """ADVICE r10: a crash between the swap's renames must never leave
    the staging dir as an unreachable only copy. Simulate both
    half-swapped states (live renamed aside + staging complete; live
    missing with only the aside copy) and assert a re-run recovers and
    rebuilds to the deterministic layout."""
    from hadoop_app_spark.operators.ann_index import rebuild_ivf_index
    from hadoop_app_spark.sources import fs as hfs

    emb = _synthetic_drift(spark)
    path = str(tmp_path / "crash")
    build_ivf_index(emb, path, n_centroids=8, centroid_source=emb)
    want = sorted(
        (r.vec_id, r.cell)
        for r in spark.read.parquet(path).select("vec_id", "cell").collect()
    )

    # state A: crash between rename(path, __old) and rename(staging, path)
    hfs.copy_dir(spark, path, path + "__rebuild")
    assert hfs.rename(spark, path, path + "__old")
    assert not hfs.exists(spark, path)
    rebuild_ivf_index(spark, path, n_centroids=8)
    got = sorted(
        (r.vec_id, r.cell)
        for r in spark.read.parquet(path).select("vec_id", "cell").collect()
    )
    assert got == want  # same corpus + deterministic centroids
    assert not hfs.exists(spark, path + "__old")
    assert not hfs.exists(spark, path + "__rebuild")

    # state B: only the aside copy exists (staging already renamed in
    # by a prior recovery that died before deleting __old, then lost)
    assert hfs.rename(spark, path, path + "__old")
    rebuild_ivf_index(spark, path, n_centroids=8)
    got = sorted(
        (r.vec_id, r.cell)
        for r in spark.read.parquet(path).select("vec_id", "cell").collect()
    )
    assert got == want
    assert not hfs.exists(spark, path + "__old")

    # no index anywhere: loud, not a silent empty build
    with pytest.raises(ValueError, match="no index"):
        rebuild_ivf_index(spark, str(tmp_path / "nowhere"), n_centroids=8)


def _quantized(emb):
    return emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * F.lit(256.0)).cast("double"),
        ).alias("embedding"),
    )


@pytest.fixture(scope="module")
def ivfpq_built(spark, tmp_path_factory):
    from hadoop_app_spark.operators.ann_index import build_ivfpq_index
    from hadoop_app_spark.operators.pq import fixed_pq_codebooks

    path = str(tmp_path_factory.mktemp("ivfpq") / "emb")
    emb = _quantized(load_table(spark, SF, "embeddings"))
    build_ivfpq_index(emb, path, fixed_pq_codebooks(), n_centroids=16)
    return path, emb


def test_ivfpq_full_shortlist_equals_ivf(spark, ivfpq_built, tmp_path):
    """With a shortlist covering every probed-cell candidate, the exact
    re-rank makes the composed IVF×PQ answer EXACTLY the plain IVF
    index's answer — the composition changes the access path (codes +
    column pruning), never the probed candidate set."""
    from hadoop_app_spark.operators.ann_index import query_ivfpq_index

    path, emb = ivfpq_built
    ivf_path = str(tmp_path / "ivf")
    build_ivf_index(emb, ivf_path, n_centroids=16, centroid_source=emb)
    q = _queries(emb)
    got = query_ivfpq_index(spark, path, q, k=5, n_probe=4, shortlist=10_000)
    want = query_ivf_index(spark, ivf_path, q, k=5, n_probe=4)
    assert _res(got) == _res(want)


def test_ivfpq_prunes_partitions_and_columns(spark, ivfpq_built):
    """Both prunings at once: a 2-of-16-cell probe opens <= 2 cell dirs
    (PartitionFilters), and the ADC scan's ReadSchema carries only
    (id, codes, cell) — the stored raw vectors are read ONLY by the
    shortlist re-rank scan."""
    from hadoop_app_spark.operators.ann_index import query_ivfpq_index

    path, emb = ivfpq_built
    q1 = _queries(emb).limit(1)
    df = query_ivfpq_index(spark, path, q1, k=5, n_probe=2, shortlist=16)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    # exactly one scan reads codes WITHOUT the embedding column (ADC),
    # and the re-rank scan reads the embedding WITHOUT codes
    schemas = [
        line.split("ReadSchema:", 1)[1]
        for line in plan.splitlines()
        if "ReadSchema:" in line
    ]
    assert any("codes" in s and "embedding" not in s for s in schemas), schemas
    assert any("embedding" in s and "codes" not in s for s in schemas), schemas


def test_ivfpq_adc_orders_within_cells(spark, ivfpq_built):
    """The ADC shortlist is a real in-cell ranking: with a tiny
    shortlist the top-1 ADC candidate survives to the exact top-k, and
    every returned neighbor lies in the query's probed cells."""
    from hadoop_app_spark.operators.ann_index import (
        _load_centroids,
        _probe_cells,
        query_ivfpq_index,
    )

    path, emb = ivfpq_built
    q1 = _queries(emb).limit(1)
    qrow = q1.collect()[0]
    cells = set(
        _probe_cells(_load_centroids(spark, path), list(qrow["query_vec"]), 4)
    )
    got = query_ivfpq_index(spark, path, q1, k=5, n_probe=4, shortlist=8)
    rows = got.collect()
    assert 0 < len(rows) <= 5
    member_cell = {
        r["vec_id"]: r["cell"]
        for r in spark.read.parquet(path).select("vec_id", "cell").collect()
    }
    assert all(member_cell[r["vec_id"]] in cells for r in rows)


def test_ivfpq_append_equals_full_build(spark, tmp_path):
    """Cell structure + codebooks are immutable under appends, so
    seed + append holds exactly the rows (codes included) a
    from-scratch build over the union holds, and queries answer
    identically."""
    from hadoop_app_spark.operators.ann_index import (
        append_ivfpq_index,
        build_ivfpq_index,
        query_ivfpq_index,
    )
    from hadoop_app_spark.operators.pq import fixed_pq_codebooks

    emb = _quantized(load_table(spark, SF, "embeddings"))
    half1 = emb.where(F.col("vec_id") < 250)
    half2 = emb.where(F.col("vec_id") >= 250)
    inc = str(tmp_path / "inc")
    build_ivfpq_index(
        half1, inc, fixed_pq_codebooks(), n_centroids=16, centroid_source=emb
    )
    append_ivfpq_index(half2, inc)
    full = str(tmp_path / "full")
    build_ivfpq_index(
        emb, full, fixed_pq_codebooks(), n_centroids=16, centroid_source=emb
    )
    got = sorted(
        (r.vec_id, r.cell, tuple(r.codes))
        for r in spark.read.parquet(inc).select("vec_id", "cell", "codes").collect()
    )
    want = sorted(
        (r.vec_id, r.cell, tuple(r.codes))
        for r in spark.read.parquet(full).select("vec_id", "cell", "codes").collect()
    )
    assert got == want
    q = _queries(emb)
    assert _res(query_ivfpq_index(spark, inc, q, k=5, n_probe=4)) == _res(
        query_ivfpq_index(spark, full, q, k=5, n_probe=4)
    )


def test_ivfpq_codes_only_layout_with_rerank_source(spark, tmp_path):
    """store_vectors=False (the strict-FAISS layout): the index holds
    only (id, codes) per cell; queries re-rank against a caller-given
    raw-vector source and answer identically to the self-contained
    layout."""
    from hadoop_app_spark.operators.ann_index import (
        build_ivfpq_index,
        query_ivfpq_index,
    )
    from hadoop_app_spark.operators.pq import fixed_pq_codebooks

    emb = _quantized(load_table(spark, SF, "embeddings"))
    slim = str(tmp_path / "slim")
    fat = str(tmp_path / "fat")
    build_ivfpq_index(
        emb, slim, fixed_pq_codebooks(), n_centroids=16, store_vectors=False
    )
    build_ivfpq_index(emb, fat, fixed_pq_codebooks(), n_centroids=16)
    assert "embedding" not in spark.read.parquet(slim).columns
    q = _queries(emb)
    got = query_ivfpq_index(spark, slim, q, k=5, n_probe=4, rerank_source=emb)
    want = query_ivfpq_index(spark, fat, q, k=5, n_probe=4)
    assert _res(got) == _res(want)


def test_ivfpq_codes_only_without_rerank_source_raises(spark, tmp_path):
    from hadoop_app_spark.operators.ann_index import (
        build_ivfpq_index,
        query_ivfpq_index,
    )
    from hadoop_app_spark.operators.pq import fixed_pq_codebooks

    emb = _quantized(load_table(spark, SF, "embeddings"))
    slim = str(tmp_path / "slim")
    build_ivfpq_index(
        emb, slim, fixed_pq_codebooks(), n_centroids=16, store_vectors=False
    )
    with pytest.raises(ValueError, match="store_vectors=False"):
        query_ivfpq_index(spark, slim, _queries(emb), k=5, n_probe=4)


def test_ivfpq_distributed_lut_path_matches_driver_loop(spark, ivfpq_built):
    """VERDICT r11 item 5: the executor-side LUT/probe build
    (mapInPandas over the queries frame) answers BIT-IDENTICALLY to
    the driver loop under the integer-codebook exactness lever —
    forced via distribute_luts_from=1 so the small test batch takes
    the distributed path."""
    from hadoop_app_spark.operators.ann_index import query_ivfpq_index

    path, emb = ivfpq_built
    q = _queries(emb)
    driver = query_ivfpq_index(
        spark, path, q, k=5, n_probe=4, shortlist=64
    )
    distributed = query_ivfpq_index(
        spark, path, q, k=5, n_probe=4, shortlist=64, distribute_luts_from=1
    )
    assert _res(driver) == _res(distributed)
    # r12 boundary pin: the path decision is now a single limited
    # collect (len == threshold means "at or past the threshold"), so
    # a batch EXACTLY at distribute_luts_from must still route
    # distributed and answer identically
    at_threshold = query_ivfpq_index(
        spark, path, q, k=5, n_probe=4, shortlist=64,
        distribute_luts_from=q.count(),
    )
    assert _res(driver) == _res(at_threshold)


def test_ivfpq_stream_ingest_equals_full_build(spark, tmp_path):
    """r12: ann_ingest_stream detects the composed layout's codebook
    sidecar and PQ-encodes each micro-batch against it — the streamed
    index answers identically to a from-scratch build over everything
    landed (the append-immutability contract, streaming face)."""
    import os

    from hadoop_app_spark.operators.ann_index import (
        build_ivfpq_index,
        query_ivfpq_index,
    )
    from hadoop_app_spark.operators.pq import fixed_pq_codebooks
    from hadoop_app_spark.streaming.ingest import ann_ingest_stream

    emb = _quantized(load_table(spark, SF, "embeddings"))
    src, idx, ck = (str(tmp_path / x) for x in ("src", "idx", "ck"))
    os.makedirs(src)
    build_ivfpq_index(
        emb.where(F.col("vec_id") % 3 == 0), idx, fixed_pq_codebooks(),
        n_centroids=16, centroid_source=emb,
    )
    for gen in (1, 2):
        stage = str(tmp_path / f"stage{gen}")
        emb.where(F.col("vec_id") % 3 == gen).coalesce(1).write.parquet(stage)
        part = next(f for f in sorted(os.listdir(stage)) if f.endswith(".parquet"))
        dst = os.path.join(src, f"g{gen}.parquet")
        os.rename(os.path.join(stage, part), dst)
        os.utime(dst, (1_000_000_000 + gen,) * 2)
    q = ann_ingest_stream(
        spark, src, "vec_id long, embedding array<double>", idx, ck
    )
    q.awaitTermination()
    assert spark.read.parquet(idx).count() == emb.count()
    full = str(tmp_path / "full")
    build_ivfpq_index(
        emb, full, fixed_pq_codebooks(), n_centroids=16, centroid_source=emb
    )
    queries = _queries(emb)
    streamed = query_ivfpq_index(spark, idx, queries, k=5, n_probe=4)
    built = query_ivfpq_index(spark, full, queries, k=5, n_probe=4)
    assert _res(streamed) == _res(built)


def test_ivfpq_rebuild_equals_build_and_restores_balance(spark, tmp_path):
    """r12: seed from a third (drift-born cells) -> append the rest ->
    rebuild == build-from-scratch over the full corpus, behind the
    shared three-rename swap; the rebuilt cell structure is the full-
    corpus one, and codes-only layouts refuse to rebuild without a
    corpus."""
    from hadoop_app_spark.operators.ann_index import (
        append_ivfpq_index,
        build_ivfpq_index,
        query_ivfpq_index,
        rebuild_ivfpq_index,
    )
    from hadoop_app_spark.operators.pq import fixed_pq_codebooks

    emb = _quantized(load_table(spark, SF, "embeddings"))
    path = str(tmp_path / "idx")
    build_ivfpq_index(
        emb.where(F.col("vec_id") % 3 == 0), path, fixed_pq_codebooks(),
        n_centroids=16,
    )
    append_ivfpq_index(emb.where(F.col("vec_id") % 3 != 0), path)
    rebuild_ivfpq_index(spark, path, n_centroids=16)
    full = str(tmp_path / "full")
    build_ivfpq_index(emb, full, fixed_pq_codebooks(), n_centroids=16,
                      centroid_source=emb)
    q = _queries(emb)
    got = query_ivfpq_index(spark, path, q, k=5, n_probe=4)
    want = query_ivfpq_index(spark, full, q, k=5, n_probe=4)
    assert _res(got) == _res(want)
    # rebuilt rows == full-build rows cell-for-cell (not just the probe)
    a = {(r.vec_id, r.cell) for r in spark.read.parquet(path).select("vec_id", "cell").collect()}
    b = {(r.vec_id, r.cell) for r in spark.read.parquet(full).select("vec_id", "cell").collect()}
    assert a == b

    slim = str(tmp_path / "slim")
    build_ivfpq_index(
        emb, slim, fixed_pq_codebooks(), n_centroids=16, store_vectors=False
    )
    with pytest.raises(ValueError, match="codes only"):
        rebuild_ivfpq_index(spark, slim, n_centroids=16)
    # with the corpus supplied, the codes-only layout rebuilds fine
    rebuild_ivfpq_index(spark, slim, n_centroids=16, corpus=emb)
    got2 = query_ivfpq_index(spark, slim, q, k=5, n_probe=4, rerank_source=emb)
    assert _res(got2) == _res(want)


def test_ivfpq_compaction_reduces_files_keeps_pruning(spark, tmp_path):
    """r12: compact_index_partitions rewrites the fragmented cell dirs
    to ~one file per cell — content identical, sidecars carried over,
    and the probe's partition pruning + bounded files_read SURVIVE the
    rewrite (the whole point: fewer per-file opens inside probed
    cells)."""
    from hadoop_app_spark.operators.ann_index import (
        append_ivfpq_index,
        build_ivfpq_index,
        compact_index_partitions,
        index_scan_stats,
        query_ivfpq_index,
    )
    from hadoop_app_spark.operators.pq import fixed_pq_codebooks

    emb = _quantized(load_table(spark, SF, "embeddings"))
    path = str(tmp_path / "idx")
    build_ivfpq_index(
        emb.where(F.col("vec_id") % 3 == 0), path, fixed_pq_codebooks(),
        n_centroids=16, centroid_source=emb,
    )
    for gen in (1, 2):
        append_ivfpq_index(emb.where(F.col("vec_id") % 3 == gen), path)
    q = _queries(emb)
    before = _res(query_ivfpq_index(spark, path, q, k=5, n_probe=4))
    frag = query_ivfpq_index(spark, path, q.limit(1), k=5, n_probe=2, shortlist=16)
    frag.collect()
    files_fragmented = index_scan_stats(frag)["files_read"]
    stats = compact_index_partitions(spark, path)
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] <= stats["cells"]
    # content + probe answers identical, sidecars intact
    assert _res(query_ivfpq_index(spark, path, q, k=5, n_probe=4)) == before
    assert spark.read.parquet(path).count() == emb.count()
    # pruning survives AND the probe opens fewer files: the plan has
    # two index scans (ADC + re-rank), each pruned to <= 2 cell dirs,
    # and each compacted cell is now ONE file — <= 4 opens total vs
    # 3 files/cell pre-compaction (seed + two appends)
    df = query_ivfpq_index(spark, path, q.limit(1), k=5, n_probe=2, shortlist=16)
    df.collect()
    st = index_scan_stats(df)
    assert 0 < st["files_read"] <= 4 < files_fragmented
    assert st["partitions_read"] <= 4  # two scans x two probed cells
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan


def test_trained_ivfpq_recall_floor_and_sidecars(spark, tmp_path):
    """VERDICT r11 item 4: the production composition (sample ->
    train_pq_codebooks -> build -> serve) hits the stated recall
    floor against brute-force ground truth, and the trained books
    round-trip through the sidecar (appends/queries see EXACTLY what
    training produced)."""
    from hadoop_app_spark.operators.ann_index import (
        _load_codebooks,
        build_trained_ivfpq_index,
        query_ivfpq_index,
    )
    from hadoop_app_spark.operators.retrieval import ann_recall
    from hadoop_app_spark.operators.similarity import brute_force_topk

    emb = load_table(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    path = str(tmp_path / "trained")
    books = build_trained_ivfpq_index(
        emb, path, n_centroids=16, m=8, n_codes=16, iters=5, sample=2048
    )
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    assert _load_codebooks(spark, path) == books  # sidecar round-trip
    q = _queries(emb)
    ann = query_ivfpq_index(spark, path, q, k=5, n_probe=4, shortlist=64)
    exact = brute_force_topk(emb, q, k=5)
    rec = ann_recall(ann, exact, k=5)
    mean = rec.agg(F.avg("recall_milli").alias("m")).collect()[0]["m"]
    assert mean >= 600, f"trained IVF×PQ recall@5 mean {mean} below floor"


def test_empty_centroid_sidecar_raises_on_local_path(spark, tmp_path):
    """ADVICE r12 / VERDICT r12 item 6: a present-but-EMPTY centroid
    sidecar must raise the same loud ValueError on the pyarrow local
    fast path as on the Spark read path — never return [] and let
    _cell_expr misbehave over a zero-row centroid matrix."""
    from hadoop_app_spark.operators.ann_index import (
        CENTROID_DIR,
        _load_centroids,
    )

    path = str(tmp_path / "emptyidx")
    # zero-row sidecar with real parquet files (schema only)
    spark.createDataFrame([], "c_idx int, cv array<double>").coalesce(
        1
    ).write.parquet(f"{path}/{CENTROID_DIR}")
    with pytest.raises(ValueError, match="no IVF centroid sidecar"):
        _load_centroids(spark, path)

"""File-level Bloom-index skipping: pruning is real, correctness is
identical to the full scan, false negatives are impossible."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_app_spark.catalog import load_table
from hadoop_app_spark.sources.skipping import (
    point_lookup,
    read_bloom_skip,
    retract_ids,
    write_bloom_indexed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def indexed(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("skip") / "lineitem")
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    write_bloom_indexed(li, path, "l_partkey", files=8)
    return path, li


def test_point_lookup_prunes_files(spark, indexed):
    path, li = indexed
    some = [r.l_partkey for r in li.select("l_partkey").distinct().limit(1).collect()]
    df, stats = read_bloom_skip(spark, path, "l_partkey", some)
    assert stats["files_total"] == 8
    # range clustering puts one key in few files; the bloom must skip
    # the rest (this is the point of the index)
    assert 0 < stats["files_read"] < stats["files_total"]
    exp = sorted(map(tuple, li.where(F.col("l_partkey").isin(some)).collect()))
    assert sorted(map(tuple, df.collect())) == exp


def test_no_false_negatives_for_any_probed_key(spark, indexed):
    path, li = indexed
    keys = [r.l_partkey for r in li.select("l_partkey").distinct().limit(40).collect()]
    df, stats = read_bloom_skip(spark, path, "l_partkey", keys)
    exp = sorted(map(tuple, li.where(F.col("l_partkey").isin(keys)).collect()))
    assert sorted(map(tuple, df.collect())) == exp
    assert stats["files_read"] <= stats["files_total"]


def test_absent_key_reads_few_or_no_files(spark, indexed):
    path, _ = indexed
    df, stats = read_bloom_skip(spark, path, "l_partkey", [10**15])
    assert df.count() == 0
    # an absent key passes only by Bloom false positives — at these
    # knob settings that must not be every file
    assert stats["files_read"] < stats["files_total"]


def test_sidecar_is_invisible_to_plain_scans(spark, indexed):
    path, li = indexed
    # the _bloom_index dir must not leak rows into a normal read
    assert spark.read.parquet(path).count() == li.count()


def test_point_lookup_autodiscovers_index(spark, indexed):
    path, li = indexed
    some = [r.l_partkey for r in li.select("l_partkey").distinct().limit(2).collect()]
    df, stats = point_lookup(spark, path, "l_partkey", some)
    assert stats["index"] == "bloom"
    assert 0 < stats["files_read"] < stats["files_total"]
    exp = sorted(map(tuple, li.where(F.col("l_partkey").isin(some)).collect()))
    assert sorted(map(tuple, df.collect())) == exp


def test_point_lookup_wrong_column_falls_back(spark, indexed):
    path, li = indexed
    # the sidecar indexes l_partkey; probing l_orderkey must NOT prune
    # (a Bloom over another column has no say) — plain scan, same rows
    some = [r.l_orderkey for r in li.select("l_orderkey").distinct().limit(2).collect()]
    df, stats = point_lookup(spark, path, "l_orderkey", some)
    assert stats["index"] == "none"
    exp = sorted(map(tuple, li.where(F.col("l_orderkey").isin(some)).collect()))
    assert sorted(map(tuple, df.collect())) == exp


def test_point_lookup_unindexed_table_falls_back(spark, tmp_path):
    path = str(tmp_path / "plain")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    li.write.parquet(path)
    df, stats = point_lookup(spark, path, "l_partkey", [1])
    assert stats["index"] == "none"
    assert df.count() == li.where(F.col("l_partkey") == 1).count()


def test_retract_rewrites_only_passing_files(spark, tmp_path):
    path = str(tmp_path / "retract")
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    write_bloom_indexed(li, path, "l_partkey", files=8)
    victims = [
        r.l_partkey for r in li.select("l_partkey").distinct().limit(2).collect()
    ]
    n_before = li.count()
    n_victim_rows = li.where(F.col("l_partkey").isin(victims)).count()
    _, pre_stats = read_bloom_skip(spark, path, "l_partkey", victims)

    stats = retract_ids(spark, path, "l_partkey", victims)
    assert stats["rows_removed"] == n_victim_rows
    # work proportional to passing files, never the corpus
    assert stats["files_rewritten"] <= pre_stats["files_read"] < 8

    after = spark.read.parquet(path)
    assert after.where(F.col("l_partkey").isin(victims)).count() == 0
    assert after.count() == n_before - n_victim_rows
    # the refreshed sidecar still serves lookups: retracted ids gone,
    # an untouched id still found with pruning intact
    df, s2 = point_lookup(spark, path, "l_partkey", victims)
    assert s2["index"] == "bloom" and df.count() == 0
    alive = [
        r.l_partkey
        for r in after.select("l_partkey").distinct().limit(1).collect()
    ]
    df3, s3 = point_lookup(spark, path, "l_partkey", alive)
    assert s3["index"] == "bloom"
    assert df3.count() == after.where(F.col("l_partkey").isin(alive)).count()
    assert 0 < s3["files_read"] <= s3["files_total"]


def test_retract_absent_ids_is_noop(spark, tmp_path):
    path = str(tmp_path / "retract_noop")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    write_bloom_indexed(li, path, "l_partkey", files=8)
    n = li.count()
    stats = retract_ids(spark, path, "l_partkey", [10**15])
    assert stats["rows_removed"] == 0
    assert spark.read.parquet(path).count() == n


def test_retract_unindexed_table_is_complete(spark, tmp_path):
    """No sidecar at all: a takedown must still remove EVERY victim row
    (full rewrite, no pruning) — never a silent no-op."""
    path = str(tmp_path / "retract_plain")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    li.write.parquet(path)
    victims = [
        r.l_partkey for r in li.select("l_partkey").distinct().limit(2).collect()
    ]
    n_victims = li.where(F.col("l_partkey").isin(victims)).count()
    stats = retract_ids(spark, path, "l_partkey", victims)
    assert stats["rows_removed"] == n_victims > 0
    assert stats["files_total"] == stats["files_rewritten"] or stats["files_rewritten"] > 0
    after = spark.read.parquet(path)
    assert after.where(F.col("l_partkey").isin(victims)).count() == 0
    assert after.count() == li.count() - n_victims


def test_retract_wrong_column_sidecar_is_complete(spark, tmp_path):
    """Sidecar indexes l_partkey but the takedown targets l_orderkey: a
    Bloom over another column has no say, so every file is a candidate;
    the refreshed sidecar still indexes ITS column and still serves."""
    path = str(tmp_path / "retract_wrongcol")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    write_bloom_indexed(li, path, "l_partkey", files=8)
    victims = [
        r.l_orderkey for r in li.select("l_orderkey").distinct().limit(2).collect()
    ]
    n_victims = li.where(F.col("l_orderkey").isin(victims)).count()
    stats = retract_ids(spark, path, "l_orderkey", victims)
    assert stats["rows_removed"] == n_victims > 0
    after = spark.read.parquet(path)
    assert after.where(F.col("l_orderkey").isin(victims)).count() == 0
    assert after.count() == li.count() - n_victims
    # sidecar rebuilt over l_partkey from the rewritten files: lookups
    # on the INDEXED column still work and still prune
    alive = [r.l_partkey for r in after.select("l_partkey").distinct().limit(1).collect()]
    df, s = point_lookup(spark, path, "l_partkey", alive)
    assert s["index"] == "bloom"
    assert df.count() == after.where(F.col("l_partkey").isin(alive)).count()


def test_retract_keeps_null_key_bystanders(spark, tmp_path):
    """Rows whose indexed column is NULL are bystanders: three-valued
    logic must not silently drop them from rewritten files."""
    path = str(tmp_path / "retract_nulls")
    li = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .limit(400)
        # every 7th row gets a NULL key (never enters the Bloom)
        .withColumn(
            "l_partkey",
            F.when(F.col("l_orderkey") % 7 == 0, F.lit(None)).otherwise(
                F.col("l_partkey")
            ),
        )
    )
    write_bloom_indexed(li, path, "l_partkey", files=4)
    back = spark.read.parquet(path)
    n_nulls = back.where(F.col("l_partkey").isNull()).count()
    assert n_nulls > 0
    victims = [
        r.l_partkey
        for r in back.where(F.col("l_partkey").isNotNull())
        .select("l_partkey")
        .distinct()
        .limit(3)
        .collect()
    ]
    n_victims = back.where(F.col("l_partkey").isin(victims)).count()
    n_before = back.count()  # materialize before the rewrite invalidates `back`
    stats = retract_ids(spark, path, "l_partkey", victims)
    assert stats["rows_removed"] == n_victims > 0
    after = spark.read.parquet(path)
    assert after.where(F.col("l_partkey").isin(victims)).count() == 0
    # the NULL-key rows all survive
    assert after.where(F.col("l_partkey").isNull()).count() == n_nulls
    assert after.count() == n_before - n_victims


def test_curated_write_audit_retract_loop(spark, tmp_path):
    """The decontamination loop end-to-end at the pipeline layer:
    write_curated -> audit_contaminated -> retract_contaminated."""
    from hadoop_app_spark.plans.corpus_pipeline import (
        audit_contaminated,
        retract_contaminated,
        write_curated,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    path = str(tmp_path / "curated")
    write_curated(docs, path, files=8)
    flagged = [0, 3, 10**12]  # two shipped docs + one never-present id
    hits, stats = audit_contaminated(spark, path, flagged)
    assert stats["index"] == "bloom"
    assert sorted(r.doc_id for r in hits.collect()) == [0, 3]
    r = retract_contaminated(spark, path, flagged)
    assert r["rows_removed"] == 2
    still, _ = audit_contaminated(spark, path, flagged)
    assert still.count() == 0
    assert spark.read.parquet(path).count() == docs.count() - 2


def test_read_bloom_skip_requires_sidecar(spark, tmp_path):
    """read_bloom_skip's contract is bloom-pruned-but-COMPLETE: with no
    sidecar it must raise, never answer 'no rows' (the auto-discovery
    fallback lives in point_lookup)."""
    path = str(tmp_path / "nosidecar")
    load_table(spark, SF, "lineitem").select("l_orderkey").limit(10).write.parquet(path)
    with pytest.raises(Exception):
        read_bloom_skip(spark, path, "l_orderkey", [1])


def test_retract_partitioned_layout_raises(spark, tmp_path):
    """A partitioned table with no usable sidecar cannot be rewritten
    file-by-file (partition values live in directory names): retraction
    must fail LOUDLY, not no-op and not drop the partition columns."""
    path = str(tmp_path / "parted")
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber"
    ).limit(200)
    li.write.partitionBy("l_linenumber").parquet(path)
    with pytest.raises(NotImplementedError, match="flat parquet layout"):
        retract_ids(spark, path, "l_partkey", [1])
    # nothing was deleted
    assert spark.read.parquet(path).count() == 200


def test_retract_interrupted_swap_is_resumed(spark, tmp_path, monkeypatch):
    """A crash between the manifest write and the last rename must be
    recoverable: the next retract_ids call on the table replays the
    recorded swap, rebuilds the sidecar whole, and removes the
    manifest — no duplicate rows, no lost kept rows, lookups pruned."""
    import hadoop_app_spark.sources.fs as hfs
    from hadoop_app_spark.sources.skipping import RETRACT_MANIFEST

    path = str(tmp_path / "retract_resume")
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    write_bloom_indexed(li, path, "l_partkey", files=8)
    victims = [
        r.l_partkey for r in li.select("l_partkey").distinct().limit(2).collect()
    ]
    n_victims = li.where(F.col("l_partkey").isin(victims)).count()
    assert n_victims > 0

    real_rename = hfs.rename
    monkeypatch.setattr(
        hfs,
        "rename",
        lambda *a: (_ for _ in ()).throw(RuntimeError("simulated crash mid-swap")),
    )
    with pytest.raises(RuntimeError, match="mid-swap"):
        retract_ids(spark, path, "l_partkey", victims)
    monkeypatch.setattr(hfs, "rename", real_rename)

    # stranded state: manifest present, originals deleted, replacements
    # still in scratch — a reader right now transiently misses rows
    # (the documented window) but never sees duplicates
    assert hfs.exists(spark, f"{path}/{RETRACT_MANIFEST}")

    stats = retract_ids(spark, path, "l_partkey", victims)
    assert stats["rows_removed"] == 0  # recovery finished the deletion
    after = spark.read.parquet(path)
    assert after.where(F.col("l_partkey").isin(victims)).count() == 0
    assert after.count() == li.count() - n_victims
    assert not hfs.exists(spark, f"{path}/{RETRACT_MANIFEST}")
    # sidecar was rebuilt whole and still serves pruned lookups
    alive = [
        r.l_partkey for r in after.select("l_partkey").distinct().limit(1).collect()
    ]
    df, s = point_lookup(spark, path, "l_partkey", alive)
    assert s["index"] == "bloom"
    assert df.count() == after.where(F.col("l_partkey").isin(alive)).count()


def test_point_lookup_legacy_sidecar_falls_back(spark, tmp_path):
    """A pre-r8 sidecar lacks indexed_col, so WHICH column it indexes
    is unknown: point_lookup must fall back to the unpruned scan (a
    wrong-column Bloom silently drops matching rows), while
    read_bloom_skip keeps the legacy treat-as-matching contract."""
    from hadoop_app_spark.sources.skipping import INDEX_DIR

    path = str(tmp_path / "legacy")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    write_bloom_indexed(li, path, "l_partkey", files=8)
    idx_path = f"{path}/{INDEX_DIR}"
    legacy = spark.read.parquet(idx_path).drop("indexed_col")
    rows = legacy.collect()
    spark.createDataFrame(rows, legacy.schema).write.mode("overwrite").parquet(idx_path)

    some = [r.l_partkey for r in li.select("l_partkey").distinct().limit(2).collect()]
    df, stats = point_lookup(spark, path, "l_partkey", some)
    assert stats["index"] == "none"
    exp = sorted(map(tuple, li.where(F.col("l_partkey").isin(some)).collect()))
    assert sorted(map(tuple, df.collect())) == exp
    # the opted-in reader still prunes under the legacy assumption
    df2, s2 = read_bloom_skip(spark, path, "l_partkey", some)
    assert sorted(map(tuple, df2.collect())) == exp
    assert s2["files_read"] <= s2["files_total"]


def test_retract_legacy_sidecar_is_complete(spark, tmp_path):
    """Retraction over a legacy sidecar (unknown indexed column) must
    take the full-rewrite path — pruning on blooms of unknown
    provenance could under-delete, which for a takedown is the one
    unforgivable failure."""
    from hadoop_app_spark.sources.skipping import INDEX_DIR

    path = str(tmp_path / "retract_legacy")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    write_bloom_indexed(li, path, "l_partkey", files=8)
    idx_path = f"{path}/{INDEX_DIR}"
    legacy = spark.read.parquet(idx_path).drop("indexed_col")
    rows = legacy.collect()
    spark.createDataFrame(rows, legacy.schema).write.mode("overwrite").parquet(idx_path)

    victims = [
        r.l_partkey for r in li.select("l_partkey").distinct().limit(2).collect()
    ]
    n_victims = li.where(F.col("l_partkey").isin(victims)).count()
    stats = retract_ids(spark, path, "l_partkey", victims)
    assert stats["rows_removed"] == n_victims > 0
    # unknown column => every file was a candidate (no prune)
    assert stats["files_total"] == 8
    after = spark.read.parquet(path)
    assert after.where(F.col("l_partkey").isin(victims)).count() == 0
    assert after.count() == li.count() - n_victims


def test_retract_works_on_file_scheme_uri(spark, tmp_path):
    """The whole retraction path runs through the Hadoop FS API now:
    an explicit file:-scheme URI (the shape hdfs://... paths take)
    must behave identically to a bare posix path."""
    path = "file://" + str(tmp_path / "retract_uri")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    write_bloom_indexed(li, path, "l_partkey", files=8)
    victims = [
        r.l_partkey for r in li.select("l_partkey").distinct().limit(2).collect()
    ]
    n_victims = li.where(F.col("l_partkey").isin(victims)).count()
    stats = retract_ids(spark, path, "l_partkey", victims)
    assert stats["rows_removed"] == n_victims > 0
    after = spark.read.parquet(path)
    assert after.where(F.col("l_partkey").isin(victims)).count() == 0
    assert after.count() == li.count() - n_victims
    # refreshed sidecar still serves pruned lookups through the URI
    alive = [
        r.l_partkey for r in after.select("l_partkey").distinct().limit(1).collect()
    ]
    df, s = point_lookup(spark, path, "l_partkey", alive)
    assert s["index"] == "bloom"
    assert df.count() == after.where(F.col("l_partkey").isin(alive)).count()


def test_vacuum_removes_only_orphans(spark, tmp_path):
    """Vacuum deletes exactly the files the sidecar does not name —
    planted orphans (which a plain scan would READ, duplicating rows)
    go, every live file stays, and the table reads back unchanged."""
    import shutil

    from hadoop_app_spark.sources.skipping import vacuum_indexed_table

    path = str(tmp_path / "vac")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    write_bloom_indexed(li, path, "l_partkey", files=8)
    n = li.count()
    import os as _os

    part = next(f for f in sorted(_os.listdir(path)) if f.endswith(".parquet"))
    shutil.copy(
        _os.path.join(path, part), _os.path.join(path, "part-orphan.parquet")
    )
    scratch = _os.path.join(path, "_retract_dead")
    _os.makedirs(scratch)
    shutil.copy(_os.path.join(path, part), _os.path.join(scratch, "p.parquet"))
    # the orphan is visible to a plain scan — the bug vacuum repairs
    assert spark.read.parquet(path).count() > n

    stats = vacuum_indexed_table(spark, path)
    assert stats["orphans_removed"] == 1
    assert stats["scratch_dirs_removed"] == 1
    assert stats["files_live"] == 8
    assert stats["bytes_reclaimed"] > 0
    assert spark.read.parquet(path).count() == n
    # lookups still pruned afterwards
    alive = [r.l_partkey for r in li.select("l_partkey").distinct().limit(1).collect()]
    df, s = point_lookup(spark, path, "l_partkey", alive)
    assert s["index"] == "bloom" and df.count() > 0


def test_vacuum_refuses_without_sidecar(spark, tmp_path):
    """No sidecar = no live-file manifest: vacuum must refuse loudly,
    never guess which data files are garbage."""
    from hadoop_app_spark.sources.skipping import vacuum_indexed_table

    path = str(tmp_path / "vac_plain")
    load_table(spark, SF, "lineitem").select("l_orderkey").limit(10).write.parquet(path)
    with pytest.raises(ValueError, match="live-file manifest"):
        vacuum_indexed_table(spark, path)


def test_vacuum_min_age_spares_young_files(spark, tmp_path):
    """min_age_sec guards against racing an in-flight writer: a young
    orphan survives this vacuum and is removed once old enough."""
    import shutil

    from hadoop_app_spark.sources.skipping import vacuum_indexed_table

    path = str(tmp_path / "vac_age")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    write_bloom_indexed(li, path, "l_partkey", files=8)
    import os as _os

    part = next(f for f in sorted(_os.listdir(path)) if f.endswith(".parquet"))
    shutil.copy(_os.path.join(path, part), _os.path.join(path, "part-young.parquet"))
    stats = vacuum_indexed_table(spark, path, min_age_sec=3600)
    assert stats["orphans_removed"] == 0  # too young to touch
    stats2 = vacuum_indexed_table(spark, path, min_age_sec=0)
    assert stats2["orphans_removed"] == 1


def test_vacuum_finishes_pending_retraction_first(spark, tmp_path):
    """An in-flight retraction's scratch files are STATE, not garbage:
    vacuum must replay the manifest (completing the swap) before any
    orphan sweep, so interrupted-retraction data is never destroyed."""
    import hadoop_app_spark.sources.fs as hfs
    from hadoop_app_spark.sources.skipping import (
        RETRACT_MANIFEST,
        vacuum_indexed_table,
    )

    path = str(tmp_path / "vac_pending")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    write_bloom_indexed(li, path, "l_partkey", files=8)
    victims = [
        r.l_partkey for r in li.select("l_partkey").distinct().limit(2).collect()
    ]
    n_victims = li.where(F.col("l_partkey").isin(victims)).count()

    real_rename = hfs.rename
    try:
        hfs.rename = lambda *a: (_ for _ in ()).throw(RuntimeError("crash"))
        with pytest.raises(RuntimeError):
            retract_ids(spark, path, "l_partkey", victims)
    finally:
        hfs.rename = real_rename
    assert hfs.exists(spark, f"{path}/{RETRACT_MANIFEST}")

    stats = vacuum_indexed_table(spark, path)
    # the recovery consumed the scratch dir as part of the swap —
    # nothing of the in-flight retraction was swept as garbage
    after = spark.read.parquet(path)
    assert after.where(F.col("l_partkey").isin(victims)).count() == 0
    assert after.count() == li.count() - n_victims
    assert not hfs.exists(spark, f"{path}/{RETRACT_MANIFEST}")
    assert stats["files_live"] > 0

"""SimHash hot-band detection + re-seeding (VERDICT r9 item 5):
a band value that accumulates verify-failing members must be DETECTED
(one grouped count, warned loudly from the increment) and SPREAD by
re-banding under a permuted geometry — while every drop decision stays
provably identical (pigeonhole recall is geometry-independent; the
registry's simhash_reseed_increment entry value-checks that against
the plain-geometry oracle).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from hadoop_app_spark.operators.bucketing import write_bucketed
from hadoop_app_spark.operators.dedup import (
    _set_index_params,
    hot_simhash_bands,
    reseed_simhash_bands,
    seed_simhash_index,
    simhash_band_rows,
    simhash_increment,
)

SF = "/root/testdata/sf0.001"


def _fabricate_hot_index(spark, tbl: str, n_members: int = 40):
    """The realistic hot shape: members share band 0's exact 14 bits
    (one template value) but differ pseudo-randomly in the other 42 —
    pairwise hamming ~21 >> max_hamming, so every one of them
    legitimately persists in the index, and band 0's bucket holds all
    of them."""
    members = []
    for i in range(n_members):
        hi = int.from_bytes(hashlib.md5(f"hot{i}".encode()).digest()[:6], "big")
        sh = ((hi & ((1 << 42) - 1)) << 14) | 0x1ABC
        members.append((i, sh))
    sh_df = spark.createDataFrame(members, "id long, simhash long")
    rows = simhash_band_rows(sh_df, "id", 56, 4).select("bucket", "id", "simhash")
    write_bucketed(rows, tbl, ["bucket"], 8)
    _set_index_params(spark, tbl, half_bits=28, bands=4, perm_seed=0)
    return {m[0] for m in members}


def test_hot_band_detected_and_increment_warns(spark):
    _fabricate_hot_index(spark, "sh_hot1")
    hot = hot_simhash_bands(spark, "sh_hot1", threshold=20).collect()
    assert len(hot) == 1 and hot[0]["n"] == 40
    assert hot[0]["bucket"] == 0x1ABC  # band 0's template value

    batch = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    with pytest.warns(UserWarning, match="reseed_simhash_bands"):
        simhash_increment(
            batch, "sh_hot1", "text", "doc_id",
            dropped_table=False, append=False, hot_band_threshold=20,
        )


def test_reseed_spreads_hot_band(spark):
    ids = _fabricate_hot_index(spark, "sh_hot2")
    assert hot_simhash_bands(spark, "sh_hot2", threshold=20).count() == 1
    stats = reseed_simhash_bands(spark, "sh_hot2", new_seed=7)
    assert stats == {"docs": 40, "rows": 160, "perm_seed": 7}
    # the permuted band mixes bits from across the word: members
    # differing in ~21 random positions almost never agree on a full
    # 14-bit permuted band — the hot bucket is gone
    assert hot_simhash_bands(spark, "sh_hot2", threshold=20).count() == 0
    # content preserved: same docs, same fingerprints, 4 rows each
    idx = spark.table("sh_hot2")
    assert idx.count() == 160
    assert {r["id"] for r in idx.select("id").distinct().collect()} == ids


def test_reseed_preserves_drop_decisions_on_real_corpus(spark):
    """Twin-table pin: the same increment batch against a reseeded
    index and a plain-geometry index drops exactly the same docs and
    leaves behind the same (id, fingerprint) index content."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    seed = d.where(F.col("doc_id") % 10 == 0)
    batch = d.where(F.col("doc_id") % 10 == 1)
    for tbl in ("sh_tw_plain", "sh_tw_reseed"):
        seed_simhash_index(seed, "text", "doc_id", tbl)
    reseed_simhash_bands(spark, "sh_tw_reseed", new_seed=7)

    surv_plain = simhash_increment(
        batch, "sh_tw_plain", "text", "doc_id", dropped_table=False
    )
    surv_reseed = simhash_increment(
        batch, "sh_tw_reseed", "text", "doc_id", dropped_table=False
    )
    a = sorted(r.doc_id for r in surv_plain.select("doc_id").collect())
    b = sorted(r.doc_id for r in surv_reseed.select("doc_id").collect())
    assert a == b and a
    # the indexes hold the same documents' fingerprints (band rows
    # differ by geometry, the (id, simhash) content must not)
    content = lambda t: sorted(
        (r["id"], r["simhash"])
        for r in spark.table(t).select("id", "simhash").distinct().collect()
    )
    assert content("sh_tw_plain") == content("sh_tw_reseed")


def test_double_reseed_preserves_drop_decisions(spark):
    """Geometry changes COMPOSE: re-banding again under a different
    seed (the registry entry runs one reseed; this pins the repeated
    maintenance cadence) still produces the plain-geometry survivors."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    seed = d.where(F.col("doc_id") % 10 == 0)
    batch1 = d.where(F.col("doc_id") % 10 == 1)
    batch2 = d.where(F.col("doc_id") % 10 == 2)
    for tbl in ("sh_dbl_plain", "sh_dbl_reseed"):
        seed_simhash_index(seed, "text", "doc_id", tbl)

    got, want = [], []
    reseed_simhash_bands(spark, "sh_dbl_reseed", new_seed=7)
    for i, batch in enumerate((batch1, batch2)):
        if i == 1:
            reseed_simhash_bands(spark, "sh_dbl_reseed", new_seed=11)
        got.append(sorted(
            r.doc_id for r in simhash_increment(
                batch, "sh_dbl_reseed", "text", "doc_id", dropped_table=False
            ).select("doc_id").collect()
        ))
        want.append(sorted(
            r.doc_id for r in simhash_increment(
                batch, "sh_dbl_plain", "text", "doc_id", dropped_table=False
            ).select("doc_id").collect()
        ))
    assert got == want and all(want)

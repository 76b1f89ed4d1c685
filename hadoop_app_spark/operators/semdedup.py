"""SemDeDup: semantic deduplication in embedding space (Abbas et al.
2023, arXiv:2303.09540).

Beyond-reference surface (north star dedup family): the EMBEDDING-
cluster-scoped member — where MinHash/SimHash/winnowing catch lexical
near-duplicates, SemDeDup removes documents that SAY the same thing
in different words. The published recipe: k-means the embeddings,
compute pairwise cosine within each cluster only, and inside every
duplicate group keep the example with the LOWEST cosine similarity
to its cluster centroid (retain hard/atypical examples, drop the
redundant prototypical ones).

Decomposition here (pure Catalyst; one bounded collect):
1. centroids: the ``n_clusters`` lowest-id vectors (deterministic
   farthest-thing-from-random seeding is deliberately NOT used so the
   DuckDB oracle can recompute the centroids with ORDER BY/LIMIT; at
   deployment scale pass ``centroid_source`` = trained IVF centroids
   from operators/similarity.train_ivf_centroids — same plan shape);
2. assignment: per-row argmax of cosine to the inlined centroid
   matrix — a narrow map, ties to the lowest centroid id;
3. duplicate test: self-join ON THE CLUSTER KEY only (the SemDeDup
   trick — pairwise cosine is quadratic per cluster, never corpus-
   wide), pair predicate cos(x, y) >= threshold;
4. keep rule: drop x iff some same-cluster y with cos >= threshold
   ranks before it under (centroid_sim ASC, id ASC) — i.e. the
   LOWEST-centroid-sim member of every duplicate group survives.

Scale shape (100 TB): the centroid collect is n_clusters rows
(n_clusters grows with the corpus — it is the knob that bounds
cluster population and hence the per-cluster quadratic); assignment
never shuffles; the only exchange is the hash partition on the int
cluster key; the assigned frame is localCheckpoint-materialized once
for the self-join's two sides and the survivor anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_app_spark.functions.vectors import cosine_similarity


def assign_clusters(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    centroid_source: DataFrame | None = None,
) -> DataFrame:
    """-> (id, vec, cluster, csim): nearest-centroid assignment by
    cosine. ``cluster`` is the centroid's OWN id (stable across runs
    and engines, unlike a positional index); ``csim`` the cosine to
    it. Centroids default to the n_clusters lowest-id rows of *df*."""
    src = centroid_source if centroid_source is not None else df
    cents = [
        (r[0], [float(x) for x in r[1]])
        for r in src.orderBy(id_col).limit(n_clusters).select(id_col, vec_col).collect()
    ]
    if not cents:
        raise ValueError("empty centroid source")
    matrix = F.lit([v for _, v in cents])
    cent_ids = F.lit([int(i) for i, _ in cents])
    sims = F.transform(matrix, lambda c: cosine_similarity(F.col(vec_col), c))
    # first max = lowest centroid id; element_at needs an int index
    best = F.array_position(sims, F.array_max(sims)).cast("int")
    return df.select(
        F.col(id_col),
        F.col(vec_col),
        F.element_at(cent_ids, best).alias("cluster"),
        F.array_max(sims).alias("csim"),
    )


def semdedup_survivors(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.85,
    centroid_source: DataFrame | None = None,
) -> DataFrame:
    """-> (id, cluster): rows surviving SemDeDup at ``threshold``.

    Within each cluster, x is dropped iff some other member y has
    cos(x, y) >= threshold and (y.csim, y.id) < (x.csim, x.id) —
    so exactly one member of every duplicate group (the one least
    similar to the centroid = hardest example) survives, and
    unclustered duplicates (cos >= threshold but different clusters)
    are NOT dropped, faithfully to the published algorithm.
    """
    assigned = assign_clusters(
        df, id_col, vec_col, n_clusters, centroid_source
    ).localCheckpoint(eager=False)
    x = assigned.select(
        F.col(id_col).alias("_xid"),
        F.col(vec_col).alias("_xv"),
        F.col("cluster"),
        F.col("csim").alias("_xs"),
    )
    y = assigned.select(
        F.col(id_col).alias("_yid"),
        F.col(vec_col).alias("_yv"),
        F.col("cluster"),
        F.col("csim").alias("_ys"),
    )
    ranked_before = (F.col("_ys") < F.col("_xs")) | (
        (F.col("_ys") == F.col("_xs")) & (F.col("_yid") < F.col("_xid"))
    )
    dropped = (
        x.join(y, "cluster")
        .where(
            (F.col("_xid") != F.col("_yid"))
            & ranked_before
            & (cosine_similarity(F.col("_xv"), F.col("_yv")) >= F.lit(threshold))
        )
        .select(F.col("_xid").alias(id_col))
        .distinct()
    )
    return assigned.join(dropped, id_col, "left_anti").select(id_col, "cluster")

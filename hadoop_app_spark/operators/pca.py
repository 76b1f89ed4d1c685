"""Distributed PCA / whitening over an embedding column — the
preprocessing pass in front of ANN indexing and SemDeDup (centering +
decorrelation measurably tightens cosine thresholds; OPQ/PCA rotation
is standard ahead of IVF/PQ indexes).

Beyond-reference surface (north star similarity family). The Spark
shape is the classic bounded-moment trick:
- mean and the d x d Gram matrix are ONE aggregation each — the Gram
  accumulates as d*(d+1)/2 upper-triangle sums via a posexplode
  self-pair expansion with map-side partial combine, so only
  O(d^2) numbers ever reach the driver (d = 64 -> 2,080 doubles),
  never a row;
- the eigendecomposition of the d x d covariance runs driver-side in
  numpy (microseconds — it is d x d, not n x n);
- projection/whitening back over the corpus is a single narrow map
  with the rotation broadcast as a plan literal (d x k doubles).

Eigenvectors have a sign/rotation ambiguity and float means inherit
aggregation order, so trained components are engine-seeded state —
the registry entry is rows-only by design (the bpe/quality-classifier
convention) and pytest pins the invariants that matter: orthonormal
components, descending explained variance, whitened covariance ==
identity, and reconstruction error below the trailing eigenmass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _require_clean_vectors(df: DataFrame, vec_col: str, d: int) -> None:
    """Moment aggregation silently mixes denominators (or the numpy
    kernel crashes on a ragged batch) if any vector is NULL or the
    wrong length — refuse with the cause instead."""
    n_bad = df.where(
        F.col(vec_col).isNull() | (F.size(vec_col) != F.lit(d))
    ).count()
    if n_bad:
        raise ValueError(
            f"{n_bad} row(s) have NULL or non-{d}-dim {vec_col!r}; "
            "drop or repair them before computing moments"
        )


def embedding_moments(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[list[float], list[list[float]], int]:
    """(mean, covariance, n) of the vector column via two bounded
    aggregations: a d-element mean and a d*(d+1)/2-element raw-moment
    upper triangle (posexplode to (i, x_i), conditional self-join-free
    pair expansion inside ONE groupBy with partial combine)."""
    n = df.count()
    if n == 0:
        raise ValueError("empty corpus")
    first = df.where(F.col(vec_col).isNotNull()).select(vec_col).head()
    if first is None:
        raise ValueError(f"all values of {vec_col!r} are NULL")
    d = len(first[0])
    _require_clean_vectors(df, vec_col, d)
    # float32 storage would lose mass in the products — accumulate in
    # double from the first multiply
    vec = F.col(vec_col).cast("array<double>")
    # d-element mean: posexplode -> (dim, avg)
    mean_rows = (
        df.select(F.posexplode(vec).alias("i", "x"))
        .groupBy("i")
        .agg(F.avg("x").alias("m"))
        .collect()
    )
    mean = [0.0] * d
    for r in mean_rows:
        mean[r["i"]] = float(r["m"])
    # upper-triangle raw second moments: expand each row's vector into
    # its (i, j>=i, x_i*x_j) triples with one transform/flatten, then
    # one hash aggregation — O(d^2/2) keys, map-side combined
    pairs = F.flatten(
        F.transform(
            vec,
            lambda xi, i: F.transform(
                F.slice(vec, i + 1, F.size(vec) - i),
                lambda xj, j: F.struct(
                    i.alias("i"), (i + j).alias("j"), (xi * xj).alias("p")
                ),
            ),
        )
    )
    mom_rows = (
        df.select(F.explode(pairs).alias("t"))
        .select(F.col("t.i").alias("i"), F.col("t.j").alias("j"), F.col("t.p").alias("p"))
        .groupBy("i", "j")
        .agg(F.sum("p").alias("s"))
        .collect()
    )
    cov = [[0.0] * d for _ in range(d)]
    for r in mom_rows:
        i, j = int(r["i"]), int(r["j"])
        # E[x_i x_j] - mu_i mu_j, filled symmetrically
        v = float(r["s"]) / n - mean[i] * mean[j]
        cov[i][j] = v
        cov[j][i] = v
    return mean, cov, n


def embedding_moments_fast(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[list[float], list[list[float]], int]:
    """Vectorized twin of :func:`embedding_moments` — the production
    moments pass: each Arrow batch emits ONE tiny partial row
    (count, d-element sum, d*(d+1)/2 upper-triangle Gram via a single
    BLAS X^T X) instead of d*(d+1)/2 exploded structs PER CORPUS ROW;
    partials combine driver-side (bounded: one row per batch).
    Float accumulation order differs from the Catalyst form (SIMD
    pairwise vs hash-agg order), so moments agree to ~1e-12 relative,
    not bit-exact — equality at that tolerance is pytest-pinned, and
    PCA components are engine-seeded state either way."""
    import numpy as np
    import pandas as pd

    first = df.where(F.col(vec_col).isNotNull()).select(vec_col).head()
    if first is None:
        raise ValueError("empty corpus (or all vectors NULL)")
    d = len(first[0])
    _require_clean_vectors(df, vec_col, d)
    iu0, iu1 = (idx.tolist() for idx in np.triu_indices(d))

    def part(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            g = x.T @ x
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [g[iu0, iu1].tolist()],
                }
            )

    rows = df.select(vec_col).mapInPandas(
        part, "n long, s array<double>, g array<double>"
    ).collect()
    if not rows:
        raise ValueError("empty corpus")
    n = sum(r["n"] for r in rows)
    s = np.sum([r["s"] for r in rows], axis=0)
    gtri = np.sum([r["g"] for r in rows], axis=0)
    mean = s / n
    G = np.zeros((d, d))
    G[iu0, iu1] = gtri
    G[(iu1, iu0)] = gtri
    cov = G / n - np.outer(mean, mean)
    return [float(m) for m in mean], [[float(x) for x in row] for row in cov], int(n)


def train_pca(
    df: DataFrame, vec_col: str = "embedding", k: int = 8, vectorized: bool = True
) -> tuple[list[float], list[list[float]], list[float]]:
    """(mean, components [k x d], eigenvalues [k]) — covariance from
    :func:`embedding_moments_fast` (default; pass ``vectorized=False``
    for the pure-Catalyst moments), eigendecomposition driver-side
    (numpy, d x d). Components are unit-norm rows, eigenvalues
    descending; signs normalized so each component's largest-|coord|
    entry is positive (removes the eigenvector sign ambiguity, making
    trained state reproducible for a fixed plan)."""
    import numpy as np

    moments = embedding_moments_fast if vectorized else embedding_moments
    mean, cov, _ = moments(df, vec_col)
    w, v = np.linalg.eigh(np.array(cov))  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = []
    eigs = []
    for idx in order:
        vec = v[:, idx]
        j = int(np.argmax(np.abs(vec)))
        if vec[j] < 0:
            vec = -vec
        comps.append([float(x) for x in vec])
        eigs.append(float(max(w[idx], 0.0)))
    return mean, comps, eigs


def project_pca(
    df: DataFrame,
    mean: list[float],
    components: list[list[float]],
    eigenvalues: list[float] | None = None,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Project (and optionally whiten) the vector column onto trained
    components: out_j = (x - mean) . c_j [/ sqrt(lambda_j + eps)].
    A single narrow map — mean and rotation ride as plan literals
    (k x d doubles; bounded by construction, k <= d)."""
    if whiten and eigenvalues is None:
        raise ValueError("whitening needs eigenvalues")
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.lit([float(m) for m in mean]),
        lambda x, m: x - m,
    )
    # hoist the centering into ONE materialized column: inlining it in
    # every component's product would re-run the d-element subtraction
    # k times per row (HOFs are interpreted — measured as 2k zip_with
    # nodes in the plan instead of k+1)
    tmp = f"_{out_col}_centered"
    staged = df.withColumn(tmp, centered)
    cols = []
    for j, comp in enumerate(components):
        p = F.aggregate(
            F.zip_with(F.col(tmp), F.lit([float(c) for c in comp]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        if whiten:
            p = p / F.lit(float((eigenvalues[j] + eps) ** 0.5))
        cols.append(p)
    return staged.withColumn(out_col, F.array(*cols)).drop(tmp)

"""Iterative graph operators — connected components for dedup groups.

Greedy pair-dedup (drop the higher id of each candidate pair) over-
keeps documents when near-dup relations chain: A~B, B~C but not A~C
keeps A and C. Connected components give the principled grouping —
one survivor per component. The reference has nothing iterative; this
is the engine's demonstration of driver-controlled iteration over
distributed joins (the Pregel-style shape Catalyst can't express as
one query).

Scale notes baked in:
- min-label propagation converges in O(diameter) rounds; dedup
  similarity graphs are dense clusters with tiny diameters (2-3).
- every round is one shuffle (edges join labels, min-aggregate);
  convergence is checked with a cheap count of changed labels.
- localCheckpoint per round truncates lineage — without it the plan
  tree doubles every iteration and the driver, not the data, becomes
  the bottleneck (analysis time + stack depth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _driver_union_find(sym: DataFrame) -> DataFrame:
    """Resolve components of an ALREADY-BOUNDED symmetric edge frame on
    the driver: union-find with path compression + union-by-min-root,
    whose result is the same unique min-reachable-id fixpoint the
    distributed loop converges to. Only called under
    ``small_graph_threshold`` — the caller has proven the collect is a
    broadcast-sized handful of MB, not a corpus."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in sym.collect():
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    node_type = sym.schema["a"].dataType
    schema = T.StructType(
        [T.StructField("node", node_type), T.StructField("component", node_type)]
    )
    rows = [(n, find(n)) for n in parent]
    return sym.sparkSession.createDataFrame(rows, schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
    small_graph_threshold: int = 1_000_000,
) -> DataFrame:
    """[node, component] for every node appearing in ``edges``;
    component = the smallest node id reachable from the node.

    Undirected: edges are symmetrized internally. Deterministic for a
    given edge set regardless of partitioning or iteration count (the
    fixpoint is unique).

    Size-adaptive execution (the AQE broadcast-threshold idea applied
    to iteration): the symmetrized edge count is known for free after
    the eager checkpoint, and when it is at most
    ``small_graph_threshold`` rows (default 1M ~ tens of MB — i.e.
    the same order a broadcast join would ship anyway) the component
    fixpoint is resolved in one driver union-find pass instead of
    O(diameter) full shuffle rounds, each of which costs a fixed
    multi-job overhead that dwarfs the data at this size. Near-dup
    pair sets are tiny relative to their corpus (pairs ~ duplicates,
    pre-bounded by the LSH bucket caps), so this is the common case
    even at 100 TB corpus scale; a genuinely large edge set (web
    graphs, citation graphs) exceeds the threshold and takes the
    distributed min-label loop below, unchanged. Both paths reach the
    SAME unique fixpoint; pass ``small_graph_threshold=0`` to force
    the distributed loop (the property tests do).

    The distributed path runs until the min-label fixpoint
    (changed == 0). ``max_iter`` is a safety valve, not a result cap:
    exhausting it RAISES rather than returning unconverged (i.e.
    wrong) labels — a chain component with more hops than rounds
    would otherwise silently mislabel. Label propagation needs
    O(longest min-path) rounds; dedup similarity graphs are dense
    clusters with tiny diameters, so the bound exists only to stop a
    runaway driver loop on pathological inputs.
    """
    # checkpoint the RAW edge projection before symmetrizing: the union
    # puts the (possibly expensive) upstream pair-generation plan in
    # BOTH branches and Spark does not reuse the exchange across them —
    # without this the whole candidate pipeline executes twice
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(eager=True)
    if e.count() <= small_graph_threshold:
        # union-find treats each edge as undirected — no need to
        # symmetrize or dedup before a driver-side pass
        return _driver_union_find(e)
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint(eager=True)
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nmin"))
        )
        # carry the previous label through the update so convergence is
        # one count on the checkpointed frame — not an extra join of
        # new-vs-old labels per round
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least("label", F.coalesce("nmin", "label")).alias("label"),
                F.col("label").alias("_old"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.where(F.col("label") != F.col("_old")).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "raise max_iter (labels would be wrong if returned unconverged)"
    )


def canonical_per_component(
    scores: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    pair_cols: tuple[str, str] = ("id_a", "id_b"),
) -> DataFrame:
    """Pick the best document of every near-dup cluster: [id,
    component, canonical_id] for each clustered node, where the
    canonical is the component member with the HIGHEST score (ties
    break to the smallest id) — the keep-the-best-copy dedup policy,
    vs dedup_by_components' keep-the-min-id.

    ``scores`` maps id -> quality; a clustered node missing from
    ``scores`` still appears in the output but cannot be elected
    canonical — a component with NO scored member keeps every node
    with a NULL canonical_id (the caller decides that policy edge;
    silently dropping the cluster would hide data). Scale shape: the
    argmax is ``max_by(node, struct(score, -node))`` — a
    partial-combine hash aggregation per component, NOT a
    per-component row_number window — then one join back on the
    component key.
    """
    comp = connected_components(pairs, src=pair_cols[0], dst=pair_cols[1])
    scored = comp.join(
        scores.select(F.col(id_col).alias("node"), F.col(score_col).alias("_s")), "node"
    )
    canon = scored.groupBy("component").agg(
        F.max_by(
            "node",
            F.struct(F.col("_s").alias("s"), (-F.col("node")).alias("tie")),
        ).alias("canonical_id")
    )
    return comp.join(canon, "component", "left").select(
        F.col("node").alias(id_col), "component", "canonical_id"
    )


def dedup_by_components(
    df: DataFrame, pairs: DataFrame, id_col: str, pair_cols: tuple[str, str] = ("id_a", "id_b")
) -> DataFrame:
    """Keep one row (the min id) per near-dup component; rows not in
    any pair survive untouched."""
    comp = connected_components(pairs, src=pair_cols[0], dst=pair_cols[1])
    losers = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")

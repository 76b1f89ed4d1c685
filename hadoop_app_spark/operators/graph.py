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


def triangle_census(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle census of an undirected graph -> ONE row
    [n_nodes, n_edges, n_wedges, n_triangles, global_clustering].

    Degree-ordered triangle counting (the Schank & Wagner forward /
    MapReduce "node-iterator++" scheme): canonicalize + dedup the edge
    set, orient every edge from its lower-(degree, id) endpoint to the
    higher, then count wedges a->b, a->c (b before c in the same
    order) that close with an oriented edge b->c. Every triangle is
    counted EXACTLY once, all arithmetic is integral, so the census is
    deterministic and oracle-reproducible regardless of partitioning.

    Why the orientation matters at 100 TB: wedge generation is the
    quadratic hazard — sum over nodes of (out_degree choose 2). With
    degree ordering the out-degree of every node is O(sqrt(m)) even on
    power-law graphs (hubs receive, never emit), so the wedge shuffle
    is bounded by O(m^1.5) instead of sum(d^2), which a celebrity node
    would otherwise blow up. global_clustering = 3T / W, a single
    division of two exact integers.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da, db = deg.alias("da"), deg.alias("db")
    oriented = (
        e.join(da, e.a == F.col("da.node"))
        .join(db, e.b == F.col("db.node"))
        .select(
            F.when(
                (F.col("da.deg") < F.col("db.deg"))
                | ((F.col("da.deg") == F.col("db.deg")) & (e.a < e.b)),
                F.struct(
                    e.a.alias("u"),
                    e.b.alias("v"),
                    F.col("da.deg").alias("du"),
                    F.col("db.deg").alias("dv"),
                ),
            )
            .otherwise(
                F.struct(
                    e.b.alias("u"),
                    e.a.alias("v"),
                    F.col("db.deg").alias("du"),
                    F.col("da.deg").alias("dv"),
                )
            )
            .alias("o")
        )
        .select("o.u", "o.v", "o.du", "o.dv")
    )
    w1, w2 = oriented.alias("w1"), oriented.alias("w2")
    # wedge (u; v1, v2) with v1 before v2 in (deg, id) order
    wedges = w1.join(w2, F.col("w1.u") == F.col("w2.u")).where(
        (F.col("w1.dv") < F.col("w2.dv"))
        | ((F.col("w1.dv") == F.col("w2.dv")) & (F.col("w1.v") < F.col("w2.v")))
    )
    closing = oriented.select(
        F.col("u").alias("cu"), F.col("v").alias("cv")
    )
    tri = wedges.join(
        closing,
        (F.col("w1.v") == F.col("cu")) & (F.col("w2.v") == F.col("cv")),
        "left_semi",
    )
    # four actions share the edge/orientation lineage — persist the two
    # frames everything derives from so the (possibly expensive) edge
    # derivation runs once, not four times
    e = e.persist()
    oriented = oriented.persist()
    try:
        n_tri = tri.count()
        n_wedges = wedges.count()
        n_nodes = deg.count()
        n_edges = e.count()
    finally:
        e.unpersist()
        oriented.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [
            (
                n_nodes,
                n_edges,
                n_wedges,
                n_tri,
                (3.0 * n_tri / n_wedges) if n_wedges else 0.0,
            )
        ],
        "n_nodes bigint, n_edges bigint, n_wedges bigint, n_triangles bigint, global_clustering double",
    )


def pagerank_fixedpoint(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    cnt: str = "cnt",
    node: str = "node",
    scale: int = 10**12,
    weight_scale: int = 10**6,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Weighted PageRank in FIXED-POINT integer arithmetic ->
    [node, rank_scaled]: rank x 10^12 as BIGINT after ``iters``
    power iterations with damping 85/100 and uniform dangling-mass
    redistribution.

    Why fixed point: float PageRank is order-dependent (double sums
    don't associate), so a distributed run can differ between
    partitionings, engines, even repeats — useless for a differential
    gate. Here every step is integer multiply / floor-divide / sum:
    transition weights are pre-quantized once to w = cnt * 10^6 //
    out_total (bounded 10^6, so rank * w never exceeds 10^18 at ANY
    data scale — the overflow headroom is designed in, not assumed),
    contributions are rank * w // 10^6, and the damped update is
    BASE + 85 * (contrib_sum + dangling_share) // 100. The result is
    a deterministic, engine-independent fixpoint trajectory that
    DuckDB replays bit-for-bit with the same `//` semantics.

    Scale shape: ranks are one row per node; each iteration is one
    broadcast-or-shuffle join of edges with ranks on src plus a
    partial-combine sum by dst — the Pregel superstep expressed as
    DataFrame ops. The edge-frame derivation (usually a multi-join
    aggregation of a fact table) is where the 100 TB lives; the
    iteration runs on the projected graph. Every ``checkpoint_every``
    supersteps the rank frame is localCheckpoint-ed: an iterative plan
    otherwise stacks one join per round, so at deep iteration counts
    planning cost grows superlinearly and every action re-executes all
    upstream supersteps — checkpointing bounds plan depth to
    checkpoint_every rounds. Pure integer arithmetic, so truncating
    lineage cannot change a single bit of the trajectory.
    """
    n_nodes = nodes.count()
    base = (scale * 15 // 100) // n_nodes
    w = (
        edges.groupBy(src)
        .agg(F.sum(cnt).alias("_tot"))
        .join(edges, src)
        .select(
            F.col(src).alias("_src"),
            F.col(dst).alias("_dst"),
            F.expr(f"({cnt} * {weight_scale}) div _tot").alias("_w"),
        )
    )
    out_nodes = w.select(F.col("_src").alias(node)).distinct()
    ranks = nodes.select(F.col(node).alias(node)).withColumn(
        "rank_scaled", F.lit(scale // n_nodes).cast("long")
    )
    for it in range(iters):
        dangling = (
            ranks.join(out_nodes, node, "left_anti")
            .agg(F.coalesce(F.sum("rank_scaled"), F.lit(0)).alias("_d"))
            .select(F.expr(f"_d div {n_nodes}").alias("_share"))
        )
        contrib = (
            w.join(ranks, w._src == ranks[node])
            .select("_dst", F.expr(f"(rank_scaled * _w) div {weight_scale}").alias("_c"))
            .groupBy("_dst")
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = (
            nodes.select(F.col(node).alias(node))
            .join(contrib, F.col(node) == F.col("_dst"), "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                node,
                (
                    F.lit(base)
                    + F.expr("(85 * (coalesce(_s, 0) + _share)) div 100")
                ).cast("long").alias("rank_scaled"),
            )
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def label_propagation(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    cnt: str = "cnt",
    node: str = "node",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Weighted synchronous label propagation -> [node, community]
    after ``iters`` supersteps — the graph family's community detector
    beside components/triangles/PageRank (Raghavan et al. 2007, made
    DETERMINISTIC: classic LPA breaks ties randomly and updates
    asynchronously, which is useless for a differential gate, so here
    every node updates simultaneously from the previous round's
    labels, the winning label maximizes the INTEGER edge-weight sum,
    and ties go to the lexicographically smallest label — a fixed
    trajectory any engine replays exactly).

    Edges are treated as undirected (symmetrized here); self-loops
    contribute the node's own label like any neighbor, which acts as
    the label-retention term. A node with no incident edges keeps its
    previous label. No damping/convergence test — ``iters`` is fixed
    and small because at corpus scale each extra superstep is a full
    edge-frame shuffle.

    Scale shape: one row per node for labels; each superstep is one
    join of the (symmetrized) edge frame with the label frame on the
    neighbor key plus a (node, label) weighted count and a per-node
    argmax window over at most deg(v) candidate labels. Like
    `pagerank_fixedpoint`, the 100 TB lives in deriving the edge
    frame; the iteration runs on the projected graph. For near-dup
    families this is the bounded-rounds alternative to full
    transitive closure: k supersteps reach radius-k families without
    iterating to convergence. Every ``checkpoint_every`` supersteps
    the label frame is localCheckpoint-ed, bounding plan depth (and
    re-execution of upstream supersteps) at the radius-k iteration
    counts the docstring advertises; the trajectory is deterministic
    integer/lexicographic arithmetic, so truncating lineage changes
    nothing.
    """
    from pyspark.sql import Window

    und = edges.select(
        F.col(src).alias("_u"), F.col(dst).alias("_v"), F.col(cnt).alias("_w")
    ).unionAll(
        edges.select(
            F.col(dst).alias("_u"), F.col(src).alias("_v"), F.col(cnt).alias("_w")
        )
    )
    labels = nodes.select(F.col(node).alias("_n"), F.col(node).alias("_lbl"))
    win = Window.partitionBy("_v").orderBy(F.col("_s").desc(), F.col("_lbl").asc())
    for it in range(iters):
        cand = (
            und.join(labels, und["_u"] == labels["_n"])
            .groupBy("_v", "_lbl")
            .agg(F.sum("_w").alias("_s"))
        )
        winners = (
            cand.withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") == 1)
            .select(F.col("_v").alias("_n"), F.col("_lbl").alias("_new"))
        )
        labels = (
            labels.join(winners, "_n", "left")
            .select(
                "_n", F.coalesce(F.col("_new"), F.col("_lbl")).alias("_lbl")
            )
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            labels = labels.localCheckpoint(eager=True)
    return labels.select(F.col("_n").alias(node), F.col("_lbl").alias("community"))

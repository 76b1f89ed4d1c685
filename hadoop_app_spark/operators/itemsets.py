"""Association mining — frequent item pairs with A-Priori pruning.

The market-basket classic (Agrawal & Srikant's A-Priori, VLDB'94
class), Spark-first: which items co-occur in the same basket more
often than chance? The answer powers recommendation shelves,
bundle pricing, and — in a training-data pipeline — co-occurrence
audits ("which sources/tags land together?"). The reference has no
analogue; this is north-star analytics surface beside the
collocation miner (`token_pmi_topk`), which is the same idea one
level down (token pairs within a document window vs item pairs
within a basket).

Scale shape, stated once: candidate generation is the within-basket
self-join — O(sum over baskets of basket_size^2) pair rows, NEVER
|items|^2 — and the A-Priori property prunes it first: a pair
occurring in >= s baskets needs BOTH items in >= s baskets, so
infrequent items are dropped before the join (a broadcast semi-join
against the bounded frequent-item dictionary). Everything after is
two grouped counts and a dictionary join; metrics are exact integer
micro/milli units (integer div — bit-identical in any engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_item_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
) -> DataFrame:
    """Frequent co-occurring item pairs -> ``[item_a, item_b, n_pair,
    n_a, n_b, support_micro, conf_ab_milli, conf_ba_milli,
    lift_milli]`` with ``item_a < item_b`` and ``n_pair >=
    min_pair_count``.

    Metrics (all exact integer units): ``support_micro`` = pair
    baskets per million baskets; ``conf_ab_milli`` = P(b | a) in
    milli (``n_pair * 1000 div n_a``), ``conf_ba_milli`` the reverse;
    ``lift_milli`` = observed-over-independent co-occurrence
    (``n_pair * n_baskets * 1000 div (n_a * n_b)`` — 1000 means
    independence, above it the pair attracts).

    Duplicate (basket, item) rows count ONCE (set semantics — a
    basket either contains the item or not), and the A-Priori prune
    at ``min_pair_count`` is LOSSLESS: a pair in >= s baskets puts
    each item in >= s baskets, so dropping items below the threshold
    before the join changes nothing. The basket total is one scalar
    count (the documented bounded collect class); the frequent-item
    dictionary joins broadcast (bounded by the item vocabulary).
    """
    if min_pair_count < 1:
        raise ValueError("frequent_item_pairs: min_pair_count must be >= 1")
    items = df.select(basket_col, item_col).distinct()
    n_baskets = items.select(basket_col).distinct().count()
    if n_baskets == 0:
        raise ValueError("frequent_item_pairs: no baskets in the input")
    counts = items.groupBy(item_col).agg(F.count("*").alias("n_item"))
    # A-Priori: only items frequent enough to support a frequent pair
    # enter the candidate join
    freq = counts.where(F.col("n_item") >= min_pair_count)
    pruned = items.join(
        F.broadcast(freq.select(item_col)), item_col, "left_semi"
    )
    a = pruned.select(F.col(basket_col), F.col(item_col).alias("item_a"))
    b = pruned.select(F.col(basket_col), F.col(item_col).alias("item_b"))
    pc = (
        a.join(b, basket_col)
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_pair"))
        .where(F.col("n_pair") >= min_pair_count)
    )
    out = pc.join(
        F.broadcast(
            counts.select(F.col(item_col).alias("item_a"), F.col("n_item").alias("n_a"))
        ),
        "item_a",
    ).join(
        F.broadcast(
            counts.select(F.col(item_col).alias("item_b"), F.col("n_item").alias("n_b"))
        ),
        "item_b",
    )
    return out.select(
        "item_a",
        "item_b",
        F.col("n_pair").cast("long").alias("n_pair"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.expr(f"n_pair * 1000000 div {n_baskets}").cast("long").alias("support_micro"),
        F.expr("n_pair * 1000 div n_a").cast("long").alias("conf_ab_milli"),
        F.expr("n_pair * 1000 div n_b").cast("long").alias("conf_ba_milli"),
        F.expr(f"n_pair * {n_baskets} * 1000 div (n_a * n_b)")
        .cast("long")
        .alias("lift_milli"),
    )

"""Keyword retrieval operators: inverted index + BM25 scoring.

Beyond-reference surface (north star: the retrieval side of a corpus
pipeline — decontamination lookups, doc search over a curated dump,
keyword-based eval-set mining). Both operators are pure Catalyst and
oracle-reproducible in DuckDB:

- inverted_index: term -> capped, sorted posting list + FULL document
  frequency. The cap is applied with a per-term row_number window that
  Spark 3.5+ prunes map-side (WindowGroupLimit), so a stopword's
  posting list never materializes corpus-sized anywhere — the
  doc_freq aggregate (which must see every row) is a separate
  partial-combine hash agg, not a collect.
- bm25_topk: Robertson/Sparck-Jones BM25 over a SMALL literal query
  term set. The term filter lands right after the token explode, so
  only matching (doc, term) rows ever shuffle; document length comes
  from a narrow token_count projection (no second explode); N/avgdl
  are a one-row aggregate broadcast via crossJoin; per-term scores
  accumulate in DECIMAL(18,6) so Spark's and DuckDB's different
  summation orders cannot diverge (the ln() stays inside one per-row
  expression where both engines see identical operands).

At 100 TB: inverted_index shuffles once on term (explode output) with
bounded output rows; bm25 shuffles only docs matching the query terms
— for a q-term query that's at most q rows per matching doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hadoop_app_spark.functions.text import token_count, tokenize


def inverted_index(
    df: DataFrame, text_col: str, id_col: str, max_postings: int = 32
) -> DataFrame:
    """Build [term, postings, doc_freq]: the first ``max_postings``
    doc ids (ascending) containing each term, plus the exact total
    document frequency.

    postings is bounded per term (WindowGroupLimit prunes beyond the
    cap map-side); doc_freq is exact over ALL docs via a separate
    hash aggregate — the two must not share a plan node, or the cap
    would silently truncate the frequency too."""
    t = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("term")
    )
    dfreq = t.groupBy("term").agg(F.count("*").alias("doc_freq"))
    w = Window.partitionBy("term").orderBy(id_col)
    capped = t.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= max_postings)
    postings = capped.groupBy("term").agg(F.sort_array(F.collect_list(id_col)).alias("postings"))
    return postings.join(dfreq, "term")


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Global top-``k`` docs for a keyword query under BM25
    (idf = ln(1 + (N - df + 0.5)/(df + 0.5)), the nonnegative form).

    Returns [id, score, n_terms] ordered by (score desc, id) — the id
    tiebreak makes the k-boundary deterministic. orderBy().limit(k)
    compiles to TakeOrderedAndProject (per-partition partial top-k,
    single driver merge of P*k rows), never a global sort."""
    dl = df.select(F.col(id_col), token_count(F.col(text_col)).alias("_dl"))
    stats = dl.agg(F.count("*").alias("_n"), F.sum("_dl").alias("_sumdl"))
    toks = df.select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("term")).where(
        F.col("term").isin(*query_terms)
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("dfreq"))
    scored = tf.join(F.broadcast(dfreq), "term").join(dl, id_col).crossJoin(F.broadcast(stats))
    avgdl = F.col("_sumdl").cast("double") / F.col("_n")
    idf = F.log(
        F.lit(1.0) + (F.col("_n") - F.col("dfreq") + F.lit(0.5)) / (F.col("dfreq") + F.lit(0.5))
    )
    term_score = (
        idf
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("_dl") / avgdl))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum(term_score.cast("decimal(18,6)")).cast("double").alias("score"),
        F.count("*").alias("n_terms"),
    )
    return per_doc.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def bounded_rank(
    df: DataFrame, score_col: str, id_col: str, rank_col: str = "rank"
) -> DataFrame:
    """1-based dense global rank by (score desc, id asc) WITHOUT a
    window: rank(a) = 1 + |{b : b.score > a.score OR (equal AND
    b.id < a.id)}| via a broadcast non-equi self-join + count.

    ONLY for frames already bounded by an upstream top-k (tens to
    thousands of rows): the join is O(n²) on the bounded frame, which
    at that size is cheaper and safer than the alternatives — a
    global row_number window is a single-partition stage the plan
    guards rightly ban registry-wide, and exempting 'small' windows
    would leave nothing machine-checking the corpus-sized ones. The
    broadcast side is the same (score, id) projection, so the plan is
    scan -> BroadcastNestedLoopJoin -> hash agg, no shuffle."""
    b_side = F.broadcast(
        df.select(F.col(score_col).alias("_bs"), F.col(id_col).alias("_bi"))
    )
    beats = (F.col("_bs") > F.col(score_col)) | (
        (F.col("_bs") == F.col(score_col)) & (F.col("_bi") < F.col(id_col))
    )
    return (
        df.join(b_side, beats, "left")
        .groupBy(*df.columns)
        .agg((F.count("_bi") + 1).cast("int").alias(rank_col))
    )


def rrf_fuse(
    keyword: DataFrame,
    vector: DataFrame,
    id_col: str = "doc_id",
    k_rrf: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of two bounded
    ranked lists -> [id, kw_rank, vec_rank, fused_rank], the top-``k``
    by fused score — the standard hybrid-retrieval join (BM25 keyword
    arm + embedding ANN arm) this engine is one operator away from.

    Inputs: ``keyword`` = [id, kw_rank], ``vector`` = [id, vec_rank],
    both already top-k-bounded with INTEGER 1-based ranks. Fused
    score = Σ 1/(k_rrf + rank) over the arms that returned the doc —
    derived from integer ranks only, and every emitted column is an
    integer, so the SQL oracle is bit-exact: the doubles exist only
    inside the ORDER BY, where both engines compute the identical
    IEEE quotients from identical integers (exact ties fall to the id
    tiebreak in both). Scale shape: both arms are top-k-bounded
    before fusion, so the full-outer join and the bounded_rank
    self-join touch O(k) rows regardless of corpus size — all the
    corpus-sized work already happened inside the arms."""
    j = keyword.join(vector, id_col, "full_outer")
    arm = lambda c: F.when(
        F.col(c).isNotNull(),
        F.lit(1.0) / (F.lit(k_rrf) + F.col(c)),
    ).otherwise(F.lit(0.0))
    fused = j.select(
        id_col,
        "kw_rank",
        "vec_rank",
        (arm("kw_rank") + arm("vec_rank")).alias("_score"),
    )
    ranked = bounded_rank(fused, "_score", id_col, rank_col="fused_rank")
    return ranked.where(F.col("fused_rank") <= k).select(
        id_col, "kw_rank", "vec_rank", "fused_rank"
    )


#: milli-scaled DCG position discounts, floor(1000 / log2(pos + 1)) for
#: positions 1..10 — ENGINE CONSTANTS, not computed: baking the ten
#: irrational discounts as integer literals keeps the whole nDCG
#: pipeline in exact integer arithmetic ("no float log anywhere", the
#: token_pmi_topk convention), and any engine replaying the metric uses
#: the same table
NDCG_MILLI_WEIGHTS = (1000, 630, 500, 430, 386, 356, 333, 315, 301, 289)


def retrieval_eval(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k: int = 10,
    rel_cap: int = 3,
    mrr_rel: int = 3,
) -> DataFrame:
    """Ranking-quality metrics per query term, all in exact integer
    milli-units -> [term, n_ranked, dcg_milli, idcg_milli, ndcg_milli,
    mrr_milli] — the evaluation face of the retrieval family (BM25 /
    inverted index / hybrid fusion rank documents; this scores how well
    a ranking surfaces the relevant ones).

    Self-contained eval protocol (deterministic, oracle-replayable):
    the system ranking orders each term's matching docs by
    (tf desc, id) and keeps top-``k``; graded relevance is
    ``least(tf, rel_cap)`` (more mentions = more relevant, capped);
    DCG@k multiplies each position's relevance by the milli-scaled
    discount table `NDCG_MILLI_WEIGHTS` (integer literals — no float
    log); the ideal ranking reorders the SAME candidates by
    (rel desc, tf desc, id); nDCG = DCG * 1000 div IDCG; MRR is
    1000 div the first rank whose relevance reaches ``mrr_rel`` (0 if
    none). Integer sums are order-free, so the metric is bit-identical
    under any partitioning and in any engine.

    Scale shape: the term filter lands right after the explode (only
    query-matching rows shuffle — the bm25_topk property), both
    rankings are per-TERM windows over candidate sets the filter
    already bounded, and the output is |terms| rows."""
    if k > len(NDCG_MILLI_WEIGHTS):
        raise ValueError(f"k={k} exceeds the discount table ({len(NDCG_MILLI_WEIGHTS)})")
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("term")
    ).where(F.col("term").isin(*query_terms))
    tf = toks.groupBy("term", id_col).agg(F.count("*").alias("tf"))
    rel = F.least(F.col("tf"), F.lit(rel_cap))
    sys_w = Window.partitionBy("term").orderBy(F.col("tf").desc(), F.col(id_col))
    ideal_w = Window.partitionBy("term").orderBy(
        rel.desc(), F.col("tf").desc(), F.col(id_col)
    )
    ranked = tf.select(
        "term",
        rel.alias("rel"),
        F.row_number().over(sys_w).alias("rank"),
        F.row_number().over(ideal_w).alias("irank"),
    )
    w = F.lit(list(NDCG_MILLI_WEIGHTS))
    gain = lambda pos: F.when(
        pos <= k, F.col("rel") * F.element_at(w, pos.cast("int"))
    ).otherwise(F.lit(0))
    per_term = ranked.groupBy("term").agg(
        F.sum((F.col("rank") <= k).cast("long")).alias("n_ranked"),
        F.sum(gain(F.col("rank"))).cast("long").alias("dcg_milli"),
        F.sum(gain(F.col("irank"))).cast("long").alias("idcg_milli"),
        F.min(
            F.when((F.col("rel") >= mrr_rel) & (F.col("rank") <= k), F.col("rank"))
        ).alias("_first_rel"),
    )
    return per_term.select(
        "term",
        "n_ranked",
        "dcg_milli",
        "idcg_milli",
        F.expr("dcg_milli * 1000 div idcg_milli").alias("ndcg_milli"),
        F.coalesce(F.expr("1000 div _first_rel"), F.lit(0)).cast("long").alias(
            "mrr_milli"
        ),
    )


def ann_recall(
    ann_results: DataFrame,
    exact_results: DataFrame,
    k: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k of an ANN ranking against exact ground truth ->
    [query_id, n_hits, recall_milli] — the ANN family's evaluation face
    beside `retrieval_eval` (brute/LSH/IVF/PQ/IVF×PQ *produce*
    neighbor rankings; this measures how many TRUE neighbors the
    approximate index surfaced, the number every recall/latency
    trade — n_probe, shortlist, band count — is tuned against).

    Both inputs are ``[query_id, {id_col}, rank]`` frames (any of the
    family's query functions); rows past rank ``k`` are ignored on
    both sides so mixed-k frames compare at the caller's k. The query
    list comes from the EXACT side, so a query the ANN returned
    nothing for still appears with recall 0 — silent misses are the
    metric's whole point. Integer milli (hits * 1000 div k),
    bit-identical in any engine.

    Scale shape: both sides are |queries| x k rows by construction —
    one keyed equi-join + one grouped count, independent of corpus
    scale (the corpus work already happened inside the rankers)."""
    a = ann_results.where(F.col("rank") <= k).select("query_id", id_col)
    e = exact_results.where(F.col("rank") <= k).select("query_id", id_col)
    hits = a.join(e, ["query_id", id_col]).groupBy("query_id").agg(
        F.count("*").alias("_h")
    )
    return (
        e.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("_h", F.lit(0)).cast("long").alias("n_hits"),
            F.expr(f"coalesce(_h, 0) * 1000 div {int(k)}")
            .cast("long")
            .alias("recall_milli"),
        )
    )

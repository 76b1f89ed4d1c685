"""BPE merge induction — learn a byte-pair-encoding merge table from
the corpus (the tokenizer-training step of an LLM data pipeline).

Classic Sennrich et al. 2016 BPE over whitespace words: start from
characters (+ an end-of-word marker), repeatedly merge the most
frequent adjacent symbol pair. The distributed shape matters more
than the loop:

- ONE corpus pass builds the word-frequency table; every later round
  runs on that VOCABULARY-sized table (unique words), never on the
  corpus again — the same contraction in-memory trainers exploit,
  kept distributed so a 100M-row web vocabulary still fits the
  cluster instead of one machine's RAM.
- each round is: explode adjacent pairs weighted by word count ->
  partial-combine hash agg -> TakeOrdered(1) for the argmax pair
  (count desc, then lexicographic — fully deterministic) -> rewrite
  the symbol arrays with a Catalyst fold (left-to-right,
  non-overlapping, standard BPE semantics). No Python in the row
  path; ``localCheckpoint`` per round truncates the growing lineage
  exactly like operators/graph's label loop.

Correctness is pinned against a pure-Python reference implementation
in tests/test_bpe.py (exact merge-sequence equality); no SQL oracle —
DuckDB cannot express the per-round argmax loop, so the registry entry
is rows-only by design.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_app_spark.functions.text import tokenize

EOW = "</w>"


def _merge_in_symbols(sym: Column, left: str, right: str) -> Column:
    """Replace every left-to-right non-overlapping adjacent (left,
    right) pair in a symbol array with the concatenated symbol — one
    Catalyst fold, no UDF. The accumulator carries (out, skip): skip
    marks that the current element was consumed as the pair's right
    half."""
    merged = F.lit(left + right)

    def step(acc, i):
        el = F.element_at(sym, i + 1)
        nxt = F.element_at(sym, i + 2)  # null past the end
        is_pair = (el == F.lit(left)) & nxt.eqNullSafe(F.lit(right))
        return (
            F.when(acc["skip"], F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")))
            .when(
                is_pair,
                F.struct(
                    F.concat(acc["out"], F.array(merged)).alias("out"),
                    F.lit(True).alias("skip"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(el)).alias("out"),
                    F.lit(False).alias("skip"),
                )
            )
        )

    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit(False).alias("skip")
    )
    folded = F.aggregate(
        F.sequence(F.lit(0), F.size(sym) - 1), acc0, step, lambda a: a["out"]
    )
    # empty arrays: sequence(0, -1) counts DOWN in Spark — guard them
    return F.when(F.size(sym) > 0, folded).otherwise(sym)


def word_frequency_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """[word, count, symbols]: the vocabulary-sized training state —
    symbols start as characters plus the end-of-word marker."""
    chars = lambda w: F.filter(F.split(w, "", -1), lambda c: c != "")
    return (
        df.select(F.explode(tokenize(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("count"))
        .select(
            "w",
            "count",
            F.concat(chars(F.col("w")), F.array(F.lit(EOW))).alias("symbols"),
        )
    )


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    repartition_to: int | None = None,
) -> DataFrame:
    """[id, n_words, bpe_tokens]: tokens per document under a LEARNED
    merge table — the encode/inference half of :func:`learn_bpe_merges`
    (the real answer to "how many tokens is this corpus", vs the
    regex estimate in functions.text.bpe_ish_token_count).

    Applies the merges in learned order to each word (all occurrences
    left-to-right per merge — exactly how training rewrote the vocab,
    so training-corpus words reproduce their trained segmentation).
    mapInPandas kernel with a per-batch word cache: corpora repeat
    words heavily (Zipf), so each distinct word is encoded once per
    batch, not once per occurrence. The merge table is a driver-side
    list (n_merges entries, broadcast with the closure) — bounded by
    construction."""
    import pandas as pd

    def run(batches):
        cache: dict[str, int] = {}

        def encode_len(word: str) -> int:
            n = cache.get(word)
            if n is not None:
                return n
            syms = list(word) + [EOW]
            for a, b in merges:
                if len(syms) < 2:
                    break
                out, i = [], 0
                while i < len(syms):
                    if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cache[word] = len(syms)
            return cache[word]

        for pdf in batches:
            ids, n_words, n_tokens = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = (text or "").lower().split()
                ids.append(doc_id)
                n_words.append(len(toks))
                n_tokens.append(sum(encode_len(w) for w in toks))
            if ids:
                yield pd.DataFrame(
                    {id_col: ids, "n_words": n_words, "bpe_tokens": n_tokens}
                )

    base = df.select(id_col, text_col)
    if repartition_to:
        base = base.repartition(repartition_to)
    id_type = df.schema[id_col].dataType.simpleString()
    return base.mapInPandas(run, f"{id_col} {id_type}, n_words long, bpe_tokens long")


def learn_bpe_merges(
    df: DataFrame, text_col: str = "text", n_merges: int = 20
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges; returns (ordered merge list,
    final [word, count, symbols] vocabulary table). Stops early when
    no adjacent pair remains (fully merged corpus)."""
    words = word_frequency_table(df, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            words.where(F.size("symbols") >= 2)
            .select(
                "count",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size("symbols") - 2),
                        lambda i: F.struct(
                            F.element_at("symbols", (i + 1).cast("int")).alias("l"),
                            F.element_at("symbols", (i + 2).cast("int")).alias("r"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("count").alias("n"))
        )
        top = pairs.orderBy(F.col("n").desc(), "l", "r").limit(1).collect()
        if not top:
            break
        left, right = top[0].l, top[0].r
        merges.append((left, right))
        words = words.withColumn(
            "symbols", _merge_in_symbols(F.col("symbols"), left, right)
        ).localCheckpoint(eager=True)
    return merges, words

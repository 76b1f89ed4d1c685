"""Training-layout text chunking: sliding-window token chunks (the
RAG / long-context ingestion splitter) and deterministic
fill-in-the-middle splits (Bavarian et al. 2022, arXiv:2207.14255).

Beyond-reference surface (north star): after curation and dedup, a
pretraining/RAG pipeline turns documents into model-shaped pieces.
Both operators here are PURE narrow maps — one explode for the chunk
grid, zero shuffles, zero Python — so they run at scan speed on any
corpus size, and both are integer-deterministic so a DuckDB oracle
recomputes them exactly (gate-checkable, unlike rand()-split layouts).

Scale shape (100 TB): chunking is scan -> generate -> write; the only
data growth is the intended chunk fan-out (bounded by ~len/stride per
doc). FIM is scan -> three substrings. Neither ever sees an exchange;
filters on chunk metadata stay pushable because everything is a
deterministic Catalyst expression over the stored columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_app_spark.functions.text import doc_fingerprint, tokenize_raw


def doc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """-> [id, chunk_id, start_tok, n_tok, chunk_text]: overlapping
    token-window chunks on a fixed stride grid.

    Contract (shared with the SQL oracle): tokens are whitespace
    tokens of the RAW text; chunk i covers token indices
    [i*stride, i*stride + chunk_size) clamped to the document, with
    stride = chunk_size - overlap; i runs 0..floor((n_tokens-1)/stride)
    so every token is in at least one chunk and the final chunks may be
    short. Empty documents produce no chunks. One explode, no shuffle.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    # case-preserving: chunks are re-emitted as text, and the oracle
    # keys on raw tokens — tokenize() would lowercase silently
    toks = tokenize_raw(F.col(text_col))
    base = df.select(
        F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n")
    ).where(F.col("_n") > 0)
    # exact for any real document length: doubles are integer-exact
    # far past 2^40 tokens per doc
    i_max = F.floor((F.col("_n") - 1) / F.lit(stride)).cast("int")
    start = (F.col("chunk_id") * stride).cast("int")
    chunk = F.slice(F.col("_toks"), start + 1, chunk_size)
    return (
        base.select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), i_max)).alias("chunk_id"),
            "_toks",
        )
        .select(
            id_col,
            "chunk_id",
            start.cast("long").alias("start_tok"),
            F.size(chunk).cast("long").alias("n_tok"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


def fim_splits(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 90,
) -> DataFrame:
    """-> [id, prefix, middle, suffix, spm]: deterministic
    fill-in-the-middle splits (the FIM transform applied to a fraction
    of pretraining documents so the model learns infilling).

    Split points derive from the content fingerprint, not rand(): with
    L = length(text) and j = floor(L/6), the boundaries are
    m1 = floor(L/3) + fp % (j+1) and m2 = floor(2L/3) + (fp/31) % (j+1)
    — both middle-third-ish, jittered per document, reproducible under
    re-runs/repartitioning AND recomputable by the SQL oracle. ``spm``
    (fp % 2) marks the suffix-prefix-middle serialization order half
    the time, per the PSM/SPM recipe. Documents shorter than
    ``min_len`` are excluded (too short to infill). Pure narrow map.
    """
    L = F.length(F.col(text_col))
    fp = doc_fingerprint(F.col(text_col))
    j = F.floor(L / 6).cast("long")
    m1 = (F.floor(L / 3).cast("long") + fp % (j + 1)).cast("int")
    m2 = (F.floor(L * 2 / 3).cast("long") + F.floor(fp / 31).cast("long") % (j + 1)).cast("int")
    return (
        df.where(L >= min_len)
        .select(
            F.col(id_col),
            F.col(text_col).substr(F.lit(1), m1).alias("prefix"),
            F.col(text_col).substr(m1 + 1, m2 - m1).alias("middle"),
            F.col(text_col).substr(m2 + 1, L - m2).alias("suffix"),
            (fp % 2).cast("int").alias("spm"),
        )
    )

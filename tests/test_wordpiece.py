"""WordPiece merge induction vs a pure-Python naive reference.

The reference re-implements the Schuster & Nakajima likelihood-scored
merge loop independently with Fraction-based scores (exact rationals,
a deliberately DIFFERENT exactness mechanism than the production
cross-multiplication) — merge sequences and final segmentations must
match bit-for-bit."""

from __future__ import annotations

from collections import Counter
from fractions import Fraction

from hadoop_app_spark.operators.wordpiece import (
    CONT,
    greedy_segment,
    learn_wordpiece,
    py_wordpiece_train,
    wordpiece_token_counts,
)

SF = "/root/testdata/sf0.001"


def _ref_train(word_counts, n_merges):
    def symbols(w):
        return [w[0]] + [CONT + c for c in w[1:]]

    vocab = {w: symbols(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs, syms = Counter(), Counter()
        for w, ss in vocab.items():
            c = word_counts[w]
            for s in ss:
                syms[s] += c
            for p in zip(ss, ss[1:]):
                pairs[p] += c
        if not pairs:
            break
        best = min(
            pairs,
            key=lambda p: (-Fraction(pairs[p], syms[p[0]] * syms[p[1]]), p),
        )
        merges.append(best)
        a, b = best
        merged = a + (b[2:] if b.startswith(CONT) else b)
        for w, ss in vocab.items():
            out, i = [], 0
            while i < len(ss):
                if i < len(ss) - 1 and ss[i] == a and ss[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(ss[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def test_wordpiece_matches_naive_reference_synthetic():
    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest low newer",
    ]
    wc = dict(Counter(w for t in texts for w in t.lower().split()))
    ref_merges, ref_vocab = _ref_train(wc, 15)
    merges, vocab, pieces = py_wordpiece_train(wc, 15)
    assert merges == ref_merges
    assert vocab == ref_vocab
    assert pieces == {s for ss in ref_vocab.values() for s in ss}


def test_wordpiece_matches_naive_reference_on_corpus(spark):
    from hadoop_app_spark.operators.bpe import word_frequency_table

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(150)
    wc = {
        r.w: r["count"]
        for r in word_frequency_table(docs, "text").select("w", "count").collect()
    }
    ref_merges, _ = _ref_train(wc, 12)
    merges, _, _ = py_wordpiece_train(wc, 12)
    assert merges == ref_merges


def test_wordpiece_prefers_cohesive_pairs_over_frequent():
    # "ab" occurs 10x but a,b are everywhere (score 10/(30*30));
    # "xy" occurs 3x and x,y occur ONLY together (score 3/(3*3)) ->
    # WordPiece must merge (x, ##y) first, where BPE would take (a, ##b)
    wc = {"ab": 10, "ba": 10, "aa": 5, "bb": 5, "xy": 3}
    merges, _, _ = py_wordpiece_train(wc, 1)
    assert merges == [("x", "##y")]


def test_greedy_segment_longest_match_and_fallback():
    pieces = {"un", "##happi", "##ness", "##h", "##a", "happy", "##y"}
    assert greedy_segment("unhappiness", pieces) == ["un", "##happi", "##ness"]
    # 'q' is out of vocabulary -> per-character fallback piece
    assert greedy_segment("qa", pieces) == ["q", "##a"]
    # initial position must NOT use a ##-piece
    assert greedy_segment("happy", pieces) == ["happy"]


def test_learn_wordpiece_and_distributed_encode(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    merges, pieces, table = learn_wordpiece(docs, n_merges=20)
    assert len(merges) == 20
    # the vocabulary frame's symbols are exactly the trained pieces
    tab_pieces = {s for r in table.collect() for s in r.symbols}
    assert tab_pieces == pieces
    out = wordpiece_token_counts(docs, pieces, repartition_to=8)
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == docs.count()
    sample = docs.select("doc_id", "text").limit(10).collect()
    for r in sample:
        toks = (r.text or "").lower().split()
        want = sum(len(greedy_segment(w, pieces)) for w in toks)
        assert rows[r.doc_id].n_words == len(toks)
        assert rows[r.doc_id].wp_tokens == want
        n_chars = sum(len(w) for w in toks)
        assert len(toks) <= rows[r.doc_id].wp_tokens <= max(n_chars, len(toks))


def test_learn_wordpiece_top_words_floor(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    # a floor covering the whole vocabulary must not change the result
    full, _, _ = learn_wordpiece(docs, n_merges=8)
    floored, _, _ = learn_wordpiece(docs, n_merges=8, top_words=10**6)
    assert full == floored
    # a tight floor trains on the head only — still 8 valid merges
    head, _, pieces = learn_wordpiece(docs, n_merges=8, top_words=20)
    assert len(head) == 8 and all(len(p) == 2 for p in head)
    assert pieces

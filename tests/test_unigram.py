"""Unigram (SentencePiece-shaped) tokenizer: vocab construction, exact
Viterbi DP (hand-computed cases, tie-breaks, guardrails), end-to-end
tokenization round-trip."""

import pytest

from polars_order_book_spark.operators.unigram import (
    COMBINE,
    unigram_tokenize,
    unigram_vocab,
    viterbi_segment,
)

COSTS = {"a": 1, "b": 2, "ab": 2, "ba": 9, "aba": 4}


def test_viterbi_hand_computed():
    # ababa: ab|ab|a = cost 5, 3 pieces beats aba|ba (13), ab|aba (6), ...
    combined, pieces = viterbi_segment("ababa", COSTS)
    assert combined // COMBINE == 5 and combined % COMBINE == 3
    assert "".join(pieces) == "ababa"
    # aab: a|ab = (3, 2)
    combined, pieces = viterbi_segment("aab", COSTS)
    assert (combined // COMBINE, combined % COMBINE) == (3, 2)
    assert pieces == ["a", "ab"]


def test_viterbi_prefers_fewer_pieces_at_equal_cost():
    # 'aa': a|a = cost 2 (2 pieces); with 'aa' also cost 2 (1 piece) the
    # single piece must win the lexicographic (cost, n_pieces) objective
    combined, pieces = viterbi_segment("aa", {"a": 1, "aa": 2})
    assert pieces == ["aa"]
    assert combined % COMBINE == 1


def test_viterbi_unsegmentable_raises():
    with pytest.raises(ValueError, match="unsegmentable"):
        viterbi_segment("axb", COSTS)


def test_viterbi_piece_list_rebuilds_word():
    import random

    rng = random.Random(3)
    costs = {c: 1 for c in "abcd"}
    costs.update({"ab": 1, "bcd": 2, "cd": 1, "abc": 3})
    for _ in range(50):
        w = "".join(rng.choice("abcd") for _ in range(rng.randrange(1, 12)))
        _, pieces = viterbi_segment(w, costs)
        assert "".join(pieces) == w
        assert all(p in costs for p in pieces)


def _docs(spark):
    texts = ["low " * 5 + "lower " * 2, "newest " * 6 + "widest " * 3]
    return spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])


def test_vocab_chars_complete_and_costs_monotone(spark):
    rows = unigram_vocab(_docs(spark)).collect()
    vocab = {r["piece"]: (r["n"], r["cost"]) for r in rows}
    corpus_chars = set("lowernstwid")
    assert corpus_chars <= {p for p in vocab if len(p) == 1}
    # cost strictly follows the bit-length bands: higher count never costs more
    by_n = sorted(rows, key=lambda r: -r["n"])
    for a, b in zip(by_n, by_n[1:]):
        assert a["cost"] <= b["cost"]
    assert min(r["cost"] for r in rows) == 1  # the max-count piece costs 1


def test_tokenize_end_to_end_totals_match_per_word_dp(spark):
    docs = _docs(spark)
    vocab = unigram_vocab(docs)
    costs = {r["piece"]: int(r["cost"]) for r in vocab.collect()}
    out = {r["doc_id"]: r for r in unigram_tokenize(docs, vocab).collect()}
    import re

    for doc_id, text in [(0, "low " * 5 + "lower " * 2),
                         (1, "newest " * 6 + "widest " * 3)]:
        words = [w for w in re.split(r"[ \t\n\x0b\f\r]+", text.strip(" ").lower()) if w]
        want_c = want_n = 0
        want_pieces = []
        for w in words:
            combined, pieces = viterbi_segment(w, costs)
            want_c += combined // COMBINE
            want_n += combined % COMBINE
            want_pieces.extend(pieces)
        r = out[doc_id]
        assert (r["total_cost"], r["n_pieces"]) == (want_c, want_n)
        assert list(r["pieces"]) == want_pieces


def test_tokenize_empty_doc_yields_zeros(spark):
    docs = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
    vocab = unigram_vocab(_docs(spark))
    out = {r["doc_id"]: r for r in unigram_tokenize(docs, vocab).collect()}
    for i in (1, 2):
        assert out[i]["n_pieces"] == 0 and out[i]["total_cost"] == 0


def test_vocab_guardrails(spark):
    with pytest.raises(ValueError, match="max_piece_len"):
        unigram_vocab(_docs(spark), max_piece_len=1)
    with pytest.raises(ValueError, match="top_multi"):
        unigram_vocab(_docs(spark), top_multi=-1)


def test_tokenize_vocab_cap_fails_fast(spark):
    docs = _docs(spark)
    vocab = unigram_vocab(docs)
    with pytest.raises(ValueError, match="max_vocab_rows"):
        unigram_tokenize(docs, vocab, max_vocab_rows=3)


def _em_corpus_rows():
    texts = [
        "the cat sat on the mat",
        "the cat ate the rat",
        "a bat and a cat and a rat",
        "mat rat bat sat that",
        "the theme of the thesis",
        "rats eat oats and cats eat bats",
    ]
    return [(i, t) for i, t in enumerate(texts)]


def test_em_vocab_distributed_equals_local(spark):
    """The distributed hard-EM trainer must reproduce the pure-Python
    reference byte-for-byte: same pieces, same usage counts, same costs —
    the learn_bpe_merges(_distributed) identity contract."""
    from polars_order_book_spark.operators.unigram import (
        unigram_em_vocab, unigram_em_vocab_local)

    df = spark.createDataFrame(_em_corpus_rows(), "doc_id long, text string")
    got = {
        r["piece"]: (r["n"], r["cost"])
        for r in unigram_em_vocab(df, iters=2).collect()
    }
    wf: dict = {}
    for _, t in _em_corpus_rows():
        for w in t.lower().split():
            wf[w] = wf.get(w, 0) + 1
    expect = unigram_em_vocab_local(wf, iters=2)
    assert got == expect and got


def test_em_tokens_identical_to_local_em_costs(spark):
    """Tokenizing under the EM-trained vocab matches per-word Viterbi under
    the local reference's final cost table."""
    from polars_order_book_spark.operators.unigram import (
        unigram_em_vocab, unigram_em_vocab_local, viterbi_segment)

    df = spark.createDataFrame(_em_corpus_rows(), "doc_id long, text string")
    vocab = unigram_em_vocab(df, iters=2)
    got = {
        r["doc_id"]: (r["n_pieces"], r["total_cost"])
        for r in unigram_tokenize(df, vocab).select(
            "doc_id", "n_pieces", "total_cost").collect()
    }
    wf: dict = {}
    for _, t in _em_corpus_rows():
        for w in t.lower().split():
            wf[w] = wf.get(w, 0) + 1
    costs = {p: c for p, (_, c) in unigram_em_vocab_local(wf, iters=2).items()}
    expect = {}
    for i, t in _em_corpus_rows():
        tot_c = tot_n = 0
        for w in t.lower().split():
            comb, _ = viterbi_segment(w, costs)
            tot_c += comb // COMBINE
            tot_n += comb % COMBINE
        expect[i] = (tot_n, tot_c)
    assert got == expect


def test_em_vocab_chars_survive_at_zero_usage(spark):
    """Characters the E-step stops using must stay in the vocab (n=0) so
    segmentability is invariant across EM rounds."""
    from polars_order_book_spark.operators.unigram import unigram_em_vocab

    df = spark.createDataFrame(_em_corpus_rows(), "doc_id long, text string")
    rows = unigram_em_vocab(df, iters=1).collect()
    chars = {r["piece"] for r in rows if len(r["piece"]) == 1}
    corpus_chars = {
        ch for _, t in _em_corpus_rows() for ch in t.lower() if not ch.isspace()
    }
    assert corpus_chars <= chars


def test_em_vocab_iters_guardrail(spark):
    from polars_order_book_spark.operators.unigram import unigram_em_vocab

    df = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="iters"):
        unigram_em_vocab(df, iters=0)

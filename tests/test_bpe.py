"""BPE training/tokenization: hand-computed merges, greedy-apply rank order,
pair-count parity with the trainer's first iteration, round-trip, cap guard."""

from collections import Counter

import pytest

from polars_order_book_spark.operators.bpe import (
    EOW,
    apply_bpe,
    bpe_pair_counts,
    learn_bpe_merges,
    word_frequencies,
)

# the classic Sennrich et al. toy corpus: low x5, lower x2, newest x6, widest x3
CORPUS = ["low " * 5 + "lower " * 2, "newest " * 6 + "widest " * 3]


def _docs(spark, texts=CORPUS):
    return spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])


def test_word_frequencies_exact(spark):
    wf = {r["word"]: r["freq"] for r in word_frequencies(_docs(spark)).collect()}
    assert wf == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_learn_bpe_hand_computed(spark):
    """First merges on the toy corpus: 'es' (9 = newest 6 + widest 3), then
    'est' (9), then 'est</w>' (9), then 'lo' (7 = low 5 + lower 2)."""
    wf = word_frequencies(_docs(spark))
    merges = learn_bpe_merges(wf, 4)
    assert merges == [("e", "s"), ("es", "t"), ("est", EOW), ("l", "o")]


def test_pair_counts_match_trainer_first_iteration(spark):
    """The relational bpe_pair_counts must equal the driver trainer's first
    pair-count pass exactly (same EOW handling, same weights)."""
    docs = _docs(spark)
    got = {
        (r["sym_left"], r["sym_right"]): r["pair_freq"]
        for r in bpe_pair_counts(docs).collect()
    }
    wf = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    exp: Counter = Counter()
    for w, f in wf.items():
        sym = list(w) + [EOW]
        for a, b in zip(sym, sym[1:]):
            exp[(a, b)] += f
    assert got == dict(exp)


def test_apply_bpe_greedy_rank_order_and_roundtrip(spark):
    wf = word_frequencies(_docs(spark))
    merges = learn_bpe_merges(wf, 6)
    out = {r["doc_id"]: r for r in apply_bpe(_docs(spark), merges).collect()}
    for r in out.values():
        toks = r["bpe_tokens"]
        assert r["n_bpe_tokens"] == len(toks)
        # round-trip: pieces concatenate back to the original words
        rebuilt = "".join(toks).replace(EOW, " ").split()
        # doc 0 = low x5 lower x2; doc 1 = newest x6 widest x3
    assert "".join(out[0]["bpe_tokens"]).replace(EOW, " ").split() == (
        ["low"] * 5 + ["lower"] * 2
    )
    # 'newest' must tokenize using the highest-rank merges: est</w> learned
    toks1 = out[1]["bpe_tokens"]
    assert "est" + EOW in toks1


def test_apply_bpe_no_merges_chars_out(spark):
    out = apply_bpe(_docs(spark, ["ab"]), []).collect()[0]
    assert list(out["bpe_tokens"]) == ["a", "b", EOW]


def test_single_merge_closed_form_counts(spark):
    """Pins the algebra the documents_bpe_tokens oracle relies on: with ONE
    merge rule (l, r), greedy leftmost merges per word = non-overlapping
    leftmost occurrences of lr — all occurrences when l != r, sum of
    floor(run/2) when l == r, an ends-with test when r is the sentinel."""
    # l != r rule: 'ab' everywhere
    docs = _docs(spark, ["abab cabd", "bab"])
    out = {r["doc_id"]: r["n_bpe_tokens"] for r in apply_bpe(docs, [("a", "b")]).collect()}
    # 'abab': 4+1 chars - 2 merges = 3; 'cabd': 5 - 1 = 4; 'bab': 4 - 1 = 3
    assert out == {0: 3 + 4, 1: 3}
    # l == r rule: runs of 'a'
    docs2 = _docs(spark, ["aaaa aaa a"])
    out2 = apply_bpe(docs2, [("a", "a")]).collect()[0]
    # 'aaaa': 5 - 2 = 3; 'aaa': 4 - 1 = 3; 'a': 2 - 0 = 2
    assert out2["n_bpe_tokens"] == 8
    # sentinel rule
    docs3 = _docs(spark, ["he she x"])
    out3 = apply_bpe(docs3, [("e", EOW)]).collect()[0]
    # 'he': 3 - 1 = 2; 'she': 4 - 1 = 3; 'x': 2 - 0 = 2
    assert out3["n_bpe_tokens"] == 7


def test_apply_bpe_unicode_whitespace_matches_trainer(spark):
    """A text with a non-breaking space must tokenize to the SAME words the
    Spark-side trainer counted (Java \\s does not split on U+00A0)."""
    txt = "foo\u00a0bar baz"
    docs = _docs(spark, [txt])
    wf = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    assert wf == {"foo\u00a0bar": 1, "baz": 1}
    out = apply_bpe(docs, [("b", "a")]).collect()[0]
    rebuilt = "".join(out["bpe_tokens"]).replace(EOW, " ").split(" ")
    assert [w for w in rebuilt if w] == ["foo\u00a0bar", "baz"]


def test_apply_bpe_string_id_column(spark):
    df = spark.createDataFrame([("u-1", "ab ab")], ["doc_id", "text"])
    out = apply_bpe(df, [("a", "b")]).collect()[0]
    assert out["doc_id"] == "u-1"
    assert out["n_bpe_tokens"] == 4  # two words of (ab, </w>)


def test_vocab_cap_fails_fast(spark):
    wf = word_frequencies(_docs(spark))
    with pytest.raises(ValueError, match="max_vocab_rows"):
        learn_bpe_merges(wf, 2, max_vocab_rows=2)


def test_bad_n_merges(spark):
    wf = word_frequencies(_docs(spark))
    with pytest.raises(ValueError, match="n_merges"):
        learn_bpe_merges(wf, 0)


# --- distributed trainer ------------------------------------------------------

from polars_order_book_spark.operators.bpe import (  # noqa: E402
    learn_bpe_merges_distributed,
)


def test_string_replace_is_greedy_nonoverlapping_bpe(spark):
    """The distributed trainer's merge step is replace() on a bracketed-symbol
    string — valid ONLY because replace scans left-to-right and resumes AFTER
    the substitution, exactly BPE's greedy non-overlap. Pin that Spark and
    Python agree on the adversarial repeat cases (where a rescan-including-
    replacement implementation would merge differently)."""
    o, c = "\x1f", "\x1e"

    def enc(syms):
        return "".join(o + s + c for s in syms)

    cases = [
        (["a", "a", "a"], ("a", "a"), ["aa", "a"]),
        (["a", "a", "a", "a"], ("a", "a"), ["aa", "aa"]),
        (["a", "a", "a", "a", "a"], ("a", "a"), ["aa", "aa", "a"]),
        (["x", "a", "a", "a", "y"], ("a", "a"), ["x", "aa", "a", "y"]),
        (["ab", "b", "ab", "b"], ("ab", "b"), ["abb", "abb"]),
    ]
    rows = []
    for i, (syms, (l, r), want) in enumerate(cases):
        pat, rep = o + l + c + o + r + c, o + l + r + c
        assert enc(syms).replace(pat, rep) == enc(want), (syms, want)  # Python
        rows.append((i, enc(syms), pat, rep, enc(want)))
    df = spark.createDataFrame(rows, "i long, s string, pat string, rep string, want string")
    from pyspark.sql import functions as F

    bad = df.where(F.replace("s", "pat", "rep") != F.col("want")).count()
    assert bad == 0  # Spark agrees on every case


def test_distributed_trainer_matches_driver_on_toy_corpus(spark):
    wf = word_frequencies(_docs(spark))
    for n in (1, 4, 8):
        assert learn_bpe_merges_distributed(wf, n) == learn_bpe_merges(wf, n)


def test_distributed_trainer_adversarial_overlaps(spark):
    """Repeated-symbol words are where greedy-merge implementations diverge;
    the two trainers must stay byte-identical on them."""
    rows = [("aaaa", 5), ("aab", 3), ("baa", 2), ("aaaaa", 1)]
    wf = spark.createDataFrame(rows, "word string, freq long")
    for n in (1, 2, 3, 6):
        assert learn_bpe_merges_distributed(wf, n) == learn_bpe_merges(wf, n)


@pytest.mark.skipif(
    not __import__("os").path.isdir("/root/testdata/sf0.01"),
    reason="driver testdata not present",
)
def test_distributed_trainer_byte_identical_on_real_corpus(spark):
    """VERDICT r6 #5 done-criterion: >= 3 merges trained distributed,
    byte-identical merges AND apply_bpe tokens vs the driver-side trainer on
    the driver's own sf0.01 corpus."""
    from polars_order_book_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    wf = word_frequencies(docs).localCheckpoint(eager=False)
    m_driver = learn_bpe_merges(wf, 4)
    m_dist = learn_bpe_merges_distributed(wf, 4)
    assert m_dist == m_driver and len(m_dist) == 4
    tok = (
        apply_bpe(docs.limit(50), m_dist)
        .orderBy("doc_id")
        .collect()
    )
    tok_driver = (
        apply_bpe(docs.limit(50), m_driver)
        .orderBy("doc_id")
        .collect()
    )
    assert [r["bpe_tokens"] for r in tok] == [r["bpe_tokens"] for r in tok_driver]


def test_distributed_trainer_bad_n_merges(spark):
    wf = spark.createDataFrame([("ab", 1)], "word string, freq long")
    with pytest.raises(ValueError, match="n_merges"):
        learn_bpe_merges_distributed(wf, 0)


def test_distributed_trainer_stops_when_fully_merged(spark):
    """A corpus that fully merges before n_merges is reached must stop early,
    exactly like the driver loop."""
    wf = spark.createDataFrame([("ab", 3)], "word string, freq long")
    a, b = learn_bpe_merges(wf, 10), learn_bpe_merges_distributed(wf, 10)
    assert a == b and len(a) == 2  # (a,b), (ab,</w>) then nothing left


def test_distributed_trainer_rejects_reserved_control_bytes(spark):
    """Words embedding the \\x1e/\\x1f bracket delimiters would silently
    corrupt the bracketed-symbol encoding; the contract is enforced loudly
    per row (review finding)."""
    from polars_order_book_spark.operators.bpe import (
        learn_bpe_merges_distributed,
    )

    wf = spark.createDataFrame(
        [("ab\x1fcd", 3), ("plain", 2)], "word string, freq long"
    )
    with pytest.raises(Exception) as ei:
        learn_bpe_merges_distributed(wf, 1)
    assert "reserved control byte" in str(ei.value)


def test_distributed_trainer_skips_null_words_like_driver(spark):
    """r8 self-review: the control-byte assert was not null-safe — Catalyst
    merges it with the empty-word filter and NULL-AND-x still evaluates x,
    so a NULL word raised where the driver trainer skips falsy words."""
    from polars_order_book_spark.operators.bpe import (
        learn_bpe_merges,
        learn_bpe_merges_distributed,
    )

    rows = [("low", 5), (None, 3), ("lower", 2), ("", 1)]
    wf = spark.createDataFrame(rows, "word string, freq long")
    dist = learn_bpe_merges_distributed(wf, n_merges=3)
    drv = learn_bpe_merges(wf, n_merges=3)
    assert dist == drv

"""Text operator contracts: winnowing coverage guarantee, vocabulary counts."""

from pyspark.sql.types import LongType, StringType, StructField, StructType

from polars_order_book_spark.operators import text

DOC_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
])


def test_winnow_guarantees_one_fingerprint_per_window(spark):
    """Every trailing w-window of k-gram positions must contain >= 1 selected
    fingerprint — the property that makes sampled fingerprints usable for
    partial-overlap detection."""
    k, w = 3, 4
    rows = [(1, " ".join(f"tok{i % 17}" for i in range(60))),
            (2, "a b c"),                    # exactly one k-gram
            (3, "too short")]                # no k-gram at all
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    out = text.winnow_fingerprints(df, k=k, w=w)
    sel = {}
    for r in out.collect():
        sel.setdefault(r["doc_id"], set()).add(r["pos"])

    n_grams_doc1 = 60 - k + 1
    for start in range(n_grams_doc1 - w + 1):
        window = set(range(start, start + w))
        assert window & sel[1], f"window at {start} has no fingerprint"
    assert sel[2] == {0}
    assert 3 not in sel


def test_winnow_shared_fingerprints_detect_overlap(spark):
    """Documents sharing a long run of tokens must share fingerprint hashes."""
    shared = " ".join(f"w{i}" for i in range(20))
    rows = [(1, "unique alpha beta " + shared),
            (2, shared + " gamma delta other")]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    fps = {}
    for r in text.winnow_fingerprints(df).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    assert fps[1] & fps[2], "overlapping docs share no fingerprints"


def test_tfidf_weights(spark):
    rows = [(1, "cat cat dog"), (2, "dog bird")]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {(r["doc_id"], r["token"]): (r["tf"], r["tfidf"])
           for r in text.tf_idf(df).collect()}
    # N=2; cat df=1 -> ratio 3/2; dog df=2 -> ratio 1
    assert got[(1, "cat")] == (2, 2 * 1.5)
    assert got[(1, "dog")] == (1, 1.0)
    assert got[(2, "bird")] == (1, 1.5)
    # log_scale variant keeps tf but rescales
    logged = {(r["doc_id"], r["token"]): r["tfidf"]
              for r in text.tf_idf(df, log_scale=True).collect()}
    import math
    assert logged[(1, "cat")] == 2 * (math.log(1.5) + 1)


def test_bm25_hand_computed(spark):
    """N=2 docs, T=5 tokens. Query = {cat, dog}. Rational idf (N+1)/(df+1);
    per-term micros quantization; exact micro sums."""
    rows = [(1, "cat cat dog"), (2, "dog bird")]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {r["doc_id"]: (r["n_hits"], r["bm25_micros"])
           for r in text.bm25_scores(df, ["cat", "dog"]).collect()}

    import math

    def term(tf, dfreq, dl, n=2, t=5, k1=1.2, b=0.75):
        idf = (n + 1.0) / (dfreq + 1.0)
        s = idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl * n / t)))
        return math.floor(s * 1_000_000.0 + 0.5)

    exp1 = term(2, 1, 3) + term(1, 2, 3)  # doc1: cat tf=2 df=1; dog tf=1 df=2
    exp2 = term(1, 2, 2)                  # doc2: dog tf=1 df=2
    assert got == {1: (2, exp1), 2: (1, exp2)}
    # empty query rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="terms"):
        text.bm25_scores(df, [])


def test_bm25_log_scale_matches_lucene_idf(spark):
    rows = [(1, "cat cat dog"), (2, "dog bird")]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {r["doc_id"]: r["bm25_micros"]
           for r in text.bm25_scores(df, ["cat"], log_scale=True).collect()}

    import math

    idf = math.log((2 - 1 + 0.5) / (1 + 0.5) + 1.0)
    s = idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * (3 * 2 / 5)))
    assert got == {1: math.floor(s * 1_000_000.0 + 0.5)}


def test_vocabulary_counts(spark):
    rows = [(1, "the cat sat"), (2, "the the dog")]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {r["token"]: (r["doc_freq"], r["total_count"])
           for r in text.vocabulary(df).collect()}
    assert got["the"] == (2, 3)
    assert got["cat"] == (1, 1)
    assert got["dog"] == (1, 1)


def test_repetition_features_hand_computed(spark):
    """Pin the Gopher-style measures on docs with known repetition structure."""
    rows = [
        (1, "aa bb aa bb aa bb aa bb"),   # 8 tokens, 2 distinct
        (2, "x1 x2 x3 x4 x5 x6"),          # no repetition at all
        (3, "solo"),                       # 1 token: no bigram, no 5-gram
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {r["doc_id"]: r.asDict() for r in text.repetition_features(df, ngram=5).collect()}

    r1 = got[1]
    assert r1["n_tokens"] == 8
    assert r1["dup_token_frac"] == (8 - 2) / 8
    # "aa bb" occurs 4x, "bb aa" 3x -> top is "aa bb" by count.
    assert r1["top_bigram"] == "aa bb"
    # 4 occurrences x 4 token-chars over 16 total token chars.
    assert r1["top_bigram_frac"] == (4 * 4) / 16
    # 5-grams: "aa bb aa bb aa" x2, "bb aa bb aa bb" x2 -> dup chars =
    # (2-1)*10 + (2-1)*10 = 20 over 16 (>1 is fine: overlaps not de-overlapped).
    assert r1["dup_ngram_frac"] == 20 / 16

    r2 = got[2]
    assert r2["dup_token_frac"] == 0.0
    assert r2["dup_ngram_frac"] == 0.0
    # All bigrams count 1 -> tie broken by lexicographically greatest.
    assert r2["top_bigram"] == "x5 x6"

    r3 = got[3]
    assert r3["top_bigram"] is None
    assert r3["top_bigram_frac"] == 0.0
    assert r3["dup_ngram_frac"] == 0.0


def test_repetition_features_tie_break_matches_struct_order(spark):
    """Equal-count bigrams resolve to the lexicographically greatest one —
    the rule the DuckDB oracle mirrors via struct max."""
    df = spark.createDataFrame([(1, "b a b a")], DOC_SCHEMA)
    row = text.repetition_features(df).collect()[0]
    # bigrams: "b a" x2, "a b" x1 -> count wins over lexicographic order.
    assert row["top_bigram"] == "b a"


def test_ngram_contamination_flags_shared_spans(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words here entirely now yes"),
            (3, "prefix junk quick brown fox jumps suffix"),  # shares a 4-gram
            (4, "ab cd"),  # too short for any 4-gram
        ],
        DOC_SCHEMA,
    )
    probe = spark.createDataFrame([(100, "zz quick brown fox jumps zz")], DOC_SCHEMA)
    got = {r["doc_id"]: r.asDict() for r in
           text.ngram_contamination(corpus, probe, n=4).collect()}
    assert got[1]["contaminated"] and got[1]["n_matched"] == 1
    assert not got[2]["contaminated"] and got[2]["n_matched"] == 0
    assert got[3]["contaminated"]
    assert got[4]["n_grams"] == 0 and not got[4]["contaminated"]
    assert got[1]["n_grams"] == 9 - 3


def test_ngram_contamination_counts_distinct_grams(spark):
    """A gram repeated in the corpus doc counts once."""
    corpus = spark.createDataFrame([(1, "a b c d a b c d")], DOC_SCHEMA)
    probe = spark.createDataFrame([(9, "a b c d")], DOC_SCHEMA)
    row = text.ngram_contamination(corpus, probe, n=4).collect()[0]
    # distinct 4-grams of doc 1: {a b c d, b c d a, c d a b, d a b c}; only
    # "a b c d" is in the probe.
    assert row["n_matched"] == 1


def test_clean_text_normalization(spark):
    from polars_order_book_spark.operators.text import clean_text

    rows = [
        (1, "  Hello\t\tWorld \n\n x  "),
        (2, "ctrl\x00\x07chars\x1fhere"),
        (3, "AlreadyClean"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["clean_text"], r["n_chars_clean"])
           for r in clean_text(df).collect()}
    assert got[1] == ("Hello World x", 13)
    assert got[2] == ("ctrlcharshere", 13)
    assert got[3] == ("AlreadyClean", 12)
    assert got[4] == ("", 0)
    low = {r["doc_id"]: r["clean_text"]
           for r in clean_text(df, lowercase=True).collect()}
    assert low[3] == "alreadyclean"


def test_dup_span_stats_flags_cross_doc_spans_only(spark):
    """A k-window duplicated across docs counts; a window repeated only
    WITHIN one doc does not (that's repetition_features' job)."""
    shared = "s1 s2 s3 s4"  # one shared 4-token window
    rows = [
        (1, "a b " + shared),            # windows: 3 total, 1 shared
        (2, shared + " x y"),            # windows: 3 total, 1 shared
        (3, "r1 r2 r3 r4 r1 r2 r3 r4"),  # within-doc repeat only
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {r["doc_id"]: r.asDict() for r in text.dup_span_stats(df, k=4).collect()}
    assert out[1]["n_windows"] == 3 and out[1]["n_dup_windows"] == 1
    assert out[2]["n_windows"] == 3 and out[2]["n_dup_windows"] == 1
    assert out[3]["n_dup_windows"] == 0
    assert abs(out[1]["dup_fraction"] - 1 / 3) < 1e-12


def test_quality_filter_per_group_discrete_percentile(spark):
    """Group g has lengths 1..8 -> q=0.25 cutoff is the rank-2 value (2);
    docs with n_tokens >= 2 survive. Singleton group keeps its only doc."""
    from pyspark.sql.types import StructField, StructType, StringType, LongType

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("source", StringType()),
    ])
    rows = [(i, " ".join(["t"] * i), "g") for i in range(1, 9)]
    rows.append((100, "only doc", "solo"))
    df = spark.createDataFrame(rows, schema)
    out = {r["doc_id"]: r.asDict() for r in text.quality_filter(df, q=0.25).collect()}
    assert set(out) == {2, 3, 4, 5, 6, 7, 8, 100}
    assert out[2]["cutoff"] == 2
    assert out[100]["cutoff"] == 2  # rank ceil(0.25*1)=1 -> its own length


def test_quality_filter_rejects_non_dyadic_q_and_is_rank_exact(spark):
    """r8 self-review: 0.07*100 is 7.000000000000001 in IEEE double, so
    float ceil() lands on rank 8 instead of 7 — non-dyadic q is now refused
    loudly, and a dyadic q computes its rank with pure integer arithmetic
    (7/128 of a 128-doc group selects exactly rank 7)."""
    import pytest as _pytest

    rows = [(i, " ".join(["t"] * i), "g") for i in range(1, 129)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    with _pytest.raises(ValueError, match="binary fraction"):
        text.quality_filter(df, q=0.07)
    out = text.quality_filter(df, q=7 / 128).collect()
    # rank (7*128 + 127) DIV 128 = 7 -> cutoff is the 7th-shortest (7 tokens)
    assert all(r["cutoff"] == 7 for r in out)
    assert sorted(r["doc_id"] for r in out) == list(range(7, 129))


# --- RAG chunking ------------------------------------------------------------

def test_chunk_text_overlap_and_coverage(spark):
    from polars_order_book_spark.operators.text import chunk_text

    txt = "".join(chr(ord("a") + i % 26) for i in range(300))
    df = spark.createDataFrame([(1, txt), (2, "tiny")], "doc_id long, text string")
    out = sorted(
        chunk_text(df, size=128, overlap=32).collect(),
        key=lambda r: (r["doc_id"], r["chunk_no"]),
    )
    one = [r for r in out if r["doc_id"] == 1]
    # ceil((300-32)/96) = 3 chunks at starts 0, 96, 192
    assert [r["char_start"] for r in one] == [0, 96, 192]
    assert one[0]["chunk"] == txt[0:128]
    assert one[1]["chunk"] == txt[96:224]      # 32-char overlap with chunk 0
    assert one[2]["chunk"] == txt[192:300]     # tail chunk may be short
    # every character position is covered
    covered = set()
    for r in one:
        covered.update(range(r["char_start"], r["char_start"] + len(r["chunk"])))
    assert covered == set(range(300))
    tiny = [r for r in out if r["doc_id"] == 2]
    assert len(tiny) == 1 and tiny[0]["chunk"] == "tiny"


def test_chunk_text_guardrails(spark):
    import pytest as _pytest

    from polars_order_book_spark.operators.text import chunk_text

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_text(df, size=0)
    with _pytest.raises(ValueError):
        chunk_text(df, size=64, overlap=64)


def test_chunk_udtf_parity_with_builtin_chunker(spark):
    """The Python-UDTF escape hatch must reproduce the JVM chunker exactly."""
    from pyspark.sql.functions import udtf

    from polars_order_book_spark.operators.text import (
        chunk_text,
        chunk_text_udtf_class,
    )

    rows = [(1, "".join(chr(ord("a") + i % 26) for i in range(300))),
            (2, "tiny"), (3, "x" * 128), (4, "y" * 129)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    cls = udtf(chunk_text_udtf_class(128, 32),
               returnType="chunk_no: bigint, char_start: bigint, chunk: string")
    spark.udtf.register("chunk_udtf_test", cls)
    df.createOrReplaceTempView("chunk_docs_test")
    via_udtf = spark.sql(
        "SELECT d.doc_id, c.chunk_no, c.char_start, c.chunk "
        "FROM chunk_docs_test d, LATERAL chunk_udtf_test(d.text) c"
    )
    builtin = chunk_text(df, size=128, overlap=32)
    assert sorted(map(tuple, via_udtf.collect()), key=lambda t: t[:2]) == \
           sorted(map(tuple, builtin.select("doc_id", "chunk_no", "char_start", "chunk").collect()), key=lambda t: t[:2])


def test_hash_embed_unit_norm_and_partition_invariance(spark):
    from polars_order_book_spark.operators.text import hash_embed

    df = spark.createDataFrame(
        [(1, "alpha beta beta gamma"), (2, "alpha alpha"), (3, "   ")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["embedding"] for r in hash_embed(df, dim=16).collect()}
    assert len(out) == 3 and all(len(v) == 16 for v in out.values())
    # L2 norm 1 for docs with tokens; all-zero for the blank doc
    assert abs(sum(x * x for x in out[1]) - 1.0) < 1e-12
    assert all(x == 0.0 for x in out[3])
    # doubled token doubles the pre-norm component: beta bucket dominates
    assert max(out[1]) == sorted(out[1])[-1]
    # partitioning must not change a single bit
    out2 = {r["doc_id"]: r["embedding"]
            for r in hash_embed(df.repartition(5), dim=16).collect()}
    assert out == out2


def test_hash_embed_same_tokens_same_vector(spark):
    from polars_order_book_spark.operators.text import hash_embed

    df = spark.createDataFrame(
        [(1, "x y z"), (2, "z  y   x")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["embedding"] for r in hash_embed(df, dim=8).collect()}
    assert out[1] == out[2]  # bag-of-words: order/whitespace-insensitive


# --- bigram LM familiarity ---------------------------------------------------


def test_bigram_lm_score_hand_computed(spark):
    from polars_order_book_spark.operators.text import bigram_lm_score

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "a c")],
        "doc_id long, text string",
    )
    # pairs: d1: (a,b) (b,a) (a,b); d2: (a,b); d3: (a,c)
    # c(a,b)=3, c(a,c)=1, c(b,a)=1 ; c(a.)=4, c(b.)=1
    # P(b|a)=0.75 -> 750000 ; P(c|a)=0.25 -> 250000 ; P(a|b)=1.0 -> 1000000
    out = {r["doc_id"]: (r["n_bigrams"], r["lm_micros"])
           for r in bigram_lm_score(docs).collect()}
    assert out == {
        1: (3, 750000 + 1000000 + 750000),
        2: (1, 750000),
        3: (1, 250000),
    }


def test_bigram_lm_score_short_docs_absent_and_case_trim(spark):
    from polars_order_book_spark.operators.text import bigram_lm_score

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "  Hello   WORLD  "), (3, "hello world")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["n_bigrams"], r["lm_micros"])
           for r in bigram_lm_score(docs).collect()}
    # doc 1 has no bigram; docs 2 and 3 normalize to the same pair
    assert 1 not in out
    assert out[2] == out[3] == (1, 1000000)


def test_bigram_lm_score_log_scale_orders_rare_below_common(spark):
    from polars_order_book_spark.operators.text import bigram_lm_score

    docs = spark.createDataFrame(
        [(i, "x y") for i in range(9)] + [(99, "x z")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lm_micros"]
           for r in bigram_lm_score(docs, log_scale=True).collect()}
    # ln(0.9) ~ -0.105 -> -105361 micros; ln(0.1) ~ -2.303 -> -2302585
    assert out[0] == out[8] > out[99]
    assert -106000 < out[0] < -105000
    assert -2303000 < out[99] < -2302000


# --- dup span cuts (removal half of exact-substring dedup) -------------------


def test_dup_span_cuts_full_coverage_and_unique_doc_absent(spark):
    from polars_order_book_spark.operators.text import dup_span_cuts

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "q w e r t y u i")],
        "doc_id long, text string",
    )
    out = {(r["doc_id"], r["start_tok"], r["end_tok_excl"], r["n_windows"])
           for r in dup_span_cuts(docs, k=3).collect()}
    # 8 tokens, k=3 -> windows at 0..5, one merged interval [0, 8)
    assert out == {(1, 0, 8, 6), (2, 0, 8, 6)}


def test_dup_span_cuts_two_islands_with_gap(spark):
    from polars_order_book_spark.operators.text import dup_span_cuts

    # doc 1 shares its first 3 and last 3 tokens with docs 2/3; the middle
    # run m1..m9 is unique -> two separate cut intervals
    shared_head = "h1 h2 h3"
    shared_tail = "t1 t2 t3"
    middle = " ".join(f"m{i}" for i in range(9))
    docs = spark.createDataFrame(
        [
            (1, f"{shared_head} {middle} {shared_tail}"),
            (2, f"{shared_head} other stuff here"),
            (3, f"pre amble {shared_tail}"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r["start_tok"], r["end_tok_excl"], r["n_windows"])
        for r in dup_span_cuts(docs, k=3).collect()
        if r["doc_id"] == 1
    )
    # doc1 tokens: h1 h2 h3 m0..m8 t1 t2 t3 (15 tokens)
    # shared windows: [0,3) (head) and [12,15) (tail)
    assert got == [(0, 3, 1), (12, 15, 1)]


def test_dup_span_cuts_merges_overlapping_and_adjacent(spark):
    from polars_order_book_spark.operators.text import dup_span_cuts

    # doc 1 and doc 2 share tokens 0..5 (six tokens): windows 0..3 with k=3
    # overlap pairwise and must merge into ONE interval [0, 6)
    docs = spark.createDataFrame(
        [(1, "s0 s1 s2 s3 s4 s5 u1 u2"), (2, "s0 s1 s2 s3 s4 s5 v1 v2")],
        "doc_id long, text string",
    )
    got = [
        (r["start_tok"], r["end_tok_excl"], r["n_windows"])
        for r in dup_span_cuts(docs, k=3).collect()
        if r["doc_id"] == 1
    ]
    assert got == [(0, 6, 4)]


# --- DSIR importance weights -------------------------------------------------


def test_dsir_weights_ranks_target_like_docs_higher(spark):
    from polars_order_book_spark.operators.text import dsir_weights

    raw = spark.createDataFrame(
        [
            (1, "physics energy quantum field theory"),
            (2, "physics energy quantum wave function"),
            (3, "recipe sugar butter flour oven"),
            (4, "recipe sugar butter cream cake"),
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100, "quantum field energy physics experiment")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["dsir_micros"] / r["n_features"]
           for r in dsir_weights(raw, target).collect()}
    assert len(out) == 4
    assert min(out[1], out[2]) > max(out[3], out[4])


def test_dsir_weights_uniform_when_target_is_corpus(spark):
    from polars_order_book_spark.operators.text import dsir_weights

    # target == raw corpus: t_b == r_b and T == R for every bucket, so each
    # bucket's ratio is exactly 1.0 -> every doc's mean micros is 1e6
    raw = spark.createDataFrame(
        [(i, f"alpha beta g{i} delta") for i in range(6)],
        "doc_id long, text string",
    )
    out = dsir_weights(raw, raw).collect()
    assert len(out) == 6
    for r in out:
        assert r["dsir_micros"] == r["n_features"] * 1_000_000


def test_dsir_weights_log_scale_sign_and_guard(spark):
    import pytest as _pytest

    from polars_order_book_spark.operators.text import dsir_weights

    raw = spark.createDataFrame(
        [(1, "aa bb"), (2, "cc dd")], "doc_id long, text string"
    )
    target = spark.createDataFrame([(9, "aa bb")], "doc_id long, text string")
    out = {r["doc_id"]: r["dsir_micros"]
           for r in dsir_weights(raw, target, log_scale=True).collect()}
    # doc 1's features are in the target -> positive log ratios; doc 2's
    # are not -> negative
    assert out[1] > 0 > out[2]
    with _pytest.raises(ValueError, match="n_buckets"):
        dsir_weights(raw, target, n_buckets=0)


# --- apply span cuts ---------------------------------------------------------


def test_apply_span_cuts_removes_exactly_interval_union(spark):
    from polars_order_book_spark.operators.text import apply_span_cuts, dup_span_cuts

    docs = spark.createDataFrame(
        [
            (1, "h1 h2 h3 m0 m1 m2 m3 m4 m5 m6 m7 m8 t1 t2 t3"),
            (2, "h1 h2 h3 other words in here"),
            (3, "leading bits t1 t2 t3"),
            (4, "totally unique text right here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in apply_span_cuts(docs, k=3).collect()}
    assert set(out) == {1, 2, 3, 4}
    # doc 1 loses its shared head [0,3) and tail [12,15)
    assert out[1]["clean_text"] == "m0 m1 m2 m3 m4 m5 m6 m7 m8"
    assert out[1]["n_tokens"] == 15 and out[1]["n_removed"] == 6
    assert out[4]["clean_text"] == "totally unique text right here"
    assert out[4]["n_removed"] == 0
    # cross-check: removed counts equal the interval union lengths
    cuts = dup_span_cuts(docs, k=3).collect()
    union_len = {}
    for r in cuts:
        union_len[r["doc_id"]] = union_len.get(r["doc_id"], 0) + (
            r["end_tok_excl"] - r["start_tok"]
        )
    for did, row in out.items():
        assert row["n_removed"] == union_len.get(did, 0), did


def test_apply_span_cuts_fully_duplicated_doc_becomes_empty(spark):
    from polars_order_book_spark.operators.text import apply_span_cuts

    docs = spark.createDataFrame(
        [(1, "same exact text here"), (2, "same exact text here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in apply_span_cuts(docs, k=3).collect()}
    for d in (1, 2):
        assert out[d]["clean_text"] == ""
        assert out[d]["n_removed"] == out[d]["n_tokens"] == 4


def test_gopher_rules_each_rule_fires_independently(spark):
    good = ("the data be sent to all of them and note that they have "
            "worked with care " * 4)  # 64 words, all rules pass
    rows = [
        (1, good),
        (2, "the of and " * 3),                              # too few words
        (3, ("a " * 64) + "the of"),                         # mean word len < 3
        (4, good.replace("care", "care###########")),        # hash ratio > 0.1
        (5, "\n".join("• item the of" for _ in range(10)) + "\n" +
            " ".join(["the", "of"] + ["word"] * 60)),        # >90% bullet lines... (11 lines, 10 bullets ≤ 0.9*11? craft below)
        (6, good + " ".join(["..."] * 8)),                   # 8/72 ellipses > 0.1
        (7, ("123 456 789 " * 22) + "the of and that"),      # alpha frac < 0.8
        (8, " ".join(["apple banana cherry"] * 22)),         # no gopher stopwords
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {r["doc_id"]: r.asDict() for r in text.gopher_rules(df).collect()}
    assert out[1]["keep"] is True, out[1]
    assert out[2]["ok_word_count"] is False and out[2]["keep"] is False
    assert out[3]["ok_mean_word_len"] is False
    assert out[4]["ok_symbol_ratio"] is False and out[4]["hash_ratio"] > 0.1
    assert out[6]["ok_symbol_ratio"] is False  # '...' counted via replace-length
    assert out[7]["ok_alpha_words"] is False and out[7]["alpha_word_frac"] < 0.8
    assert out[8]["ok_stopwords"] is False and out[8]["n_stopword_hits"] == 0


def test_gopher_rules_line_level_rules(spark):
    bullets = "\n".join(f"• the item {i} of note" for i in range(10))
    dots = "\n".join(f"the line {i} trails off..." for i in range(10))
    filler = " ".join(["the", "of"] + ["word"] * 58)
    rows = [(1, bullets + "\n" + filler),   # 10/11 bullet lines > 0.9
            (2, dots + "\n" + filler)]      # 10/11 ellipsis lines > 0.3
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {r["doc_id"]: r.asDict() for r in text.gopher_rules(df).collect()}
    assert out[1]["ok_bullet_lines"] is False
    assert out[1]["bullet_line_frac"] == 10.0 / 11.0
    assert out[2]["ok_ellipsis_lines"] is False
    assert out[2]["ellipsis_line_frac"] == 10.0 / 11.0


def test_ngram_novelty_first_owner_semantics(spark):
    import pytest as _pytest

    rows = [
        (1, "alpha beta gamma delta epsilon"),       # 3 distinct trigrams, all new
        (2, "alpha beta gamma delta epsilon"),        # exact copy: novelty 0
        (3, "alpha beta gamma zeta eta theta iota"),  # shares 1 of 5 trigrams
        (4, "one two"),                               # < n tokens: no row
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {r["doc_id"]: r for r in text.ngram_novelty(df).collect()}
    assert 4 not in out
    assert out[1]["n_grams"] == 3 and out[1]["novelty"] == 1.0
    assert out[2]["n_grams"] == 3 and out[2]["n_new"] == 0 and out[2]["novelty"] == 0.0
    assert out[3]["n_grams"] == 5 and out[3]["n_new"] == 4
    assert out[3]["novelty"] == 4.0 / 5.0
    with _pytest.raises(ValueError, match="n must be"):
        text.ngram_novelty(df, n=0)


def test_ngram_novelty_counts_distinct_grams_once(spark):
    # a doc repeating one trigram: counted once (distinct), still novel
    df = spark.createDataFrame([(7, "x y z x y z x y z")], DOC_SCHEMA)
    row = text.ngram_novelty(df).collect()[0]
    # grams: "x y z","y z x","z x y" each appearing multiple times -> 3 distinct
    assert row["n_grams"] == 3 and row["n_new"] == 3


# --- PMI keywords and Zipf profile -------------------------------------------


def test_pmi_ranking_and_min_count(spark):
    from polars_order_book_spark.operators.text import pmi_keywords

    # "zzz" is exclusive to seg x (PMI ratio = N/N_x > 1); "common" is
    # uniform (ratio ~= 1); a once-only token must be floored out
    rows = [
        (1, "zzz zzz zzz common common", "x"),
        (2, "common common common rare", "y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = pmi_keywords(df, by="lang", top_k=5, min_count=2)
    got = {(r["segment"], r["token"]): r.asDict() for r in out.collect()}
    assert ("y", "rare") not in got  # min_count floor
    zx = got[("x", "zzz")]
    assert zx["rank"] == 1  # exclusive token dominates its segment
    # ratio = (c_st * N) / (N_s * c_t) = (3 * 9) / (5 * 3) = 1.8
    assert zx["pmi_ratio"] == 27.0 / 15.0


def test_zipf_bucket_boundaries_and_mass_conservation(spark):
    from polars_order_book_spark.operators.text import zipf_profile

    # 8 distinct tokens with strictly decreasing counts -> ranks 1..8
    toks = []
    for i, t in enumerate("abcdefgh"):
        toks += [t] * (20 - i)
    df = spark.createDataFrame(
        [(1, " ".join(toks), "x")], "doc_id long, text string, lang string"
    )
    out = {r["bucket"]: r.asDict() for r in zipf_profile(df, by="lang").collect()}
    # bucket 0 = rank 1; bucket 1 = ranks 2-3; bucket 2 = ranks 4-7; 3 = rank 8
    assert {b: out[b]["n_tokens"] for b in sorted(out)} == {0: 1, 1: 2, 2: 4, 3: 1}
    assert sum(r["mass"] for r in out.values()) == len(toks)


def test_split_contamination_matrix_counts_cross_split_grams(spark):
    from polars_order_book_spark.operators.text import split_contamination_matrix

    # doc 0 -> "train" by construction of weights [1-eps...]? Instead force
    # splits via a 50/50 and check invariants rather than specific hashing.
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " + str(i % 3))
         for i in range(40)],
        "doc_id long, text string",
    )
    out = split_contamination_matrix(
        docs, weights=[0.5, 0.5], names=["train", "eval"], n=4
    ).collect()
    assert len(out) == 1 and out[0]["split"] == "eval"
    # every doc shares the long 4-gram prefix -> full contamination
    assert out[0]["n_contaminated"] == out[0]["n_docs"]
    assert out[0]["contamination_rate"] == 1.0


def test_split_contamination_rejects_unknown_train_name(spark):
    import pytest

    from polars_order_book_spark.operators.text import split_contamination_matrix

    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    with pytest.raises(ValueError, match="train_name"):
        split_contamination_matrix(
            docs, weights=[0.5, 0.5], names=["a", "b"], train_name="train"
        )

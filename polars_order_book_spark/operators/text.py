"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (SURVEY.md §2.4 — the north-star extension set):
tokenization, token counting, quality scoring, language-ID heuristic, document
fingerprinting. Every expression is a JVM-side built-in (whole-stage codegen,
no Python in the hot path) and has an exact DuckDB-SQL mirror for the
correctness oracle.

Scale: all per-row map operations — embarrassingly parallel, no shuffle; the
only shuffles appear in downstream aggregations, which Catalyst handles with
map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny deterministic stopword list shared with the SQL oracle.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

TOKEN_SPLIT_RE = r"\s+"


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of lowercased, trimmed text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), TOKEN_SPLIT_RE)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish proxy: word pieces + punctuation as separate tokens, the classic
    GPT-2 pre-tokenizer shape (letters run | digits run | single punct)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(F.lower(c), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]")).cast("long")


def stopword_count(text: Column | str) -> Column:
    toks = F.array_distinct(tokens(text))
    return F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in EN_STOPWORDS])))


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword quality signals per document."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    punct = F.length(F.regexp_replace(F.lower(t), r"[a-z0-9\s]", ""))
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        (n_chars.cast("double") / n_tokens).alias("chars_per_token"),
        (punct.cast("double") / n_chars).alias("punct_ratio"),
        stopword_count(t).cast("long").alias("n_stopwords"),
        (stopword_count(t).cast("double") / n_tokens).alias("stopword_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """N-gram-free heuristic language ID: distinct-stopword hits → 'en' tier.
    A real model would be a broadcast n-gram table; the heuristic keeps the
    operator oracle-checkable."""
    hits = stopword_count(F.col(text_col))
    pred = (
        F.when(hits >= 3, F.lit("en"))
        .when(hits >= 1, F.lit("en_maybe"))
        .otherwise(F.lit("und"))
    )
    return df.select(F.col(id_col), hits.cast("long").alias("stopword_hits"), pred.alias("lang_pred"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalization-invariant document fingerprint: md5 over the token stream
    (collapses case/whitespace variance)."""
    fp = F.md5(F.concat_ws(" ", tokens(F.col(text_col))))
    return df.select(F.col(id_col), fp.alias("fingerprint"))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Rolling-hash fingerprint sampling (winnowing-style, MOSS lineage):
    hash every k-gram, then keep positions whose hash is the minimum of the
    trailing w-window — every w-run of k-grams contributes at least one
    selected fingerprint, so partial overlaps between documents survive
    sampling. Returns (doc_id, pos, fp_hash) for selected positions.

    Relational shape: explode k-gram rows (map-only), one window min per doc
    ordered by position — shuffle scales with documents, windows are
    single-pass. The hash is the portable md5-derived hash64 (identical in
    the DuckDB oracle)."""
    from polars_order_book_spark.functions.hashing import hash64

    base = df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__toks"))
    # positional k-grams via the ONE shared n-gram rule (_token_ngrams) —
    # the same (pos, gram) rows _dup_window_positions consumes, so the
    # text rule cannot drift between fingerprinting and span-dedup
    grams = base.select(
        "doc_id", F.posexplode(_token_ngrams(F.col("__toks"), k)).alias("pos", "g")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), hash64(F.col("g")).alias("h"))
    from pyspark.sql import Window as W

    # True winnowing: each length-w window of consecutive k-grams selects its
    # argmin (lexicographic struct-min -> leftmost position on hash ties, the
    # deterministic rule both engines share); the selected set is the distinct
    # union over valid window starts. Short docs (< w grams) form one window.
    win = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    amin = F.min(F.struct(F.col("h").alias("h"), F.col("pos").alias("p"))).over(win)
    ndoc = F.count(F.lit(1)).over(W.partitionBy("doc_id"))
    starts = grams.select(
        "doc_id", "pos", amin.alias("__am"), ndoc.alias("__n")
    ).where((F.col("pos") <= F.col("__n") - w) | (F.col("pos") == 0))
    return starts.select(
        "doc_id", F.col("__am.p").alias("pos"), F.col("__am.h").alias("fp_hash")
    ).distinct()


def repetition_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 5,
) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1):
    heavily self-repeating documents are boilerplate / spam and get filtered
    before training. Returns one row per doc:

    - ``n_tokens``            token count
    - ``dup_token_frac``      fraction of token occurrences beyond each
                              token's first occurrence
    - ``top_bigram``          most frequent word bigram (ties broken by the
                              lexicographically greatest bigram — the same
                              deterministic struct-max rule in both engines)
    - ``top_bigram_frac``     fraction of token characters covered by all
                              occurrences of that bigram (naive occurrence
                              count × bigram token chars; overlaps between
                              occurrences are not de-overlapped — the
                              standard cheap measure)
    - ``dup_ngram_frac``      fraction of token characters covered by
                              occurrences-beyond-first of duplicated
                              ``ngram``-grams

    The corpus has no newlines, so the token-n-gram family stands in for
    Gopher's duplicate-line measures; all fractions use total token chars
    (sum of token lengths, whitespace excluded) as the denominator.

    Shape: n-grams come from array ``transform`` over the token array
    (map-only, no per-gram shuffle), then one explode + groupBy(doc, gram)
    with map-side partial agg, and a struct-max per doc. Shuffle volume is
    O(distinct grams) — scale-safe; no window over the full token stream.
    """
    base = df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")

    def grams_col(n: int) -> Column:
        return _token_ngrams(toks, n)

    stats = base.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("__n_distinct"),
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)).alias(
            "__tok_chars"
        ),
    )

    bigram = (
        base.select("doc_id", F.explode(grams_col(2)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max(F.struct(F.col("cnt").alias("c"), F.col("g").alias("g"))).alias("__top"))
        .select(
            "doc_id",
            F.col("__top.g").alias("top_bigram"),
            (F.col("__top.c") * (F.length("__top.g") - 1)).alias("__bg_chars"),
        )
    )

    ng = (
        base.select("doc_id", F.explode(grams_col(ngram)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("cnt"), F.first(F.length("g")).alias("glen"))
        .where(F.col("cnt") > 1)
        .groupBy("doc_id")
        .agg(
            F.sum((F.col("cnt") - 1) * (F.col("glen") - (ngram - 1))).alias("__dup_chars")
        )
    )

    out = (
        stats.join(bigram, on="doc_id", how="left")
        .join(ng, on="doc_id", how="left")
        .select(
            "doc_id",
            "n_tokens",
            ((F.col("n_tokens") - F.col("__n_distinct")).cast("double") / F.col("n_tokens")).alias(
                "dup_token_frac"
            ),
            "top_bigram",
            (
                F.coalesce(F.col("__bg_chars"), F.lit(0)).cast("double")
                / F.greatest(F.col("__tok_chars"), F.lit(1))
            ).alias("top_bigram_frac"),
            (
                F.coalesce(F.col("__dup_chars"), F.lit(0)).cast("double")
                / F.greatest(F.col("__tok_chars"), F.lit(1))
            ).alias("dup_ngram_frac"),
        )
    )
    return out


def _token_ngrams(toks: Column, n: int) -> Column:
    """Array of space-joined token ``n``-grams via array ``transform`` —
    map-only, no per-gram shuffle."""
    idx = F.when(F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )


def ngram_contamination(
    corpus: DataFrame,
    probe: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any token
    ``n``-gram with a probe (evaluation/benchmark) set — the pass every
    serious pretraining pipeline runs so test sets don't leak into training
    data. Returns one row per corpus doc:
    (doc_id, n_grams, n_matched, contaminated) where ``n_matched`` counts the
    doc's DISTINCT n-grams that appear anywhere in the probe set.

    Shape: both sides build n-grams with array ``transform`` (map-only); the
    probe's distinct gram set is broadcast (benchmark suites are
    dimension-sized by nature), the corpus side inner-joins and runs one
    groupBy(doc) with partial aggregation. If a probe ever outgrows
    broadcast, dropping the ``F.broadcast`` hint degrades gracefully to a
    shuffled equi-join on the gram string — still no nested loop.
    """
    base = corpus.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__toks")
    )
    cg = (
        base.select("doc_id", F.explode(_token_ngrams(F.col("__toks"), n)).alias("g"))
        .distinct()
    )
    pg = (
        probe.select(
            F.explode(_token_ngrams(tokens(F.col(text_col)), n)).alias("g")
        ).distinct()
    )
    hits = (
        cg.join(F.broadcast(pg), on="g", how="inner")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    stats = base.select(
        "doc_id",
        F.greatest(F.size(F.col("__toks")) - (n - 1), F.lit(0)).cast("long").alias("n_grams"),
    )
    return stats.join(hits, on="doc_id", how="left").select(
        "doc_id",
        "n_grams",
        F.coalesce(F.col("n_matched"), F.lit(0)).cast("long").alias("n_matched"),
        (F.coalesce(F.col("n_matched"), F.lit(0)) > 0).alias("contaminated"),
    )


def vocabulary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus vocabulary: per token, document frequency and total occurrence
    count — the fuel for IDF weighting, stopword discovery, and vocab pruning.
    One explode + one groupBy(token) with map-side partial agg."""
    tok = df.select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("token"))
    return tok.groupBy("token").agg(
        F.count_distinct("doc_id").alias("doc_freq"),
        F.count(F.lit(1)).alias("total_count"),
    )


def docfreq_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Unigram-LM quality proxy (the CCNet-style filter without the model):
    score each document by the mean corpus document-frequency of its tokens —
    high = common/fluent vocabulary, low = rare tokens / junk. Returns
    (doc_id, n_tokens, sum_df, df_score) with
    ``df_score = sum_df / (n_tokens · N)`` in (0, 1].

    All aggregation is INTEGER (token occurrences summed over bigint doc
    frequencies), so the result is order-independent and bit-identical across
    engines — the one double appears in a single final division. A log-prob
    variant would hit libm last-ulp divergence between JVM and DuckDB; the
    rational form keeps the operator hash-checkable.

    Shape: explode → one groupBy(token) for frequencies (|vocab| rows,
    broadcast back) → one groupBy(doc). Same scale profile as tf_idf.
    """
    tok = df.select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("token"))
    dfreq = tok.groupBy("token").agg(F.count_distinct("doc_id").alias("__df"))
    total = df.agg(F.count_distinct(F.col(id_col)).alias("__n"))
    per_doc = (
        tok.join(F.broadcast(dfreq), on="token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__df").alias("sum_df"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "n_tokens",
        "sum_df",
        (F.col("sum_df").cast("double") / (F.col("n_tokens") * F.col("__n"))).alias("df_score"),
    )


def tf_idf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    log_scale: bool = False,
) -> DataFrame:
    """Per (doc, token) TF-IDF weights: tf = in-doc count, idf from corpus
    document frequency with add-one smoothing.

    Default weight is the RATIONAL form ``tf · (N + 1) / (df + 1)`` — pure
    integer-derived arithmetic, bit-identical across engines (the usual
    ``ln`` form depends on libm rounding, which differs between JVM and
    DuckDB at the last ulp). ``log_scale=True`` switches to
    ``tf · (ln((N+1)/(df+1)) + 1)`` for conventional scaling.

    Shape: token explode → groupBy(doc, token) for tf; doc-frequency side is
    |vocabulary| rows — broadcast to the tf relation, no big-side reshuffle.
    """
    tok = df.select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    total = df.agg(F.count_distinct(F.col(id_col)).alias("__n"))
    joined = tf.join(F.broadcast(dfreq), on="token").crossJoin(F.broadcast(total))
    ratio = (F.col("__n") + 1).cast("double") / (F.col("df") + 1).cast("double")
    weight = F.col("tf") * (F.log(ratio) + 1) if log_scale else F.col("tf") * ratio
    return joined.select("doc_id", "token", "tf", weight.alias("tfidf"))


def bm25_scores(
    df: DataFrame,
    terms: "list[str]",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    log_scale: bool = False,
) -> DataFrame:
    """BM25 retrieval scores of every document against a bag of query
    ``terms`` → (doc_id, n_hits, bm25_micros long) for documents matching at
    least one term. The lexical-retrieval limb next to ``hash_embed``'s
    dense one — fuse them for hybrid search.

    Exactness contract (how the oracle hash-matches a float formula):

    * per-(doc, term) score = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/T))
      — pure IEEE +,·,/ on doubles in ONE FIXED parenthesization, which
      both engines evaluate bit-identically (unlike libm transcendentals);
      ``idf`` defaults to the RATIONAL (N+1)/(df+1) smoothing of
      :func:`tf_idf`, with ``log_scale=True`` opting into the conventional
      Lucene ln((N−df+0.5)/(df+0.5)+1) at the cost of last-ulp oracle
      divergence.
    * the per-document SUM over terms would still differ by FP addition
      order, so each term score is quantized to integer micros
      (floor(x·1e6 + 0.5) — rounds identically everywhere) and the micros
      sum EXACTLY. ``bm25_micros/1e6`` is the score with a stated 1e-6
      quantization, the ``profile_stream`` trick.

    Shape at scale: document length (dl) is one groupBy(doc) over the
    exploded tokens; tf touches ONLY rows whose token is in ``terms``
    (filter before the groupBy — the shuffle carries query-term hits, not
    the corpus); df and the 1-row corpus stats (N docs, T total tokens —
    avgdl = T/N arrives as dl·N/T to keep one divide) broadcast back.
    The 1-row cross join is the whitelisted global-normalizer pattern.
    """
    if not terms:
        raise ValueError("terms must be a non-empty list of query tokens")
    tok = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("__n"), F.sum("dl").alias("__t")
    )
    qtok = tok.where(F.col("token").isin([t.lower() for t in terms]))
    tf = qtok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = qtok.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))

    # dfreq (≤ |terms| rows) and stats (1 row) broadcast; dl is CORPUS-sized
    # — equi-join on doc_id and let AQE pick the side (tf, the query-hit
    # docs, is usually far smaller).
    joined = (
        tf.join(F.broadcast(dfreq), on="token")
        .join(dl, on="doc_id")
        .crossJoin(F.broadcast(stats))
    )
    n_d = F.col("__n").cast("double")
    df_d = F.col("df").cast("double")
    if log_scale:
        idf = F.log((n_d - df_d + F.lit(0.5)) / (df_d + F.lit(0.5)) + F.lit(1.0))
    else:
        idf = (n_d + F.lit(1.0)) / (df_d + F.lit(1.0))
    tf_d = F.col("tf").cast("double")
    dl_norm = F.col("dl").cast("double") * n_d / F.col("__t").cast("double")
    denom = tf_d + F.lit(float(k1)) * (
        F.lit(1.0 - float(b)) + F.lit(float(b)) * dl_norm
    )
    score = idf * (tf_d * F.lit(float(k1) + 1.0)) / denom
    micros = F.floor(score * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")
    return joined.select("doc_id", micros.alias("__m")).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hits"), F.sum("__m").alias("bm25_micros")
    )


# --- PII redaction -----------------------------------------------------------
#
# Patterns restricted to syntax with identical semantics in Java regex (Spark)
# and RE2 (DuckDB): literal classes, bounded repetition, \b word boundaries —
# no lookarounds, no backrefs — so the oracle can mirror the redaction
# bit-for-bit.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
)


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact emails / phone numbers / IPv4s from text — the compliance pass a
    training-data pipeline runs before anything else. Returns
    (doc_id, redacted, n_email, n_phone, n_ipv4). Pure regexp_replace /
    regexp_count chain: map-only, codegen'd, zero shuffle. Patterns apply in
    declaration order and each count is taken on the text AFTER the previous
    patterns' redactions, so counts always equal the number of tokens the
    replacement chain actually produced (an email's digits can't also count
    as a phone)."""
    red = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS:
        counts.append(F.regexp_count(red, F.lit(pat)).cast("long").alias(f"n_{name}"))
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return df.select(F.col(id_col).alias("doc_id"), red.alias("redacted"), *counts)


def clean_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    lowercase: bool = False,
) -> DataFrame:
    """Pre-tokenization normalization — the first map of every text pipeline:
    strip C0 control characters + DEL (keeping \\t \\n; C1 \\x80-\\x9F is
    deliberately left alone — its bytes overlap UTF-8 continuations, so a
    byte-class regex is not portable across engines), collapse runs of
    whitespace to single spaces, trim, and optionally casefold. Pure JVM
    regexp built-ins (whole-stage codegen, no Python); patterns restricted to
    the Java-regex ∩ RE2 dialect so the DuckDB oracle agrees byte-for-byte
    (same policy as redact_pii). Unicode NFC/NFKC normalization is
    deliberately NOT attempted with built-ins — Spark has none, and a Python
    UDF would silently tie results to the worker's unicodedata version.

    Output: (id_col, clean_text, n_chars_clean).
    """
    c = F.col(text_col)
    # control chars except tab/newline -> removed before whitespace collapse
    c = F.regexp_replace(c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    c = F.regexp_replace(c, "\\s+", " ")
    c = F.trim(c)
    if lowercase:
        c = F.lower(c)
    return df.select(
        F.col(id_col),
        c.alias("clean_text"),
        F.length(c).cast("long").alias("n_chars_clean"),
    )


def dup_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Cross-document duplicated-span statistics (the measurement half of
    exact-substring train-data dedup, Lee et al. 2022 "Deduplicating Training
    Data Makes Language Models Better"): hash every k-token window, count how
    many windows of each document also occur in at least one OTHER document.
    Returns (doc_id, n_windows, n_dup_windows, dup_fraction).

    Distinct from :func:`repetition_features` (within-doc repeats) and
    :func:`ngram_contamination` (probe-set membership): this is corpus-vs-
    itself span sharing.

    Scale shape: window hashes are map-only array transforms (no per-gram
    shuffle until the count); one groupBy(hash) computes the distinct-doc
    count per span; one shuffle join back on the hash distributes by span —
    both shuffles are linear in total tokens, no all-pairs anywhere. All
    counting is integer; the single double division happens once at the end,
    so the output is bit-identical in the DuckDB oracle.
    """
    from polars_order_book_spark.functions.hashing import hash64

    base = df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__toks"))
    grams = base.select(
        "doc_id", F.explode(_token_ngrams(F.col("__toks"), k)).alias("g")
    ).select("doc_id", hash64(F.col("g")).alias("h"))
    shared = grams.groupBy("h").agg(F.count_distinct("doc_id").alias("__docs"))
    per_doc = (
        grams.join(shared, on="h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("__docs") > 1, 1).otherwise(0)).alias("n_dup_windows"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_windows",
        F.col("n_dup_windows").cast("long").alias("n_dup_windows"),
        (F.col("n_dup_windows").cast("double") / F.col("n_windows")).alias("dup_fraction"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    q: float = 0.25,
) -> DataFrame:
    """Per-group percentile gate: keep documents whose token count reaches
    their group's q-th percentile — the "drop the shortest quartile of every
    source" curation rule, with the cutoff LEARNED per group rather than
    hardcoded globally.

    The cutoff is the discrete percentile (value at 1-based rank
    ``ceil(q·n)`` under (n_tokens, doc_id) order) — pure integer selection,
    no interpolation, so Spark and DuckDB agree bit-for-bit. q must be a
    binary fraction with denominator ≤ 2^24 (default 0.25), ENFORCED (r8
    self-review): a q like 0.07 is not FP-representable, float ceil(q·n)
    lands one rank off for some n (0.07·100 = 7.000000000000001 → rank 8),
    and docs between the two ranks would silently vanish. The rank itself
    is computed with exact integer arithmetic ((num·n + den−1) DIV den,
    the frequency.py heavy-hitters convention) so no float ever touches
    the selection.

    Scale shape: ranking is one shuffle by group (groups = sources, small
    cardinality — skew-safe because rank windows stream within partitions);
    the per-group cutoff table is tiny and broadcast back, so the fact table
    is filtered map-side without a second shuffle. At extreme per-group
    volumes swap the exact rank for approx_percentile and keep the same
    broadcast-filter shape.
    """
    from fractions import Fraction

    from pyspark.sql import Window as W

    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    frac = Fraction(q)  # exact rational value of the double
    if frac.denominator > (1 << 24):
        raise ValueError(
            f"quality_filter: q={q!r} is not a binary fraction (exact value "
            f"{frac.numerator}/{frac.denominator}) — float ceil(q*n) would "
            "shift the cutoff rank for some group sizes. Use a dyadic q "
            "(k/2^m, e.g. 0.25, 0.0625, 9/128) so the rank is integer-exact."
        )
    num, den = frac.numerator, frac.denominator

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    w = W.partitionBy("grp").orderBy("n_tokens", "doc_id")
    ranked = base.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(W.partitionBy("grp"))
    )
    cuts = ranked.groupBy("grp").agg(
        F.max(
            F.when(
                F.col("__rn")
                == F.expr(f"(({num} * __n + {den - 1}) DIV {den})").cast("int"),
                F.col("n_tokens"),
            )
        ).alias("cutoff")
    )
    return (
        base.join(F.broadcast(cuts), on="grp")
        .where(F.col("n_tokens") >= F.col("cutoff"))
        .select(
            "doc_id",
            F.col("grp").alias(group_col),
            "n_tokens",
            F.col("cutoff").cast("long").alias("cutoff"),
        )
    )


def chunk_text(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Fixed-size overlapping character chunks — the retrieval-indexing
    (RAG) layout step: each document becomes ceil((len-overlap)/stride)
    windows of ``size`` chars advancing by stride = size - overlap, so
    every position is covered and chunk boundaries overlap enough that a
    span split by one boundary is whole in a neighbor.

    Chunk count is pure INTEGER arithmetic ((len - overlap + stride - 1)
    div stride, min 1), so the expansion is engine-exact; the text never
    leaves the JVM (sequence + explode + substr — no UDF). Short documents
    yield exactly one chunk. Downstream: embed chunks, ANN-index them, and
    as-of/equi-join hits back to (doc_id, char_start) provenance.

    Scale shape: map-only expansion, output ~len/stride rows per doc — the
    same multiplier everywhere, no shuffle at all.
    """
    if size <= 0 or overlap < 0 or overlap >= size:
        raise ValueError(f"need 0 <= overlap < size, got size={size} overlap={overlap}")
    stride = size - overlap
    text = F.col(text_col)
    n = F.greatest(
        F.lit(1),
        F.expr(f"(length(`{text_col}`) - {overlap} + {stride - 1}) div {stride}"),
    )
    start = F.col("chunk_no") * F.lit(stride)
    return (
        df.select(
            F.col(id_col),
            text,
            F.explode(F.sequence(F.lit(0), (n - 1).cast("long"))).alias("chunk_no"),
        )
        .select(
            id_col,
            "chunk_no",
            start.alias("char_start"),
            text.substr(start + 1, F.lit(size)).alias("chunk"),
        )
    )


def chunk_text_udtf_class(size: int = 128, overlap: int = 32):
    """Python-UDTF chunker — the ESCAPE-HATCH formulation of
    :func:`chunk_text`, for chunking policies builtins can't express
    (sentence-boundary snapping, tokenizer-aware splits, per-row adaptive
    sizes). Returns a class for ``spark.udtf.register`` /
    ``F.udtf``; output contract matches chunk_text exactly
    (chunk_no, char_start, chunk), pinned by a parity test.

    Production guidance stays in chunk_text's docstring: when the policy IS
    expressible with sequence+explode+substr, the JVM path wins (no Python
    workers in the loop); the UDTF is for when it is not.
    """
    if size <= 0 or overlap < 0 or overlap >= size:
        raise ValueError(f"need 0 <= overlap < size, got size={size} overlap={overlap}")
    stride = size - overlap

    class ChunkUDTF:
        def eval(self, text: str):  # noqa: D102 — UDTF contract
            if text is None:
                return
            n = max(1, -(-(len(text) - overlap) // stride))
            for i in range(n):
                start = i * stride
                yield i, start, text[start:start + size]

    return ChunkUDTF


def hash_embed(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    normalize: bool = True,
) -> DataFrame:
    """Feature-hashing embeddings: each token's portable hash picks one of
    ``dim`` buckets, the vector is per-bucket token counts (optionally
    L2-normalized) — a REAL text→vector encoder with zero model weights
    (the classic hashing trick), deterministic across runs, partitionings,
    and engines. The output plugs straight into the ANN / embedding-dedup
    operators: chunk → hash_embed → LSH/IVF index is a complete,
    self-contained retrieval pipeline.

    All JVM built-ins: explode tokens → one groupBy((id, bucket)) count →
    one groupBy(id) map assembly → dense vector via
    transform(sequence, map lookup). Counts are exact BIGINTs;
    normalization is each component / sqrt(Σc²) — IEEE-deterministic.
    Rows whose text has no tokens yield the all-zero (unnormalized)
    vector rather than disappearing.

    Scale shape: two shuffles (both keyed by id after the token expansion);
    output is docs × dim — the same footprint as any embedding column.
    """
    if dim <= 0:
        raise ValueError(f"dim must be > 0, got {dim}")
    from polars_order_book_spark.functions.hashing import hash64

    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("_tok")
    ).where(F.col("_tok") != "")
    counts = (
        toks.select(id_col, F.pmod(hash64(F.col("_tok")), F.lit(dim)).alias("_d"))
        .groupBy(id_col, "_d")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    maps = counts.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("_d", "_c"))).alias("_m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.coalesce(F.element_at(F.col("_m"), d.cast("long")), F.lit(0)).cast(
            "double"
        ),
    )
    out = (
        df.select(id_col)
        .distinct()
        .join(maps, id_col, "left")
        .select(F.col(id_col), dense.alias("_v"))
    )
    if not normalize:
        return out.select(id_col, F.col("_v").alias("embedding"))
    norm = F.sqrt(
        F.aggregate(F.col("_v"), F.lit(0.0), lambda a, x: a + x * x)
    )
    unit = F.when(
        norm > 0, F.transform(F.col("_v"), lambda x: x / norm)
    ).otherwise(F.col("_v"))
    return out.select(id_col, unit.alias("embedding"))


def bigram_lm_score(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    log_scale: bool = False,
    train_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document bigram language-model familiarity — the CCNet-style
    "LM quality" signal (Wenzek et al. 2020 filter corpora with an LM score;
    this is its n-gram incarnation, trained on the corpus itself in the same
    job). Returns (doc_id, n_bigrams, lm_micros): for every adjacent token
    pair, the MLE conditional P(w2 | w1) = c(w1 w2) / c(w1 ·) over the whole
    corpus, quantized to integer micros per pair and summed EXACTLY.
    High mean (lm_micros / n_bigrams / 1e6) = text made of common
    transitions; boilerplate scores near 1e6, rare/garbled text near 0.

    Exactness contract: each pair's probability is ONE double divide of two
    integer counts (bit-identical across engines), then floor(p·1e6 + 0.5)
    micros, then integer sums — the :func:`bm25_scores` trick, with NO
    floats in the output at all. ``log_scale=True`` swaps the per-pair
    quantity for ln(p) micros (a true logprob, for perplexity work) at the
    documented cost of last-ulp libm divergence — keep oracles on the
    default rational form.

    Scale shape (100 TB): bigram extraction is a map-only zip of each
    token array with its own tail (no positional window, no shuffle);
    the model is ONE groupBy(w1, w2) with map-side partial aggregation,
    context totals are a second agg over the (small) distinct-bigram
    relation, attached there so the corpus-sized stream pays a SINGLE
    (w1, w2) equi-join; the per-doc rollup is the only other corpus
    shuffle. Nothing is ever all-pairs and nothing collects.

    Docs with < 2 tokens have no bigrams and are absent from the output
    (callers left-join if they need every id).

    ``train_df``: train the model on a DIFFERENT corpus (the held-out
    evaluation shape — counts from the train split, scores over val/test).
    Transitions never seen in training contribute 0 micros but still count
    in ``n_bigrams`` (rational mode; ``log_scale`` requires the self-trained
    case where every scored transition exists in the model — it raises
    otherwise rather than silently emitting ln(0)).
    """

    def extract_pairs(frame: DataFrame) -> DataFrame:
        toks = tokens(F.col(text_col))
        return frame.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.zip_with(
                    F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                    F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg"),
        ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    if log_scale and train_df is not None:
        raise ValueError("log_scale requires the self-trained model (train_df=None)")
    pairs = extract_pairs(df)
    train_pairs = pairs if train_df is None else extract_pairs(train_df)
    bigram_counts = train_pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    ctx_counts = bigram_counts.groupBy("w1").agg(F.sum("c2").alias("c1"))
    model = bigram_counts.join(ctx_counts, on="w1")
    p = F.col("c2").cast("double") / F.col("c1").cast("double")
    per_pair = F.log(p) if log_scale else p
    micros = F.floor(per_pair * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")
    # Left join: unseen transitions (possible only with train_df) score 0
    # micros; in the self-trained case every pair exists, so this is
    # plan-equivalent to the old inner join.
    return (
        pairs.join(model, on=["w1", "w2"], how="left")
        .select("doc_id", F.coalesce(micros, F.lit(0).cast("long")).alias("__m"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__m").alias("lm_micros"),
        )
    )


def _dup_window_positions(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(doc_id, pos) of every k-token window whose gram occurs in >= 2
    documents — shared by :func:`dup_span_cuts` (interval report) and
    :func:`apply_span_cuts` (text rewrite) so both adjudicate the identical
    window set."""
    from polars_order_book_spark.functions.hashing import hash64

    base = df.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__toks"))
    grams = base.select(
        "doc_id",
        F.posexplode(_token_ngrams(F.col("__toks"), k)).alias("pos", "g"),
    ).select("doc_id", "pos", hash64(F.col("g")).alias("h"))
    shared = (
        grams.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("__docs"))
        .where(F.col("__docs") > 1)
        .select("h")
    )
    return grams.join(shared, on="h").select("doc_id", "pos")


def dup_span_cuts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """The REMOVAL half of exact-substring dedup (Lee et al. 2022): the
    merged token intervals of every document that are covered by a k-token
    window occurring in at least one OTHER document — the concrete cut list
    a pipeline applies, where :func:`dup_span_stats` only measures. Returns
    (doc_id, start_tok, end_tok_excl, n_windows): maximal intervals built by
    merging overlapping/adjacent duplicated windows (gap > k tokens starts a
    new interval), all-integer output.

    Scale shape: window hashes are map-only array transforms; one
    groupBy(hash) finds spans shared across documents (map-side partial
    count_distinct); the hash join back touches only duplicated windows; the
    interval merge is a per-document window over that document's OWN
    duplicated positions (bounded by document length — never a corpus-wide
    sort). Linear in total tokens, no all-pairs anywhere.
    """
    from pyspark.sql import Window

    dup = _dup_window_positions(df, text_col, id_col, k)
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.lag("pos").over(w).isNull() | ((F.col("pos") - F.lag("pos").over(w)) > k),
        F.lit(1),
    ).otherwise(F.lit(0))
    seg = dup.withColumn(
        "__seg",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        seg.groupBy("doc_id", "__seg")
        .agg(
            F.min("pos").cast("long").alias("start_tok"),
            (F.max("pos") + k).cast("long").alias("end_tok_excl"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select("doc_id", "start_tok", "end_tok_excl", "n_windows")
    )


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    smoothing: int = 1,
    log_scale: bool = False,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
    arXiv:2302.03169): score every raw document by how target-like its
    hashed n-gram features are. Features are unigrams + bigrams hashed into
    ``n_buckets``; bucket distributions are estimated on the raw corpus
    (``df``) and the ``target`` sample; each document scores
    Σ_features m(bucket) where m is the per-bucket importance ratio
    (add-``smoothing`` Laplace), quantized to integer micros. Returns
    (doc_id, n_features, dsir_micros) — rank by dsir_micros/n_features and
    resample top-heavy to shift the corpus toward the target domain.

    Exactness contract: the per-bucket ratio is
    ((t_b + s)·(R + s·B)) / ((r_b + s)·(T + s·B)) — every factor an exact
    small integer in double, ONE multiply each side, ONE divide, then micros
    — bit-identical across engines; per-doc sums are integer. The paper's
    log-ratio form is ``log_scale=True`` (last-ulp libm caveat on B bucket
    values — keep oracles on the rational default).

    Scale shape (100 TB): feature extraction is the map-only token/bigram
    explode; both distributions are ONE groupBy(bucket) each with map-side
    partials and ≤ n_buckets output rows; the model is a B-row broadcast
    joined back to the per-doc feature stream; the only corpus-sized
    shuffles are the bucket counts and the per-doc rollup. The target sample
    is typically tiny (the paper uses ~100k docs) — its scan cost is noise.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be > 0, got {n_buckets}")
    from polars_order_book_spark.functions.hashing import hash64

    def features(frame: DataFrame) -> DataFrame:
        toks = tokens(F.col(text_col))
        bigrams = F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        return frame.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.concat(toks, bigrams)).alias("f"),
        ).select("doc_id", F.pmod(hash64(F.col("f")), F.lit(n_buckets)).alias("b"))

    raw_f = features(df)
    tgt_f = features(target)
    raw_counts = raw_f.groupBy("b").agg(F.count(F.lit(1)).alias("r_b"))
    tgt_counts = tgt_f.groupBy("b").agg(F.count(F.lit(1)).alias("t_b"))
    raw_total = raw_f.agg(F.count(F.lit(1)).alias("__R"))
    tgt_total = tgt_f.agg(F.count(F.lit(1)).alias("__T"))
    s = int(smoothing)
    model = (
        raw_counts.join(tgt_counts, on="b", how="left")
        .withColumn("t_b", F.coalesce(F.col("t_b"), F.lit(0)))
        .crossJoin(F.broadcast(raw_total))
        .crossJoin(F.broadcast(tgt_total))
    )
    num = (F.col("t_b") + F.lit(s)).cast("double") * (
        F.col("__R") + F.lit(s * n_buckets)
    ).cast("double")
    den = (F.col("r_b") + F.lit(s)).cast("double") * (
        F.col("__T") + F.lit(s * n_buckets)
    ).cast("double")
    ratio = num / den
    per_bucket = F.log(ratio) if log_scale else ratio
    model = model.select(
        "b", F.floor(per_bucket * F.lit(1_000_000.0) + F.lit(0.5)).cast("long").alias("__m")
    )
    return (
        raw_f.join(model, on="b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum("__m").alias("dsir_micros"),
        )
    )


def apply_span_cuts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """APPLY exact-substring dedup (Lee et al. 2022): rewrite every document
    with its cross-document duplicated k-token spans removed. Returns
    (doc_id, clean_text, n_tokens, n_removed) — every input document appears,
    fully-duplicated ones with clean_text = '' — where the removed token set
    is exactly the union of :func:`dup_span_cuts`' intervals (shared window
    detection, pinned by test).

    Scale shape: covered token positions come from exploding k offsets per
    duplicated window (k rows each — bounded, and only for DUPLICATED
    windows); surviving tokens anti-join on (doc, pos); reassembly is a
    per-document groupBy whose sort is an in-row array_sort over that
    document's own tokens (never a corpus-wide order). Everything shuffles
    on doc_id or gram hash — linear, no all-pairs.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__toks")
    )
    toks = base.select(
        "doc_id", F.posexplode(F.col("__toks")).alias("pos", "tok")
    )
    dup = _dup_window_positions(df, text_col, id_col, k)
    covered = dup.select(
        "doc_id",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))).alias("pos"),
    ).distinct()
    kept = toks.join(covered, on=["doc_id", "pos"], how="left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, tok))),"
            " x -> x.tok), ' ')"
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    totals = base.select("doc_id", F.size("__toks").cast("long").alias("n_tokens"))
    return (
        totals.join(rebuilt, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("__n_kept"), F.lit(0))).cast("long").alias("n_removed"),
        )
    )


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher/MassiveWeb document-quality rules (Rae et al. 2021, appendix
    A1.1) as one map-only pass: per-document rule measurements, one boolean
    per published rule, and the conjunctive ``keep``.

    Rules (remove the document when violated):
      * word count outside [min_words, max_words]
      * mean word length outside [3, 10] characters
      * symbol-to-word ratio > 0.1 for '#' or for ellipsis ('...' / '…')
      * > 90% of lines start with a bullet ('•', '*', '-')
      * > 30% of lines end with an ellipsis
      * < 80% of words contain at least one alphabetic character
      * fewer than 2 of the 8 Gopher stop words present

    Engine-exactness: occurrence counts use replace()-length arithmetic
    (no regexp_count — DuckDB lacks it), every ratio is one IEEE double
    division of exact integers, and thresholds compare against double
    literals — so the oracle hash-matches bit-for-bit. Scale shape: pure
    projection, no shuffle, no Python; Catalyst keeps it in one
    WholeStageCodegen span over the scan.
    """
    t = F.col(text_col)
    words = tokens(t)
    lines = F.split(t, "\n")
    n_words = F.size(words)
    n_lines = F.size(lines)
    sum_word_len = F.aggregate(
        F.transform(words, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    n_hash = F.length(t) - F.length(F.expr(f"replace({text_col}, '#', '')"))
    n_ellipsis = (
        (F.length(t) - F.length(F.expr(f"replace({text_col}, '...', '')")))
        / F.lit(3)
    ).cast("long") + (
        F.length(t) - F.length(F.expr(f"replace({text_col}, '…', '')"))
    )
    n_bullet_lines = F.size(
        F.filter(lines, lambda l: F.ltrim(l).rlike(r"^[•*-]"))
    )
    n_ellipsis_lines = F.size(
        F.filter(
            lines,
            lambda l: F.rtrim(l).endswith("...") | F.rtrim(l).endswith("…"),
        )
    )
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(words), F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
        )
    )
    base = df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        (sum_word_len.cast("double") / n_words).alias("mean_word_len"),
        (n_hash.cast("double") / n_words).alias("hash_ratio"),
        (n_ellipsis.cast("double") / n_words).alias("ellipsis_ratio"),
        (n_bullet_lines.cast("double") / n_lines).alias("bullet_line_frac"),
        (n_ellipsis_lines.cast("double") / n_lines).alias("ellipsis_line_frac"),
        (n_alpha_words.cast("double") / n_words).alias("alpha_word_frac"),
        stop_hits.cast("long").alias("n_stopword_hits"),
    )
    rules = {
        "ok_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "ok_mean_word_len": (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0),
        "ok_symbol_ratio": (F.col("hash_ratio") <= 0.1)
        & (F.col("ellipsis_ratio") <= 0.1),
        "ok_bullet_lines": F.col("bullet_line_frac") <= 0.9,
        "ok_ellipsis_lines": F.col("ellipsis_line_frac") <= 0.3,
        "ok_alpha_words": F.col("alpha_word_frac") >= 0.8,
        "ok_stopwords": F.col("n_stopword_hits") >= 2,
    }
    out = base
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("keep", keep)


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty against everything EARLIER in the corpus:
    the fraction of a document's distinct n-grams whose first owner (minimum
    doc id over the whole corpus) is the document itself. Novelty 1.0 = all
    its n-grams are first seen here; 0.0 = pure recombination of earlier
    text. The dataset-curation signal behind "n-gram overlap with earlier
    dumps" dedup policies and memorization audits — computed corpus-wide in
    one pass rather than per-pair.

    Documents with fewer than ``n`` tokens contribute no n-grams and emit no
    row (inner semantics, documented contract).

    Scale shape: the exploded distinct (gram, doc) relation is the same size
    class as the docfreq/tf-idf relations already shipped. First ownership is
    a grams-keyed HASH AGGREGATE (min doc id — map-side partial combine
    applies), NOT a gram window: the window formulation (first shipped here)
    sorts the entire exploded relation per gram partition and re-emits every
    row, where the aggregate emits one row per DISTINCT gram and the winners
    then roll up by owner into a docs-sized relation — measured 8.3 s → 3.4 s
    exec at sf0.1, and at 100 TB the difference is a full-relation sort vs a
    combinable hash agg. The per-doc denominator is one map-side-partial
    groupBy; the final join is docs-sized on both sides.
    """
    from polars_order_book_spark.functions.runtime import fan_out_for_compute

    if n <= 0:
        raise ValueError(f"n must be > 0, got {n}")
    grams = (
        fan_out_for_compute(df.select(F.col(id_col).alias("doc_id"), F.col(text_col)))
        .select(
            "doc_id",
            F.explode(F.array_distinct(_token_ngrams(tokens(F.col(text_col)), n))).alias(
                "gram"
            ),
        )
    )
    # one gram-keyed agg (partial combine) -> one owner rollup: n_new per doc
    new_counts = (
        grams.groupBy("gram")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    # NOT a map-only size(array_distinct(...)) projection: Catalyst pushes
    # the >0 filter into the same stage and re-evaluates the whole ngram
    # lambda chain per row (no CSE across filter+project) — measured 22.7 s
    # vs 7.5 s for this shape at sf0.1
    totals = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        totals.join(new_counts, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.coalesce(F.col("n_new"), F.lit(0)).cast("long").alias("n_new"),
            (
                F.coalesce(F.col("n_new"), F.lit(0)).cast("double") / F.col("n_grams")
            ).alias("novelty"),
        )
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_postings: int = 8,
) -> DataFrame:
    """Inverted index with CAPPED posting lists: per token, document
    frequency, total term frequency, and the first ``max_postings`` doc ids
    (ascending) as a comma-joined string. The retrieval-side artifact that
    BM25/tf-idf (above) score against.

    The cap is the 100 TB design point: a stop-word's full posting list is
    O(corpus) and would make the token's output row unboundedly wide — a
    classic skew bomb. Capping bounds every output row at ``max_postings``
    ids while ``doc_freq``/``total_tf`` stay exact, which is what query
    planners actually need (full lists belong sharded across rows, not inside
    one). ``collect_list`` feeds ``array_sort`` + ``slice``, so the
    nondeterministic collection order never reaches the output. One explode →
    one (doc, token) pre-agg → one groupBy(token); the pre-agg collapses
    per-doc repeats BEFORE the token shuffle, so the wide exchange carries at
    most one row per (doc, token).
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    per_doc = tok.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return per_doc.groupBy("token").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.sum("tf").alias("total_tf"),
        F.concat_ws(
            ",",
            F.slice(F.array_sort(F.collect_list(F.col("doc_id"))), 1, max_postings).cast(
                "array<string>"
            ),
        ).alias("postings_head"),
    )


def oov_rate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    vocab_size: int = 16,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus' own top-
    ``vocab_size`` tokens by document frequency (ties broken by token asc —
    a total, engine-portable order). The tokenizer-coverage signal a
    pretraining mix needs before committing to a fixed vocab: documents with
    high OOV under the candidate vocab will fragment into long byte
    fallbacks. Returns (doc_id, n_tokens, n_oov, oov_rate).

    Shape: one groupBy(token) builds the frequency table; rank + limit keeps
    ``vocab_size`` rows — a BROADCAST relation, so the per-doc pass is a
    map-only left join + one groupBy(doc). Counting is all-integer; the one
    double is the final division.
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    dfreq = tok.groupBy("token").agg(F.count_distinct("doc_id").alias("__df"))
    vocab = (
        dfreq.orderBy(F.col("__df").desc(), F.col("token"))
        .limit(vocab_size)
        .select("token", F.lit(True).alias("__in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), on="token", how="left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens")).alias("oov_rate"),
        )
    )


# --- corpus keyword statistics: PMI and Zipf profile -------------------------


def pmi_keywords(
    df: DataFrame,
    *,
    by: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 10,
    min_count: int = 5,
) -> DataFrame:
    """Distinctive terms per segment via pointwise mutual information — the
    corpus-diagnostics op behind "what vocabulary characterizes this
    domain/language slice" (domain signatures, mixture auditing, topic
    drift alarms).

    PMI(seg, tok) = log[ p(tok|seg) / p(tok) ] = log[ (c_st · N) / (N_s · c_t) ].
    log is monotone, so ranking by the RATIO is ranking by PMI — and the
    ratio is hash-checkable across engines (two exact decimal integer
    products, each cast to double with IEEE correct rounding, one double
    division) where log itself would hit libm last-ulp divergence. The
    caller applies log for display; this operator stays exact.

    Returns the per-segment top_k by (ratio desc, token asc):
    (segment, token, n_seg_tok, n_tok, pmi_ratio, rank). ``min_count``
    floors c_st, killing the rare-token PMI explosion (a token seen once in
    one segment has maximal PMI and zero value — the standard correction).

    Scale shape: one explode; two map-side-partial groupBys (seg×vocab and
    vocab); totals are segments-sized (broadcast); final rank is a window
    over the seg×vocab counts — vocabulary-sized, never corpus-sized.
    """
    if top_k < 1 or min_count < 1:
        raise ValueError(f"need top_k >= 1, min_count >= 1; got {top_k}, {min_count}")
    seg = F.col(by)
    tok = df.select(
        seg.alias("segment"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    c_st = tok.groupBy("segment", "token").agg(F.count(F.lit(1)).alias("n_seg_tok"))
    c_t = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n_tok"))
    n_s = tok.groupBy("segment").agg(F.count(F.lit(1)).alias("__n_seg"))
    n = tok.agg(F.count(F.lit(1)).alias("__n_total"))
    # decimal(19,0) factors → decimal(38,0) product in BOTH Spark and DuckDB
    # (38×38 would overflow DuckDB's width-38 cap); counts stay < 1e19 far
    # beyond 100 TB corpora.
    dec = "decimal(19,0)"
    num = (F.col("n_seg_tok").cast(dec) * F.col("__n_total").cast(dec)).cast("double")
    den = (F.col("__n_seg").cast(dec) * F.col("n_tok").cast(dec)).cast("double")
    scored = (
        c_st.where(F.col("n_seg_tok") >= min_count)
        .join(F.broadcast(c_t), on="token")
        .join(F.broadcast(n_s), on="segment")
        .crossJoin(F.broadcast(n))
        .withColumn("pmi_ratio", num / den)
    )
    w = Window.partitionBy("segment").orderBy(
        F.col("pmi_ratio").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            "segment",
            "token",
            "n_seg_tok",
            "n_tok",
            "pmi_ratio",
            F.col("rank").cast("long").alias("rank"),
        )
    )


ZIPF_MAX_BUCKET = 20


def zipf_profile(
    df: DataFrame,
    *,
    by: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Zipf rank-frequency profile per segment: total token mass per
    power-of-two rank bucket. For each segment, rank tokens by (count desc,
    token asc); bucket b holds ranks [2^b, 2^(b+1)) for b in 0..19, with
    b = 20 a catch-all tail. An ideal Zipf (count ∝ 1/rank) puts ~equal
    mass in every doubling bucket, so the profile is a one-glance corpus
    health check — head-heavy (boilerplate dup) and tail-heavy (tokenizer
    junk, encoding noise) corpora both show up immediately, and the output
    is exact integers (no libm log fit — the slope estimate, if wanted, is
    a client-side regression over these 21 rows).

    Returns (segment, bucket, n_tokens, mass): distinct-token count and
    summed occurrence count per bucket.

    Scale shape: explode → groupBy(segment, token) with map-side partial;
    the rank window runs over the VOCABULARY relation (|segments|·|vocab|
    rows — ≪ corpus), partitioned by segment; final groupBy is 21·|segments|
    rows. The bucket map is a constant CASE chain — whole-stage codegen,
    no log().
    """
    tok = df.select(
        F.col(by).alias("segment"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    counts = tok.groupBy("segment", "token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("segment").orderBy(F.col("n").desc(), F.col("token").asc())
    ranked = counts.withColumn("rank", F.row_number().over(w))
    bucket = F.lit(ZIPF_MAX_BUCKET)
    for b in range(ZIPF_MAX_BUCKET - 1, -1, -1):
        bucket = F.when(F.col("rank") < F.lit(2 ** (b + 1)), F.lit(b)).otherwise(bucket)
    return (
        ranked.withColumn("bucket", bucket.cast("long"))
        .groupBy("segment", "bucket")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("n").alias("mass"))
    )


def split_contamination_matrix(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: "list[float]" = None,
    names: "list[str]" = None,
    train_name: str = "train",
    n: int = 8,
    salt: str = "",
) -> DataFrame:
    """Cross-split leakage matrix: after deterministic split assignment, how
    many EVAL-split documents share a token n-gram with ANY train document?
    This is the audit that proves (or disproves) the train/eval wall a
    hash-keyed split promises — near-duplicate documents hash to different
    splits unless the split key is a near-dup component id (see
    dedup.leakage_split), and this matrix is how that failure is measured.

    Returns one row per non-train split:
    ``(split, n_docs, n_contaminated, contamination_rate)`` — docs counted
    over ALL split members (zero-gram docs can never be contaminated but
    belong in the denominator).

    Scale shape: split labels are a map-only hash projection
    (sampling.split_assign); both gram sides are array-transform + explode +
    DISTINCT (map-side partial); the gram match is a plain shuffled
    equi-join on the gram string — the TRAIN side is corpus-sized, so no
    broadcast hint (the reverse of ngram_contamination, whose probe side is
    benchmark-sized); the rollup is splits-sized. Stop-gram skew is bounded
    by the DISTINCT-per-doc pre-agg.
    """
    from polars_order_book_spark.operators.sampling import split_assign

    if weights is None:
        weights = [0.9, 0.05, 0.05]
    if names is None:
        names = ["train", "val", "test"]
    if train_name not in names:
        raise ValueError(f"train_name {train_name!r} not in names {names}")
    from polars_order_book_spark.functions.runtime import fan_out_for_compute

    labeled = fan_out_for_compute(
        split_assign(df, id_col, weights, names, salt=salt).select(
            F.col(id_col).alias("doc_id"),
            tokens(F.col(text_col)).alias("__toks"),
            "split",
        )
    )
    train_grams = (
        labeled.where(F.col("split") == train_name)
        .select(F.explode(_token_ngrams(F.col("__toks"), n)).alias("g"))
        .distinct()
    )
    eval_docs = labeled.where(F.col("split") != train_name)
    eval_grams = eval_docs.select(
        "doc_id", "split", F.explode(_token_ngrams(F.col("__toks"), n)).alias("g")
    ).distinct()
    hit_docs = (
        eval_grams.join(train_grams, "g")
        .select("doc_id", "split")
        .distinct()
    )
    per_split = eval_docs.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))
    hits = hit_docs.groupBy("split").agg(F.count(F.lit(1)).alias("n_contaminated"))
    return (
        per_split.join(hits, "split", "left")
        .select(
            "split",
            "n_docs",
            F.coalesce(F.col("n_contaminated"), F.lit(0)).alias("n_contaminated"),
            (
                F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("double")
                / F.col("n_docs").cast("double")
            ).alias("contamination_rate"),
        )
    )

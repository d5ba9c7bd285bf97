"""Unigram (SentencePiece-shaped) subword tokenizer: corpus-derived integer
piece costs + EXACT min-cost Viterbi segmentation.

BPE (operators/bpe.py) covers the merge-table family; this covers the other
major subword family, where a word's segmentation is chosen globally over a
piece VOCABULARY rather than built by local merges. Production SentencePiece
scores pieces with EM-trained log-probabilities; this implementation uses an
integer surrogate — ``cost(piece) = bits(max_count) - bits(count) + 1``
(``bits(n)`` = length of n's binary representation, a floor(log2)+1 both
engines compute without libm) — so the whole model and the DP over it stay
engine-exact and the tokenization is oracle-checkable bit-for-bit, the
repo-wide discipline. The EM refinement changes only the cost table, not the
machinery; the cost column is the injection point.

Pieces = every single character (guaranteed segmentability) plus the top-K
multi-character substrings by corpus-weighted occurrence count. Viterbi
minimizes the LEXICOGRAPHIC objective (total cost, then piece count),
encoded as ``cost * 2^20 + pieces`` — a single BIGINT both engines minimize
identically (valid while a word has < 2^20 pieces, i.e. always).

Scale shape: vocabulary construction is one substring explode (bounded ×
max_piece_len² per word char) + a counted groupBy; the model is vocab-sized
and ships in the tokenizer's closure like BPE merge ranks; tokenization is
``mapInPandas`` with per-batch distinct-word caching (the apply_bpe shape) —
no shuffle, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COMBINE = 1 << 20  # lexicographic (cost, n_pieces) encoding multiplier


def _register_self_by_value() -> None:
    import sys

    from pyspark import cloudpickle

    mod = sys.modules.get(__name__)
    if mod is not None:
        try:
            cloudpickle.register_pickle_by_value(mod)
        except Exception:
            pass


_register_self_by_value()


def unigram_vocab(
    df: DataFrame,
    text_col: str = "text",
    *,
    max_piece_len: int = 4,
    top_multi: int = 50,
) -> DataFrame:
    """(piece, n, cost): every single character plus the ``top_multi``
    multi-char substrings (length <= max_piece_len) by corpus-weighted
    occurrence count (ALL occurrences, overlapping), with the integer
    bit-length cost. Ties in the top-K break on (n desc, piece asc) — a
    total order both engines share. The 1-row max-count aggregate broadcasts
    (the text_tfidf global-normalizer pattern)."""
    if max_piece_len < 2:
        raise ValueError(f"max_piece_len must be >= 2, got {max_piece_len}")
    if top_multi < 0:
        raise ValueError(f"top_multi must be >= 0, got {top_multi}")
    from polars_order_book_spark.operators.bpe import word_frequencies

    wf = word_frequencies(df, text_col)
    # one struct per (start, len) pair, exploded JVM-side
    sub_expr = (
        f"filter(flatten(transform(sequence(1, length(word)), i -> "
        f"transform(sequence(1, {max_piece_len}), l -> "
        f"named_struct('p', CASE WHEN i + l - 1 <= length(word) "
        f"THEN substring(word, i, l) END)))), x -> x.p IS NOT NULL)"
    )
    subs = (
        wf.select("freq", F.explode(F.expr(sub_expr)).alias("s"))
        .groupBy(F.col("s.p").alias("piece"))
        .agg(F.sum("freq").alias("n"))
    )
    subs = subs.localCheckpoint(eager=False)  # feeds chars, top-K, and max
    chars = subs.where(F.length("piece") == 1)
    multi = (
        subs.where(F.length("piece") > 1)
        .orderBy(F.col("n").desc(), F.col("piece"))
        .limit(top_multi)
    )
    mx = subs.agg(F.max("n").alias("__mx"))
    return (
        chars.unionByName(multi)
        .crossJoin(F.broadcast(mx))
        .select(
            "piece",
            "n",
            (F.length(F.bin(F.col("__mx"))) - F.length(F.bin(F.col("n"))) + 1)
            .cast("long")
            .alias("cost"),
        )
    )


def viterbi_segment(
    word: str, costs: "dict[str, int]", max_piece_len: int = 4
) -> "tuple[int, list[str]]":
    """Exact min-(cost, n_pieces) segmentation of one word. Returns
    (combined_cost, pieces) with combined = total_cost * COMBINE + n_pieces.
    Backtracking prefers the SHORTEST last piece among optimal predecessors
    (a fixed, documented tie-break for the piece LIST; the combined cost is
    unique regardless). Raises if the word is unsegmentable (a character
    missing from the vocab — the caller's contract is chars-complete)."""
    n = len(word)
    best: "list[int | None]" = [None] * (n + 1)
    back: "list[int]" = [0] * (n + 1)
    best[0] = 0
    for i in range(1, n + 1):
        for j in range(1, min(max_piece_len, i) + 1):
            c = costs.get(word[i - j:i])
            if c is None or best[i - j] is None:
                continue
            cand = best[i - j] + c * COMBINE + 1
            if best[i] is None or cand < best[i] or (cand == best[i] and j < back[i]):
                best[i], back[i] = cand, j
    if best[n] is None:
        raise ValueError(f"unsegmentable word {word!r}: vocab lacks a character")
    pieces: "list[str]" = []
    i = n
    while i > 0:
        pieces.append(word[i - back[i]:i])
        i -= back[i]
    pieces.reverse()
    return best[n], pieces


def unigram_tokenize(
    df: DataFrame,
    vocab: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 4,
    max_vocab_rows: int = 1_000_000,
) -> DataFrame:
    """Tokenize text with a (piece, cost) vocabulary → ``(id_col, n_pieces,
    total_cost, pieces)``. The vocabulary is collected driver-side under the
    same fail-fast cap as the BPE trainer (models are corpus-independent
    sized) and ships in the mapInPandas closure; each Arrow batch
    deduplicates words so Viterbi runs once per DISTINCT word per batch.
    Word splitting matches the trainer's tokenizer exactly (Java ``\\s``,
    the apply_bpe convention)."""
    import re

    import pandas as pd

    if vocab.limit(max_vocab_rows + 1).count() > max_vocab_rows:
        raise ValueError(
            f"vocabulary exceeds max_vocab_rows={max_vocab_rows}; prune "
            "pieces (top_multi) before tokenizing"
        )
    costs = {r["piece"]: int(r["cost"]) for r in vocab.select("piece", "cost").collect()}
    java_ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def run(batches):
        for pdf in batches:
            cache: dict = {}
            n_out, c_out, p_out = [], [], []
            for t in pdf[text_col].fillna(""):
                words = [w for w in java_ws.split(str(t).strip(" ").lower()) if w]
                tot_c, tot_n, doc_pieces = 0, 0, []
                for w in words:
                    got = cache.get(w)
                    if got is None:
                        got = viterbi_segment(w, costs, max_piece_len)
                        cache[w] = got
                    combined, pieces = got
                    tot_c += combined // COMBINE
                    tot_n += combined % COMBINE
                    doc_pieces.extend(pieces)
                n_out.append(tot_n)
                c_out.append(tot_c)
                p_out.append(doc_pieces)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_pieces": pd.Series(n_out, dtype="int64"),
                    "total_cost": pd.Series(c_out, dtype="int64"),
                    "pieces": p_out,
                }
            )

    from pyspark.sql.types import (
        ArrayType, LongType, StringType, StructField, StructType,
    )

    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("n_pieces", LongType(), True),
            StructField("total_cost", LongType(), True),
            StructField("pieces", ArrayType(StringType()), True),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(run, out_schema)

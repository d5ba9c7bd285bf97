"""Rank fusion for hybrid retrieval.

Lexical retrieval (``text.bm25_scores``) and dense retrieval
(``text.hash_embed`` → ``similarity.cosine_topk_*``) each produce a ranked
candidate list; production search fuses them. Reciprocal-rank fusion
(Cormack/Clarke/Buettcher, SIGIR'09) is the standard score-free combiner:
``rrf(d) = Σ_sources 1/(k + rank_source(d))`` with missing-source terms
dropped — robust to incomparable score scales, which is exactly the
lexical-vs-cosine situation.

Exactness: fusion consumes RANKS (integers), not scores, so the only float
arithmetic is the fixed left-to-right sum of ``1/(k + rank)`` terms —
IEEE-deterministic in both engines when the oracle writes the same
parenthesization (and casts its literals to DOUBLE; DuckDB decimal literals
would divide differently).

Scale contract: ranking uses a GLOBAL window (score desc, id asc), which is
single-task — correct here because retrieval outputs are CANDIDATE lists
(top-k or query-term hits), orders of magnitude smaller than the corpus;
the corpus-sized work already happened inside the retrieval operators. Do
not point this at a corpus-sized relation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    sources: "Sequence[tuple[str, DataFrame, str, str]]",
    *,
    id_col: str = "doc_id",
    k: int = 60,
) -> DataFrame:
    """Fuse ranked candidate lists → (id_col, rank_<name>..., rrf double).

    ``sources``: tuples of (name, df, kind, col) where kind is ``"rank"``
    (col is an existing 1-based rank) or ``"score"`` (rank is derived as
    row_number over score DESC with id ASC tie-break — deterministic across
    engines). Documents missing from a source contribute nothing for it
    (standard RRF). Output contains every document present in at least one
    source. ``k`` is the RRF damping constant (60 in the original paper).
    """
    if not sources:
        raise ValueError("sources must be non-empty")
    ranked = []
    for name, df, kind, col in sources:
        rcol = f"rank_{name}"
        if kind == "rank":
            r = df.select(F.col(id_col), F.col(col).cast("long").alias(rcol))
        elif kind == "score":
            w = Window.orderBy(F.col(col).desc(), F.col(id_col).asc())
            r = df.select(
                F.col(id_col), F.row_number().over(w).cast("long").alias(rcol)
            )
        else:
            raise ValueError(f"kind must be 'rank' or 'score', got {kind!r}")
        ranked.append(r)
    out = ranked[0]
    for r in ranked[1:]:
        out = out.join(r, on=id_col, how="full_outer")
    # fixed left-to-right sum so the oracle's identical parenthesization
    # reproduces the double bit-for-bit
    rrf = None
    for name, *_ in sources:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(k) + F.col(f"rank_{name}")).cast("double"),
            F.lit(0.0),
        )
        rrf = term if rrf is None else (rrf + term)
    return out.select(
        id_col, *[f"rank_{name}" for name, *_ in sources], rrf.alias("rrf")
    )

"""Generate a deterministic sfN-scale dataset from the driver's sf0.1 tables.

The driver ships sf{0.001,0.01,0.1} only; the scale spot-check (VERDICT r6
task 4) needs an order of magnitude more rows to prove the SCALE.md claims
hold off the benchmark point. This derives sfN as N/0.1 SHIFTED copies of the
sf0.1 tables — deterministic, no RNG — with per-copy perturbations chosen so
the scaled data keeps the ORIGINAL's structural properties instead of
becoming a degenerate 10x-exact-duplicate corpus:

- events: event_id interleaves copies (id*K + copy keeps the stream's
  arrival-order mix), user_id shifts by copy (10x distinct users, same
  per-user profile; the book-stream derivations in plans/book_streams.py are
  pure functions of (event_id, user_id, value), so streams stay valid by
  construction).
- documents: doc_id shifts; each copy's words are deterministically
  SHUFFLED by a per-(copy, position) md5 sort key (same vocabulary, same
  lengths, word-3-gram shingles decorrelated across copies). Two rejected
  perturbations, both measured: append-a-tag leaves every copy sharing its
  RARE shingles with 9 siblings (prefix-filter groups 10x, pair work 100x,
  232,900 result pairs — the corpus's duplication factor, not the
  operator's scaling); word ROTATION preserves the cyclic 3-gram set, so
  copies still verify at Jaccard~1 (232,790 pairs, same blowup). The
  shuffle applies ONE permutation per copy, so near-dup DOCS within a copy
  stay aligned (per-copy structure ~= the original corpus's) while
  cross-copy shingles are chance-level — total candidate work scales
  ~linearly, the property a real 10x corpus has; n_chars recomputed.
- embeddings: vec_id shifts; each copy's vector is circularly rotated by the
  copy index (norms and pairwise-distance distribution preserved, directions
  decorrelated so IVF/PQ cells fill 10x instead of 10-stacking).

Output: /root/repo/.scale/sf{N}/{events,documents,embeddings}.parquet
(only the tables the heavy families read). Usage:
  python tools/make_scale_data.py [--mult 10] [--out .scale/sf1]

--open-vocab mode (r9, VERDICT task 3): the shifted-copy corpus above keeps
the driver data's CLOSED vocabulary, so every content-keyed join key (n-gram
shingles, PassJoin segments) saturates as the corpus grows — the opposite of
a real web-scale corpus, whose vocabulary follows Heaps' law (V ~ K·n^beta).
This mode synthesizes an open-vocabulary corpus directly: each word is drawn
from an UNBOUNDED Zipf distribution via a deterministic splitmix64 hash of
(doc, position) — u = hash/2^53, rank = floor(u^(-1/s)) — so new low-rank
words keep appearing as the corpus grows, exactly the regime where segment
content selectivity is supposed to pay. Every 29th doc gets an edit-distance-1
sibling (one char prepended) so fuzzy_duplicate_pairs has true pairs to find.
Writes documents.parquet only (the one table the fuzzy family reads):
  python tools/make_scale_data.py --open-vocab --docs 4000 --out .scale/ov_base
  python tools/make_scale_data.py --open-vocab --docs 40000 --out .scale/ov_x10
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_M64 = (1 << 64) - 1


def _splitmix64(x):
    """Vectorized splitmix64 over a uint64 numpy array (deterministic)."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return x ^ (x >> 31)


def make_open_vocab(out_dir: str, n_docs: int, core_vocab: int = 5000,
                    hapax_rate: float = 0.05) -> None:
    """Deterministic Heaps-law documents table (see module docstring).

    Token distribution is a two-part mixture calibrated to real text (a
    first cut drew ranks as u^(-1/s), but unbounded-support Zipf puts >50%
    of ALL tokens on rank 1 — the resulting prefixes were so uniform that
    unrelated docs verified within edit distance 10, drowning the planted
    pairs 300:1):

    * 95% common: rank log-uniform over [1, core_vocab] — df ~ 1/rank
      (Zipf s~1 over a bounded core), top word ~8% of tokens.
    * 5% hapax tail: rank = core_vocab + 40-bit hash — effectively unique,
      so vocabulary grows with the corpus (the Heaps mechanism; real
      corpora's hapax share of running text is a few percent).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    doc_ids = np.arange(n_docs, dtype=np.uint64)
    lengths = 30 + (doc_ids % 41).astype(np.int64)  # 30..70 words
    starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lengths, out=starts[1:])
    total = int(starts[-1])
    doc_of = np.repeat(doc_ids, lengths)
    pos = np.arange(total, dtype=np.uint64) - starts[:-1].astype(np.uint64)[
        np.repeat(np.arange(n_docs), lengths)
    ]
    h = _splitmix64(doc_of * np.uint64(0x9E3779B97F4A7C15) + pos + np.uint64(1))
    u = ((h >> np.uint64(11)).astype(np.float64) + 1.0) / float(1 << 53)
    common = np.floor(np.exp(u * np.log(core_vocab))).astype(np.uint64)
    h2 = _splitmix64(h)
    is_hapax = (h2 & np.uint64(0xFFFF)).astype(np.float64) / 65536.0 < hapax_rate
    hapax = np.uint64(core_vocab) + (h2 >> np.uint64(24)) % np.uint64(1 << 40)
    ranks = np.where(is_hapax, hapax, common)
    words = np.char.add("w", ranks.astype(str))
    texts = []
    for i in range(n_docs):
        texts.append(" ".join(words[starts[i]:starts[i + 1]]))
    ids = list(range(n_docs))
    # edit-distance-1 siblings: one char PREPENDED, so the 64-char prefix
    # differs by a single insertion (well inside max_dist=10) and the byte
    # length stays in the same-or-adjacent length bucket
    sib_ids, sib_texts = [], []
    for i in range(0, n_docs, 29):
        sib_ids.append(10 * n_docs + i)
        sib_texts.append("x" + texts[i])
    all_ids = ids + sib_ids
    all_texts = texts + sib_texts
    tbl = pa.table({
        "doc_id": pa.array(all_ids, type=pa.int64()),
        "text": pa.array(all_texts, type=pa.string()),
        "lang": pa.array(["en"] * len(all_ids), type=pa.string()),
        "source": pa.array(["openvocab"] * len(all_ids), type=pa.string()),
        "n_chars": pa.array([len(t) for t in all_texts], type=pa.int64()),
    })
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"))
    vocab = len(np.unique(ranks))
    print(f"{out_dir}: {len(all_ids)} docs ({len(sib_ids)} ed-1 siblings), "
          f"{total} words, vocab={vocab} (Heaps check: grows with n)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(REPO, ".scale", "sf1"))
    ap.add_argument("--open-vocab", action="store_true",
                    help="generate the Heaps-law documents corpus instead")
    ap.add_argument("--docs", type=int, default=4000,
                    help="base doc count for --open-vocab")
    ap.add_argument("--tables", default="",
                    help="comma-separated subset of tables to generate "
                         "(default: all). Third-decade (mult=1000) sweeps "
                         "only need the fact table under test — lineitem "
                         "at 600M rows alone is ~20 GB and minutes of gen.")
    args = ap.parse_args()
    if args.open_vocab:
        make_open_vocab(args.out, args.docs)
        return
    only = {t for t in args.tables.split(",") if t} or None

    def wanted(t: str) -> bool:
        return only is None or t in only

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    k = args.mult

    if wanted("events"):
        con.execute(f"""
        COPY (
            SELECT e.event_id * {k} + c.copy AS event_id,
                   e.ts,
                   e.user_id + c.copy * 1000000 AS user_id,
                   e.event_type, e.value, e.props
            FROM read_parquet('{SRC}/events.parquet') e,
                 (SELECT unnest(range(0, {k})) AS copy) c
            ORDER BY event_id
        ) TO '{args.out}/events.parquet' (FORMAT PARQUET)
        """)
    if wanted("documents"):
        con.execute(f"""
        COPY (
            WITH base AS (
                SELECT d.doc_id + c.copy * 10000000 AS doc_id,
                       string_split(d.text, ' ') AS ws,
                       CAST(c.copy AS INT) AS cp,
                       d.lang, d.source
                FROM read_parquet('{SRC}/documents.parquet') d,
                     (SELECT unnest(range(0, {k})) AS copy) c
            ),
            rot AS (
                SELECT doc_id,
                       CASE WHEN cp = 0 OR len(ws) < 2 THEN array_to_string(ws, ' ')
                            ELSE array_to_string(list_transform(list_sort(
                                list_transform(range(1, len(ws) + 1),
                                    i -> struct_pack(
                                        k := md5(CAST(cp AS VARCHAR) || ':' || CAST(i AS VARCHAR)),
                                        w := ws[CAST(i AS INT)]))),
                                x -> x.w), ' ')
                       END AS text,
                       lang, source
                FROM base
            )
            SELECT doc_id, text, lang, source,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM rot
        ) TO '{args.out}/documents.parquet' (FORMAT PARQUET)
        """)
    if wanted("embeddings"):
        con.execute(f"""
        COPY (
            SELECT v.vec_id + c.copy * 10000000 AS vec_id,
                   CAST(list_concat(v.embedding[CAST(c.copy AS INT) + 1:],
                                    v.embedding[:CAST(c.copy AS INT)]) AS FLOAT[]) AS embedding,
                   v.label
            FROM read_parquet('{SRC}/embeddings.parquet') v,
                 (SELECT unnest(range(0, {k})) AS copy) c
        ) TO '{args.out}/embeddings.parquet' (FORMAT PARQUET)
        """)
    # TPC-H facts (r9, so the sf1 sweep can cover the relational plans):
    # orders/lineitem grow 10x with INTERLEAVED orderkeys (same arrival mix);
    # the orders<->lineitem FK is preserved copy-by-copy. Dimension keys
    # (cust/part/supp) are left unchanged — dims stay original-size while
    # facts grow, which is exactly the big-fact/broadcast-dim shape the
    # 100 TB plans assume.
    if wanted("orders"):
        con.execute(f"""
        COPY (
            SELECT o.o_orderkey * {k} + c.copy AS o_orderkey,
                   o.* EXCLUDE (o_orderkey)
            FROM read_parquet('{SRC}/orders.parquet') o,
                 (SELECT unnest(range(0, {k})) AS copy) c
            ORDER BY o_orderkey
        ) TO '{args.out}/orders.parquet' (FORMAT PARQUET)
        """)
    if wanted("lineitem"):
        con.execute(f"""
        COPY (
            SELECT l.l_orderkey * {k} + c.copy AS l_orderkey,
                   l.* EXCLUDE (l_orderkey)
            FROM read_parquet('{SRC}/lineitem.parquet') l,
                 (SELECT unnest(range(0, {k})) AS copy) c
            ORDER BY l_orderkey
        ) TO '{args.out}/lineitem.parquet' (FORMAT PARQUET)
        """)
    for t in ("region", "nation", "customer", "supplier", "part"):
        if wanted(t):
            con.execute(f"""
                COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))
                TO '{args.out}/{t}.parquet' (FORMAT PARQUET)
            """)
    for t in ("events", "documents", "embeddings", "orders", "lineitem"):
        if not wanted(t):
            continue
        n = con.sql(f"SELECT count(*) FROM read_parquet('{args.out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()

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
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(REPO, ".scale", "sf1"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    k = args.mult

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
    for t in ("events", "documents", "embeddings"):
        n = con.sql(f"SELECT count(*) FROM read_parquet('{args.out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()

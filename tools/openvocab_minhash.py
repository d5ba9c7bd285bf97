"""Measure MinHash-LSH dedup (pairs + components) on the OPEN-vocabulary
(Heaps-law) corpus at base and 10x — the discriminating evidence for the
r10 second-decade flags on `dedup_minhash_lsh` (13.95x) and
`dedup_components` (11.77x) at sf10.

Hypothesis (same mechanism the fuzzy-segments study proved in r9): the
derived sfN corpora keep the driver data's CLOSED ~31-word vocabulary, so
the 3-gram shingle universe is a fixed ~30k-element set. MinHash band keys
are functions of the shingle set; once the corpus is much larger than the
shingle universe's diversity, unrelated documents increasingly share
band-minima, bucket collision groups grow ~linearly with corpus size, and
candidate verification grows ~quadratically — a CORPUS artifact, not an
operator defect. On an open-vocabulary corpus (new rare shingles keep
appearing, Heaps' law), band-key cardinality grows with the corpus and the
collision rate stays flat, so the same operator should scale ~linearly.

Usage:
  python tools/make_scale_data.py --open-vocab --docs 40000  --out .scale/ov_mh_base
  python tools/make_scale_data.py --open-vocab --docs 400000 --out .scale/ov_mh_x10
  python tools/openvocab_minhash.py [--json BENCH_LOCAL_openvocab_minhash.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=os.path.join(REPO, ".scale", "ov_mh_base"))
    ap.add_argument("--x10", default=os.path.join(REPO, ".scale", "ov_mh_x10"))
    ap.add_argument(
        "--json", default=os.path.join(REPO, "BENCH_LOCAL_openvocab_minhash.json")
    )
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from polars_order_book_spark.operators import dedup
    from polars_order_book_spark.session import get_spark
    from polars_order_book_spark.sources.tables import load_table

    spark = get_spark("openvocab-minhash")
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, args.base, "documents").count()  # warm

    report = {
        "base_dir": args.base,
        "x10_dir": args.x10,
        "loadavg_1min_start": round(os.getloadavg()[0], 2),
        "queries": {},
    }

    def run(name, fn):
        entry = {}
        for label, d in (("base", args.base), ("x10", args.x10)):
            docs = load_table(spark, d, "documents")
            runs, n = [], None
            for _ in range(args.runs):
                t0 = time.time()
                n = fn(docs).count()
                runs.append(time.time() - t0)
            entry[label] = {
                "best_sec": round(min(runs), 3),
                "runs": [round(r, 3) for r in runs],
                "rows": n,
            }
        entry["ratio"] = round(
            entry["x10"]["best_sec"] / entry["base"]["best_sec"], 2
        )
        report["queries"][name] = entry
        print(name, json.dumps(entry), flush=True)

    run("minhash_lsh_pairs", lambda d: dedup.minhash_lsh_duplicates(d, threshold=0.5))
    run(
        "neardup_components",
        lambda d: dedup.neardup_components(
            dedup.minhash_lsh_duplicates(d, threshold=0.5)
        ),
    )

    report["loadavg_1min_end"] = round(os.getloadavg()[0], 2)
    with open(args.json, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

"""Measure fuzzy_duplicate_pairs' two candidate strategies on the OPEN-
vocabulary (Heaps-law) corpus from `make_scale_data.py --open-vocab` — the
regime the segments strategy was built for (VERDICT r8 task 3).

The closed-vocabulary synthetic corpus saturates BOTH exact strategies (the
sf1 sweep's "guarded" dispositions); on an open-vocabulary corpus the
PassJoin segment keys are CONTENT, so their cardinality grows with the corpus
and candidates stay near-linear, while the (length-bucket) grid of the
buckets strategy stays fixed and saturates quadratically. This tool measures
both at base and 10x and writes BENCH_LOCAL_openvocab.json: the committed
evidence for (or against) the segments docstring's open-vocabulary claim.

Usage:
  python tools/make_scale_data.py --open-vocab --docs 4000  --out .scale/ov_base
  python tools/make_scale_data.py --open-vocab --docs 40000 --out .scale/ov_x10
  python tools/openvocab_check.py [--json BENCH_LOCAL_openvocab.json]
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
    ap.add_argument("--base", default=os.path.join(REPO, ".scale", "ov_base"))
    ap.add_argument("--x10", default=os.path.join(REPO, ".scale", "ov_x10"))
    ap.add_argument("--json", default=os.path.join(REPO, "BENCH_LOCAL_openvocab.json"))
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from polars_order_book_spark.operators import dedup
    from polars_order_book_spark.session import get_spark
    from polars_order_book_spark.sources.tables import load_table

    spark = get_spark("openvocab-check")
    spark.sparkContext.setLogLevel("ERROR")
    # warm codegen + the Arrow worker pool on the small corpus
    load_table(spark, args.base, "documents").count()

    report = {
        "base_dir": args.base,
        "x10_dir": args.x10,
        "loadavg_1min_start": round(os.getloadavg()[0], 2),
        "configs": {},
    }
    # max_dist matters for the SEGMENTS keys only: segment length is
    # ~prefix_len/(max_dist+1), so tau=10 gives ~6-char keys (dominated by
    # any natural corpus's fixed common core -> quadratic) while tau=3
    # gives 16-char keys (content-selective). Buckets' length-blocking is
    # tau-INDEPENDENT, so running both strategies at both taus separates
    # "the strategy works" from "the corpus is easy".
    for strategy in ("segments", "buckets"):
        for max_dist in (10, 3):
            key = f"{strategy}_tau{max_dist}"
            entry: dict = {}
            for label, sf_dir in (("base", args.base), ("x10", args.x10)):
                docs = load_table(spark, sf_dir, "documents")
                try:
                    runs, n = [], None
                    for _ in range(args.runs):
                        t0 = time.time()
                        n = dedup.fuzzy_duplicate_pairs(
                            docs, block_cols=["lang"],
                            candidate_strategy=strategy, max_dist=max_dist,
                        ).count()
                        runs.append(time.time() - t0)
                    entry[label] = {"best_sec": round(min(runs), 3),
                                    "runs": [round(r, 3) for r in runs],
                                    "pairs": n}
                except Exception as exc:  # noqa: BLE001 — a budget fail-fast IS a result
                    entry[label] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            if all("best_sec" in entry.get(k, {}) for k in ("base", "x10")):
                entry["ratio"] = round(
                    entry["x10"]["best_sec"] / entry["base"]["best_sec"], 2
                )
            report["configs"][key] = entry
            print(key, json.dumps(entry))

    report["loadavg_1min_end"] = round(os.getloadavg()[0], 2)
    with open(args.json, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {args.json}")
    spark.stop()

    seg = report["configs"]["segments_tau3"]
    if "ratio" not in seg or seg["ratio"] > 10.0:
        print("SEGMENTS (tau=3, 16-char keys) did not hold sub-10x on the "
              "open-vocab corpus — the content-keyed claim is NOT proven; "
              "demote the docstring", file=sys.stderr)
        sys.exit(1)
    print(f"segments content-keyed claim HOLDS at tau=3: {seg['ratio']}x at "
          f"10x data (tau=10 keys are ~6 chars and saturate on the fixed "
          f"common core — see configs.segments_tau10)")


if __name__ == "__main__":
    main()

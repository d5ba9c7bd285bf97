"""Per-query bench regression gate for the session-close checklist.

Compares the per-query BEST-OF across the current round's two committed
idle-box bench runs against the prior round's pair and flags anything above
--threshold (default 1.3x, above this box's measured 10-15% run-to-run
noise). The r6 IVF regression shipped silently because no such gate ran;
this makes that impossible — every flagged query needs a written
disposition (fix or a documented accept) before close.

Best-of-across-both-runs per query is the established reading on this box:
single runs swing 10-15% uniformly from page cache / JIT / load, and the
min over 6 samples (2 runs x best-of-3 each) is the steady-state cost.

Usage:
  python tools/bench_regression.py --prev BENCH_LOCAL_r6_run1.json,BENCH_LOCAL_r6_run2.json \
      --curr BENCH_LOCAL_r7_run1.json,BENCH_LOCAL_r7_run2.json \
      [--threshold 1.3] [--json out.json]

Exit code 1 if any regression is flagged (so the close script can stop).
"""

from __future__ import annotations

import argparse
import json
import sys


def best_of(paths: "list[str]") -> "dict[str, float]":
    best: dict[str, float] = {}
    for path in paths:
        with open(path) as fh:
            data = json.load(fh)
        for name, sec in data.get("queries", {}).items():
            if name not in best or sec < best[name]:
                best[name] = sec
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prev", required=True, help="comma-separated run files")
    ap.add_argument("--curr", required=True, help="comma-separated run files")
    ap.add_argument("--threshold", type=float, default=1.3)
    ap.add_argument("--min-sec", type=float, default=0.15,
                    help="ignore queries under this absolute time (timer noise)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    prev = best_of(args.prev.split(","))
    curr = best_of(args.curr.split(","))
    shared = sorted(set(prev) & set(curr))
    regressions, improvements = [], []
    for name in shared:
        p, c = prev[name], curr[name]
        if p <= 0:
            continue
        ratio = c / p
        if ratio >= args.threshold and c >= args.min_sec:
            regressions.append({"query": name, "prev": p, "curr": c,
                                "ratio": round(ratio, 3)})
        elif ratio <= 1.0 / args.threshold and p >= args.min_sec:
            improvements.append({"query": name, "prev": p, "curr": c,
                                 "ratio": round(ratio, 3)})
    regressions.sort(key=lambda r: -r["ratio"])
    improvements.sort(key=lambda r: r["ratio"])
    tot_prev = sum(prev[n] for n in shared)
    tot_curr = sum(curr[n] for n in shared)
    report = {
        "shared_queries": len(shared),
        "total_prev_sec": round(tot_prev, 3),
        "total_curr_sec": round(tot_curr, 3),
        "total_ratio": round(tot_curr / tot_prev, 3) if tot_prev else None,
        "threshold": args.threshold,
        "regressions": regressions,
        "improvements": improvements,
        "new_queries": sorted(set(curr) - set(prev)),
        "dropped_queries": sorted(set(prev) - set(curr)),
    }
    print(f"shared={len(shared)} total {tot_prev:.1f}s -> {tot_curr:.1f}s "
          f"(ratio {report['total_ratio']})")
    for r in regressions:
        print(f"  REGRESSION {r['query']}: {r['prev']:.2f}s -> "
              f"{r['curr']:.2f}s ({r['ratio']}x)")
    for r in improvements[:10]:
        print(f"  improved   {r['query']}: {r['prev']:.2f}s -> "
              f"{r['curr']:.2f}s ({r['ratio']}x)")
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"wrote {args.json}")
    if regressions:
        print(f"\n{len(regressions)} regression(s) above {args.threshold}x — "
              f"each needs a fix or a written disposition in STATUS.md")
        sys.exit(1)


if __name__ == "__main__":
    main()

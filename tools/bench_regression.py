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
      [--threshold 1.3] [--isolation BENCH_ISOLATION_rN.json] [--json out.json]

Exit code 1 if any regression is flagged (so the close script can stop).

Isolation protocol (r10, formalizing what r8/r9 did in STATUS prose): a
flagged query whose slowdown is sampling noise — not a plan change — will
not reproduce when re-measured alone on an idle box. Re-run just the
flagged queries (best-of-5 via bench.py with a narrowed headline or a
one-off timing script), commit the result as BENCH_ISOLATION_rN.json
(same {"queries": {name: sec}} shape as a full bench artifact), and pass
it via --isolation. A flag whose isolation best-of sits INSIDE the
prior-round band is auto-cleared into `cleared_by_isolation` in the
report — artifact-backed, not prose — and no longer fails the gate.
"Inside the band" = iso <= the prior round's worst committed reading for
that query, OR iso/prev_best < threshold (see
split_cleared_by_isolation). Flags absent from the artifact, or whose
isolation time still exceeds the band, keep failing.
"""

from __future__ import annotations

import argparse
import json
import sys


def best_of(paths: "list[str]") -> "tuple[dict[str, float], dict[str, str]]":
    """Per-query best-of across run files, plus the union of recorded errors.

    Refuses a TRUNCATED compact bench line (bench.py trims `queries`
    slowest-first for the driver's stdout tail and marks it with
    `queries_omitted`): comparing a silently partial query set would hide
    exactly the fast-query regressions the gate exists to catch — only the
    full $BENCH_FULL_OUT artifact is valid input (r9 tools review).
    """
    best, _mx, errors = best_and_max_of(paths)
    return best, errors


def best_and_max_of(
    paths: "list[str]",
) -> "tuple[dict[str, float], dict[str, float], dict[str, str]]":
    """Per-query best-of AND worst-of across run files, plus recorded errors.
    The max defines the round's observed BAND [min, max] per query — the
    isolation-clearing rule compares against it (an isolation best-of inside
    the prior round's band is indistinguishable from that round's own
    run-to-run noise)."""
    best: dict[str, float] = {}
    mx: dict[str, float] = {}
    errors: dict[str, str] = {}
    for path in paths:
        with open(path) as fh:
            data = json.load(fh)
        if data.get("queries_omitted"):
            raise SystemExit(
                f"{path} is a truncated compact bench line "
                f"(queries_omitted={data['queries_omitted']}) — pass the "
                "full BENCH_FULL_OUT artifact instead"
            )
        for name, sec in data.get("queries", {}).items():
            if name not in best or sec < best[name]:
                best[name] = sec
            if name not in mx or sec > mx[name]:
                mx[name] = sec
        for name, msg in (data.get("errors") or {}).items():
            errors.setdefault(name, msg)
    return best, mx, errors


def split_cleared_by_isolation(
    regressions: "list[dict]",
    iso: "dict[str, float]",
    threshold: float,
    prev_max: "dict[str, float] | None" = None,
) -> "tuple[list[dict], list[dict]]":
    """Partition flagged regressions into (still-flagged, cleared).

    A flag clears iff the isolation artifact has a timing for it AND that
    best-of sits inside the prior round's observed band: either
    iso <= the prior round's WORST committed reading for the query (the
    band's upper edge — an isolation time the prior round itself produced
    is noise, not regression; the r9 q21/part_snapshot_diff precedent), or
    iso/prev_best < threshold (for queries whose prior runs were so tight
    the band is narrower than the gate's own noise allowance). The
    isolation value is recorded on the cleared entry so the report is
    self-evidencing.
    """
    prev_max = prev_max or {}
    flagged, cleared = [], []
    for r in regressions:
        iso_sec = iso.get(r["query"])
        if iso_sec is None or r["prev"] <= 0:
            flagged.append(r)
            continue
        in_band = iso_sec <= prev_max.get(r["query"], 0.0)
        in_tol = iso_sec / r["prev"] < threshold
        if in_band or in_tol:
            cleared.append({**r, "isolation": iso_sec,
                            "isolation_ratio": round(iso_sec / r["prev"], 3),
                            "prev_band_max": prev_max.get(r["query"]),
                            "cleared_by": "band" if in_band else "threshold"})
        else:
            flagged.append(r)
    return flagged, cleared


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prev", required=True, help="comma-separated run files")
    ap.add_argument("--curr", required=True, help="comma-separated run files")
    ap.add_argument("--threshold", type=float, default=1.3)
    ap.add_argument("--min-sec", type=float, default=0.15,
                    help="ignore queries under this absolute time (timer noise)")
    ap.add_argument("--isolation", default=None,
                    help="comma-separated isolation-run artifacts "
                         "(BENCH_ISOLATION_rN.json); flags whose isolation "
                         "best-of sits inside the prior band auto-clear")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    prev, prev_max, _prev_errs = best_and_max_of(args.prev.split(","))
    curr, curr_errs = best_of(args.curr.split(","))
    shared = sorted(set(prev) & set(curr))
    # A query that timed in prev but only ERRORED in every curr run used to
    # vanish from `shared` — a regression-to-broken is strictly worse than
    # a slowdown and must flag, not disappear (r9 tools review).
    error_transitions = [
        {"query": n, "prev": prev[n], "error": curr_errs[n][:200]}
        for n in sorted((set(prev) & set(curr_errs)) - set(curr))
    ]
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
    cleared = []
    if args.isolation:
        iso, _iso_errs = best_of(args.isolation.split(","))
        regressions, cleared = split_cleared_by_isolation(
            regressions, iso, args.threshold, prev_max
        )
    tot_prev = sum(prev[n] for n in shared)
    tot_curr = sum(curr[n] for n in shared)
    report = {
        "shared_queries": len(shared),
        "total_prev_sec": round(tot_prev, 3),
        "total_curr_sec": round(tot_curr, 3),
        "total_ratio": round(tot_curr / tot_prev, 3) if tot_prev else None,
        "threshold": args.threshold,
        "regressions": regressions,
        "cleared_by_isolation": cleared,
        "isolation_files": args.isolation.split(",") if args.isolation else [],
        "error_transitions": error_transitions,
        "improvements": improvements,
        "new_queries": sorted(set(curr) - set(prev)),
        "dropped_queries": sorted(set(prev) - set(curr)),
    }
    print(f"shared={len(shared)} total {tot_prev:.1f}s -> {tot_curr:.1f}s "
          f"(ratio {report['total_ratio']})")
    for r in regressions:
        print(f"  REGRESSION {r['query']}: {r['prev']:.2f}s -> "
              f"{r['curr']:.2f}s ({r['ratio']}x)")
    for r in cleared:
        print(f"  cleared-by-isolation {r['query']}: {r['prev']:.2f}s -> "
              f"{r['curr']:.2f}s, isolation {r['isolation']:.2f}s "
              f"({r['isolation_ratio']}x prev)")
    for r in error_transitions:
        print(f"  REGRESSION-TO-ERROR {r['query']}: {r['prev']:.2f}s -> "
              f"{r['error'][:100]}")
    for r in improvements[:10]:
        print(f"  improved   {r['query']}: {r['prev']:.2f}s -> "
              f"{r['curr']:.2f}s ({r['ratio']}x)")
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"wrote {args.json}")
    if regressions or error_transitions:
        print(f"\n{len(regressions)} regression(s) + "
              f"{len(error_transitions)} error transition(s) above "
              f"{args.threshold}x — each needs a fix or a written "
              f"disposition in STATUS.md")
        sys.exit(1)


if __name__ == "__main__":
    main()

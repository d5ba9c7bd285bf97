"""Rotation math for the driver's 50-query correctness sample.

At 50 samples/round and a 233-entry registry, a full driver pass takes ~5
rounds, so the head-50 ordering must be GENERATED from the recorded history,
not hand-maintained. This tool reads every CORRECTNESS_r*.json in the repo
root plus the current ``queries()`` registry and buckets each entry:

  1. stale-red      — latest driver row is red (highest priority)
  2. never-sampled  — registered but no driver row in any round
  3. deferred       — truncation-deferred from a PRIOR round's changed
                      bucket (edits still driver-unvalidated, pass --deferred)
  4. behavior-changed — caller-supplied list (code paths edited this round;
                        the history cannot know this, pass --changed)
  5. oldest-green   — driver-green, ordered by the round of their LATEST
                      green row ascending (most stale first), name asc

Output: the recommended head ordering (default 50) plus coverage stats.
Usage:
  python tools/rotation.py [--head 50] [--changed q1,q2] [--json out.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_history() -> "dict[str, list[tuple[int, bool]]]":
    """name -> [(round, green)] across all driver CORRECTNESS_r*.json."""
    hist: dict[str, list[tuple[int, bool]]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:  # skip CORRECTNESS_LOCAL_* etc.
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for name, res in rows.items():
            green = bool(
                res.get("rows_match")
                and res.get("schema_match")
                and res.get("hash_match") in (True, None)
                and not res.get("err")
            )
            hist.setdefault(name, []).append((rnd, green))
    for runs in hist.values():
        runs.sort()
    return hist


def plan_rotation(
    registry: "list[str]", changed: "list[str]", head_n: int,
    deferred: "list[str] | None" = None,
) -> dict:
    """``deferred``: names truncation-deferred from a PREVIOUS round's
    changed bucket (their edits still have no driver row). They rank as
    their own tier ABOVE this round's behavior-changed entries — without
    it, a second over-subscribed round re-sorts them alphabetically among
    the new names and can defer the same entry indefinitely (r8 deferred
    13 entries; r9 must drain them first)."""
    hist = load_history()
    changed_set = set(changed)
    deferred_list = [d for d in (deferred or []) if d]
    deferred_set = set(deferred_list)
    stale_red, never, defer, behavior, green = [], [], [], [], []
    for name in sorted(registry):
        runs = hist.get(name)
        if runs and not runs[-1][1]:
            stale_red.append(name)
        elif not runs:
            never.append(name)
        elif name in deferred_set:
            defer.append(name)
        elif name in changed_set:
            behavior.append(name)
        else:
            last_green = max(r for r, g in runs if g)
            green.append((last_green, name))
    green.sort()  # oldest green round first, then name asc
    ordered = stale_red + never + defer + behavior + [n for _, n in green]
    # priority entries (everything above oldest-green) that the head cap
    # cuts off — callers MUST surface these: a truncated behavior-changed
    # entry is an operator whose semantics changed getting no driver
    # re-validation for ~registry/50 rounds
    truncated_priority = (stale_red + never + defer + behavior)[head_n:]
    unknown_changed = sorted(
        (changed_set | deferred_set) - set(registry)
    )
    return {
        "truncated_priority": truncated_priority,
        "registry_size": len(registry),
        "driver_green_union": len(registry) - len(never) - len(stale_red),
        "stale_red": stale_red,
        "never_sampled": never,
        "deferred": defer,
        "behavior_changed": behavior,
        "unknown_changed_names": unknown_changed,
        "head": ordered[:head_n],
        "full_order": ordered,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--head", type=int, default=50)
    ap.add_argument("--changed", default="", help="comma-separated names")
    ap.add_argument("--deferred", default="",
                    help="comma-separated names truncation-deferred from a "
                         "prior round (rank above this round's --changed)")
    ap.add_argument("--json", default=None, help="write full plan here")
    args = ap.parse_args()

    import __spark_entry__ as E

    registry = list(E.queries().keys())
    changed = [c for c in args.changed.split(",") if c]
    deferred = [c for c in args.deferred.split(",") if c]
    plan = plan_rotation(registry, changed, args.head, deferred)

    print(
        f"registry={plan['registry_size']} "
        f"green-union={plan['driver_green_union']} "
        f"stale-red={len(plan['stale_red'])} "
        f"never-sampled={len(plan['never_sampled'])} "
        f"behavior-changed={len(plan['behavior_changed'])}"
    )
    if plan["unknown_changed_names"]:
        print(f"WARNING --changed names not in registry: "
              f"{plan['unknown_changed_names']}")
    if plan["truncated_priority"]:
        print(f"WARNING {len(plan['truncated_priority'])} priority entries "
              f"(stale-red/never-sampled/changed) fall past the head-"
              f"{args.head} cap and get NO driver signal this round: "
              f"{plan['truncated_priority']}")
    print(f"\nrecommended head-{args.head}:")
    for i, name in enumerate(plan["head"], 1):
        bucket = (
            "STALE-RED" if name in plan["stale_red"]
            else "never-sampled" if name in plan["never_sampled"]
            else "deferred" if name in plan["deferred"]
            else "changed" if name in plan["behavior_changed"]
            else "oldest-green"
        )
        print(f"  {i:3d}. {name}  [{bucket}]")
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(plan, fh, indent=1)
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()

"""Pin the bench-regression gate's r9 hardening: refusal of truncated
compact bench lines, and regression-to-error flagging (a query that timed
in prev but only errors in curr must flag, not vanish from the comparison)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_regression import best_of


def _write(tmp_path, name, payload):
    p = tmp_path / name
    p.write_text(json.dumps(payload))
    return str(p)


def test_best_of_min_across_runs_and_error_union(tmp_path):
    a = _write(tmp_path, "a.json", {"queries": {"q1": 2.0, "q2": 1.0},
                                    "errors": {"q3": "boom A"}})
    b = _write(tmp_path, "b.json", {"queries": {"q1": 1.5},
                                    "errors": {"q3": "boom B", "q4": "x"}})
    best, errs = best_of([a, b])
    assert best == {"q1": 1.5, "q2": 1.0}
    assert errs == {"q3": "boom A", "q4": "x"}  # first message wins


def test_truncated_compact_line_refused(tmp_path):
    p = _write(tmp_path, "compact.json",
               {"queries": {"q1": 1.0}, "queries_omitted": 42})
    with pytest.raises(SystemExit, match="truncated compact bench line"):
        best_of([p])


def test_error_transition_set_algebra():
    """The main() expression `set(prev) & set(curr_errs) - set(curr)` must
    flag exactly: timed-in-prev AND errored-in-curr AND not-timed-in-curr.
    (Python parses it as prev & (errs - curr); (prev & errs) - curr is the
    same set — pinned here so a refactor can't silently change it.)"""
    prev = {"a": 1.0, "b": 1.0, "c": 1.0}
    curr = {"b": 1.0}           # b recovered in a later run
    curr_errs = {"a": "boom", "b": "boom-once", "zz": "new-query-err"}
    flagged = set(prev) & set(curr_errs) - set(curr)
    assert flagged == {"a"}     # not b (has a timing), not zz (not in prev)
    assert flagged == (set(prev) & set(curr_errs)) - set(curr)

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


def test_isolation_clears_only_in_band_flags(tmp_path):
    """r10 isolation protocol: a flagged regression auto-clears iff the
    committed isolation artifact times it INSIDE the prior band
    (iso/prev < threshold); out-of-band or missing-from-artifact flags
    keep failing."""
    from tools.bench_regression import split_cleared_by_isolation

    regressions = [
        {"query": "q_noise", "prev": 1.0, "curr": 1.5, "ratio": 1.5},
        {"query": "q_real", "prev": 1.0, "curr": 1.6, "ratio": 1.6},
        {"query": "q_unmeasured", "prev": 1.0, "curr": 1.4, "ratio": 1.4},
    ]
    iso = {"q_noise": 1.05, "q_real": 1.55}  # q_unmeasured absent
    flagged, cleared = split_cleared_by_isolation(regressions, iso, 1.3)
    assert [r["query"] for r in cleared] == ["q_noise"]
    assert cleared[0]["isolation"] == 1.05
    assert cleared[0]["isolation_ratio"] == 1.05
    assert [r["query"] for r in flagged] == ["q_real", "q_unmeasured"]


def test_isolation_cli_end_to_end(tmp_path, capsys, monkeypatch):
    """Full CLI path: --isolation moves an in-band flag to
    cleared_by_isolation in the JSON report and exit code goes 1 -> 0."""
    import pytest as _pytest

    from tools.bench_regression import main

    prev = _write(tmp_path, "prev.json", {"queries": {"q1": 1.0, "q2": 1.0}})
    curr = _write(tmp_path, "curr.json", {"queries": {"q1": 1.5, "q2": 1.0}})
    out = tmp_path / "report.json"

    argv = ["prog", "--prev", prev, "--curr", curr, "--json", str(out)]
    monkeypatch.setattr(sys, "argv", argv)
    with _pytest.raises(SystemExit):
        main()
    assert json.loads(out.read_text())["regressions"][0]["query"] == "q1"

    iso = _write(tmp_path, "iso.json", {"queries": {"q1": 0.98}})
    monkeypatch.setattr(sys, "argv", argv + ["--isolation", iso])
    main()  # no SystemExit: the only flag cleared
    rep = json.loads(out.read_text())
    assert rep["regressions"] == []
    assert rep["cleared_by_isolation"][0]["query"] == "q1"
    assert rep["isolation_files"] == [iso]


def test_isolation_band_rule(tmp_path):
    """An isolation best-of at or below the prior round's WORST committed
    reading clears (the round's own noise produced that value); above the
    band AND above threshold keeps failing."""
    from tools.bench_regression import split_cleared_by_isolation

    regressions = [
        {"query": "q_band", "prev": 1.0, "curr": 1.6, "ratio": 1.6},
        {"query": "q_out", "prev": 1.0, "curr": 1.6, "ratio": 1.6},
    ]
    iso = {"q_band": 1.55, "q_out": 1.55}
    prev_max = {"q_band": 1.7, "q_out": 1.2}  # band edges from prior runs
    flagged, cleared = split_cleared_by_isolation(regressions, iso, 1.3, prev_max)
    assert [r["query"] for r in cleared] == ["q_band"]
    assert cleared[0]["cleared_by"] == "band"
    assert cleared[0]["prev_band_max"] == 1.7
    assert [r["query"] for r in flagged] == ["q_out"]

"""Rotation-math tests (tools/rotation.py) — pure-function coverage for the
driver-sample priority tiers, including the r9 `deferred` tier (entries
truncation-deferred from a prior round must outrank this round's changed
bucket, or an over-subscribed head can starve the same entry indefinitely)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.rotation import plan_rotation


def _with_history(monkeypatch, hist):
    import tools.rotation as R

    monkeypatch.setattr(R, "load_history", lambda: hist)


def test_tier_order_and_deferred_outranks_changed(monkeypatch):
    hist = {
        "red_q": [(7, True), (8, False)],     # stale-red
        "old_green": [(1, True)],             # oldest-green
        "new_green": [(8, True)],             # green, newest
        "changed_q": [(5, True)],
        "deferred_q": [(4, True)],
    }
    _with_history(monkeypatch, hist)
    registry = ["new_green", "changed_q", "deferred_q", "never_q",
                "old_green", "red_q"]
    plan = plan_rotation(registry, ["changed_q"], 10, ["deferred_q"])
    assert plan["head"] == [
        "red_q", "never_q", "deferred_q", "changed_q", "old_green",
        "new_green",
    ]
    assert plan["stale_red"] == ["red_q"]
    assert plan["deferred"] == ["deferred_q"]
    assert plan["behavior_changed"] == ["changed_q"]


def test_deferred_alphabetically_after_changed_still_outranks(monkeypatch):
    """The r8 failure shape: 'z_deferred' sorts after 'a_changed', so in a
    single changed bucket it would be truncated AGAIN by a head cap of 2+."""
    hist = {"z_deferred": [(4, True)], "a_changed": [(5, True)],
            "b_changed": [(5, True)]}
    _with_history(monkeypatch, hist)
    plan = plan_rotation(
        ["a_changed", "b_changed", "z_deferred"],
        ["a_changed", "b_changed"], 2, ["z_deferred"],
    )
    assert plan["head"] == ["z_deferred", "a_changed"]
    assert plan["truncated_priority"] == ["b_changed"]


def test_unknown_deferred_name_reported(monkeypatch):
    _with_history(monkeypatch, {"q": [(1, True)]})
    plan = plan_rotation(["q"], [], 5, ["typo_q"])
    assert plan["unknown_changed_names"] == ["typo_q"]


def test_stale_red_beats_deferred_and_never(monkeypatch):
    hist = {"r": [(8, False)], "d": [(3, True)]}
    _with_history(monkeypatch, hist)
    plan = plan_rotation(["d", "n", "r"], [], 50, ["d"])
    assert plan["head"] == ["r", "n", "d"]
    # union counts exclude red and never
    assert plan["driver_green_union"] == 1

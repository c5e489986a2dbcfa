"""Gate tests for scripts/scale_budget.py (no Spark needed).

VERDICT r05 demanded the gate stay falsifiable: a synthetic 1.6x
regression on an UNWAIVED query must fail, the declared-waiver query
(streaming_heavy_hitters, <= 2.5x) must pass with a visible WAIVED
line, and the variance screen must use a robust old-spread statistic
(second-lowest sample), not the single worst spike (ADVICE r05 #3).
"""

import importlib.util
import json
import os
import sys

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "scale_budget",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "scale_budget.py"),
)
scale_budget = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(scale_budget)


def _run(tmp_path, new, old, capsys):
    new_p, old_p = tmp_path / "new.json", tmp_path / "old.json"
    new_p.write_text(json.dumps(new))
    old_p.write_text(json.dumps(old))
    argv = sys.argv
    sys.argv = ["scale_budget.py", str(new_p), str(old_p)]
    try:
        rc = scale_budget.main()
    finally:
        sys.argv = argv
    return rc, capsys.readouterr().out


def _entry(t10, runs=None):
    e = {"t_1x_sec": t10 / 3.0, "t_10x_sec": t10}
    if runs is not None:
        e["runs_10x"] = runs
    return e


def test_unwaived_regression_fails(tmp_path, capsys):
    old = {"plain_query": _entry(3.0, [3.0, 3.1, 3.2])}
    new = {"plain_query": _entry(4.8, [4.8, 4.9, 5.0])}  # 1.6x > 1.5x
    rc, out = _run(tmp_path, new, old, capsys)
    assert rc == 1
    assert "FAIL  plain_query" in out


def test_waived_query_passes_with_visible_line(tmp_path, capsys):
    old = {"streaming_heavy_hitters": _entry(3.0, [3.0, 3.05, 3.1])}
    new = {"streaming_heavy_hitters": _entry(6.3, [6.3, 6.4, 6.5])}  # 2.1x
    rc, out = _run(tmp_path, new, old, capsys)
    assert rc == 0
    assert "WAIVED streaming_heavy_hitters" in out


def test_growth_past_waiver_still_fails(tmp_path, capsys):
    old = {"streaming_heavy_hitters": _entry(3.0, [3.0, 3.05, 3.1])}
    new = {"streaming_heavy_hitters": _entry(9.0, [9.0, 9.1, 9.2])}  # 3.0x
    rc, out = _run(tmp_path, new, old, capsys)
    assert rc == 1
    assert "exceeds even its 2.5x waiver" in out


def test_variance_screen_uses_robust_statistic_not_worst_spike(
    tmp_path, capsys
):
    # Old runs: min 3.0 with one 6.2 scheduler spike. A new min of 5.5
    # (1.83x) is a genuine regression — under the r05 rule (old MAX)
    # the 6.2 spike would have waived it; the robust rule (second-
    # lowest = 3.1) must fail it.
    old = {"plain_query": _entry(3.0, [3.0, 3.1, 6.2])}
    new = {"plain_query": _entry(5.5, [5.5, 5.6, 5.7])}
    rc, out = _run(tmp_path, new, old, capsys)
    assert rc == 1
    assert "FAIL  plain_query" in out


def test_variance_screen_waives_within_robust_spread(tmp_path, capsys):
    # New min 3.05 sits inside the old robust spread (second-lowest
    # 3.1) even though it is 1.53x the lucky old min of 2.0 — noise.
    old = {"plain_query": _entry(2.0, [2.0, 3.1, 3.2])}
    new = {"plain_query": _entry(3.05, [3.05, 3.1, 3.2])}
    rc, out = _run(tmp_path, new, old, capsys)
    assert rc == 0
    assert "noise, not plan" in out


def test_sub_floor_jitter_never_fails(tmp_path, capsys):
    old = {"tiny_query": _entry(0.4, [0.4, 0.45])}
    new = {"tiny_query": _entry(1.2, [1.2, 1.3])}  # 3x but under 2 s floor
    rc, _ = _run(tmp_path, new, old, capsys)
    assert rc == 0


def test_canary_normalization_forgives_box_drift(tmp_path, capsys):
    # everything (canary included) slowed ~1.6x — an epoch change, not
    # a plan regression. Without the canary plain_query would fail;
    # with it the 1.6x divides out.
    old = {
        "two_stage_agg_events": _entry(3.0, [3.0, 3.1, 3.2]),
        "plain_query": _entry(3.0, [3.0, 3.1, 3.2]),
    }
    new = {
        "two_stage_agg_events": _entry(4.8, [4.8, 4.9, 5.0]),
        "plain_query": _entry(4.8, [4.8, 4.9, 5.0]),
    }
    rc, out = _run(tmp_path, new, old, capsys)
    assert rc == 0
    assert "box-drift canary two_stage_agg_events" in out


def test_canary_does_not_whitewash_real_regression(tmp_path, capsys):
    # flat canary, 1.6x regression elsewhere: still fails
    old = {
        "two_stage_agg_events": _entry(3.0, [3.0, 3.1, 3.2]),
        "plain_query": _entry(3.0, [3.0, 3.1, 3.2]),
    }
    new = {
        "two_stage_agg_events": _entry(3.0, [3.0, 3.05, 3.1]),
        "plain_query": _entry(4.8, [4.8, 4.9, 5.0]),
    }
    rc, out = _run(tmp_path, new, old, capsys)
    assert rc == 1
    assert "FAIL  plain_query" in out


def test_canary_factor_capped_and_warned(tmp_path, capsys):
    # canary grows 3x (> the 2.0 cap): the cap applies, the warning
    # prints, and a 3.2x regression elsewhere still fails (3.2/2 = 1.6)
    old = {
        "two_stage_agg_events": _entry(3.0, [3.0, 3.1, 3.2]),
        "plain_query": _entry(3.0, [3.0, 3.1, 3.2]),
    }
    new = {
        "two_stage_agg_events": _entry(9.0, [9.0, 9.1, 9.2]),
        "plain_query": _entry(9.6, [9.6, 9.7, 9.8]),
    }
    rc, out = _run(tmp_path, new, old, capsys)
    assert "WARN  canary" in out
    assert rc == 1
    assert "FAIL  plain_query" in out


def test_canary_self_normalizes_within_cap_fails_past_it(tmp_path, capsys):
    # the canary IS the drift measure: its own in-cap growth is box by
    # definition and self-forgives; growth past the 2.0 cap warns AND
    # fails (3.2x raw / 2.0 cap = 1.6x > 1.5x budget)
    old = {"two_stage_agg_events": _entry(3.0, [3.0, 3.1, 3.2])}
    new = {"two_stage_agg_events": _entry(5.7, [5.7, 5.8, 5.9])}
    rc, out = _run(tmp_path, new, old, capsys)
    assert rc == 0  # 1.9x within the cap: absorbed as drift
    old = {"two_stage_agg_events": _entry(3.0, [3.0, 3.1, 3.2])}
    new = {"two_stage_agg_events": _entry(9.6, [9.6, 9.7, 9.8])}
    rc, out = _run(tmp_path, new, old, capsys)
    assert "WARN  canary" in out
    assert rc == 1
    assert "FAIL  two_stage_agg_events" in out


def test_missing_canary_prints_info_and_gates_raw(tmp_path, capsys):
    old = {"plain_query": _entry(3.0, [3.0, 3.1, 3.2])}
    new = {"plain_query": _entry(4.8, [4.8, 4.9, 5.0])}
    rc, out = _run(tmp_path, new, old, capsys)
    assert "canary two_stage_agg_events missing" in out
    assert rc == 1

"""Headline-selection policy of bench.py (pure function, no Spark).

VERDICT r14 missing #3: the committed headline must not be "whichever
run happened last" — r14's driver snapshot recorded the session's
worst run (326.8s, degraded probe) over its 283.4s best. The policy
under test: min total among comparable runs with healthy env probes
on both sides; min among comparable + degraded flag when none is
healthy; this-run fallback when nothing is comparable at all.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import (  # noqa: E402
    HEALTHY_MULTI_S,
    current_code_heads,
    select_headline,
)


def _run(
    total,
    multi_before,
    multi_after,
    n_queries=66,
    n_errors=0,
    ts=0.0,
    # Stamped by default: the probe-policy tests exercise healthy/
    # degraded selection among same-code runs; the exact-head fallback
    # (allowed_heads=None) requires truthy equal heads to pool (r16
    # ADVICE #4 — an unstamped pair must NOT compare equal).
    head="cafe123",
):
    return {
        "ts": ts,
        "total": total,
        "n_queries": n_queries,
        "n_errors": n_errors,
        "head": head,
        "env_probe": {
            "before": {"single_s": 1.0, "multi_s": multi_before},
            "after": {"single_s": 1.0, "multi_s": multi_after},
        },
    }


def test_min_among_healthy_wins_over_later_degraded_run():
    # the r14 episode in miniature: healthy 283.4 early, degraded
    # 326.8 last — the headline must be the healthy minimum, not the
    # last run
    runs = [
        _run(316.5, 2.2, 2.5, ts=1),
        _run(283.4, 1.3, 1.4, ts=2),
        _run(294.9, 1.2, 1.3, ts=3),
        _run(326.8, 4.0, 6.0, ts=4),
    ]
    best, degraded = select_headline(runs, 66, runs[-1])
    assert best["total"] == 283.4
    assert degraded is False


def test_all_degraded_falls_back_to_min_with_flag():
    runs = [
        _run(316.5, 2.2, 2.5),
        _run(280.2, 2.8, 2.4),
        _run(326.8, 4.0, 6.0),
    ]
    best, degraded = select_headline(runs, 66, runs[-1])
    assert best["total"] == 280.2
    assert degraded is True


def test_probe_must_be_healthy_on_both_sides():
    # a run that STARTS healthy but degrades mid-run (after-probe
    # slow) is not a healthy sample of the code
    runs = [
        _run(250.0, 1.2, 3.0),
        _run(290.0, 1.3, 1.4),
    ]
    best, degraded = select_headline(runs, 66, runs[-1])
    assert best["total"] == 290.0
    assert degraded is False


def test_shape_change_and_errors_excluded():
    # a faster run from a prior bench shape (fewer lines) or with
    # errored lines must not mask this shape's total
    runs = [
        _run(200.0, 1.2, 1.2, n_queries=60),  # old shape
        _run(240.0, 1.2, 1.2, n_errors=1),  # errored lines undercount
        _run(285.0, 1.3, 1.3),
    ]
    best, degraded = select_headline(runs, 66, runs[-1])
    assert best["total"] == 285.0
    assert degraded is False


def test_nothing_comparable_returns_this_run_degraded():
    this = _run(300.0, 2.0, 2.0, n_errors=2)
    best, degraded = select_headline([this], 66, this)
    assert best is this
    assert degraded is True


def test_head_gate_excludes_runs_from_before_a_perf_commit():
    # r15 ADVICE #1 in miniature: a perf-relevant commit lands (query
    # list unchanged), so the 263.4 from the OLD code must not keep
    # fronting the artifact — only runs at-or-after the perf commit
    # pool, matched by short-hash prefix against the full shas.
    old = "a" * 40
    new = "b" * 40
    runs = [
        _run(263.4, 1.3, 1.3, ts=1, head=old[:7]),  # old code, healthy
        _run(290.0, 1.3, 1.3, ts=2, head=new[:7]),
        _run(295.0, 1.2, 1.2, ts=3, head=new[:7]),
    ]
    best, degraded = select_headline(
        runs, 66, runs[-1], allowed_heads=frozenset({new})
    )
    assert best["total"] == 290.0
    assert degraded is False


def test_head_gate_unstamped_runs_excluded_when_git_answers():
    # runs recorded before head stamping exist (head=None); once the
    # gate has real shas to check, an unattributable run can't pool
    runs = [
        _run(250.0, 1.3, 1.3, ts=1, head=None),
        _run(290.0, 1.3, 1.3, ts=2, head="b" * 7),
    ]
    best, _ = select_headline(
        runs, 66, runs[-1], allowed_heads=frozenset({"b" * 40})
    )
    assert best["total"] == 290.0


def test_dirty_worktree_pools_only_this_run():
    # uncommitted perf-relevant edits: NO recorded run describes the
    # current code — this run is the only candidate, even when older
    # committed runs were faster and healthier
    runs = [
        _run(250.0, 1.3, 1.3, ts=1, head="a" * 7),
        _run(310.0, 2.5, 2.5, ts=2, head="a" * 7),
    ]
    best, degraded = select_headline(
        runs, 66, runs[-1], allowed_heads=frozenset()
    )
    assert best["total"] == 310.0
    assert degraded is True  # this run's own probe was degraded


def test_git_unavailable_falls_back_to_exact_head_equality():
    runs = [
        _run(250.0, 1.3, 1.3, ts=1, head="aaaaaaa"),
        _run(290.0, 1.3, 1.3, ts=2, head="bbbbbbb"),
        _run(300.0, 1.3, 1.3, ts=3, head="bbbbbbb"),
    ]
    best, _ = select_headline(runs, 66, runs[-1], allowed_heads=None)
    assert best["total"] == 290.0


def test_current_code_heads_on_this_repo():
    # On the real repo this returns either None (git unavailable —
    # not expected here), the empty set (dirty worktree mid-session),
    # or a non-empty sha set that includes HEAD when clean.
    import subprocess

    heads = current_code_heads()
    assert heads is None or isinstance(heads, frozenset)
    if heads:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True,
            text=True,
            cwd=str(Path(__file__).resolve().parents[1]),
        ).stdout.strip()
        assert head in heads


def test_threshold_is_between_observed_clusters():
    # healthy phases cluster ~1.3, degraded 2.2-6.0 (sidecar records
    # r4-r14); the constant must split them or the policy is vacuous.
    # r16 re-evaluated the split over 18 runs (probes 1.79-19.8, zero
    # healthy pairs; totals uncorrelated with the probe in the
    # 1.9-3.6 band) and DECLINED to raise it: a higher threshold
    # would only relabel host-inflated runs as healthy without
    # changing the min-selected value — see the HEALTHY_MULTI_S
    # comment block in bench.py for the data.
    assert 1.4 < HEALTHY_MULTI_S < 2.2


def test_unstamped_runs_never_pool_in_exact_head_fallback():
    """r16 ADVICE #4: with git unavailable (allowed_heads=None) and
    THIS run also unstamped (head=None), legacy unstamped runs must
    not compare 'equal' and front the artifact — only this run pools."""
    runs = [
        _run(250.0, 1.3, 1.3, ts=1, head=None),
        _run(300.0, 1.3, 1.3, ts=2, head=None),
    ]
    best, degraded = select_headline(runs, 66, runs[-1])
    assert best["total"] == 300.0

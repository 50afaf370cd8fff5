"""Build-path schedule tripwire (VERDICT r12 #4).

The five heaviest bench lines are index/pipeline BUILDS; their
job/stage counts are deterministic on a fixed tree + sf (verified:
two back-to-back `--record` runs are byte-identical, and the counts
match the r12 A/B evidence — ivfpq 32/65, compact 44/60, jsonl
22/33/104). A genuine build-path regression — an extra scan from a
lost persist, a new exchange — shows up here as a count drift in ONE
noise-free run, instead of the three rounds of wall-clock forensics
the r9→r11 "ANN build regression" investigation cost.

The assert replays `tools/ab_jobs_baseline.json`'s query list in its
recorded order (the session-shared `_pinned` build caches make order
part of the contract) in a FRESH process, so the suite's session
state can't leak into the counts. Jobs/stages are asserted; tasks are
recorded but not (task counts follow file splits, which testdata
regeneration may legitimately change).

The jobs/stages fingerprint is sf-INVARIANT on these five lines:
`tools/ab_jobs_baseline_sf01.json` (recorded at sf0.1, the bench sf)
shows identical jobs/stages to the sf0.001 baseline with only task
counts differing — so this fast sf0.001 gate guards the schedule
shape of the slow bench lines too.
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(ROOT, "tools", "ab_jobs_baseline.json")


def test_build_schedules_match_committed_baseline():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "tools", "ab_jobs.py"),
            "--assert",
            BASELINE,
            ROOT,
        ],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, (
        f"schedule drift vs committed baseline:\n{proc.stdout[-2000:]}"
        f"\n{proc.stderr[-2000:]}"
    )
    assert "match the baseline" in proc.stdout

"""Per-line bench comparison for the round-17 report: baseline run
(the session-1 pre-optimization bench at 0d24864, whose full-metrics
JSON line survives in tools/r17/bench_baseline_1.out) vs a later
bench_full.json. Emits a markdown table sorted by absolute saving.

    python tools/r17/diff_bench.py [after_json] [baseline_out]
"""

from __future__ import annotations

import json
import re
import sys


def full_line(path: str) -> dict:
    """Last full-metrics JSON object in a bench stdout capture."""
    best = None
    with open(path, errors="replace") as f:
        for m in re.finditer(r'\{"metric".*?"sf": [0-9.]+\}', f.read()):
            try:
                d = json.loads(m.group(0))
            except json.JSONDecodeError:
                continue
            if "queries" in d:
                best = d
    if best is None:
        raise SystemExit(f"no full metrics line in {path}")
    return best


def main() -> None:
    after_path = sys.argv[1] if len(sys.argv) > 1 else "bench_full.json"
    base_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "tools/r17/bench_baseline_1.out"
    )
    base = full_line(base_path)
    with open(after_path) as f:
        after = json.load(f)
    bq, aq = base["queries"], after["queries"]
    rows = []
    for name in bq:
        b, a = bq.get(name), aq.get(name)
        if b is None or a is None or b < 0 or a < 0:
            continue
        rows.append((b - a, b, a, name))
    rows.sort(reverse=True)
    print(f"| query | before s | after s | delta s |")
    print("|---|---|---|---|")
    for d, b, a, name in rows:
        print(f"| {name} | {b:.2f} | {a:.2f} | {d:+.2f} |")
    tb = sum(r[1] for r in rows)
    ta = sum(r[2] for r in rows)
    print(
        f"\ntotal (shared lines): before {tb:.1f}s after {ta:.1f}s "
        f"({tb - ta:+.1f}s); probes before="
        f"{base['env_probe']}, after={after['env_probe']}"
    )


if __name__ == "__main__":
    main()

"""Noise-free twin of ab_bench.py for the ANN build-path A/B
(VERDICT r11 #2): instead of wall clocks, count the Spark jobs /
stages / tasks a query schedules — deterministic on a fixed tree +
sf, immune to host contention. A build-path regression that survives
probe normalization should show up here as extra jobs (an extra scan,
a lost persist) or extra stages (a new exchange). Usage:

    python tools/ab_jobs.py <repo_root> <sf_dir> <query> [query ...]
    python tools/ab_jobs.py --record <baseline.json> <root> <sf> <q...>
    python tools/ab_jobs.py --assert <baseline.json> <root>

``--record`` writes the counts to a committed baseline file;
``--assert`` replays the baseline's query list (same order — the
session-shared build caches make order part of the contract) at its
recorded sf and exits 1 on any jobs/stages drift (VERDICT r12 #4: the
tripwire that catches a build-path regression in one noise-free run
instead of three rounds of wall-clock forensics). Tasks are reported
but NOT asserted — task counts follow file splits, which testdata
regeneration may legitimately change; an exchange gained or a persist
lost shows in jobs/stages.
"""

from __future__ import annotations

import json
import os
import sys


def measure(spark, queries, sf_dir: str, names: list[str]) -> dict:
    """Run each query (noop sink) under its own job group and return
    {name: {jobs, stages, tasks}} from the status tracker."""
    sc = spark.sparkContext
    out: dict[str, dict[str, int]] = {}
    for name in names:
        sc.setJobGroup(name, name)
        try:
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # pragma: no cover
            print(f"ab_jobs error {name}: {exc}", file=sys.stderr)
            continue
        finally:
            sc.setJobGroup("", "")
        st = sc.statusTracker()
        jobs = st.getJobIdsForGroup(name)
        n_stages = n_tasks = 0
        for j in jobs:
            ji = st.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        out[name] = {
            "jobs": len(jobs),
            "stages": n_stages,
            "tasks": n_tasks,
        }
    return out


def main() -> None:
    argv = sys.argv[1:]
    mode, baseline_path = "print", None
    if argv and argv[0] in ("--record", "--assert"):
        mode, baseline_path = argv[0].lstrip("-"), argv[1]
        argv = argv[2:]
    root = os.path.abspath(argv[0])
    if mode == "assert":
        with open(baseline_path) as f:
            base = json.load(f)
        sf_dir, names = base["sf_dir"], list(base["counts"])
    else:
        sf_dir, names = argv[1], argv[2:]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _ab_common import bootstrap_tree

    spark, queries = bootstrap_tree(root)
    counts = measure(spark, queries, sf_dir, names)

    for name, c in counts.items():
        print("ABJOBS " + json.dumps({"root": root, "q": name, **c}))

    if mode == "record":
        with open(baseline_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "counts": counts}, f, indent=1)
            f.write("\n")
        print(f"ab_jobs: baseline written to {baseline_path}")
    elif mode == "assert":
        drift = []
        for name, want in base["counts"].items():
            got = counts.get(name)
            if got is None:
                drift.append(f"{name}: errored (baseline {want})")
                continue
            for k in ("jobs", "stages"):
                if got[k] != want[k]:
                    drift.append(
                        f"{name}.{k}: baseline {want[k]} != live {got[k]}"
                    )
        if drift:
            print("ab_jobs DRIFT:\n  " + "\n  ".join(drift))
            sys.exit(1)
        print(f"ab_jobs: {len(counts)} queries match the baseline")


if __name__ == "__main__":
    main()

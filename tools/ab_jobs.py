"""Noise-free twin of ab_bench.py for the ANN build-path A/B
(VERDICT r11 #2): instead of wall clocks, count the Spark jobs /
stages / tasks a query schedules — deterministic on a fixed tree +
sf, immune to host contention. A build-path regression that survives
probe normalization should show up here as extra jobs (an extra scan,
a lost persist) or extra stages (a new exchange). Usage:

    python tools/ab_jobs.py <repo_root> <sf_dir> <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    root = os.path.abspath(sys.argv[1])
    sf_dir = sys.argv[2]
    names = sys.argv[3:]
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _ab_common import bootstrap_tree

    spark, queries = bootstrap_tree(root)
    sc = spark.sparkContext

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
        print(
            "ABJOBS "
            + json.dumps(
                {
                    "root": root,
                    "q": name,
                    "jobs": len(jobs),
                    "stages": n_stages,
                    "tasks": n_tasks,
                }
            )
        )


if __name__ == "__main__":
    main()

"""Per-job profile of one declared query: run it with the noop sink on
a UI-enabled session, then dump every Spark job's wall time, name and
stage/task counts from the local REST API. Usage:

    python tools/r17/profile_query.py q_ann_ivf_compact [sf_dir]

Emits one JSON line per job (submission order) plus a summary, so the
expensive phase of a multi-job build line is attributable without the
UI. Pure diagnostics — never imported by bench or queries.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(
    0,
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
)


def main() -> None:
    name = sys.argv[1]
    sf_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    from mora_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(
        app_name="profile_query",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    fn = queries[name]

    # Same warmup as bench.py so first-run costs don't pollute the map.
    from mora_spark.datasets import load_table
    from pyspark.sql import functions as F
    import pandas as pd  # noqa: F401

    warm = load_table(spark, sf_dir, "events")
    warm.groupBy("event_type").count().write.format("noop").mode(
        "overwrite"
    ).save()

    def _np_warm(s):
        import numpy as np
        import pandas as pd

        m = np.ones((8, 8)) @ np.ones((8, 8))
        return pd.Series(s.to_numpy() + float(m[0, 0]) * 0.0)

    n_workers = spark.sparkContext.defaultParallelism
    warm.limit(n_workers * 100).repartition(n_workers).select(
        F.pandas_udf(_np_warm, "double")(F.col("value")).alias("v")
    ).write.format("noop").mode("overwrite").save()

    ui = spark.sparkContext.uiWebUrl

    def _jobs() -> list[dict]:
        apps = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications")
        )
        app_id = apps[0]["id"]
        return json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
            )
        )

    before_ids = {j["jobId"] for j in _jobs()}
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    jobs = [j for j in _jobs() if j["jobId"] not in before_ids]
    jobs.sort(key=lambda j: j["jobId"])
    rows = []
    for j in jobs:
        sub = j.get("submissionTime", "")
        done = j.get("completionTime", "")

        def _ts(s: str) -> float:
            from datetime import datetime

            return datetime.strptime(
                s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
            ).timestamp()

        dur = _ts(done) - _ts(sub) if sub and done else -1.0
        rows.append(
            {
                "job": j["jobId"],
                "dur_s": round(dur, 3),
                "stages": len(j.get("stageIds", [])),
                "tasks": j.get("numTasks"),
                "desc": (j.get("description") or j.get("name", ""))[:160],
                "name": j.get("name", "")[:100],
            }
        )
    # Stage-level detail for slow jobs: where inside the job the time
    # went (executor run vs scheduler delay vs shuffle).
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    slow_stage_ids = set()
    for j in jobs:
        r = next(x for x in rows if x["job"] == j["jobId"])
        if r["dur_s"] > 1.0:
            slow_stage_ids.update(j.get("stageIds", []))
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    stage_info = {}
    for s in stages:
        if s["stageId"] in slow_stage_ids:
            stage_info[s["stageId"]] = {
                "stage": s["stageId"],
                "name": s.get("name", "")[:100],
                "tasks": s.get("numCompleteTasks"),
                "run_ms": s.get("executorRunTime"),
                "cpu_ms": (s.get("executorCpuTime") or 0) // 1_000_000,
                "gc_ms": s.get("jvmGcTime"),
                "sched_ms": s.get("schedulerDelay", None),
                "input_mb": round((s.get("inputBytes") or 0) / 1e6, 1),
                "shuf_r_mb": round(
                    (s.get("shuffleReadBytes") or 0) / 1e6, 1
                ),
            }
    for r in rows:
        print(json.dumps(r))
        if r["dur_s"] > 1.0:
            j = next(x for x in jobs if x["jobId"] == r["job"])
            for sid in sorted(j.get("stageIds", [])):
                if sid in stage_info:
                    print("   ", json.dumps(stage_info[sid]))
    total_job = sum(r["dur_s"] for r in rows if r["dur_s"] > 0)
    # Attribute the driver-side gap: time between one job's completion
    # and the next job's submission (planning, py4j, driver I/O).
    gaps = []
    for a, b in zip(jobs, jobs[1:]):
        if a.get("completionTime") and b.get("submissionTime"):
            from datetime import datetime

            def _ts2(s: str) -> float:
                return datetime.strptime(
                    s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
                ).timestamp()

            g = _ts2(b["submissionTime"]) - _ts2(a["completionTime"])
            if g > 0.3:
                gaps.append(
                    {
                        "after_job": a["jobId"],
                        "before_job": b["jobId"],
                        "gap_s": round(g, 3),
                        "next_desc": (
                            b.get("description") or b.get("name", "")
                        )[:120],
                    }
                )
    for g in sorted(gaps, key=lambda x: -x["gap_s"])[:8]:
        print("GAP", json.dumps(g))
    # Aggregate ALL stages by name (call site): counts and run time.
    # Stage names survive the streaming job-description override, so
    # this is the per-call-site cost map for foreachBatch sinks.
    new_stage_ids = set()
    for j in jobs:
        new_stage_ids.update(j.get("stageIds", []))
    agg: dict[str, list[float]] = {}
    for s in stages:
        if s["stageId"] not in new_stage_ids:
            continue
        nm = s.get("name", "")[:90]
        a = agg.setdefault(nm, [0, 0.0, 0.0, 0.0])
        a[0] += 1
        a[1] += (s.get("executorRunTime") or 0) / 1e3
        a[2] += (s.get("executorCpuTime") or 0) / 1e9
        a[3] += (s.get("jvmGcTime") or 0) / 1e3
    for nm, (n, run, cpu, gc) in sorted(
        agg.items(), key=lambda kv: -kv[1][1]
    )[:25]:
        print(
            "STAGE",
            json.dumps(
                {"n": n, "run_s": round(run, 2), "cpu_s": round(cpu, 2),
                 "gc_s": round(gc, 2), "name": nm}
            ),
        )
    print(
        json.dumps(
            {
                "query": name,
                "wall_s": round(wall, 3),
                "n_jobs": len(rows),
                "sum_job_s": round(total_job, 3),
                "gap_s": round(wall - total_job, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

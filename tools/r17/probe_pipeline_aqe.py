"""Probe: does AQE pay for itself inside the tiny-micro-batch
foreachBatch sinks? Runs q_corpus_pipeline_jsonl twice in one session
(AQE on, then off) and reports job count + wall for each. Job counts
are the noise-free signal (statusTracker, like tools/ab_jobs.py);
walls carry the usual host caveat. Pure diagnostics.

    python tools/r17/probe_pipeline_aqe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
)


def main() -> None:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    from mora_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="probe_pipeline_aqe")
    spark.sparkContext.setLogLevel("ERROR")
    fn = entry_mod.queries()["q_corpus_pipeline_jsonl"]
    sc = spark.sparkContext

    # warmup (bench discipline)
    from mora_spark.datasets import load_table

    load_table(spark, sf_dir, "events").groupBy("event_type").count(
    ).write.format("noop").mode("overwrite").save()

    for label, aqe in [("on", "true"), ("off", "false"), ("on2", "true"),
                       ("off2", "false")]:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        sc.setJobGroup(label, label)
        t0 = time.time()
        df = fn(spark, sf_dir)
        rows = sorted(map(tuple, df.collect()))
        wall = time.time() - t0
        sc.setJobGroup("", "")
        st = sc.statusTracker()
        jobs = st.getJobIdsForGroup(label)
        import hashlib

        h = hashlib.md5(repr(rows).encode()).hexdigest()[:12]
        print(
            f"AQE={label:4s} jobs={len(jobs):4d} wall={wall:7.2f}s "
            f"rows={len(rows)} hash={h}",
            flush=True,
        )
    spark.conf.set("spark.sql.adaptive.enabled", "true")


if __name__ == "__main__":
    main()

"""A/B harness for the ANN index-build regression (VERDICT r11 #2).

Runs ONE tree (given by its repo root) once: warmup, env probe, the
three suspect lines, env probe again; prints one JSON line. The
driver shell interleaves A/B/A/B/A/B so host drift brackets every
rep. Usage:

    python tools/ab_bench.py <repo_root> <sf_dir> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    root = os.path.abspath(sys.argv[1])
    sf_dir = sys.argv[2]
    names = sys.argv[3:] or [
        "q_ann_ivfpq",
        "q_ann_ivf_compact",
        "q_corpus_pipeline_jsonl",
    ]
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _ab_common import bootstrap_tree

    spark, queries = bootstrap_tree(root)

    from mora_spark.datasets import load_table
    from pyspark.sql import functions as F

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

    def _env_probe() -> dict[str, float]:
        import numpy as np
        from concurrent.futures import ThreadPoolExecutor

        a = np.ones((1500, 1500))
        t0 = time.time()
        for _ in range(3):
            a @ a
        single = time.time() - t0
        bs = [np.ones((500, 500)) for _ in range(n_workers)]
        t0 = time.time()
        with ThreadPoolExecutor(n_workers) as ex:
            list(ex.map(lambda b: [b @ b for _ in range(12)], bs))
        multi = time.time() - t0
        return {"single_s": round(single, 3), "multi_s": round(multi, 3)}

    before = _env_probe()
    timings: dict[str, float] = {}
    for name in names:
        fn = queries.get(name)
        if fn is None:
            timings[name] = -2.0
            continue
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # pragma: no cover
            print(f"ab error {name}: {exc}", file=sys.stderr)
            timings[name] = -1.0
    after = _env_probe()
    print(
        "ABLINE "
        + json.dumps(
            {
                "root": root,
                "queries": timings,
                "probe": {"before": before, "after": after},
            }
        )
    )


if __name__ == "__main__":
    main()

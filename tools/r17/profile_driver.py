"""Driver-side cProfile of one declared query (noop-sunk). Attributes
the wall time that per-job profiling can't see (the 'gap'): py4j
socket waits (JVM planning/actions), driver-side file I/O (pyarrow
footer reads, manifest JSON, os walks), and pure-Python work.

    python tools/r17/profile_driver.py q_name [sf_dir]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys

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

    spark = get_spark(app_name="profile_driver")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    fn = queries[name]

    from mora_spark.datasets import load_table

    warm = load_table(spark, sf_dir, "events")
    warm.groupBy("event_type").count().write.format("noop").mode(
        "overwrite"
    ).save()

    prof = cProfile.Profile()
    prof.enable()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    prof.disable()
    out = io.StringIO()
    stats = pstats.Stats(prof, stream=out)
    stats.sort_stats("cumulative").print_stats(45)
    print(out.getvalue())
    out2 = io.StringIO()
    stats2 = pstats.Stats(prof, stream=out2)
    stats2.sort_stats("tottime").print_stats(25)
    print(out2.getvalue())


if __name__ == "__main__":
    main()

"""Shared bootstrap for the A/B instruments (ab_bench.py, ab_jobs.py).

Both tools must measure a tree through an IDENTICALLY-configured
session — a config drift between the wall-clock and the job-count
instrument would make their evidence incomparable. One bootstrap, two
importers.
"""

from __future__ import annotations

import os
import sys


def bootstrap_tree(root: str):
    """Enter ``root`` (sys.path + cwd), build its session, and return
    ``(spark, queries)`` from the tree's own driver contract."""
    root = os.path.abspath(root)
    sys.path.insert(0, root)
    os.chdir(root)

    from mora_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="ab_tool")
    spark.sparkContext.setLogLevel("ERROR")
    return spark, entry_mod.queries()

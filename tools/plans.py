"""Plan audit: print the formatted physical plan of each headline query
and flag scale smells — missing parquet pushdown, cartesian products,
row-at-a-time Python UDFs in the hot path. Usage::

    python tools/plans.py [query ...]      # default: bench headline set
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMELLS = {
    "CartesianProduct": "cartesian product (unbounded pair blow-up)",
    "BatchEvalPython": "row-at-a-time Python UDF (use pandas_udf)",
}


def main() -> None:
    from bench import HEADLINE
    import __spark_entry__ as entry_mod
    from mora_spark.session import get_spark

    spark = get_spark(app_name="mora_plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    names = sys.argv[1:] or [n for n in HEADLINE if n in queries]
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    flagged = 0
    for name in names:
        # streaming/store queries execute jobs on construction; plans of
        # their final batch DataFrames are still audited.
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        hits = [msg for pat, msg in SMELLS.items() if pat in plan]
        scans = plan.count("Scan parquet")
        pushed = plan.count("PushedFilters: [")
        unpushed = plan.count("PushedFilters: []")
        print(f"== {name}: scans={scans} pushdown={pushed - unpushed}"
              f"{' | ' + '; '.join(hits) if hits else ''}")
        for h in hits:
            flagged += 1
            print(f"   SMELL: {h}")
        if "-v" in sys.argv:
            print(plan)
    print(f"\n{flagged} smells across {len(names)} plans")


if __name__ == "__main__":
    main()

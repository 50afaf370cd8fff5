"""Capture .explain('formatted') for declared queries into plans/r17/.

    python tools/r17/capture_plans.py <suffix> <out_dir> q_a q_b ...

Runs from whatever repo root it lives under (so a worktree pinned at
the pre-optimization commit produces the *_before.txt files and the
working tree the *_after.txt ones). Building the returned DataFrame
executes any eager build steps the query performs (index builds,
streaming drains) — that is the declared query's own shape.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, ROOT)


def main() -> None:
    suffix, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from mora_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    for name in names:
        fn = queries[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # pragma: no cover
            plan = f"ERROR capturing {name}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()

"""Capture .explain('formatted') for two INTERNAL frames whose plans
carry this round's claims but never appear in a declared query's
returned plan (the declared plan only shows the search/read side):

- the IVFPQ cells-write frame (fix 13: fused assign+encode — the
  ArrowEvalPython count is the claim), and
- the MinHash verified-pair cache frame (fixes 3/12: the persisted
  width — the top Project's column list is the claim).

    python tools/r17/capture_internal_plans.py <suffix> <out_dir>

Run from the pre-optimization worktree for *_before.txt and the
working tree for *_after.txt (the capture_plans.py convention).
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, ROOT)


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    suffix, out_dir = sys.argv[1], sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from mora_spark.session import get_spark

    spark = get_spark(app_name="capture_internal_plans")
    spark.sparkContext.setLogLevel("ERROR")

    from mora_spark.datasets import load_table
    from mora_spark.llm.dedup import _minhash_groups_verified
    from mora_spark.llm.simsearch import build_ivfpq_index
    from mora_spark.queries.vectors import _planted_pq, _emb

    e = _planted_pq(_emb(spark, sf_dir))
    _, _, assigned = build_ivfpq_index(e, train_iters=0)
    with open(
        os.path.join(out_dir, f"ivfpq_cells_write_{suffix}.txt"), "w"
    ) as f:
        f.write(_explain(assigned))

    docs = load_table(spark, sf_dir, "documents")
    _, verified = _minhash_groups_verified(
        docs, "text", "doc_id", 0.5
    )
    with open(
        os.path.join(out_dir, f"lsh_verified_cache_{suffix}.txt"), "w"
    ) as f:
        f.write(_explain(verified))
    print("wrote", out_dir, suffix)


if __name__ == "__main__":
    main()

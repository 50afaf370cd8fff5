"""Plan-quality regression gate.

Turns the per-round manual plan audit (tools/plans.py) into enforced
invariants: no declared batch query may plan a CartesianProduct or a
row-at-a-time Python UDF (BatchEvalPython), and the selective-scan
queries must push their predicates into the parquet scan. Plans are
built at sf0.001 — planning only, nothing is executed for the smell
checks.

Exclusions are explicit and narrow: the three declared exact
verification twins are quadratic by construction (SURVEY perf notes;
they exist to measure the scale paths' recall), and streaming/store
queries execute side-effecting jobs at construction so they are
audited by their own behavioral tests instead.

Plan-string assert audit (r15, VERDICT r14 wrong #2): every site in
tests/ asserting against plan text was reviewed for the two vacuity
traps (substring over-match a la 'shard' in 'gshard'; reading a plan
AFTER an eager localCheckpoint materialized the interesting subtree
away). Findings: test_store.py's year-pruning assert was vacuous
("year" matched ReadSchema on unpruned scans too) — fixed to a
word-boundary PartitionFilters match; all other sites clean:
test_plans.py (operator-token smells, structured PushedFilters
lines), test_classifier.py:114 (same smells), test_skew.py:95
(negative assert — over-match fails loudly, never passes vacuously),
test_curation.py:455/572 (unique operator tokens on lazy plans),
test_pq.py / test_orc.py / test_simsearch.py / test_bucketed.py
(structured per-line parsing), test_dedup_increment.py (captured
pre-checkpoint seam + word-boundary, the fa0ef69 fix itself). The
only eager-checkpoint-feeding plan assert is the dedup candidate
plan, which uses the capture seam.
"""

from __future__ import annotations

import pytest

from mora_spark.queries import collect_registry

SF_DIR = "/root/testdata/sf0.001"

# Lazily-planned batch queries covering every operator family that the
# bench headlines: relational, timeseries, text, curation, vectors.
SMELL_QUERIES = [
    "q_tpch_q1",
    "q_tpch_q2",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q9",
    "q_tpch_q11",
    "q_tpch_q12",
    "q_tpch_q16",
    "q_tpch_q20",
    "q_skew_join",
    "q_funnel",
    "q_retention_cohort",
    "q_seasonality",
    "q_topk_volume",
    "q_user_stats",
    "q_sessionize",
    "q_grouping_sets",
    "q_resample_5m",
    "q_asof_trades",
    "q_interval_join",
    "q_full_outer",
    "q_mtf_join",
    "q_resample_anchored",
    "q_stochastic",
    "q_donchian",
    "q_drawdown",
    "q_heikin_ashi",
    "q_anomaly_zscore",
    "q_lm_score",
    "q_ann_sq8",
    "q_text_stats",
    "q_lang_id",
    "q_quality_rules",
    "q_stratified_sample",
    "q_train_shards",
    "q_minhash_lsh",
    "q_cluster_best",
    "q_dedup_lines",
    "q_dup_spans",
    "q_embed_neardup",
    "q_ann_srp",
    "q_ann_pq",
    "q_domain_mix_temp",
    # r9: dHash near-dup is lazily planned (mapInPandas + banded join);
    # q_semdedup / q_ann_filtered execute jobs at construction (CC
    # loop / index build) and are plan-audited in their own tests
    # (tests/test_pq.py pins the filtered stage-1 scan).
    "q_media_neardup",
    # r10: the SQ8 filtered tier is fully lazy (scan-stage quantize +
    # window ranks); q_ann_filtered_ivf / q_media_cluster_best execute
    # jobs at construction (index build / CC loop) and are audited by
    # their oracle rows + operator tests instead.
    "q_ann_filtered_sq8",
]

# Declared exact-verification twins: quadratic/cross-join by design,
# never the headline path. Documented, not smell-checked.
DECLARED_QUADRATIC = {
    "q_simsearch_topk",
    "q_embed_neardup_exact",
    "q_jaccard_pairs",
}

# Selective scans that must reach the parquet reader as PushedFilters.
# q_ann_filtered_sq8 pins the r10 filtered-search contract: the
# metadata predicate must reach the embeddings scan, not hang above
# the quantization expressions.
PUSHDOWN_QUERIES = ["q_range_scan", "q_tpch_q6", "q_ann_filtered_sq8"]

SMELLS = ("CartesianProduct", "BatchEvalPython")


def _plan(spark, name: str) -> str:
    queries, _ = collect_registry()
    df = queries[name](spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


@pytest.mark.parametrize("name", SMELL_QUERIES)
def test_no_plan_smells(spark, name):
    plan = _plan(spark, name)
    for smell in SMELLS:
        assert smell not in plan, f"{name}: {smell} in physical plan"


@pytest.mark.parametrize("name", PUSHDOWN_QUERIES)
def test_filters_pushed_to_scan(spark, name):
    plan = _plan(spark, name)
    pushed = [
        ln
        for ln in plan.splitlines()
        if "PushedFilters: [" in ln and "PushedFilters: []" not in ln
    ]
    assert pushed, f"{name}: no non-empty PushedFilters in scan:\n{plan[:1500]}"


def test_skew_join_plans_salted_shape(spark):
    """q_skew_join must actually join on the salt: the hot key alone
    never appears as the full join key set."""
    plan = _plan(spark, "q_skew_join")
    assert "__salt" in plan, f"salt column missing from plan:\n{plan[:1500]}"


def test_exclusion_list_is_exact():
    """The exclusion list is pinned to EXACTLY the three declared
    verification twins — adding a name to DECLARED_QUADRATIC to dodge
    the smell gate fails here until this pinned set is consciously
    edited too."""
    assert DECLARED_QUADRATIC == {
        "q_simsearch_topk",
        "q_embed_neardup_exact",
        "q_jaccard_pairs",
    }
    queries, _ = collect_registry()
    missing = DECLARED_QUADRATIC - queries.keys()
    assert not missing, f"excluded queries vanished: {missing}"

"""Declared-query registry — the t2 correctness contract.

Each domain module exposes ``QUERIES: dict[name, fn(spark, sf_dir) ->
DataFrame]`` and ``ORACLES: dict[name, duckdb_sql]``. ``__spark_entry__``
merges them for the driver. Column names are aliased identically on both
sides (the driver's compare sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


# The driver's correctness gate verifies the FIRST 50 registry entries
# only (round-1 evidence: CORRECTNESS_r01.json stops at entry 50 in
# registry order). PRIORITY pins the round-16 window (the r15 verdict's
# "Next round" #1):
# - the FULL 27-row r12 remainder — the oldest evidence tier in the
#   union after the r15 rotation (the exact list the r15 verdict
#   pinned here and independently recomputed);
# - q_corpus_pipeline_seeded, NEW this round (r15 verdict #5: the
#   seeded one-job pipeline promoted to an oracle row — derived
#   family, family-follows-seed, quarantine mid-stream);
# - 19 oldest r13 rows, staleness-ordered by (latest evidence BEFORE
#   r13, first-green): the 3 rows whose ONLY green is r13
#   (q_ann_ivf_derived, q_quality_classifier_labels,
#   q_semdedup_derived), then the 16 rows whose prior evidence dates
#   to r8;
# - 3 changed-machinery guards for THIS round's store-manifest port
#   (link(2) CAS -> per-filesystem CAS seam): q_store_scheme_roundtrip
#   (NEW — the roundtrip contract over a file:// root, exercising the
#   Hadoop-FS metadata route the port added; same oracle as the POSIX
#   twin), q_store_maintenance (POSIX lifecycle: checkpoint marker,
#   compact, vacuum, expire through the seam), and q_store_diff (also
#   r13-tier — time travel reads through the ported log).
# After this window greens, the r12 tier is fully drained and the
# oldest evidence tier becomes r13 (3-round horizon).
PRIORITY: tuple[str, ...] = (
    # the 27-row r12 remainder
    "q_approx_profile",
    "q_boilerplate",
    "q_bucketed_join",
    "q_centroid_dist",
    "q_data_profile",
    "q_drift_psi",
    "q_embedding_norms",
    "q_gapfill_interp",
    "q_multimodal_meta",
    "q_quality_rules",
    "q_store_bucketed_join",
    "q_stream_candles",
    "q_stream_csv",
    "q_stream_drawdown",
    "q_stream_drift",
    "q_stream_ema",
    "q_stream_enrich",
    "q_stream_ingest",
    "q_stream_join",
    "q_stream_jsonl",
    "q_stream_orc",
    "q_stream_store_asof",
    "q_stream_store_merge",
    "q_stream_store_rollup",
    "q_stream_wire",
    "q_tpch_q1",
    "q_vocab_topk",
    # new this round
    "q_corpus_pipeline_seeded",
    # 19 oldest r13 rows
    "q_ann_ivf_derived",
    "q_quality_classifier_labels",
    "q_semdedup_derived",
    "q_cube_orders",
    "q_gapfill",
    "q_json_props",
    "q_lag_lead",
    "q_order_rank",
    "q_pivot_daily",
    "q_resample_1h",
    "q_revenue_by_nation",
    "q_rolling_corr",
    "q_rollup_acctbal",
    "q_semi_anti",
    "q_sma_roll",
    "q_tpch_q12",
    "q_tpch_q3",
    "q_user_stats",
    "q_validate_candles",
    # changed-machinery guards (store manifest log ported this round)
    "q_store_diff",
    "q_store_scheme_roundtrip",
    "q_store_maintenance",
)
# Demoted below the window: everything else keeps a green CORRECTNESS
# row from r13, r14, or r15. Round 17's rotation target — the r13
# remainder after this window (23 rows):
# q_ann_filtered, q_ann_ivf, q_ann_ivfpq, q_ann_opq, q_ann_pq,
# q_ann_srp, q_domain_mix, q_domain_mix_temp, q_embed_neardup,
# q_embed_neardup_exact, q_grouping_sets, q_pack_sequences,
# q_quality_classifier, q_resample_anchored, q_semdedup,
# q_simsearch_topk, q_store_diff_bucketed, q_stream_ann_ingest,
# q_stream_media_dedup, q_stream_semdedup, q_stream_sessions,
# q_stream_sliding, q_train_shards — plus the oldest r14 rows in the
# spare slots.


def collect_registry() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from mora_spark.queries import (
        curation,
        multimodal,
        relational,
        relational2,
        store,
        streaming,
        text,
        timeseries,
        vectors,
    )

    merged: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in (
        timeseries,
        relational,
        relational2,
        text,
        curation,
        vectors,
        streaming,
        store,
        multimodal,
    ):
        dup = merged.keys() & mod.QUERIES.keys()
        if dup:  # a silent override would skip a correctness check
            raise ValueError(f"duplicate query names across modules: {dup}")
        if not mod.ORACLES.keys() <= mod.QUERIES.keys():
            raise ValueError(
                f"oracle without query in {mod.__name__}: "
                f"{mod.ORACLES.keys() - mod.QUERIES.keys()}"
            )
        merged.update(mod.QUERIES)
        oracles.update(mod.ORACLES)

    missing = [n for n in PRIORITY if n not in merged]
    if missing:
        raise ValueError(f"PRIORITY names not in registry: {missing}")
    queries: dict[str, QueryFn] = {n: merged[n] for n in PRIORITY}
    queries.update(merged)  # the rest keep module order, after PRIORITY
    return queries, oracles

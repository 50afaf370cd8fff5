"""Perceptual near-dup (dHash) over binary payloads."""

from __future__ import annotations

from pyspark.sql import functions as F

from mora_spark.datasets import load_table
from mora_spark.llm.multimodal import (
    DHASH_BITS,
    dhash_media,
    media_from_documents,
    media_neardup_pairs,
)


def _media(spark, sf_dir):
    return media_from_documents(load_table(spark, sf_dir, "documents"))


def test_dhash_deterministic_and_copy_invariant(spark, sf_dir):
    """Same payload -> same 56-bit hash regardless of partitioning;
    an exact byte copy hashes identically (hamming 0)."""
    m = _media(spark, sf_dir)
    h1 = {r["media_id"]: r["dhash"] for r in dhash_media(m).collect()}
    h2 = {
        r["media_id"]: r["dhash"]
        for r in dhash_media(m.repartition(13)).collect()
    }
    assert h1 == h2 and h1
    assert all(0 <= h < (1 << DHASH_BITS) for h in h1.values())
    copies = m.select(
        (F.col("media_id") + 10_000).alias("media_id"), "payload"
    )
    hc = {
        r["media_id"] - 10_000: r["dhash"]
        for r in dhash_media(copies).collect()
    }
    assert hc == h1


def test_one_byte_perturbation_stays_in_hamming_budget(spark, sf_dir):
    """A single-byte edit lands in one grid cell and can flip at most
    its two adjacent comparisons -> hamming <= 2 structurally."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    near = docs.select(
        "doc_id",
        F.concat(F.lit("z"), F.expr("substring(text, 2)")).alias("text"),
    )
    h0 = {
        r["media_id"]: r["dhash"]
        for r in dhash_media(media_from_documents(docs)).collect()
    }
    h1 = {
        r["media_id"]: r["dhash"]
        for r in dhash_media(media_from_documents(near)).collect()
    }
    assert set(h0) == set(h1)
    for mid, h in h0.items():
        assert bin(h ^ h1[mid]).count("1") <= 2


def test_banding_is_lossless_vs_brute_force(spark, sf_dir):
    """The pigeonhole banding emits EXACTLY the brute-force pair set
    (every pair once), verified against an all-pairs replay over the
    collected signatures."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plant = docs.select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    m = media_from_documents(docs.unionByName(plant))
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in media_neardup_pairs(m, max_hamming=2).collect()
    )
    sig = sorted(
        (r["media_id"], r["dhash"]) for r in dhash_media(m).collect()
    )
    want = []
    for i, (ida, ha) in enumerate(sig):
        for idb, hb in sig[i + 1:]:
            d = bin(ha ^ hb).count("1")
            if d <= 2:
                want.append((ida, idb, d))
    assert got == sorted(want)
    assert len(got) >= docs.count()  # every planted copy pairs up


def test_media_neardup_no_pairs_is_empty_not_error(spark, sf_dir):
    """A corpus with no pairs inside the Hamming budget returns an
    empty frame with the contract schema (max_hamming=0 on distinct
    payloads: only exact dHash collisions would pair)."""
    docs = load_table(spark, sf_dir, "documents").limit(20)
    out = media_neardup_pairs(
        media_from_documents(docs.select("doc_id", "text")),
        max_hamming=0,
    )
    assert out.columns == ["id_a", "id_b", "hamming"]
    assert all(r["hamming"] == 0 for r in out.collect())


def test_stream_media_dedup_batch_replay_is_idempotent(
    spark, sf_dir, tmp_path
):
    """foreachBatch is at-least-once: re-invoking a batch step must
    recompute the same pairs against the same batch_id<current index
    snapshot and overwrite its own epoch dirs — state identical to the
    single-delivery run, never duplicated."""
    import os

    from mora_spark.streaming.media import dedup_media_batch

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = media_from_documents(docs).select("media_id", "payload")
    copies = base.select(
        (F.col("media_id") + 50_000).alias("media_id"), "payload"
    )
    index_dir = str(tmp_path / "sig_index")
    pairs_dir = str(tmp_path / "dup_pairs")
    dedup_media_batch(spark, base, 0, index_dir, pairs_dir)
    dedup_media_batch(spark, copies, 1, index_dir, pairs_dir)

    def state():
        pairs = sorted(
            (r["media_id"], r["dup_id"], r["hamming"], r["src"])
            for r in spark.read.parquet(pairs_dir).collect()
        )
        kept = sorted(
            (r["media_id"], r["dhash"], r["batch_id"])
            for r in spark.read.parquet(index_dir).collect()
        )
        return pairs, kept

    once = state()
    dedup_media_batch(spark, copies, 1, index_dir, pairs_dir)  # replay
    assert state() == once
    pairs, kept = once
    # every exact copy pairs against its kept original at hamming 0
    corpus = {(m, d) for m, d, h, s in pairs if s == "corpus" and h == 0}
    n = docs.count()
    assert len(corpus) >= n
    assert all(b == 0 for _, _, b in kept)  # no copy entered the index


def test_banded_hamming_pairs_lossless_across_budgets(spark):
    """The shared pigeonhole helper (llm/hamming.py) is lossless for
    EVERY budget it's used at: on seeded random 56-bit signatures plus
    planted near-pairs at each distance, the banded equi-join emits
    exactly the brute-force pair set — once per pair."""
    import numpy as np

    from mora_spark.llm.hamming import banded_hamming_pairs

    rng = np.random.default_rng(0)
    sigs = list(rng.integers(0, 1 << 56, size=200, dtype=np.int64))
    # plant near pairs at distances 1..3 off the first few signatures
    for d in (1, 2, 3):
        base = int(sigs[d])
        flipped = base
        for b in range(d):
            flipped ^= 1 << int(rng.integers(0, 56))
        sigs.append(np.int64(flipped))
    rows = [(i, int(s)) for i, s in enumerate(sigs)]
    df = spark.createDataFrame(rows, "sid long, h long")
    for budget in (1, 2, 3):
        got = sorted(
            (r["id_a"], r["id_b"], r["hamming"])
            for r in banded_hamming_pairs(
                df, sig_col="h", n_bits=56, max_hamming=budget
            ).collect()
        )
        want = []
        for i in range(len(sigs)):
            for j in range(i + 1, len(sigs)):
                d = bin(int(sigs[i]) ^ int(sigs[j])).count("1")
                if d <= budget:
                    want.append((i, j, d))
        assert got == sorted(want), f"budget {budget} diverged"


def test_media_cluster_best_keeps_original_per_planted_triple(
    spark, sf_dir
):
    """Each planted triple {original, exact copy, near copy} forms one
    cluster; all members share the payload byte size, so the
    quality-canonical keeper is the min id — the original."""
    from mora_spark.llm.multimodal import media_cluster_best
    from mora_spark.queries.multimodal import (
        MEDIA_MAX_HAMMING,
        _planted_media,
    )

    docs = load_table(spark, sf_dir, "documents").limit(200)
    out = media_cluster_best(
        _planted_media(docs), max_hamming=MEDIA_MAX_HAMMING
    ).collect()
    n = docs.count()
    assert len(out) <= n  # every original anchors at most one cluster
    pure_triples = 0
    for r in out:
        assert r["cluster_size"] >= 3  # original + copy + near copy
        if r["cluster_size"] == 3:
            # A pure triple's members all share the payload byte size,
            # so the canonical is the min id (the original). A natural
            # dHash collision can merge triples of DIFFERENT docs —
            # then the keeper is legitimately the larger doc's min id,
            # so the equality only holds on unmerged clusters.
            assert r["keep_media_id"] == r["cluster_id"]
            pure_triples += 1
    assert pure_triples > 0


def test_compact_epoch_index_preserves_dedup_behavior(
    spark, sf_dir, tmp_path
):
    """Compacting the batch_id-epoch signature index (one file set,
    batch_id=-1) must not change what a later batch drops: the same
    micro-batch deduped against raw vs compacted index emits identical
    pairs and survivors."""
    import os

    from mora_spark.streaming.media import dedup_media_batch
    from mora_spark.streaming.pairdedup import compact_epoch_index

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = media_from_documents(docs).select("media_id", "payload")
    b0 = base.where(F.col("media_id") % 2 == 0)
    b1 = base.where(F.col("media_id") % 2 == 1)
    raw_ix = str(tmp_path / "raw_ix")
    dedup_media_batch(spark, b0, 0, raw_ix, str(tmp_path / "p0"))
    dedup_media_batch(spark, b1, 1, raw_ix, str(tmp_path / "p0"))
    comp_ix = str(tmp_path / "comp_ix")
    n = compact_epoch_index(spark, raw_ix, comp_ix)
    assert n == spark.read.parquet(raw_ix).count()
    assert os.path.isdir(os.path.join(comp_ix, "batch_id=-1"))
    # identical membership
    key = lambda df: sorted(  # noqa: E731
        (r["media_id"], r["dhash"])
        for r in df.select("media_id", "dhash").collect()
    )
    assert key(spark.read.parquet(comp_ix)) == key(
        spark.read.parquet(raw_ix)
    )
    # a new-epoch batch (copies of b0 at +500_000 — past the
    # media_from_documents plant bands at +100k/+200k, so batch ids
    # stay disjoint from index ids at any fixture size) drops
    # identically
    nxt = b0.select(
        (F.col("media_id") + 500_000).alias("media_id"), "payload"
    )
    outs = []
    for ix in (raw_ix, comp_ix):
        pd_ = str(tmp_path / f"pairs_{os.path.basename(ix)}")
        # batch_id=2 vs raw (snapshot sees 0,1); batch_id=0 vs
        # compacted (snapshot sees -1) — the fresh-epoch contract
        bid = 2 if ix == raw_ix else 0
        dedup_media_batch(spark, nxt, bid, ix, pd_)
        outs.append(
            sorted(
                (r["media_id"], r["dup_id"], r["hamming"], r["src"])
                for r in spark.read.parquet(pd_).collect()
            )
        )
    assert outs[0] == outs[1] and outs[0]

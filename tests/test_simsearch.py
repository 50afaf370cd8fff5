"""ANN (signed-random-projection LSH) quality vs the exact baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from mora_spark.datasets import load_table
from mora_spark.llm.simsearch import srp_topk, with_srp_bucket
from mora_spark.queries.vectors import q_simsearch_topk


def test_bucket_is_deterministic(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    b1 = {r["vec_id"]: r["bucket"]
          for r in with_srp_bucket(e, n_bits=6).collect()}
    b2 = {r["vec_id"]: r["bucket"]
          for r in with_srp_bucket(e, n_bits=6).collect()}
    assert b1 == b2
    assert 0 < len(set(b1.values())) <= 64


def test_srp_recall_vs_brute_force(spark, sf_dir):
    exact = q_simsearch_topk(spark, sf_dir).collect()
    want = {(r["query_id"], r["neighbor_id"]) for r in exact}

    e = load_table(spark, sf_dir, "embeddings")
    approx = srp_topk(e, query_ids=[0, 1, 2, 3, 4], k=5, n_bits=4).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in approx}

    recall = len(want & got) / len(want)
    # 4-bit SRP on 64-dim synthetic vectors: same-bucket probing must
    # recover a meaningful share of true neighbors (and is ~16x cheaper
    # than the scan). Bound is intentionally loose — quality depends on
    # the synthetic geometry.
    assert recall >= 0.2, f"recall {recall}"
    # Scores that ARE found must equal the exact scores.
    exact_scores = {(r["query_id"], r["neighbor_id"]): r["score"] for r in exact}
    for r in approx:
        k = (r["query_id"], r["neighbor_id"])
        if k in exact_scores:
            assert abs(r["score"] - exact_scores[k]) < 1e-9


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    from mora_spark.llm.simsearch import ivf_topk

    exact = q_simsearch_topk(spark, sf_dir).collect()
    want = {(r["query_id"], r["neighbor_id"]) for r in exact}
    exact_scores = {(r["query_id"], r["neighbor_id"]): r["score"] for r in exact}

    e = load_table(spark, sf_dir, "embeddings")
    approx = ivf_topk(
        e, query_ids=[0, 1, 2, 3, 4], k=5, n_cells=16, n_probe=4
    ).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in approx}

    # probing 4/16 cells scans ~25% of the corpus; near-orthogonal
    # synthetic vectors make cell assignment noisy, so the bound is
    # loose — the hard property is exactness of found scores below.
    recall = len(want & got) / len(want)
    assert recall >= 0.2, f"recall {recall}"
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert abs(r["score"] - exact_scores[key]) < 1e-9


def test_ivf_training_improves_or_matches_recall(spark, sf_dir):
    """Two Lloyd iterations must not lose recall vs untrained random
    centroids at the same probe budget (on this geometry it gains)."""
    from mora_spark.llm.simsearch import ivf_topk, train_ivf_centroids

    exact = q_simsearch_topk(spark, sf_dir).collect()
    want = {(r["query_id"], r["neighbor_id"]) for r in exact}
    e = load_table(spark, sf_dir, "embeddings")

    def recall(train_iters: int) -> float:
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                e, query_ids=[0, 1, 2, 3, 4], k=5, n_cells=16, n_probe=4,
                train_iters=train_iters,
            ).collect()
        }
        return len(want & got) / len(want)

    assert recall(2) >= recall(0)
    # training is deterministic: same data -> same centroids
    c1 = train_ivf_centroids(e, n_cells=8, n_iter=2)
    c2 = train_ivf_centroids(e, n_cells=8, n_iter=2)
    assert (c1 == c2).all()


def test_neardup_lsh_subset_of_exact(spark, sf_dir):
    """Every SRP-prefiltered near-dup pair must appear in the exact
    all-pairs result with an identical score (the bucket filter can
    only drop pairs, never invent or rescore them)."""
    from mora_spark.llm.simsearch import embedding_neardup_pairs

    e = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in embedding_neardup_pairs(e, threshold=0.3, n_bits=0).collect()
    }
    # 2 bits: a pair at cos 0.3 (θ≈72°) survives both hyperplanes with
    # prob (1-θ/π)² ≈ 0.36 — enough signal for a stable lower bound.
    approx = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in embedding_neardup_pairs(e, threshold=0.3, n_bits=2).collect()
    }
    assert exact, "exact near-dup result unexpectedly empty"
    assert set(approx) <= set(exact)
    for k, v in approx.items():
        assert abs(v - exact[k]) < 1e-9
    # close pairs land in the same bucket often enough to be useful
    assert len(approx) / len(exact) >= 0.2


def test_multimodal_features_deterministic(spark, sf_dir):
    from mora_spark.llm.multimodal import extract_features, media_from_documents

    m = media_from_documents(load_table(spark, sf_dir, "documents"))
    f1 = {r["media_id"]: (r["width"], r["height"], r["n_frames"])
          for r in extract_features(m).collect()}
    f2 = {r["media_id"]: (r["width"], r["height"], r["n_frames"])
          for r in extract_features(m).collect()}
    assert f1 == f2
    kinds = {r["kind"] for r in m.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def _png_1x1() -> bytes:
    """Minimal valid 1x1 RGB PNG, built from the public spec (IHDR +
    IDAT + IEND, zlib-deflated scanline) — the fixture for the runtime
    codec probe without shipping binary blobs in the test file."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)  # 1x1, 8-bit RGB
    idat = zlib.compress(b"\x00\xff\x00\x00")  # filter None + red pixel
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def test_decode_dims_falls_back_deterministically():
    """Undecodable payloads (and non-image kinds) take the stub path
    whether or not PIL is installed — text bytes are never a valid
    image, so in-container and real-cluster behavior agree here."""
    from mora_spark.llm.multimodal import _decode_dims, _fake_decode

    payload = b"just some document text, not an image"
    assert _decode_dims(payload, "image") == _fake_decode(payload, "image")
    assert _decode_dims(payload, "audio") == _fake_decode(payload, "audio")
    assert _decode_dims(b"", "image") == _fake_decode(b"", "image")


def test_decode_dims_uses_real_codec_when_present():
    """On a cluster with PIL installed the same operator decodes real
    images (skipped in this codec-less container)."""
    import pytest

    pytest.importorskip("PIL")
    from mora_spark.llm.multimodal import _decode_dims

    assert _decode_dims(_png_1x1(), "image")[:2] == (1, 1)


def test_ivf_index_roundtrip_equals_direct(spark, sf_dir, tmp_path):
    """Searching the persisted cell-partitioned index returns exactly
    the direct ivf_topk results (training is deterministic, so the
    parquet round-trip must be lossless end-to-end)."""
    from mora_spark.datasets import load_table
    from mora_spark.llm.simsearch import (
        build_ivf_index,
        ivf_index_topk,
        ivf_topk,
        save_ivf_index,
    )

    e = load_table(spark, sf_dir, "embeddings")
    direct = ivf_topk(
        e, query_ids=[0, 1, 2], k=5, n_cells=16, n_probe=4, train_iters=2
    )
    save_ivf_index(
        *build_ivf_index(e, n_cells=16, train_iters=2), str(tmp_path / "ix")
    )
    via_index = ivf_index_topk(
        spark, str(tmp_path / "ix"), query_ids=[0, 1, 2], k=5, n_probe=4
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, via_index.collect())
    )


def test_ivf_index_add_equals_rebuild(spark, sf_dir, tmp_path):
    """Incremental maintenance is lossless: under FIXED centroids
    (train_iters=0 — both layouts share the deterministic hyperplane
    cells), building on A then ivf_index_add(B) must answer queries
    identically to building once on A ∪ B."""
    from mora_spark.datasets import load_table
    from mora_spark.llm.simsearch import (
        build_ivf_index,
        ivf_index_add,
        ivf_index_topk,
        save_ivf_index,
    )

    e = load_table(spark, sf_dir, "embeddings")
    old = e.where(F.col("vec_id") % 3 != 0)  # queries 1,2 stay indexed
    new = e.where(F.col("vec_id") % 3 == 0)
    full, incr = str(tmp_path / "full"), str(tmp_path / "incr")
    save_ivf_index(*build_ivf_index(e, n_cells=16, train_iters=0), full)
    save_ivf_index(*build_ivf_index(old, n_cells=16, train_iters=0), incr)
    ivf_index_add(spark, incr, new)
    a = ivf_index_topk(spark, full, query_ids=[1, 2], k=5, n_probe=4)
    b = ivf_index_topk(spark, incr, query_ids=[1, 2], k=5, n_probe=4)
    rows_a = sorted(map(tuple, a.collect()))
    assert rows_a == sorted(map(tuple, b.collect()))
    assert len(rows_a) == 10  # k results for both queries


def test_ivf_compact_bounds_files_and_preserves_results(spark, sf_dir, tmp_path):
    """The N-increment probe of VERDICT r4 #5: after 6 incremental adds
    the index holds ~7 file sets per touched cell; compaction rewrites
    it at EXACTLY one file per cell, search results are unchanged, and
    a balanced index does not trigger the retrain branch."""
    from mora_spark.datasets import load_table
    from mora_spark.llm.simsearch import (
        build_ivf_index,
        ivf_index_add,
        ivf_index_compact,
        ivf_index_health,
        ivf_index_topk,
        save_ivf_index,
    )

    e = load_table(spark, sf_dir, "embeddings")
    base = e.where(F.col("vec_id") % 8 < 2)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    save_ivf_index(*build_ivf_index(base, n_cells=8, train_iters=1), src)
    for m in range(2, 8):  # six increments, one file set each
        ivf_index_add(spark, src, e.where(F.col("vec_id") % 8 == m))
    before = ivf_index_health(spark, src)
    assert before["max_files_per_cell"] >= 4  # fragmented
    pre = sorted(
        map(tuple, ivf_index_topk(spark, src, [1, 2], k=5, n_probe=4).collect())
    )
    stats = ivf_index_compact(spark, src, dst)
    after = ivf_index_health(spark, dst)
    assert after["max_files_per_cell"] == 1
    assert after["rows"] == before["rows"] == stats["rows"]
    post = sorted(
        map(tuple, ivf_index_topk(spark, dst, [1, 2], k=5, n_probe=4).collect())
    )
    assert pre == post
    assert stats["retrained"] is False  # uniform corpus stays in band


def test_ivf_compact_retrains_on_imbalance(spark, sf_dir, tmp_path):
    """When ingest drift piles the corpus into few cells (untrained
    hyperplane centroids on a shifted corpus), compaction retrains and
    the rebalanced index still answers with full per-query result sets."""
    import numpy as np

    from mora_spark.datasets import load_table
    from mora_spark.llm.simsearch import (
        build_ivf_index,
        ivf_index_compact,
        ivf_index_health,
        ivf_index_topk,
        save_ivf_index,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        # Shift every vector into one orthant: untrained sign-pattern
        # centroids collapse most of the corpus into very few cells.
        F.transform("embedding", lambda x: F.abs(x) + 1.0).alias("embedding"),
    )
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    save_ivf_index(*build_ivf_index(e, n_cells=8, train_iters=0), src)
    before = ivf_index_health(spark, src)
    stats = ivf_index_compact(spark, src, dst, retrain_imbalance=2.0)
    assert stats["retrained"] is True
    after = ivf_index_health(spark, dst)
    assert after["imbalance"] < before["imbalance"]
    assert after["rows"] == before["rows"]
    got = ivf_index_topk(spark, dst, [1, 2], k=5, n_probe=4)
    counts = {r["query_id"]: 0 for r in got.collect()}
    for r in got.collect():
        counts[r["query_id"]] += 1
    assert all(v == 5 for v in counts.values())


def test_quantize_embeddings_error_bound(spark, sf_dir):
    """Symmetric int8 grid guarantee: every dequantized element is
    within scale/2 of the original (no element saturates beyond the
    per-vector max by construction), and the quantized top-k overlaps
    the exact top-k."""
    from mora_spark.datasets import load_table
    from mora_spark.llm.simsearch import quantize_embeddings

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    qd = quantize_embeddings(e)
    err = qd.select(
        F.array_max(
            F.zip_with(
                F.col("qvec"),
                F.col("embedding"),
                lambda q, x: F.abs(
                    q.cast("double") * F.col("scale") - x.cast("double")
                )
                - F.col("scale") / 2,
            )
        ).alias("excess")
    )
    worst = err.agg(F.max("excess")).first()[0]
    assert worst <= 1e-12, f"grid error exceeds scale/2 by {worst}"


def test_sq8_rerank_recall_and_exact_scores(spark, sf_dir):
    from mora_spark.llm.simsearch import sq8_rerank_topk

    exact = q_simsearch_topk(spark, sf_dir).collect()
    want = {(r["query_id"], r["neighbor_id"]) for r in exact}
    exact_scores = {
        (r["query_id"], r["neighbor_id"]): r["score"] for r in exact
    }

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    got_rows = sq8_rerank_topk(
        e, query_ids=[0, 1, 2, 3, 4], k=5, shortlist=50
    ).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in got_rows}

    # int8 error on cosine is ~1/127; a 50-deep shortlist recovers the
    # true top-5 on this corpus, and the stage-2 re-rank emits EXACT
    # full-precision scores for everything it returns.
    recall = len(want & got) / len(want)
    assert recall >= 0.8, f"recall {recall}"
    for r in got_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert abs(r["score"] - exact_scores[key]) < 1e-9


def test_ivf_recall_holds_across_drift_retrain_compact(
    spark, sf_dir, tmp_path
):
    """The full index-maintenance lifecycle, judged on QUALITY, not
    just layout: plant known duplicates (scaled copies — cos = 1.0),
    drive ivf_index_add with a drifted distribution until health
    reports heavy imbalance, compact (the retrain branch fires), and
    require planted-pair recall to hold through the retrain. Layout
    assertions ride along (one file per cell, imbalance reduced)."""
    from mora_spark.llm.simsearch import (
        build_ivf_index,
        ivf_index_add,
        ivf_index_compact,
        ivf_index_health,
        ivf_index_topk,
        save_ivf_index,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    plant_src = list(range(1, 9))
    plants = (
        e.where(F.col("vec_id").isin(plant_src))
        .select(
            (F.col("vec_id") + 100_000).alias("vec_id"),
            F.transform("embedding", lambda x: x * 0.5).alias("embedding"),
        )
    )
    corpus = e.unionByName(plants)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    save_ivf_index(*build_ivf_index(corpus, n_cells=8, train_iters=2), src)

    def planted_recall(path):
        got = ivf_index_topk(
            spark, path, plant_src, k=5, n_probe=2
        ).collect()
        found = {
            r["query_id"]
            for r in got
            if r["neighbor_id"] == r["query_id"] + 100_000
        }
        return len(found) / len(plant_src)

    base_recall = planted_recall(src)
    assert base_recall == 1.0  # cos=1.0 partner, same cell as source

    # Drift: three increments shoved into one orthant — the trained
    # centroids no longer match the ingested distribution.
    for i in range(3):
        drift = e.select(
            (F.col("vec_id") + 200_000 + i * 10_000).alias("vec_id"),
            F.transform("embedding", lambda x: F.abs(x) + 1.0).alias(
                "embedding"
            ),
        )
        ivf_index_add(spark, src, drift)
    before = ivf_index_health(spark, src)
    assert before["imbalance"] > 2.0  # drift detected
    assert before["max_files_per_cell"] > 1  # fragmentation detected
    recall_before_compact = planted_recall(src)

    stats = ivf_index_compact(spark, src, dst, retrain_imbalance=2.0)
    assert stats["retrained"] is True
    after = ivf_index_health(spark, dst)
    assert after["imbalance"] < before["imbalance"]
    assert after["max_files_per_cell"] == 1
    assert after["rows"] == before["rows"]
    # The quality bar: recall through the retrain must not degrade.
    recall_after = planted_recall(dst)
    assert recall_after >= recall_before_compact
    assert recall_after == 1.0


def test_semantic_dedup_blocking_independent_and_canonical(
    spark, sf_dir
):
    """SemDeDup invariants: (a) the banded-LSH answer equals the exact
    all-pairs (n_bits=0) answer — the cluster definition is
    blocking-independent and the bands lose nothing at this threshold;
    (b) every planted shifted copy clusters with its original;
    (c) keep_id is the max-quality member (norm default), ties to the
    smaller id; (d) a caller-supplied quality column overrides it."""
    from mora_spark.llm.semdedup import semantic_dedup
    from mora_spark.queries.vectors import _planted

    e = _planted(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
    )
    banded = semantic_dedup(e, threshold=0.95, n_bits=8, n_bands=16)
    exact = semantic_dedup(e, threshold=0.95, n_bits=0)
    canon = lambda df: sorted(
        (r["cluster_id"], r["keep_id"], r["best_quality"],
         r["cluster_size"])
        for r in df.collect()
    )
    got = canon(banded)
    assert got == canon(exact) and got
    for cid, keep, q, size in got:
        assert size >= 2  # every original clusters with its copy
        assert cid < 1_000_000  # min member is always an original
    # quality override: forcing quality = -vec_id flips the canonical
    # to the smallest id (the original), deterministically
    qual = e.select("vec_id", (-F.col("vec_id")).alias("quality"))
    forced = semantic_dedup(
        e, threshold=0.95, n_bits=8, n_bands=16, quality=qual
    )
    for r in forced.collect():
        assert r["keep_id"] == r["cluster_id"]  # min id wins everywhere


def test_derive_srp_bits_breakpoints():
    """The corpus-sized band-width rule: ceil(log2(n)) - 4, floored at
    the old fixed default 8 (so every existing small-corpus caller and
    the in-window driver rows keep their exact behavior under
    n_bits=None), capped at 24."""
    from mora_spark.llm.simsearch import derive_srp_bits

    assert derive_srp_bits(0) == 8
    assert derive_srp_bits(2_000) == 8
    assert derive_srp_bits(4_096) == 8  # log2 = 12 exactly -> 8
    assert derive_srp_bits(80_000) == 13  # the 40x-probe regime
    assert derive_srp_bits(1_000_000) == 16
    assert derive_srp_bits(10**9) == 24  # capped


def test_derive_srp_bands_holds_recall_envelope():
    """The band count derives WITH the width: at every derivable width
    the returned count satisfies the band-OR recall identity at the
    threshold boundary — a fixed 16 would drop to ~0.76 recall at the
    widths large corpora derive, silently breaking the
    blocking-independence contract."""
    import math

    from mora_spark.llm.simsearch import (
        MAX_DERIVED_BANDS,
        derive_srp_bands,
    )

    p = 1 - math.acos(0.95) / math.pi
    for bits in range(8, 25):
        bands = derive_srp_bands(bits, 0.95)
        recall = 1 - (1 - p**bits) ** bands
        assert recall >= 0.99, (bits, bands, recall)
    # small widths keep the old fixed count (derive never reduces it)
    assert derive_srp_bands(8, 0.95) == 16
    # the width the 40x probe regime derives still fits the budget
    assert derive_srp_bands(13, 0.95) <= MAX_DERIVED_BANDS


def test_semantic_dedup_derived_default_matches_explicit(spark, sf_dir):
    """n_bits=None (the new default) derives the width from the corpus
    count and — blocking independence — yields the identical cluster
    table to the explicit in-window setting. On this corpus the
    derived width IS the old default, pinning that the default change
    is behavior-preserving for every green driver row."""
    from mora_spark.llm.semdedup import semantic_dedup
    from mora_spark.llm.simsearch import derive_srp_bits
    from mora_spark.queries.vectors import _planted

    e = _planted(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
    )
    assert derive_srp_bits(e.count()) == 8
    canon = lambda df: sorted(map(tuple, df.collect()))
    derived = semantic_dedup(e, threshold=0.95, n_bands=16)
    explicit = semantic_dedup(e, threshold=0.95, n_bits=8, n_bands=16)
    got = canon(derived)
    assert got and got == canon(explicit)


def test_epoch_compaction_preserves_stream_dedup(spark, sf_dir, tmp_path):
    """The maintenance cadence (stream -> compact_epoch_index -> next
    epoch) is invisible to dedup semantics: folding epoch 1's batch_id=
    dirs into a batch_id=-1 seed and continuing in a fresh epoch yields
    the same pair set and the same kept membership as the uncompacted
    single-epoch run — compaction preserves membership exactly."""
    from mora_spark.functions.vectors import l2_norm
    from mora_spark.queries.vectors import _SQRT_DIM, as_double
    from mora_spark.streaming.pairdedup import compact_epoch_index
    from mora_spark.streaming.semdedup import dedup_embed_batch

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("embedding")
    )

    def shifted(offset: int, alpha: float):
        s = F.lit(alpha) * l2_norm(F.col("embedding")) / _SQRT_DIM
        return e.select(
            (F.col("vec_id") + offset).alias("vec_id"),
            F.transform("embedding", lambda x: x + s).alias("embedding"),
        )

    batches = [e, shifted(50_000, 0.2), shifted(100_000, 0.1)]

    def pairs_of(d):
        return sorted(
            (r["vec_id"], r["dup_id"], r["score"], r["src"])
            for r in spark.read.parquet(d).collect()
        )

    def kept_of(d):
        return sorted(
            r["vec_id"]
            for r in spark.read.parquet(d).select("vec_id").collect()
        )

    # Run A: one epoch, three batches.
    ia, pa = str(tmp_path / "a_index"), str(tmp_path / "a_pairs")
    for k, b in enumerate(batches):
        dedup_embed_batch(spark, b, k, ia, pa)
    # Run B: two batches, compact into a fresh epoch, one more batch.
    ib1, pb1 = str(tmp_path / "b1_index"), str(tmp_path / "b1_pairs")
    for k, b in enumerate(batches[:2]):
        dedup_embed_batch(spark, b, k, ib1, pb1)
    ib2, pb2 = str(tmp_path / "b2_index"), str(tmp_path / "b2_pairs")
    n_seed = compact_epoch_index(spark, ib1, ib2)
    assert n_seed == len(kept_of(ib1))
    import os

    assert os.path.isdir(os.path.join(ib2, "batch_id=-1"))
    dedup_embed_batch(spark, batches[2], 0, ib2, pb2)

    assert pairs_of(pa) == sorted(pairs_of(pb1) + pairs_of(pb2))
    assert kept_of(ia) == kept_of(ib2)
    # Epoch 2's batch is all-copies, so it has ZERO survivors: every
    # kept row still carries the seed epoch (batch_id=-1), proving the
    # dedup ran against the compacted index rather than appending the
    # copies — and every copy emitted a 'corpus' pair against it.
    epochs = {
        r["batch_id"]
        for r in spark.read.parquet(ib2).select("batch_id").collect()
    }
    assert epochs == {-1}
    # ...and every kept original's copy shows up as a pair against the
    # seed (superset: copies of naturally-dropped originals may also
    # clear the threshold against their clique's kept canonical).
    corpus_drops = {
        v for v, d, s, src in pairs_of(pb2) if src == "corpus"
    }
    assert corpus_drops >= {v + 100_000 for v in kept_of(ib1)}


def test_semantic_dedup_no_pairs_is_empty_not_error(spark, sf_dir):
    """No pair reaches an impossible threshold: the operator returns
    an empty cluster frame instead of erroring in the CC loop."""
    from mora_spark.llm.semdedup import semantic_dedup

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    out = semantic_dedup(e, threshold=1.01, n_bits=8, n_bands=16)
    assert out.count() == 0
    assert out.columns == [
        "cluster_id", "keep_id", "best_quality", "cluster_size"
    ]


def test_filtered_search_empty_predicate_returns_empty(
    spark, sf_dir, tmp_path
):
    """A predicate matching nothing yields zero rows (k simply cannot
    fill), never an error — for both the flat and persisted paths."""
    import tempfile

    from mora_spark.llm.simsearch import (
        build_ivfpq_index,
        ivfpq_index_topk,
        pq_topk,
        save_ivfpq_index,
        train_pq_codebooks,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
        "label",
    )
    books = train_pq_codebooks(e)
    flat = pq_topk(
        e, books, query_ids=[0, 1], k=5, predicate="label = 999"
    )
    assert flat.count() == 0
    d = str(tmp_path / "idx")
    save_ivfpq_index(*build_ivfpq_index(e, n_cells=8, train_iters=1), d)
    got = ivfpq_index_topk(
        spark, d, query_ids=[0, 1], k=5, n_probe=8,
        predicate="label = 999",
    )
    assert got.count() == 0


def test_stream_semdedup_batch_replay_is_idempotent(
    spark, sf_dir, tmp_path
):
    """foreachBatch is at-least-once: re-invoking a batch step must
    recompute the same pairs against the same batch_id<current index
    snapshot and overwrite its own epoch dirs — state identical to the
    single-delivery run, never duplicated. Every alpha-shifted copy
    must drop against its kept original (the q_semdedup plant shifts
    by 0.2, measured cosine > 0.95 on this corpus), and no copy may
    enter the index."""
    from mora_spark.functions.vectors import l2_norm
    from mora_spark.queries.vectors import _SQRT_DIM, as_double
    from mora_spark.streaming.semdedup import dedup_embed_batch

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("embedding")
    )
    shift = F.lit(0.2) * l2_norm(F.col("embedding")) / _SQRT_DIM
    copies = e.select(
        (F.col("vec_id") + 50_000).alias("vec_id"),
        F.transform("embedding", lambda x: x + shift).alias("embedding"),
    )
    index_dir = str(tmp_path / "embed_index")
    pairs_dir = str(tmp_path / "dup_pairs")
    dedup_embed_batch(spark, e, 0, index_dir, pairs_dir)
    dedup_embed_batch(spark, copies, 1, index_dir, pairs_dir)

    def state():
        pairs = sorted(
            (r["vec_id"], r["dup_id"], r["score"], r["src"])
            for r in spark.read.parquet(pairs_dir).collect()
        )
        kept = sorted(
            (r["vec_id"], r["batch_id"])
            for r in spark.read.parquet(index_dir)
            .select("vec_id", "batch_id")
            .collect()
        )
        return pairs, kept

    once = state()
    dedup_embed_batch(spark, copies, 1, index_dir, pairs_dir)  # replay
    assert state() == once
    pairs, kept = once
    n = e.count()
    # every copy pairs against its kept original across the corpus
    corpus = {
        (v, d) for v, d, s, src in pairs
        if src == "corpus" and v == d + 50_000
    }
    kept_0 = {v for v, b in kept if b == 0}
    assert corpus >= {(v + 50_000, v) for v in kept_0}
    assert all(b == 0 for _, b in kept)  # no copy entered the index
    assert len(kept_0) <= n


def test_filtered_search_parity_on_ivf_and_sq8_tiers(
    spark, sf_dir, tmp_path
):
    """The non-PQ tiers honor the same predicate contract as
    ivfpq_index_topk: k fills POST-filter (every returned neighbor
    satisfies the predicate, and ranks are dense 1..k), an
    impossible predicate yields zero rows not an error, and a
    tautological predicate returns exactly the unfiltered answer."""
    from mora_spark.llm.simsearch import (
        build_ivf_index,
        ivf_index_topk,
        save_ivf_index,
        sq8_rerank_topk,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
        "label",
    )
    labels = {r["vec_id"]: r["label"] for r in e.select(
        "vec_id", "label").collect()}
    d = str(tmp_path / "ivf")
    save_ivf_index(*build_ivf_index(e, n_cells=8, train_iters=1), d)

    def pin(df, k):
        rows = df.collect()
        by_q = {}
        for r in rows:
            assert labels[r["neighbor_id"]] in (1, 3, 5)
            by_q.setdefault(r["query_id"], []).append(r["rank"])
        for ranks in by_q.values():
            assert sorted(ranks) == list(range(1, k + 1))

    pin(ivf_index_topk(spark, d, query_ids=[0, 1], k=5, n_probe=8,
                       predicate="label IN (1, 3, 5)"), 5)
    pin(sq8_rerank_topk(e, query_ids=[0, 1], k=5,
                        predicate="label IN (1, 3, 5)"), 5)
    assert ivf_index_topk(spark, d, query_ids=[0], k=5, n_probe=8,
                          predicate="label = 999").count() == 0
    assert sq8_rerank_topk(e, query_ids=[0], k=5,
                           predicate="label = 999").count() == 0

    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"],  # noqa: E731
                     r["score"])
    got = sorted(map(key, ivf_index_topk(
        spark, d, query_ids=[0, 1], k=5, n_probe=8,
        predicate="label IS NOT NULL").collect()))
    want = sorted(map(key, ivf_index_topk(
        spark, d, query_ids=[0, 1], k=5, n_probe=8).collect()))
    assert got == want
    got = sorted(map(key, sq8_rerank_topk(
        e, query_ids=[0, 1], k=5,
        predicate="label IS NOT NULL").collect()))
    want = sorted(map(key, sq8_rerank_topk(
        e, query_ids=[0, 1], k=5).collect()))
    assert got == want


def test_ivf_filtered_predicate_pushes_into_cell_scan(
    spark, sf_dir, tmp_path
):
    """The IVF-tier filtered search must carry the metadata predicate
    into the persisted index's parquet scan as a pushed filter (the
    ivfpq stage-1 contract, tests/test_pq.py) — not as a post-scan
    Filter only."""
    from mora_spark.llm.simsearch import (
        build_ivf_index,
        ivf_index_topk,
        save_ivf_index,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
        "label",
    )
    d = str(tmp_path / "ivf")
    save_ivf_index(*build_ivf_index(e, n_cells=8, train_iters=1), d)
    df = ivf_index_topk(
        spark, d, query_ids=[0, 1], k=5, n_probe=2,
        predicate="label IN (1, 3, 5)",
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    pushed = [
        ln
        for ln in plan.splitlines()
        if "PushedFilters" in ln and "In(label" in ln
    ]
    assert pushed, f"label predicate not pushed to the index scan:\n{plan[:2000]}"


def test_filtered_search_parity_on_srp_ivf_flat_and_opq_tiers(
    spark, sf_dir
):
    """predicate= is uniform across the whole ANN API: the SRP bucket
    tier, the flat IVF tier, and OPQ (pass-through to pq_topk) all
    restrict candidates to the predicate set, fill k post-filter, and
    return the unfiltered answer under a tautology."""
    from mora_spark.llm.simsearch import (
        ivf_topk,
        opq_topk,
        srp_topk,
        train_opq,
    )

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
        "label",
    )
    labels = {r["vec_id"]: r["label"]
              for r in e.select("vec_id", "label").collect()}
    rot, books, _ = train_opq(e, n_iter=1)
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"],  # noqa: E731
                     r["score"])

    def runs(fn):
        filt = fn("label IN (1, 3, 5)").collect()
        for r in filt:
            assert labels[r["neighbor_id"]] in (1, 3, 5)
        got = sorted(map(key, fn("label IS NOT NULL").collect()))
        want = sorted(map(key, fn(None).collect()))
        assert got == want and want

    runs(lambda p: srp_topk(e, query_ids=[0, 1], k=5, predicate=p))
    runs(lambda p: ivf_topk(e, query_ids=[0, 1], k=5, n_probe=4,
                            predicate=p))
    runs(lambda p: opq_topk(e, rot, books, query_ids=[0, 1], k=5,
                            predicate=p))


def test_derive_srp_bands_caps_at_budget_and_warns():
    """ADVICE r12 #1: an explicitly pinned wide width at a permissive
    threshold used to derive an UNBOUNDED band count (threshold 0.7 at
    n_bits=24 solves to 5,081 bands = 5,081 stacked matmuls). The
    derivation now hard-caps at MAX_DERIVED_BANDS on every path and
    warns with the recall actually achieved — never a silent blow-up,
    never a silent recall loss."""
    import warnings

    from mora_spark.llm.simsearch import (
        MAX_DERIVED_BANDS,
        _srp_bands_needed,
        derive_srp_bands,
    )

    assert _srp_bands_needed(24, 0.7) > 5_000  # the footgun, quantified
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert derive_srp_bands(24, 0.7) == MAX_DERIVED_BANDS
        assert any("capping" in str(w.message) for w in caught)
    # within budget: capped path never fires, value unchanged
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert derive_srp_bands(13, 0.95) <= MAX_DERIVED_BANDS
        assert not caught


def test_derive_srp_params_shrinks_width_for_budget():
    """The both-None path: when the log2-sized width would demand more
    bands than the budget, the WIDTH shrinks (the cheaper knob) until
    the recall-envelope band count fits — so the derived pair always
    holds the 0.99 boundary target inside the budget, at any corpus
    size, except at the width floor where the cap warns."""
    import math
    import warnings

    from mora_spark.llm.simsearch import (
        MAX_DERIVED_BANDS,
        derive_srp_bits,
        derive_srp_params,
    )

    # threshold 0.8 at 1e9 vectors: width 24 would need ~1,100 bands
    bits, bands = derive_srp_params(10**9, 0.8)
    assert bits < derive_srp_bits(10**9)  # shrunk
    assert bands <= MAX_DERIVED_BANDS
    p = 1 - math.acos(0.8) / math.pi
    assert 1 - (1 - p**bits) ** bands >= 0.99  # envelope held
    # tight threshold: no shrink needed, derive_srp_bits width kept
    bits, bands = derive_srp_params(10**9, 0.95)
    assert bits == derive_srp_bits(10**9) and bands <= MAX_DERIVED_BANDS
    # floor width still over budget (threshold 0.35 needs ~227 bands
    # at width 8): cap + warn, returns the best the budget buys
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        bits, bands = derive_srp_params(10**6, 0.35)
        assert (bits, bands) == (8, MAX_DERIVED_BANDS)
        assert any("capping" in str(w.message) for w in caught)


def test_stream_semdedup_running_count_matches_fallback(
    spark, sf_dir, tmp_path
):
    """ADVICE r12 #3: under n_bits=None the derived width used to cost
    a per-batch full count of kept ∪ batch — O(corpus) per micro-batch
    on a long-lived stream. The sink now threads a running kept-count
    (seeded once, advanced by each batch's survivor return), and the
    hint path must produce byte-identical state to the fallback count
    since kept_count + |batch| IS |kept ∪ batch| (ids are disjoint by
    the sink contract)."""
    from mora_spark.functions.vectors import l2_norm
    from mora_spark.queries.vectors import _SQRT_DIM, as_double
    from mora_spark.streaming.semdedup import dedup_embed_batch

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("embedding")
    )
    shift = F.lit(0.2) * l2_norm(F.col("embedding")) / _SQRT_DIM
    copies = e.select(
        (F.col("vec_id") + 50_000).alias("vec_id"),
        F.transform("embedding", lambda x: x + shift).alias("embedding"),
    )

    def run(root, counted: bool):
        index_dir, pairs_dir = str(root / "idx"), str(root / "pairs")
        kept = 0 if counted else None
        survs = []
        for bid, batch in enumerate((e, copies)):
            s = dedup_embed_batch(
                spark, batch, bid, index_dir, pairs_dir, kept_count=kept
            )
            survs.append(s)
            if counted:
                kept += s
        pairs = sorted(
            (r["vec_id"], r["dup_id"], r["score"], r["src"])
            for r in spark.read.parquet(pairs_dir).collect()
        )
        idx = sorted(
            (r["vec_id"], r["batch_id"])
            for r in spark.read.parquet(index_dir)
            .select("vec_id", "batch_id")
            .collect()
        )
        return pairs, idx, survs

    hinted = run(tmp_path / "hint", counted=True)
    fallback = run(tmp_path / "fall", counted=False)
    assert hinted[:2] == fallback[:2]
    pairs, idx, survs = hinted
    # the survivor return IS the index growth — the running count the
    # sink accumulates is exact; without a kept_count no count job is
    # scheduled and the step returns None
    assert survs[0] == sum(1 for _, b in idx if b == 0)
    assert survs[1] == sum(1 for _, b in idx if b == 1)
    assert fallback[2] == [None, None]


def test_stream_semdedup_empty_batch_completes(spark, sf_dir, tmp_path):
    """Review find r13: an empty micro-batch (an empty replayed
    trigger, or every row filtered upstream) writes its epoch dir with
    zero partitions, which parquet schema inference cannot read back —
    so the survivor count must NEVER be taken from a read-back of the
    just-written dir. Both the counted (running kept-count) and
    uncounted paths must complete on an empty batch, return 0/None,
    and leave the pair/index state usable."""
    from mora_spark.queries.vectors import as_double
    from mora_spark.streaming.semdedup import dedup_embed_batch

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("embedding")
    )
    empty = e.where(F.lit(False))
    index_dir = str(tmp_path / "idx")
    pairs_dir = str(tmp_path / "pairs")
    surv0 = dedup_embed_batch(
        spark, e.limit(50), 0, index_dir, pairs_dir, kept_count=0
    )
    # natural near-dups at 0.95 may drop a few of the 50; the count
    # contract is survivors = batch - dropped, whatever that lands on
    assert surv0 is not None and 0 < surv0 <= 50
    surv1 = dedup_embed_batch(
        spark, empty, 1, index_dir, pairs_dir, kept_count=surv0
    )
    assert surv1 == 0
    surv2 = dedup_embed_batch(spark, empty, 2, index_dir, pairs_dir)
    assert surv2 is None
    kept = spark.read.parquet(index_dir)
    assert kept.count() == surv0


def test_stream_semantic_dedup_derived_defaults_end_to_end(
    spark, sf_dir, tmp_path
):
    """The actual readStream sink under the derived defaults
    (n_bits=None, n_bands=None): the running kept-count wiring —
    seeded once, advanced by survivor returns, fed as n_hint — must
    produce the identical pair table to the explicit-knob run (on
    this corpus the derivation lands on the explicit (8, 16), so any
    difference is a wiring bug, not a recall difference)."""
    import os

    from mora_spark.functions.vectors import l2_norm
    from mora_spark.queries.vectors import _SQRT_DIM, as_double
    from mora_spark.streaming.semdedup import stream_semantic_dedup

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("embedding")
    )
    shift = F.lit(0.2) * l2_norm(F.col("embedding")) / _SQRT_DIM
    copies = e.select(
        (F.col("vec_id") + 50_000).alias("vec_id"),
        F.transform("embedding", lambda x: x + shift).alias("embedding"),
    )
    src = str(tmp_path / "src")
    e.coalesce(1).write.parquet(os.path.join(src, "c0"))
    copies.coalesce(1).write.parquet(os.path.join(src, "c1"))
    glob = os.path.join(src, "*")

    def run(work, **knobs):
        return sorted(
            (r["vec_id"], r["dup_id"], r["score"], r["src"])
            for r in stream_semantic_dedup(
                spark, glob, str(tmp_path / work), **knobs
            ).collect()
        )

    derived = run("derived")  # n_bits=None, n_bands=None
    explicit = run("explicit", n_bits=8, n_bands=16)
    assert derived == explicit
    assert derived  # the planted copies must actually pair


def test_derive_ivf_cells_and_probe_breakpoints():
    """The opt-in FAISS sizing rule: cells = clamp(4·⌊√n⌋, 16, 65536),
    probe = max(4, ⌊√cells⌋) — floors reproduce the repo's fixed
    defaults, the probed corpus fraction shrinks ~1/√cells as the
    corpus grows, and the centroid model stays driver-bounded at the
    cap (65536 × 64 float64 = 32 MB)."""
    from mora_spark.llm.simsearch import derive_ivf_cells, derive_ivf_probe

    assert derive_ivf_cells(0) == 16
    assert derive_ivf_cells(16) == 16
    assert derive_ivf_cells(10_000) == 400
    assert derive_ivf_cells(1_000_000) == 4_000
    assert derive_ivf_cells(10**12) == 65_536  # capped
    assert derive_ivf_probe(16) == 4  # the fixed default pair
    assert derive_ivf_probe(400) == 20
    assert derive_ivf_probe(4_000) == 63
    # probed fraction shrinks: n_probe/n_cells strictly falls with n
    fr = [
        derive_ivf_probe(derive_ivf_cells(n)) / derive_ivf_cells(n)
        for n in (10_000, 10**6, 10**9)
    ]
    assert fr[0] > fr[1] > fr[2]


def test_ivf_derived_sizing_recall_structural_on_plants(spark, sf_dir):
    """q_ann_ivf_derived's oracle premise, executed: under derived
    (cells, probe) the planted scaled copies must be returned exactly
    (a copy normalizes to the query vector, so it assigns to the
    query's own first-probed cell at ANY cell count) — the result
    equals the explicit-knob q_ann_ivf row by the shared brute-force
    ground truth."""
    from mora_spark.queries.vectors import q_ann_ivf, q_ann_ivf_derived

    rows = lambda df: sorted(
        (r["query_id"], r["neighbor_id"], r["score"], r["rank"])
        for r in df.collect()
    )
    assert rows(q_ann_ivf_derived(spark, sf_dir)) == rows(
        q_ann_ivf(spark, sf_dir)
    )


def test_ivf_index_derived_sizing_roundtrip(spark, sf_dir, tmp_path):
    """The derived sizing is plumbed END-TO-END on the persisted tier
    (review find r13): build with n_cells=None, search the saved index
    with n_probe=None — the probe derives from the LOADED centroid
    count, so a derived-build index queried through the derived path
    answers exactly like the flat ivf_topk(None, None), and a fixed
    default probe can never silently under-probe a many-celled
    index. n_hint skips the sizing count job without changing the
    derivation."""
    from mora_spark.llm.simsearch import (
        build_ivf_index,
        derive_ivf_cells,
        derive_ivf_probe,
        ivf_index_topk,
        ivf_topk,
        save_ivf_index,
    )

    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    direct = ivf_topk(
        e, query_ids=[0, 1, 2], k=5, n_cells=None, n_probe=None,
        train_iters=2, n_hint=n,
    )
    cents, assigned = build_ivf_index(
        e, n_cells=None, train_iters=2, n_hint=n
    )
    assert len(cents) == derive_ivf_cells(n)
    save_ivf_index(cents, assigned, str(tmp_path / "ix"))
    via_index = ivf_index_topk(
        spark, str(tmp_path / "ix"), query_ids=[0, 1, 2], k=5, n_probe=None
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, via_index.collect())
    )
    # and the derived probe really differs from the fixed default here
    assert derive_ivf_probe(len(cents)) != 4

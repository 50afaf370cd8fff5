"""End-to-end JSONL curation pipeline (streaming/pipeline.py): one
streaming job composing quarantine -> gates -> incremental LSH dedup ->
curated appends. The oracle replay lives in q_corpus_pipeline_jsonl;
these tests pin the operational contracts: malformed lines divert
without killing the stream, the kept set is gate-clean and pair-free,
and a restart mid-corpus converges to the single-run result."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from mora_spark.datasets import load_table
from mora_spark.functions.text import lang_guess, quality_score, tokens
from mora_spark.sources.jsonl import write_jsonl
from mora_spark.streaming.pipeline import stream_curate_jsonl

THRESHOLD = 0.8


def _gate(df):
    toks = tokens("text")
    return df.where(
        (lang_guess(toks) == "en")
        & (quality_score(toks) >= 0.5)
        & (F.size(toks) >= 20)
    )


def _make_shards(docs, src, n=3, t0=1_600_000_000):
    os.makedirs(src, exist_ok=True)
    for k in range(n):
        tmp = src + f"_tmp{k}"
        write_jsonl(docs.where(F.col("doc_id") % n == k), tmp, n_files=1)
        part = next(p for p in os.listdir(tmp) if p.endswith(".json"))
        dst = os.path.join(src, f"shard-{k}.json")
        os.replace(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dst, (t0 + 2 * k,) * 2)


def test_pipeline_quarantines_gates_and_dedups(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "src")
    _make_shards(docs, src)
    bad = os.path.join(src, "shard-bad.json")
    with open(bad, "w") as f:
        f.write('{"doc_id": 1, "text": "truncated mid-wri\n')
        f.write("not json at all\n")
    os.utime(bad, (1_600_000_001,) * 2)  # mid-stream, after shard 0

    curated, n_quar = stream_curate_jsonl(
        spark, src, str(tmp_path / "work"), docs,
        threshold=THRESHOLD, gate=_gate,
    )
    assert n_quar == 2
    kept = curated.collect()
    assert kept  # the gates keep a non-trivial corpus
    # Every kept doc passes the gates (the quarantined fake doc_id=1
    # line never leaked into the corpus as a row).
    assert _gate(curated).count() == len(kept)
    # Greedy dedup leaves a pair-free corpus: any surviving pair would
    # mean its later member should have been dropped.
    from mora_spark.llm.dedup import minhash_lsh_pairs

    assert minhash_lsh_pairs(curated, threshold=THRESHOLD).count() == 0


def test_pipeline_resume_equals_single_run(spark, sf_dir, tmp_path):
    """Restart contract (the WAL-replay analogue): stop after 2 of 4
    shards, resume on the same checkpoint + work dir once the rest
    arrive — curated corpus and quarantine count equal the
    uninterrupted run."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 120
    )
    full = str(tmp_path / "full")
    _make_shards(docs, full, n=4)
    grow = str(tmp_path / "grow")
    os.makedirs(grow)
    shards = sorted(os.listdir(full))
    for s in shards[:2]:
        shutil.copy2(os.path.join(full, s), os.path.join(grow, s))
    work = str(tmp_path / "work")
    first, _ = stream_curate_jsonl(
        spark, grow, work, docs, threshold=THRESHOLD, gate=_gate
    )
    n_first = first.count()
    for s in shards[2:]:
        shutil.copy2(os.path.join(full, s), os.path.join(grow, s))
    resumed, _ = stream_curate_jsonl(
        spark, grow, work, docs, threshold=THRESHOLD, gate=_gate
    )
    ref, _ = stream_curate_jsonl(
        spark, full, str(tmp_path / "work_ref"), docs,
        threshold=THRESHOLD, gate=_gate,
    )
    got = sorted(r["doc_id"] for r in resumed.collect())
    want = sorted(r["doc_id"] for r in ref.collect())
    assert got == want
    assert n_first < len(got)  # the resume actually added batches


def test_pipeline_n_files_scales_the_write(spark, sf_dir, tmp_path):
    """The per-batch sink shard knob: with n_files=3 every curated
    batch directory lands as up to 3 parquet parts (3 write tasks,
    not one serialized task), and the corpus is identical to the
    n_files=1 run — layout only."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    )
    src = str(tmp_path / "src")
    _make_shards(docs, src, n=2)

    one, _ = stream_curate_jsonl(
        spark, src, str(tmp_path / "w1"), docs, threshold=THRESHOLD
    )
    many, _ = stream_curate_jsonl(
        spark, src, str(tmp_path / "w3"), docs, threshold=THRESHOLD,
        n_files=3,
    )
    assert sorted(r["doc_id"] for r in one.collect()) == sorted(
        r["doc_id"] for r in many.collect()
    )

    def parts(work, batch):
        d = os.path.join(work, "curated", f"batch_id={batch}")
        return len([p for p in os.listdir(d) if p.endswith(".parquet")])

    assert parts(str(tmp_path / "w1"), 0) == 1
    # n_files > 1 repartitions (coalesce can't scale back up once AQE
    # merged the tiny shuffle), so the batch writes exactly 3 tasks.
    assert parts(str(tmp_path / "w3"), 0) == 3


def test_pipeline_seeded_with_derived_family(spark, sf_dir, tmp_path):
    """The seed/derived-family knob (r15): a recall-derived
    save_minhash_index corpus seeds the one-job pipeline — batches
    band with the SEED's family (the 0.99-recall contract travels),
    stream docs near-duplicating seed docs are dropped, and the
    sink-owned index is stamped with the seed family so later epochs
    inherit it."""
    from mora_spark.llm.dedup import (
        build_minhash_index,
        dedup_increment,
        derive_minhash_params,
        load_minhash_family,
        load_minhash_index,
        save_minhash_index,
        write_minhash_family,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 120
    )
    # seed corpus = exact copies of half the stream docs under new ids
    seed_docs = docs.where(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    r, b = derive_minhash_params(THRESHOLD)
    seed_path = str(tmp_path / "seed_ix")
    save_minhash_index(
        *build_minhash_index(seed_docs, band_size=r, n_bands=b),
        seed_path,
        band_size=r,
        n_bands=b,
    )
    src = str(tmp_path / "src")
    _make_shards(docs, src, n=2)
    work = str(tmp_path / "work")
    curated, _ = stream_curate_jsonl(
        spark, src, work, docs, threshold=THRESHOLD,
        seed_index_path=seed_path,
    )
    kept = {r_["doc_id"] for r_ in curated.collect()}
    # every even doc is an exact dup of a seed doc (jaccard 1 >= t)
    assert kept and all(d % 2 == 1 for d in kept)
    # the sink-owned index inherited the seed's family
    assert load_minhash_family(
        os.path.join(work, "lsh_index")
    ) == (r, b)
    # Reference: an UNSEEDED run under the same derived family (via
    # the inheritance path — pre-stamp the fresh work dir's sink
    # index). The seed only ADDS drop reasons, so seeded-kept is a
    # subset of the reference's odd survivors, and every odd doc the
    # seed additionally dropped must actually near-dup a seed doc.
    work_ref = str(tmp_path / "work_ref")
    write_minhash_family(os.path.join(work_ref, "lsh_index"), r, b)
    ref, _ = stream_curate_jsonl(
        spark, src, work_ref, docs, threshold=THRESHOLD,
    )
    ref_odd = {
        d for d in (r_["doc_id"] for r_ in ref.collect()) if d % 2 == 1
    }
    assert kept <= ref_odd
    extra_dropped = ref_odd - kept
    if extra_dropped:
        flagged = {
            r_["doc_id"]
            for r_ in dedup_increment(
                docs.where(F.col("doc_id").isin(list(extra_dropped))),
                *load_minhash_index(spark, seed_path),
                threshold=THRESHOLD,
                include_intra=False,
                index_family=(r, b),
            ).collect()
        }
        assert extra_dropped <= flagged


def test_pipeline_refuses_conflicting_seed_family(
    spark, sf_dir, tmp_path
):
    """A work_dir whose sink-owned index was built with one family
    refuses a seed carrying another (mixing families in one index
    would band batches so they never collide with prior epochs), and
    an UNSEEDED rerun inherits the existing stamp instead of
    overwriting it with the default (r14 ADVICE #4)."""
    from mora_spark.llm.dedup import (
        BAND_SIZE,
        build_minhash_index,
        derive_minhash_params,
        load_minhash_family,
        save_minhash_index,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 60
    )
    r, b = derive_minhash_params(THRESHOLD)
    assert (r, b) != (BAND_SIZE, None)  # derived family is non-default
    seed_path = str(tmp_path / "seed_ix")
    save_minhash_index(
        *build_minhash_index(docs, band_size=r, n_bands=b),
        seed_path,
        band_size=r,
        n_bands=b,
    )
    src = str(tmp_path / "src")
    _make_shards(docs, src, n=2)
    # epoch 1: seeded run stamps the derived family onto the sink index
    work = str(tmp_path / "work")
    stream_curate_jsonl(
        spark, src, work, docs, threshold=THRESHOLD,
        seed_index_path=seed_path,
    )
    assert load_minhash_family(os.path.join(work, "lsh_index")) == (r, b)
    # epoch 2 unseeded on MORE data: must inherit (r, b), not restamp
    # the default over correct metadata
    src2 = str(tmp_path / "src2")
    _make_shards(
        load_table(spark, sf_dir, "documents").where(
            (F.col("doc_id") >= 60) & (F.col("doc_id") < 90)
        ),
        src2, n=1,
    )
    # same work dir, new checkpoint source: reuse the pipeline's own
    # resume path by appending to the original src
    for p in os.listdir(src2):
        shutil.copy2(os.path.join(src2, p), os.path.join(src, "z-" + p))
    stream_curate_jsonl(spark, src, work, docs, threshold=THRESHOLD)
    assert load_minhash_family(os.path.join(work, "lsh_index")) == (r, b)
    # a seed with a DIFFERENT family against this work dir is refused
    other_path = str(tmp_path / "other_ix")
    save_minhash_index(*build_minhash_index(docs), other_path)
    with pytest.raises(ValueError, match="conflicts"):
        stream_curate_jsonl(
            spark, src, work, docs, threshold=THRESHOLD,
            seed_index_path=other_path,
        )

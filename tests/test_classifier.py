from __future__ import annotations

import math

from pyspark.sql import functions as F

from mora_spark.llm.classifier import (
    N_BUCKETS,
    quality_classifier_score,
    token_bucket,
    train_quality_classifier,
)


def _corpus(spark):
    """Separable toy corpus: 'good' docs are varied prose, 'bad' docs
    repeat one junk token — disjoint vocabularies, so the log-odds
    weights must separate them exactly."""
    good = [
        (i, "the quick brown fox jumps over the lazy dog near a river")
        for i in range(10)
    ]
    bad = [(100 + i, "zzspam " * 12) for i in range(10)]
    df = spark.createDataFrame(good + bad, ["doc_id", "text"])
    labels = spark.createDataFrame(
        [(i, True) for i, _ in good] + [(i, False) for i, _ in bad],
        ["doc_id", "keep"],
    )
    return df, labels


def test_classifier_separates_planted_classes(spark):
    df, labels = _corpus(spark)
    weights, bias = train_quality_classifier(df, labels)
    assert len(weights) == N_BUCKETS
    assert all(math.isfinite(w) for w in weights)
    got = {
        r["doc_id"]: (r["clf_logit"], r["clf_score"], r["clf_keep"])
        for r in quality_classifier_score(df, weights, bias).collect()
    }
    assert len(got) == 20
    for i in range(10):
        assert got[i][2] is True, f"good doc {i} scored {got[i]}"
        assert got[100 + i][2] is False, f"bad doc {i} scored {got[100+i]}"
    for logit, score, _ in got.values():
        assert 0.0 < score < 1.0
        assert (score > 0.5) == (logit > 0)


def test_classifier_training_is_deterministic(spark):
    """Closed-form training: two runs over the same frame produce
    bit-identical weights (the property the SQL-replay oracle needs)."""
    df, labels = _corpus(spark)
    w1, b1 = train_quality_classifier(df, labels)
    w2, b2 = train_quality_classifier(df, labels)
    assert w1 == w2 and b1 == b2


def test_classifier_zero_token_doc_keeps_null_row(spark):
    """The lm_score no-row-loss contract: a doc with no (non-empty)
    tokens keeps its row with n_tokens=0 and NULL logit/score/keep."""
    df, labels = _corpus(spark)
    weights, bias = train_quality_classifier(df, labels)
    empty = spark.createDataFrame(
        [(999, ""), (998, "!!! ???")], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r
        for r in quality_classifier_score(empty, weights, bias).collect()
    }
    for i in (998, 999):
        r = rows[i]
        assert r["n_tokens"] == 0
        assert r["clf_logit"] is None
        assert r["clf_score"] is None
        assert r["clf_keep"] is None


def test_classifier_default_labels_distill_quality_rules(spark, sf_dir):
    """labels=None trains on quality_rules' verdicts; on the real
    corpus the distilled scorer must broadly agree with its teacher
    (the separable part of the rule signal is token-level)."""
    from mora_spark.datasets import load_table
    from mora_spark.llm.curation import quality_rules

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    weights, bias = train_quality_classifier(docs)
    scored = quality_classifier_score(docs, weights, bias)
    teacher = quality_rules(docs).select("doc_id", "keep")
    agree = (
        scored.join(teacher, "doc_id")
        .select(
            F.avg(
                (F.col("clf_keep") == F.col("keep")).cast("double")
            ).alias("rate")
        )
        .collect()[0]["rate"]
    )
    assert agree is not None and agree >= 0.6, f"agreement {agree}"


def test_classifier_scoring_plan_is_scan_stage(spark):
    """The serving contract: scoring plans ZERO exchanges and zero
    Python evaluation — the weight array is a plan literal and the
    fold is a JVM HOF, so the pass is exactly one scan."""
    df, labels = _corpus(spark)
    weights, bias = train_quality_classifier(df, labels)
    scored = quality_classifier_score(df, weights, bias)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = scored._jdf.queryExecution().explainString(mode)
    for smell in ("Exchange", "BatchEvalPython", "ArrowEvalPython"):
        assert smell not in plan, f"{smell} in scoring plan:\n{plan[:1500]}"


def test_token_bucket_matches_duckdb_twin(spark):
    """The Spark bucket arithmetic and its documented DuckDB twin hash
    identically — the cross-engine contract every oracle row rides."""
    import duckdb

    toks = ["fox", "zzspam", "a", "0", "the"]
    df = spark.createDataFrame([(t,) for t in toks], ["tok"])
    got = {
        r["tok"]: r["j"]
        for r in df.select(
            "tok", token_bucket(F.col("tok")).alias("j")
        ).collect()
    }
    for t in toks:
        want = duckdb.execute(
            "SELECT CAST(('0x' || substr(md5('clf:' || ?), 1, 8)) AS "
            f"BIGINT) % {N_BUCKETS}",
            [t],
        ).fetchone()[0]
        assert got[t] == want, t


def test_classifier_sampled_training_is_hash_deterministic(spark, sf_dir):
    """The 100 TB training recipe (`llm/classifier.py` docstring):
    pre-sampling with ``hash_uniform(id) < frac`` is a pure function
    of the id, so the trained weights are IDENTICAL across partition
    layouts (retries, speculative tasks, cluster sizes) — and they
    equal an independent numpy recomputation from the sampled counts,
    pinning that the sample feeding training is exactly the hash
    selection, not a layout-dependent approximation."""
    import math as m

    import numpy as np

    from mora_spark.datasets import load_table
    from mora_spark.functions.text import tokens
    from mora_spark.llm.classifier import ALPHA
    from mora_spark.llm.curation import hash_uniform, quality_rules

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sampled = docs.where(hash_uniform(F.col("doc_id")) < 0.5)
    n_all, n_s = docs.count(), sampled.count()
    assert 0 < n_s < n_all  # the sample is real and proper

    runs = [
        train_quality_classifier(frame)
        for frame in (sampled, sampled.repartition(7), sampled.repartition(3))
    ]
    assert runs[0] == runs[1] == runs[2]
    weights, bias = runs[0]

    # Independent recomputation: counts via pandas/numpy, weights via
    # the documented closed form — not a second pass through the
    # trainer.
    lab = quality_rules(sampled).select("doc_id", "keep")
    hits = (
        sampled.select(
            "doc_id", F.explode(tokens("text")).alias("tok")
        )
        .where(F.col("tok") != "")
        .join(lab, "doc_id")
        .select(token_bucket(F.col("tok")).alias("j"), "keep")
        .toPandas()
    )
    ck = np.zeros(N_BUCKETS, dtype=np.int64)
    cd = np.zeros(N_BUCKETS, dtype=np.int64)
    for j, keep in zip(hits["j"], hits["keep"]):
        (ck if keep else cd)[j] += 1
    tk, td = int(ck.sum()), int(cd.sum())
    want = [
        round(
            m.log((int(ck[j]) + ALPHA) / (tk + ALPHA * N_BUCKETS))
            - m.log((int(cd[j]) + ALPHA) / (td + ALPHA * N_BUCKETS)),
            8,
        )
        for j in range(N_BUCKETS)
    ]
    assert weights == want
    n_pos = int(lab.where("keep").count())
    n_neg = int(lab.where("NOT keep").count())
    assert bias == round(m.log((n_pos + 1.0) / (n_neg + 1.0)), 8)


def test_classifier_score_is_rounded_cross_engine(spark):
    """clf_score is the 8 dp-rounded sigmoid on BOTH engines: the raw
    sigmoid runs through libm exp whose last ulp is engine-specific
    (the hazard the 8 dp weight rounding absorbs for ln), so the
    emitted column must already be rounded — here pinned against a
    float64 recomputation from the emitted logit."""
    df, labels = _corpus(spark)
    weights, bias = train_quality_classifier(df, labels)
    rows = quality_classifier_score(df, weights, bias).collect()
    assert rows
    for r in rows:
        want = round(1.0 / (1.0 + math.exp(-r["clf_logit"])), 8)
        assert r["clf_score"] == want, (r["clf_logit"], r["clf_score"])


def test_classifier_boundary_logit_keeps_score_keep_equivalence(spark):
    """The rounding-width argument in quality_classifier_score's
    docstring, executed: at the smallest nonzero logit the 6 dp logit
    rounding admits (±1e-6), the 8 dp score must stay strictly on
    clf_keep's side of 0.5 — a 6 dp score would collapse both onto
    exactly 0.500000 and break (clf_score > 0.5) == clf_keep for
    downstream consumers thresholding on the score."""
    df = spark.createDataFrame(
        [(1, "sometoken"), (2, "sometoken")], ["doc_id", "text"]
    )
    for bias, keep in ((1e-6, True), (-1e-6, False)):
        rows = quality_classifier_score(
            df, [0.0] * N_BUCKETS, bias
        ).collect()
        for r in rows:
            assert r["clf_logit"] == bias
            assert r["clf_keep"] is keep
            assert (r["clf_score"] > 0.5) is keep, (bias, r["clf_score"])

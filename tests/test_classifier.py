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

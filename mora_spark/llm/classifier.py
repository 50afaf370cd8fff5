"""Classifier-based text-quality scoring (fastText / DCLM shape).

The model-based stage of the curation ladder: the heuristic gates
(``curation.quality_rules``, ``functions.text.quality_score``) encode
hand rules; production pipelines (CCNet, DCLM, FineWeb-Edu) follow
them with a LEARNED linear scorer — hashed bag-of-token features
through a linear layer and a sigmoid — cheap enough to run over the
full corpus. This module is that operator with a fully deterministic,
engine-replayable training rule.

Model: multinomial naive-Bayes log-odds over hashed token buckets
(the NBSVM weight construction — Wang & Manning 2012 — which IS a
linear classifier and trains in closed form):

    w[j]  = ln((hits_pos[j] + a) / (tot_pos + a*D))
          - ln((hits_neg[j] + a) / (tot_neg + a*D))
    bias  = ln((n_pos_docs + 1) / (n_neg_docs + 1))
    logit = bias + mean over tokens of w[bucket(token)]
    score = sigmoid(logit)

Closed form is a design requirement, not a shortcut: the weights are
an exact function of integer corpus counts, so a DuckDB oracle can
replay training AND scoring symbolically — an SGD loop's weights
could never be pinned cross-engine. (A real fastText run would learn
dense embeddings; its serving shape — static weight vector, one dot
product per doc — is identical.)

Scale shape: training is one tokenize-explode + one groupBy over
D buckets (the driver holds only the D-row count table, never
corpus rows; train on a hash-deterministic sample at 100 TB — the
weights converge long before the corpus ends). Scoring is the part
that must run over everything, and it is ZERO-shuffle: the weight
vector rides into the plan as a literal array (broadcast with the
task binary) and the per-token lookup + fold run as JVM higher-order
functions inside the scan stage — no join, no Python, no UDF.

Labels default to the Gopher-rule verdicts of
``curation.quality_rules`` (distillation: the learned scorer
generalizes the rules that seeded it — the DCLM/FineWeb bootstrap),
but any (id, boolean) frame works — human ratings, an LLM judge.

The reference engine has no text surface at all (command enum
INSERT/COMMIT, `database/command/types.go:11-14`); this is part of
the rebuild's LLM-pipeline layer.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mora_spark.functions.text import tokens

N_BUCKETS = 1024
ALPHA = 1.0


def token_bucket(tok: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Hash a token to a feature bucket: first 32 md5 bits of
    ('clf:' + token) mod n_buckets — the engine-independent hashing
    discipline of ``curation.train_shards`` (DuckDB twin:
    ``CAST(('0x' || substr(md5('clf:' || t), 1, 8)) AS BIGINT)``)."""
    h = F.md5(F.concat(F.lit("clf:"), tok))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_buckets


def train_quality_classifier(
    df: DataFrame,
    labels: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "keep",
    n_buckets: int = N_BUCKETS,
    alpha: float = ALPHA,
) -> tuple[list[float], float]:
    """Train the log-odds weights; returns ``(weights, bias)`` with
    ``len(weights) == n_buckets``.

    ``labels`` is any frame carrying ``(id_col, label_col)`` with a
    boolean-castable label; ``None`` distills the Gopher heuristics
    (``quality_rules(df).keep``). Docs absent from ``labels`` are
    excluded from training (inner join) but still scorable.

    Driver state is exactly the ``n_buckets``-row count table plus
    one 2-value doc-count row — bounded by the model size, never the
    corpus. At 100 TB train on a hash-deterministic sample — pass
    ``df.where(curation.hash_uniform(F.col(id_col)) < frac)`` — the
    log-odds converge long before the corpus ends, and the selection
    is a pure function of the id (reproducible across engines,
    retries, and repartitions). Weights are rounded to 8 dp so the
    floats an oracle recomputes from the same integer counts agree
    bit-for-bit after rounding (libm ln differs by ~1 ulp across
    engines)."""
    if labels is None:
        from mora_spark.llm.curation import quality_rules

        labels = quality_rules(df, text_col=text_col, id_col=id_col)
        label_col = "keep"
    lab = labels.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).cast("boolean").alias("_y"),
    )
    hits = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(tokens(text_col)).alias("tok"),
        )
        .where(F.col("tok") != "")
        .join(lab, "_id")
        .select(token_bucket(F.col("tok"), n_buckets).alias("j"), "_y")
    )
    cnt = (
        hits.groupBy("j")
        .agg(
            F.count(F.when(F.col("_y"), 1)).alias("ck"),
            F.count(F.when(~F.col("_y"), 1)).alias("cd"),
        )
        .collect()
    )
    ck = [0] * n_buckets
    cd = [0] * n_buckets
    for r in cnt:
        ck[r["j"]] = r["ck"]
        cd[r["j"]] = r["cd"]
    tk, td = sum(ck), sum(cd)
    weights = [
        round(
            math.log((ck[j] + alpha) / (tk + alpha * n_buckets))
            - math.log((cd[j] + alpha) / (td + alpha * n_buckets)),
            8,
        )
        for j in range(n_buckets)
    ]
    docs = lab.agg(
        F.count(F.when(F.col("_y"), 1)).alias("np"),
        F.count(F.when(~F.col("_y"), 1)).alias("nn"),
    ).collect()[0]
    bias = round(math.log((docs["np"] + 1.0) / (docs["nn"] + 1.0)), 8)
    return weights, bias


def quality_classifier_score(
    df: DataFrame,
    weights: list[float],
    bias: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Score every document under trained ``(weights, bias)``:
    emits ``(id, n_tokens, clf_logit, clf_score, clf_keep)``.

    Zero shuffles and zero Python: the weight vector is one literal
    array constant in the plan, the tokenization is materialized once
    per row, and the bucket-lookup fold runs as a JVM ``aggregate``
    HOF in the scan stage — per-doc cost is O(tokens), per-task cost
    is the scan itself, at any corpus size.

    ``clf_logit`` is rounded to 6 dp BEFORE the sigmoid and the 0.5
    cut so the discrete ``clf_keep`` verdict cannot flip on a
    last-ulp summation difference, and ``clf_score`` is rounded to
    8 dp AFTER it — the sigmoid runs through each engine's libm
    ``exp``, whose last ulp is no more portable than the ``ln`` the
    8 dp weight rounding absorbs. 8 dp, not the logit's 6: the
    smallest nonzero |logit| the 6 dp rounding admits is 1e-6, which
    puts the raw sigmoid at least ~2.5e-7 from 0.5 — above 8 dp's
    5e-9 half-step but BELOW 6 dp's 5e-7, so a 6 dp score would
    collapse boundary docs onto exactly 0.5 and break
    ``(clf_score > 0.5) == clf_keep``; at 8 dp the equivalence holds
    for every representable logit while cross-engine exp noise
    (~1e-16 relative) still rounds away. Docs with zero (non-empty)
    tokens keep a row with ``n_tokens = 0`` and NULL
    logit/score/keep — the no-row-loss contract of
    ``curation.lm_score``."""
    w_arr = F.lit([float(w) for w in weights])
    t = df.select(
        F.col(id_col).alias("id"),
        F.filter(tokens(text_col), lambda x: x != "").alias("_toks"),
    )
    n = F.size("_toks")
    fold = F.aggregate(
        F.col("_toks"),
        F.lit(0.0),
        lambda acc, x: acc
        + F.element_at(w_arr, (token_bucket(x, n_buckets) + 1).cast("int")),
    )
    logit = F.when(n > 0, F.round(F.lit(float(bias)) + fold / n, 6))
    return t.select(
        F.col("id").alias(id_col),
        n.alias("n_tokens"),
        logit.alias("clf_logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 8).alias(
            "clf_score"
        ),
        (logit > 0).alias("clf_keep"),
    )

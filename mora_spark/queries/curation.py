"""Training-data curation declared queries over ``documents``:
stratified sampling, benchmark decontamination, vocabulary top-k,
sequence packing, and domain-mixture weighting.

Every query has an exact DuckDB oracle; the shared token derivation is
:data:`mora_spark.queries.text.TOKS_SQL` (the SQL twin of
``functions.text.tokens``) and the deterministic sampling uniform is
``('0x' || substr(md5(...), 1, 8))::BIGINT / 2^32`` (the SQL twin of
``llm.curation.hash_uniform``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mora_spark.datasets import load_table, spread
from mora_spark.functions.text import tokens
from mora_spark.llm.curation import (
    boilerplate_frac,
    decontaminate,
    pack_sequences,
    quality_rules,
    stratified_sample,
    vocab_topk,
)
from mora_spark.queries.text import TOKS_SQL


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: see queries/text.py — parallelize scan-stage token work.
    return spread(load_table(spark, sf_dir, "documents"))


# --- q_stratified_sample: reproducible per-language downsampling ---
# The rebalancing step of corpus curation: keep half the English, less
# of everything else. Hash-Bernoulli (not sampleBy) so the selection
# is a pure function of doc_id — identical across engines, retries,
# and repartitions.

SAMPLE_RATES = {"en": 0.5, "zh": 0.3, "de": 0.2}
SAMPLE_DEFAULT = 0.1


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_sample(
        _docs(spark, sf_dir),
        strata_col="lang",
        rates=SAMPLE_RATES,
        default_rate=SAMPLE_DEFAULT,
    ).select("doc_id", "lang", "source")


O_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, source FROM documents
WHERE ('0x' || substr(md5('sample:' || doc_id), 1, 8))::BIGINT
        / 4294967296.0
      < CASE WHEN lang = 'en' THEN 0.5
             WHEN lang = 'zh' THEN 0.3
             WHEN lang = 'de' THEN 0.2
             ELSE {SAMPLE_DEFAULT} END
"""


# --- q_decontaminate: benchmark n-gram overlap ---
# Benchmark set = every 20th doc; the train side is the rest PLUS a
# re-crawl of the benchmark docs under new ids (eval-set leakage into
# the crawl — the phenomenon decontamination exists to catch). A
# contaminated doc is one sharing >= 1 eight-token shingle with any
# benchmark doc.

DECON_N = 8


def _decon_sides(spark: SparkSession, sf_dir: str):
    d = _docs(spark, sf_dir).select("doc_id", "text")
    bench = d.where(F.col("doc_id") % 20 == 0)
    train = d.where(F.col("doc_id") % 20 != 0).unionByName(
        bench.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    return train, bench


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    train, bench = _decon_sides(spark, sf_dir)
    return decontaminate(train, bench, n=DECON_N)


# --- q_decontaminate_bloom: the Bloom-prefiltered scale path ---
# Same answer as q_decontaminate BY CONSTRUCTION (Bloom filters have
# no false negatives; candidate shingles are exact-verified), so the
# oracle is O_DECONTAMINATE verbatim — the driver row proves the
# pre-pass loses no contaminated doc and admits no wrong one. What
# changes is the plan: the verify join sees only the shingles that
# pass a scan-stage bitset test (one-row broadcast bitmap as the join
# condition — no new shuffle, plan-pinned), so the benchmark side no
# longer needs to broadcast as a full string hash relation at scale.

def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.llm.curation import decontaminate_bloom

    train, bench = _decon_sides(spark, sf_dir)
    return decontaminate_bloom(train, bench, n=DECON_N)


# --- q_decontaminate_fuzzy: near-duplicate benchmark decontamination ---
# Exact shingle overlap (q_decontaminate) misses lightly-paraphrased
# eval leakage; the fuzzy pass flags any train doc whose Jaccard
# similarity to SOME benchmark doc clears a threshold, via the same
# MinHash-LSH machinery as the dedup family: index the (small) bench
# side once, dedup_increment the train side against it — band-key
# equi-join candidates, exact-Jaccard verification, never all-pairs.
# At 100 TB of train data the bench index is tiny and broadcastable;
# cost is one LSH pass over train. Per train doc: contaminated flag,
# distinct bench partners, max Jaccard.

DECON_FUZZY_T = 0.7


def q_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.llm.dedup import build_minhash_index, dedup_increment

    d = _docs(spark, sf_dir).select("doc_id", "text")
    bench = d.where(F.col("doc_id") % 20 == 0)
    train = d.where(F.col("doc_id") % 20 != 0)
    # dedup_increment BROADCASTS its batch side (bands and token-set
    # groups) into the band join and the verification — sized for a
    # crawl increment, not a corpus. Passing train (95% of the docs)
    # as the batch built that broadcast from the big side (a measured
    # 3.5 s single-task build at sf0.1, and a cliff at scale). The
    # LSH candidate condition, the size-ratio prefilter and the exact
    # Jaccard are all symmetric in the pair, so the roles swap freely:
    # bench (5%) is the broadcast batch, train is the streamed index
    # side, and the train-doc aggregation reads the pair's dup_id
    # column instead. Same pair set, same output (oracle-checked).
    t_bands, t_groups = build_minhash_index(train)
    pairs = dedup_increment(
        bench, t_bands, t_groups,
        threshold=DECON_FUZZY_T, include_intra=False,
    )
    agg = pairs.groupBy("dup_id").agg(
        F.count_distinct("doc_id").alias("n_bench_matches"),
        F.round(F.max("jaccard"), 6).alias("max_jaccard"),
    ).withColumnRenamed("dup_id", "doc_id")
    return train.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.col("n_bench_matches").isNotNull().alias("contaminated"),
        F.coalesce("n_bench_matches", F.lit(0)).alias("n_bench_matches"),
        F.coalesce("max_jaccard", F.lit(0.0)).alias("max_jaccard"),
    )


def _o_decontaminate_fuzzy(t: float = DECON_FUZZY_T) -> str:
    from mora_spark.queries.streaming import _pairs_prefix_sql

    return f"""
WITH {_pairs_prefix_sql(t)},
cross_m AS (
  SELECT CASE WHEN da % 20 = 0 THEN db ELSE da END AS doc_id, jaccard
  FROM pairs
  WHERE (da % 20 = 0) <> (db % 20 = 0)
),
agg AS (
  SELECT doc_id, count(*) AS n_bench_matches,
         round(max(jaccard), 6) AS max_jaccard
  FROM cross_m GROUP BY doc_id
)
SELECT d.doc_id,
       a.doc_id IS NOT NULL AS contaminated,
       COALESCE(a.n_bench_matches, 0) AS n_bench_matches,
       COALESCE(a.max_jaccard, 0.0) AS max_jaccard
FROM documents d LEFT JOIN agg a USING (doc_id)
WHERE d.doc_id % 20 <> 0
"""


_SHINGLES_SQL = (
    "list_transform("
    f"range(1, greatest(len(toks) - {DECON_N - 1}, 0) + 1), "
    f"i -> md5(array_to_string(toks[i:i + {DECON_N - 1}], ' ')))"
)

O_DECONTAMINATE = f"""
WITH d AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
bench AS (SELECT * FROM d WHERE doc_id % 20 = 0),
train AS (
  SELECT doc_id, toks FROM d WHERE doc_id % 20 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, toks FROM bench
),
t_sh AS (
  SELECT DISTINCT doc_id, sh
  FROM (SELECT doc_id, unnest({_SHINGLES_SQL}) AS sh FROM train)
),
b_sh AS (
  SELECT DISTINCT sh
  FROM (SELECT unnest({_SHINGLES_SQL}) AS sh FROM bench)
)
SELECT doc_id, count(*) AS n_hits
FROM t_sh JOIN b_sh USING (sh)
GROUP BY doc_id
"""


# --- q_vocab_topk: corpus vocabulary (top 200 tokens) ---

VOCAB_K = 200


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_topk(_docs(spark, sf_dir), k=VOCAB_K)


O_VOCAB_TOPK = f"""
SELECT token, cnt, rank FROM (
  SELECT token, count(*) AS cnt,
         row_number() OVER (ORDER BY count(*) DESC, token) AS rank
  FROM (SELECT unnest({TOKS_SQL}) AS token FROM documents)
  WHERE token <> ''
  GROUP BY token
) WHERE rank <= {VOCAB_K}
"""


# --- q_pack_sequences: concat-and-chunk packing into 512-token bins ---

PACK_BUDGET = 512


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_sequences(_docs(spark, sf_dir), budget=PACK_BUDGET)


O_PACK_SEQUENCES = f"""
WITH t AS (
  SELECT doc_id, len({TOKS_SQL})::BIGINT AS tok_len FROM documents
), c AS (
  SELECT doc_id, tok_len,
         CAST(sum(tok_len) OVER (ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, tok_len, cum_tokens,
       CAST(floor((cum_tokens - tok_len) / {PACK_BUDGET}.0) AS BIGINT)
         AS bin_first,
       CAST(floor((cum_tokens - 1) / {PACK_BUDGET}.0) AS BIGINT)
         AS bin_last,
       CAST(floor((cum_tokens - 1) / {PACK_BUDGET}.0) AS BIGINT)
         - CAST(floor((cum_tokens - tok_len) / {PACK_BUDGET}.0) AS BIGINT)
         + 1 AS n_bins
FROM c
"""


# --- q_pack_by_domain: per-domain concat-and-chunk packing ---
# The domain-sharded layout a temperature-mixed corpus is packed into:
# each source gets its own bin stream (shards never mix domains).
# Same two-phase prefix sum as q_pack_sequences, keyed by
# (source, id-chunk) so no domain drags through one window task.

def q_pack_by_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.llm.curation import pack_by_domain

    return pack_by_domain(_docs(spark, sf_dir), budget=PACK_BUDGET)


O_PACK_BY_DOMAIN = f"""
WITH t AS (
  SELECT doc_id, source, len({TOKS_SQL})::BIGINT AS tok_len
  FROM documents
), c AS (
  SELECT doc_id, source, tok_len,
         CAST(sum(tok_len) OVER (PARTITION BY source ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, source, tok_len, cum_tokens,
       CAST(floor((cum_tokens - tok_len) / {PACK_BUDGET}.0) AS BIGINT)
         AS bin_first,
       CAST(floor((cum_tokens - 1) / {PACK_BUDGET}.0) AS BIGINT)
         AS bin_last,
       CAST(floor((cum_tokens - 1) / {PACK_BUDGET}.0) AS BIGINT)
         - CAST(floor((cum_tokens - tok_len) / {PACK_BUDGET}.0) AS BIGINT)
         + 1 AS n_bins
FROM c
"""


# --- q_domain_mix: mixture reweighting toward a uniform source mix ---
# Per source: token share of the corpus and the sampling weight that
# would equalize the mixture (target = 1/n_sources). One map-side-
# combined agg + a broadcast of the 1-row total.

def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (
        _docs(spark, sf_dir)
        .select("source", F.size(tokens("text")).cast("long").alias("tl"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tl").alias("n_tokens"),
        )
    )
    tot = per.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .withColumn("token_share", F.col("n_tokens") / F.col("total_tokens"))
        .withColumn(
            "mix_weight",
            F.round((1.0 / F.col("n_sources")) / F.col("token_share"), 6),
        )
        .select(
            "source", "n_docs", "n_tokens",
            F.round("token_share", 6).alias("token_share"),
            "mix_weight",
        )
    )


O_DOMAIN_MIX = f"""
WITH per AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len({TOKS_SQL})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         count(*) AS n_sources
  FROM per
)
SELECT source, n_docs, n_tokens,
       round(n_tokens / CAST(total_tokens AS DOUBLE), 6) AS token_share,
       round((1.0 / n_sources)
             / (n_tokens / CAST(total_tokens AS DOUBLE)), 6) AS mix_weight
FROM per, tot
"""


# --- q_domain_mix_temp: temperature-weighted sampling under a budget ---
# The production form of domain mixing: q_domain_mix reports the
# reweighting, this one APPLIES it — per-source weights w_s scaled by
# sampling temperature τ (w_s ∝ n_tokens^τ; τ=1 natural, τ→0 uniform),
# a token budget converted to per-source keep rates min(1, B·w_s/n_s),
# and the deterministic hash-Bernoulli sampler executing them. Output
# verifies the whole chain per source: the closed-form weights/rates
# AND the sampled corpus they produce (kept doc/token counts,
# zero-coalesced so a fully-dropped source still reports). Rates are
# ROUNDED to the 1e-6 grid on both sides, so the double each engine
# compares hash uniforms against is identical even if pow() differs
# in the last ulp (round, not floor: floor flips at integer grid
# boundaries — exactly where the least(1,·) clamp parks rates at 1.0
# — while round's flip points are the half-grid marks last-ulp noise
# essentially never straddles). Joins are NULL-safe on the stratum:
# a NULL source is a real domain on both engines.

TEMP_TAU = 0.5
TEMP_BUDGET = 10_000


def q_domain_mix_temp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.llm.curation import temperature_mix, temperature_weights

    d = _docs(spark, sf_dir)
    w = temperature_weights(
        d, temperature=TEMP_TAU, token_budget=TEMP_BUDGET
    )
    kept = temperature_mix(
        d, temperature=TEMP_TAU, token_budget=TEMP_BUDGET, weights=w
    )
    ka = (
        kept.select(
            "source", F.size(tokens("text")).cast("long").alias("tl")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("tl").alias("kept_tokens"),
        )
    )
    ka = ka.select(
        F.col("source").alias("__ka_source"), "kept_docs", "kept_tokens"
    )
    return w.join(
        ka, F.col("source").eqNullSafe(F.col("__ka_source")), "left"
    ).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round("mix_weight", 6).alias("mix_weight"),
        "sample_rate",
        F.coalesce("kept_docs", F.lit(0).cast("long")).alias("kept_docs"),
        F.coalesce("kept_tokens", F.lit(0).cast("long")).alias(
            "kept_tokens"
        ),
    )


O_DOMAIN_MIX_TEMP = f"""
WITH per AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len({TOKS_SQL})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), z AS (
  SELECT sum(pow(n_tokens, {TEMP_TAU})) AS z FROM per
), w AS (
  SELECT source, n_docs, n_tokens,
         pow(n_tokens, {TEMP_TAU}) / z AS mix_weight,
         round(least(1.0, {TEMP_BUDGET}
                          * (pow(n_tokens, {TEMP_TAU}) / z)
                          / n_tokens) * 1e6) / 1e6 AS sample_rate
  FROM per, z
), kept AS (
  SELECT d.source, count(*) AS kept_docs,
         CAST(sum(len({TOKS_SQL})) AS BIGINT) AS kept_tokens
  FROM documents d JOIN w ON d.source IS NOT DISTINCT FROM w.source
  WHERE ('0x' || substr(md5('tempmix:' || d.doc_id), 1, 8))::BIGINT
          / 4294967296.0
        < w.sample_rate
  GROUP BY d.source
)
SELECT w.source, n_docs, n_tokens,
       round(mix_weight, 6) AS mix_weight, sample_rate,
       COALESCE(kept_docs, 0) AS kept_docs,
       COALESCE(kept_tokens, 0) AS kept_tokens
FROM w LEFT JOIN kept ON w.source IS NOT DISTINCT FROM kept.source
"""


# --- q_quality_rules: Gopher-style heuristic quality filters ---
# Length, mean word length, top-token repetition, duplicate-2-gram
# fraction, and the combined keep verdict per document.

def q_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_rules(_docs(spark, sf_dir))


O_QUALITY_RULES = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
scan AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         round(list_sum(list_transform(toks, x -> len(x)))
               / len(toks), 6) AS mean_word_len,
         CASE WHEN len(toks) > 1 THEN
           round(1.0 - len(list_distinct(list_transform(
                   range(1, greatest(len(toks) - 1, 0) + 1),
                   i -> toks[i] || ' ' || toks[i + 1])))
                 / (len(toks) - 1.0), 6)
         ELSE 0.0 END AS dup_2gram_frac
  FROM t
),
top AS (
  SELECT doc_id, round(max(c) / CAST(sum(c) AS DOUBLE), 6)
           AS top_token_frac
  FROM (
    SELECT doc_id, token, count(*) AS c
    FROM (SELECT doc_id, unnest(toks) AS token FROM t)
    GROUP BY doc_id, token
  )
  GROUP BY doc_id
)
SELECT doc_id, n_tokens, mean_word_len, top_token_frac, dup_2gram_frac,
       (n_tokens >= 5 AND n_tokens <= 10000
        AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
        AND top_token_frac <= 0.20
        AND dup_2gram_frac <= 0.30) AS keep
FROM scan JOIN top USING (doc_id)
"""


# --- q_quality_classifier: learned linear quality scoring ---
# The model-based stage after the heuristic gates: NB log-odds weights
# over hashed token buckets (closed-form fastText-shape training on
# the quality_rules verdicts — distillation), then a zero-shuffle
# scan-stage scoring pass (literal weight array + JVM aggregate HOF).
# The oracle replays BOTH stages symbolically: the label CTE is
# O_QUALITY_RULES verbatim as a subquery, training is a grouped count
# + the same rounded ln arithmetic, scoring the same fold.
# q_quality_classifier_labels is the external-labels twin (labels= is
# any (id, bool) frame — human ratings, an LLM judge; the DCLM
# production shape): same machinery trained on a planted label frame
# that is a pure function of doc_id, so both engines replay it.

def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.llm.classifier import (
        quality_classifier_score,
        train_quality_classifier,
    )

    docs = _docs(spark, sf_dir)
    weights, bias = train_quality_classifier(docs)
    return quality_classifier_score(docs, weights, bias)


def q_quality_classifier_labels(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mora_spark.llm.classifier import (
        quality_classifier_score,
        train_quality_classifier,
    )

    docs = _docs(spark, sf_dir)
    labels = docs.select(
        "doc_id", (F.col("doc_id") % 3 != 0).alias("keep")
    )
    weights, bias = train_quality_classifier(docs, labels=labels)
    return quality_classifier_score(docs, weights, bias)


def _o_quality_classifier(label_sql: str | None = None) -> str:
    from mora_spark.llm.classifier import ALPHA, N_BUCKETS

    d = N_BUCKETS
    a = float(ALPHA)
    if label_sql is None:
        label_sql = f"SELECT doc_id, keep AS y FROM ({O_QUALITY_RULES})"
    bucket = (
        "CAST(('0x' || substr(md5('clf:' || {x}), 1, 8)) AS BIGINT)"
        f" % {d}"
    )
    return f"""
WITH dt AS (
  SELECT doc_id, list_filter({TOKS_SQL}, x -> x != '') AS toks
  FROM documents
), lab AS (
  {label_sql}
), hits AS (
  SELECT {bucket.format(x="u.tok")} AS j, l.y
  FROM (SELECT doc_id, unnest(toks) AS tok FROM dt) u
  JOIN lab l USING (doc_id)
), cnt AS (
  SELECT j,
         count(*) FILTER (WHERE y) AS ck,
         count(*) FILTER (WHERE NOT y) AS cd
  FROM hits GROUP BY j
), tot AS (
  SELECT CAST(sum(ck) AS DOUBLE) AS tk,
         CAST(sum(cd) AS DOUBLE) AS td
  FROM cnt
), wj AS (
  SELECT js.j,
         round(ln((coalesce(ck, 0) + {a}) / (tk + {a * d}))
             - ln((coalesce(cd, 0) + {a}) / (td + {a * d})), 8) AS w
  FROM (SELECT unnest(range({d})) AS j) js
  LEFT JOIN cnt ON js.j = cnt.j
  CROSS JOIN tot
), warr AS (
  SELECT list(w ORDER BY j) AS w_arr FROM wj
), nb AS (
  SELECT round(ln((count(*) FILTER (WHERE y) + 1.0)
             / (count(*) FILTER (WHERE NOT y) + 1.0)), 8) AS bias
  FROM lab
), scored AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         CASE WHEN len(toks) > 0 THEN
           round(bias + list_sum(list_transform(toks,
                   x -> w_arr[{bucket.format(x="x")} + 1]))
                 / len(toks), 6)
         END AS clf_logit
  FROM dt CROSS JOIN warr CROSS JOIN nb
)
SELECT doc_id, n_tokens, clf_logit,
       round(1.0 / (1.0 + exp(-clf_logit)), 8) AS clf_score,
       clf_logit > 0 AS clf_keep
FROM scored
"""


# --- q_boilerplate: corpus-common shingle fraction per document ---
# Template-text detection: the share of a doc's distinct 5-gram
# shingles that occur in >= 2 distinct documents.

BOILER_N = 5
BOILER_MIN_DOCS = 2

_BOILER_SHINGLES_SQL = (
    "list_distinct(list_transform("
    f"range(1, greatest(len(toks) - {BOILER_N - 1}, 0) + 1), "
    f"i -> md5(array_to_string(toks[i:i + {BOILER_N - 1}], ' '))))"
)


def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return boilerplate_frac(
        _docs(spark, sf_dir), n=BOILER_N, min_docs=BOILER_MIN_DOCS
    )


O_BOILERPLATE = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
sh AS (
  SELECT doc_id, unnest({_BOILER_SHINGLES_SQL}) AS sh FROM t
),
common AS (
  SELECT sh FROM sh GROUP BY sh
  HAVING count(*) >= {BOILER_MIN_DOCS}
),
per AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
hits AS (
  SELECT doc_id, count(*) AS n_common
  FROM sh WHERE sh IN (SELECT sh FROM common)
  GROUP BY doc_id
)
SELECT doc_id, n_shingles,
       coalesce(n_common, 0) AS n_common,
       round(coalesce(n_common, 0) / CAST(n_shingles AS DOUBLE), 6)
         AS boiler_frac
FROM per LEFT JOIN hits USING (doc_id)
"""


# --- q_train_shards: deterministic shuffle + shard for export ---
# The last curation step before shard files are written: a seedless,
# engine-independent global permutation (md5 order) bucketed into
# uniform shards. The oracle replays the identical hash arithmetic.

N_TRAIN_SHARDS = 32


def q_train_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.llm.curation import train_shards

    return train_shards(
        _docs(spark, sf_dir).select("doc_id", "text"),
        n_shards=N_TRAIN_SHARDS,
    )


O_TRAIN_SHARDS = f"""
WITH h AS (
  SELECT doc_id,
         md5('shard:' || CAST(doc_id AS VARCHAR)) AS hx,
         len({TOKS_SQL}) AS n_tokens
  FROM documents
), s AS (
  SELECT doc_id, hx, n_tokens,
         CAST(('0x' || substr(hx, 1, 8)) AS BIGINT) % {N_TRAIN_SHARDS}
           AS shard
  FROM h
)
SELECT doc_id, shard,
       row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id) - 1
         AS pos,
       n_tokens
FROM s
"""


# --- q_chunk_docs: overlapping training-window chunking ---
# The step between curation and packing when documents exceed the
# training sequence length: chunk w covers tokens [w*stride, w*stride
# + size), stride = size - overlap, so adjacent chunks share overlap
# tokens of context and every token is covered. One scan, zero
# shuffles (sequence + explode + slice, all JVM-side).

CHUNK_SIZE = 48
CHUNK_OVERLAP = 8


def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.llm.curation import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir), size=CHUNK_SIZE, overlap=CHUNK_OVERLAP
    )


_CHUNK_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP

O_CHUNK_DOCS = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
c AS (
  SELECT doc_id, toks,
         greatest(1, CAST(ceil((len(toks) - {CHUNK_OVERLAP})
                               / {_CHUNK_STRIDE}.0) AS INT)) AS n_chunks
  FROM t
),
w AS (SELECT doc_id, toks, unnest(range(n_chunks)) AS chunk_id FROM c)
SELECT doc_id, chunk_id,
       array_to_string(
         toks[chunk_id * {_CHUNK_STRIDE} + 1 :
              chunk_id * {_CHUNK_STRIDE} + {CHUNK_SIZE}], ' ') AS chunk_text,
       len(toks[chunk_id * {_CHUNK_STRIDE} + 1 :
                chunk_id * {_CHUNK_STRIDE} + {CHUNK_SIZE}]) AS n_tokens
FROM w
"""


# --- q_lm_score: self-trained bigram LM scoring (perplexity filter) ---
# The scores are unrounded doubles (libm ln/exp agree across engines
# to ~1 ulp, well inside the gate's 1e-9 relative tolerance); rounding
# would ADD divergence risk at 6-dp grid boundaries since no discrete
# decision is taken on the values.

def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.llm.curation import lm_score

    return lm_score(_docs(spark, sf_dir))


O_LM_SCORE = f"""
WITH d AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
b AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i + 1])) AS bg
  FROM d
), e AS (
  SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1 FROM b
), uni AS (
  SELECT tok, count(*) AS cu
  FROM (SELECT unnest(toks) AS tok FROM d)
  WHERE tok != '' GROUP BY tok
), v AS (
  SELECT CAST(count(*) AS DOUBLE) AS v_size FROM uni
), big AS (
  SELECT bg, count(*) AS cb FROM e GROUP BY bg
), scored AS (
  SELECT e.doc_id,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         avg(ln((cb + 1.0) / (cu + v_size))) AS lm_logp
  FROM e
  JOIN big USING (bg)
  JOIN uni ON e.w1 = uni.tok
  CROSS JOIN v
  GROUP BY e.doc_id
)
SELECT d.doc_id,
       coalesce(s.n_bigrams, 0) AS n_bigrams,
       s.lm_logp,
       exp(-s.lm_logp) AS lm_ppl
FROM d LEFT JOIN scored s USING (doc_id)
"""


QUERIES = {
    "q_stratified_sample": q_stratified_sample,
    "q_lm_score": q_lm_score,
    "q_chunk_docs": q_chunk_docs,
    "q_train_shards": q_train_shards,
    "q_quality_rules": q_quality_rules,
    "q_quality_classifier": q_quality_classifier,
    "q_quality_classifier_labels": q_quality_classifier_labels,
    "q_boilerplate": q_boilerplate,
    "q_decontaminate": q_decontaminate,
    "q_decontaminate_bloom": q_decontaminate_bloom,
    "q_decontaminate_fuzzy": q_decontaminate_fuzzy,
    "q_vocab_topk": q_vocab_topk,
    "q_pack_sequences": q_pack_sequences,
    "q_domain_mix": q_domain_mix,
    "q_domain_mix_temp": q_domain_mix_temp,
    "q_pack_by_domain": q_pack_by_domain,
}

ORACLES = {
    "q_stratified_sample": O_STRATIFIED_SAMPLE,
    "q_lm_score": O_LM_SCORE,
    "q_chunk_docs": O_CHUNK_DOCS,
    "q_train_shards": O_TRAIN_SHARDS,
    "q_quality_rules": O_QUALITY_RULES,
    "q_quality_classifier": _o_quality_classifier(),
    "q_quality_classifier_labels": _o_quality_classifier(
        "SELECT doc_id, (doc_id % 3) != 0 AS y FROM documents"
    ),
    "q_boilerplate": O_BOILERPLATE,
    "q_decontaminate": O_DECONTAMINATE,
    "q_decontaminate_bloom": O_DECONTAMINATE,
    "q_decontaminate_fuzzy": _o_decontaminate_fuzzy(),
    "q_vocab_topk": O_VOCAB_TOPK,
    "q_pack_sequences": O_PACK_SEQUENCES,
    "q_domain_mix": O_DOMAIN_MIX,
    "q_domain_mix_temp": O_DOMAIN_MIX_TEMP,
    "q_pack_by_domain": O_PACK_BY_DOMAIN,
}

"""Text-analysis + dedup declared queries over ``documents``.

The shared token derivation is mirrored between Spark
(``mora_spark.functions.text``) and the DuckDB oracles via
:data:`TOKS_SQL`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mora_spark.datasets import load_table, spread
from mora_spark.functions.text import (
    LANG_MARKERS,
    STOPWORDS,
    bpe_token_estimate,
    distinct_tokens,
    fingerprint,
    lang_guess,
    prefix_fingerprint,
    quality_score,
    stopword_ratio,
    tokens,
    type_token_ratio,
)
from mora_spark.llm.dedup import (
    derive_minhash_params,
    exact_dedup,
    minhash_lsh_pairs,
    neardup_clusters,
    ngram_jaccard_pairs,
    simhash16,
)

# DuckDB twin of functions.text.tokens()
TOKS_SQL = (
    "string_split(trim(regexp_replace(regexp_replace(lower(text), "
    "'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')"
)


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the tokenize/shingle/md5 work these queries fuse onto the
    # scan must not serialize on a one-row-group local file.
    return spread(load_table(spark, sf_dir, "documents"))


# --- q_dedup_exact: exact dedup over a re-crawled (doubled) corpus ---

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    recrawl = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = d.unionByName(recrawl)
    return exact_dedup(corpus).select(
        "doc_id", "content_hash", "canonical_id", "group_size", "is_duplicate"
    )


O_DEDUP_EXACT = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
), h AS (
  SELECT doc_id, md5(text) AS content_hash FROM corpus
), g AS (
  SELECT content_hash, min(doc_id) AS canonical_id, count(*) AS group_size
  FROM h GROUP BY content_hash
)
SELECT h.doc_id, h.content_hash, g.canonical_id, g.group_size,
       h.doc_id <> g.canonical_id AS is_duplicate
FROM h JOIN g USING (content_hash)
"""


# --- q_text_stats: token counting + quality scoring ---

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).withColumn("toks", tokens("text"))
    t = F.col("toks")
    return d.select(
        "doc_id",
        "lang",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct"),
        bpe_token_estimate(t).alias("n_tokens_bpe"),
        stopword_ratio(t).alias("stop_ratio"),
        type_token_ratio(t).alias("ttr"),
        quality_score(t).alias("quality"),
    )


O_TEXT_STATS = f"""
WITH t AS (SELECT doc_id, lang, {TOKS_SQL} AS toks FROM documents),
s AS (
  SELECT doc_id, lang,
         len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_distinct,
         CAST(list_sum(list_transform(toks, x -> ceil(len(x) / 4.0)))
              AS BIGINT) AS n_tokens_bpe,
         len(list_filter(toks, x -> list_contains({_sql_list(STOPWORDS)}, x)))
           / len(toks) AS stop_ratio,
         len(list_distinct(toks)) / len(toks) AS ttr
  FROM t
)
SELECT doc_id, lang, n_tokens, n_distinct, n_tokens_bpe, stop_ratio, ttr,
       0.3 * least(1.0, n_tokens / 100.0) + 0.4 * ttr
         + 0.3 * (1.0 - stop_ratio) AS quality
FROM s
"""


# --- q_lang_id: marker-word language identification ---

def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).withColumn("toks", tokens("text"))
    return d.select(
        "doc_id",
        "lang",
        lang_guess(F.col("toks")).alias("lang_guess"),
    )


def _o_lang_id() -> str:
    counts = {
        lang: f"len(list_filter(toks, x -> list_contains({_sql_list(m)}, x)))"
        for lang, m in LANG_MARKERS.items()
    }
    return f"""
WITH t AS (SELECT doc_id, lang, {TOKS_SQL} AS toks FROM documents),
c AS (
  SELECT doc_id, lang,
         {counts['en']} AS n_en, {counts['es']} AS n_es,
         {counts['de']} AS n_de, {counts['fr']} AS n_fr
  FROM t
)
SELECT doc_id, lang,
       CASE WHEN greatest(n_en, n_es, n_de, n_fr) = 0 THEN 'und'
            WHEN n_en = greatest(n_en, n_es, n_de, n_fr) THEN 'en'
            WHEN n_es = greatest(n_en, n_es, n_de, n_fr) THEN 'es'
            WHEN n_de = greatest(n_en, n_es, n_de, n_fr) THEN 'de'
            ELSE 'fr' END AS lang_guess
FROM c
"""


# --- q_fingerprint: content + prefix fingerprints ---

def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).withColumn("toks", tokens("text"))
    return d.select(
        "doc_id",
        fingerprint("text").alias("fp"),
        prefix_fingerprint(F.col("toks"), 10).alias("fp_prefix10"),
    )


O_FINGERPRINT = f"""
WITH t AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
              ' +', ' ', 'g')) AS norm,
         {TOKS_SQL} AS toks
  FROM documents
)
SELECT doc_id, md5(norm) AS fp,
       md5(array_to_string(toks[1:10], ' ')) AS fp_prefix10
FROM t
"""


# --- q_jaccard_pairs: exact word-set similarity, length-banded ---
# Same result as the quadratic formulation (the oracle below IS the
# all-pairs SQL) but the plan is an equi-join on log2-size bands —
# lossless for threshold 0.5 (see ngram_jaccard_pairs docstring).

def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.5)


O_JACCARD_PAIRS = f"""
WITH t AS (SELECT doc_id, list_distinct({TOKS_SQL}) AS toks FROM documents)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.toks, b.toks))
           / len(list_distinct(list_concat(a.toks, b.toks))) AS jaccard
  FROM t a JOIN t b ON a.doc_id < b.doc_id
) WHERE jaccard >= 0.5
"""


# --- q_redact_pii: planted-PII scan-stage redaction ---
# The synthetic corpus carries no PII, so the query PLANTS a
# deterministic contact span on every 5th doc (the same
# plant-then-verify pattern as the embedding near-dup query) and the
# oracle replays the identical plant — the driver hash verifies both
# detection counts and the redacted content.

def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.functions.text import pii_counts, redact_pii

    d = _docs(spark, sf_dir).select("doc_id", "text")
    planted = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.com call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.col("text")),
    )
    c = pii_counts(F.col("text"))
    return planted.select(
        "doc_id",
        c["email"].alias("n_emails"),
        c["phone"].alias("n_phones"),
        F.md5(redact_pii(F.col("text"))).alias("redacted_fp"),
    )


def _o_redact_pii() -> str:
    from mora_spark.functions.text import PII_PATTERNS

    em, ph = PII_PATTERNS["email"], PII_PATTERNS["phone"]
    return f"""
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN
           text || ' contact user' || doc_id || '@mail.com call 555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '{em}')) AS n_emails,
       len(regexp_extract_all(text, '{ph}')) AS n_phones,
       md5(regexp_replace(regexp_replace(text, '{em}', '<EMAIL>', 'g'),
                          '{ph}', '<PHONE>', 'g')) AS redacted_fp
FROM p
"""


# --- q_dedup_lines: corpus-wide line-level exact dedup (C4-style) ---
# The synthetic corpus is single-line, so the query PLANTS line
# structure (the same plant-then-verify pattern as q_redact_pii):
# every doc gains a shared boilerplate header and a doc_id%7 footer.
# The operator must keep the header once corpus-wide, keep one footer
# per variant, and dedup exactly-duplicated body lines to their first
# occurrence — the oracle replays the plant and the first-occurrence
# rule, so the driver hash verifies content, order, and counts.

_LINE_HEADER = "subscribe to our newsletter for updates"
_LINE_FOOTER = "copyright footer variant"


def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.llm.dedup import dedup_lines

    d = _docs(spark, sf_dir).select("doc_id", "text")
    planted = d.withColumn(
        "text",
        F.concat(
            F.lit(_LINE_HEADER + "\n"),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("\n" + _LINE_FOOTER + " "),
            (F.col("doc_id") % 7).cast("string"),
        ),
    )
    return dedup_lines(planted)


O_DEDUP_LINES = f"""
WITH p AS (
  SELECT doc_id,
         '{_LINE_HEADER}' || chr(10) || coalesce(text, '') || chr(10)
           || '{_LINE_FOOTER} ' || CAST(doc_id % 7 AS VARCHAR) AS text
  FROM documents
), lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         unnest(generate_series(1, len(string_split(text, chr(10))))) AS pos
  FROM p
), ranked AS (
  SELECT doc_id, pos, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
  FROM lines
), rebuilt AS (
  SELECT doc_id,
         string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
         count(*) AS n_kept
  FROM ranked WHERE len(line) < 1 OR rn = 1
  GROUP BY doc_id
)
SELECT p.doc_id,
       coalesce(r.text_dedup, '') AS text_dedup,
       len(string_split(p.text, chr(10))) AS n_total,
       coalesce(r.n_kept, 0) AS n_kept
FROM p LEFT JOIN rebuilt r USING (doc_id)
"""


# --- q_minhash_lsh: banded MinHash near-dup (the scale path) ---

def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(
        _docs(spark, sf_dir), threshold=0.5, cache_key=sf_dir
    )


# --- q_minhash_lsh_derived: recall-derived LSH banding ---
# Same operator, (band_size, n_bands) solved from the S-curve for
# candidate recall >= 0.99 AT the threshold boundary (derive-don't-
# eyeball, the round-13 discipline — SRP and IVF sizing got the same
# treatment). At threshold 0.5 the solve yields (3, 35) = 105 hashes
# vs the fixed (4, 4) = 16 whose boundary recall is 0.23; the oracle
# replays the derived family symbolically, so the driver verifies the
# derived banding admits exactly the pairs the S-curve promises.

def q_minhash_lsh_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    r, b = derive_minhash_params(0.5)
    return minhash_lsh_pairs(
        _docs(spark, sf_dir), threshold=0.5, cache_key=sf_dir,
        band_size=r, n_bands=b,
    )


def _o_minhash(
    threshold: float = 0.5,
    band_size: int | None = None,
    n_bands: int | None = None,
) -> str:
    """Doc-level rendition of the engine's group-level LSH pipeline.

    Equivalent by construction: the MinHash signature, band keys, and
    Jaccard all depend only on a document's distinct-token set, so
    grouping identical sets (engine) vs. treating every doc separately
    (oracle) admits exactly the same pairs with the same scores.
    ``(band_size, n_bands)`` default to the engine's fixed constants;
    the derived row passes :func:`derive_minhash_params` output so
    both sides replay the same family prefix.
    """
    from mora_spark.llm.dedup import (
        BAND_SIZE,
        MINHASH_P,
        N_HASHES,
        minhash_ab,
    )

    r = BAND_SIZE if band_size is None else band_size
    nb = N_HASHES // BAND_SIZE if n_bands is None else n_bands
    sig_items = ", ".join(
        f"list_min(list_transform(ti, h -> ({a} * (h // 2) + {b}) % {MINHASH_P}))"
        for a, b in minhash_ab(r * nb)
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         list_distinct(list_transform(list_distinct({TOKS_SQL}),
           tok -> CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT))) AS ti
  FROM documents
),
sig AS (SELECT doc_id, ti, len(ti) AS n, [{sig_items}] AS mh FROM t),
banded AS (
  SELECT doc_id, b,
         md5(array_to_string(mh[{r} * b + 1 : {r} * b + {r}], '|')) AS band_key
  FROM sig CROSS JOIN (SELECT unnest(range({nb})) AS b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b ON a.b = b.b AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT doc_a, doc_b,
         len(list_intersect(ta.ti, tb.ti))
           / (ta.n + tb.n - len(list_intersect(ta.ti, tb.ti))) AS jaccard
  FROM cand
  JOIN sig ta ON ta.doc_id = doc_a
  JOIN sig tb ON tb.doc_id = doc_b
  WHERE least(ta.n, tb.n) >= {threshold} * greatest(ta.n, tb.n)
) WHERE jaccard >= {threshold}
"""


# --- q_dedup_increment: new-batch dedup against a persisted index ---

def q_dedup_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup, the production ingestion shape: the standing
    corpus (doc_id % 10 != 0) is LSH-indexed ONCE and persisted; the
    new crawl increment (doc_id % 10 == 0) is deduped against the
    loaded index plus itself, never re-tokenizing the corpus. The
    round-trip through parquet is part of the query so the driver
    verifies the persisted-index path, not just the in-memory plan."""
    import shutil

    from mora_spark.llm.dedup import (
        build_minhash_index,
        dedup_increment,
        load_minhash_index,
        save_minhash_index,
    )
    from mora_spark.queries.store import scratch_dir

    d = _docs(spark, sf_dir)
    corpus = d.where(F.col("doc_id") % 10 != 0)
    batch = d.where(F.col("doc_id") % 10 == 0)
    path = scratch_dir("minhash_index", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    save_minhash_index(*build_minhash_index(corpus), path)
    bands, groups = load_minhash_index(spark, path)
    return dedup_increment(batch, bands, groups, threshold=0.5)


def _dedup_incr_stage(spark: SparkSession, sf_dir: str) -> None:
    """Bench staging (untimed): build + persist the standing-corpus
    LSH index once — indexing is ingest-time cost amortized over every
    later crawl increment (the same discipline as the ANN `_hot`
    twins); the timed line is the per-batch path a continuous
    ingestion loop actually repeats."""
    import shutil

    from mora_spark.llm.dedup import build_minhash_index, save_minhash_index
    from mora_spark.queries.store import scratch_dir

    path = scratch_dir("minhash_index_hot", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    corpus = _docs(spark, sf_dir).where(F.col("doc_id") % 10 != 0)
    save_minhash_index(*build_minhash_index(corpus), path)


def dedup_increment_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only: the repeated path — load the pre-staged index
    (family from metadata) and dedup one crawl increment against it:
    shard-pruned band join, gshard-pruned token fetch, exact-Jaccard
    verify, within-batch pairs."""
    from mora_spark.llm.dedup import (
        dedup_increment,
        load_minhash_family,
        load_minhash_index,
    )
    from mora_spark.queries.store import scratch_dir

    path = scratch_dir("minhash_index_hot", sf_dir)
    batch = _docs(spark, sf_dir).where(F.col("doc_id") % 10 == 0)
    bands, groups = load_minhash_index(spark, path)
    return dedup_increment(
        batch, bands, groups, threshold=0.5,
        index_family=load_minhash_family(path),
    )


# --- q_dedup_increment_derived: the recall contract, persisted ---
# The production completion of q_minhash_lsh_derived (VERDICT r13
# missing #2): the recall-derived family is part of the INDEX FORMAT
# now — built in, persisted as metadata by save_minhash_index, read
# back with load_minhash_family, and handed to dedup_increment as
# index_family so the increment bands its batch identically. The
# oracle replays the same derived family symbolically; a family that
# failed to round-trip through the parquet index would show up as a
# near-empty Spark side vs the oracle's full pair set.

def q_dedup_increment_derived(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil

    from mora_spark.llm.dedup import (
        build_minhash_index,
        dedup_increment,
        load_minhash_family,
        load_minhash_index,
        save_minhash_index,
    )
    from mora_spark.queries.store import scratch_dir

    r, b = derive_minhash_params(0.5)
    d = _docs(spark, sf_dir)
    corpus = d.where(F.col("doc_id") % 10 != 0)
    batch = d.where(F.col("doc_id") % 10 == 0)
    path = scratch_dir("minhash_index_derived", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    save_minhash_index(
        *build_minhash_index(corpus, band_size=r, n_bands=b),
        path,
        band_size=r,
        n_bands=b,
    )
    bands, groups = load_minhash_index(spark, path)
    return dedup_increment(
        batch, bands, groups, threshold=0.5,
        index_family=load_minhash_family(path),
    )


def _o_dedup_increment(
    threshold: float = 0.5,
    band_size: int | None = None,
    n_bands: int | None = None,
) -> str:
    """Doc-level rendition of the index + increment pipeline: same
    banding as :func:`_o_minhash` (fixed constants by default, the
    derived family when passed — both sides replay the same affine
    prefix), with candidates restricted to (increment x corpus) and
    (increment x earlier-in-increment)."""
    from mora_spark.llm.dedup import (
        BAND_SIZE,
        MINHASH_P,
        N_HASHES,
        minhash_ab,
    )

    r = BAND_SIZE if band_size is None else band_size
    nb = N_HASHES // BAND_SIZE if n_bands is None else n_bands
    sig_items = ", ".join(
        f"list_min(list_transform(ti, h -> ({a} * (h // 2) + {b}) % {MINHASH_P}))"
        for a, b in minhash_ab(r * nb)
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         list_distinct(list_transform(list_distinct({TOKS_SQL}),
           tok -> CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT))) AS ti
  FROM documents
),
sig AS (SELECT doc_id, ti, len(ti) AS n, [{sig_items}] AS mh FROM t),
banded AS (
  SELECT doc_id, b,
         md5(array_to_string(mh[{r} * b + 1 : {r} * b + {r}], '|')) AS band_key
  FROM sig CROSS JOIN (SELECT unnest(range({nb})) AS b)
),
cand AS (
  SELECT DISTINCT n.doc_id AS doc_id, c.doc_id AS dup_id, 'corpus' AS src
  FROM banded n
  JOIN banded c ON n.b = c.b AND n.band_key = c.band_key
  WHERE n.doc_id % 10 = 0 AND c.doc_id % 10 != 0
  UNION ALL
  SELECT DISTINCT n.doc_id, c.doc_id AS dup_id, 'batch' AS src
  FROM banded n
  JOIN banded c ON n.b = c.b AND n.band_key = c.band_key
  WHERE n.doc_id % 10 = 0 AND c.doc_id % 10 = 0 AND c.doc_id < n.doc_id
)
SELECT doc_id, dup_id, jaccard, src FROM (
  SELECT cand.doc_id, cand.dup_id, cand.src,
         len(list_intersect(ta.ti, tb.ti))
           / (ta.n + tb.n - len(list_intersect(ta.ti, tb.ti))) AS jaccard
  FROM cand
  JOIN sig ta ON ta.doc_id = cand.doc_id
  JOIN sig tb ON tb.doc_id = cand.dup_id
  WHERE least(ta.n, tb.n) >= {threshold} * greatest(ta.n, tb.n)
) WHERE jaccard >= {threshold}
"""


# --- q_dedup_clusters: near-dup PAIRS -> dedup CLUSTERS ---
# The iterative-algorithm entry: min-label propagation over the
# CONTRACTED group graph (llm.dedup.neardup_clusters — one node per
# unique token set, not per doc pair). The oracle replays the
# equivalent doc-level graph as a recursive CTE (label = min
# reachable vertex).

def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    cc = neardup_clusters(
        _docs(spark, sf_dir), threshold=0.5, cache_key=sf_dir
    )
    sizes = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        cc.join(sizes, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            (F.col("doc_id") != F.col("cluster_id")).alias("is_duplicate"),
        )
    )


def _o_dedup_clusters(threshold: float = 0.5) -> str:
    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_o_minhash(threshold)})
),
bidir AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
cc(node, label) AS (
  SELECT DISTINCT a, a FROM bidir
  UNION
  SELECT bidir.a, cc.label FROM bidir JOIN cc ON cc.node = bidir.b
),
final AS (SELECT node, min(label) AS cluster_id FROM cc GROUP BY node)
SELECT node AS doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       node <> cluster_id AS is_duplicate
FROM final
"""


# --- q_corpus_curation: the end-to-end training-data pipeline ---
# lang-ID gate -> quality gate -> exact-dedup canonical -> near-dup
# cluster canonical. Each stage is an operator already verified alone;
# this query checks their COMPOSITION (the order matters: near-dup
# canonicals are the global cluster minima, so the stage commutes with
# the row-local filters and stays SQL-replicable).

def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).withColumn("toks", tokens("text"))
    stats = d.select(
        "doc_id",
        "text",
        lang_guess(F.col("toks")).alias("lang_guess"),
        quality_score(F.col("toks")).alias("quality"),
        F.size("toks").alias("n_tokens"),
    )
    filtered = stats.where(
        (F.col("lang_guess") == "en")
        & (F.col("quality") >= 0.5)
        & (F.col("n_tokens") >= 20)
    )
    exact_keep = filtered.withColumn(
        "canon",
        F.min("doc_id").over(Window.partitionBy(F.md5("text"))),
    ).where(F.col("doc_id") == F.col("canon"))
    # 0.8: curation wants tight near-dup clusters; at 0.5 this
    # template-generated corpus chains into two giant components and
    # the canonical-only rule would cull nearly everything.
    near_dups = (
        neardup_clusters(_docs(spark, sf_dir), threshold=0.8, cache_key=sf_dir)
        .where(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    return exact_keep.join(near_dups, "doc_id", "left_anti").select(
        "doc_id", "lang_guess", "quality", "n_tokens"
    )


def _o_corpus_curation() -> str:
    lang_sql = _o_lang_id()
    quality_sql = O_TEXT_STATS
    clusters_sql = _o_dedup_clusters(threshold=0.8)
    return f"""
WITH lang AS (SELECT doc_id, lang_guess FROM ({lang_sql})),
qual AS (SELECT doc_id, quality, n_tokens FROM ({quality_sql})),
filtered AS (
  SELECT d.doc_id, d.text, lang_guess, quality, n_tokens
  FROM documents d
  JOIN lang USING (doc_id) JOIN qual USING (doc_id)
  WHERE lang_guess = 'en' AND quality >= 0.5 AND n_tokens >= 20
),
exact_keep AS (
  SELECT * FROM (
    SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS canon
    FROM filtered
  ) WHERE doc_id = canon
),
near_dups AS (
  SELECT doc_id FROM ({clusters_sql}) WHERE is_duplicate
)
SELECT doc_id, lang_guess, quality, n_tokens
FROM exact_keep
WHERE doc_id NOT IN (SELECT doc_id FROM near_dups)
"""


# --- q_cluster_best: quality-aware canonical selection per cluster ---
# The realistic dedup policy: within each near-dup cluster keep the
# HIGHEST-QUALITY member (tie-break min doc_id), not the min-id one.
# The winner is picked with a single max(struct(quality, -doc_id))
# aggregation — partial-aggregable (map-side combine), so a
# billion-member boilerplate cluster never funnels into one sort
# partition the way a row_number-over-cluster window would. Quality is
# rounded to 6 dp on BOTH sides before comparison (same policy as the
# ANN score ranks) so near-tie ordering cannot diverge across engines.

def q_cluster_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.functions.text import quality_score

    d = _docs(spark, sf_dir)
    cc = neardup_clusters(d, threshold=0.8, cache_key=sf_dir)
    q = d.withColumn("toks", tokens("text")).select(
        "doc_id", F.round(quality_score(F.col("toks")), 6).alias("quality")
    )
    j = cc.join(q, "doc_id")
    best = j.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.max(
            F.struct(F.col("quality"), (-F.col("doc_id")).alias("nid"))
        ).alias("w"),
    )
    return best.select(
        "cluster_id",
        (-F.col("w.nid")).cast("long").alias("keep_doc_id"),
        F.col("w.quality").alias("best_quality"),
        "cluster_size",
    )


def _o_cluster_best() -> str:
    return f"""
WITH cc AS (
  SELECT doc_id, cluster_id FROM ({_o_dedup_clusters(threshold=0.8)})
),
q AS (SELECT doc_id, round(quality, 6) AS quality FROM ({O_TEXT_STATS})),
j AS (SELECT cluster_id, doc_id, quality FROM cc JOIN q USING (doc_id))
SELECT cluster_id, doc_id AS keep_doc_id, quality AS best_quality,
       cluster_size
FROM (
  SELECT *, row_number() OVER (PARTITION BY cluster_id
                               ORDER BY quality DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS cluster_size
  FROM j
) WHERE rn = 1
"""


# --- q_simhash: 16-bit simhash signatures ---

def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash16(_docs(spark, sf_dir))


O_SIMHASH = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct({TOKS_SQL})) AS tok FROM documents
), h AS (
  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h
  FROM tok
), bits AS (
  SELECT doc_id, bit,
         CASE WHEN (h >> CAST(bit AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END AS vote
  FROM h CROSS JOIN (SELECT unnest(range(16)) AS bit)
), v AS (
  SELECT doc_id, bit, sum(vote) AS v FROM bits GROUP BY doc_id, bit
)
SELECT doc_id,
       CAST(sum(CASE WHEN v > 0
                THEN (CAST(1 AS BIGINT) << CAST(bit AS INTEGER))
                ELSE 0 END) AS BIGINT) AS simhash
FROM v GROUP BY doc_id
"""


# --- q_simhash_pairs: banded Hamming-distance near-dup search ---
# The searchable side of SimHash: pigeonhole chunk banding turns
# "hamming <= 2 over all pairs" into an equi-join on chunk values; the
# oracle verifies against the plain all-pairs formulation (equivalent
# by the pigeonhole argument, so banding must lose nothing).

def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.llm.dedup import simhash_neardup_pairs

    return simhash_neardup_pairs(_docs(spark, sf_dir), max_hamming=2)


O_SIMHASH_PAIRS = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct({TOKS_SQL})) AS tok FROM documents
), h AS (
  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h
  FROM tok
), bits AS (
  SELECT doc_id, bit,
         CASE WHEN (h >> CAST(bit AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END AS vote
  FROM h CROSS JOIN (SELECT unnest(range(16)) AS bit)
), v AS (
  SELECT doc_id, bit, sum(vote) AS v FROM bits GROUP BY doc_id, bit
), sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v > 0
                  THEN (CAST(1 AS BIGINT) << CAST(bit AS INTEGER))
                  ELSE 0 END) AS BIGINT) AS simhash
  FROM v GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
"""


# --- q_dup_spans: exact duplicated-substring span detection ---
# Substring dedup (Lee et al.'s exact-substring mode) as shingle
# algebra: pairs share a >= k-token verbatim run iff they share a
# k-shingle; run length = longest consecutive diagonal of aligned
# shingle positions + k - 1. Shingles in more than DUP_SPAN_MAX_DF
# docs are excluded (boilerplate guard, bounds pair fan-out) — the
# oracle applies the identical cap, so the driver verifies the whole
# contract including the cap.

DUP_SPAN_K = 8
DUP_SPAN_MAX_DF = 32


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.llm.dedup import duplicate_spans

    return duplicate_spans(
        _docs(spark, sf_dir), k=DUP_SPAN_K, max_df=DUP_SPAN_MAX_DF
    )


def _o_dup_spans() -> str:
    k, max_df = DUP_SPAN_K, DUP_SPAN_MAX_DF
    pos_range = f"range(1, greatest(len(toks) - {k - 1}, 0) + 1)"
    return f"""
WITH d AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
sh AS (
  SELECT doc_id,
         unnest({pos_range}) AS pos,
         unnest(list_transform({pos_range},
                i -> md5(array_to_string(toks[i:i + {k - 1}], ' ')))) AS sh
  FROM d
), keep AS (
  SELECT sh FROM (
    SELECT sh, count(DISTINCT doc_id) AS df_docs FROM sh GROUP BY sh
  ) WHERE df_docs <= {max_df}
), shk AS (
  SELECT sh.* FROM sh JOIN keep USING (sh)
), m AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa,
         a.pos - b.pos AS diag
  FROM shk a JOIN shk b ON a.sh = b.sh AND a.doc_id < b.doc_id
), runs AS (
  SELECT id_a, id_b, diag, grp, count(*) AS run
  FROM (
    SELECT id_a, id_b, diag, pa,
           pa - row_number() OVER (PARTITION BY id_a, id_b, diag
                                   ORDER BY pa) AS grp
    FROM m
  )
  GROUP BY id_a, id_b, diag, grp
)
SELECT id_a, id_b,
       CAST(sum(run) AS BIGINT) AS n_shared,
       CAST(max(run) + {k - 1} AS BIGINT) AS max_span
FROM runs
GROUP BY id_a, id_b
"""


# --- q_jsonl_roundtrip: JSONL interchange losslessness ---
# The LLM-pipeline interchange format: export documents as JSONL
# shards, re-read under an explicit schema (no inference pass), return
# the round-tripped table. The oracle is the source table itself, so
# the driver hash verifies byte-exact survival of unicode, quotes, and
# embedded newlines (JSON-escaped — line framing is safe) through
# write -> read. FAILFAST read: any malformed line is a hard error
# here; the quarantine path is q_jsonl_quarantine's surface.

def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from mora_spark.queries.store import scratch_dir
    from mora_spark.sources.jsonl import read_jsonl, write_jsonl

    docs = load_table(spark, sf_dir, "documents")
    path = scratch_dir("jsonl_roundtrip", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    write_jsonl(docs, path)
    return read_jsonl(spark, path, docs, mode="FAILFAST").select(
        *docs.columns
    )


O_JSONL_ROUNDTRIP = "SELECT * FROM documents"


# --- q_jsonl_quarantine: malformed-line capture on crawled corpora ---
# PERMISSIVE read over a corpus with PLANTED broken lines (truncated
# object, bare text, wrong-type field): good rows keep their columns,
# bad lines land whole in _corrupt_record instead of failing the job.
# Measured PERMISSIVE semantics (pinned by this oracle): ANY parse
# error — including a single wrong-typed field — nulls ALL schema
# fields of that record and captures the raw line, so every planted
# line counts in n_rows, n_quarantined, AND n_null_doc. The oracle
# derives n_rows from the exact DuckDB table + the planting arithmetic.

def q_jsonl_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from mora_spark.queries.store import scratch_dir
    from mora_spark.sources.jsonl import CORRUPT_COL, read_jsonl, write_jsonl

    docs = load_table(spark, sf_dir, "documents")
    path = scratch_dir("jsonl_quarantine", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    write_jsonl(docs, path)
    with open(os.path.join(path, "part-99999-planted.json"), "w") as f:
        f.write('{"doc_id": 1, "text": "truncated\n')  # unclosed object
        f.write("not json at all\n")  # bare text
        f.write('{"doc_id": "NaN-ish", "text": "typed wrong"}\n')
    back = read_jsonl(spark, path, docs)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.col(CORRUPT_COL)).alias("n_quarantined"),
        F.sum(
            F.when(
                F.col(CORRUPT_COL).isNotNull() & F.col("doc_id").isNull(), 1
            ).otherwise(0)
        ).alias("n_null_doc"),
    )


O_JSONL_QUARANTINE = """
SELECT count(*) + 3 AS n_rows,
       CAST(3 AS BIGINT) AS n_quarantined,
       CAST(3 AS BIGINT) AS n_null_doc
FROM documents
"""


# --- q_csv_roundtrip / q_csv_quarantine: the CSV interchange twin ---
# Same contract as JSONL under CSV's own rules: RFC-4180 quoting,
# \\N null sentinel (empty string and NULL survive distinctly),
# multiLine read for embedded newlines. Quarantine semantics DIFFER
# from JSON and are pinned by the oracle arithmetic: a wrong-typed
# field nulls the schema fields of its record, but an ARITY mismatch
# (too few / too many columns) keeps every parseable field and still
# captures the raw line — so of the 3 planted rows, all 3 quarantine
# while only the wrong-typed one loses its doc_id.

def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from mora_spark.queries.store import scratch_dir
    from mora_spark.sources.csvio import read_csv, write_csv

    docs = load_table(spark, sf_dir, "documents")
    path = scratch_dir("csv_roundtrip", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    write_csv(docs, path)
    return read_csv(spark, path, docs, mode="FAILFAST").select(
        *docs.columns
    )


O_CSV_ROUNDTRIP = "SELECT * FROM documents"


def q_csv_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from mora_spark.queries.store import scratch_dir
    from mora_spark.sources.csvio import CORRUPT_COL, read_csv, write_csv

    docs = load_table(spark, sf_dir, "documents")
    path = scratch_dir("csv_quarantine", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    write_csv(docs, path)
    with open(os.path.join(path, "part-99999-planted.csv"), "w") as f:
        f.write("doc_id,text,lang,source,n_chars\n")
        f.write('notanumber,"typed wrong",en,web,5\n')  # type error
        f.write('12,"arity short"\n')  # too few columns
        f.write('13,"arity long",en,web,5,EXTRA\n')  # too many columns
    back = read_csv(spark, path, docs)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.col(CORRUPT_COL)).alias("n_quarantined"),
        F.sum(
            F.when(
                F.col(CORRUPT_COL).isNotNull() & F.col("doc_id").isNull(), 1
            ).otherwise(0)
        ).alias("n_null_doc"),
    )


O_CSV_QUARANTINE = """
SELECT count(*) + 3 AS n_rows,
       CAST(3 AS BIGINT) AS n_quarantined,
       CAST(1 AS BIGINT) AS n_null_doc
FROM documents
"""


# --- q_orc_roundtrip: the columnar interchange sibling ---
# ORC is Hive's default columnar format — the other on-disk shape a
# migrating warehouse holds corpora in. Spark's bundled vectorized
# ORC reader keeps the engine's scan properties (column pruning +
# predicate pushdown reach the stripe reader — pinned by test), so
# the round-trip query is the same lossless contract as CSV/JSONL,
# minus quarantine: ORC is self-describing binary, a corrupt file
# fails loudly instead of yielding quietly-null rows.

def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from mora_spark.queries.store import scratch_dir
    from mora_spark.sources.orcio import read_orc, write_orc

    docs = load_table(spark, sf_dir, "documents")
    path = scratch_dir("orc_roundtrip", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    write_orc(docs, path)
    return read_orc(spark, path, docs).select(*docs.columns)


O_ORC_ROUNDTRIP = "SELECT * FROM documents"


QUERIES = {
    "q_jsonl_roundtrip": q_jsonl_roundtrip,
    "q_jsonl_quarantine": q_jsonl_quarantine,
    "q_csv_roundtrip": q_csv_roundtrip,
    "q_csv_quarantine": q_csv_quarantine,
    "q_orc_roundtrip": q_orc_roundtrip,
    "q_dedup_exact": q_dedup_exact,
    "q_dup_spans": q_dup_spans,
    "q_text_stats": q_text_stats,
    "q_lang_id": q_lang_id,
    "q_fingerprint": q_fingerprint,
    "q_redact_pii": q_redact_pii,
    "q_jaccard_pairs": q_jaccard_pairs,
    "q_minhash_lsh": q_minhash_lsh,
    "q_minhash_lsh_derived": q_minhash_lsh_derived,
    "q_dedup_increment": q_dedup_increment,
    "q_dedup_increment_derived": q_dedup_increment_derived,
    "q_dedup_lines": q_dedup_lines,
    "q_simhash": q_simhash,
    "q_simhash_pairs": q_simhash_pairs,
    "q_dedup_clusters": q_dedup_clusters,
    "q_corpus_curation": q_corpus_curation,
    "q_cluster_best": q_cluster_best,
}

ORACLES = {
    "q_jsonl_roundtrip": O_JSONL_ROUNDTRIP,
    "q_jsonl_quarantine": O_JSONL_QUARANTINE,
    "q_csv_roundtrip": O_CSV_ROUNDTRIP,
    "q_csv_quarantine": O_CSV_QUARANTINE,
    "q_orc_roundtrip": O_ORC_ROUNDTRIP,
    "q_dedup_exact": O_DEDUP_EXACT,
    "q_dup_spans": _o_dup_spans(),
    "q_text_stats": O_TEXT_STATS,
    "q_lang_id": _o_lang_id(),
    "q_fingerprint": O_FINGERPRINT,
    "q_redact_pii": _o_redact_pii(),
    "q_jaccard_pairs": O_JACCARD_PAIRS,
    "q_minhash_lsh": _o_minhash(),
    "q_minhash_lsh_derived": _o_minhash(0.5, *derive_minhash_params(0.5)),
    "q_dedup_increment": _o_dedup_increment(),
    "q_dedup_increment_derived": _o_dedup_increment(
        0.5, *derive_minhash_params(0.5)
    ),
    "q_dedup_lines": O_DEDUP_LINES,
    "q_simhash": O_SIMHASH,
    "q_simhash_pairs": O_SIMHASH_PAIRS,
    "q_dedup_clusters": _o_dedup_clusters(),
    "q_corpus_curation": _o_corpus_curation(),
    "q_cluster_best": _o_cluster_best(),
}

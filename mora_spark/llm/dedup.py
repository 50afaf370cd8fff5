"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design constraints:
- deterministic across engines: every hash is md5 (never engine-native
  murmur), every min/argmax has a total order — so each operator has an
  exact DuckDB oracle;
- scale: LSH banding turns the O(n²) near-dup problem into
  shuffle-on-band-key + per-bucket pairs, the standard 100 TB pattern;
  the only cross-join lives in the *verification* of candidate pairs,
  whose cardinality LSH already bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mora_spark.functions.text import distinct_tokens

# 4 bands of 4: P(candidate) = 1-(1-J^4)^4 — ~0.88 recall at J=0.8
# while admitting only ~23% of J=0.5 pairs as candidates. (Standard
# prod configs use 128 hashes; 16 keeps the oracle SQL tractable.)
N_HASHES = 16
BAND_SIZE = 4


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact content dedup by md5: each row mapped to its group's
    canonical (minimum) id plus the group size."""
    h = df.withColumn("content_hash", F.md5(F.col(text_col)))
    groups = h.groupBy("content_hash").agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        h.select(id_col, "content_hash")
        .join(groups, "content_hash")
        .withColumn("is_duplicate", F.col(id_col) != F.col("canonical_id"))
    )


def minhash_signature(toks: Column, n_hashes: int = N_HASHES) -> Column:
    """MinHash signature: per seed s, min over tokens of md5(tok||'#s').

    String-min over md5 hex is a uniform permutation surrogate that both
    Spark and DuckDB order identically (ASCII hex).
    """
    def seeded(s: int):
        # NB: must stay a one-arg lambda — F.transform interprets a
        # second parameter as the array index.
        return lambda t: F.md5(F.concat(t, F.lit(f"#{s}")))

    return F.array(
        *[F.array_min(F.transform(toks, seeded(s))) for s in range(n_hashes)]
    )


def with_minhash(
    df: DataFrame, text_col: str = "text", n_hashes: int = N_HASHES
) -> DataFrame:
    return df.withColumn("toks", distinct_tokens(text_col)).withColumn(
        "minhash", minhash_signature(F.col("toks"), n_hashes)
    )


def lsh_bands(df: DataFrame, band_size: int = BAND_SIZE) -> DataFrame:
    """Explode signatures into (band, band_key) rows: band_key = md5 of
    the band's concatenated signature slice."""
    n_bands = N_HASHES // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col("minhash").getItem(b * band_size + i)
                            for i in range(band_size)
                        ],
                    )
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return df.withColumn("b", F.explode(bands)).select(
        "*", F.col("b.band").alias("band"), F.col("b.band_key").alias("band_key")
    ).drop("b")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH, verified with exact Jaccard.

    Pipeline: tokenize → minhash → band-explode → self-join per band
    bucket (the LSH trick: only same-bucket pairs are candidates) →
    distinct pairs → exact Jaccard on distinct-token sets → threshold.
    """
    sigs = with_minhash(df, text_col)
    banded = lsh_bands(sigs).select(
        F.col(id_col).alias("id"), "band", "band_key"
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b")
        )
        .distinct()
    )
    # Verification runs on md5-derived int token sets: 4x smaller in the
    # shuffle than string arrays and faster to intersect. (A 32-bit
    # collision merges two tokens identically in engine and oracle, so
    # comparisons stay exact.)
    toks = sigs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.transform(
                "toks",
                lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast(
                    "long"
                ),
            )
        ).alias("ti"),
    ).withColumn("n", F.size("ti"))
    pairs = (
        cand.join(
            toks.withColumnsRenamed({"id": "doc_a", "ti": "ti_a", "n": "n_a"}),
            "doc_a",
        )
        .join(
            toks.withColumnsRenamed({"id": "doc_b", "ti": "ti_b", "n": "n_b"}),
            "doc_b",
        )
        # Size prefilter: J >= t implies min(|A|,|B|)/max(|A|,|B|) >= t,
        # so this drops no true pair but skips the array intersect for
        # grossly mismatched sizes.
        .where(
            F.least("n_a", "n_b") >= threshold * F.greatest("n_a", "n_b")
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("ti_a", "ti_b"))
            / F.size(F.array_union("ti_a", "ti_b")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    block_col: str | None = None,
) -> DataFrame:
    """All-pairs word-set Jaccard above threshold (exact, no LSH).

    O(n²) within a block — use ``block_col`` (e.g. lang or a prefix
    fingerprint) to bound pairs at scale; None compares everything.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        *( [F.col(block_col).alias("blk")] if block_col else [F.lit(1).alias("blk")] ),
        distinct_tokens(text_col).alias("toks"),
    )
    a, b = toks.alias("a"), toks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("a.toks", "b.toks"))
            / F.size(F.array_union("a.toks", "b.toks")),
        )
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            "jaccard",
        )
    )


def simhash16(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash over distinct tokens (md5-derived bit votes).

    Per token: h = first 8 md5 hex chars as int; bit b votes +1 if set
    else -1; signature bit b is 1 iff the vote sum is positive. Wholly
    relational (explode tokens × bits → two aggregations) so it has an
    exact SQL oracle and scales as a pair of shuffles.
    """
    toks = df.select(
        F.col(id_col).alias("id"), distinct_tokens(text_col).alias("toks")
    )
    tok = toks.select("id", F.explode("toks").alias("tok")).withColumn(
        "h", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    )
    bits = tok.select(
        "id",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("bit"),
    ).withColumn(
        "vote",
        F.when(
            F.expr("(shiftright(h, CAST(bit AS INT)) & 1) = 1"), F.lit(1)
        ).otherwise(F.lit(-1)),
    )
    bit_votes = bits.groupBy("id", "bit").agg(F.sum("vote").alias("v"))
    return bit_votes.groupBy("id").agg(
        F.sum(
            F.when(
                F.col("v") > 0,
                F.expr("CAST(shiftleft(1L, CAST(bit AS INT)) AS BIGINT)"),
            ).otherwise(F.lit(0))
        ).alias("simhash")
    ).withColumnRenamed("id", id_col)

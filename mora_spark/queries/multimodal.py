"""Multimodal declared queries. Metadata extraction is oracle-checked;
the decode/feature/frame paths are pandas-UDF pipelines whose codec is
stubbed (no image/audio libs in this container) → rows-only checks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mora_spark.datasets import load_table
from mora_spark.llm.multimodal import (
    extract_features,
    frame_sample,
    media_from_documents,
)


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_from_documents(load_table(spark, sf_dir, "documents"))


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads (no decode)."""
    return _media(spark, sf_dir).select(
        "media_id", "kind", "n_bytes", "sha256"
    )


O_MULTIMODAL_META = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS kind,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS sha256
FROM documents
"""


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode/feature pipeline. The stub codec derives
    dimensions from sha256(payload), which DuckDB can replicate — so
    the whole Arrow-batched pipeline is oracle-checked end-to-end.
    (byte_entropy stays an engine-only feature column: byte-histogram
    SQL isn't worth the oracle's while; determinism is covered by
    tests/test_simsearch.py.)"""
    return extract_features(_media(spark, sf_dir)).select(
        "media_id", "kind", "n_bytes", "width", "height", "n_frames"
    )


# sha256-hex byte k (0-based) as int: CAST('0x'||substr(hex,2k+1,2) AS INT)
_MEDIA_CTE = """
WITH m AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS kind,
         octet_length(encode(text)) AS n_bytes,
         sha256(text) AS h
  FROM documents
), f AS (
  SELECT media_id, kind, n_bytes,
         64 + CAST(('0x' || substr(h, 1, 2)) AS INT) % 192 AS width,
         64 + CAST(('0x' || substr(h, 3, 2)) AS INT) % 192 AS height,
         CASE WHEN kind = 'image' THEN 1
              ELSE 1 + CAST(('0x' || substr(h, 5, 2)) AS INT) % 120
         END AS n_frames
  FROM m
)
"""

O_MEDIA_FEATURES = _MEDIA_CTE + """
SELECT media_id, kind, n_bytes, width, height, n_frames FROM f
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing (explode every 10th frame)."""
    return frame_sample(_media(spark, sf_dir), every_n=10)


O_FRAME_SAMPLE = _MEDIA_CTE + """
SELECT media_id,
       unnest(range(0, n_frames, 10)) AS frame_no
FROM f WHERE kind = 'video'
"""


# --- q_media_neardup: perceptual near-dup over binary payloads ---
# The image analogue of MinHash: dHash (56-bit difference hash over
# the deterministic stub-codec luminance grid — integer-exact, see
# llm/multimodal.py::dhash_media) + the lossless pigeonhole Hamming
# banding of simhash_neardup_pairs. Plants: an exact payload COPY
# (hamming 0) and a first-byte-perturbed NEAR copy per document — one
# byte lands in one grid cell and can flip at most its two adjacent
# comparisons, so the near copy stays inside the hamming<=2 budget
# structurally. The oracle recomputes the identical hash in SQL from
# the text characters (payloads are UTF-8 of ASCII text, so byte i ==
# ord(char i+1)) and brute-forces all pairs, verifying both the hash
# and the banding end-to-end.

MEDIA_COPY_OFFSET = 100_000
MEDIA_NEAR_OFFSET = 200_000
MEDIA_MAX_HAMMING = 2


def _planted_media(docs: DataFrame) -> DataFrame:
    # ASCII-only guard, applied IDENTICALLY in the oracle's docs2 CTE:
    # the oracle reconstructs payload bytes as ord(char), which equals
    # the UTF-8 byte only while text is pure ASCII. Today's corpus is
    # (the filter is a no-op); a future non-ASCII document is excluded
    # on BOTH engines instead of silently diverging the hashes.
    plain = docs.select("doc_id", "text").where(
        F.expr("octet_length(text) = length(text)")
    )
    copies = plain.select(
        (F.col("doc_id") + MEDIA_COPY_OFFSET).alias("doc_id"), "text"
    )
    near = plain.select(
        (F.col("doc_id") + MEDIA_NEAR_OFFSET).alias("doc_id"),
        F.concat(F.lit("z"), F.expr("substring(text, 2)")).alias("text"),
    )
    return media_from_documents(
        plain.unionByName(copies).unionByName(near)
    )


def q_media_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.llm.multimodal import media_neardup_pairs

    media = _planted_media(load_table(spark, sf_dir, "documents"))
    return media_neardup_pairs(media, max_hamming=MEDIA_MAX_HAMMING)


O_MEDIA_NEARDUP = f"""
WITH ascii_docs AS (
  -- mirrors _planted_media's ASCII-only guard: ord(char)-as-byte
  -- reconstruction below is only valid for pure-ASCII text
  SELECT doc_id, text FROM documents
  WHERE octet_length(encode(text)) = length(text)
), docs2 AS (
  SELECT doc_id AS media_id, text FROM ascii_docs
  UNION ALL
  SELECT doc_id + {MEDIA_COPY_OFFSET} AS media_id, text FROM ascii_docs
  UNION ALL
  SELECT doc_id + {MEDIA_NEAR_OFFSET} AS media_id,
         'z' || substr(text, 2) AS text
  FROM ascii_docs
), pos AS (
  SELECT media_id, text, unnest(range(length(text))) AS i FROM docs2
), grid AS (
  SELECT media_id, (i * 63) // length(text) AS cell,
         sum(ord(substr(text, CAST(i + 1 AS INT), 1))) AS s,
         count(*) AS c
  FROM pos GROUP BY 1, 2
), dense AS (
  SELECT ids.media_id, cg.cell,
         COALESCE(grid.s, 0) AS s, COALESCE(grid.c, 0) AS c
  FROM (SELECT DISTINCT media_id FROM docs2) ids
  CROSS JOIN (SELECT unnest(range(63)) AS cell) cg
  LEFT JOIN grid ON grid.media_id = ids.media_id
               AND grid.cell = cg.cell
), cmp AS (
  SELECT a.media_id,
         (a.cell // 9) * 8 + (a.cell % 9) AS b,
         CASE WHEN n.s * a.c > a.s * n.c THEN 1 ELSE 0 END AS bit
  FROM dense a JOIN dense n
    ON n.media_id = a.media_id AND n.cell = a.cell + 1
  WHERE a.cell % 9 < 8
), h AS (
  SELECT media_id,
         CAST(sum(bit * (CAST(1 AS BIGINT) << CAST(b AS INT))) AS BIGINT)
           AS dhash
  FROM cmp GROUP BY media_id
)
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
FROM h a JOIN h b ON a.media_id < b.media_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= {MEDIA_MAX_HAMMING}
"""


# --- q_media_cluster_best: cluster-level perceptual dedup ---
# Completes perceptual dedup to cluster level the way text
# (q_cluster_best) and embeddings (q_semdedup) have it: connected
# components over the media_neardup_pairs graph + one
# quality-canonical keeper per cluster (payload byte size, ties to
# the smaller id, via the map-side-combinable max(struct)). The
# cluster definition is blocking-independent, so the oracle replays
# it exactly: the same dHash SQL prefix, brute-force pairs, recursive
# min-label propagation, and the same canonical pick. Every planted
# triple {original, exact copy, near copy} shares one cluster whose
# members all have equal byte size, so the keeper is the min id (the
# original) — and natural collisions merge in identically on both
# engines.

def q_media_cluster_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.llm.multimodal import media_cluster_best

    media = _planted_media(load_table(spark, sf_dir, "documents"))
    return media_cluster_best(media, max_hamming=MEDIA_MAX_HAMMING)


def _o_media_cluster_best() -> str:
    hash_prefix = (
        O_MEDIA_NEARDUP.split("SELECT a.media_id AS id_a")[0]
        .replace("WITH ascii_docs", "WITH RECURSIVE ascii_docs", 1)
        .rstrip()
        .rstrip(",")
    )
    return f"""{hash_prefix},
pairs AS (
  SELECT a.media_id AS id_a, b.media_id AS id_b
  FROM h a JOIN h b ON a.media_id < b.media_id
  WHERE bit_count(xor(a.dhash, b.dhash)) <= {MEDIA_MAX_HAMMING}
), bidir AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
), cc(node, label) AS (
  SELECT DISTINCT a, a FROM bidir
  UNION
  SELECT bidir.a, cc.label FROM bidir JOIN cc ON cc.node = bidir.b
), final AS (
  SELECT node, min(label) AS cluster_id FROM cc GROUP BY node
), nrm AS (
  SELECT media_id AS node, octet_length(encode(text)) AS q FROM docs2
)
SELECT cluster_id, node AS keep_media_id, q AS best_quality,
       cluster_size
FROM (
  SELECT cluster_id, node, q,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY q DESC, node) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS cluster_size
  FROM final JOIN nrm USING (node)
) WHERE rn = 1
"""


# --- q_stream_media_dedup: continuous perceptual curation ---
# The media twin of q_stream_dedup_increment: the planted media table
# streams as 3 deterministic micro-batches — batch 0 the originals,
# batch 1 the exact payload copies, batch 2 the one-byte near copies
# (chunk = media_id div 100000, replayable in SQL) — through the
# streaming dHash-dedup sink (streaming/media.py). Each batch dedups
# against the persisted signature index of earlier KEPT media plus
# itself; only survivors' signatures grow the index. The oracle
# unrolls the same greedy sequence per batch over the identical dHash
# SQL: copies drop against the kept originals (src='corpus'), near
# copies then ALSO drop against the originals (the copies never
# entered the index), and same-batch natural collisions emit as
# src='batch' — identical arithmetic on both engines.

_MEDIA_STREAM_CHUNKS = 3
# Derived from the plant offsets, not a free-standing literal: chunk 0
# = originals, 1 = copies, 2 = near copies. media_chunked_source
# additionally asserts the chunking covers every row, so an offset
# change that breaks this arithmetic fails loudly instead of silently
# streaming fewer batches than the oracle unrolls.
assert MEDIA_NEAR_OFFSET == 2 * MEDIA_COPY_OFFSET
_MEDIA_CHUNK_EXPR = f"media_id div {MEDIA_COPY_OFFSET}"


def q_stream_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from mora_spark.queries.store import scratch_dir
    from mora_spark.streaming.media import (
        media_chunked_source,
        stream_media_dedup,
    )

    work = scratch_dir("stream_media_dedup", sf_dir)
    media = _planted_media(load_table(spark, sf_dir, "documents"))
    src_dir = media_chunked_source(
        spark, media, os.path.join(work, "src"),
        n_chunks=_MEDIA_STREAM_CHUNKS,
        chunk_expr=_MEDIA_CHUNK_EXPR,
        # The cache token names the frame's CONTENT, not just the
        # corpus: the plant offsets are what _planted_media bakes in,
        # so changing them invalidates the cached source instead of
        # silently replaying pre-edit chunks (the chunked_replay_source
        # cache-key contract).
        cache_token=f"{sf_dir}|{MEDIA_COPY_OFFSET}|{MEDIA_NEAR_OFFSET}",
    )
    run = os.path.join(work, "run")
    shutil.rmtree(run, ignore_errors=True)
    return stream_media_dedup(
        spark, src_dir, run, max_hamming=MEDIA_MAX_HAMMING
    )


def _o_stream_media_dedup(n: int = _MEDIA_STREAM_CHUNKS) -> str:
    """Unrolled greedy replay (the _kept_ctes discipline of
    queries/streaming.py, over media ids and Hamming pairs)."""
    hash_prefix = O_MEDIA_NEARDUP.split("SELECT a.media_id AS id_a")[0]

    def member(x: str, k: int) -> str:
        return f"({x} // {MEDIA_COPY_OFFSET} = {k})"

    kept_ctes, emits = [], []
    for k in range(n):
        prev = (
            " UNION ALL ".join(
                f"SELECT media_id FROM kept_{j}" for j in range(k)
            )
            or "SELECT NULL::BIGINT AS media_id WHERE false"
        )
        kept_ctes.append(f"""
prev_{k} AS ({prev}),
dropped_{k} AS (
  SELECT p.db AS media_id FROM pairs p
  WHERE {member("p.db", k)} AND {member("p.da", k)}
  UNION ALL
  SELECT p.db FROM pairs p JOIN prev_{k} u ON p.da = u.media_id
  WHERE {member("p.db", k)}
  UNION ALL
  SELECT p.da FROM pairs p JOIN prev_{k} u ON p.db = u.media_id
  WHERE {member("p.da", k)}
),
kept_{k} AS (
  SELECT media_id FROM docs2 WHERE {member("media_id", k)}
    AND media_id NOT IN (SELECT media_id FROM dropped_{k})
)""")
        emits.append(f"""
UNION ALL
SELECT p.db AS media_id, p.da AS dup_id, p.hamming, 'corpus' AS src
FROM pairs p JOIN prev_{k} u ON p.da = u.media_id
WHERE {member("p.db", k)}
UNION ALL
SELECT p.da, p.db, p.hamming, 'corpus'
FROM pairs p JOIN prev_{k} u ON p.db = u.media_id
WHERE {member("p.da", k)}""")
    same_batch = " OR ".join(
        f"({member('p.da', k)} AND {member('p.db', k)})" for k in range(n)
    )
    return f"""{hash_prefix.rstrip().rstrip(",")},
pairs AS (
  SELECT a.media_id AS da, b.media_id AS db,
         CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
  FROM h a JOIN h b ON a.media_id < b.media_id
  WHERE bit_count(xor(a.dhash, b.dhash)) <= {MEDIA_MAX_HAMMING}
),{",".join(kept_ctes)}
SELECT p.db AS media_id, p.da AS dup_id, p.hamming, 'batch' AS src
FROM pairs p WHERE {same_batch}
{"".join(emits)}
"""


QUERIES = {
    "q_multimodal_meta": q_multimodal_meta,
    "q_media_features": q_media_features,
    "q_frame_sample": q_frame_sample,
    "q_media_neardup": q_media_neardup,
    "q_media_cluster_best": q_media_cluster_best,
    "q_stream_media_dedup": q_stream_media_dedup,
}

ORACLES = {
    "q_multimodal_meta": O_MULTIMODAL_META,
    "q_media_features": O_MEDIA_FEATURES,
    "q_frame_sample": O_FRAME_SAMPLE,
    "q_media_neardup": O_MEDIA_NEARDUP,
    "q_media_cluster_best": _o_media_cluster_best(),
    "q_stream_media_dedup": _o_stream_media_dedup(),
}

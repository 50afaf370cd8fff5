"""Lossless pigeonhole banding for Hamming-distance pair search.

Shared by the text-side SimHash near-dup search (``llm/dedup.py``) and
the multimodal dHash near-dup search (``llm/multimodal.py``): split an
n-bit signature into ``max_hamming + 1`` chunks — a pair within the
Hamming budget must agree EXACTLY on at least one chunk (pigeonhole),
so candidates come from an equi-join on (chunk index, chunk value),
never an all-pairs compare. Each candidate pair is emitted once via
the first-shared-chunk filter (both sides carry their full chunk
arrays, map-side), then verified with one ``bit_count(xor)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_hamming_pairs(
    sig: DataFrame,
    sig_col: str,
    n_bits: int,
    max_hamming: int,
    out_a: str = "id_a",
    out_b: str = "id_b",
) -> DataFrame:
    """All (id_a < id_b) whose ``sig_col`` signatures (the low
    ``n_bits`` of a non-negative BIGINT; ``sig`` must carry exactly
    (id, sig_col) with the id first) differ in <= ``max_hamming``
    bits. Returns (out_a, out_b, hamming:int). The join input is one
    integer signature per row — callers keep payloads/texts out."""
    if sig_col not in sig.columns or len(sig.columns) != 2:
        # The id column is inferred as "the one that isn't sig_col";
        # with extra columns that inference would silently pair on
        # whatever column happens to come first.
        raise ValueError(
            f"sig must carry exactly (id, {sig_col!r}); got columns "
            f"{sig.columns}"
        )
    id_col = [c for c in sig.columns if c != sig_col][0]
    n_chunks = max_hamming + 1
    base, extra = divmod(n_bits, n_chunks)
    sizes = [base + (1 if i < extra else 0) for i in range(n_chunks)]
    offs = [sum(sizes[:i]) for i in range(n_chunks)]

    src = sig.select(F.col(id_col).alias("id"), F.col(sig_col).alias("h"))
    chunk_arr = F.array(
        *[
            F.expr(
                f"CAST(shiftright(h, {offs[i]}) "
                f"& {(1 << sizes[i]) - 1} AS BIGINT)"
            )
            for i in range(n_chunks)
        ]
    )
    chunked = src.withColumn("cks", chunk_arr).select(
        "id", "h", "cks",
        F.posexplode("cks").alias("chunk", "ck"),
    )
    a, b = chunked.alias("a"), chunked.alias("b")
    first_shared = F.array_position(
        F.zip_with(
            F.col("a.cks"),
            F.col("b.cks"),
            lambda x, y: (x == y).cast("int"),
        ),
        1,
    )
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.ck") == F.col("b.ck"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .where(first_shared == F.col("a.chunk") + 1)
        .withColumn(
            "hamming", F.expr("bit_count(a.h ^ b.h)").cast("int")
        )
        .where(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.id").alias(out_a),
            F.col("b.id").alias(out_b),
            "hamming",
        )
    )

"""Recall-derived MinHash banding (derive_minhash_params): the LSH
S-curve solve, the hash budget, family-prefix stability, and the
empirical recall pin against brute-force exact Jaccard at sf0.001."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mora_spark.datasets import load_table
from mora_spark.llm.dedup import (
    MAX_MINHASH_HASHES,
    MINHASH_AB,
    derive_minhash_params,
    minhash_ab,
    minhash_lsh_pairs,
)


def _scurve(t: float, r: int, b: int) -> float:
    return 1.0 - (1.0 - t**r) ** b


def test_derive_params_hold_recall_inside_budget():
    for t in (0.5, 0.6, 0.7, 0.8, 0.9):
        r, b = derive_minhash_params(t)
        assert r * b <= MAX_MINHASH_HASHES
        assert _scurve(t, r, b) >= 0.99
        # r is maximal: one band-size step up cannot fit the budget.
        p = t ** (r + 1)
        b_up = math.ceil(math.log(0.01) / math.log(1.0 - p))
        assert (r + 1) * b_up > MAX_MINHASH_HASHES


def test_derive_params_known_solve():
    # threshold 0.5 -> (3, 35): b = ceil(ln(0.01)/ln(1 - 0.125)) = 35,
    # 105 hashes; r=4 would need 72 bands = 288 > 128.
    assert derive_minhash_params(0.5) == (3, 35)


def test_derive_params_budget_overflow_warns():
    # threshold 0.01 needs ceil(ln(0.01)/ln(0.99)) = 459 bands even at
    # band_size 1 -> the budget wins and the helper says so.
    with pytest.warns(UserWarning, match="budget"):
        r, b = derive_minhash_params(0.01)
    assert (r, b) == (1, MAX_MINHASH_HASHES)


def test_minhash_family_is_prefix_stable():
    # Engine and oracle at ANY config share the seeded family prefix,
    # so fixed and derived rows draw from one deterministic family.
    assert minhash_ab(len(MINHASH_AB)) == MINHASH_AB
    assert minhash_ab(105)[: len(MINHASH_AB)] == MINHASH_AB


def test_derived_banding_recall_vs_exact(spark, sf_dir):
    """The empirical pin behind q_minhash_lsh_derived: on the sf0.001
    corpus the derived (3, 35) banding recovers >= 99% of the
    brute-force exact-Jaccard pairs at threshold 0.5 (measured
    0.9994), while the fixed (4, 4) banding sits near its S-curve
    boundary value (measured 0.70). Everything is deterministic
    (seeded hash family), so these are pins, not flaky bounds."""
    from mora_spark.functions.text import distinct_tokens
    from mora_spark.llm.dedup import _int_tokens

    docs = load_table(spark, sf_dir, "documents")
    rows = docs.select(
        "doc_id", _int_tokens(distinct_tokens("text")).alias("ti")
    ).collect()
    sets = {r.doc_id: frozenset(r.ti) for r in rows}
    ids = sorted(sets)
    exact = set()
    for i, a in enumerate(ids):
        sa = sets[a]
        for b in ids[i + 1 :]:
            sb = sets[b]
            inter = len(sa & sb)
            if inter >= 0.5 * (len(sa) + len(sb) - inter):
                exact.add((a, b))
    assert len(exact) > 0

    def pairs(**kw):
        out = minhash_lsh_pairs(docs, threshold=0.5, **kw)
        return {
            (r.doc_a, r.doc_b)
            for r in out.select("doc_a", "doc_b").collect()
        }

    r, b = derive_minhash_params(0.5)
    derived = pairs(band_size=r, n_bands=b)
    fixed = pairs()
    # exact verification admits no false positives on either config
    assert derived <= exact and fixed <= exact
    assert len(derived) / len(exact) >= 0.99
    assert len(derived) > len(fixed)

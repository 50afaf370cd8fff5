"""duplicate_spans: exact shared-substring span recovery + df cap."""

from __future__ import annotations

from mora_spark.llm.dedup import duplicate_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_span_length_recovered_exactly(spark):
    # B copies tokens 5..14 of A verbatim (a 10-token run); C is
    # unrelated. k=8 -> 3 aligned shingles on one diagonal ->
    # max_span = 3 + 7 = 10.
    a_toks = [f"w{i}" for i in range(20)]
    b_toks = ["b0", "b1"] + a_toks[5:15] + ["b2", "b3"]
    rows = [
        (1, " ".join(a_toks)),
        (2, " ".join(b_toks)),
        (3, " ".join(f"z{i}" for i in range(20))),
    ]
    out = duplicate_spans(_docs(spark, rows), k=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["n_shared"] == 3
    assert r["max_span"] == 10


def test_two_separate_runs_not_merged(spark):
    # Two disjoint shared runs (10 and 9 tokens) separated by
    # divergent text on BOTH sides land on different diagonals /
    # groups: max_span reports the longer one, n_shared counts both.
    run1 = [f"r{i}" for i in range(10)]
    run2 = [f"s{i}" for i in range(9)]
    a = run1 + ["a1", "a2", "a3"] + run2
    b = run1 + ["b1", "b2", "b3", "b4"] + run2
    rows = [(1, " ".join(a)), (2, " ".join(b))]
    out = duplicate_spans(_docs(spark, rows), k=8).collect()
    assert len(out) == 1
    r = out[0]
    # run1: 10-8+1 = 3 shingles; run2: 9-8+1 = 2 shingles
    assert r["n_shared"] == 3 + 2
    assert r["max_span"] == 10


def test_boilerplate_df_cap_excludes_hot_shingle(spark):
    # One 8-token phrase shared by 40 docs: above max_df=32 the
    # shingle is excluded, so no pairs at all (a boilerplate phrase
    # must not emit 40*39/2 rows).
    phrase = " ".join(f"p{i}" for i in range(8))
    rows = [(i, f"u{i} " + phrase + f" v{i}") for i in range(40)]
    out = duplicate_spans(_docs(spark, rows), k=8, max_df=32)
    assert out.count() == 0
    # with a permissive cap the pairs appear
    out2 = duplicate_spans(_docs(spark, rows), k=8, max_df=64)
    assert out2.count() == 40 * 39 // 2


def test_matches_python_reference_on_random_docs(spark):
    # Property check vs a brute-force reference: random short docs
    # over a tiny alphabet force plenty of shared k-shingles; the
    # operator's (n_shared, max_span) must equal the O(n^2 * m^2)
    # direct computation for every pair. Deterministic seed.
    import random

    rng = random.Random(42)
    K = 3
    docs = {
        i: [rng.choice("abcde") for _ in range(rng.randint(3, 18))]
        for i in range(14)
    }

    def shingles(toks):
        return [
            (p, tuple(toks[p:p + K])) for p in range(len(toks) - K + 1)
        ]

    expected = {}
    for a in docs:
        for b in docs:
            if a >= b:
                continue
            matches = [
                (pa, pb)
                for pa, sa in shingles(docs[a])
                for pb, sb in shingles(docs[b])
                if sa == sb
            ]
            if not matches:
                continue
            runs = []
            by_diag = {}
            for pa, pb in sorted(matches):
                by_diag.setdefault(pa - pb, []).append(pa)
            for diag, pas in by_diag.items():
                run = 1
                for prev, cur in zip(pas, pas[1:]):
                    if cur == prev + 1:
                        run += 1
                    else:
                        runs.append(run)
                        run = 1
                runs.append(run)
            expected[(a, b)] = (len(matches), max(runs) + K - 1)

    rows = [(i, " ".join(toks)) for i, toks in docs.items()]
    got = {
        (r["id_a"], r["id_b"]): (r["n_shared"], r["max_span"])
        for r in duplicate_spans(
            _docs(spark, rows), k=K, max_df=100
        ).collect()
    }
    assert got == expected

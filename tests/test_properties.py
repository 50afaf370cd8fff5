"""Property-based tests (SURVEY §5-3): ingest idempotence, batch
order-insensitivity for disjoint timestamps, and resample algebra, over
hypothesis-generated candle data.

Each Spark round-trip costs ~100ms, so max_examples is kept small; the
properties are about algebraic structure, not numeric edge cases, and a
handful of random shapes covers the interesting partitions (empty
batches, overlapping vs disjoint ts, cross-year splits).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mora_spark.operators import merge_batches
from mora_spark.operators.resample import resample
from mora_spark.schema import CANDLE_SCHEMA

BASE = dt.datetime(2021, 6, 1)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def rows_to_df(spark, rows, code="BTC"):
    data = [
        (
            "UPBIT", code, 60,
            BASE + dt.timedelta(minutes=m),
            float(o), float(o + 1), float(o - 1), float(o), 10.0, 0,
        )
        for m, o in rows
    ]
    return spark.createDataFrame(data, CANDLE_SCHEMA)


def table(df):
    return sorted(tuple(r) for r in df.collect())


# minute offsets with values; duplicate minutes allowed across batches
batch_strategy = st.lists(
    st.tuples(st.integers(0, 200), st.integers(1, 10**6)),
    min_size=0,
    max_size=20,
)


@given(batch=batch_strategy)
@SETTINGS
def test_ingest_idempotence(spark, batch):
    """write(b); write(b) ≡ write(b): merging a batch with itself
    changes nothing (reference upsert, page/page.go:95-142)."""
    df = rows_to_df(spark, batch)
    once = merge_batches([df])
    twice = merge_batches([df, df])
    assert table(once) == table(twice)


@given(batches=st.lists(batch_strategy, min_size=2, max_size=4), data=st.data())
@SETTINGS
def test_disjoint_batch_order_insensitivity(spark, batches, data):
    """Any permutation of batches with pairwise-disjoint timestamps
    yields the same table."""
    # make timestamps disjoint across batches by offsetting each batch
    disjoint = [
        [(m * len(batches) + i, v) for m, v in b]
        for i, b in enumerate(batches)
    ]
    perm = data.draw(st.permutations(list(range(len(disjoint)))))
    dfs = [rows_to_df(spark, b) for b in disjoint]
    a = merge_batches(dfs)
    b = merge_batches([dfs[i] for i in perm])
    assert table(a) == table(b)


@given(batch=st.lists(
    st.tuples(st.integers(0, 400), st.integers(1, 10**6)),
    min_size=1, max_size=30, unique_by=lambda t: t[0],
))
@SETTINGS
def test_resample_algebra(spark, batch):
    """resample 60s→300s→900s ≡ 60s→900s (bar conversion composes)."""
    df = rows_to_df(spark, batch)
    via = resample(resample(df, 300), 900)
    direct = resample(df, 900)
    assert table(via) == table(direct)


@given(batches=st.lists(batch_strategy, min_size=1, max_size=4))
@SETTINGS
def test_store_merge_folds_lww(spark, tmp_path_factory, batches):
    """Any sequence of CandleStore merge commits equals a single
    last-writer-wins fold of the batches (latest batch wins per key) —
    the reference's INSERT/COMMIT contract over the manifest log."""
    from mora_spark.engine import CandleStore

    store = CandleStore(
        spark, str(tmp_path_factory.mktemp("prop_store") / "s")
    )
    expect: dict[int, tuple] = {}
    for batch in batches:
        df = rows_to_df(spark, batch)
        store.write(df)
        # batch-internal LWW is arbitrary but deterministic per write;
        # replay the same dedup rule: highest value wins is NOT the
        # contract — the engine keeps ONE row per ts. Fold row-by-row
        # so later batches overwrite earlier ones per minute key.
        per_minute: dict[int, tuple] = {}
        for m, o in batch:
            per_minute[m] = (m, o)
        expect.update(per_minute)
    got = {
        (r["ts"].minute + 60 * r["ts"].hour)
        for r in store.read().collect()
    }
    assert got == set(expect)


@given(
    docs=st.lists(
        st.integers(0, 40),  # token counts per doc (0 exercises the
        min_size=1, max_size=25,  # empty-normalized-text edge: 1 token)
    ),
    budget=st.integers(2, 64),
)
@SETTINGS
def test_pack_sequences_is_concat_and_chunk(spark, docs, budget):
    """Packing must equal the serial concat-and-chunk reference model
    for any corpus and budget, and the two-phase prefix sum must agree
    with it at a chunk size that splits the corpus."""
    from mora_spark.llm.curation import pack_sequences

    rows = [
        (i, " ".join(f"tok{j}" for j in range(n)) if n else "")
        for i, n in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["tok_len"], r["cum_tokens"],
                      r["bin_first"], r["bin_last"])
        for r in pack_sequences(df, budget=budget, chunk=4).collect()
    }
    cum = 0
    for i, n in enumerate(docs):
        tok_len = max(n, 1)  # "" normalizes to a single empty token
        cum += tok_len
        first = (cum - tok_len) // budget
        last = (cum - 1) // budget
        assert got[i] == (tok_len, cum, first, last), (i, got[i])

"""Incremental dedup: index-then-increment must find exactly the pairs
a full joint rebuild would find for the increment docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mora_spark.llm.dedup import (
    build_minhash_index,
    dedup_increment,
    load_minhash_index,
    minhash_lsh_pairs,
    save_minhash_index,
)

DOCS = [
    # two exact dups across corpus/batch, one near-dup pair, noise
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "a completely different document about spark execution plans"),
    (3, "the quick brown fox jumps over the lazy dog again and again"),
    (4, "shingle based near duplicate detection with minhash bands"),
    (10, "the quick brown fox jumps over the lazy dog again and again"),
    (11, "shingle based near duplicate detection with minhash banding"),
    (12, "an unrelated increment document mentioning watermarks only"),
    (13, "a completely different document about spark execution plans"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _pairs(df):
    return {(r.doc_id, r.dup_id, round(r.jaccard, 9)) for r in df.collect()}


def _pf_lines(plan: str, col: str) -> list[str]:
    """Plan lines whose PartitionFilters reference ``col`` as a whole
    attribute name (word-boundary: 'shard#NN' must not match
    'gshard#NN')."""
    import re

    return [
        ln
        for ln in plan.splitlines()
        if "PartitionFilters" in ln
        and re.search(rf"PartitionFilters: \[[^\]]*(?<![a-z]){col}#", ln)
    ]


def test_increment_equals_joint_rebuild(spark, docs, tmp_path):
    corpus = docs.where(F.col("doc_id") < 10)
    batch = docs.where(F.col("doc_id") >= 10)
    save_minhash_index(*build_minhash_index(corpus), str(tmp_path / "ix"))
    got = _pairs(
        dedup_increment(
            batch, *load_minhash_index(spark, str(tmp_path / "ix"))
        )
    )
    joint = minhash_lsh_pairs(docs).collect()
    want = {
        (max(r.doc_a, r.doc_b) if min(r.doc_a, r.doc_b) >= 10 else
         (r.doc_a if r.doc_a >= 10 else r.doc_b),
         min(r.doc_a, r.doc_b) if min(r.doc_a, r.doc_b) >= 10 else
         (r.doc_b if r.doc_a >= 10 else r.doc_a),
         round(r.jaccard, 9))
        for r in joint
        if r.doc_a >= 10 or r.doc_b >= 10
    }
    assert got == want
    # the exact-dup and near-dup plants are actually found
    found = {(a, b) for a, b, _ in got}
    assert (10, 1) in found and (10, 3) in found and (13, 2) in found
    assert (11, 4) in found


def test_index_shard_pruning(spark, docs, tmp_path):
    """The persisted bands layout is sharded by band_key; an increment
    against the loaded index must (a) push the batch's shard set down
    as a partition filter — directory pruning, the 100 TB knob — and
    (b) return exactly what the unsharded in-memory index returns."""
    corpus = docs.where(F.col("doc_id") < 10)
    batch = docs.where(F.col("doc_id") >= 10)
    save_minhash_index(*build_minhash_index(corpus), str(tmp_path / "ix"))
    bands, groups = load_minhash_index(spark, str(tmp_path / "ix"))
    assert "shard" in bands.columns
    import mora_spark.llm.dedup as dd

    dd.CAPTURE_CAND_PLAN = True
    try:
        out = dedup_increment(batch, bands, groups)
    finally:
        dd.CAPTURE_CAND_PLAN = False
    plan = out._jdf.queryExecution().executedPlan().toString()
    # The bands scan lives in the CANDIDATE sub-plan, which the eager
    # localCheckpoint materializes away from the result plan — assert
    # on the captured sub-plan, with a word-boundary match ("shard"
    # as a substring would also hit "gshard"; the pre-r14 version of
    # this test passed vacuously exactly that way).
    assert _pf_lines(dd._LAST_CAND_PLAN, "shard"), (
        f"no shard partition filter in candidate plan:\n"
        f"{dd._LAST_CAND_PLAN[:2000]}"
    )
    # groups is gid-sharded too: the candidate-driven fetch must carry
    # its own gshard partition filter (the one remaining full-index
    # touch before round 4 — every kept doc's token array). That scan
    # happens after the checkpoint, so it IS in the result plan.
    assert "gshard" in groups.columns
    assert _pf_lines(plan, "gshard"), (
        f"no gshard partition filter in plan:\n{plan[:2000]}"
    )
    mem_bands, mem_groups = build_minhash_index(corpus)
    assert _pairs(out) == _pairs(
        dedup_increment(batch, mem_bands, mem_groups)
    )


def test_src_tags(spark, docs, tmp_path):
    corpus = docs.where(F.col("doc_id") < 10)
    batch = docs.where(F.col("doc_id") >= 10)
    save_minhash_index(*build_minhash_index(corpus), str(tmp_path / "ix"))
    out = dedup_increment(
        batch, *load_minhash_index(spark, str(tmp_path / "ix"))
    )
    srcs = {(r.doc_id, r.dup_id): r.src for r in out.collect()}
    for (d, p), s in srcs.items():
        assert s == ("corpus" if p < 10 else "batch")
        if s == "batch":
            assert p < d


def _save_derived(corpus, path):
    from mora_spark.llm.dedup import derive_minhash_params

    r, b = derive_minhash_params(0.5)
    save_minhash_index(
        *build_minhash_index(corpus, band_size=r, n_bands=b),
        path,
        band_size=r,
        n_bands=b,
    )
    return r, b


def test_family_metadata_roundtrip(spark, docs, tmp_path):
    """The banding family is index FORMAT: save persists it, load
    recovers it, and a legacy layout without the file resolves to the
    fixed constants (what every pre-metadata writer used)."""
    from mora_spark.llm.dedup import (
        BAND_SIZE,
        N_HASHES,
        load_minhash_family,
    )

    corpus = docs.where(F.col("doc_id") < 10)
    r, b = _save_derived(corpus, str(tmp_path / "ix"))
    assert load_minhash_family(str(tmp_path / "ix")) == (r, b)
    save_minhash_index(*build_minhash_index(corpus), str(tmp_path / "fx"))
    assert load_minhash_family(str(tmp_path / "fx")) == (
        BAND_SIZE,
        N_HASHES // BAND_SIZE,
    )
    import os

    os.remove(str(tmp_path / "fx" / "_lsh_family.json"))
    assert load_minhash_family(str(tmp_path / "fx")) == (
        BAND_SIZE,
        N_HASHES // BAND_SIZE,
    )


def test_family_mismatch_guard_fires(spark, docs, tmp_path):
    """An increment that requests a family conflicting with the
    index's persisted one must REFUSE — the silent alternative is
    near-zero band matches, i.e. 'no duplicates found'."""
    from mora_spark.llm.dedup import load_minhash_family

    corpus = docs.where(F.col("doc_id") < 10)
    batch = docs.where(F.col("doc_id") >= 10)
    _save_derived(corpus, str(tmp_path / "ix"))
    bands, groups = load_minhash_index(spark, str(tmp_path / "ix"))
    fam = load_minhash_family(str(tmp_path / "ix"))
    with pytest.raises(ValueError, match="conflicts with the index"):
        dedup_increment(
            batch, bands, groups, band_size=4, n_bands=4,
            index_family=fam,
        )


def test_derived_family_increment_equals_joint(spark, docs, tmp_path):
    """Derived-family index -> save -> load -> increment with
    index_family reproduces the joint derived-band rebuild, and finds
    the planted near-dup the fixed family also finds."""
    from mora_spark.llm.dedup import derive_minhash_params, load_minhash_family

    corpus = docs.where(F.col("doc_id") < 10)
    batch = docs.where(F.col("doc_id") >= 10)
    r, b = _save_derived(corpus, str(tmp_path / "ix"))
    bands, groups = load_minhash_index(spark, str(tmp_path / "ix"))
    got = _pairs(
        dedup_increment(
            batch, bands, groups,
            index_family=load_minhash_family(str(tmp_path / "ix")),
        )
    )
    joint = minhash_lsh_pairs(docs, band_size=r, n_bands=b).collect()
    want = {
        (max(ra.doc_a, ra.doc_b) if min(ra.doc_a, ra.doc_b) >= 10 else
         (ra.doc_a if ra.doc_a >= 10 else ra.doc_b),
         min(ra.doc_a, ra.doc_b) if min(ra.doc_a, ra.doc_b) >= 10 else
         (ra.doc_b if ra.doc_a >= 10 else ra.doc_a),
         round(ra.jaccard, 9))
        for ra in joint
        if ra.doc_a >= 10 or ra.doc_b >= 10
    }
    assert got == want
    found = {(a, b_) for a, b_, _ in got}
    assert (10, 1) in found and (11, 4) in found


def test_derived_index_shard_pruning(spark, docs, tmp_path):
    """Directory pruning is family-independent (shards hash the md5
    band KEYS, whatever family produced them): the derived-family
    persisted index must get the same bands/groups partition filters
    the fixed-family index gets."""
    from mora_spark.llm.dedup import load_minhash_family

    corpus = docs.where(F.col("doc_id") < 10)
    batch = docs.where(F.col("doc_id") >= 10)
    _save_derived(corpus, str(tmp_path / "ix"))
    bands, groups = load_minhash_index(spark, str(tmp_path / "ix"))
    import mora_spark.llm.dedup as dd

    dd.CAPTURE_CAND_PLAN = True
    try:
        out = dedup_increment(
            batch, bands, groups,
            index_family=load_minhash_family(str(tmp_path / "ix")),
        )
    finally:
        dd.CAPTURE_CAND_PLAN = False
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert _pf_lines(dd._LAST_CAND_PLAN, "shard"), (
        "no shard partition filter in derived-index candidate plan"
    )
    assert _pf_lines(plan, "gshard"), (
        "no gshard partition filter in derived-index plan"
    )


def test_lost_family_metadata_fails_loudly(spark, docs, tmp_path):
    """The crash-window case metadata alone cannot catch: a derived
    index whose _lsh_family.json was lost (e.g. save crashed between
    the parquet writes and the stamp) resolves to the fixed default —
    the in-plan band-count backstop must turn the resulting
    silently-empty band join into an execution-time error."""
    import os

    corpus = docs.where(F.col("doc_id") < 10)
    batch = docs.where(F.col("doc_id") >= 10)
    _save_derived(corpus, str(tmp_path / "ix"))
    os.remove(str(tmp_path / "ix" / "_lsh_family.json"))
    bands, groups = load_minhash_index(spark, str(tmp_path / "ix"))
    with pytest.raises(Exception, match="different banding family"):
        dedup_increment(batch, bands, groups).collect()


def test_family_metadata_file_scheme_root(spark, docs, tmp_path):
    """scheme:// index roots go through the session's Hadoop
    FileSystem (r14 verdict missing #2 — they were refused outright
    before): a file://-scheme root is the in-container proxy for
    hdfs://s3a remotes. The stamp must land on the TARGET filesystem
    (visible at the POSIX twin of the URI) and round-trip through
    both the scheme'd and the scheme-less reader."""
    from mora_spark.llm.dedup import (
        BAND_SIZE,
        N_HASHES,
        load_minhash_family,
        write_minhash_family,
    )

    root = tmp_path / "remote_ix"
    uri = f"file://{root}"
    write_minhash_family(uri, 3, 35)
    # on the target filesystem, not in some driver-CWD-relative spot
    assert (root / "_lsh_family.json").is_file()
    assert not (root / "_lsh_family.json.tmp").exists()
    assert load_minhash_family(uri) == (3, 35)
    assert load_minhash_family(str(root)) == (3, 35)
    # restamp overwrites atomically (delete+rename publish)
    write_minhash_family(uri, 5, 24)
    assert load_minhash_family(uri) == (5, 24)
    # a scheme'd root without the file resolves to the legacy default
    assert load_minhash_family(f"file://{tmp_path}/never_written") == (
        BAND_SIZE,
        N_HASHES // BAND_SIZE,
    )


def test_family_metadata_torn_write_fails_loud(spark, tmp_path):
    """The documented object-store caveat, pinned (r15 verdict next
    #6): the scheme:// publish is rename (copy+delete on object
    stores), so a torn write can leave a PARTIAL file — which must
    fail JSON parsing loudly, never resolve to a wrong family."""
    import json

    from mora_spark.llm.dedup import (
        load_minhash_family,
        write_minhash_family,
    )

    root = tmp_path / "torn_ix"
    uri = f"file://{root}"
    write_minhash_family(uri, 3, 35)
    full = (root / "_lsh_family.json").read_text()
    (root / "_lsh_family.json").write_text(full[: len(full) // 2])
    # The checksummed LocalFileSystem catches the tear even before the
    # parse (ChecksumException through py4j) — loud either way.
    with pytest.raises(Exception, match="Checksum|JSON"):
        load_minhash_family(uri)
    # Without the .crc sidecar (object stores have none), the torn
    # bytes reach the parser and fail there.
    crc = root / "._lsh_family.json.crc"
    if crc.exists():
        crc.unlink()
    with pytest.raises(json.JSONDecodeError):
        load_minhash_family(uri)
    with pytest.raises(json.JSONDecodeError):  # POSIX reader too
        load_minhash_family(str(root))


def test_family_metadata_missing_with_tmp_sibling(spark, tmp_path):
    """A restamp's delete+rename window (r15 ADVICE #2): while the
    writer's .tmp sibling is visible, a missing family file is
    TRANSIENT — the loader must not silently resolve to the legacy
    default family. A stalled publish (tmp persists, file never
    lands) raises; no tmp and no file is the honest legacy default."""
    from mora_spark.llm.dedup import (
        BAND_SIZE,
        N_HASHES,
        load_minhash_family,
        write_minhash_family,
    )

    root = tmp_path / "window_ix"
    root.mkdir()
    (root / "_lsh_family.json.tmp").write_text("{}")
    with pytest.raises(OSError, match="stalled or torn"):
        load_minhash_family(f"file://{root}")
    # once the publish lands, the same root reads normally with the
    # tmp sibling still around (a crashed writer's leftover)
    write_minhash_family(f"file://{root}", 3, 35)
    (root / "_lsh_family.json.tmp").write_text("{}")
    assert load_minhash_family(f"file://{root}") == (3, 35)
    # and with neither file nor tmp: the legacy default, immediately
    empty = tmp_path / "no_stamp_ix"
    empty.mkdir()
    assert load_minhash_family(f"file://{empty}") == (
        BAND_SIZE,
        N_HASHES // BAND_SIZE,
    )


def test_save_family_cross_check_pins_band_size(spark, docs, tmp_path):
    """save's post-write cross-check recomputes the DECLARED family's
    band keys from one sample group's token ints — so a save that
    declares the wrong band_size with the RIGHT n_bands (which the
    old len(bks) peek could not see) refuses before stamping
    authoritative-but-wrong metadata (r14 ADVICE #2)."""
    import os

    corpus = docs.where(F.col("doc_id") < 10)
    ix = build_minhash_index(corpus, band_size=3, n_bands=35)
    with pytest.raises(ValueError, match="declared family"):
        save_minhash_index(
            *ix, str(tmp_path / "ix"), band_size=5, n_bands=35
        )
    assert not os.path.exists(
        str(tmp_path / "ix" / "_lsh_family.json")
    )
    # wrong n_bands still refuses too (the declared keys differ in
    # length before they differ in value)
    with pytest.raises(ValueError, match="declared family"):
        save_minhash_index(
            *ix, str(tmp_path / "ix2"), band_size=3, n_bands=40
        )
    # and the honest declaration passes + stamps
    save_minhash_index(
        *ix, str(tmp_path / "ix3"), band_size=3, n_bands=35
    )
    from mora_spark.llm.dedup import load_minhash_family

    assert load_minhash_family(str(tmp_path / "ix3")) == (3, 35)


def test_scheme_root_index_contract_end_to_end(spark, docs, tmp_path):
    """The WHOLE persisted-index contract over a scheme:// root (the
    in-container proxy for hdfs/s3a): build -> save (parquet + family
    stamp on the TARGET filesystem) -> load -> family-following
    increment, equal to the POSIX-path run on the same corpus."""
    from mora_spark.llm.dedup import load_minhash_family

    corpus = docs.where(F.col("doc_id") < 10)
    batch = docs.where(F.col("doc_id") >= 10)
    r, b = _save_derived(corpus, f"file://{tmp_path}/uri_ix")
    assert (tmp_path / "uri_ix" / "_lsh_family.json").is_file()
    fam = load_minhash_family(f"file://{tmp_path}/uri_ix")
    assert fam == (r, b)
    got = _pairs(
        dedup_increment(
            batch,
            *load_minhash_index(spark, f"file://{tmp_path}/uri_ix"),
            index_family=fam,
        )
    )
    _save_derived(corpus, str(tmp_path / "posix_ix"))
    want = _pairs(
        dedup_increment(
            batch,
            *load_minhash_index(spark, str(tmp_path / "posix_ix")),
            index_family=load_minhash_family(str(tmp_path / "posix_ix")),
        )
    )
    assert got == want and got


def test_band_keys_local_replays_spark_exactly(spark):
    """The save cross-check's driver-side band-key replay must equal
    _band_table bit-for-bit across families and token shapes (unicode,
    single-token, long docs) — the exactness argument (double-divide
    truncation, no overflow, long-to-string cast) made concrete."""
    from mora_spark.llm.dedup import (
        _band_keys_local,
        _band_table,
        _group_table,
    )

    df = spark.createDataFrame(
        [
            (1, "a"),
            (2, "многоязычный текст с юникодом и ascii mixed in"),
            (3, " ".join(f"tok{i}" for i in range(300))),
            (4, "punctuation, heavy!  text?  with   gaps"),
        ],
        ["doc_id", "text"],
    )
    groups = _group_table(df, "text", "doc_id")
    for band_size, n_bands in ((4, 4), (3, 35), (5, 24)):
        got = {
            r["gid"]: list(r["bks"])
            for r in _band_table(groups, band_size, n_bands)
            .select("gid", "bks")
            .dropDuplicates(["gid"])
            .collect()
        }
        ti_by_gid = {
            r["gid"]: list(r["ti"]) for r in groups.collect()
        }
        assert got and got.keys() == ti_by_gid.keys()
        for gid, bks in got.items():
            assert bks == _band_keys_local(
                ti_by_gid[gid], band_size, n_bands
            ), (gid, band_size, n_bands)

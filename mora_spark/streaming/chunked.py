"""Deterministic chunked replay sources for file-stream fixtures.

One implementation of the machinery three streaming gates previously
carried as drifting copies (text increments in
``streaming/increment.py``, ANN ingest in ``queries/vectors.py``,
media dedup in ``streaming/media.py`` — the round-9 ``hamming.py``
extraction episode showed such copies diverge): materialize a frame as
``n_chunks`` single-file parquet chunks with strictly increasing
mtimes so a ``maxFilesPerTrigger=1`` file stream replays them as
deterministic micro-batches.

The chunk assignment is a plain SQL expression over the frame's own
columns, so the oracle can replay the identical arithmetic — range
chunking (row-count splits) would not be SQL-reproducible. Hardening
invariants (previously present only in the newest copy):

- **Coverage assert**: every row's chunk value must land in
  ``range(n_chunks)``; a row falling outside would silently vanish
  from the stream while the oracle (replaying the same arithmetic)
  stays green — the gate would stop exercising what it claims to.
- **Keyed cache**: reuse is keyed by (n_chunks, chunk_expr,
  cache_token) — the token names the corpus (callers pass the
  sf_dir + any corpus-defining filter), so two different frames with
  the same chunk params can never hit the same cached source.
- **Atomic publish**: everything is assembled under a ``.build``
  staging dir and published with one directory rename as the very
  last step; a crash mid-build leaves no source dir, so the next run
  rebuilds from scratch instead of replaying a partial source as if
  it were complete.

The reference engine has no streaming surface at all (command enum
INSERT/COMMIT, `database/command/types.go:11-14`); this is test/gate
plumbing for the streaming operators layered on Structured Streaming.
"""

from __future__ import annotations

import glob
import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Fixed epoch base for chunk mtimes: any strictly increasing sequence
# works (the file stream orders by mtime); a fixed base keeps rebuilt
# sources byte-for-byte reproducible.
_MTIME_BASE = 1_600_000_000


def chunked_replay_source(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    n_chunks: int,
    chunk_expr: str,
    cache_token: str | None = None,
) -> str:
    """Materialize ``df`` as ``n_chunks`` parquet files (chunk k = rows
    where ``chunk_expr`` evaluates to k) named ``chunk-%04d.parquet``
    with increasing mtimes, and return the published directory.

    ``chunk_expr`` is SQL over ``df``'s columns and must map EVERY row
    into ``range(n_chunks)`` (asserted with one aggregate before any
    write). With ``cache_token`` the published dir is
    ``{out_dir}_{md5(params|token)[:8]}`` and an existing dir is
    reused; with ``cache_token=None`` the source is always rebuilt at
    ``out_dir`` (callers that scope the path per run want no reuse).

    CACHE-KEY CONTRACT: the key fingerprints only (n_chunks,
    chunk_expr, cache_token) — NOT the frame's construction. The
    token must therefore name everything that defines the frame's
    CONTENT: the corpus path plus any plant/augmentation parameters
    the caller's builder code bakes in (in-repo callers embed their
    plant offsets/alphas). A token that omits a parameter replays a
    stale source after that parameter changes, silently testing
    pre-edit data. The per-chunk write loop is driver-side but
    bounded by n_chunks, not rows.

    NEVER reuse a Structured Streaming checkpoint across a rebuild:
    a rebuilt source (``cache_token=None``, or a changed token)
    publishes files with the SAME paths and the SAME fixed-base
    mtimes, so a checkpoint that survived from an earlier build
    treats every new file as already-seen and the stream silently
    replays nothing. Scope the checkpoint dir per run (as every
    in-repo caller does) or wipe it whenever the source is rebuilt."""
    if cache_token is not None:
        key = hashlib.md5(
            f"{n_chunks}|{chunk_expr}|{cache_token}".encode()
        ).hexdigest()[:8]
        out_dir = f"{out_dir}_{key}"
        if os.path.exists(out_dir):
            return out_dir
    else:
        shutil.rmtree(out_dir, ignore_errors=True)
    build = out_dir + ".build"
    shutil.rmtree(build, ignore_errors=True)
    os.makedirs(build)
    assert "__chunk" not in df.columns
    chunk = F.expr(chunk_expr)
    # ONE pass writes every chunk (previously one filtered scan + write
    # per chunk, plus a coverage-count pass — n_chunks + 1 full scans of
    # the frame; guide §2.4): hash-repartition on the chunk value puts
    # each chunk's rows in exactly one task, partitionBy splits that
    # task's output per chunk directory, so every chunk still lands as
    # ONE file. The sortWithinPartitions keeps file bytes deterministic
    # across rebuilds (a bare shuffle's row order is fetch-order
    # dependent); every in-repo consumer is row-order-insensitive
    # (set/id-greedy drop rules), but reproducible sources cost one
    # tiny per-task sort. Coverage is validated from the LAYOUT below —
    # a row outside range(n_chunks) (or a NULL) produces a directory
    # the k-parse rejects — replacing the old pre-write count job.
    staged = os.path.join(build, "staged")
    (
        df.withColumn("__chunk", chunk)
        .repartition(n_chunks, "__chunk")
        .sortWithinPartitions("__chunk", *df.columns)
        .write.mode("overwrite")
        .partitionBy("__chunk")
        .parquet(staged)
    )
    found: dict[int, list[str]] = {}
    for name in os.listdir(staged):
        if not name.startswith("__chunk="):
            continue
        try:
            k = int(name.split("=", 1)[1])
        except ValueError:
            k = -1
        if not 0 <= k < n_chunks:
            raise ValueError(
                f"chunk_expr {chunk_expr!r} produced value "
                f"{name.split('=', 1)[1]!r} outside range({n_chunks}) "
                "— those rows would silently drop from the stream"
            )
        found[k] = glob.glob(
            os.path.join(staged, name, "part-*.parquet")
        )
    missing = [k for k in range(n_chunks) if k not in found]
    if missing:
        raise ValueError(
            f"chunk_expr {chunk_expr!r} produced no rows for chunks "
            f"{missing} — the stream would replay fewer micro-batches "
            "than the caller's contract states"
        )
    ready = os.path.join(build, "ready")
    os.makedirs(ready)
    for k in range(n_chunks):
        (part,) = found[k]  # one task per chunk value ⇒ one file
        path = os.path.join(ready, f"chunk-{k:04d}.parquet")
        os.rename(part, path)
        os.utime(path, (_MTIME_BASE + k, _MTIME_BASE + k))
    os.rename(ready, out_dir)  # the publish point
    shutil.rmtree(build, ignore_errors=True)
    return out_dir

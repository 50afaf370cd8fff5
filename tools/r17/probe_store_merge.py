"""Phase-timing probe for the streaming store-merge/rollup sink: wraps
the store machinery with timers, then drives q_stream_store_rollup's
exact path. Prints per-phase totals so the 11 s driver-side 'gap' of
the bench line is attributable.
"""

import os
import sys
import time
from collections import defaultdict

sys.path.insert(
    0,
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
)

acc = defaultdict(float)
cnt = defaultdict(int)


def wrap(cls, name):
    orig = getattr(cls, name)

    def timed(*a, **k):
        t0 = time.time()
        try:
            return orig(*a, **k)
        finally:
            acc[f"{cls.__name__}.{name}"] += time.time() - t0
            cnt[f"{cls.__name__}.{name}"] += 1

    setattr(cls, name, timed)


def wrap_fn(mod, name):
    orig = getattr(mod, name)

    def timed(*a, **k):
        t0 = time.time()
        try:
            return orig(*a, **k)
        finally:
            acc[name] += time.time() - t0
            cnt[name] += 1

    setattr(mod, name, timed)


import mora_spark.engine.store as store_mod
from mora_spark.engine.store import CandleStore, _TxnLog

wrap(CandleStore, "write")
wrap(CandleStore, "_stage_and_publish")
wrap(CandleStore, "_read_files")
wrap(CandleStore, "read")
wrap(CandleStore, "derive_rollup")
wrap(_TxnLog, "current")
wrap(_TxnLog, "try_commit")
wrap(_TxnLog, "write_page")
wrap_fn(store_mod, "_parquet_ts_range")

from mora_spark.session import get_spark

spark = get_spark(app_name="probe_store_merge")
spark.sparkContext.setLogLevel("ERROR")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from mora_spark.datasets import load_table

warm = load_table(spark, sf_dir, "events")
warm.groupBy("event_type").count().write.format("noop").mode(
    "overwrite"
).save()

import __spark_entry__ as entry_mod

queries = entry_mod.queries()
t0 = time.time()
queries["q_stream_store_rollup"](spark, sf_dir).write.format("noop").mode(
    "overwrite"
).save()
wall = time.time() - t0

print(f"wall_s {wall:.3f}")
for k in sorted(acc, key=lambda k: -acc[k]):
    print(f"{acc[k]:8.3f}s  n={cnt[k]:4d}  {k}")

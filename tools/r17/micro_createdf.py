"""Microbench: tiny createDataFrame -> single-file parquet write.

Hypothesis (r17): .coalesce(1) over the default 32-slice parallelize
makes ONE task compute 32 PythonRDD parent partitions sequentially,
paying a Python-runner round-trip per parent (~0.2 s x 32 ~ 6 s of
wall for a 16-row write). numSlices=1 pays it once.
"""

import os
import shutil
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
)
from mora_spark.session import get_spark

spark = get_spark(app_name="micro_createdf")
spark.sparkContext.setLogLevel("ERROR")

data = [(i, [float(x) for x in range(64)]) for i in range(16)]
schema = "cell int, centroid array<double>"
out = "/tmp/micro_createdf"

# warmup
spark.range(10).write.format("noop").mode("overwrite").save()

for label, df_fn in [
    ("coalesce(1), default slices", lambda: spark.createDataFrame(
        data, schema
    ).coalesce(1)),
    ("numSlices=1 parallelize", lambda: spark.createDataFrame(
        spark.sparkContext.parallelize(data, 1), schema
    )),
    ("repartition(1)", lambda: spark.createDataFrame(
        data, schema
    ).repartition(1)),
]:
    for rep in range(2):
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        df_fn().write.mode("overwrite").parquet(out)
        print(f"{label} rep{rep}: {time.time() - t0:.3f}s")

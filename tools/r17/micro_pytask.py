"""Microbench: per-task latency of a trivial pandas-UDF stage vs a
JVM-only stage, at different partition counts. Separates 'Python
round-trip per task' from 'host throttling' (the JVM-only control).
"""

import os
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
)
from mora_spark.session import get_spark
from pyspark.sql import functions as F
import pandas as pd

spark = get_spark(app_name="micro_pytask")
spark.sparkContext.setLogLevel("ERROR")


@F.pandas_udf("double")
def trivial(s: pd.Series) -> pd.Series:
    return s * 1.0


base = spark.range(0, 50_000).withColumn("v", F.col("id") * 1.0)

# warm the worker pool
base.repartition(32).select(trivial("v")).write.format("noop").mode(
    "overwrite"
).save()

for n in (64, 32, 8, 1):
    df = base.repartition(n).persist()
    df.count()
    for kind, col in (("jvm", F.sqrt("v")), ("py", trivial("v"))):
        t0 = time.time()
        for _ in range(3):
            df.select(col.alias("x")).write.format("noop").mode(
                "overwrite"
            ).save()
        print(f"parts={n:3d} {kind}: {(time.time()-t0)/3:.3f}s/job")
    df.unpersist()

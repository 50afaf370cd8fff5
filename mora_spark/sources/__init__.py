from mora_spark.sources.orcio import read_orc, read_orc_stream, write_orc
from mora_spark.sources.ysf import read_ysf, write_ysf

__all__ = [
    "read_orc",
    "read_orc_stream",
    "read_ysf",
    "write_orc",
    "write_ysf",
]

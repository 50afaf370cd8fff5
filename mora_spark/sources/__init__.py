from mora_spark.sources.ysf import read_ysf, write_ysf

__all__ = ["read_ysf", "write_ysf"]

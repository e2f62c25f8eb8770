"""Pure (no-Spark) batch functions: the engine's compute kernels.

Everything here operates on plain Python/pandas/numpy values so it can be
unit-tested without a SparkSession and invoked from Arrow-vectorized pandas
UDFs (`lightly_ocr_spark.operators`).
"""

"""Raw-directory ingest: a folder of .html files -> pages rows.

The graft of the reference's upload-and-read path (`server.py:18-38` saves a
file, `pipeline.py:68` reads it): Spark's `binaryFile` source turns a
crawl-dump directory into the canonical pages schema — path becomes url,
modification time becomes warc_ts, content becomes html.  lang/text are
null (filled by downstream detection / the extractor itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_raw_dir(
    spark: SparkSession, path: str, glob: str = "*.html"
) -> DataFrame:
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    # binaryFile's path column is already a scheme-qualified URI
    # ("file:/..."); prepending another scheme produced "file://file:/..."
    # and host parsing downstream saw every doc on host "file:"
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )

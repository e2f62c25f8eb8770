"""Incremental extraction: the SAME fused operator under Structured
Streaming.

Batch is the product (SURVEY.md §2.8) — this proves the extraction stage is
engine-agnostic: `readStream` over a pages directory (new WARC drops appear
as new files), `extract_pages` unchanged, append-mode sink.  With a real
sink (kafka/Iceberg) the `foreachBatch` path gives exactly-once commits via
the same manifest discipline as the batch job.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from lightly_ocr_spark.operators.extract_udf import extract_pages
from lightly_ocr_spark.schemas import PAGES_SCHEMA


def extract_stream(
    spark: SparkSession, pages_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Run the extraction as a file-source stream to completion; returns the
    materialized extracted rows (url, text, extract_sha256)."""
    stream_pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(pages_dir)
    )
    extracted = extract_pages(stream_pages).select(
        "url", "text", "extract_sha256"
    )
    name = "extract_stream_" + uuid.uuid4().hex[:8]
    q = (
        extracted.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name).collect()
    return spark.createDataFrame(
        rows, schema="url string, text string, extract_sha256 string"
    )

"""Streaming WARC ingest: crawl archives land in a directory, extraction
follows incrementally.

`binaryFile` is a streaming-capable file source, so the batch front door
(`sources/warc.py`: archive bytes -> one mapInPandas explode -> pages) runs
UNCHANGED under `readStream` — each newly-dropped `.warc.gz` becomes one
trigger's worth of work, parsed with the same streaming member-by-member
decompressor and extracted by the same fused Arrow stage.  This is the
live-crawl shape: a fetcher fleet appends archives, the extraction keeps
up, and the `extract_stream_job` sink discipline (idempotent epoch
overwrite + manifests + checkpoint restart) applies on top.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from lightly_ocr_spark.operators.extract_udf import extract_pages
from lightly_ocr_spark.sources.warc import explode_archives


def warc_pages_stream(
    spark: SparkSession, warc_dir: str, max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming analog of `sources.warc.warc_pages`: a binaryFile stream
    over the archive directory, exploded to pages rows per trigger via the
    SAME shared `explode_archives` projection as the batch path."""
    # streaming sources require an explicit schema; binaryFile's is fixed
    files = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, "
                "length long, content binary")
        .option("pathGlobFilter", "*.warc*")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(warc_dir)
    )
    return explode_archives(files)


def extract_warc_stream(
    spark: SparkSession, warc_dir: str, max_files_per_trigger: int = 1,
) -> DataFrame:
    """Run archives -> pages -> extraction as one stream to completion;
    returns the materialized (url, text, extract_sha256) rows.

    DEMO/TEST harness: the memory sink + collect hold the whole result on
    the driver (the temp view is dropped before returning, so nothing
    outlives the call).  A production stream pairs `warc_pages_stream`
    with `extract_stream_job`'s exactly-once foreachBatch sink instead —
    never a driver-side materialization."""
    pages = warc_pages_stream(spark, warc_dir, max_files_per_trigger)
    extracted = extract_pages(pages).select(
        "url", "text", "extract_sha256"
    )
    name = "warc_stream_" + uuid.uuid4().hex[:8]
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
    try:
        rows = spark.table(name).collect()
    finally:
        spark.catalog.dropTempView(name)
    return spark.createDataFrame(
        rows, schema="url string, text string, extract_sha256 string"
    )

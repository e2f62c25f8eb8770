"""Event-time windowed aggregation with a watermark — the late-data
discipline for streaming corpus telemetry (crawl-rate counters, per-window
extraction metrics).

Append mode + watermark gives exactly the semantics a 10^12-row ingest
needs: state for a window is dropped once the watermark passes its end, so
state size is bounded by (watermark / window) windows per key instead of
growing forever, and events arriving later than the watermark are dropped
deterministically rather than silently corrupting closed windows.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    spark: SparkSession,
    events_dir: str,
    ts_col: str = "ts",
    window_duration: str = "5 minutes",
    watermark_delay: str = "5 minutes",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Run a tumbling-window count over a file stream to completion; returns
    the FINALIZED windows (append mode emits a window only after the
    watermark passes its end — unfinalized tail windows are withheld, which
    is the correct contract for downstream consumers)."""
    batch = spark.read.parquet(events_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(events_dir)
    )
    agg = (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window_duration).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
        )
    )
    name = "windowed_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    try:
        result = spark.table(name)
        schema = result.schema
        rows = result.collect()
    finally:
        spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, schema=schema)

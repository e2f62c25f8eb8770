"""Stream-stream interval join with watermark-bounded state — the last
Structured Streaming primitive the engine exposes (stateful dedup, windowed
aggregation, and the exactly-once sink live in the sibling modules).

Pattern: attribute each CLICK to the VIEW that preceded it within an
attribution gap, both sides unbounded streams.  Spark buffers each side in
the state store; the time-interval join condition PLUS watermarks on both
sides let it expire buffered rows deterministically (a view older than
watermark + gap can never match a future click, so its state is dropped) —
without the interval bound the state would grow forever.  This is the
streaming analog of the batch sessionization window (W2) and the canonical
two-stream shape (impressions x conversions) a crawl-telemetry pipeline
joins at scale.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def attribution_join(
    views: DataFrame, clicks: DataFrame, key: str = "user_id",
    gap: str = "10 minutes", watermark: str = "10 minutes",
) -> DataFrame:
    """views(key, view_ts, ...) x clicks(key, click_ts, ...) -> one row per
    (view, click) pair with click_ts in [view_ts, view_ts + gap].

    Both inputs may be streaming DataFrames; the interval condition plus
    the two watermarks bound the join state (required by Spark for
    stream-stream inner joins — an unbounded-state join is rejected)."""
    v = views.withWatermark("view_ts", watermark)
    c = clicks.withWatermark("click_ts", watermark)
    cond = (
        (v[key] == c[key])
        & (c["click_ts"] >= v["view_ts"])
        & (c["click_ts"] <= v["view_ts"] + F.expr(f"INTERVAL {gap}"))
    )
    return v.join(c, cond).select(
        v[key].alias(key),
        v["view_ts"],
        c["click_ts"],
        (F.unix_timestamp(c["click_ts"])
         - F.unix_timestamp(v["view_ts"])).alias("lag_s"),
    )


def run_attribution_stream(
    spark: SparkSession, views_dir: str, clicks_dir: str,
    key: str = "user_id", gap: str = "10 minutes",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-stream both sides, run the interval join to completion, return
    the joined rows (memory sink).  Parity with the equivalent batch join
    is the correctness gate (tested)."""
    vschema = spark.read.parquet(views_dir).schema
    cschema = spark.read.parquet(clicks_dir).schema
    views = (
        spark.readStream.schema(vschema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(views_dir)
    )
    clicks = (
        spark.readStream.schema(cschema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(clicks_dir)
    )
    joined = attribution_join(views, clicks, key=key, gap=gap)
    name = "attrib_" + uuid.uuid4().hex[:8]
    q = (
        joined.writeStream.outputMode("append")
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

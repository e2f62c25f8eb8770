"""Stateful streaming dedup: drop urls already seen in earlier micro-batches.

The custom-stateful-operator pattern (`applyInPandasWithState`): state is a
set of url-sha1 digests per key group (key = first hex nibble of the hash,
16 groups — bounded, uniform).  An incremental crawl ingest uses this to
suppress re-fetched pages across WARC drops.

At 10^12 scale the in-memory digest set per group is replaced by a RocksDB
state store (`spark.sql.streaming.stateStore.providerClass`) — the operator
code is unchanged; only state-store config differs.
"""

from __future__ import annotations

import hashlib
import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "url string, text string"
STATE_SCHEMA = "seen array<string>"


def _dedup_group(
    key: Any,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in pdfs:
        digests = pdf["url"].map(
            lambda u: hashlib.sha1(u.encode()).hexdigest()
        )
        # drop repeats across batches (seen) AND within this chunk
        # (duplicated) — without the second term, duplicates arriving in
        # the same micro-batch chunk would all pass the freshness filter
        fresh = ~digests.isin(seen) & ~digests.duplicated()
        out.append(pdf.loc[fresh, ["url", "text"]])
        seen.update(digests[fresh])
    state.update((list(seen),))
    yield pd.concat(out) if out else pd.DataFrame(columns=["url", "text"])


def streaming_dedup(
    spark: SparkSession, pages_dir: str, max_files_per_trigger: int = 2
) -> DataFrame:
    """Run the stream to completion; returns deduped (url, text) rows."""
    from pyspark.sql import functions as F

    batch = spark.read.parquet(pages_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(pages_dir)
        .select(
            "url", "text",
            F.substring(F.sha1("url"), 1, 1).alias("shard"),
        )
    )
    deduped = stream.groupBy("shard").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = "stateful_dedup_" + uuid.uuid4().hex[:8]
    q = (
        deduped.writeStream.outputMode("append")
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
    return spark.createDataFrame(rows, schema=OUT_SCHEMA)

"""Micro-profile the minhash signature build legs at 50k docs."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from bench import ensure_bench_pages
    from lightly_ocr_spark.operators.dedup import MINHASH_K, _tokens
    from lightly_ocr_spark.operators.extract_udf import extract_pages
    from lightly_ocr_spark.plans.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        "profile-sig", cores=cpus, python_heavy=True,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    pages_dir = ensure_bench_pages(200_000)
    pages = spark.read.parquet(pages_dir).select("url", "warc_ts", "html")
    warm = pages.limit(cpus * 64).repartition(cpus * 2)
    extract_pages(warm).agg(F.count("*")).collect()
    batch = pages.filter(F.crc32("url") % 4 == 0)
    ext = extract_pages(batch, keep_empty=False).select(
        F.col("url").alias("doc_id"), "text"
    ).localCheckpoint(eager=True)
    k = MINHASH_K
    t = {}

    def leg(name, df):
        for i in range(2):
            t0 = time.time()
            df.agg(F.count("*")).collect()
            t[f"{name}_{i}"] = round(time.time() - t0, 2)

    # leg A: shingle explode alone (string tokens)
    toks = _tokens(ext, ngram=3)
    leg("explode_strings", toks)

    # leg B: explode + groupBy with ONE min-hash agg
    leg("groupby_1agg", toks.groupBy("doc_id").agg(
        F.min(F.xxhash64(F.lit(0), F.col("tok"))).alias("mh0")))

    # leg C: full 32-agg string-hash build (current implementation)
    leg("groupby_32agg_strings", toks.groupBy("doc_id").agg(*[
        F.min(F.xxhash64(F.lit(i), F.col("tok"))).alias(f"mh{i}")
        for i in range(k)
    ]))

    # leg D: hash shingle once at explode time, 32 long remixes in the agg
    toks_h = toks.select("doc_id", F.xxhash64("tok").alias("th"))
    leg("groupby_32agg_longs", toks_h.groupBy("doc_id").agg(*[
        F.min(F.xxhash64(F.lit(i), F.col("th"))).alias(f"mh{i}")
        for i in range(k)
    ]))

    # leg E: hash inside the shingle transform (no string materialized in
    # the exploded rows), distinct on longs
    words = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda w: F.length(w) > 0
    )
    n = 3
    shingle_hashes = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - n + 1),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i, n))),
        ),
    ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", words))))
    th = ext.select(
        "doc_id", F.explode(F.array_distinct(shingle_hashes)).alias("th")
    )
    leg("explode_longhash", th)
    leg("groupby_32agg_longhash_inline", th.groupBy("doc_id").agg(*[
        F.min(F.xxhash64(F.lit(i), F.col("th"))).alias(f"mh{i}")
        for i in range(k)
    ]))

    print(json.dumps(t))


if __name__ == "__main__":
    main()

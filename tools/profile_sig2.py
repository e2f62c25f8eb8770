"""Verify the quadratic re-split hypothesis in the shingle build."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from bench import ensure_bench_pages
    from lightly_ocr_spark.operators.extract_udf import extract_pages
    from lightly_ocr_spark.plans.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        "profile-sig2", cores=cpus, python_heavy=True,
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
    n = 3
    t = {}

    def leg(name, df):
        for i in range(2):
            t0 = time.time()
            df.agg(F.count("*")).collect()
            t[f"{name}_{i}"] = round(time.time() - t0, 2)

    # A: current one-shot inline build (words re-split per element?)
    words_inline = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda w: F.length(w) > 0
    )
    sh_inline = F.when(
        F.size(words_inline) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words_inline) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(words_inline, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", words_inline)))
    leg("inline", ext.select(
        "doc_id", F.explode(F.array_distinct(sh_inline)).alias("tok")))

    # B: two-step — materialize words as a projection first
    w = ext.select("doc_id", words_inline.alias("words"))
    wc = F.col("words")
    sh2 = F.when(
        F.size(wc) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(wc) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(wc, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", wc)))
    leg("two_step", w.select(
        "doc_id", F.explode(F.array_distinct(sh2)).alias("tok")))

    # C: two-step + hash inline (explode longs, not strings)
    sh3 = F.when(
        F.size(wc) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(wc) - n + 1),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(wc, i, n))),
        ),
    ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", wc))))
    th = w.select("doc_id", F.explode(F.array_distinct(sh3)).alias("th"))
    leg("two_step_longhash", th)

    # D: C + full 32-agg groupBy (the whole signature build)
    leg("two_step_full_sig", th.groupBy("doc_id").agg(*[
        F.min(F.xxhash64(F.lit(i), F.col("th"))).alias(f"mh{i}")
        for i in range(32)
    ]))

    print(json.dumps(t))


if __name__ == "__main__":
    main()

"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line.  The headline metric is extraction throughput (docs/sec) over the
deterministic synthetic pages corpus (cached under .bench/), matching
BASELINE.json's metric; per-query wall times for the operator suite are in
``queries``.

Usage: python bench.py  [env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
BENCH_PAGES (corpus size, default 100000)]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERY_NAMES = [
    "tpch_q1",
    "j1_broadcast_join",
    "w1_window_topk",
    "a6_confidence_product",
    "ta_quality_score",
    "ta_lang_id",
    "dd_exact",
    "dd_minhash_pairs",
    "sim_cosine_topk",
    "ex_extract_documents",
    "ex_extract_pdf",
    "dd_jaccard_words",
    "dd_line_dedup",
    "ml_nb_langid",
]


def ensure_bench_pages(n: int) -> str:
    """Cache the synthetic corpus (no golden column — generation speed).
    Cache key includes the corpus version so generator changes invalidate."""
    from lightly_ocr_spark.sources.bench_corpus import (
        CORPUS_VERSION,
        write_bench_pages,
    )

    d = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench", f"pages_{n}_v{CORPUS_VERSION}")
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        write_bench_pages(d, n, files=32)
        open(marker, "w").write("ok")
    return d


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("BENCH_PAGES", "200000"))

    import __spark_entry__ as entrymod
    from lightly_ocr_spark.operators.extract_udf import extract_pages
    from lightly_ocr_spark.plans.session import build_session

    pages_dir = ensure_bench_pages(n_pages)

    spark = build_session(
        "bench", cores=cpus, shuffle_partitions=cpus, python_heavy=True
    )
    from pyspark.sql import functions as F

    t_all = time.time()

    # --- headline: extraction throughput (docs/sec) ---------------------
    pages = spark.read.parquet(pages_dir).select("url", "warc_ts", "html")
    # full-worker warm-up: every forked Python worker pays a one-time
    # pandas+package import; touch all of them (excluded from timing)
    warm = pages.limit(cpus * 128).repartition(cpus * 4)
    for _ in range(2):
        extract_pages(warm).agg(F.count("*")).collect()

    def run(df):
        best, row = float("inf"), None
        for _ in range(3):  # best-of-3: the shared box carries outside load
            t0 = time.time()
            r = extract_pages(df).agg(
                F.count("*").alias("n"), F.sum(F.length("text")).alias("chars")
            ).collect()[0]
            if time.time() - t0 < best:
                best, row = time.time() - t0, r
        return row, best

    # narrow path: file-split parallelism, zero shuffle (extraction is
    # row-local; input splits are byte-uniform regardless of host skew)
    row, narrow_wall = run(pages)
    # salted path: explicit xxhash64(url) repartition (north_rule's skew
    # defense — pays one shuffle, required when downstream ops key by host)
    _, salted_wall = run(pages.repartition(cpus * 2, F.xxhash64("url")))
    docs_per_sec = row["n"] / narrow_wall

    # --- operator suite --------------------------------------------------
    qtimes: dict[str, float] = {
        "extract_synthetic": round(narrow_wall, 3),
        "extract_synthetic_salted": round(salted_wall, 3),
    }
    qs = entrymod.queries()
    for name in BENCH_QUERY_NAMES:
        best = float("inf")
        for _ in range(2):  # warm time: first run pays one-off codegen JIT
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        qtimes[name] = round(best, 3)

    out = {
        "metric": "extract_docs_per_sec",
        "value": round(docs_per_sec, 1),
        "unit": "docs/sec",
        "queries": qtimes,
        "sf": sf_dir,
        "cores": cpus,
        "extract_docs": row["n"],
        "extract_chars": int(row["chars"] or 0),
        "docs_per_sec_salted": round(row["n"] / salted_wall, 1),
        "total_wall_s": round(time.time() - t_all, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Measure the crawl loop per-batch wall: exact-only vs --near-index.

Splits the cached bench corpus into sequential 50k-page drops and runs
`run_crawl_batch` over them twice (fresh output/index dirs each mode),
reporting per-batch wall seconds and the near/exact premium.  This is the
evidence table for the near-index cost target (<= 2x exact-only).

Usage: python tools/crawl_loop_bench.py [n_batches] [docs_per_batch]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    from bench import ensure_bench_pages, steal_ticks
    from lightly_ocr_spark.jobs.crawl_job import run_crawl_batch
    from lightly_ocr_spark.operators.extract_udf import extract_pages
    from lightly_ocr_spark.plans.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        "crawl-loop-bench", cores=cpus, python_heavy=True,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    pages_dir = ensure_bench_pages(n_batches * per_batch)
    pages = spark.read.parquet(pages_dir)
    warm = pages.limit(cpus * 64).repartition(cpus * 2)
    extract_pages(warm).agg(F.count("*")).collect()

    work = tempfile.mkdtemp(prefix="crawl_loop_")
    drops = []
    for b in range(n_batches):
        drop = os.path.join(work, f"drop{b}")
        pages.filter(
            F.crc32("url") % n_batches == b
        ).repartition(24).write.parquet(drop)
        drops.append(drop)

    results: dict[str, list] = {}
    modes = os.environ.get("MODES", "exact,near").split(",")
    for mode in modes:
        out = os.path.join(work, f"out_{mode}")
        idx = os.path.join(work, f"idx_{mode}")
        near = os.path.join(work, f"nearidx") if mode == "near" else None
        walls = []
        for b, drop in enumerate(drops):
            st0, t0 = steal_ticks(), time.time()
            m = run_crawl_batch(
                spark, drop, out, idx, batch_id=f"b{b}",
                near_index_path=near,
            )
            dt = time.time() - t0
            walls.append({
                "batch": b, "s": round(dt, 2),
                "stolen_cores": round((steal_ticks() - st0) / 100.0 / dt, 2),
                "n_unique": m["n_unique"],
                "rows_written": m["rows_written"],
                "legs": m.get("legs"),
                **({"n_near_unique": m["n_near_unique"]}
                   if "n_near_unique" in m else {}),
            })
            print(json.dumps({mode: walls[-1]}), flush=True)
        results[mode] = walls

    summary = {**results, "docs_per_batch": per_batch}
    if "exact" in results and "near" in results:
        summary["near_over_exact"] = [
            round(n["s"] / e["s"], 2)
            for n, e in zip(results["near"], results["exact"])
        ]
    print(json.dumps(summary))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

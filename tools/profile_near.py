"""Profile the incremental near-dedup legs on a 50k-doc crawl batch.

Mirrors `_near_dedup_core`'s stages with explicit timing so the 3-4x
premium over exact-only crawl batches (BENCH/DELTA_r03_to_r04.md) can be
attributed to a specific leg.  Usage:

    python tools/profile_near.py [n_per_batch]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    from bench import ensure_bench_pages
    from lightly_ocr_spark.operators.dedup import (
        MINHASH_BANDS,
        cap_buckets,
        MINHASH_K,
        band_buckets,
        band_candidate_pairs,
        connected_components,
        minhash_signatures,
        write_minhash_index,
    )
    from lightly_ocr_spark.operators.extract_udf import extract_pages
    from lightly_ocr_spark.plans.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        "profile-near", cores=cpus, python_heavy=True,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    pages_dir = ensure_bench_pages(4 * n)
    pages = spark.read.parquet(pages_dir).select("url", "warc_ts", "html")

    work = tempfile.mkdtemp(prefix="profile_near_")
    index_path = os.path.join(work, "near_index")
    timings: dict[str, dict[str, float]] = {}

    # warm workers (one-time pandas import per forked worker)
    warm = pages.limit(cpus * 64).repartition(cpus * 2)
    extract_pages(warm).agg(F.count("*")).collect()

    k, bands = MINHASH_K, MINHASH_BANDS
    mb = int(os.environ.get("MAX_BUCKET", "0")) or None
    need = k // 2
    agree = sum(
        (F.col(f"sa.mh{i}") == F.col(f"sb.mh{i}")).cast("int")
        for i in range(k)
    )

    for b in range(int(os.environ.get('NB','2'))):
        t = {}
        nb = int(os.environ.get("NB","2"))
        batch = pages.filter(F.crc32("url") % nb == b)
        t0 = time.time()
        ext = extract_pages(batch, keep_empty=False).select(
            F.col("url").alias("doc_id"), "text"
        ).localCheckpoint(eager=True)
        t["extract"] = time.time() - t0

        t0 = time.time()
        sig_b = minhash_signatures(ext, k=k, ngram=3).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        n_sig = sig_b.count()
        t["sig_build"] = time.time() - t0

        cross_drops = None
        if b > 0:
            t0 = time.time()
            idx_sigs = spark.read.parquet(f"{index_path}/sigs").select(
                F.col("doc_id").alias("corpus_id"),
                *[F.col(f"mh{i}") for i in range(k)],
            )
            idx_buckets = spark.read.parquet(f"{index_path}/buckets").select(
                F.col("doc_id").alias("corpus_id"), "band", "bh"
            )
            cand = (
                cap_buckets(band_buckets(sig_b, k, bands), mb)
                .join(cap_buckets(idx_buckets, mb), ["band", "bh"])
                .select("doc_id", "corpus_id")
                .distinct()
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            n_cand = cand.count()
            t["bucket_join"] = time.time() - t0

            t0 = time.time()
            cross_drops = (
                cand.join(sig_b.alias("sa"), "doc_id")
                .join(idx_sigs.alias("sb"), "corpus_id")
                .filter(agree >= need)
                .select("doc_id")
                .distinct()
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            n_drop = cross_drops.count()
            t["verify_join"] = time.time() - t0
            t["n_cand"] = n_cand
            t["n_cross_drops"] = n_drop

        t0 = time.time()
        sig_rem = (
            sig_b.join(cross_drops, "doc_id", "left_anti")
            if cross_drops is not None else sig_b
        )
        pairs = band_candidate_pairs(
            sig_rem, k, bands, max_bucket=mb,
        ).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        n_pairs = pairs.count()
        t["intra_pairs"] = time.time() - t0

        t0 = time.time()
        verified = (
            pairs.join(sig_rem.alias("sa"), F.col("id_a") == F.col("sa.doc_id"))
            .join(sig_rem.alias("sb"), F.col("id_b") == F.col("sb.doc_id"))
            .filter(agree >= need)
            .select("id_a", "id_b")
            .distinct()
        )
        comp = connected_components(verified)
        intra_drops = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias("doc_id")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        n_intra = intra_drops.count()
        t["intra_verify_components"] = time.time() - t0

        t0 = time.time()
        survivor_sigs = (
            sig_rem.join(intra_drops, "doc_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        t["survivor_checkpoint"] = time.time() - t0

        t0 = time.time()
        write_minhash_index(
            survivor_sigs, index_path,
            mode="append" if b else "overwrite", k=k, bands=bands,
        )
        t["index_append"] = time.time() - t0
        t["n_sigs"] = n_sig
        t["n_intra_pairs"] = n_pairs
        t["n_intra_drops"] = n_intra
        t["total"] = sum(v for kk, v in t.items()
                         if not kk.startswith("n_") and kk != "total")
        timings[f"batch{b}"] = {kk: round(v, 2) for kk, v in t.items()}
        sig_b.unpersist()
        print(json.dumps({f"batch{b}": timings[f"batch{b}"]}), flush=True)

    print(json.dumps(timings))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

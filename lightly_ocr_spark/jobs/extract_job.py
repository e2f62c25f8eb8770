"""The flagship batch job: pages -> extracted, salted, resumable, audited.

Graft of the reference's serve/predict path (`pipeline.py:106-112`) plus its
checkpoint/resume training discipline (`train/crnn.py:285-327`), restated for
a 10^12-row table:

* **Slices** — the input file set is split into S slices (file-level
  assignment, so each slice job scans only its own files: no re-read
  amplification).  A slice is the unit of commit, the analog of the
  reference's periodic checkpoint interval (`val_interval`, config.yml:14).
* **Salting** — within a slice, rows are shuffled by ``xxhash64(url)`` so a
  hot host-domain cannot pin a partition (north_rule skew requirement).
  ``xxhash64`` over full urls is near-uniform regardless of the zipf host
  distribution.
* **Manifests** — each committed slice writes `_manifests/slice-K.json` with
  rows in/out, char counts, a url+sha checksum, input files, and wall time:
  per-partition lineage + metric accumulators (north_rule), the analog of the
  reference's per-interval logs (`train/crnn.py:285-327`).
* **Resume** — a slice is committed iff its manifest exists; re-running skips
  committed slices and overwrites partial output of uncommitted ones
  (idempotent).  With an Iceberg catalog the same semantics come from
  snapshot commits; the parquet+manifest sink keeps the contract identical
  in jarless environments (SURVEY.md §7.4 fallback).

Run: ``spark-submit --py-files dist/lightly_ocr_spark.zip -m`` or
``python -m lightly_ocr_spark.jobs.extract_job --pages DIR --out DIR``.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from lightly_ocr_spark.operators.extract_udf import extract_pages
from lightly_ocr_spark.schemas import PAGES_SCHEMA

MANIFEST_DIR = "_manifests"


_FORMAT_GLOBS = {
    "pages": "*.parquet",
    "warc": "*.warc*",
    "jsonl": "*.jsonl*",
}


def _input_files(pages_path: str, input_format: str = "pages") -> list[str]:
    pattern = _FORMAT_GLOBS[input_format]
    if os.path.isdir(pages_path):
        files = sorted(glob.glob(os.path.join(pages_path, pattern)))
    else:
        files = [pages_path]
    if not files:
        raise FileNotFoundError(f"no {pattern} files under {pages_path}")
    return files


def _slice_files(files: list[str], n_slices: int) -> list[list[str]]:
    n_slices = max(1, min(n_slices, len(files)))
    return [files[k::n_slices] for k in range(n_slices)]


def run_extract(
    spark: SparkSession,
    pages_path: str,
    out_dir: str,
    n_slices: int = 8,
    resume: bool = True,
    salt_partitions: int | None = None,
    salt: bool | None = None,
    concurrent_slices: int = 4,
    input_format: str = "pages",
) -> dict:
    """Run the extraction over all uncommitted slices; return job summary.

    Slices run as concurrent Spark jobs (driver threads; Spark's scheduler
    interleaves their stages) so per-job barriers — scan tail, shuffle
    boundary, write commit — overlap instead of serializing.  Commit
    semantics are unchanged: each slice's manifest is written only after its
    own parquet write succeeds."""
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    slices = _slice_files(_input_files(pages_path, input_format), n_slices)
    if salt_partitions is None:
        salt_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if salt is None:
        # auto: extraction is row-local and parquet input splits are
        # byte-uniform (maxPartitionBytes), so the salt shuffle buys no
        # balance there and costs ~21% throughput (BENCH docs_per_sec vs
        # docs_per_sec_salted).  WARC archives are gzip — NOT splittable —
        # so one giant archive would otherwise pin one task; keep the
        # post-parse rebalancing shuffle for that input.  Same for
        # gzip-compressed JSONL (plain .jsonl splits by line and stays
        # narrow).  Downstream host-keyed ops (curate's host cap /
        # near-dup) re-shuffle on their own keys regardless, so they never
        # depend on this salt.
        salt = "auto"  # resolved PER SLICE in run_slice: a slice of plain
        # splittable .jsonl files stays narrow even when another slice in
        # the same run carries .gz archives

    summary = {"slices": len(slices), "skipped": 0, "run": 0, "rows_out": 0,
               "wall_s": 0.0}
    t_job = time.time()

    def run_slice(k: int, files: list[str]) -> int | None:
        manifest_path = os.path.join(out_dir, MANIFEST_DIR, f"slice-{k}.json")
        if resume and os.path.exists(manifest_path):
            # a manifest commits a SPECIFIC file set; if the input dir or
            # --slices changed since, slice k now denotes different files
            # and skipping it would silently lose the moved ones (while
            # stale slice=* dirs double-count in the rollup) — fail loudly
            with open(manifest_path) as f:
                committed = json.load(f).get("input_files")
            if committed != files:
                raise ValueError(
                    f"slice {k} manifest was committed for a different "
                    f"file set ({len(committed or [])} files vs "
                    f"{len(files)} now) — input dir or --slices changed "
                    "since the previous run; use a fresh --out (or "
                    "identical slicing) instead of resuming"
                )
            return None
        t0 = time.time()
        if input_format == "warc":
            # CC front door: archives -> pages rows, file-parallel explode
            from lightly_ocr_spark.sources.warc import warc_pages

            pages = warc_pages(spark, files)
        elif input_format == "jsonl":
            from lightly_ocr_spark.sources.jsonl import read_jsonl_pages

            pages = read_jsonl_pages(spark, files)
        else:
            pages = spark.read.schema(PAGES_SCHEMA).parquet(*files)
        # skew salting: spread any hot host across all partitions
        # (north_rule).  Extraction itself is row-local (input splits are
        # byte-uniform), so --no-salt skips the shuffle when no downstream
        # op keys by host/url.  "auto" resolves against THIS slice's
        # files: WARC always salts (gzip, unsplittable), jsonl only when
        # the slice actually contains .gz members — a slice of plain
        # splittable files never pays the ~21% shuffle tax for a .gz that
        # lives in some other slice.
        if salt == "auto":
            slice_salt = input_format == "warc" or (
                input_format == "jsonl"
                and any(f.endswith(".gz") for f in files)
            )
        else:
            slice_salt = bool(salt)
        salted = (
            pages.repartition(salt_partitions, F.xxhash64("url"))
            if slice_salt else pages
        )
        obs = Observation(f"slice-{k}-{int(t_job)}")
        extracted = extract_pages(salted).observe(
            obs,
            F.count(F.lit(1)).alias("rows_out"),
            F.sum(F.length("text")).alias("text_chars"),
            F.sum((F.length("text") == 0).cast("long")).alias("empty_docs"),
            F.sum(F.crc32(F.concat("url", "extract_sha256"))).alias("checksum"),
        )
        slice_out = os.path.join(out_dir, f"slice={k}")
        extracted.write.mode("overwrite").parquet(slice_out)
        m = obs.get
        manifest = {
            "slice": k,
            "input_files": files,
            "rows_out": m["rows_out"],
            "text_chars": int(m["text_chars"] or 0),
            "empty_docs": int(m["empty_docs"] or 0),
            "checksum": int(m["checksum"] or 0),
            "salted": slice_salt,
            "salt_partitions": salt_partitions,
            "wall_s": round(time.time() - t0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        # commit point: manifest written only after the parquet write succeeds
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, manifest_path)
        return m["rows_out"]

    with ThreadPoolExecutor(max_workers=max(1, concurrent_slices)) as pool:
        results = list(pool.map(lambda a: run_slice(*a), enumerate(slices)))
    for r in results:
        if r is None:
            summary["skipped"] += 1
        else:
            summary["run"] += 1
            summary["rows_out"] += r
    summary["wall_s"] = round(time.time() - t_job, 3)
    rollup_manifests(out_dir)
    return summary


def rollup_manifests(out_dir: str) -> dict:
    """U1: roll the per-slice lineage manifests into one job-level summary
    (the multi-partition manifest union of SURVEY §2.6)."""
    paths = sorted(glob.glob(os.path.join(out_dir, MANIFEST_DIR, "slice-*.json")))
    total = {"slices": 0, "rows_out": 0, "text_chars": 0, "empty_docs": 0,
             "checksum": 0, "input_files": []}
    for p in paths:
        with open(p) as f:
            m = json.load(f)
        total["slices"] += 1
        total["rows_out"] += m["rows_out"]
        total["text_chars"] += m["text_chars"]
        total["empty_docs"] += m["empty_docs"]
        total["checksum"] = (total["checksum"] + m["checksum"]) % (1 << 63)
        total["input_files"] += m["input_files"]
    out = os.path.join(out_dir, MANIFEST_DIR, "_rollup.json")
    tmp = out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(total, f, indent=1)
    os.replace(tmp, out)
    return total


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(*sorted(glob.glob(os.path.join(out_dir, "slice=*"))))


def verify_extracted(
    spark: SparkSession, pages_path: str, out_dir: str
) -> dict:
    """Golden check (J1/J2 + A2): every url present exactly once, text
    byte-identical to the pages.text golden column."""
    golden = spark.read.schema(PAGES_SCHEMA).parquet(
        *_input_files(pages_path)
    ).select("url", F.col("text").alias("golden_text"))
    got = read_extracted(spark, out_dir).select("url", "text")
    joined = got.join(golden, "url", "inner")
    stats = joined.agg(
        F.count(F.lit(1)).alias("joined"),
        F.sum((F.col("text") == F.col("golden_text")).cast("long")).alias("matched"),
    ).collect()[0]
    missing = golden.join(got, "url", "left_anti").count()  # J2 coverage
    dupes = got.groupBy("url").count().filter("count > 1").count()
    return {
        "joined": stats["joined"],
        "matched": stats["matched"],
        "missing": missing,
        "duplicate_urls": dupes,
        "byte_identical": stats["joined"] == stats["matched"] and missing == 0
        and dupes == 0,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--slices", type=int, default=8)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--salt", choices=("auto", "on", "off"), default="auto",
                    help="url-hash rebalancing shuffle before extraction: "
                    "auto (default) salts only non-splittable WARC input; "
                    "parquet scans are already byte-uniform")
    ap.add_argument("--no-salt", action="store_true",
                    help="alias for --salt off (back-compat)")
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--format", choices=("pages", "warc", "jsonl"),
                    default="pages",
                    help="input layout: pages parquet, raw WARC archives, "
                    "or JSONL(.gz) dumps")
    args = ap.parse_args()

    from lightly_ocr_spark.plans.session import build_session

    spark = build_session("extract-job", cores=args.cores, python_heavy=True)
    if args.no_salt and args.salt == "on":
        ap.error("--no-salt contradicts --salt on; pick one")
    salt = {"auto": None, "on": True, "off": False}[args.salt]
    if args.no_salt:
        salt = False
    summary = run_extract(
        spark, args.pages, args.out, n_slices=args.slices,
        resume=not args.no_resume, salt=salt,
        input_format=args.format,
    )
    if args.verify:
        if args.format == "warc":
            # WARC input carries no golden text column to compare against
            summary["verify"] = {
                "skipped": "no golden text in warc input; "
                "use pages parquet for the byte-identity check"
            }
        else:
            summary["verify"] = verify_extracted(spark, args.pages, args.out)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

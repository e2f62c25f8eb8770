"""SparkSession factory with the engine's canonical configuration.

The graft of the reference's pipeline assembly (`pipeline.py:47-62`
``prepModel``): one place that fixes execution knobs instead of model
choices.  All settings are plain public Spark configuration:

* AQE on (runtime re-plan, skew-join splitting) — the analog of the
  reference's shape-adaptive resize (`imgproc.py:38-65`);
* Arrow enabled with a bounded batch size — the collate/batch analog
  (`dataset.py:68-101`, batch 64);
* shuffle partitions sized to cores for local runs — on a real cluster pass
  ``spark.sql.shuffle.partitions`` ≈ 2-3× total executor cores via
  ``spark-submit --conf``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Docs per Arrow batch into the Python workers.  Small batches pipeline the
# JVM scan with Python extraction (measured: 512 ≈ 2.9x faster than 8192 at
# ~2 KB/doc).  Budget ~1-4 MB per batch: for ~100 KB Common-Crawl docs the
# equivalent setting is 16-64 rows — tune per corpus byte size, not row count.
ARROW_BATCH_ROWS = 512

# Local parquet files are small; the 128 MB default bin-packs them into a
# handful of scan partitions and strands cores.  16 MB keeps local[N] busy;
# on a real cluster with ~1 GB files the default is fine (override per job).
MAX_PARTITION_BYTES = "16m"


def build_session(
    app_name: str = "lightly-ocr-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    python_heavy: bool = False,
) -> SparkSession:
    """Create (or reuse) the canonical session.

    ``cores=None`` uses ``local[*]``; an int pins ``local[N]`` — the
    two-parallelism scaling protocol (BASELINE.md §3) relies on this.
    """
    if cores is None:
        cores_env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cores_env}]" if cores_env else "local[*]"
        n_cores = int(cores_env) if cores_env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n_cores = cores
    sp = shuffle_partitions if shuffle_partitions is not None else max(n_cores, 8)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.default.parallelism", str(n_cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS)
        )
        .config("spark.sql.files.maxPartitionBytes", MAX_PARTITION_BYTES)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    if python_heavy:
        # A pandas-UDF task really occupies TWO threads: the JVM feeder and
        # the forked Python worker.  Declaring it (task.cpus=2) halves task
        # slots but stops the 2x thread oversubscription — measured +39%
        # extraction throughput at local[32].
        b = b.config("spark.task.cpus", "2")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""Relational operator surface (SURVEY.md §2) over the driver testdata.

Each function is one named operator from the inventory: filters F1-F10,
aggregates A1-A7, joins J1-J3, window W1, sort/limit T1, union U1, scalar
functions §2.7 — expressed declaratively (DataFrame/SQL) so Catalyst gets
pushdown/pruning/broadcast for free (SURVEY.md §4).  Every computed column is
aliased to match the DuckDB oracle SQL in `__spark_entry__.oracle_sql`.

Float discipline: any aggregate that *computes* over doubles is rounded to a
fixed scale in BOTH engines; anything used for exact hash equality is kept in
integer/string domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Fan a narrow scan out to the session's core budget when the source
    cannot (guide §2.5 "input skew": one huge unsplittable file).

    Parquet's split unit is the ROW GROUP: a table written as a single row
    group scans as ONE task no matter how many cores the cluster has, and
    every downstream per-row expression (regex scans, n-gram builds,
    Arrow/Python stages) then runs serially on one core — measured 17.7 s
    for passage dedup over a 50k-doc single-row-group table on 32 cores.
    A round-robin repartition immediately after the read pays one small
    shuffle of the narrow input rows and unlocks full parallelism for all
    compute above it.

    Scale-adaptive, never a local-mode constant: the target is the
    session's `defaultParallelism` (total scheduler cores on any
    deployment), and the repartition is SKIPPED when the scan already
    yields at least half that many partitions — a production table with
    hundreds of row groups passes the guard untouched, so this never adds
    a shuffle at 100 TB scale.

    The always-true nondeterministic guard above the Exchange is a
    PUSHDOWN BARRIER, and it is the half that makes the fan-out stick:
    Catalyst pushes deterministic predicates (a caller's eligibility
    gate, or `IsNotNull` filters derived from later joins) through a
    repartition down to the scan — which re-serializes exactly the
    per-row work the Exchange exists to parallelize, and forks the scan
    into per-branch variants that can no longer share one reused
    Exchange (observed: the passage-dedup gram build planned THREE
    separate scans of the same file).  Predicates cannot reorder across
    a nondeterministic filter, so everything a caller adds stays above
    the fan-out; the guard itself is one rand()+format per row.  (The
    comparison goes through a string cast because Spark 4's optimizer
    knows rand()'s value range and folds a bare `rand() > -1` guard
    away — and with the guard gone, the pushdown comes back.)"""
    spark = df.sparkSession
    target = parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 >= target:
        return df
    return df.repartition(target).where(
        F.rand(0).cast("string") != F.lit("x")
    )


# --- filters / projections -------------------------------------------------

def f1_length_filter(spark: SparkSession, sf: str) -> DataFrame:
    """F1: length predicate (dataset.py:149-150 analog)."""
    return (
        load(spark, sf, "documents")
        .filter(F.col("n_chars") <= 250)
        .select("doc_id", "lang", "n_chars")
    )


def f2_charset_predicate(spark: SparkSession, sf: str) -> DataFrame:
    """F2: charset row filter (dataset.py:151-154)."""
    return (
        load(spark, sf, "documents")
        .filter(~F.col("text").rlike("[^a-z ]"))
        .select("doc_id")
    )


def f3_charset_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """F3: charset projection scrub (dataset.py:190-191)."""
    return load(spark, sf, "documents").select(
        "doc_id",
        F.regexp_replace("text", "[aeiou]", "").alias("scrubbed"),
    )


def f2_f3_charset_filter_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """F2 + F3 in one plan: the charset row filter (dataset.py:151-154)
    gates the scan and the charset projection scrub (dataset.py:190-191)
    rides the same projection — one scan, both operators evidenced by one
    driver row.  The standalone `f2_charset_predicate` /
    `f3_charset_scrub` remain as library surface."""
    return (
        load(spark, sf, "documents")
        .filter(~F.col("text").rlike("[^a-z ]"))
        .select(
            "doc_id",
            F.regexp_replace("text", "[aeiou]", "").alias("scrubbed"),
        )
    )


def f4_confidence_threshold(spark: SparkSession, sf: str) -> DataFrame:
    """F4: score threshold keep > 0.7 (pipeline.py:106-112)."""
    return (
        load(spark, sf, "events")
        .filter(F.col("value") > 0.7)
        .select("event_id", "user_id", "value")
    )


def f7_validity_filter(spark: SparkSession, sf: str) -> DataFrame:
    """F7: validity filter + per-source counts (generator.py:64-72)."""
    return (
        load(spark, sf, "documents")
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_valid"))
    )


# --- aggregates -------------------------------------------------------------

def a1_streaming_mean(spark: SparkSession, sf: str) -> DataFrame:
    """A1: Averager (recog_utils.py:122-142) -> avg per group."""
    return (
        load(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.round(F.avg("value"), 6).alias("avg_value"))
    )


def _ntz_epoch_us(col) -> F.Column:
    """Naive-timestamp epoch micros: pure NTZ arithmetic against an NTZ
    epoch literal, so the value never depends on the session time zone
    (casting NTZ -> TIMESTAMP would localize in session TZ; unix_micros
    rejects NTZ outright).  DuckDB's epoch_us(ts) on a naive timestamp
    computes the same number."""
    return F.timestamp_diff(
        "MICROSECOND", F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00")),
        col,
    )


def a1_x2_json_event_stats(spark: SparkSession, sf: str) -> DataFrame:
    """A1 streaming mean + X2 exact quantiles + §2.7 JSON extraction in ONE
    per-event-type aggregation (round-5 window merge, same discipline as
    round 4's A3+A4): each original operator keeps its own output columns
    — avg_value (A1), p25/p50/p75 (X2, Spark `percentile` == DuckDB
    `quantile_cont` linear interpolation), n/sum_k/max_k (from_json over
    the props payload) — while sharing one shuffle on event_type.  The
    standalone query functions remain for direct use."""
    e = load(spark, sf, "events")
    k = F.from_json("props", "k INT").getField("k")
    return (
        e.select("event_type", "value", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.75)"), 6).alias("p75"),
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )


def a2_exact_match_accuracy(spark: SparkSession, sf: str) -> DataFrame:
    """A2: exact-match accuracy style metric (train/crnn.py:222-235)."""
    return (
        load(spark, sf, "documents")
        .groupBy("lang")
        .agg(
            F.round(
                F.avg((F.col("n_chars") > 200).cast("double")) * 100.0, 6
            ).alias("accuracy_pct")
        )
    )


def a3_running_max(spark: SparkSession, sf: str) -> DataFrame:
    """A3: best-so-far gate (train/crnn.py:300-303)."""
    return (
        load(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.round(F.max("value"), 6).alias("best_value"))
    )


def a4_count_sum(spark: SparkSession, sf: str) -> DataFrame:
    """A4: counters (train/crnn.py:175-176)."""
    return (
        load(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def a3_a4_count_sum_max(spark: SparkSession, sf: str) -> DataFrame:
    """A3 + A4 in one aggregation: counters (count/sum,
    train/crnn.py:175-176) and the best-so-far max gate
    (train/crnn.py:300-303) over the same groupBy — one shuffle carries
    both operators' driver evidence.  The standalone `a3_running_max` /
    `a4_count_sum` remain as library surface."""
    return (
        load(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.max("value"), 6).alias("best_value"),
        )
    )


def a5_edit_distance(spark: SparkSession, sf: str) -> DataFrame:
    """A5: Levenshtein (recog_utils.py:148-166) via the JVM builtin."""
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.levenshtein(
            F.substring("text", 1, 12), F.substring("text", 13, 12)
        ).alias("edit_dist"),
    )


def a6_confidence_product(spark: SparkSession, sf: str) -> DataFrame:
    """A6/R10: product-reduce over an array (net.py:190 cumprod analog).

    Integer-domain product so the DuckDB comparison is exact: each of the
    first 8 embedding dims maps to floor(x*10)+12 in [2,21].
    """
    e = load(spark, sf, "embeddings")
    return e.select(
        "vec_id",
        F.aggregate(
            F.slice("embedding", 1, 8),
            F.lit(1).cast("long"),
            lambda acc, x: acc
            * (F.floor(x.cast("double") * 10) + 12).cast("long"),
        ).alias("conf_prod"),
    )


def a7_group_collect(spark: SparkSession, sf: str) -> DataFrame:
    """A7: per-group result accumulation (pipeline.py:73-79), deterministic
    via sort_array.

    Emitted as a comma-joined scalar, not array<string>: the driver's
    correctness canonicalizer hashes pandas values and cannot hash Python
    lists (round-1 gate error), and a sorted-joined string carries the same
    information for comparison purposes."""
    return (
        load(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_list("event_id"))
            ).alias("event_ids")
        )
    )


# --- joins / sets / windows / sort ------------------------------------------

def j1_broadcast_join(spark: SparkSession, sf: str) -> DataFrame:
    """J1: equi-join, strategy picked deliberately by build-side size
    (guide §3.1).  Below the threshold the orders side is broadcast —
    the probe side is never shuffled at all; above it, building a
    multi-million-row hash relation on the driver and shipping it to
    every executor is slower than just shuffling both sides, so the
    plan switches to a shuffled hash join (measured at 1.5M orders /
    6M lineitem on 32 cores: broadcast 1.8 s vs shuffled-hash 0.83 s —
    and a broadcast build grows linearly until it hits Spark's 8 GB /
    512M-row hard cap).  The threshold is parameterised
    (SPARK_GRAFT_BROADCAST_MB, default 16 MB of parquet on the build
    side ~ a few hundred MB in-memory at scale)."""
    import os

    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders")
    cap_mb = int(os.environ.get("SPARK_GRAFT_BROADCAST_MB", "16"))
    try:
        small = (os.path.getsize(f"{sf}/orders.parquet")
                 <= cap_mb * 1024 * 1024)
    except OSError:
        small = True
    build = F.broadcast(orders) if small else orders.hint("shuffle_hash")
    return (
        li.join(build, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def j2_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    """J2: coverage anti-join (missing urls analog)."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


def j3_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    """J3: EXISTS semi-join, counted per segment."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def w1_window_topk(spark: SparkSession, sf: str) -> DataFrame:
    """W1 + D10 in one window: top-3 earliest events per user
    (reading-order window analog, net.py:108) with the deterministic
    first-in-order element (D10's reading-order sort, net.py:108 /
    `d10_reading_order`) carried as first_value columns over the SAME
    window spec — one shuffle, one sort, both operators evidenced by one
    driver row."""
    # first_ts is emitted as epoch MICROS (bigint): timestamp COLLECTION
    # depends on the session time zone, and a query function must not
    # mutate session conf as a side effect (the pin would leak into every
    # later query on a caller's non-UTC session) — integer micros are
    # time-zone-independent on both engines
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    return (
        load(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("first_event_id", F.first("event_id").over(w))
        .withColumn("first_ts_us", _ntz_epoch_us(F.first("ts").over(w)))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "rn", "first_event_id", "first_ts_us")
    )


def w2_sessionization(spark: SparkSession, sf: str) -> DataFrame:
    """W2 (guide pattern): sessionize events per user with a 30-minute
    inactivity gap — lag + cumsum-of-gap-flags windows, then per-session
    aggregates.  Integer-exact outputs (epoch-micros math — no session
    time-zone dependence, so no conf mutation)."""
    e = load(spark, sf, "events").withColumn(
        "ts_us", _ntz_epoch_us(F.col("ts"))
    )
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w_user)
    with_flag = e.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0),
    )
    with_id = with_flag.withColumn(
        "sess_seq",
        F.sum("new_sess").over(
            w_user.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"),
    )
    return (
        with_id.groupBy("user_id", "sess_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        )
    )


def t1_sort_limit(spark: SparkSession, sf: str) -> DataFrame:
    """T1: deterministic top-10 orders by price."""
    return (
        load(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


def u1_union_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """U1: union of customer & supplier nations, deduplicated."""
    c = load(spark, sf, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).distinct()


def t1_u1_sort_union(spark: SparkSession, sf: str) -> DataFrame:
    """T1 + U1 in one tagged frame (round-5 window merge, the J2+J3
    discipline): the deterministic top-10 sort/limit and the
    union-distinct each contribute their rows under a `part` tag —
    both operators' evidence in one driver row.  The standalone
    `t1_sort_limit` / `u1_union_distinct` remain as library surface."""
    t1 = t1_sort_limit(spark, sf).select(
        F.lit("t1").alias("part"),
        F.col("o_orderkey").cast("long").alias("k1"),
        F.round("o_totalprice", 2).alias("v"),
    )
    u1 = u1_union_distinct(spark, sf).select(
        F.lit("u1").alias("part"),
        F.col("nationkey").cast("long").alias("k1"),
        F.lit(None).cast("double").alias("v"),
    )
    return t1.unionByName(u1)


def d10_reading_order(spark: SparkSession, sf: str) -> DataFrame:
    """D10: deterministic first-in-order element per group.  The
    timestamp is emitted as epoch micros — time-zone-independent, so the
    function never mutates session conf (see w1_window_topk)."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    return (
        load(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", _ntz_epoch_us(F.col("ts")).alias("ts_us"))
    )


def x1_approx_aggregates(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate distinct (HLL++) + approximate quantiles per event type.

    rows-only in the driver gate: sketch algorithms are engine-specific
    (Spark HLL++ vs DuckDB HLL give different estimates by design); the
    pytest bound-check asserts each estimate lands within 5% of exact."""
    e = load(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.round(F.percentile_approx("value", 0.5, 10000), 4).alias("p50"),
        F.round(F.percentile_approx("value", 0.99, 10000), 4).alias("p99"),
    )


def x2_exact_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated quantiles per event type — the oracle-able
    companion to x1 (Spark `percentile` and DuckDB `quantile_cont` share
    linear-interpolation semantics, so rounded results hash-match).  At
    scale exact quantiles are a full sort per group; x1's sketches are the
    10^12-row path and this is the verification/spot-check path."""
    e = load(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.75)"), 6).alias("p75"),
    )


def p1_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot: per-user value sums by event type (guide pattern)."""
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        load(spark, sf, "events")
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.round(F.sum("value"), 6))
    )


def c1_cube(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with counts."""
    return (
        load(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def r1_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP over (orderpriority, orderstatus) with sums."""
    return (
        load(spark, sf, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


def c1_r1_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """C1 + R1 in one GROUPING SETS aggregation: the four sets of the
    (o_orderpriority, o_orderstatus) cube — a strict superset of the
    rollup's three — computed in one pass with grouping_id()
    disambiguating subtotal rows from real NULL groups.  One Expand +
    one shuffle instead of two full scans; the standalone `c1_cube` /
    `r1_rollup` remain as library surface."""
    return (
        load(spark, sf, "orders")
        .groupingSets(
            [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"],
             ["o_orderstatus"], []],
            "o_orderpriority", "o_orderstatus",
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


def j2_j3_semi_anti(spark: SparkSession, sf: str) -> DataFrame:
    """J2 + J3 in one plan: per-segment counts of customers WITH orders
    (left-semi / EXISTS) and WITHOUT (left-anti / NOT EXISTS), tagged and
    unioned — both join operators appear in a single driver row's physical
    plan.  The standalone `j2_anti_join` / `j3_semi_join` remain as
    library surface."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    active = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("status", F.lit("active"))
    )
    inactive = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("status", F.lit("inactive"))
    )
    return active.unionByName(inactive).select("c_mktsegment", "status", "n")


def tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical multi-agg groupBy (A1-A4 together)."""
    return (
        load(spark, sf, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def s5_scan_projection(spark: SparkSession, sf: str) -> DataFrame:
    """S5: projection scan with pushed filter (query.go:77-83 analog)."""
    return (
        load(spark, sf, "lineitem")
        .filter(F.col("l_shipdate") < F.lit("1996-01-01").cast("date"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


def s10_ddl_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """S10/S11: DDL + insert-select + read-back through the SQL surface
    (query.go:40-55 CREATE/DROP analog on temp views)."""
    load(spark, sf, "nation").createOrReplaceTempView("nation_src")
    spark.sql("DROP VIEW IF EXISTS nation_ddl")
    spark.sql(
        "CREATE TEMPORARY VIEW nation_ddl AS "
        "SELECT n_nationkey, n_name, n_regionkey FROM nation_src "
        "WHERE n_regionkey >= 2"
    )
    return spark.sql("SELECT n_regionkey, count(*) AS n FROM nation_ddl GROUP BY n_regionkey")


def s3_text_scan(spark: SparkSession, sf: str) -> DataFrame:
    """S3: annotation-list scan (generator.py:27-40): write a
    tab-separated text manifest, read it back with the text source, split
    into typed columns (path/label analog = doc_id/lang)."""
    import os
    import tempfile

    d = load(spark, sf, "documents").select("doc_id", "lang")
    tmp = os.path.join(tempfile.gettempdir(), "s3_manifest")
    (
        d.select(F.concat_ws("\t", F.col("doc_id").cast("string"), "lang")
                 .alias("value"))
        .coalesce(1)
        .write.mode("overwrite")
        .text(tmp)
    )
    lines = spark.read.text(tmp)
    parts = F.split(F.col("value"), "\t")
    return lines.select(
        parts.getItem(0).cast("long").alias("doc_id"),
        parts.getItem(1).alias("lang"),
    )


def f9_cdc_merge(spark: SparkSession, sf: str) -> DataFrame:
    """F9/F10: DELETE + UPDATE semantics (query.go:86-88,102-104) emulated
    jarlessly: anti-join for deletes, left-join + coalesce for updates (the
    MERGE INTO pattern on engines without row-level ops)."""
    o = load(spark, sf, "orders")
    deletes = o.filter(F.col("o_orderkey") % 97 == 0).select("o_orderkey")
    updates = o.filter(
        (F.col("o_orderkey") % 89 == 0) & (F.col("o_orderkey") % 97 != 0)
    ).select(
        "o_orderkey", (F.col("o_totalprice") * 1.1).alias("new_price")
    )
    kept = o.join(deletes, "o_orderkey", "left_anti")
    merged = kept.join(F.broadcast(updates), "o_orderkey", "left").withColumn(
        "price2", F.coalesce("new_price", "o_totalprice")
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("price2"), 2).alias("total_after"),
    )


def fn_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """§2.7 JSON surface: from_json over the events.props payload, grouped
    stats over the extracted field (manifest-rollup pattern)."""
    e = load(spark, sf, "events")
    k = F.from_json("props", "k INT").getField("k")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )


def fn_scalar_surface(spark: SparkSession, sf: str) -> DataFrame:
    """§2.7 scalar functions: lower/trim/translate/concat_ws/sha2/md5."""
    d = load(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.lower(F.substring("text", 1, 20)).alias("lowered"),
        F.translate(F.substring("text", 1, 20), "aeiou", "AEIOU").alias(
            "translated"
        ),
        F.concat_ws("|", "lang", "source").alias("tagged"),
        F.sha2(F.col("text"), 256).alias("sha"),
        F.md5(F.col("text")).alias("fp_md5"),
    )

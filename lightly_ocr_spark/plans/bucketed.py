"""Bucketed tables: pre-shuffled storage for repeat co-located joins.

At 10^12 documents the expensive joins recur on the same key (url: golden
verification, CDC merges, enrichment re-attach, media rollup).  Paying the
url shuffle once AT WRITE TIME — `bucketBy(n, key)` + `sortBy(key)` into
the table catalog — makes every subsequent equi-join on that key
shuffle-free on BOTH sides: each bucket pair joins locally, and the
sortBy lets the sort-merge join skip its sort too.  This is the standard
Spark answer to "the same big join keeps shuffling the same table"
(graft note: the reference re-reads its KV store per request,
`pipeline.py:106-112`; a bucketed table is the batch analog that also
pre-pays the join partitioning).

Caveats encoded here rather than left to callers:

* both sides must agree on bucket COUNT and KEY, or Spark silently falls
  back to shuffling the mismatched side;
* `spark.sql.sources.bucketing.enabled` must stay true (default);
* bucket pruning applies to point predicates on the bucket key, so
  single-url lookups touch 1/n of the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int,
    sort: bool = True, mode: str = "overwrite",
) -> None:
    """Materialize `df` as a bucketed catalog table (parquet under the
    session warehouse).  One shuffle now; zero shuffles for every later
    equi-join between tables bucketed the same way on `key`."""
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def _bucket_spec(spark: SparkSession, table: str) -> tuple[int, list[str]]:
    """(num_buckets, bucket_columns) from the catalog; (0, []) if the
    table is not bucketed."""
    n, cols = 0, []
    for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        name = (r["col_name"] or "").strip()
        if name == "Num Buckets":
            n = int(r["data_type"])
        elif name == "Bucket Columns":
            cols = [
                c.strip(" `") for c in
                r["data_type"].strip("[]").split(",") if c.strip()
            ]
    return n, cols


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str,
) -> DataFrame:
    """Equi-join two identically-bucketed tables on the bucket key.

    With matching bucket specs this plans as a sort-merge join with NO
    Exchange on either side (asserted by plan-shape test) — the join cost
    is a per-bucket merge, independent of cluster-wide shuffle capacity.
    Mismatched bucket counts/keys make Spark silently shuffle the
    mismatched side, defeating the whole point — so the specs are checked
    against the catalog and a mismatch RAISES instead."""
    ln, lcols = _bucket_spec(spark, left_table)
    rn, rcols = _bucket_spec(spark, right_table)
    problems = []
    if ln == 0 or rn == 0:
        problems.append(
            f"not bucketed: {left_table if ln == 0 else ''} "
            f"{right_table if rn == 0 else ''}".strip()
        )
    elif ln != rn:
        problems.append(f"bucket counts differ ({ln} vs {rn})")
    # Spark resolves identifiers case-insensitively — compare likewise, or
    # a table bucketed on 'Host' joined on 'host' would falsely raise
    if ([c.lower() for c in lcols] != [key.lower()]
            or [c.lower() for c in rcols] != [key.lower()]):
        problems.append(
            f"bucket columns {lcols} / {rcols} != join key [{key!r}]"
        )
    if problems:
        raise ValueError(
            "bucketed_join would silently shuffle: " + "; ".join(problems)
            + " — rewrite the table(s) with matching bucketBy specs"
        )
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, key)


def salt_expr(key: str, salt: int, *content_cols: str) -> F.Column:
    """The salt-bucket assignment used by `salted_join`, exposed so tests
    exercise the REAL expression (a hand-copied duplicate in a test keeps
    passing while the operator regresses).

    The salt is derived from ROW CONTENT (the key plus the row's other
    columns), never from `monotonically_increasing_id()`/`rand()`:
    Catalyst marks those nondeterministic, which blocks predicate pushdown
    through the projection and makes the assignment depend on partition
    layout (different buckets on task retry / after a repartition).  A
    content hash is retry-stable and keeps the plan fully deterministic;
    rows with identical full content share a bucket, which is harmless —
    distinct rows under a hot key are what need spreading."""
    return F.pmod(
        F.xxhash64(F.col(key), *[F.col(c) for c in content_cols]),
        F.lit(salt),
    ).cast("int")


def salted_join(
    left: DataFrame, right: DataFrame, key: str, salt: int = 16,
) -> DataFrame:
    """Skew-proof big-to-medium equi-join: explode the RIGHT side into
    `salt` replicas and scatter the LEFT side's hot keys across them.

    AQE's skew-join splits oversized PARTITIONS after the shuffle, but a
    single key hot enough to dwarf one task (one host with 10^9 rows
    joining its metadata) still lands every row on one reducer in a plain
    shuffle join — this operator pre-splits the KEY itself: the left side
    salts each row into one of `salt` sub-keys (deterministic xxhash64 of
    the row's full content — retry-stable), the right side is
    replicated `salt` times, and the join key becomes (key, salt_id).
    Cost: right side inflates x`salt` (use only when right is the
    medium-but-too-big-to-broadcast side); hot-key rows spread over `salt`
    tasks instead of one.  Results equal the plain join exactly (tested),
    output columns = left's + right's non-key columns.  The internal salt
    column name is chosen to avoid any existing column (silently
    clobbering a caller's '_salt' would change the output).

    LIMITATION (content-derived salt): rows that are byte-identical
    ACROSS ALL columns share one salt bucket, so a hot key whose volume
    is dominated by exact duplicate rows is not spread — the join still
    pays the x`salt` replication while one reducer does the hot work.
    Exact-duplicate skew is better handled UPSTREAM of the join anyway:
    pre-aggregate the duplicates into (row, count) — the dedup operators
    in this engine exist precisely so corpus rows reaching a join are
    distinct — after which the content salt spreads every row.  (The
    no-content-column ValueError below is the degenerate case of the
    same rule: key-only frames are all-duplicates by construction.)"""
    sc = "_salt"
    while sc in left.columns or sc in right.columns:
        sc += "_"
    # content columns for the salt hash: every non-key column xxhash64
    # accepts (maps are not hashable even when NESTED inside arrays or
    # structs — excluded by substring, not prefix)
    content = [
        c for c, t in left.dtypes
        if c != key and "map<" not in t
    ]
    if not content:
        # with nothing but the key to hash, every row of a hot key lands
        # in ONE salt bucket: the operator would silently do nothing while
        # still paying the x`salt` right-side replication — refuse loudly
        raise ValueError(
            "salted_join: left frame has no non-key, non-map column to "
            "derive a deterministic salt from — every hot-key row would "
            "share one bucket.  Add a distinguishing column (row id, "
            "timestamp, payload) or rely on AQE skew-join instead"
        )
    lt = left.withColumn(sc, salt_expr(key, salt, *content))
    rt = right.withColumn(
        sc, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return lt.join(rt, [key, sc]).drop(sc)

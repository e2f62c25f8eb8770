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


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str,
) -> DataFrame:
    """Equi-join two identically-bucketed tables on the bucket key.

    With matching bucket specs this plans as a sort-merge join with NO
    Exchange on either side (asserted by plan-shape test) — the join cost
    is a per-bucket merge, independent of cluster-wide shuffle capacity."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, key)

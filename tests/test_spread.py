"""Focused tests for the round-6 `spread` scan fan-out (guide §2.5).

A single-row-group parquet file scans as ONE task; `spread` repartitions
such scans to the session's core budget, skips already-parallel inputs,
and carries a pushdown barrier so later filters cannot sink below the
fan-out Exchange (which would re-serialize the work it exists to
parallelize)."""

import pytest
from pyspark.sql import functions as F

from tests.test_plan_shape import plan_of

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


class TestSpread:
    def test_fans_out_single_partition_scan(self, spark):
        from lightly_ocr_spark.plans.relational import spread

        df = spark.read.parquet(f"{SF}/documents.parquet")
        assert df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
        s = spread(df)
        assert (
            s.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism
        )

    def test_skips_already_parallel_input(self, spark):
        from lightly_ocr_spark.plans.relational import spread

        target = spark.sparkContext.defaultParallelism
        df = spark.read.parquet(f"{SF}/documents.parquet").repartition(target)
        # enough partitions -> returned unchanged, no second Exchange
        assert spread(df) is df

    def test_rows_unchanged(self, spark):
        from lightly_ocr_spark.plans.relational import spread

        df = spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "n_chars"
        )
        before = sorted((r.doc_id, r.n_chars) for r in df.collect())
        after = sorted((r.doc_id, r.n_chars) for r in spread(df).collect())
        assert before == after

    def test_blocks_filter_pushdown_below_exchange(self, spark):
        from lightly_ocr_spark.plans.relational import spread

        df = spread(spark.read.parquet(f"{SF}/documents.parquet"))
        plan = plan_of(df.filter(~F.col("text").rlike("[^ -~]")),
                       mode="simple")
        assert "Exchange" in plan
        # tree prints parents above children: the rlike filter must sit
        # ABOVE the fan-out Exchange (i.e. appear earlier in the dump),
        # otherwise the per-row regex work runs on the serial scan again
        assert plan.index("RLIKE") < plan.index("Exchange")

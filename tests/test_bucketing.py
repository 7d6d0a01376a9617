"""Bucketed co-located joins: the large-vs-large join strategy at 100TB.

SURVEY.md §2.4/§4: broadcast covers small dims; when BOTH sides are big
(e.g. clips vs a billion-row transcript catalog), the scale path is writing
both tables bucketed by the join key so the sort-merge join runs with NO
shuffle exchange on either side — each bucket pair joins locally."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf001_dir):
    # uses the session's default warehouse dir (spark-warehouse/, gitignored)
    o = spark.read.parquet(f"{sf001_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf001_dir}/lineitem.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_orders"))
    (li.withColumnRenamed("l_orderkey", "o_orderkey")
     .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_lineitem"))
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    to, tl = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try:
        j = spark.table(to).join(spark.table(tl), "o_orderkey").select(
            "o_orderkey", "o_totalprice", "l_quantity"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1500]
        # and it computes the right thing
        n = j.count()
        li = spark.table(tl).count()
        assert n == li  # every lineitem matches exactly one order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unbucketed_join_shuffles_both_sides(spark, sf001_dir):
    """Contrast case: the same join over plain parquet exchanges both sides."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.read.parquet(f"{sf001_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf001_dir}/lineitem.parquet").withColumnRenamed(
            "l_orderkey", "o_orderkey")
        j = o.join(li, "o_orderkey").select("o_orderkey", "o_totalprice", "l_quantity")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

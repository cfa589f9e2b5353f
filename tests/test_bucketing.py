"""Bucketed co-located join: the write-once pre-shuffle must remove every
Exchange from a later sort-merge equi-join on the bucket key."""

import pyspark.sql.functions as F
import pytest

from pdfextractor_spark.ops.bucketing import read_table, write_bucketed


@pytest.fixture()
def bucketed_pair(spark):
    a = spark.range(0, 10_000).select(
        F.col("id").alias("url_id"), (F.col("id") % 7).alias("total_goals"))
    b = spark.range(0, 10_000, 2).select(
        F.col("id").alias("url_id"), F.lit("seen").alias("status"))
    write_bucketed(a, "bk_silver", ["url_id"], num_buckets=8, sort_cols=["url_id"])
    write_bucketed(b, "bk_lineage", ["url_id"], num_buckets=8, sort_cols=["url_id"])
    yield "bk_silver", "bk_lineage"
    spark.sql("DROP TABLE IF EXISTS bk_silver")
    spark.sql("DROP TABLE IF EXISTS bk_lineage")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = read_table(spark, ta).join(read_table(spark, tb), "url_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucket co-location must remove the shuffle"
        assert joined.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_shuffle(spark, bucketed_pair):
    """Control: the same join over plain dataframes shuffles both sides —
    proves the previous assertion measures bucketing, not the data size."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 10_000).select(F.col("id").alias("url_id"))
        b = spark.range(0, 10_000, 2).select(F.col("id").alias("url_id"))
        plan = a.join(b, "url_id")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

"""Bucketed co-located joins must plan without exchanges."""

import pytest

from bullet_storm_spark.sources.bucketing import (
    bucketed_join_is_shuffle_free,
    write_bucketed,
)
from bullet_storm_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    write_bucketed(li.select("l_orderkey", "l_quantity", "l_extendedprice")
                   .withColumnRenamed("l_orderkey", "orderkey"),
                   "bkt_lineitem", ["orderkey"], n_buckets=8)
    write_bucketed(orders.select("o_orderkey", "o_totalprice")
                   .withColumnRenamed("o_orderkey", "orderkey"),
                   "bkt_orders", ["orderkey"], n_buckets=8)
    yield "bkt_lineitem", "bkt_orders"
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_bucketed_join_plans_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # pin sort-merge so AQE's broadcast preference doesn't mask the check
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert bucketed_join_is_shuffle_free(spark, left, right, "orderkey")
        # and the join result is correct
        n = spark.table(left).join(spark.table(right), "orderkey").count()
        assert n == spark.table(left).count()  # every lineitem has its order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unbucketed_join_needs_exchange(spark, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
        orders = load_table(spark, "/root/testdata/sf0.001", "orders")
        plan = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            ._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        import re

        assert re.search(r"\bExchange\b", plan)  # the shuffle bucketing removes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

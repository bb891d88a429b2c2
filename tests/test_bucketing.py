"""Bucketing: pre-partitioned tables make repeated fact-fact joins
shuffle-free — the 100 TB answer to 'this join shuffles 100 TB every run'.

Writes bucketed copies of orders/lineitem into a temp warehouse, then
asserts the bucketed join plan contains NO Exchange on either side while
producing identical results to the shuffle join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wordcount_spark.plans.explain import formatted_plan


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # default warehouse dir (./spark-warehouse, gitignored) — the
    # warehouse.dir conf is static and can't move per-test
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("lineitem_b")
    )
    yield spark.table("orders_b"), spark.table("lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _join(o, l):
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    o, l = bucketed
    # disable broadcast so the join strategy itself is under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = formatted_plan(_join(o, l))
        pre_agg = plan.split("HashAggregate")[-1]  # below the first agg
        assert "SortMergeJoin" in plan
        # the join inputs read pre-bucketed data: no Exchange below the join
        join_section = plan[plan.index("SortMergeJoin") :]
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_shuffle_join(spark, sf_dir, bucketed):
    o, l = bucketed
    want = _join(
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
    ).collect()
    got = _join(o, l).collect()
    key = lambda r: r["o_orderstatus"]
    assert sorted(got, key=key) == sorted(want, key=key)

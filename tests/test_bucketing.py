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


def test_snapshot_diff_join_is_shuffle_free_when_bucketed(spark, sf_dir):
    """corpus_snapshot_diff's docstring claims the full-outer join is
    bucketable — prove it: write both snapshots bucketed by doc_id and
    assert the diff join plans with NO exchange under it, with results
    identical to the unbucketed query."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = docs.where(F.col("doc_id") % 10 < 8).select(
        "doc_id", "source", F.md5("text").alias("h")
    )
    new = docs.where(F.col("doc_id") % 10 >= 2).select(
        "doc_id",
        "source",
        F.md5(
            F.when(
                F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
            ).otherwise(F.col("text"))
        ).alias("h"),
    )
    old.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite").saveAsTable(
        "snap_old_b"
    )
    new.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite").saveAsTable(
        "snap_new_b"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("snap_old_b").alias("o")
        n = spark.table("snap_new_b").alias("n")
        cls = (
            F.when(F.col("o.doc_id").isNull(), "added")
            .when(F.col("n.doc_id").isNull(), "removed")
            .when(F.col("o.h") != F.col("n.h"), "changed")
            .otherwise("unchanged")
        )
        j = o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full_outer").select(
            F.coalesce(F.col("o.source"), F.col("n.source")).alias("source"),
            cls.alias("cls"),
        )
        diff = j.groupBy("source").agg(
            *[
                F.sum((F.col("cls") == c).cast("long")).alias(f"n_{c}")
                for c in ("added", "removed", "changed", "unchanged")
            ]
        )
        plan = formatted_plan(diff)
        assert "SortMergeJoin FullOuter" in plan or "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(doc_id" not in plan  # bucketed: no shuffle
        from wordcount_spark.registry import get_queries

        want = {
            r["source"]: (r["n_added"], r["n_removed"], r["n_changed"], r["n_unchanged"])
            for r in get_queries()["corpus_snapshot_diff"](spark, sf_dir).collect()
        }
        got = {
            r["source"]: (r["n_added"], r["n_removed"], r["n_changed"], r["n_unchanged"])
            for r in diff.collect()
        }
        assert got == want
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS snap_old_b")
        spark.sql("DROP TABLE IF EXISTS snap_new_b")

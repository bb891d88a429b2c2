"""1-Bucket-Theta blocked join: the blocked rewrite must produce every
qualifying pair EXACTLY ONCE (each A row meets each B row in precisely
one (row, col) cell) and must plan as an equi join on cell ids — never
a CartesianProduct and never a BroadcastNestedLoopJoin."""

from __future__ import annotations

from pyspark.sql import functions as F

from wordcount_spark.operators.relational import theta_join_blocked
from wordcount_spark.plans.explain import formatted_plan
from wordcount_spark.sources.readers import load_table


def test_blocked_theta_equals_naive_join(spark, sf_dir):
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_acctbal"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    theta = F.col("c_acctbal") > F.col("s_acctbal") * 2
    blocked = {
        (r["s_suppkey"], r["c_custkey"])
        for r in theta_join_blocked(
            sup, cust, theta, "s_suppkey", "c_custkey", r_blocks=3, c_blocks=5
        ).collect()
    }
    naive = {
        (r["s_suppkey"], r["c_custkey"])
        for r in sup.join(cust, theta).collect()
    }
    assert blocked == naive
    # exactly-once: the blocked join returns a SET-sized bag (no pair
    # meets in two cells)
    n_rows = theta_join_blocked(
        sup, cust, theta, "s_suppkey", "c_custkey", r_blocks=3, c_blocks=5
    ).count()
    assert n_rows == len(naive)


def test_blocked_theta_plans_equi_join(spark, sf_dir):
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    plan = formatted_plan(
        theta_join_blocked(
            sup, cust, F.col("c_acctbal") > F.col("s_acctbal") * 2,
            "s_suppkey", "c_custkey",
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the whole point: the theta join runs as an equi join on cell ids
    assert "Join" in plan and "_r" in plan and "_c" in plan

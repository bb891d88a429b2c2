"""CDC merge / SCD2 semantics tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from wordcount_spark.operators.cdc import merge_upsert, merge_upsert_latest, scd2_apply


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "name", "bal"]
    )
    changes = spark.createDataFrame(
        [(2, "b2", 25.0), (4, "d", 40.0)], ["id", "name", "bal"]
    )
    got = {r["id"]: (r["name"], r["bal"]) for r in merge_upsert(target, changes, "id").collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 25.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_upsert_latest_wins(spark):
    target = spark.createDataFrame([(1, "a", 0)], ["id", "name", "v"])
    changes = spark.createDataFrame(
        [(1, "a1", 1), (1, "a2", 2), (2, "b1", 1)], ["id", "name", "v"]
    )
    got = {r["id"]: (r["name"], r["v"]) for r in merge_upsert_latest(target, changes, "id", "v").collect()}
    assert got == {1: ("a2", 2), 2: ("b1", 1)}


def test_scd2_apply(spark):
    dim = spark.createDataFrame(
        [
            (1, "x", "2020-01-01", None),
            (2, "y", "2020-01-01", None),
            (2, "old", "2019-01-01", "2020-01-01"),
        ],
        ["id", "attr", "valid_from", "valid_to"],
    )
    changes = spark.createDataFrame(
        [(1, "x2", "2021-06-01", None), (2, "y", "2021-06-01", None)],
        schema="id bigint, attr string, valid_from string, valid_to string",
    )
    rows = scd2_apply(dim, changes, "id", ["attr"]).collect()
    by = sorted(((r["id"], r["attr"], r["valid_from"], r["valid_to"]) for r in rows))
    assert by == sorted(
        [
            (1, "x", "2020-01-01", "2021-06-01"),   # closed
            (1, "x2", "2021-06-01", None),          # new version
            (2, "y", "2020-01-01", None),           # unchanged current
            (2, "old", "2019-01-01", "2020-01-01"), # pre-existing history
        ]
    )


def test_incremental_agg_composes_across_batches(spark):
    """The IVM invariant: applying the change stream as TWO sequential
    delta batches must land on the same aggregate as one batch — and both
    must equal the declarative recompute from final state. This is what
    makes the refresh loop safe to run per micro-batch."""
    from tests.conftest import SF_DIR
    from wordcount_spark.operators.queries_cdc import (
        agg_of_state,
        apply_agg_deltas,
        latest_state,
    )
    from wordcount_spark.sources.readers import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    cut1 = F.lit("2024-01-11").cast("timestamp")
    cut2 = F.lit("2024-01-21").cast("timestamp")

    state0 = latest_state(ev.filter(F.col("ts") < cut1))
    batch1 = latest_state(
        ev.filter((F.col("ts") >= cut1) & (F.col("ts") < cut2))
    )
    batch2 = latest_state(ev.filter(F.col("ts") >= cut2))
    assert batch1.count() > 0 and batch2.count() > 0  # both steps real

    agg1 = apply_agg_deltas(agg_of_state(state0), state0, batch1)
    # state after batch1: batch rows win, untouched snapshot rows survive
    state1 = batch1.unionByName(
        state0.join(batch1.select("user_id"), "user_id", "left_anti")
    )
    agg2 = apply_agg_deltas(agg1, state1, batch2)

    expected = {
        r.event_type: (r.n_users, r.total_value)
        for r in agg_of_state(latest_state(ev)).collect()
    }
    got = {
        r.event_type: (r.n_users, r.total_value) for r in agg2.collect()
    }
    assert got == expected

"""CDC / MERGE-semantics queries over the events changelog.

The `operators/cdc.py` primitives (latest-wins upsert, SCD2 apply) are
exercised here as oracle-checked queries: events is the changelog, a
mid-month cutoff splits it into "snapshot so far" and "incoming changes".
At 100 TB the change batch is small relative to the snapshot — the
anti-join side broadcasts and only the changeset shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wordcount_spark.operators.cdc import merge_upsert_latest, scd2_apply
from wordcount_spark.registry import register
from wordcount_spark.sources.readers import load_table

_CUTOFF = "2024-01-16"


@register(
    "cdc_upsert_latest_state",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_type,
           value AS last_value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) t
    WHERE rn = 1
    ORDER BY user_id
    """,
)
def cdc_upsert_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins changelog apply: the per-user state snapshot as of a
    cutoff, merged with the post-cutoff change batch via
    ``merge_upsert_latest`` (window top-1 dedups multi-version changes,
    anti-join + union applies them). The oracle is the algebraic identity:
    snapshot(<cutoff) merged with latest(≥cutoff) ≡ global latest per key —
    so the whole merge pipeline is differentially checked, not just its
    output shape. Version order is (ts, event_id): a total order that
    breaks timestamp ties deterministically.

    Scale: per-key top-1 via window (one user-keyed exchange per input),
    anti-join + union to apply — state O(keys), never a row-multiplying
    join; the streaming twin maintains the same state incrementally.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    cut = F.lit(_CUTOFF).cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    snap = (
        ev.filter(F.col("ts") < cut)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    changes = ev.filter(F.col("ts") >= cut).withColumn(
        "__v", F.struct("ts", "event_id")
    )
    merged = merge_upsert_latest(
        snap.withColumn("__v", F.struct("ts", "event_id")),
        changes,
        key="user_id",
        version_col="__v",
    )
    return merged.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    ).orderBy("user_id")


@register(
    "cdc_scd2_history",
    """
    WITH firsts AS (
      SELECT user_id, event_type, ts FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn
        FROM events) t WHERE rn = 1),
    lasts AS (
      SELECT user_id, event_type, ts FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t WHERE rn = 1)
    SELECT f.user_id, f.event_type, f.ts AS valid_from,
           CASE WHEN f.event_type <> l.event_type THEN l.ts END AS valid_to
    FROM firsts f JOIN lasts l USING (user_id)
    UNION ALL
    SELECT l.user_id, l.event_type, l.ts AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to
    FROM firsts f JOIN lasts l USING (user_id)
    WHERE f.event_type <> l.event_type
    ORDER BY user_id, valid_from
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 apply: the dimension seeded from each user's FIRST event gets
    the LATEST event applied as a change batch via ``scd2_apply`` — users
    whose tracked attribute (event_type) changed have their original row
    closed (valid_to = change time) and a new open version appended;
    unchanged users pass through. The oracle replays the same
    first-vs-last comparison in SQL, checking the close-out/append logic
    row for row, including the pass-through and NULL-end cases.

    Scale: single-pass window formulation — two user-keyed window
    exchanges + the output sort (the 4-branch union form re-planned the
    shared frames to 8 exchanges; pinned by tests/test_shuffle_budget).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    # independent scan for the change side: scd2_apply compares cur vs
    # changes column-wise, which Spark's ambiguous-self-join check rejects
    # when both lineages share one scan node
    ev2 = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w_first = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_last = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    firsts = (
        ev.withColumn("__rn", F.row_number().over(w_first))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
        )
    )
    lasts = (
        ev2.withColumn("__rn", F.row_number().over(w_last))
        .filter(F.col("__rn") == 1)
        .select("user_id", "event_type", F.col("ts").alias("valid_from"))
    )
    hist = scd2_apply(
        firsts,
        lasts,
        key="user_id",
        compare_cols=["event_type"],
        ts_col="valid_from",
        end_col="valid_to",
    )
    return hist.orderBy("user_id", "valid_from")


@register(
    "cdc_incremental_agg",
    """
    WITH latest AS (
      SELECT user_id, event_type, value FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t WHERE rn = 1)
    SELECT event_type, count(*) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM latest GROUP BY event_type ORDER BY event_type
    """,
)
def cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance (IVM): the
    maintained view is per-event_type (n_users, total_value) over each
    user's LATEST state. Instead of recomputing from the full state, the
    change batch is applied as DELTAS: every affected user retracts
    (-1, -old_value) from their old group and asserts (+1, +new_value)
    into their new one; new_agg = old_agg ⊎ deltas. This is the update
    path that moves rows BETWEEN groups — the case where naive
    "re-aggregate the changed partition" breaks.

    The oracle recomputes the view declaratively from global latest state,
    so the delta algebra (retract/assert/merge, group drop-out when a type
    empties) is differentially checked against the view definition — two
    algorithms, one answer. Sums are DECIMAL(18,2): retractions must
    cancel EXACTLY for vacated groups to hit zero (double residue would
    leave phantom groups).

    Scale: only the change batch and the affected snapshot rows move —
    the retraction lookup is a join of the snapshot against the (small)
    changed-key set, broadcast at 100 TB; old_agg is group-count sized.
    The full state is never re-scanned per refresh; this is exactly the
    foreachBatch maintenance loop of ``streaming_incremental_merge``
    applied to an aggregate instead of row state.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    cut = F.lit(_CUTOFF).cast("timestamp")
    snap = latest_state(ev.filter(F.col("ts") < cut))
    chg = latest_state(ev.filter(F.col("ts") >= cut))
    new_agg = apply_agg_deltas(agg_of_state(snap), snap, chg)
    return new_agg.select(
        "event_type", "n_users", F.col("total_value").cast("double").alias("total_value")
    ).orderBy("event_type")


def latest_state(ev: DataFrame) -> DataFrame:
    """Changelog → (user_id, event_type, val) latest-wins state, version
    order (ts, event_id)."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("value").cast("decimal(18,2)").alias("val"),
        )
    )


def agg_of_state(state: DataFrame) -> DataFrame:
    """The maintained view, computed declaratively from a state table."""
    return state.groupBy("event_type").agg(
        F.count("*").alias("n_users"), F.sum("val").alias("total_value")
    )


def apply_agg_deltas(
    old_agg: DataFrame, old_state: DataFrame, changes: DataFrame
) -> DataFrame:
    """One IVM refresh: retract each affected user's old (count, value)
    contribution, assert the new one, merge with the old aggregate."""
    retract = old_state.join(
        changes.select("user_id"), "user_id", "left_semi"
    ).select(
        "event_type",
        F.lit(-1).cast("long").alias("n_users"),
        (-F.col("val")).alias("total_value"),
    )
    assert_ = changes.select(
        "event_type",
        F.lit(1).cast("long").alias("n_users"),
        F.col("val").alias("total_value"),
    )
    return (
        old_agg.select("event_type", "n_users", "total_value")
        .unionByName(retract)
        .unionByName(assert_)
        .groupBy("event_type")
        .agg(
            F.sum("n_users").alias("n_users"),
            F.sum("total_value").alias("total_value"),
        )
        .filter(F.col("n_users") > 0)
    )


@register(
    "corpus_snapshot_diff",
    """
    WITH old AS (
      SELECT doc_id, source, md5(text) AS h
      FROM documents WHERE doc_id % 10 < 8
    ),
    new AS (
      SELECT doc_id, source,
             md5(CASE WHEN doc_id % 3 = 0 THEN text || ' [rev2]' ELSE text END) AS h
      FROM documents WHERE doc_id % 10 >= 2
    ),
    j AS (
      SELECT coalesce(o.source, n.source) AS source,
             CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN o.h <> n.h THEN 'changed'
                  ELSE 'unchanged' END AS cls
      FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    )
    SELECT source,
           CAST(sum(CASE WHEN cls = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
           CAST(sum(CASE WHEN cls = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           CAST(sum(CASE WHEN cls = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           CAST(sum(CASE WHEN cls = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
    FROM j GROUP BY source ORDER BY source
    """,
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-crawl CDC: diff two snapshots of the documents table by
    content hash — per source, how many docs were added, removed, changed
    (same id, different content), or unchanged. The snapshots are carved
    deterministically from the one test table (old = doc_id%10<8, new =
    doc_id%10>=2 with every 3rd doc's text revised), so both engines see
    identical inputs.

    This is the ingest-planning query an incremental curation pipeline
    runs before deciding what to re-clean/re-embed: 'changed' rows
    invalidate downstream chunk fingerprints and embeddings; 'removed'
    rows need tombstones in the serving index.

    Scale: ONE full-outer join keyed on doc_id (bucketable — both
    snapshots cluster by the same key, zero-exchange with bucketed
    tables, cf. tests/test_bucketing.py) comparing 16-byte content
    hashes, then an O(sources) conditional-sum rollup. No text moves
    through the shuffle — only ids + hashes."""
    docs = load_table(spark, sf_dir, "documents")
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
    o, n = old.alias("o"), new.alias("n")
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
    return (
        j.groupBy("source")
        .agg(
            *[
                F.sum((F.col("cls") == c).cast("long")).alias(f"n_{c}")
                for c in ("added", "removed", "changed", "unchanged")
            ]
        )
        .orderBy("source")
    )


@register(
    "cdc_join_view_delta",
    """
    SELECT o.o_orderkey, c.c_custkey, c.c_name,
           CASE WHEN o.o_orderkey % 20 = 0 AND c.c_custkey % 30 = 0 THEN 'dOdC'
                WHEN o.o_orderkey % 20 = 0 THEN 'dO'
                WHEN c.c_custkey % 30 = 0 THEN 'dC'
                ELSE 'old' END AS via
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o_orderkey
    """,
)
def cdc_join_view_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view (the classic IVM identity):
    with base snapshots O, C and change batches ΔO, ΔC, the refreshed
    view O'⋈C' is computed as  (O⋈C) ∪ (ΔO⋈C) ∪ (O⋈ΔC) ∪ (ΔO⋈ΔC) —
    never re-joining the full snapshots. The split here is deterministic
    (orderkey%20 / custkey%30 are the "arrived since last refresh" rows)
    and each branch tags its provenance, so the oracle — the FULL
    recompute with the same tags spelled as a CASE — checks both the
    union-of-joins identity and that every row came through the branch
    IVM says it must.

    Scale: the three delta branches cost O(|ΔO|+|ΔC|) join work instead
    of O(|O⋈C|); the delta sides are small by construction, so AQE
    broadcasts them (no explicit hint — at a refresh where Δ is huge the
    engine falls back to shuffle joins, which is the right plan there).
    The base⋈base branch is the standing view — in production it is NOT
    recomputed (it is the materialized table being maintained); it
    appears here only so the output equals the full refreshed view.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o_base = orders.filter(F.col("o_orderkey") % 20 != 0)
    o_delta = orders.filter(F.col("o_orderkey") % 20 == 0)
    c_base = cust.filter(F.col("c_custkey") % 30 != 0)
    c_delta = cust.filter(F.col("c_custkey") % 30 == 0)

    def branch(o: DataFrame, c: DataFrame, tag: str) -> DataFrame:
        return (
            o.join(c, o["o_custkey"] == c["c_custkey"])
            .select("o_orderkey", "c_custkey", "c_name", F.lit(tag).alias("via"))
        )

    return (
        branch(o_base, c_base, "old")
        .unionAll(branch(o_delta, c_base, "dO"))
        .unionAll(branch(o_base, c_delta, "dC"))
        .unionAll(branch(o_delta, c_delta, "dOdC"))
        .orderBy("o_orderkey")
    )


@register(
    "scd2_point_in_time_join",
    """
    WITH firsts AS (
      SELECT user_id, event_type, ts FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn
        FROM events) t WHERE rn = 1),
    lasts AS (
      SELECT user_id, event_type, ts FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t WHERE rn = 1),
    hist AS (
      SELECT f.user_id, f.event_type, f.ts AS valid_from,
             CASE WHEN f.event_type <> l.event_type THEN l.ts END AS valid_to
      FROM firsts f JOIN lasts l USING (user_id)
      UNION ALL
      SELECT l.user_id, l.event_type, l.ts AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM firsts f JOIN lasts l USING (user_id)
      WHERE f.event_type <> l.event_type
    )
    SELECT h.event_type AS version_type,
           count(*) AS n_events,
           count(DISTINCT e.user_id) AS n_users
    FROM events e JOIN hist h
      ON e.user_id = h.user_id
     AND e.ts >= h.valid_from
     AND (h.valid_to IS NULL OR e.ts < h.valid_to)
    GROUP BY 1 ORDER BY 1
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join of a fact stream against an SCD2
    dimension: each event is attributed to the dimension VERSION that was
    valid at the event's timestamp — ``valid_from <= ts < valid_to`` with
    an open NULL end — the join every warehouse does to avoid leaking
    future attribute values into historical facts. The dimension history
    is the same first-vs-last construction as `cdc_scd2_history` (reused
    via that query), so this also exercises composing one registered
    query's output as another's input.

    Scale: equi-join on user_id with the validity range as a residual
    join filter — versions per key are few (here ≤2), so the range check
    multiplies nothing; the heavy frame (events) shuffles once on the
    join key and the aggregate is map-side combinable. Never a range-only
    join, never a BNLJ."""
    ev = load_table(spark, sf_dir, "events")
    hist = cdc_scd2_history(spark, sf_dir).select(
        F.col("user_id").alias("h_user"),
        F.col("event_type").alias("version_type"),
        "valid_from",
        "valid_to",
    )
    return (
        ev.join(
            hist,
            (F.col("user_id") == F.col("h_user"))
            & (F.col("ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
        )
        .groupBy("version_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("version_type")
    )


@register(
    "cdc_tombstone_gc",
    f"""
    WITH log AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      FROM events
    ),
    latest AS (
      SELECT user_id, ts AS last_ts, op AS last_op,
             CAST(cnt AS BIGINT) AS n_versions,
             CAST(dels AS BIGINT) AS n_deletes
      FROM (
        SELECT *,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY user_id) AS cnt,
               count(*) FILTER (WHERE op = 'D')
                   OVER (PARTITION BY user_id) AS dels
        FROM log) t
      WHERE rn = 1
    )
    SELECT user_id,
           CASE WHEN last_op = 'U' THEN 'live'
                WHEN last_ts < TIMESTAMP '{_CUTOFF}' THEN 'tombstone_gc'
                ELSE 'tombstone_retained' END AS state,
           last_ts, n_versions, n_deletes
    FROM latest ORDER BY user_id
    """,
)
def cdc_tombstone_gc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone garbage-collection audit over a keyed changelog (the
    compaction planner of every LSM / log-compacted store: Kafka compact,
    Delta/Iceberg VACUUM, Cassandra gc_grace). The events stream is read
    as a CDC log — ``error`` rows are deletes, everything else an upsert;
    version order is (ts, event_id), the same total order the other cdc_*
    queries use. Each key classifies as: ``live`` (latest op is an
    upsert), ``tombstone_gc`` (latest op is a delete older than the
    retention watermark — safe to purge, no snapshot reader can need it),
    or ``tombstone_retained`` (deleted after the watermark — must survive
    compaction so late readers observe the delete).

    Scale: one user-keyed exchange; the classifying window carries O(1)
    state per key (top-1 row + two running counts share the same sort).
    The physical GC this audit drives is a partition-local filter at
    rewrite time — no shuffle; the watermark is the slowest reader's
    snapshot timestamp, a broadcast scalar.
    """
    ev = load_table(spark, sf_dir, "events")
    log = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )
    wk = Window.partitionBy("user_id")
    wo = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = (
        log.select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("op").alias("last_op"),
            F.count("*").over(wk).cast("long").alias("n_versions"),
            F.count_if(F.col("op") == "D").over(wk).cast("long").alias("n_deletes"),
            F.row_number().over(wo).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    cut = F.lit(_CUTOFF).cast("timestamp")
    return latest.select(
        "user_id",
        F.when(F.col("last_op") == "U", "live")
        .when(F.col("last_ts") < cut, "tombstone_gc")
        .otherwise("tombstone_retained")
        .alias("state"),
        "last_ts",
        "n_versions",
        "n_deletes",
    ).orderBy("user_id")

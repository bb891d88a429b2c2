"""As-of and range joins — operators Spark lacks natively (the reference
lacks ALL joins, SURVEY.md §2.7; these are the time-series extension ops).

As-of join, Spark-first: the union + keyed-window formulation —
  1. tag right rows (orders) and left rows (events), union on (key, time);
  2. one window per key ordered by (time, right-first): ``last(payload,
     ignorenulls)`` carries the latest right row forward;
  3. keep left rows.
One shuffle on the key + one sort — the same cost profile as a sort-merge
join, scales to any key cardinality, no per-group pandas (merge_asof would
ship every group through Python). DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wordcount_spark.registry import register
from wordcount_spark.sources.readers import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """For each left row: columns of the latest right row with
    right_time <= left_time on the same key (inclusive)."""
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__is_right"),
        *[F.col(c) for c in payload_cols],
    )
    l = left.select(
        "*",
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__is_right"),
    )
    # align schemas: left rows carry NULL payloads, right rows NULL left-cols
    r_types = dict(r.dtypes)
    l_types = dict(l.dtypes)
    for c in payload_cols:
        l = l.withColumn(c, F.lit(None).cast(r_types[c]))
    left_only = [c for c in l.columns if c not in r.columns]
    r_full = r.select(
        "*", *[F.lit(None).cast(l_types[c]).alias(c) for c in left_only]
    )
    unioned = r_full.select(l.columns).unionByName(l)
    # right rows sort BEFORE left rows at equal time (inclusive <=)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.desc("__is_right"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[c for c in l.columns if c not in ("__k", "__t", "__is_right", *payload_cols)],
        "__is_right",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload_cols],
    )
    return carried.filter(F.col("__is_right") == 0).drop("__is_right")


@register(
    "asof_join_last_order",
    """
    WITH r AS (
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts, r.o_orderkey AS last_orderkey,
           r.o_orderdate AS last_orderdate
    FROM events e ASOF JOIN r
      ON e.user_id = r.o_custkey AND r.o_orderdate <= e.ts
    ORDER BY e.event_id
    """,
)
def asof_join_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event: the user's most recent order as of the event time.
    Right side pre-deduped to one row per (key, time) — max orderkey — so
    the as-of match is deterministic in both engines.

    Scale: union+window as-of — both inputs share ONE user-keyed
    exchange and a per-partition time sort; the last_value carry-forward
    is O(1) state per partition, never a range join.
    """
    ev = load_table(spark, sf_dir, "events")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    joined = asof_join(
        ev.select("event_id", "user_id", "ts"),
        orders.withColumnRenamed("o_custkey", "user_id"),
        key="user_id",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"],
    )
    return (
        joined.filter(F.col("o_orderkey").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("o_orderkey").alias("last_orderkey"),
            F.col("o_orderdate").alias("last_orderdate"),
        )
        .orderBy("event_id")
    )


@register(
    "range_join_value_bands",
    """
    WITH bands(band_id, lo, hi) AS (
      SELECT * FROM (VALUES (0, 0.0, 25.0), (1, 25.0, 50.0),
                            (2, 50.0, 75.0), (3, 75.0, 1e18))
    )
    SELECT b.band_id, CAST(b.lo AS DOUBLE) AS lo, count(*) AS n,
           CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band_id, b.lo ORDER BY b.band_id
    """,
)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join, bucketized: the inequality join is rewritten as an
    equi-join on a computed band index. A naive theta-join plans as a
    nested-loop (O(n·bands) comparisons broadcast-side); the bucketized form
    is a plain hash join/aggregation that scales linearly — for non-aligned
    band edges, bucketize to the gcd of the edges then filter."""
    ev = load_table(spark, sf_dir, "events")
    bands = [(0, 0.0, 25.0), (1, 25.0, 50.0), (2, 50.0, 75.0), (3, 75.0, 1e18)]
    band_df = F.broadcast(
        ev.sparkSession.createDataFrame(bands, ["band_id", "lo", "hi"])
    )
    banded = ev.withColumn(
        "band_id", F.least(F.floor(F.col("value") / 25).cast("int"), F.lit(3))
    )
    return (
        banded.join(band_df, "band_id")
        .groupBy("band_id", "lo")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .orderBy("band_id")
    )


@register(
    "join_interval_overlap",
    """
    WITH spans AS (
      SELECT o_custkey, o_orderkey, o_orderdate AS s,
             o_orderdate + INTERVAL 30 DAY AS e
      FROM orders
    )
    SELECT a.o_custkey AS custkey, a.o_orderkey AS k1, b.o_orderkey AS k2,
           CAST(date_diff('day', greatest(a.s, b.s), least(a.e, b.e))
                AS BIGINT) AS overlap_days
    FROM spans a JOIN spans b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
     AND a.s <= b.e AND b.s <= a.e
    ORDER BY overlap_days DESC, custkey, k1, k2 LIMIT 50
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: each order opens a 30-day fulfilment
    window; find same-customer orders whose windows overlap (the
    concurrent-obligation / temporal-conflict query class — validity
    intervals, sessions, reservations). Spark has no native interval
    join, so the Spark-first form is an EQUI-join on the entity key with
    the two range predicates left as residual filters — the equi key is
    what makes it scale; the top-50 is tie-broken by (custkey, k1, k2)
    so the LIMIT boundary is deterministic.

    Scale: one shuffle of each side on o_custkey (sort-merge join);
    within-key fan-out is bounded by orders-per-customer (~10 in a
    TPC-H-shaped corpus), so the quadratic step is per-key-constant ×
    rows, linear overall. Without an equi key this would be a range-only
    join → interval binning (join on overlapping 30-day epoch buckets,
    dedupe) is the fallback; here the key exists, so no binning needed.
    overlap_days is an integer date diff — no float, no DATE output."""
    o = load_table(spark, sf_dir, "orders")
    spans = o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("e"),
    )
    a, b = spans.alias("a"), spans.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e")),
        )
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("k1"),
            F.col("b.o_orderkey").alias("k2"),
            F.datediff(
                F.least(F.col("a.e"), F.col("b.e")),
                F.greatest(F.col("a.s"), F.col("b.s")),
            )
            .cast("long")
            .alias("overlap_days"),
        )
        .orderBy(F.desc("overlap_days"), "custkey", "k1", "k2")
        .limit(50)
    )


@register(
    "asof_join_tolerance",
    """
    WITH r AS (
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    ),
    m AS (
      SELECT e.event_id, e.user_id, e.ts, r.o_orderkey, r.o_orderdate
      FROM events e ASOF LEFT JOIN r
        ON e.user_id = r.o_custkey AND r.o_orderdate <= e.ts
    )
    SELECT event_id, user_id, ts,
           CASE WHEN o_orderdate >= CAST(ts AS DATE) - INTERVAL 30 DAY
                THEN o_orderkey ELSE -1 END AS last_orderkey_30d,
           CASE WHEN o_orderdate >= CAST(ts AS DATE) - INTERVAL 30 DAY
                THEN CAST(date_diff('day', o_orderdate, CAST(ts AS DATE)) AS BIGINT)
                ELSE -1 END AS age_days
    FROM m ORDER BY event_id
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance (pandas ``merge_asof(...,
    tolerance=30d)`` semantics — the market-data form: a quote older than
    the tolerance must NOT fill the trade). Same union+keyed-window as-of
    as `asof_join_last_order`, then matches older than 30 days are
    nulled out — expressed as a sentinel -1 on BOTH engines so the output
    stays non-nullable BIGINT (nullable ints coerce to float64 under
    pandas and hash as '123.0'). Left rows always survive: tolerance
    rejection loses the match, never the event.

    Scale: identical to the plain as-of — one shared user-keyed exchange
    + per-partition time sort, O(1) carry-forward state; the tolerance is
    a post-carry filter, costing nothing. No range join exists anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    joined = asof_join(
        ev.select("event_id", "user_id", "ts"),
        orders.withColumnRenamed("o_custkey", "user_id"),
        key="user_id",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"],
    )
    fresh = F.col("o_orderdate") >= F.date_sub(F.to_date("ts"), 30)
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.when(fresh, F.col("o_orderkey")).otherwise(F.lit(-1))
        .cast("long")
        .alias("last_orderkey_30d"),
        F.when(fresh, F.datediff(F.to_date("ts"), F.col("o_orderdate")))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("age_days"),
    ).orderBy("event_id")


@register(
    "asof_join_nearest",
    """
    WITH r AS (
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    ),
    back AS (
      SELECT e.event_id, e.user_id, e.ts,
             r.o_orderkey AS bk, r.o_orderdate AS bd
      FROM events e ASOF LEFT JOIN r
        ON e.user_id = r.o_custkey AND r.o_orderdate <= e.ts
    ),
    fwd AS (
      SELECT e.event_id, r.o_orderkey AS fk, r.o_orderdate AS fd
      FROM events e ASOF LEFT JOIN r
        ON e.user_id = r.o_custkey AND r.o_orderdate > e.ts
    )
    SELECT b.event_id, b.user_id, b.ts,
           CASE
             WHEN b.bk IS NULL AND f.fk IS NULL THEN -1
             WHEN f.fk IS NULL THEN b.bk
             WHEN b.bk IS NULL THEN f.fk
             WHEN date_diff('day', b.bd, CAST(b.ts AS DATE))
                  <= date_diff('day', CAST(b.ts AS DATE), f.fd) THEN b.bk
             ELSE f.fk
           END AS nearest_orderkey,
           CASE
             WHEN b.bk IS NULL AND f.fk IS NULL THEN 0
             WHEN f.fk IS NULL
               THEN -CAST(date_diff('day', b.bd, CAST(b.ts AS DATE)) AS BIGINT)
             WHEN b.bk IS NULL
               THEN CAST(date_diff('day', CAST(b.ts AS DATE), f.fd) AS BIGINT)
             WHEN date_diff('day', b.bd, CAST(b.ts AS DATE))
                  <= date_diff('day', CAST(b.ts AS DATE), f.fd)
               THEN -CAST(date_diff('day', b.bd, CAST(b.ts AS DATE)) AS BIGINT)
             ELSE CAST(date_diff('day', CAST(b.ts AS DATE), f.fd) AS BIGINT)
           END AS gap_days
    FROM back b JOIN fwd f USING (event_id)
    ORDER BY b.event_id
    """,
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (pandas ``merge_asof(direction='nearest')``):
    each event matches its user's CLOSEST order in either direction,
    ties to the earlier (backward) side; gap_days is signed (negative =
    order precedes the event). Spark-first: the forward pass is the
    backward as-of ON NEGATED EPOCH TIME — one reusable operator gives
    both directions, each a union + keyed-window carry-forward, so the
    whole query is two user-keyed exchanges and zero range joins.
    Sentinels (-1 / 0) keep outputs non-nullable BIGINT.

    Scale: two as-of passes over the same keyed layout (a production
    implementation fuses them into one window with both a running-last
    and a reversed running-first); no per-group pandas, no interval
    explosion, state O(1) per partition.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .withColumnRenamed("o_custkey", "user_id")
    )
    back = asof_join(
        ev,
        orders,
        key="user_id",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"],
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderkey").alias("bk"),
        F.col("o_orderdate").alias("bd"),
    )
    # forward = backward in negated time; "order strictly after the
    # event" (oracle: o_orderdate > e.ts) becomes -epoch(order) <
    # -epoch(ts), i.e. the backward helper's inclusive <= on negated
    # keys would also admit equality — shift the left key by -1 to make
    # the comparison strict (timestamps are microsecond-grained; order
    # dates are day-grained, so 1µs never crosses a real boundary)
    ev_neg = ev.select(
        "event_id",
        "user_id",
        (-(F.unix_micros("ts")) - 1).alias("tneg"),
    )
    ord_neg = orders.select(
        "user_id",
        (-(F.unix_micros(F.col("o_orderdate").cast("timestamp")))).alias("oneg"),
        "o_orderkey",
        "o_orderdate",
    )
    fwd = asof_join(
        ev_neg,
        ord_neg,
        key="user_id",
        left_time="tneg",
        right_time="oneg",
        payload_cols=["o_orderkey", "o_orderdate"],
    ).select(
        "event_id",
        F.col("o_orderkey").alias("fk"),
        F.col("o_orderdate").alias("fd"),
    )
    j = back.join(fwd, "event_id")
    bgap = F.datediff(F.to_date("ts"), F.col("bd"))
    fgap = F.datediff(F.col("fd"), F.to_date("ts"))
    nearest = (
        F.when(F.col("bk").isNull() & F.col("fk").isNull(), F.lit(-1))
        .when(F.col("fk").isNull(), F.col("bk"))
        .when(F.col("bk").isNull(), F.col("fk"))
        .when(bgap <= fgap, F.col("bk"))
        .otherwise(F.col("fk"))
    )
    gap = (
        F.when(F.col("bk").isNull() & F.col("fk").isNull(), F.lit(0))
        .when(F.col("fk").isNull(), -bgap)
        .when(F.col("bk").isNull(), fgap)
        .when(bgap <= fgap, -bgap)
        .otherwise(fgap)
    )
    return j.select(
        "event_id",
        "user_id",
        "ts",
        nearest.cast("long").alias("nearest_orderkey"),
        gap.cast("long").alias("gap_days"),
    ).orderBy("event_id")

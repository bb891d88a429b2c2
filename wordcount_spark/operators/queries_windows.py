"""Event-time windows (batch first; the same aggregations re-run as
Structured Streaming in wordcount_spark.streaming — SURVEY.md §7 M5).

The reference has no streaming surface at all (SURVEY.md §2.7); this is the
extension surface. Batch ``window()`` / ``session_window`` compute identical
results to the streaming versions, and ARE oracle-checkable — DuckDB
``time_bucket`` / lag-based sessionization are the independent spellings.

Alignment notes: Spark's tumbling/sliding windows are epoch-aligned;
DuckDB ``time_bucket`` uses a 2000-01-03 origin — a whole number of days
from the epoch, so every divisor-of-24h interval aligns identically.
Session semantics: an event exactly ``gap`` after the previous one starts a
NEW session (Spark's window end is exclusive) → oracle uses ``>= gap``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wordcount_spark.operators.relational import dbl, dec
from wordcount_spark.registry import register
from wordcount_spark.sources.readers import load_table


@register(
    "window_tumbling",
    """
    SELECT time_bucket(INTERVAL '1 day', ts) AS ws,
           time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS we,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2, 3 ORDER BY ws, event_type
    """,
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day windows per event type.

    At scale this is a plain hash aggregation on (bucket, type) — no
    buffering: the bucket is a scalar function of ts, so partial aggs
    combine map-side exactly like any groupBy.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum(dec("value")).cast("double").alias("total_value"))
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("ws", "event_type")
    )


@register(
    "window_sliding",
    """
    WITH w AS (
      SELECT event_type,
             time_bucket(INTERVAL '12 hours', ts) - k.k * INTERVAL '12 hours' AS ws
      FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k
    )
    SELECT ws, ws + INTERVAL '24 hours' AS we, event_type, count(*) AS n
    FROM w GROUP BY ws, we, event_type ORDER BY ws, event_type
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 24h windows every 12h: each event lands in size/slide = 2
    windows (Spark expands exactly that; the oracle unnests k=0,1).

    Scale: map-side row expansion by the fixed size/slide factor (2x)
    before one windowed aggregation exchange — replication factor is a
    constant chosen in the query, not data-dependent.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day", "12 hours").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "event_type",
            "n",
        )
        .orderBy("ws", "event_type")
    )


@register(
    "window_session",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           count(*) AS n_events
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30 min gap) per user via native ``session_window``.

    Spark merges events whose gap < 30 min; window end = last event + gap
    (exclusive). The oracle derives the same sessions with lag + running
    sum — the portable SQL spelling of sessionization.

    Scale: one user-keyed exchange; session merging is a per-partition
    streaming pass. Same shuffle the gap-sessionizer and funnel reuse.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "window_user_activity",
    """
    SELECT user_id,
           count(*) AS n_events,
           count(DISTINCT event_type) AS n_types,
           min(ts) AS first_seen,
           max(ts) AS last_seen,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def window_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity profile (the stateful-aggregation shape that
    becomes arbitrary-state streaming in the streaming module).

    Mixing count(DISTINCT) with plain aggs would plan an Expand — two
    copies of the event log into the shuffle. Pre-aggregating at
    (user, event_type) grain gives the same profile with one copy: every
    outer agg is a composition of the inner ones (count distinct = row
    count, min of mins, sum of counts)."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("cnt"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )
    return (
        per_type.groupBy("user_id")
        .agg(
            F.sum("cnt").alias("n_events"),
            F.count("*").alias("n_types"),
            F.min("min_ts").alias("first_seen"),
            F.max("max_ts").alias("last_seen"),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("cnt")).otherwise(
                    F.lit(0)
                )
            ).alias("n_purchases"),
        )
        .orderBy("user_id")
    )


@register(
    "events_funnel",
    """
    WITH u AS (SELECT DISTINCT user_id FROM events),
    v AS (SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
          JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
          JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT u.user_id,
           CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
                WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS funnel_depth,
           v.t1 AS t_view, c.t2 AS t_click, p.t3 AS t_purchase
    FROM u
    LEFT JOIN v ON u.user_id = v.user_id
    LEFT JOIN c ON u.user_id = c.user_id
    LEFT JOIN p ON u.user_id = p.user_id
    ORDER BY u.user_id
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (view → click → purchase, strictly later
    timestamps per stage) — the conversion-analysis shape.

    The textbook form is one self-join per stage (the oracle runs exactly
    that); at 100 TB each stage would re-shuffle the event log. Here the
    log shuffles ONCE on user_id; each user's events are sorted locally
    and a single JVM-side `aggregate` fold walks them to find the staged
    minima. State per user is three timestamps, not the event list — and
    the fold runs inside codegen, no Python. Skewed users cost O(their
    events); the collect_list ceiling is per-user event count, the same
    bound the self-join plans pay in the join fan-out.
    """
    ev = load_table(spark, sf_dir, "events")
    null_ts = F.lit(None).cast("timestamp")

    def step(acc, e):
        t1, t2, t3 = acc["t1"], acc["t2"], acc["t3"]
        ty, ts = e["event_type"], e["ts"]
        return F.struct(
            F.when(t1.isNull() & (ty == "view"), ts).otherwise(t1).alias("t1"),
            F.when(
                t1.isNotNull() & t2.isNull() & (ty == "click") & (ts > t1), ts
            )
            .otherwise(t2)
            .alias("t2"),
            F.when(
                t2.isNotNull() & t3.isNull() & (ty == "purchase") & (ts > t2),
                ts,
            )
            .otherwise(t3)
            .alias("t3"),
        )

    folded = (
        ev.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_type"))
            ).alias("evs")
        )
        .select(
            "user_id",
            F.aggregate(
                "evs",
                F.struct(
                    null_ts.alias("t1"), null_ts.alias("t2"), null_ts.alias("t3")
                ),
                step,
            ).alias("f"),
        )
    )
    return folded.select(
        "user_id",
        F.when(F.col("f.t3").isNotNull(), 3)
        .when(F.col("f.t2").isNotNull(), 2)
        .when(F.col("f.t1").isNotNull(), 1)
        .otherwise(0)
        .alias("funnel_depth"),
        F.col("f.t1").alias("t_view"),
        F.col("f.t2").alias("t_click"),
        F.col("f.t3").alias("t_purchase"),
    ).orderBy("user_id")


@register(
    "events_path_mining",
    """
    WITH s AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM events GROUP BY user_id, day)
    SELECT path, count(*) AS n_sessions
    FROM s GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 25
    """,
)
def events_path_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey paths: each user-day's ordered event-type sequence
    collapsed to a 'view>click>…' path, counted across sessions (the
    product-analytics staple). Ordering inside collect_list is undefined
    under shuffles, so the sort happens AFTER collection — array_sort over
    (ts, event_id, event_type) structs, a deterministic total order that
    also breaks timestamp ties. Per-session rows are user-day grain (one
    shuffle), the path histogram is tiny; LIMIT with a full tiebreak
    (n DESC, path) keeps the cutoff engine-stable. At 100 TB the only
    heavy exchange is the user-day grouping — already the minimum for any
    sessionization."""
    ev = load_table(spark, sf_dir, "events")
    per_session = (
        ev.select(
            "user_id",
            F.col("ts").cast("date").alias("day"),
            F.struct("ts", "event_id", "event_type").alias("e"),
        )
        .groupBy("user_id", "day")
        .agg(F.array_sort(F.collect_list("e")).alias("seq"))
        .select(
            F.array_join(
                F.transform("seq", lambda x: x["event_type"]), ">"
            ).alias("path")
        )
    )
    return (
        per_session.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(25)
    )


@register(
    "events_retention_cohorts",
    """
    WITH f AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id),
    a AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
    SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day,
           date_diff('day', cohort_day, day) AS day_offset,
           count(*) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY 1, day_offset
    ORDER BY cohort_day, day_offset
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active day, counted
    on each later active day (growth analytics' standard triangle). Three
    aggs, all on user/user-day grain — the first two share the user_id
    partitioning, and the cohort frame (O(users), so it GROWS with the
    data: no broadcast hint — the join-back is co-partitioned with the
    distinct anyway, and the engine broadcasts it only while it's actually
    small), so the fact table shuffles once. The final matrix is
    days × offsets — trivially small at any scale."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(first, "user_id")
        # output DATEs as TIMESTAMP: DuckDB DATE coerces to datetime64
        # ("… 00:00:00") while Spark DATE stays datetime.date ("2024-01-01")
        # under the driver's pandas hashing — TIMESTAMP agrees on both sides
        .groupBy(
            F.col("cohort_day").cast("timestamp").alias("cohort_day"),
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "events_daily_anomaly",
    """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY event_type, day)
    SELECT event_type, CAST(day AS TIMESTAMP) AS day, n,
           round((n - avg(n) OVER w) / stddev_samp(n) OVER w, 4) AS z
    FROM d
    WINDOW w AS (PARTITION BY event_type)
    ORDER BY event_type, day
    """,
)
def events_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly z-scores: each (event_type, day) count standardized
    against that type's own daily distribution — the monitoring query every
    ingestion pipeline runs. The window aggregates run over the ALREADY
    aggregated daily frame (types × days rows, trivially small), never the
    raw events; the one heavy exchange is the daily count's. round(4)
    absorbs float-sum-order noise in avg/stddev between engines."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("event_type")
    return (
        daily.select(
            "event_type",
            F.col("day").cast("timestamp").alias("day"),
            "n",
            F.round(
                (F.col("n") - F.avg("n").over(w)) / F.stddev_samp("n").over(w), 4
            ).alias("z"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "events_markov_transitions",
    """
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events),
    pairs AS (
      SELECT from_type, to_type, count(*) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type)
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
    FROM pairs
    ORDER BY from_type, to_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event types: lead()
    per user over (ts, event_id) — a deterministic total order — then pair
    counts row-normalized into probabilities. The normalizing sum runs as
    a window over the PAIR-COUNT frame (|types|² rows), never the event
    stream; the single heavy exchange is the per-user window sort, the
    minimum for any sequence feature. p is one exact-int division per row
    — bit-identical across engines, no rounding needed."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    pairs = seq.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    wt = Window.partitionBy("from_type")
    return (
        pairs.select(
            "from_type",
            "to_type",
            "n",
            (F.col("n").cast("double") / F.sum("n").over(wt).cast("double")).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


@register(
    "window_time_range_frame",
    """
    SELECT event_id, user_id,
           count(*) OVER w AS n_trailing_1h,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_trailing_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour RANGE frame per user: at every event, how many
    events / how much value that user produced in the previous hour
    (inclusive). RANGE (value-based) framing — unlike ROWS — includes all
    timestamp peers, so the result is deterministic under ties with no
    tiebreak column needed. The frame bound is numeric microseconds on
    both engines; the framed sum goes through DECIMAL because a sliding
    frame re-adds doubles in engine-specific order.

    Scale: one user-keyed exchange + per-partition time sort; the RANGE
    frame is evaluated with a sliding two-pointer over each partition
    (state = the in-frame buffer, bounded by events-per-hour-per-user).
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_trailing_1h"),
        F.sum(dec("value")).over(w).cast("double").alias("sum_trailing_1h"),
    ).orderBy("event_id")


@register(
    "window_cumulative_distinct",
    """
    WITH firsts AS (
      SELECT user_id, min(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS first_day
      FROM events GROUP BY user_id
    ),
    dau AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             count(DISTINCT user_id) AS dau
      FROM events GROUP BY 1
    ),
    news AS (
      SELECT first_day AS day, count(*) AS new_users FROM firsts GROUP BY 1
    )
    SELECT d.day, d.dau,
           CAST(sum(coalesce(n.new_users, 0)) OVER (ORDER BY d.day) AS BIGINT)
             AS cum_unique_users
    FROM dau d LEFT JOIN news n USING (day)
    ORDER BY day
    """,
)
def window_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative COUNT(DISTINCT) over time — daily active users plus the
    running total of DISTINCT users ever seen, the growth-dashboard
    staple that naive SQL can only state as an unbounded distinct window
    (quadratic state). The scalable identity: a user contributes to the
    cumulative curve exactly once, on their FIRST day — so cum_unique(d)
    = Σ_{d'<=d} new_users(d'), where new_users comes from a groupBy(user)
    min. No distinct window, no re-counting.

    Scale: one user-keyed aggregate (first day per user), one day-keyed
    DISTINCT aggregate (DAU — Spark plans it as the two-phase Expand),
    then a running sum over the O(days) frame (the only global window;
    days is calendar-bounded, not data-bounded)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("day"))
    news = firsts.groupBy("day").agg(F.count("*").alias("new_users"))
    dau = ev.groupBy(day.alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    from pyspark.sql import Window

    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        dau.join(news, "day", "left")
        .select(
            "day",
            "dau",
            F.sum(F.coalesce("new_users", F.lit(0))).over(w).alias(
                "cum_unique_users"
            ),
        )
        .orderBy("day")
    )


@register(
    "window_yoy_growth",
    """
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             count(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT month, revenue, n_orders,
           revenue / lag(revenue, 12) OVER (ORDER BY month) AS yoy_ratio
    FROM monthly
    ORDER BY month
    """,
)
def window_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth: monthly revenue joined to itself 12 months
    back via ``lag(12)`` — the BI comparison every revenue dashboard
    computes. Months with no prior-year counterpart emit NULL. The ratio
    is ONE double division of two exact-decimal-summed values, so it is
    engine-exact with no rounding (repo single-op rule).

    Scale: the month aggregate is map-side combinable and collapses the
    fact table to an O(months) frame; the lag window runs over that
    calendar-bounded frame only (the one global window, allowlisted)."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        dbl(F.sum(dec("o_totalprice"))).alias("revenue"),
        F.count("*").alias("n_orders"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("month")
    return (
        monthly.select(
            "month",
            "revenue",
            "n_orders",
            (F.col("revenue") / F.lag("revenue", 12).over(w)).alias("yoy_ratio"),
        )
        .orderBy("month")
    )


@register(
    "events_attribution_lasttouch",
    """
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type, value,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS src
      FROM events)
    SELECT coalesce(src, '(direct)') AS channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS DOUBLE)
             / 1000000.0 + 0.0 AS revenue
    FROM seq WHERE event_type = 'purchase'
    GROUP BY channel ORDER BY channel
    """,
)
def events_attribution_lasttouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each purchase is credited to the
    most recent NON-purchase event the same user emitted before it (the
    marketing-analytics staple; '(direct)' when a purchase is the user's
    first event). The attribution channel is a running last_value(...
    IGNORE NULLS) over a strictly-preceding row frame — (ts, event_id) is
    a deterministic total order, so the credited channel is unambiguous.
    Revenue follows the repo fixed-point rule: floor(value·1e6) micro-units
    summed as exact BIGINT, ONE identical float division at output
    (events_ewma_fixedpoint precedent) — no order-dependent double sum.

    Scale: one shuffle of events on user_id for the window sort (the
    minimum for any per-user sequence feature), then a map-side-combinable
    groupBy on O(|event types|) channels. State per row is O(1) — the
    carry is a single value, so the window never buffers the frame. At
    100 TB nothing changes: the per-user partition is the unit of work and
    users are plentiful; a single pathological user with billions of
    events would need the sessionized variant (split the frame per
    session) — documented fallback, not needed on event-scale data."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "event_type",
        "value",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        )
        .over(w)
        .alias("src"),
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("src", F.lit("(direct)")).alias("channel"))
        .agg(
            F.count("*").alias("n_purchases"),
            (
                F.sum(F.floor(F.col("value") * 1000000.0)).cast("double")
                / 1000000.0
                + F.lit(0.0)
            ).alias("revenue"),
        )
        .orderBy("channel")
    )


@register(
    "events_anomaly_robust_mad",
    """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY event_type, day),
    m AS (SELECT event_type, median(n) AS med FROM d GROUP BY event_type),
    a AS (
      SELECT d.event_type, d.day, d.n, m.med, abs(d.n - m.med) AS dev
      FROM d JOIN m USING (event_type)),
    md AS (SELECT event_type, median(dev) AS mad FROM a GROUP BY event_type)
    SELECT a.event_type, CAST(a.day AS TIMESTAMP) AS day, a.n,
           a.med + 0.0 AS med, md.mad + 0.0 AS mad,
           (a.n - a.med) / (1.4826 * nullif(md.mad, 0.0)) + 0.0 AS robust_z
    FROM a JOIN md USING (event_type)
    ORDER BY event_type, day
    """,
)
def events_anomaly_robust_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust volume anomalies: median/MAD z-scores per (event_type, day)
    — the outlier-resistant twin of `events_daily_anomaly` (mean/stddev
    are themselves dragged by the very spike being hunted; the 1.4826
    factor makes MAD consistent with sigma under normality). EXACT medians,
    not approx: they run over the already-aggregated daily frame
    (types × days rows), and integer-count medians interpolate to binary-
    exact .0/.5 midpoints (deviation medians to .25) on BOTH engines — so
    every input to robust_z is bit-identical and the one float expression
    needs no rounding (nullif guards the all-days-identical MAD=0 case).

    Scale: the single heavy exchange is the map-side-combinable daily
    count; medians + both join-backs touch only the O(types × days)
    aggregate, which the engine broadcasts while small and shuffles when
    it is not — no hints, no collect, no global window."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    med = daily.groupBy("event_type").agg(F.median("n").alias("med"))
    a = daily.join(med, "event_type").select(
        "event_type", "day", "n", "med",
        F.abs(F.col("n") - F.col("med")).alias("dev"),
    )
    mad = a.groupBy("event_type").agg(F.median("dev").alias("mad"))
    return (
        a.join(mad, "event_type")
        .select(
            "event_type",
            F.col("day").cast("timestamp").alias("day"),
            "n",
            (F.col("med") + F.lit(0.0)).alias("med"),
            (F.col("mad") + F.lit(0.0)).alias("mad"),
            (
                (F.col("n") - F.col("med"))
                / (F.lit(1.4826) * F.nullif("mad", F.lit(0.0)))
                + F.lit(0.0)
            ).alias("robust_z"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "events_user_streaks",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ),
    isl AS (
      SELECT user_id,
             date_diff('day', DATE '2024-01-01', d)
               - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
      FROM ud
    ),
    streaks AS (
      SELECT user_id, grp, count(*) AS len FROM isl GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(sum(len) AS BIGINT) AS active_days
    FROM streaks GROUP BY user_id ORDER BY user_id
    """,
)
def events_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-day activity streaks per user (the
    engagement metric behind every "7-day streak" feature, and the
    canonical interview-hard SQL shape). The island key is the classic
    identity — day-number minus row-number is CONSTANT exactly while
    days are consecutive — so streak detection needs no self-join and no
    iteration: one per-user window, one count per (user, anchor) island.

    Scale: dedup to (user, day) is the only raw-data pass; the window
    and both aggregations run per-user on O(active days) rows sharing
    ONE user-keyed exchange. Day arithmetic is all integer (epoch-day
    minus rank), so results are engine-exact; output carries no DATE
    columns.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = ud.select(
        "user_id",
        (
            F.datediff("d", F.lit("2024-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("grp"),
    )
    streaks = isl.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return (
        streaks.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_streaks"),
            F.max("len").cast("long").alias("longest_streak"),
            F.sum("len").cast("long").alias("active_days"),
        )
        .orderBy("user_id")
    )


@register(
    "events_ltv_cohort",
    """
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort
      FROM events GROUP BY user_id
    ),
    rev AS (
      SELECT e.user_id, f.cohort,
             date_diff('day', CAST(f.cohort AS DATE),
                       CAST(date_trunc('day', e.ts) AS DATE)) // 7 AS week_idx,
             CAST(e.value AS DECIMAL(18,2)) AS v
      FROM events e JOIN first_seen f USING (user_id)
      WHERE e.event_type = 'purchase'
    ),
    g AS (
      SELECT cohort, CAST(week_idx AS BIGINT) AS week_idx,
             count(DISTINCT user_id) AS buyers, sum(v) AS rev
      FROM rev GROUP BY cohort, week_idx
    )
    SELECT cohort, week_idx, CAST(buyers AS BIGINT) AS buyers,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(sum(rev) OVER (PARTITION BY cohort ORDER BY week_idx)
                AS DOUBLE) AS cum_revenue
    FROM g ORDER BY cohort, week_idx
    """,
)
def events_ltv_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: users cohorted by first-seen week,
    purchase revenue accumulated by weeks-since-cohort — the (cohort ×
    age) LTV triangle every growth team reads. Week index is integer
    floor(day-diff / 7) computed identically in both engines (never
    engine week-boundary counting); revenue sums are exact DECIMAL
    internally, cast DOUBLE only at output, and the cumulative sum runs
    over the O(cohorts × weeks) aggregate, partitioned by cohort.

    Scale: one user-keyed aggregation for first-seen, one join back to
    the purchase scan (user-keyed shuffle), one (cohort, week) aggregation
    — all map-side combinable; the window touches only the tiny final
    matrix.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort",
            F.floor(
                F.datediff(F.to_date(F.date_trunc("day", "ts")), F.to_date("cohort"))
                / 7
            )
            .cast("long")
            .alias("week_idx"),
            dec("value").alias("v"),
        )
    )
    g = rev.groupBy("cohort", "week_idx").agg(
        F.count_distinct("user_id").cast("long").alias("buyers"),
        F.sum("v").alias("rev"),
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("week_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return g.select(
        "cohort",
        "week_idx",
        "buyers",
        dbl("rev").alias("revenue"),
        F.sum("rev").over(w).cast("double").alias("cum_revenue"),
    ).orderBy("cohort", "week_idx")

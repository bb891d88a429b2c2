"""Analytic extras: exact percentile aggregates, distribution window
functions (ntile / percent_rank / cume_dist), explicit-frame window values
(first/last/nth), and a regexp scalar battery.

The reference's only rank-like artifact is its printed `[i]` output index
(SURVEY.md §2.4); everything here is extension surface with a DuckDB oracle.

Oracle-parity notes:
- Exact percentiles use linear interpolation in BOTH engines (Spark
  ``percentile`` ≡ DuckDB ``quantile_cont``); results are rounded because
  interpolation arithmetic on doubles can differ in the last ulp.
- Window order keys always end in a unique key (custkey/orderkey) so rank,
  frame, and ntile assignment are total-order deterministic.
- Regexes stay in the common Java-regex ∩ RE2 subset (plain char classes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wordcount_spark.operators.relational import dec
from wordcount_spark.registry import register
from wordcount_spark.sources.readers import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "agg_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (Spark ``percentile`` = interpolated
    continuous quantile, same definition as DuckDB ``quantile_cont``).

    Scale note: exact percentiles buffer each group's values — fine on a
    3-group key; for high-cardinality keys at 100 TB the right tool is
    ``percentile_approx`` (t-digest sketch, map-side combinable), exercised
    in agg_approx_sketches."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("p25"),
            F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("l_extendedprice", F.lit(0.75)), 4).alias("p75"),
            F.round(F.percentile("l_extendedprice", F.lit(0.95)), 4).alias("p95"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "window_ntile_percent",
    """
    SELECT c_custkey, c_nationkey,
           ntile(4) OVER w AS quartile,
           floor((percent_rank() OVER w) * 1000000.0 + 1e-6) / 1000000.0 + 0.0 AS pr,
           floor((cume_dist() OVER w) * 1000000.0 + 1e-6) / 1000000.0 + 0.0 AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    ORDER BY c_custkey
    """,
)
def window_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: quartile bucketing + relative rank
    per nation. Partitioned by nation (25-way parallel window sort), with
    c_custkey as the tiebreak so assignment is total-order deterministic.
    percent_rank/cume_dist are RATIOS of small integers, so round(…,6)
    hits exact .…5 ties that Spark and DuckDB break differently (caught
    at sf0.1) — ``stable_round`` truncates instead."""
    from wordcount_spark.operators.relational import stable_round

    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        stable_round(F.percent_rank().over(w), 6).alias("pr"),
        stable_round(F.cume_dist().over(w), 6).alias("cd"),
    ).orderBy("c_custkey")


@register(
    "window_value_frames",
    """
    SELECT o_orderkey, o_custkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price,
           count(*) OVER w AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_orderkey
    """,
)
def window_value_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-frame window values: each order sees its customer's first /
    last / second order price over the full-partition ROWS frame (the
    default frame would truncate last_value/nth_value at the current row)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.count("*").over(w).alias("n_orders"),
    ).orderBy("o_orderkey")


@register(
    "scalar_regexp_funcs",
    """
    SELECT doc_id,
           regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
           length(regexp_replace(text, '[aeiou]', '', 'g')) AS novowel_len,
           length(regexp_extract_all(text, '[0-9]+')) AS n_numbers,
           CAST(regexp_matches(text, '[.!?]$') AS INT) AS ends_sentence
    FROM documents ORDER BY doc_id
    """,
)
def scalar_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalar battery over documents: extract / global replace /
    match count / anchored test. All JVM built-ins (codegen'd) — regexes
    kept in the Java∩RE2 common subset so both engines agree."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([A-Za-z]+)", 1).alias("first_word"),
        F.length(F.regexp_replace("text", r"[aeiou]", "")).alias("novowel_len"),
        F.regexp_count("text", F.lit(r"[0-9]+")).alias("n_numbers"),
        F.col("text").rlike(r"[.!?]$").cast("int").alias("ends_sentence"),
    ).orderBy("doc_id")


_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "profile_lineitem",
    """
    SELECT 'l_discount' AS column_name,
           count(*) - count(l_discount) AS n_nulls,
           count(DISTINCT l_discount) AS n_distinct,
           CAST(min(l_discount) AS DOUBLE) AS min_val,
           CAST(max(l_discount) AS DOUBLE) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', count(*) - count(l_extendedprice),
           count(DISTINCT l_extendedprice),
           CAST(min(l_extendedprice) AS DOUBLE), CAST(max(l_extendedprice) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'l_quantity', count(*) - count(l_quantity), count(DISTINCT l_quantity),
           CAST(min(l_quantity) AS DOUBLE), CAST(max(l_quantity) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', count(*) - count(l_tax), count(DISTINCT l_tax),
           CAST(min(l_tax) AS DOUBLE), CAST(max(l_tax) AS DOUBLE)
    FROM lineitem
    ORDER BY column_name
    """,
)
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling — per-column null count, exact NDV, min/max — the
    stats a catalog feeds the optimizer (and a dirty-data triage step for
    ingest pipelines).

    One pass over the fact table: unpivot to (column, value) rows, then
    TWO-level aggregation — (column, value) partial counts first, column
    rollup second. The naive per-column count(DISTINCT)s would either scan
    the table once per column (the oracle's UNION ALL does exactly that —
    correctness only) or plan one Expand copy per distinct agg; this plans
    a single scan with zero Expand and map-side partials throughout.
    """
    li = _t(spark, sf_dir, "lineitem")
    stack_expr = "stack({n}, {args}) AS (column_name, val)".format(
        n=len(_PROFILE_COLS),
        args=", ".join(
            f"'{c}', CAST({c} AS DOUBLE)" for c in _PROFILE_COLS
        ),
    )
    pairs = li.selectExpr(stack_expr)
    per_value = pairs.groupBy("column_name", "val").agg(
        F.count("*").alias("c")
    )
    return (
        per_value.groupBy("column_name")
        .agg(
            F.sum(F.when(F.col("val").isNull(), F.col("c")).otherwise(0)).alias(
                "n_nulls"
            ),
            F.count(F.when(F.col("val").isNotNull(), 1)).alias("n_distinct"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
        .orderBy("column_name")
    )


@register(
    "agg_median_twopass",
    """
    SELECT CAST(v AS DOUBLE) AS median_price FROM (
      SELECT o_totalprice AS v,
             row_number() OVER (ORDER BY o_totalprice) AS rn,
             count(*) OVER () AS n
      FROM orders
    ) WHERE rn = (n + 1) // 2
    """,
    eager=True,
)
def agg_median_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global median (lower median, the ((n+1) div 2)-th order
    statistic) by two-pass histogram pruning — the shape that finds an
    exact order statistic at 100 TB without ever globally sorting:
    pass 1 is a map-side-combinable bucket-count histogram (floor(price/
    1000): O(value-range/width) groups, independent of row count); the
    driver walks the O(buckets) counts to locate the bucket holding the
    k-th value and its in-bucket rank r; pass 2 touches ONLY that bucket
    and takes its r smallest (TakeOrdered — r rows through one task,
    bounded by bucket population; a pathological bucket re-splits with a
    finer width, same two passes). Bucketing is engine-internal — the
    oracle never buckets, it computes the same order statistic by direct
    window rank — so only the final value must agree. EAGER: the
    histogram walk collects O(buckets) rows while building the plan.

    Scale: full data crosses the wire as O(buckets) partials once; the
    global sort the naive median needs never happens. Same skeleton
    extends to any quantile set (one histogram, many (bucket, rank)
    probes).
    """
    orders = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    bucket = F.floor(price / 1000).cast("long")
    hist = sorted(
        orders.groupBy(bucket.alias("b")).agg(F.count("*").alias("c")).collect(),
        key=lambda r: r["b"],
    )
    n = sum(r["c"] for r in hist)
    k = (n + 1) // 2
    cum = 0
    for r in hist:
        if cum + r["c"] >= k:
            b_star, r_in = r["b"], k - cum
            break
        cum += r["c"]
    return (
        orders.filter(bucket == b_star)
        .orderBy("o_totalprice")
        .limit(r_in)
        .agg(F.max(price).cast("double").alias("median_price"))
    )


@register(
    "agg_quantiles_exact_multi",
    """
    WITH ranked AS (
      SELECT o_totalprice AS v,
             row_number() OVER (ORDER BY o_totalprice) AS rn,
             count(*) OVER () AS n
      FROM orders
    )
    SELECT pct.p AS pct, CAST(r.v AS DOUBLE) AS value
    FROM ranked r
    JOIN (VALUES (25), (50), (75), (90), (99)) AS pct(p)
      ON r.rn = greatest(1, (pct.p * r.n) // 100)
    ORDER BY pct
    """,
    eager=True,
)
def agg_quantiles_exact_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT quantile SET (p25/p50/p75/p90/p99, lower order statistics
    k=max(1, floor(p·n/100))) from ONE shared histogram — the multi-probe
    extension of `agg_median_twopass`: pass 1 builds a single map-side-
    combinable bucket histogram (floor(price/1000)); the driver walks the
    O(buckets) counts once per quantile to find (bucket, in-bucket rank);
    pass 2 is a union of per-quantile probes, each touching ONLY its
    bucket and taking its r smallest rows. All rank math is integer on
    both engines (greatest/floor-div), so the probed value is exact. The
    oracle finds the same order statistics by direct window rank, never
    bucketing — only the final values must agree. EAGER: the histogram
    walk collects O(buckets) rows at plan-build time.

    Scale: one full-data pass emits O(buckets) partials; k probes each
    scan one partition-pruned bucket (at 100 TB: histogram on a column
    with min/max zone maps prunes the probe scan to matching row groups).
    A quantile set of any size reuses the single histogram."""
    orders = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    bucket = F.floor(price / 1000).cast("long")
    hist = sorted(
        orders.groupBy(bucket.alias("b")).agg(F.count("*").alias("c")).collect(),
        key=lambda r: r["b"],
    )
    n = sum(r["c"] for r in hist)
    probes: list[DataFrame] = []
    for p in (25, 50, 75, 90, 99):
        k = max(1, (p * n) // 100)
        cum = 0
        for r in hist:
            if cum + r["c"] >= k:
                b_star, r_in = r["b"], k - cum
                break
            cum += r["c"]
        probes.append(
            orders.filter(bucket == b_star)
            .orderBy("o_totalprice")
            .limit(r_in)
            .agg(F.max(price).cast("double").alias("value"))
            .select(F.lit(p).alias("pct"), "value")
        )
    out = probes[0]
    for frame in probes[1:]:
        out = out.unionByName(frame)
    return out.orderBy("pct")


@register(
    "agg_mode_exact",
    """
    WITH counts AS (
      SELECT p_brand, p_type, count(*) AS n
      FROM part GROUP BY p_brand, p_type
    ),
    ranked AS (
      SELECT p_brand, p_type, n,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY n DESC, p_type) AS rn
      FROM counts
    )
    SELECT p_brand, p_type AS mode_type, n AS mode_count
    FROM ranked WHERE rn = 1
    ORDER BY p_brand
    """,
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group MODE (most frequent value, lexicographic-min
    tiebreak) — the categorical summary statistic SQL lacks a scalable
    built-in for. Two-phase: count per (group, value) — map-side
    combinable, the only pass over the data — then a per-group argmax
    window over the O(groups × distinct values) count table.

    Scale: the window runs over counts, never rows; a high-cardinality
    value domain inflates the count table, in which case the argmax
    flips to the max_by/struct-ordering form (`agg_argmax_join`) with
    identical semantics."""
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part")
    counts = part.groupBy("p_brand", "p_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("p_brand").orderBy(F.desc("n"), "p_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "p_brand",
            F.col("p_type").alias("mode_type"),
            F.col("n").alias("mode_count"),
        )
        .orderBy("p_brand")
    )


@register(
    "pareto_abc_parts",
    """
    WITH rev AS (
      SELECT l_partkey AS part_key,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS r
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT sum(r) AS total FROM rev),
    cum AS (
      SELECT part_key, r,
             sum(r) OVER (ORDER BY r DESC, part_key) AS cum_r, total
      FROM rev, tot
    ),
    classed AS (
      SELECT part_key, r,
             CASE WHEN cum_r * 10 <= total * 8 THEN 'A'
                  WHEN cum_r * 20 <= total * 19 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM cum
    )
    SELECT abc_class, count(*) AS n_parts,
           CAST(sum(r) AS DOUBLE) AS class_revenue
    FROM classed GROUP BY abc_class ORDER BY abc_class
    """,
    eager=True,
)
def pareto_abc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC inventory classification: parts sorted by revenue
    (exact DECIMAL, ties by key), running revenue share computed, class A
    = the prefix holding ≤80% of total revenue, B to 95%, C the tail —
    the assortment analysis every supply chain runs. The running sum over
    ALL parts is the classic single-task-window trap, so it is computed
    with the TWO-PHASE DISTRIBUTED PREFIX SUM (`llm_pack_sequences`
    pattern): range-repartition by (revenue DESC, key), per-partition
    prefix sums, and an O(partitions) collected offset map added back —
    no global window anywhere (EAGER: the offset collect runs at plan
    time). Class cuts compare exact decimals cross-multiplied by integer
    constants (cum·10 ≤ total·8), so no float ratio ever meets a
    threshold. The oracle states the same cuts over a plain window sum.

    Scale: sort-shuffle + per-partition window + O(P) driver state —
    the same cost as any global sort; at 100 TB the revenue table is
    O(parts), orders of magnitude below the fact table it summarizes."""
    from pyspark.sql import Window

    spark_ = spark
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("part_key")).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (1 - F.col("l_discount").cast("decimal(18,2)"))
        ).alias("r")
    )
    npart = spark_.sparkContext.defaultParallelism
    rp = (
        rev.repartitionByRange(npart, F.desc("r"), "part_key")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = {
        row["pid"]: row["tot"]
        for row in rp.groupBy("pid").agg(F.sum("r").alias("tot")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    total = acc  # exact Decimal — full-precision string literal below
    off_col = F.element_at(
        F.create_map(
            *[
                c
                for pid in sorted(offsets)
                for c in (F.lit(pid), F.lit(str(offsets[pid])).cast("decimal(38,2)"))
            ]
        ),
        F.col("pid"),
    )
    w = (
        Window.partitionBy("pid")
        .orderBy(F.desc("r"), "part_key")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = rp.withColumn("cum_r", off_col + F.sum("r").over(w))
    total_lit = F.lit(str(total)).cast("decimal(38,2)")
    classed = cum.select(
        "part_key",
        "r",
        F.when(F.col("cum_r") * 10 <= total_lit * 8, F.lit("A"))
        .when(F.col("cum_r") * 20 <= total_lit * 19, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("r").cast("double").alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


@register(
    "events_rfm_segments",
    """
    WITH gmax AS (SELECT CAST(max(ts) AS DATE) AS mx FROM events),
    per_user AS (
      SELECT user_id,
             date_diff('day', CAST(max(ts) AS DATE), (SELECT mx FROM gmax))
               AS rec_days,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS monetary_cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    scored AS (
      SELECT user_id, CAST(rec_days AS BIGINT) AS rec_days, freq, monetary_cents,
             CASE WHEN rec_days <= 1 THEN 5 WHEN rec_days <= 3 THEN 4
                  WHEN rec_days <= 5 THEN 3 WHEN rec_days <= 8 THEN 2
                  ELSE 1 END AS r_score,
             CASE WHEN freq >= 16 THEN 5 WHEN freq >= 14 THEN 4
                  WHEN freq >= 12 THEN 3 WHEN freq >= 10 THEN 2
                  ELSE 1 END AS f_score,
             CASE WHEN monetary_cents >= 85000 THEN 5
                  WHEN monetary_cents >= 65000 THEN 4
                  WHEN monetary_cents >= 55000 THEN 3
                  WHEN monetary_cents >= 45000 THEN 2
                  ELSE 1 END AS m_score
      FROM per_user
    )
    SELECT user_id, rec_days, freq, monetary_cents,
           CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm_code,
           CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                  THEN 'champion'
                WHEN f_score >= 4 THEN 'loyal'
                WHEN m_score >= 4 THEN 'big_spender'
                WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
                WHEN r_score <= 2 THEN 'hibernating'
                ELSE 'regular' END AS segment
    FROM scored ORDER BY user_id
    """,
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary — the classic
    customer-value grid) over purchase events. All three metrics are
    exact integers: recency in whole days from the corpus max timestamp,
    frequency a count, monetary in cents via DECIMAL — so scores, codes
    and segments carry zero float risk. Scores band against FIXED cuts
    (calibrated offline to this corpus's quintiles) rather than global
    ntile: a global ntile is a single-partition window at scale, while
    fixed-cut banding is a map-only expression; production recalibrates
    cuts from the `agg_quantiles_exact_multi` histogram two-pass (O(1)
    driver state), keeping scoring itself embarrassingly parallel.

    Scale: one filtered scan + one map-side-combinable user aggregation;
    the corpus-max timestamp is a 1-row aggregate joined broadcast-style;
    everything after is per-row CASE logic in codegen.
    """
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase")
    mx = ev.agg(F.to_date(F.max("ts")).alias("mx"))
    per_user = purch.groupBy("user_id").agg(
        F.to_date(F.max("ts")).alias("last_d"),
        F.count("*").cast("long").alias("freq"),
        (F.sum(dec("value")) * 100).cast("long").alias("monetary_cents"),
    )
    pu = per_user.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.datediff("mx", "last_d").cast("long").alias("rec_days"),
        "freq",
        "monetary_cents",
    )
    r_score = (
        F.when(F.col("rec_days") <= 1, 5)
        .when(F.col("rec_days") <= 3, 4)
        .when(F.col("rec_days") <= 5, 3)
        .when(F.col("rec_days") <= 8, 2)
        .otherwise(1)
    )
    f_score = (
        F.when(F.col("freq") >= 16, 5)
        .when(F.col("freq") >= 14, 4)
        .when(F.col("freq") >= 12, 3)
        .when(F.col("freq") >= 10, 2)
        .otherwise(1)
    )
    m_score = (
        F.when(F.col("monetary_cents") >= 85000, 5)
        .when(F.col("monetary_cents") >= 65000, 4)
        .when(F.col("monetary_cents") >= 55000, 3)
        .when(F.col("monetary_cents") >= 45000, 2)
        .otherwise(1)
    )
    scored = pu.select(
        "user_id",
        "rec_days",
        "freq",
        "monetary_cents",
        r_score.alias("r_score"),
        f_score.alias("f_score"),
        m_score.alias("m_score"),
    )
    return scored.select(
        "user_id",
        "rec_days",
        "freq",
        "monetary_cents",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"))
        .cast("long")
        .alias("rfm_code"),
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4) & (F.col("m_score") >= 4),
            "champion",
        )
        .when(F.col("f_score") >= 4, "loyal")
        .when(F.col("m_score") >= 4, "big_spender")
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 3), "at_risk")
        .when(F.col("r_score") <= 2, "hibernating")
        .otherwise("regular")
        .alias("segment"),
    ).orderBy("user_id")


@register(
    "events_ab_test_eval",
    """
    WITH assigned AS (
      SELECT user_id,
             CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 'treatment' END
               AS variant,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS purchases,
             CAST(coalesce(sum(CAST(value AS DECIMAL(18,2)))
                           FILTER (WHERE event_type = 'purchase'), 0) * 100
                  AS BIGINT) AS cents
      FROM events GROUP BY user_id
    )
    SELECT variant,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(*) FILTER (WHERE purchases > 0) AS BIGINT) AS n_converted,
           CAST(count(*) FILTER (WHERE purchases > 0) * 1000000 // count(*)
                AS BIGINT) AS conv_ppm,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           CAST(sum(cents) // count(*) AS BIGINT) AS rev_per_user_cents
    FROM assigned GROUP BY variant ORDER BY variant
    """,
)
def events_ab_test_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users deterministically bucketed into
    control/treatment (the id-parity assignment every experimentation
    platform's hash-bucketing reduces to), per-variant conversion and
    revenue-per-user — the decision table of an experiment review. Every
    metric is an exact integer: conversion in ppm and revenue-per-user in
    cents, both via integer floor division, so a significance gate
    downstream compares identical numbers on any engine.

    Scale: one map-side-combinable user aggregation (assignment is a
    projection), one O(2)-row variant aggregation. The user grain frame
    is the same shape CUPED/stratified variants consume — covariates
    would be extra columns on the first aggregate, never extra passes.
    """
    ev = load_table(spark, sf_dir, "events")
    assigned = ev.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "purchase").cast("long").alias("purchases"),
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", dec("value"))
            ),
            F.lit(0).cast("decimal(18,2)"),
        ).alias("dec_rev"),
    ).select(
        F.when(F.col("user_id") % 2 == 0, "control")
        .otherwise("treatment")
        .alias("variant"),
        "purchases",
        (F.col("dec_rev") * 100).cast("long").alias("cents"),
    )
    return (
        assigned.groupBy("variant")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.count_if(F.col("purchases") > 0).cast("long").alias("n_converted"),
            F.expr(
                "CAST(count_if(purchases > 0) * 1000000 div count(*) AS BIGINT)"
            ).alias("conv_ppm"),
            F.sum("cents").cast("long").alias("revenue_cents"),
            F.expr("CAST(sum(cents) div count(*) AS BIGINT)").alias(
                "rev_per_user_cents"
            ),
        )
        .orderBy("variant")
    )

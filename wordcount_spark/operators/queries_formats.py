"""Connector round-trip queries: prove the JDBC source/sink against the
embedded Derby engine that every Spark distribution bundles (it is the
Hive-metastore dependency — present on any cluster's classpath).

The query is EAGER (the callable materializes the Derby table before
returning the lazy read-back frame), so it is excluded from the static
plan audits like the streaming replays are; correctness still goes
through the full DuckDB oracle hash-compare, because a round-trip plus
filter is plain SQL on the original table.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wordcount_spark.registry import register
from wordcount_spark.sources.formats import read_jdbc, write_jdbc
from wordcount_spark.sources.readers import load_table

#: one Derby scratch dir per process, removed at exit (ADVICE r3: a fresh
#: mkdtemp per invocation leaked scratch DBs across registry-wide sweeps —
#: stability_check alone invokes every query twice). write_jdbc's default
#: overwrite mode makes reuse safe: each call replaces the table.
_DERBY_SCRATCH: str | None = None

#: same leak class for the file round-trips (r5): ONE scratch dir per
#: (process, purpose), removed at exit — every writer below uses
#: mode("overwrite"), so reuse is safe by construction.
_RT_SCRATCH: dict[str, str] = {}


def _rt_scratch(purpose: str) -> str:
    if purpose not in _RT_SCRATCH:
        import atexit
        import shutil

        d = tempfile.mkdtemp(prefix=f"wcspark_{purpose}_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        _RT_SCRATCH[purpose] = d
    return _RT_SCRATCH[purpose]


def _derby_scratch(spark: SparkSession) -> str:
    global _DERBY_SCRATCH
    if _DERBY_SCRATCH is None:
        import atexit
        import shutil

        _DERBY_SCRATCH = tempfile.mkdtemp(prefix="wcspark_derby_")
        atexit.register(shutil.rmtree, _DERBY_SCRATCH, ignore_errors=True)
        spark._jvm.java.lang.System.setProperty(  # keep derby.log out of CWD
            "derby.stream.error.file", f"{_DERBY_SCRATCH}/derby.log"
        )
    return _DERBY_SCRATCH


@register(
    "jdbc_roundtrip_nation",
    """
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation WHERE n_regionkey < 3
    ORDER BY n_nationkey
    """,
    eager=True,
)
def jdbc_roundtrip_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the nation dimension to embedded Derby over JDBC, read it
    back with a pushed-down predicate, and return the filtered rows — the
    oracle checks the round-trip preserved every value and the filter
    dropped exactly the right rows. The read-back filter is pushed into
    the remote WHERE clause (asserted in tests/test_formats.py).

    Scale: JDBC is the dimension-bootstrap path, not the fact path — a
    single-connection read caps at one node's ingest rate, so anything
    big uses partitionColumn range reads (tested) and lands in parquet
    immediately. The write side caps its connection count by coalescing
    to a handful of partitions.
    """
    tmp = _derby_scratch(spark)
    url = f"jdbc:derby:{tmp}/db;create=true"
    nation = load_table(spark, sf_dir, "nation")
    write_jdbc(nation.coalesce(2), url, "nation")
    return (
        read_jdbc(spark, url, "nation")
        .filter("n_regionkey < 3")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    )


@register(
    "parquet_partitioned_pruning_roundtrip",
    """
    SELECT CAST(user_id % 10 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id % 10 ORDER BY bucket
    """,
    eager=True,
)
def parquet_partitioned_pruning_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hive-layout round-trip with partition pruning: events written
    partitioned by event_type (the layout every lakehouse table uses for
    its coarse filter column), read back with a partition-key predicate
    — the scan touches ONLY the matching directory (pruning asserted in
    tests/test_formats.py for this layout) — then aggregated. The oracle
    runs the same aggregate on the original table, so the round-trip
    must preserve every row and the pruned read must drop exactly the
    other partitions.

    Scale: partition layout is THE coarse-pruning lever at 100 TB — a
    predicate on the partition key skips entire directories at planning
    time, before any row group is opened. Low-cardinality keys only
    (5 types here); high-cardinality pruning belongs to clustering /
    Z-order (sources/compaction.py).
    """
    tmp = _rt_scratch("part")
    ev = load_table(spark, sf_dir, "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(f"{tmp}/events")
    back = spark.read.parquet(f"{tmp}/events").filter(
        F.col("event_type") == "purchase"
    )
    return (
        back.groupBy((F.col("user_id") % 10).cast("long").alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n"),
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("cents"),
        )
        .orderBy("bucket")
    )


@register(
    "csv_roundtrip_orders",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
             AS cents
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    eager=True,
)
def csv_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip with an EXPLICIT read schema: orders written as
    headered CSV, read back with declared types (never inferSchema — a
    second full scan AND a type-guessing hazard), aggregated per
    priority. Doubles survive CSV because Spark writes the shortest
    round-trippable decimal repr; the DECIMAL cents in the oracle pin
    the check to exact values, so any quoting/escaping/locale bug in the
    writer or parser diverges the hash.

    Scale: CSV is the interchange format, not the analytics format — no
    pushdown, no column pruning, full-row parse cost. The pattern at
    size: land CSV once, rewrite to parquet immediately (the write side
    here), and point every query at the parquet.
    """
    tmp = _rt_scratch("csv")
    orders = load_table(spark, sf_dir, "orders")
    orders.write.mode("overwrite").option("header", True).csv(f"{tmp}/orders")
    back = (
        spark.read.option("header", True)
        .schema(orders.schema)
        .csv(f"{tmp}/orders")
    )
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n"),
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("cents"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "orc_roundtrip_lineitem",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
             AS cents
    FROM lineitem WHERE l_quantity < 10
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    eager=True,
)
def orc_roundtrip_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip with predicate pushdown: the lineitem fact written
    as ORC (the OTHER columnar lake format Spark ships natively — Hive
    shops standardize on it), read back with a quantity filter that ORC
    evaluates against stripe/row-group statistics (pushdown asserted in
    tests/test_formats.py), DECIMAL-exact money aggregate. Any encoder/
    decoder or stats-pruning bug diverges the hash against the original
    parquet table.

    Scale: unlike CSV/JSON interchange, ORC IS an analytics format —
    columnar, compressed, min/max pruned — so the round-trip models a
    real migration path (Hive/ORC warehouse → Spark) rather than an
    ingest edge; filters and column pruning reach the scan exactly as
    with parquet.
    """
    tmp = _rt_scratch("orc")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    li.write.mode("overwrite").orc(f"{tmp}/lineitem")
    back = spark.read.orc(f"{tmp}/lineitem").filter(F.col("l_quantity") < 10)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("cents"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "json_lines_roundtrip_events",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    eager=True,
)
def json_lines_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL round-trip with an explicit schema: the events fact written
    as newline-delimited JSON (the log-shipping interchange every
    ingestion edge speaks), read back with declared types, aggregated per
    type. Doubles round-trip exactly through Spark's JSON writer; the
    aggregate deliberately avoids the timestamp column so the check pins
    value fidelity, not timezone rendering (timestamp round-trips are
    exercised in tests/test_formats.py where the session zone is pinned).

    Scale: same story as CSV — parse-heavy interchange, no pruning;
    land once, convert to parquet. The PERMISSIVE corrupt-record
    quarantine path for dirty JSON is `read_json_quarantine`.
    """
    tmp = _rt_scratch("jsonl")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    ev.write.mode("overwrite").json(f"{tmp}/events")
    back = spark.read.schema(ev.schema).json(f"{tmp}/events")
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("cents"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("event_type")
    )

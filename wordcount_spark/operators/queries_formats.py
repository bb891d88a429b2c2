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

from wordcount_spark.registry import register
from wordcount_spark.sources.formats import read_jdbc, write_jdbc
from wordcount_spark.sources.readers import load_table


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
    tmp = tempfile.mkdtemp(prefix="wcspark_derby_")
    spark._jvm.java.lang.System.setProperty(  # keep derby.log out of CWD
        "derby.stream.error.file", f"{tmp}/derby.log"
    )
    url = f"jdbc:derby:{tmp}/db;create=true"
    nation = load_table(spark, sf_dir, "nation")
    write_jdbc(nation.coalesce(2), url, "nation")
    return (
        read_jdbc(spark, url, "nation")
        .filter("n_regionkey < 3")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    )

"""The engine's queries are declared via the DataFrame API; this pins that
the same plans are reachable through plain `spark.sql` over registered
views — users coming from the reference's shell-driven workflow get a SQL
surface, not just a Python one."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_DIR
from wordcount_spark.sources.readers import load_table

TABLES = ["lineitem", "orders", "documents"]


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    for t in TABLES:
        load_table(spark, SF_DIR, t).createOrReplaceTempView(t)
    yield
    for t in TABLES:
        spark.catalog.dropTempView(t)


def test_sql_wordcount_equals_dataframe(spark):
    from wordcount_spark.operators.wordcount import word_count

    sql = spark.sql(
        r"""
        SELECT word, count(*) AS cnt FROM (
          SELECT translate(
                   regexp_replace(
                     regexp_replace(tok, '^([\\p{Punct}]|[^\\x00-\\x7F])+', ''),
                     '([\\p{Punct}]|[^\\x00-\\x7F])+$', ''),
                   'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                   'abcdefghijklmnopqrstuvwxyz') AS word
          FROM (SELECT explode(split(text, '\\s+')) AS tok FROM documents)
        )
        WHERE length(word) > 0
        GROUP BY word ORDER BY word
        """
    )
    df = word_count(spark, SF_DIR).select("word", "cnt")
    assert sql.collect() == df.collect()


def test_sql_q1_equals_dataframe(spark):
    import __spark_entry__ as em

    sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))
                   * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )
    df = em.queries()["q1_pricing_summary"](spark, SF_DIR)
    assert [r.asDict() for r in sql.collect()] == [r.asDict() for r in df.collect()]

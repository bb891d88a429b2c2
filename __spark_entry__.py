"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship word count at sf0.001 (smoke check).
``queries()`` — one named callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query for the differential
oracle (the driver value-hashes both sides at sf0.01).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from wordcount_spark.operators.wordcount import word_count

    return word_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from wordcount_spark.registry import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    from wordcount_spark.registry import get_oracles

    return get_oracles()

"""Central registry: named queries + their DuckDB oracle SQL.

Every operator claimed in SURVEY.md §2 gets (a) a callable
``(spark, sf_dir) -> DataFrame`` and (b) where SQL-expressible, an
equivalent ANSI-SQL string DuckDB runs on the same parquet views. Column
names are aliased identically on both sides — the driver sorts columns by
name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
#: queries whose callable EXECUTES work eagerly (streaming replay to a
#: memory sink, iterative training) — plan introspection would run them.
#: Single source of truth for the plan-smell test, the shuffle audit, and
#: the rows-only allowlist.
EAGER_QUERIES: set[str] = set()


def register(name: str, oracle: str | None = None, eager: bool = False):
    """Decorator: add a query (and optionally its oracle SQL) to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        if eager:
            EAGER_QUERIES.add(name)
        return fn

    return deco


def _load_all() -> None:
    """Import every operator module for its registration side effects."""
    import wordcount_spark.operators.queries_wordcount  # noqa: F401

    for mod in (
        "queries_relational",
        "queries_tpch_extra",
        "queries_analytic_extra",
        "queries_windows",
        "queries_streaming",
        "queries_asof",
        "queries_cdc",
        "queries_dedup",
        "queries_similarity",
        "queries_textstats",
        "queries_timeseries",
        "queries_llmprep",
        "queries_graph",
        "queries_multimodal",
    ):
        try:
            __import__(f"wordcount_spark.operators.{mod}")
        except ImportError:
            pass  # module not built yet (incremental rounds)


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    _load_all()
    return dict(ORACLES)

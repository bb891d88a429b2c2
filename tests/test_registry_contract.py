"""Driver-contract guard: every registered query runs, and every query with
an oracle hash-matches DuckDB at the oracle SF — mirrors the driver's
CORRECTNESS check so breakage shows up in pytest first."""

from __future__ import annotations

import os

import pytest

from tests.conftest import assert_matches_oracle

ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _registry():
    import __spark_entry__ as entrymod

    return entrymod.queries(), entrymod.oracle_sql()


def pytest_generate_tests(metafunc):
    if "query_name" in metafunc.fixturenames:
        queries, _ = _registry()
        metafunc.parametrize("query_name", sorted(queries))


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == ["word", "cnt"]


def test_query_matches_oracle(spark, query_name):
    queries, oracles = _registry()
    df = queries[query_name](spark, ORACLE_SF_DIR)
    if query_name in oracles:
        assert_matches_oracle(df, oracles[query_name], ORACLE_SF_DIR)
    else:
        assert df.count() >= 0  # rows-only check (driver's weaker gate)


def test_every_query_has_oracle_or_is_flagged():
    queries, oracles = _registry()
    missing = sorted(set(queries) - set(oracles))
    # Non-SQL-expressible ops may be listed here, consciously:
    from wordcount_spark.registry import EAGER_QUERIES

    # eager (streaming/iterative) queries are rows-only by nature; plus the
    # engine-specific-randomness/hashing ops below
    allowed_rows_only = EAGER_QUERIES | {
        "dedup_minhash_lsh_fast",
        "agg_approx_sketches",
        "sample_fraction",
        "events_hll_rollup",  # DataSketches HLL internals are engine-specific
    }
    assert set(missing) <= allowed_rows_only, f"queries without oracle: {missing}"


def test_priority_block_is_valid_and_category_spanning():
    """The driver samples queries in registration order (round 1: first 50
    only). registry.PRIORITY must stay (a) resolvable, (b) fully
    oracle-backed, (c) inclusive of every round-1 hash failure, and
    (d) category-spanning — so future registrations can't silently push
    the correctness sample back onto one family."""
    from wordcount_spark.registry import PRIORITY, get_oracles, get_queries

    queries, oracles = get_queries(), get_oracles()
    assert len(PRIORITY) == len(set(PRIORITY))
    missing = [n for n in PRIORITY if n not in queries]
    assert not missing, f"PRIORITY names not in registry: {missing}"
    first = list(queries)[: len(PRIORITY)]
    assert first == list(PRIORITY)
    no_oracle = [n for n in PRIORITY if n not in oracles]
    assert not no_oracle, f"PRIORITY entries without oracle: {no_oracle}"

    ROUND1_FAILURES = {
        "wordcount_totals", "q1_pricing_summary", "agg_rollup", "agg_cube",
        "agg_stats", "join_broadcast_dims", "q3_shipping_priority", "join_outer",
        "window_running_total", "unpivot_balances", "agg_histogram",
        "scalar_null_funcs", "agg_argmax_join", "subquery_correlated",
        "scalar_conditional", "pivot_status_by_priority",
    }
    assert ROUND1_FAILURES <= set(PRIORITY)

    CATEGORY_MARKERS = {
        "wordcount": "wordcount",
        "dedup": "dedup_",
        "similarity": "similarity_",
        "retrieval": "retrieval_",
        "llmprep": ("text_chunk", "llm_pack", "pipeline_pretrain", "curriculum"),
        "textstats": ("text_quality", "text_bpe"),
        "graph": "graph_",
        "timeseries": ("events_gapfill", "events_rollup"),
        "windows": ("window_tumbling", "events_retention"),
        "cdc": "cdc_",
        "asof": ("asof_", "range_join"),
        "streaming": "streaming_",
        "multimodal": "multimodal_",
    }
    for cat, markers in CATEGORY_MARKERS.items():
        markers = (markers,) if isinstance(markers, str) else markers
        assert any(
            any(n.startswith(m) for m in markers) for n in PRIORITY
        ), f"no {cat} representative in PRIORITY"

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


# The driver-sample rotation invariants (sentinels valid, unseen queries
# fill the graded window mechanically, new registrations rotate in) live in
# tests/test_registry_rotation.py.

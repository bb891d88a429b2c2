"""Every oracle-backed query must emit coercion-stable output types.

The driver hashes stringified values after coercing Spark results through
``toPandas()`` and DuckDB results through ``.df()``; DECIMAL / HUGEINT /
DATE outputs stringify differently per engine under that coercion (the
round-1 driver failed 16 engine-correct queries exactly this way — see
VERDICT.md "What's wrong" #1). This test statically audits the output
schema of BOTH sides (Spark analysis only + DuckDB DESCRIBE — no data is
executed) and fails on any hash-unstable output column.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR_ORACLE
from tools.audit_output_types import audit_query
from wordcount_spark.registry import EAGER_QUERIES, get_oracles, get_queries


def _oracle_backed():
    oracles = get_oracles()
    # eager queries EXECUTE on invocation (streaming replay, iterative
    # training) — the contract test covers them; skip here to keep this
    # audit schema-only.
    return sorted(n for n in oracles if n not in EAGER_QUERIES)


@pytest.mark.parametrize("name", _oracle_backed())
def test_output_types_stable(spark, name):
    queries, oracles = get_queries(), get_oracles()
    df = queries[name](spark, SF_DIR_ORACLE)
    findings = audit_query(df, oracles[name], SF_DIR_ORACLE)
    assert not findings, f"{name}: " + "; ".join(findings)

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from wordcount_spark.session import get_spark

    s = get_spark("wordcount_spark_tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def duckdb_rows(sql: str, sf_dir: str = SF_DIR):
    """Run oracle SQL in DuckDB with the same views the driver registers."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchall()


def assert_matches_oracle(spark_df, sql: str, sf_dir: str = SF_DIR):
    """Order-insensitive compare of a Spark result against DuckDB, mirroring
    the driver's check: sort columns by name, sort rows, compare STRINGIFIED
    values EXACTLY (the driver value-hashes; a last-ulp float difference is
    a real failure — queries must emit engine-stable values)."""
    cols = sorted(spark_df.columns)
    spark_rows = [tuple(row[c] for c in cols) for row in spark_df.collect()]
    duck_raw = duckdb_rows(sql, sf_dir)
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    duck_cols = [d[0] for d in con.execute(sql).description]
    assert sorted(duck_cols) == cols, f"column mismatch: spark={cols} duck={sorted(duck_cols)}"
    reorder = [duck_cols.index(c) for c in cols]
    duck_rows = [tuple(r[i] for i in reorder) for r in duck_raw]
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    def key(row):
        return tuple(str(v) for v in row)

    for srow, drow in zip(sorted(spark_rows, key=key), sorted(duck_rows, key=key)):
        for sv, dv in zip(srow, drow):
            assert str(sv) == str(dv), f"value mismatch: {srow} vs {drow}"

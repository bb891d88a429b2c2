"""Static output-type audit: the driver's hasher coerces Spark results via
``toPandas()`` and DuckDB results via ``.df()`` before stringifying, so a
query is only hash-stable when BOTH engines land on the same pandas dtype
and the same string per cell. Types that coerce differently per engine:

- DECIMAL: Spark -> object(decimal.Decimal) keeps trailing zeros
  ("253942.00"); DuckDB -> float64 ("253942.0").  NEVER an output type.
- HUGEINT (DuckDB sum() over integers): -> float64 ("5.0") while Spark
  sum() stays int64 ("5").  Always CAST(sum(...) AS BIGINT) in oracle SQL.
- DATE vs TIMESTAMP: Spark DATE -> object(datetime.date) "2024-01-01";
  DuckDB TIMESTAMP -> datetime64 "2024-01-01 00:00:00".  The two sides
  must agree on DATE-ness vs TIMESTAMP-ness.

This audit needs NO data execution: Spark df.schema is analysis-only and
DuckDB ``DESCRIBE <sql>`` binds without running. Used by
tests/test_output_types.py over every oracle-backed query.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_output_types(sql: str, sf_dir: str) -> dict[str, str]:
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}


def type_class(type_str: str) -> str:
    """Map an engine type name to its pandas-coercion equivalence class."""
    t = type_str.upper()
    if "DECIMAL" in t:
        return "DECIMAL"  # always illegal as an output type
    if "HUGEINT" in t:
        return "HUGEINT"  # always illegal as an output type
    if re.match(r"^U?(TINY|SMALL|BIG)?INT", t) or t in ("INTEGER", "LONG", "SHORT", "BYTE"):
        return "int"
    if t in ("DOUBLE", "FLOAT", "REAL") or t.startswith("FLOAT"):
        return "float"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "DATE":
        return "DATE"  # illegal: DuckDB DATE -> .df() datetime64 "…00:00:00",
        # Spark DATE -> object(datetime.date) "2024-01-01" — never hash-equal.
    if t.startswith("VARCHAR") or t.startswith("STRING") or t == "TEXT":
        return "str"  # STRING COLLATE … still stringifies as plain str
    if t == "BOOLEAN":
        return "bool"
    if t.endswith("[]") or t.startswith("ARRAY") or t.startswith("LIST"):
        return "array"
    if t.startswith("STRUCT") or t.startswith("MAP"):
        return "struct"
    return t


def spark_output_types(df) -> dict[str, str]:
    return {f.name: f.dataType.simpleString() for f in df.schema.fields}


def audit_query(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of human-readable findings (empty = clean)."""
    findings = []
    stypes = spark_output_types(spark_df)
    dtypes = duck_output_types(oracle_sql, sf_dir)
    if sorted(stypes) != sorted(dtypes):
        findings.append(f"column names differ: spark={sorted(stypes)} duck={sorted(dtypes)}")
        return findings
    for col in stypes:
        sc, dc = type_class(stypes[col]), type_class(dtypes[col])
        for side, cls, raw in (("spark", sc, stypes[col]), ("duck", dc, dtypes[col])):
            if cls in ("DECIMAL", "HUGEINT", "DATE"):
                findings.append(f"{col}: {side} output type {raw} ({cls} is hash-unstable)")
        if sc in ("DECIMAL", "HUGEINT", "DATE") or dc in ("DECIMAL", "HUGEINT", "DATE"):
            continue
        if sc != dc:
            findings.append(
                f"{col}: type-class mismatch spark={stypes[col]}({sc}) vs duck={dtypes[col]}({dc})"
            )
    return findings


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    from wordcount_spark.registry import get_oracles, get_queries
    from wordcount_spark.session import get_spark

    queries, oracles = get_queries(), get_oracles()
    spark = get_spark("audit_output_types", cpus=4)
    bad = 0
    for name, sql in oracles.items():
        try:
            df = queries[name](spark, sf_dir)
            findings = audit_query(df, sql, sf_dir)
        except Exception as e:  # noqa: BLE001
            findings = [f"ERROR {type(e).__name__}: {e}"]
        if findings:
            bad += 1
            print(f"FLAG {name}")
            for f in findings:
                print(f"     {f}")
    print(f"\n{len(oracles)} audited, {bad} flagged")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

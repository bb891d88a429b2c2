"""Equivalence of the two minhash formulations (exploded+groupBy vs
row-local array fold) — same signatures bit-for-bit."""

from __future__ import annotations

from wordcount_spark.operators.dedup import (
    doc_shingles,
    minhash_signatures,
    minhash_signatures_arr,
)


def test_minhash_formulations_agree(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {
        r["id"]: r["signature"]
        for r in minhash_signatures(doc_shingles(docs), 16, "xxhash64").collect()
    }
    b = {
        r["id"]: r["signature"]
        for r in minhash_signatures_arr(docs, 16, "xxhash64").collect()
    }
    assert a == b and len(a) > 0

"""Connected components vs a Python union-find ground truth, and the full
pairs→clusters→survivors dedup flow."""

from __future__ import annotations

from pyspark.sql import functions as F

from wordcount_spark.operators.components import (
    connected_components,
    dedup_survivors_from_pairs,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_components_match_union_find(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (3, 4), (40, 41)]
    df = spark.createDataFrame(edges, ["ida", "idb"])
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    want = _union_find(edges)
    assert got == want


def test_components_chain_needs_iterations(spark):
    # a long chain exercises multi-iteration propagation
    chain = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(chain, ["ida", "idb"])
    got = {r["id"]: r["component"] for r in connected_components(df, max_iter=40).collect()}
    assert set(got.values()) == {0}


def test_dedup_survivors_flow(spark, sf_dir):
    from wordcount_spark.operators.queries_dedup import dedup_ngram_jaccard

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    all_ids = docs.select(F.col("doc_id").alias("id"))
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("ida", "idb")
    survivors = dedup_survivors_from_pairs(all_ids, pairs)
    n_docs = docs.count()
    n_pairs = pairs.count()
    n_surv = survivors.count()
    # every component loses (size-1) docs; with p pairs, at most p docs drop
    assert n_docs - n_pairs <= n_surv < n_docs or n_pairs == 0
    # survivors are unique and subset of doc ids
    assert survivors.distinct().count() == n_surv

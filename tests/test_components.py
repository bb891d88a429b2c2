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


def test_star_components_match_union_find(spark):
    from wordcount_spark.operators.components import connected_components_star

    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (3, 4), (40, 41)]
    df = spark.createDataFrame(edges, ["ida", "idb"])
    got = {
        r["id"]: r["component"]
        for r in connected_components_star(df).collect()
    }
    assert got == _union_find(edges)


def test_star_components_long_chain_few_rounds(spark):
    """The O(log n) claim, observed: a 60-node chain (diameter 59, which
    the one-hop variant needs ~60 rounds for) must converge within the
    default 20 alternating rounds — and produce the same labels."""
    from wordcount_spark.operators.components import connected_components_star

    chain = [(i, i + 1) for i in range(60)]
    df = spark.createDataFrame(chain, ["ida", "idb"])
    got = {
        r["id"]: r["component"]
        for r in connected_components_star(df, max_rounds=20).collect()
    }
    assert got == {i: 0 for i in range(61)}


def test_star_components_random_graphs_match_one_hop(spark):
    """Differential: star contraction and one-hop propagation must agree
    on seeded random graphs (mixed component shapes, shuffled ids)."""
    import random

    from wordcount_spark.operators.components import connected_components_star

    rng = random.Random(7)
    ids = list(range(200))
    rng.shuffle(ids)
    edges = [
        (ids[rng.randrange(200)], ids[rng.randrange(200)]) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["ida", "idb"])
    one_hop = {
        r["id"]: r["component"]
        for r in connected_components(df, max_iter=100).collect()
    }
    star = {
        r["id"]: r["component"]
        for r in connected_components_star(df).collect()
    }
    assert star == one_hop == _union_find(edges)


def test_star_components_keep_self_loop_nodes(spark):
    """Contract parity: a node whose only edge is a self-loop is a
    singleton component in BOTH variants (the star contraction must not
    drop it when it filters self-loops from the working edge set)."""
    from wordcount_spark.operators.components import connected_components_star

    edges = [(5, 5), (1, 2)]
    df = spark.createDataFrame(edges, ["ida", "idb"])
    one_hop = {
        r["id"]: r["component"] for r in connected_components(df).collect()
    }
    star = {
        r["id"]: r["component"]
        for r in connected_components_star(df).collect()
    }
    assert star == one_hop == {1: 1, 2: 1, 5: 5}

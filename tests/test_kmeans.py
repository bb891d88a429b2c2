"""K-means convergence properties (iterative algorithms have no SQL oracle;
the objective function is the ground truth: Lloyd's must never increase it)."""

from __future__ import annotations

from wordcount_spark.operators.kmeans import (
    assign_clusters,
    inertia,
    kmeans_fit,
    update_centroids,
)


def test_kmeans_monotone_convergence(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    init = [
        [float(v) for v in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(8).collect()
    ]
    cents = init
    assigned = assign_clusters(emb, cents)
    prev = inertia(assigned, cents)
    for _ in range(4):
        cents = update_centroids(assigned, len(cents), dim)
        assigned = assign_clusters(emb, cents)
        cur = inertia(assigned, cents)
        assert cur <= prev + 1e-6  # Lloyd's never increases the objective
        prev = cur


def test_kmeans_fit_assigns_everything(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents, assigned = kmeans_fit(emb, k=8, max_iter=3)
    assert assigned.count() == emb.count()
    clusters = {r["cluster"] for r in assigned.select("cluster").distinct().collect()}
    assert clusters <= set(range(8)) and len(clusters) >= 2
    assert all(len(c) == 64 for c in cents)

"""K-means (Lloyd's) over the embeddings table — the IVF coarse-quantizer
trainer for similarity search, written as an iterative DataFrame algorithm.

The Spark-correct shape for k-means: per-iteration state is only k×dim
floats (the centroids), so centroids live on the DRIVER between iterations
and are folded into the next assignment expression as literals (an implicit
broadcast — no join, no shuffle for assignment). Each iteration is one
scan + one groupBy(cluster) mean: the heavy data crosses the wire once per
iteration, the small data rides the closure. All arithmetic is JVM-side
(zip_with/aggregate) — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    c = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(vec, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters(emb: DataFrame, centroids: list[list[float]], vec_col: str = "embedding") -> DataFrame:
    """Add ``cluster`` = argmin squared distance (ties → lowest cluster id,
    via array_position of the min — deterministic)."""
    dists = F.array(*[_sq_dist(F.col(vec_col), c) for c in centroids])
    return emb.withColumn(
        "cluster",
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
    )


def update_centroids(assigned: DataFrame, k: int, dim: int, vec_col: str = "embedding") -> list[list[float]]:
    """New centroid = elementwise mean per cluster (posexplode + groupBy —
    fully distributed; k×dim result rows collect to the driver)."""
    comps = (
        assigned.select("cluster", F.posexplode(vec_col).alias("i", "v"))
        .groupBy("cluster", "i")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
        .collect()
    )
    cents: list[list[float]] = [[0.0] * dim for _ in range(k)]
    seen = set()
    for r in comps:
        cents[r["cluster"]][r["i"]] = r["m"]
        seen.add(r["cluster"])
    return [c for i, c in enumerate(cents) if i in seen]


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[list[float]], DataFrame]:
    """Returns (centroids, assignments). Deterministic init: the k vectors
    with the lowest ids (reproducible across runs/engines; k-means|| would
    randomize — swap in when quality matters more than determinism)."""
    dim = len(emb.select(vec_col).first()[0])
    init = [
        [float(v) for v in r[vec_col]]
        for r in emb.orderBy(id_col).limit(k).collect()
    ]
    centroids = init
    assigned = assign_clusters(emb, centroids, vec_col)
    for _ in range(max_iter):
        centroids = update_centroids(assigned, len(centroids), dim, vec_col)
        assigned = assign_clusters(emb, centroids, vec_col)
    return centroids, assigned


def inertia(assigned: DataFrame, centroids: list[list[float]], vec_col: str = "embedding") -> float:
    """Total within-cluster squared distance (the k-means objective)."""
    dists = F.array(*[_sq_dist(F.col(vec_col), c) for c in centroids])
    return assigned.select(
        F.sum(F.element_at(dists, F.col("cluster") + 1)).alias("j")
    ).collect()[0]["j"]

"""Product quantization (PQ) for embedding compression + approximate
nearest-neighbor search — the standard ANN memory/compute trade beyond the
IVF coarse quantizer (`kmeans.py`).

Shape: each vector splits into ``m`` subvectors; each subspace trains its
own k-codebook (k-means, deterministic init — `kmeans.py`); a vector is
stored as ``m`` small codes (m=8, k=16 → 32 bits per 64-dim float vector:
a 64× compression of the scan payload). Query-time asymmetric distance
(ADC): the query builds an m×k lookup table of exact subspace distances
DRIVER-side (tiny), and each row's approximate distance is m table
lookups — no float math per dimension, no decompression. At 100 TB the
scan reads only the codes column; the re-rank step fetches full vectors
for the small candidate set alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wordcount_spark.operators.kmeans import kmeans_fit


def pq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iter: int = 3,
) -> list[list[list[float]]]:
    """Per-subspace codebooks: list of m codebooks, each k centroids of
    dim/m floats. Deterministic (k-means with lowest-id init)."""
    dim = len(emb.select(vec_col).first()[0])
    assert dim % m == 0, f"dim {dim} not divisible by m {m}"
    dsub = dim // m
    books: list[list[list[float]]] = []
    for j in range(m):
        sub = emb.select(
            id_col, F.slice(vec_col, j * dsub + 1, dsub).alias(vec_col)
        )
        cents, _ = kmeans_fit(
            sub, k=k, max_iter=max_iter, vec_col=vec_col, id_col=id_col
        )
        books.append(cents)
    return books


def _sub_sq_dists(sub_vec: Column, codebook: list[list[float]]) -> Column:
    """array of squared distances from a subvector to each centroid."""
    return F.array(
        *[
            F.aggregate(
                F.zip_with(
                    sub_vec,
                    F.array(*[F.lit(float(v)) for v in c]),
                    lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for c in codebook
        ]
    )


def pq_encode(
    emb: DataFrame, books: list[list[list[float]]], vec_col: str = "embedding"
) -> DataFrame:
    """Add ``pq_codes``: array<int> of m codebook indices (argmin subspace
    distance, ties → lowest code — array_position of the min)."""
    m = len(books)
    dsub = len(books[0][0])
    codes = [
        (
            F.array_position(
                _sub_sq_dists(F.slice(vec_col, j * dsub + 1, dsub), books[j]),
                F.array_min(
                    _sub_sq_dists(F.slice(vec_col, j * dsub + 1, dsub), books[j])
                ),
            )
            - 1
        ).cast("int")
        for j in range(m)
    ]
    return emb.withColumn("pq_codes", F.array(*codes))


def pq_adc_topk(
    encoded: DataFrame,
    books: list[list[list[float]]],
    query: list[float],
    n: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-n nearest (smallest ADC distance) rows for one
    query vector. The m×k lookup table is computed driver-side from the
    exact query subvectors and folded into the expression as literals;
    each row costs m element_at lookups + (m-1) adds."""
    m = len(books)
    dsub = len(books[0][0])
    lut = [
        [
            sum(
                (query[j * dsub + d] - c[d]) * (query[j * dsub + d] - c[d])
                for d in range(dsub)
            )
            for c in books[j]
        ]
        for j in range(m)
    ]
    dist = None
    for j in range(m):
        term = F.element_at(
            F.array(*[F.lit(v) for v in lut[j]]),
            F.element_at("pq_codes", j + 1) + 1,
        )
        dist = term if dist is None else dist + term
    return (
        encoded.select(id_col, dist.alias("adc_dist"), "pq_codes")
        .orderBy("adc_dist", id_col)
        .limit(n)
    )


def pca_fit(
    emb: DataFrame, n_components: int = 8, vec_col: str = "embedding"
) -> tuple[list[list[float]], list[float]]:
    """PCA via distributed second-moment partials: each Arrow batch
    contributes (X^T X, sum x, count) — 64×64 + 64 + 1 floats regardless of
    row count — and the driver eigendecomposes the 64×64 covariance
    (numpy, trivial). This is the treeAggregate shape MLlib uses: the data
    crosses the wire once as tiny partials, never as vectors.

    Returns (components [n_components×dim], explained_variance_ratio)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    dim = len(emb.select(vec_col).first()[0])

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = np.zeros((dim, dim))
        s = np.zeros(dim)
        n = 0
        for pdf in batches:
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            gram += x.T @ x
            s += x.sum(axis=0)
            n += len(x)
        yield pd.DataFrame(
            {"gram": [gram.ravel().tolist()], "s": [s.tolist()], "n": [n]}
        )

    rows = emb.select(vec_col).mapInPandas(
        partials, schema="gram array<double>, s array<double>, n long"
    ).collect()
    gram = sum(np.array(r["gram"]).reshape(dim, dim) for r in rows)
    s = sum(np.array(r["s"]) for r in rows)
    n = sum(r["n"] for r in rows)
    mean = s / n
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    total = float(evals.sum())
    comps = [evecs[:, i].tolist() for i in range(n_components)]
    ratios = [float(evals[i] / total) for i in range(n_components)]
    return comps, ratios

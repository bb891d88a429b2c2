"""The PQ ADC distance exists twice by design: `pq.pq_adc_topk` folds a
driver-side LUT (the multi-query amortized path — one collected query,
m element_at lookups per row) while `similarity_pq_topk` computes the
same distance per-row from the frozen codebooks so the whole plan stays
lazy and SQL-oracle-matched. This test pins the two implementations to
each other: same frozen books, same query, same candidate ranking."""

from __future__ import annotations

from pyspark.sql import functions as F

from wordcount_spark.operators.frozen_codebooks import IVF_CENTROIDS, PQ_CODEBOOKS
from wordcount_spark.operators.pq import pq_adc_topk, pq_encode
from wordcount_spark.operators.queries_similarity import (
    cosine,
    similarity_pq_topk,
)
from wordcount_spark.sources.readers import load_table


def test_frozen_codebook_shapes():
    assert len(IVF_CENTROIDS) == 8 and all(len(c) == 64 for c in IVF_CENTROIDS)
    assert len(PQ_CODEBOOKS) == 8
    assert all(len(b) == 16 for b in PQ_CODEBOOKS)
    assert all(len(c) == 8 for b in PQ_CODEBOOKS for c in b)
    # quantized to 4 decimals: literal text is short and parses to the
    # identical double in Python, Spark and DuckDB
    for b in PQ_CODEBOOKS:
        for c in b:
            assert all(round(v, 4) == v for v in c)


def test_lazy_adc_matches_driver_lut_path(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qv = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    encoded = pq_encode(emb.filter(F.col("vec_id") != 0), PQ_CODEBOOKS)
    cand = pq_adc_topk(encoded, PQ_CODEBOOKS, qv, n=50).select("vec_id")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    eager_top10 = [
        (r["vec_id"], r["cos_sim"])
        for r in emb.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(q))
        .select("vec_id", cosine(F.col("qv"), F.col("embedding")).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
        .collect()
    ]
    lazy_top10 = [
        (r["vec_id"], r["cos_sim"])
        for r in similarity_pq_topk(spark, sf_dir).collect()
    ]
    assert eager_top10 == lazy_top10

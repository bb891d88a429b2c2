"""Registered multimodal queries. The Pandas-UDF plumbing is real (bytes
in, Arrow batches, fan-out in the iterator); the decode step is a
deterministic stub whose outputs DuckDB can predict arithmetically — so
even the UDF pipeline is oracle-checked end-to-end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from wordcount_spark.operators.multimodal import (
    extract_features,
    sample_frames,
    with_binary_payload,
)
from wordcount_spark.registry import register
from wordcount_spark.sources.readers import load_table

_PAYLOAD_SQL = """
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
              WHEN doc_id % 3 = 1 THEN 'audio/wav'
              ELSE 'video/mp4' END AS mime,
         octet_length(CAST(text AS BLOB)) AS n_bytes,
         text
  FROM documents
"""


@register(
    "multimodal_meta",
    f"""
    WITH p AS ({_PAYLOAD_SQL})
    SELECT doc_id, mime, n_bytes, md5(text) AS checksum
    FROM p ORDER BY doc_id
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload metadata (mime, size, content hash) — pure JVM path."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    b = with_binary_payload(docs)
    return b.select(
        "doc_id", "mime", "n_bytes", F.md5("payload").alias("checksum")
    ).orderBy("doc_id")


@register(
    "multimodal_image_features",
    f"""
    WITH p AS ({_PAYLOAD_SQL})
    SELECT doc_id, mime, n_bytes,
           md5(text) AS checksum,
           64 + (n_bytes % 960) AS width,
           64 + ((n_bytes * 7) % 704) AS height
    FROM p ORDER BY doc_id
    """,
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through the Arrow-batched mapInPandas operator
    (stub decode; checksum computed from the actual bytes in Python)."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(with_binary_payload(docs)).orderBy("doc_id")


@register(
    "multimodal_doc_embedding_join",
    """
    SELECT d.doc_id, d.lang,
           e.label,
           len(e.embedding) AS dim,
           round(list_sum(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sq_norm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    ORDER BY d.doc_id
    """,
)
def multimodal_doc_embedding_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal columns joined: text rows ⋈ their embedding vectors by id
    (the text+vector row a training pipeline feeds downstream)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .select("doc_id", "lang", "label", F.size("embedding").alias("dim"),
                F.round(sq, 4).alias("sq_norm"))
        .orderBy("doc_id")
    )


@register(
    "multimodal_frame_sample",
    f"""
    WITH p AS ({_PAYLOAD_SQL}),
    v AS (SELECT doc_id, n_bytes FROM p WHERE mime = 'video/mp4'),
    f AS (
      SELECT doc_id, n_bytes,
             unnest(range(least(n_bytes // 4096 + 1, 5))) AS frame_idx
      FROM v
    )
    SELECT doc_id,
           CAST(frame_idx AS INT) AS frame_idx,
           frame_idx * 4096 AS byte_offset,
           least(4096, n_bytes - frame_idx * 4096) AS frame_bytes
    FROM f ORDER BY doc_id, frame_idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling fan-out inside the Pandas iterator (one row per
    sampled frame of each 'video' payload)."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(with_binary_payload(docs)).orderBy("doc_id", "frame_idx")


@register(
    "multimodal_resize",
    """
    WITH m AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                  WHEN doc_id % 3 = 1 THEN 'audio/wav'
                  ELSE 'video/mp4' END AS mime,
             64 + (octet_length(encode(text)) % 960) AS width,
             64 + ((octet_length(encode(text)) * 7) % 704) AS height
      FROM documents),
    s AS (SELECT *, least(224.0 / width, 224.0 / height) AS scale FROM m)
    SELECT doc_id, mime, width, height,
           greatest(1, CAST(floor(width * scale) AS BIGINT)) AS new_width,
           greatest(1, CAST(floor(height * scale) AS BIGINT)) AS new_height,
           scale
    FROM s
    ORDER BY doc_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-to-fit (224-box, aspect-preserving) over binary payloads via
    Arrow-batched mapInPandas — the vision-pipeline preprocessing shape.
    Decode is the deterministic stub (no codecs in this container,
    `multimodal.py` module docstring); geometry math is vectorized numpy
    inside the batch iterator and mirrored exactly by the SQL oracle
    (identical IEEE double ops on both engines)."""
    from wordcount_spark.operators.multimodal import resize_media, with_binary_payload

    docs = load_table(spark, sf_dir, "documents")
    return resize_media(with_binary_payload(docs)).orderBy("doc_id")

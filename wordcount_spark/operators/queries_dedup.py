"""Registered dedup queries — every tier oracle-backed, including the full
MinHash+LSH pipeline (portable md5-based hash family, DECIMAL/HUGEINT
mulmod — see operators/dedup.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wordcount_spark.operators.dedup import (
    _P,
    _affine_params,
    doc_shingles,
    exact_dedup_keepers,
    hamming_distance,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
)
from wordcount_spark.registry import register
from wordcount_spark.sources.readers import load_table

# DuckDB-side shingling (must mirror doc_shingles byte-for-byte):
# tokens of lower(text), positional 3-gram join by single space, distinct.
_SHINGLES_SQL = """
  SELECT doc_id AS id,
         unnest(list_distinct(
           CASE WHEN len(toks) >= 3
                THEN list_transform(range(1, len(toks) - 1),
                                    i -> array_to_string(toks[i:i+2], ' '))
                ELSE [] END)) AS shingle
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0b\f\r]+'),
                           x -> x <> '') AS toks
        FROM documents)
"""


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash,
           min(doc_id) AS keeper_id,
           count(*) AS n_copies
    FROM documents GROUP BY md5(text) ORDER BY keeper_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, min-id representative.
    Scale: one shuffle on a 128-bit hash — uniform keys, no skew."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup_keepers(docs).orderBy("keeper_id")


@register(
    "dedup_exact_survivors",
    """
    SELECT doc_id FROM (
      SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1 ORDER BY doc_id
    """,
)
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surviving rows after exact dedup (window formulation)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id")
        .orderBy("doc_id")
    )


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
    common AS (
      SELECT a.id AS ida, b.id AS idb, count(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT ida, idb, common,
           CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.id = ida
    JOIN sizes sb ON sb.id = idb
    WHERE CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) >= 0.5
    ORDER BY ida, idb
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard ≥ 0.5 via the inverted shingle index (no n²
    cross join — only docs sharing a shingle meet in the join)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs)
    return jaccard_pairs(sh, 0.5).orderBy("ida", "idb")


def _minhash_sql(num_hashes: int, bands: int, rows: int, threshold_bands: bool = True) -> str:
    """DuckDB rendering of the md5-mode MinHash+LSH candidate pipeline."""
    params = _affine_params(num_hashes)
    values = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(params))
    return f"""
    WITH sh AS ({_SHINGLES_SQL}),
    x AS (SELECT id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {_P} AS x FROM sh),
    params(i, a, b) AS (SELECT * FROM (VALUES {values})),
    m AS (
      SELECT id, i, min((a * x + b) % {_P}) AS h
      FROM x CROSS JOIN params GROUP BY id, i
    ),
    sig AS (
      SELECT id, list(h ORDER BY i) AS sig FROM m GROUP BY id
    ),
    banded AS (
      SELECT id, band,
             md5(array_to_string(sig[band*{rows}+1:band*{rows}+{rows}], ',')) AS bucket
      FROM sig CROSS JOIN (SELECT unnest(range({bands})) AS band)
    )
    SELECT DISTINCT a.id AS ida, b.id AS idb
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
    ORDER BY ida, idb
    """


@register("dedup_minhash_lsh", _minhash_sql(32, 8, 4))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32) + LSH(8 bands × 4 rows) candidate pairs, portable-hash
    mode so DuckDB reproduces the signatures bit-for-bit.

    Scale shape: O(n·K) signature computation (one map-side-combinable
    aggregation), then a groupBy-sized bucket join — the sub-quadratic
    near-dup path for 100 TB corpora.
    """
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(doc_shingles(docs), num_hashes=32, hash_mode="md5")
    return lsh_candidate_pairs(sigs, bands=8, rows=4, hash_mode="md5").orderBy(
        "ida", "idb"
    )


@register("dedup_minhash_lsh_fast")  # rows-only: xxhash64 has no SQL twin
def dedup_minhash_lsh_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-path MinHash+LSH (xxhash64 base hash — one JVM hash call
    per shingle instead of an md5 + hex decode). Same pipeline as the
    oracle-backed md5 variant; benched as the scale path."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(doc_shingles(docs), num_hashes=32, hash_mode="xxhash64")
    return lsh_candidate_pairs(sigs, bands=8, rows=4, hash_mode="xxhash64").orderBy(
        "ida", "idb"
    )


_DOT = (
    "list_sum(list_transform(range(1, 65), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
)
_NRM = "sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"


@register(
    "dedup_embedding_cosine",
    f"""
    SELECT a.vec_id AS ida, b.vec_id AS idb,
           {_DOT} / ({_NRM.format(v="a.embedding")} * {_NRM.format(v="b.embedding")}) AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_DOT} / ({_NRM.format(v="a.embedding")} * {_NRM.format(v="b.embedding")}) > 0.95
    ORDER BY ida, idb
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicates (cos > 0.95): semantic dedup, the
    fuzziest tier — catches paraphrases that no token-level method sees.
    Label-blocked (IVF-style) so the n² cross product never materializes."""
    from wordcount_spark.operators.queries_similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    a, b = emb.alias("a"), emb.alias("b")
    sim = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("ida"),
            F.col("b.vec_id").alias("idb"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") > 0.95)
        .orderBy("ida", "idb")
    )


_SIMHASH_SQL = """
    WITH toks AS (
      SELECT doc_id AS id,
             unnest(list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0b\f\r]+'),
                                x -> x <> '')) AS tok
      FROM documents
    ),
    tw AS (SELECT id, tok, count(*) AS w FROM toks GROUP BY id, tok),
    txw AS (SELECT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS x, w FROM tw),
    bits AS (
      SELECT id, j,
             sum(CASE WHEN (x >> CAST(j AS INT)) & 1 = 1 THEN w ELSE -w END) AS s
      FROM txw CROSS JOIN (SELECT unnest(range(60)) AS j)
      GROUP BY id, j
    ),
    fp AS (
      SELECT id,
             sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS simhash
      FROM bits GROUP BY id
    )
"""


@register(
    "dedup_simhash",
    _SIMHASH_SQL + "SELECT id, simhash FROM fp ORDER BY id",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash fingerprints (portable-hash mode — DuckDB reproduces
    every fingerprint bit-for-bit)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash(docs, hash_mode="md5").orderBy("id")


@register(
    "dedup_simhash_near",
    _SIMHASH_SQL
    + """
    , banded AS (
      SELECT id, simhash, band,
             (simhash >> CAST(band * 15 AS INT)) & 32767 AS bval
      FROM fp CROSS JOIN (SELECT unnest(range(4)) AS band)
    )
    SELECT DISTINCT a.id AS ida, b.id AS idb,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.bval = b.bval AND a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 12
    ORDER BY ida, idb
    """,
)
def dedup_simhash_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: block on 4×15-bit bands (a pair within
    hamming ≤ 4 of 60 bits must agree on ≥1 full band by pigeonhole;
    wider distances are caught probabilistically), verify hamming ≤ 12.
    Sub-quadratic: the join meets only docs sharing a band value."""
    docs = load_table(spark, sf_dir, "documents")
    fp = simhash(docs, hash_mode="md5")
    banded = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.shiftright(F.col("simhash"), band * 15)
                        .bitwiseAND(F.lit(32767))
                        .alias("bval"),
                    )
                    for band in range(4)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval"))
    a, b = banded.alias("a"), banded.alias("b")
    ham = hamming_distance(F.col("a.simhash"), F.col("b.simhash"))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("ida"),
            F.col("b.id").alias("idb"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= 12)
        .distinct()
        .orderBy("ida", "idb")
    )

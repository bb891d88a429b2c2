"""Small-file compaction + sorted (clustered) rewrite."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR
from wordcount_spark.sources.compaction import compact_parquet


def test_compaction_reduces_file_count(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.repartition(64).write.parquet(src)  # simulate streaming-ingest debris

    stats = compact_parquet(spark, src, out, target_file_mb=512)
    assert stats["files_before"] == 64
    assert stats["files_after"] <= 4  # tiny table -> ~1 target file
    # lossless rewrite
    a = spark.read.parquet(src)
    b = spark.read.parquet(out)
    assert a.count() == b.count()
    assert sorted(a.collect()) == sorted(b.collect())


def test_clustered_rewrite_sorts_within_files(spark, tmp_path):
    src = str(tmp_path / "unsorted")
    out = str(tmp_path / "clustered")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.repartition(8).write.parquet(src)

    compact_parquet(spark, src, out, target_file_mb=0.01, cluster_by=["doc_id"])
    got = spark.read.parquet(out).select(
        "doc_id", F.col("_metadata.file_path").alias("f")
    )
    # within every output file, doc_id must be contiguous AND sorted:
    # file ranges must not overlap (range partitioning) ...
    ranges = (
        got.groupBy("f")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in ranges)
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:])), "file key ranges overlap"
    # ... so a point/range predicate on doc_id can skip every other file
    assert len(spans) >= 2


def test_zorder_rewrite_prunes_on_every_dimension(spark, tmp_path):
    """Z-order layout: a point filter on EITHER z-dimension must touch a
    strict subset of output files — lexicographic clustering can only
    promise that for the leading key."""
    src = str(tmp_path / "zsrc")
    out = str(tmp_path / "zordered")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    li.repartition(16).write.parquet(src)

    compact_parquet(
        spark, src, out, target_file_mb=0.002, zorder_by=["l_partkey", "l_suppkey"]
    )
    got = spark.read.parquet(out).select(
        "l_partkey", "l_suppkey", F.col("_metadata.file_path").alias("f")
    )
    total_files = got.select("f").distinct().count()
    assert total_files >= 4, "need several files to show pruning"

    keys = got.limit(1).collect()[0]
    for col, val in (("l_partkey", keys.l_partkey), ("l_suppkey", keys.l_suppkey)):
        touched = (
            got.filter(F.col(col) == val).select("f").distinct().count()
        )
        assert touched < total_files, f"filter on {col} touched every file"
    # lossless rewrite
    assert spark.read.parquet(out).count() == li.count()


def test_zorder_value_matches_python_morton(spark):
    """Property: the zorder_value expression equals a reference Python
    Morton interleave for arbitrary bucket ids (both dims, 8 bits)."""
    import random

    from wordcount_spark.sources.compaction import zorder_value

    rng = random.Random(42)
    rows = [(rng.randrange(256), rng.randrange(256)) for _ in range(200)] + [
        (0, 0),
        (255, 255),
        (0, 255),
        (255, 0),
        (1, 128),
    ]

    def morton(a: int, b: int, bits: int = 8) -> int:
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(rows, "a long, b long")
    got = (
        df.withColumn("z", zorder_value([F.col("a"), F.col("b")], 8))
        .orderBy("a", "b")
        .collect()
    )
    for r in got:
        assert r["z"] == morton(r["a"], r["b"]), (r["a"], r["b"], r["z"])

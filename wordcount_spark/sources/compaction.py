"""Table maintenance: small-file compaction and sorted layout rewrite.

At 100 TB the killer isn't one big scan — it's a million 2 MB files from
streaming ingest: every file costs a driver listing entry, a footer read,
and a task. Compaction rewrites a directory to target-sized files;
`cluster_by` additionally sorts rows within each output file so parquet
row-group min/max stats become selective (data skipping on non-partition
columns — the poor man's Z-order for a single key).

Pure DataFrame ops: the rewrite is a repartition (+ optional
repartitionByRange) and a write — runs on the cluster, never through the
driver.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_mb: float = 512,
    cluster_by: list[str] | None = None,
) -> dict:
    """Rewrite `in_path` parquet into ~`target_file_mb` files at
    `out_path`; returns before/after stats. With `cluster_by`, output is
    range-partitioned + sorted on those columns (each output file owns a
    contiguous key range → min/max row-group stats prune reads)."""
    df = spark.read.parquet(in_path)
    files = [
        (r.file_path, r.file_size)
        for r in df.select("_metadata.file_path", "_metadata.file_size")
        .distinct()
        .collect()
    ]
    total_bytes = sum(sz for _, sz in files)
    n_out = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    if cluster_by:
        out = df.repartitionByRange(n_out, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(out_path)
    out_files = (
        spark.read.parquet(out_path)
        .select("_metadata.file_path")
        .distinct()
        .count()
    )
    return {
        "files_before": len(files),
        "files_after": out_files,
        "bytes_before": total_bytes,
        "target_files": n_out,
    }

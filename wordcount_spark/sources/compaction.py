"""Table maintenance: small-file compaction and sorted layout rewrite.

At 100 TB the killer isn't one big scan — it's a million 2 MB files from
streaming ingest: every file costs a driver listing entry, a footer read,
and a task. Compaction rewrites a directory to target-sized files;
`cluster_by` additionally sorts rows within each output file so parquet
row-group min/max stats become selective (data skipping on non-partition
columns — the poor man's Z-order for a single key). `zorder_by` is the
real multi-dimension version: rows are ordered by the bit-interleaved
Z-value of width-bucketed column ranks, so EVERY listed dimension gets
selective file/row-group min-max stats, not just the leading sort key.

Pure DataFrame ops: the rewrite is a repartition (+ optional
repartitionByRange) and a write — runs on the cluster, never through the
driver (the only driver work is one min/max agg for bucket bounds).
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def zorder_value(buckets: list[Column], bits: int) -> Column:
    """Bit-interleave per-dimension bucket ids into one Z (Morton) value.

    bit i of dim c lands at position i*ndims + c, so a sort by the result
    alternates locality between dimensions — the standard space-filling
    curve trick every lakehouse OPTIMIZE ZORDER implements."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        for c, b in enumerate(buckets):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, i).bitwiseAND(F.lit(1)), i * len(buckets) + c
                )
            )
    return z


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_mb: float = 512,
    cluster_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
    zorder_bits: int = 8,
) -> dict:
    """Rewrite `in_path` parquet into ~`target_file_mb` files at
    `out_path`; returns before/after stats. With `cluster_by`, output is
    range-partitioned + sorted on those columns (each output file owns a
    contiguous key range → min/max row-group stats prune reads). With
    `zorder_by` (numeric columns), rows are range-partitioned + sorted on
    the bit-interleaved Z-value of width-bucketed ranks instead, so a
    point/range filter on ANY listed dimension skips most files — unlike
    lexicographic clustering, which prunes only on the leading key.
    Bucket bounds come from one global min/max agg (uniform-width buckets;
    production systems sample range boundaries instead — same plan shape)."""
    df = spark.read.parquet(in_path)
    files = [
        (r.file_path, r.file_size)
        for r in df.select("_metadata.file_path", "_metadata.file_size")
        .distinct()
        .collect()
    ]
    total_bytes = sum(sz for _, sz in files)
    n_out = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    if zorder_by:
        bounds = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in zorder_by],
            *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in zorder_by],
        ).collect()[0]
        for c in zorder_by:
            if bounds[f"mn_{c}"] is None or bounds[f"mx_{c}"] is None:
                raise ValueError(
                    f"zorder_by column {c!r} has no numeric values "
                    "(all-NULL or non-numeric) — cannot derive bucket bounds"
                )
        n_buckets = 1 << zorder_bits
        # NULL values (in a partially-null column) bucket to 0: they sort
        # together at the low end of the curve instead of landing wherever
        # width_bucket's null propagation would put them
        buckets = [
            F.coalesce(
                F.least(
                    F.lit(n_buckets - 1),
                    (
                        F.width_bucket(
                            F.col(c).cast("double"),
                            F.lit(bounds[f"mn_{c}"]),
                            F.lit(bounds[f"mx_{c}"] + 1e-9),
                            F.lit(n_buckets),
                        )
                        - 1
                    ).cast("long"),
                ),
                F.lit(0),
            )
            for c in zorder_by
        ]
        z = df.withColumn("__z", zorder_value(buckets, zorder_bits))
        out = (
            z.repartitionByRange(n_out, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    elif cluster_by:
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

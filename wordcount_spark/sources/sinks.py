"""Sinks mirroring the reference's output surfaces.

The reference has two: sorted stdout with a ``[i] word: count`` rank prefix
(``omp.cpp:219-223``) and a rank-0 file sink that adds a ``Unique words
found: N`` line (``hybrid.cpp:445-454`` — file instead of stdout because of
cluster IO limits, a pathology we keep out of the data path: BASELINE.md
shows 99.6% of the reference's runtime was stdout writes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_reference_output(
    ranked: DataFrame,
    out_path: str,
    header_file: str,
    unique_line: bool = False,
) -> None:
    """Write the hybrid-style single output file.

    ``ranked`` must have (rank_idx, word, cnt). A single ordered text file
    is inherently one writer — we ``coalesce(1)`` only at the formatted-line
    stage (tiny: one line per DISTINCT word, post-aggregation), mirroring
    the reference's rank-0 gather (``hybrid.cpp:235-267``). At 100 TB the
    grouped result is ~vocabulary-sized, so this stays driver-safe; for
    genuinely huge outputs use the partitioned writer below.
    """
    lines = ranked.select(
        "rank_idx",
        F.concat(F.lit("["), "rank_idx", F.lit("] "), "word", F.lit(": "), "cnt").alias("value"),
    )
    spark = ranked.sparkSession
    header = [f"Filename: {header_file}"]
    if unique_line:
        header.append(f"Unique words found: {ranked.count()}")
    # coalesce() groups parent partitions by locality — it does NOT preserve
    # partition order, so "header partition first" can't be expressed with
    # union+coalesce. Key the header below every rank and sortByKey into a
    # single partition: deterministic total order, one small shuffle over
    # the vocabulary-sized output.
    sc = spark.sparkContext
    header_rdd = sc.parallelize(list(enumerate(header, start=-len(header))), 1)
    lines_rdd = lines.rdd.map(lambda r: (r["rank_idx"], r["value"]))
    keyed = header_rdd.union(lines_rdd)
    keyed.sortByKey(numPartitions=1).values().saveAsTextFile(out_path)


def write_sorted_counts(counts: DataFrame, out_path: str) -> None:
    """Scale path: globally sorted output as N range-partitioned files.

    ``orderBy`` range-partitions, so file k's words all sort before file
    k+1's — the concatenation of part files in name order is fully sorted
    (what a 1000-executor job would produce instead of one giant file).
    """
    counts.orderBy("word").write.mode("overwrite").parquet(out_path)

"""Sources: parquet star schema + raw-text corpus reader.

The reference's only source is whitespace-delimited text files fed on argv
(reference ``omp.cpp:52-82``: one reader task per file appending to a shared
queue; ``hybrid.cpp:321-397``: demand-driven file→rank assignment). In Spark
both collapse into ``spark.read.text(paths)`` — the driver schedules file
splits to executors natively, so there is nothing to hand-build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: All driver-generated tables (TESTDATA.md). One parquet file per table.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan — Catalyst pushes filters/projections into it.

    ``events.ts`` may be TIMESTAMP(NANOS) in the parquet footer, which Spark
    rejects by default (PARQUET_TYPE_ILLEGAL). In that case we read it as a
    long (legacy nanosAsLong conf) and convert ns → µs with INTEGER division
    (a double round-trip would lose precision: ns-epoch ≈ 1.7e18 > 2^53),
    matching DuckDB's own ns→µs truncation. When the footer already carries
    µs/ms precision Spark reads it natively (as TIMESTAMP_NTZ) and we cast
    NTZ → TIMESTAMP: under the pinned-UTC session timezone the cast is a
    pure re-tag of the same micros, and LTZ is what event-time watermarks
    require. Either path yields the identical TIMESTAMP column.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def load_text_corpus(
    spark: SparkSession, paths: list[str] | str, preserve_bom: bool = False
) -> DataFrame:
    """Reference-style source: text file(s) → rows of text + source file.

    Multi-file input is an implicit UNION ALL (reference ``omp.cpp:181-188``
    spawns one reader per argv file into one shared queue). Spark globs and
    unions natively. Adds ``source`` = input file name so the per-file
    (sequential-binary) semantics stay expressible.

    ``preserve_bom=True`` reads whole files through the binaryFile source:
    Hadoop's line reader silently strips a UTF-8 BOM at split start, but the
    reference treats those 3 bytes as word bytes (the committed golden
    counts ``\\ufeffthe`` separately from ``the`` — ``omp_out.txt`` last
    line). Whole-file rows lose intra-file split parallelism, so this is
    the fidelity path, not the scale path — file-level parallelism remains
    (one task per file, exactly the reference's reader model).
    """
    from pyspark.sql import functions as F

    if preserve_bom:
        df = spark.read.format("binaryFile").load(paths)
        return df.select(
            F.decode("content", "UTF-8").alias("text"),
            F.element_at(F.split(F.col("path"), "/"), -1).alias("source"),
        )
    df = spark.read.text(paths)
    return df.select(
        F.col("value").alias("text"),
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("source"),
    )

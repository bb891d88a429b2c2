"""Streaming queries in the driver contract (rows-only checks — watermarks
and incremental state aren't SQL-expressible; their batch twins ARE
oracle-backed, and tests/test_streaming.py proves stream==batch on replay,
which closes the loop)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from wordcount_spark.registry import register
from wordcount_spark.streaming.streams import (
    run_to_completion,
    streaming_windowed_counts,
    streaming_wordcount,
)


@register("streaming_wordcount")  # rows-only: streaming op
def q_streaming_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship word count as an incremental stream, run to completion over
    the finite test input via a memory sink."""
    return run_to_completion(
        streaming_wordcount(spark, sf_dir), "q_streaming_wordcount", "complete"
    )


@register("streaming_windowed_counts")  # rows-only: streaming op
def q_streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window event counts as a stream."""
    return run_to_completion(
        streaming_windowed_counts(spark, sf_dir), "q_streaming_windows", "complete"
    )

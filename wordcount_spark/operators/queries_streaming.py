"""Streaming queries in the driver contract (rows-only checks — watermarks
and incremental state aren't SQL-expressible; their batch twins ARE
oracle-backed, and tests/test_streaming.py proves stream==batch on replay,
which closes the loop)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wordcount_spark.registry import register
from wordcount_spark.streaming.streams import (
    run_to_completion,
    streaming_windowed_counts,
    streaming_wordcount,
)


def _streaming_wc_oracle() -> str:
    from wordcount_spark.operators.queries_wordcount import _wc_sql

    return _wc_sql()


# STRONG oracle despite being a streaming op: complete-mode state after
# consuming the whole finite input IS the batch word count, so the batch
# flagship's SQL checks the entire stream → state pipeline (same upgrade
# streaming_incremental_merge has; eager: the callable drives the stream)
@register("streaming_wordcount", _streaming_wc_oracle(), eager=True)
def q_streaming_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship word count as an incremental stream, run to completion over
    the finite test input via a memory sink; the final complete-mode state
    is hash-compared against the BATCH flagship's oracle — the strongest
    check a streaming op can carry.

    Scale: complete-mode aggregation state is O(vocab) (Zipf-bounded);
    each micro-batch does the same map-side-combinable count as the
    batch flagship — the shuffle is per-batch, not per-stream."""
    final = run_to_completion(
        streaming_wordcount(spark, sf_dir), "q_streaming_wordcount", "complete"
    )
    return final.select("word", F.col("count").alias("cnt")).orderBy("word")


@register("streaming_windowed_counts", eager=True)  # rows-only: streaming op
def q_streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window event counts as a stream.

    Scale: the watermark bounds window state to the lateness horizon —
    expired windows emit and evict, so state is O(active windows x
    types), independent of stream length."""
    return run_to_completion(
        streaming_windowed_counts(spark, sf_dir), "q_streaming_windows", "complete"
    )


@register("streaming_session_windows", eager=True)  # rows-only: streaming op
def q_streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 30-min session windows per user, replayed to completion
    (batch twin `window_session` is the oracle-backed shape).

    Scale: session state is per-user open sessions only; the watermark
    closes and evicts sessions past the horizon. One user-keyed
    state-store partitioning, same key as the batch sessionizers."""
    from wordcount_spark.streaming.streams import streaming_session_windows

    return run_to_completion(
        streaming_session_windows(spark, sf_dir), "q_streaming_sessions", "complete"
    )


@register("streaming_purchase_attribution", eager=True)  # rows-only: streaming op
def q_streaming_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchases × prior-hour clicks), both
    sides watermarked so join state stays time-bounded.

    Scale: the interval condition + watermarks bound both join buffers
    to the hour horizon — without them stream-stream join state grows
    unboundedly; with them it is O(events per horizon)."""
    from wordcount_spark.streaming.streams import streaming_purchase_attribution

    return run_to_completion(
        streaming_purchase_attribution(spark, sf_dir), "q_streaming_attr", "append"
    )


@register("streaming_dedup_events", eager=True)  # rows-only: streaming op
def q_streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark — bounded-state streaming exact dedup.

    Scale: the dedup key set is evicted past the watermark horizon —
    state O(distinct keys per horizon), the property that makes exact
    streaming dedup feasible at all at 100 TB/day."""
    from wordcount_spark.streaming.streams import streaming_dedup_events

    return run_to_completion(
        streaming_dedup_events(spark, sf_dir), "q_streaming_dedup", "append"
    )


@register("streaming_enrich_static_join", eager=True)  # rows-only: streaming op
def q_streaming_enrich_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment (event stream × batch profile)."""
    from wordcount_spark.streaming.streams import streaming_enrich_static_join

    return run_to_completion(
        streaming_enrich_static_join(spark, sf_dir), "q_streaming_enrich", "complete"
    )


@register(
    "streaming_incremental_merge",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_type,
           value AS last_value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) t
    WHERE rn = 1
    ORDER BY user_id
    """,
    eager=True,  # foreachBatch drives the stream inside the callable
)
def q_streaming_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch CDC apply: micro-batches of the events changelog merged
    into a running latest-per-user state. Unusually for a streaming op the
    FINAL state is exactly SQL-expressible (global latest per key), so
    this one gets the strong oracle, not a rows-only check — the whole
    stream → merge → state pipeline is differentially verified.

    Scale: each micro-batch merges O(batch keys) into the state table —
    the per-batch window dedup keys on user_id and the apply is an
    anti-join + union, never a full-state rewrite."""
    from wordcount_spark.streaming.streams import streaming_incremental_merge

    return streaming_incremental_merge(spark, sf_dir)


@register("streaming_agg_maintenance", eager=True)  # rows-only: streaming op
def q_streaming_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event_type aggregate maintained incrementally by foreachBatch
    retract/assert deltas; the batch twin `cdc_incremental_agg` carries
    the SQL oracle, and the slicing-invariance replay test closes the
    loop (tests/test_streaming.py).

    Scale: deltas are O(touched groups) per micro-batch (event_type
    cardinality), so the maintained table updates in group-sized writes
    regardless of stream volume."""
    from wordcount_spark.streaming.streams import streaming_agg_maintenance

    return streaming_agg_maintenance(spark, sf_dir)


@register("streaming_doc_quality_dedup", eager=True)  # rows-only: streaming op
def q_streaming_doc_quality_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus curation: quality gate (narrow, pre-state) +
    per-(lang, content-hash) duplicate accounting as the single streaming
    aggregation (batch twin: the gate+dedup prefix of the oracle-backed
    ``pipeline_curation``)."""
    from wordcount_spark.streaming.streams import streaming_doc_quality_dedup

    return run_to_completion(
        streaming_doc_quality_dedup(spark, sf_dir), "q_streaming_doc_curation",
        "complete",
    )


def _lsh_full_oracle() -> str:
    from wordcount_spark.operators.queries_dedup import _minhash_sql

    return _minhash_sql(32, 8, 4)


# STRONG oracle for a streaming op: every candidate pair is emitted
# exactly when its LATER member arrives, so the accumulated pair set
# after the finite replay equals the full-batch LSH pair set — the batch
# pipeline's SQL checks the whole stream→index→probe loop (slicing
# invariance proven in tests/test_streaming.py)
@register("streaming_lsh_incremental", _lsh_full_oracle(), eager=True)
def q_streaming_lsh_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates maintained as a stream: each
    micro-batch of documents probes the standing banded index, emits the
    pairs it creates, and appends its own band rows to the index
    (`streaming/streams.py::streaming_lsh_index_maintenance`).

    Scale: per batch the probe costs O(|Δ|·bands) rows joined against
    the bucketed index; the index state is the table a production LSH
    pipeline persists anyway. Old×old pairs never rejoin."""
    from wordcount_spark.streaming.streams import streaming_lsh_index_maintenance

    return streaming_lsh_index_maintenance(spark, sf_dir)


def _line_dedup_oracle() -> str:
    from wordcount_spark.registry import ORACLES

    return ORACLES["text_line_dedup_c4"]


# STRONG oracle for a streaming op: line ownership merges by MIN (a
# CRDT-style merge), so the accumulated owner of every line is the GLOBAL
# min doc_id no matter how the stream is sliced — the finite replay's
# final audit equals the batch text_line_dedup_c4 byte for byte (slicing
# invariance proven in tests/test_streaming.py)
@register("streaming_line_dedup", _line_dedup_oracle(), eager=True)
def q_streaming_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level dedup maintained as a stream: foreachBatch merges
    each micro-batch's line hashes into the standing ownership index
    with a min-merge and emits the per-document audit at the end
    (`streaming/streams.py::streaming_line_dedup`).

    Scale: per batch the merge touches O(batch lines) index keys; the
    ownership index is the dedup state a production crawl pipeline
    persists anyway. The batch twin's SQL is this query's full oracle."""
    from wordcount_spark.streaming.streams import streaming_line_dedup

    return streaming_line_dedup(spark, sf_dir)

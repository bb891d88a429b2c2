"""Custom Python DataSource (synthdocs): batch partitioning, determinism,
and micro-batch streaming with offset progression."""

from __future__ import annotations

import time

import pyspark.sql.functions as F
import pytest

from wordcount_spark.sources.pydatasource import SynthDocsDataSource


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(SynthDocsDataSource)


def _load(spark, **opts):
    r = spark.read.format("synthdocs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_rows_and_schema(spark):
    df = _load(spark, partitions=4, rows_per_partition=50, seed=7)
    assert df.count() == 200
    assert df.schema.simpleString() == (
        "struct<doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint>"
    )
    # one InputPartition per requested partition
    assert df.rdd.getNumPartitions() == 4


def test_batch_deterministic_and_ids_unique(spark):
    def corpus_hash(df):
        return df.agg(F.bit_xor(F.xxhash64(*df.columns))).collect()[0][0]

    a = _load(spark, partitions=3, rows_per_partition=40, seed=11)
    b = _load(spark, partitions=3, rows_per_partition=40, seed=11)
    assert corpus_hash(a) == corpus_hash(b)
    assert a.select("doc_id").distinct().count() == 120
    # different seed -> different corpus
    c = _load(spark, partitions=3, rows_per_partition=40, seed=12)
    assert corpus_hash(c) != corpus_hash(a)


def test_batch_content_independent_of_partitioning(spark):
    """Same (seed, total rows) sliced 2 ways must be the same corpus —
    doc content is a function of doc_id, not of partition layout."""
    a = _load(spark, partitions=2, rows_per_partition=60, seed=5)
    b = _load(spark, partitions=6, rows_per_partition=20, seed=5)
    assert sorted(a.collect()) == sorted(b.collect())


def test_stream_microbatches_advance(spark, tmp_path):
    df = (
        spark.readStream.format("synthdocs")
        .option("batch_rows", 25)
        .option("seed", 3)
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("synthdocs_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            n = spark.sql("SELECT count(*) c FROM synthdocs_sink").collect()[0].c
            if n >= 50:  # at least two micro-batches landed
                break
            time.sleep(0.5)
    finally:
        q.stop()
    # source is unbounded — counts are only stable once the query is stopped
    n, ids = spark.sql(
        "SELECT count(*) c, count(DISTINCT doc_id) d FROM synthdocs_sink"
    ).collect()[0]
    assert n >= 50 and n % 25 == 0
    assert ids == n  # offsets advance, no batch replayed into the sink


def test_stream_wordcount_parity_with_batch(spark, tmp_path):
    """synthdocs stream → reference normalization → incremental count must
    equal the batch word count over the same doc range (stream ≡ batch)."""
    from wordcount_spark.operators.wordcount import words_from_text

    stream = (
        spark.readStream.format("synthdocs")
        .option("batch_rows", 200)
        .option("max_rows", 600)  # finite stream -> deterministic range
        .option("seed", 9)
        .load()
    )
    counts = words_from_text(stream).groupBy("word").count()
    q = (
        counts.writeStream.format("memory")
        .queryName("synth_wc")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "wc_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()  # drains exactly docs [0, 600)
    finally:
        q.stop()
    stream_rows = {
        (r.word, r["count"])
        for r in spark.sql("SELECT word, count FROM synth_wc").collect()
    }
    batch = _load(spark, partitions=4, rows_per_partition=150, seed=9)
    batch_rows = {
        (r.word, r.cnt)
        for r in words_from_text(batch)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert stream_rows == batch_rows


def test_jsonldir_writer_commit_protocol(spark, tmp_path):
    """Happy path: every task's file lands, the manifest is the source of
    truth, and re-reading the committed files reproduces the data."""
    import json
    import os

    from wordcount_spark.sources.pydatasource import JsonlDirDataSource

    spark.dataSource.register(JsonlDirDataSource)
    out = str(tmp_path / "sink")
    df = spark.range(0, 100, 1, 4).selectExpr(
        "id", "concat('row-', id) AS tag"
    )
    df.write.format("jsonldir").option("path", out).mode("append").save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST")))
    assert manifest["total_rows"] == 100
    assert len(manifest["files"]) == 4  # one per partition
    got = []
    for entry in manifest["files"]:
        fpath = os.path.join(out, entry["file"])
        assert not fpath.endswith(".tmp")
        with open(fpath) as f:
            rows = [json.loads(line) for line in f]
        assert len(rows) == entry["rows"]
        got.extend(rows)
    assert sorted((r["id"], r["tag"]) for r in got) == [
        (i, f"row-{i}") for i in range(100)
    ]
    # no stray temp files survive a successful commit
    assert not [n for n in os.listdir(out) if n.endswith(".tmp")]


def test_jsonldir_writer_abort_leaves_nothing_visible(spark, tmp_path):
    """Failure path: a task that keeps failing aborts the job — no
    manifest is written, so readers see NO output (torn temp files from
    other tasks are invisible garbage at worst, swept by abort())."""
    import os

    import pytest as _pytest

    from wordcount_spark.sources.pydatasource import JsonlDirDataSource

    spark.dataSource.register(JsonlDirDataSource)
    out = str(tmp_path / "sink")
    df = spark.range(0, 100, 1, 4).selectExpr("id")
    with _pytest.raises(Exception, match="injected failure"):
        (
            df.write.format("jsonldir")
            .option("path", out)
            .option("fail_partition", "2")
            .mode("append")
            .save()
        )
    assert not os.path.exists(os.path.join(out, "_MANIFEST"))
    assert not [
        n for n in os.listdir(out) if n.endswith(".jsonl")
    ] if os.path.exists(out) else True


def test_jsonldir_append_merges_manifest_overwrite_replaces(spark, tmp_path):
    """Second append must MERGE into the manifest (no committed file ever
    drops out); overwrite must replace both manifest and data files."""
    import json
    import os

    from wordcount_spark.sources.pydatasource import JsonlDirDataSource

    spark.dataSource.register(JsonlDirDataSource)
    out = str(tmp_path / "sink")

    def manifest():
        return json.load(open(os.path.join(out, "_MANIFEST")))

    df1 = spark.range(0, 10, 1, 2).selectExpr("id")
    df2 = spark.range(10, 30, 1, 2).selectExpr("id")
    df1.write.format("jsonldir").option("path", out).mode("append").save()
    df2.write.format("jsonldir").option("path", out).mode("append").save()
    m = manifest()
    assert m["total_rows"] == 30 and len(m["files"]) == 4

    df3 = spark.range(100, 105, 1, 1).selectExpr("id")
    df3.write.format("jsonldir").option("path", out).mode("overwrite").save()
    m = manifest()
    assert m["total_rows"] == 5 and len(m["files"]) == 1
    # old data files are gone from disk, not just from the manifest
    on_disk = [n for n in os.listdir(out) if n.endswith(".jsonl")]
    assert sorted(on_disk) == sorted(e["file"] for e in m["files"])


def test_stream_checkpoint_restart_exactly_once(spark, tmp_path):
    """Checkpointed restart of the synthdocs stream: run 1 drains a finite
    stream (max_rows=300) into a parquet file sink and stops; run 2 reopens
    the SAME checkpoint with a raised bound (max_rows=600). The persisted
    offset must carry over — run 2 starts at doc_id 300, emits ONLY the 300
    new rows, and the sink (exactly-once via its metadata log) ends up with
    each of the 600 doc_ids exactly once."""
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run(max_rows: int):
        stream = (
            spark.readStream.format("synthdocs")
            .option("batch_rows", 100)
            .option("seed", 11)
            .option("max_rows", max_rows)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            return list(q.recentProgress)
        finally:
            q.stop()

    run(300)
    first = spark.read.parquet(out)
    assert first.count() == 300

    progress = run(600)
    resumed_rows = sum(p["numInputRows"] for p in progress)
    assert resumed_rows == 300, resumed_rows  # offset resumed, no re-read

    final = spark.read.parquet(out)
    assert final.count() == 600
    # exactly-once: every doc_id present exactly once, ids 0..599
    ids = [r["doc_id"] for r in final.select("doc_id").collect()]
    assert sorted(ids) == list(range(600))

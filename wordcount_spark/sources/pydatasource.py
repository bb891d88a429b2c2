"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API): a
deterministic synthetic-documents generator, batch + streaming.

Why a generator source: at 100 TB you scale-test the engine by *generating*
the corpus on the executors instead of copying it through storage — the
source fans out one InputPartition per requested partition, each seeded
independently, so 1000 executors synthesize 1000 slices in parallel with
zero I/O and bit-reproducible content (seed option). The reference's only
source is whitespace-token text files (SURVEY.md §2.1); this is the
extension-surface counterpart for connector extensibility.

Batch:   spark.read.format("synthdocs").option("partitions", 8)
             .option("rows_per_partition", 1000).option("seed", 42).load()
Stream:  spark.readStream.format("synthdocs").option("batch_rows", 100)...
         (offset = next doc_id — resume-safe, exactly-once with a
         replayable deterministic payload).

Registration is per-session: `spark.dataSource.register(SynthDocsDataSource)`.
"""

from __future__ import annotations

import random
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

#: same flavor of vocabulary as the driver's synthetic documents table
_WORDS = (
    "the data spark table row column scan filter join group agg sort merge "
    "hash key value batch stream window part order line customer query fast "
    "slow small large dup stale fresh token text lang doc count"
).split()

_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
_LANGS = ["en", "de", "fr", "es", "zh"]
_SOURCES = ["web", "books", "wiki", "code"]


def _make_doc(doc_id: int, seed: int) -> tuple:
    """One deterministic document row: content is a pure function of
    (seed, doc_id), independent of partition layout — repartitioning the
    source never changes the data, only its placement."""
    rng = random.Random((seed << 32) ^ doc_id)
    n = rng.randint(5, 120)
    text = " ".join(rng.choice(_WORDS) for _ in range(n))
    return (
        doc_id,
        text,
        rng.choice(_LANGS),
        rng.choice(_SOURCES),
        len(text),
    )


class _Slice(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SynthDocsBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_parts = int(options.get("partitions", "4"))
        self.rows = int(options.get("rows_per_partition", "100"))
        self.seed = int(options.get("seed", "42"))

    def partitions(self) -> list[InputPartition]:
        return [
            _Slice(i * self.rows, (i + 1) * self.rows, self.seed)
            for i in range(self.n_parts)
        ]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield _make_doc(doc_id, partition.seed)


class SynthDocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch generator: offset = next doc_id to emit. read() is
    deterministic given the offset, so failed batches replay identically
    (the exactly-once contract the foreachBatch sink test relies on).
    `max_rows` bounds the stream (empty batch + unchanged offset once
    exhausted) — a finite replay for stream≡batch parity tests; omit it
    for an unbounded feed."""

    def __init__(self, options: dict):
        self.batch_rows = int(options.get("batch_rows", "100"))
        self.seed = int(options.get("seed", "42"))
        self.max_rows = int(options.get("max_rows", "-1"))

    def initialOffset(self) -> dict:
        return {"next_id": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["next_id"]
        hi = lo + self.batch_rows
        if self.max_rows >= 0:
            hi = min(hi, self.max_rows)
        return (
            iter([_make_doc(i, self.seed) for i in range(lo, hi)]),
            {"next_id": hi},
        )


class SynthDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> SynthDocsBatchReader:
        return SynthDocsBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SynthDocsStreamReader:
        return SynthDocsStreamReader(self.options)


class _JsonlCommit(WriterCommitMessage):
    """Per-task commit message: which temp file the task produced."""

    def __init__(self, tmp_name: str, n_rows: int):
        self.tmp_name, self.n_rows = tmp_name, n_rows


class JsonlDirWriter(DataSourceWriter):
    """Batch writer with the standard two-phase commit protocol: every
    task writes to a uniquely-named ``*.tmp`` file and reports it in its
    commit message; only the DRIVER's commit() makes data visible, by
    renaming the temp files and writing a ``_MANIFEST`` listing them.
    Readers trust the manifest alone, so a job that dies mid-write (or a
    zombie task attempt racing a retry — each attempt has its own uuid)
    leaves invisible garbage, never torn output. The manifest write is
    itself tmp+rename-atomic; ``append`` merges the new files into the
    existing manifest, ``overwrite`` deletes the previously committed
    files first. abort() sweeps the temp files, including orphans from
    attempts that died before reporting (single-writer directory by
    contract). This mirrors what Hadoop FileOutputCommitter v1 / Iceberg
    snapshot commit do; at cluster scale the rename-based commit assumes
    a filesystem with atomic rename (HDFS/local — for S3 you'd commit a
    manifest pointing at the temp names instead of renaming)."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite
        self.fail_partition = int(options.get("fail_partition", "-1"))

    def write(self, rows: Iterator) -> "_JsonlCommit":
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        if pid == self.fail_partition:  # test hook: deterministic task failure
            raise RuntimeError(f"injected failure in partition {pid}")
        os.makedirs(self.path, exist_ok=True)
        tmp = f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl.tmp"
        n = 0
        with open(os.path.join(self.path, tmp), "w") as f:
            for row in rows:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _JsonlCommit(tmp, n)

    def commit(self, messages) -> None:
        import json
        import os

        manifest_path = os.path.join(self.path, "_MANIFEST")
        prior = []
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                prior = json.load(f)["files"]
        final = [] if self.overwrite else list(prior)
        for m in messages:
            name = m.tmp_name[: -len(".tmp")]
            os.replace(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, name),
            )
            final.append({"file": name, "rows": m.n_rows})
        total = sum(e["rows"] for e in final)
        # the manifest itself commits atomically: tmp + rename, the same
        # medicine the data files get — a driver crash mid-commit leaves
        # either the old manifest or the new one, never a torn file
        mtmp = manifest_path + ".tmp"
        with open(mtmp, "w") as f:
            json.dump({"files": final, "total_rows": total}, f)
        os.replace(mtmp, manifest_path)
        if self.overwrite:
            # superseded files are deleted only AFTER the new manifest is
            # live: a crash anywhere above leaves the OLD manifest with
            # every file it lists intact; a crash below leaves invisible
            # garbage (files no manifest references), never torn output
            kept = {e["file"] for e in final}
            for entry in prior:
                if entry["file"] in kept:
                    continue
                try:
                    os.remove(os.path.join(self.path, entry["file"]))
                except FileNotFoundError:
                    pass

    def abort(self, messages) -> None:
        import glob
        import os

        for m in messages:
            if m is None:
                continue  # failed task produced no commit message
            try:
                os.remove(os.path.join(self.path, m.tmp_name))
            except FileNotFoundError:
                pass
        # sweep orphans from attempts that died before reporting a commit
        # message (single-writer directory by contract — a concurrent
        # job's in-flight temps would be swept too)
        for orphan in glob.glob(
            os.path.join(glob.escape(self.path), "*.jsonl.tmp")
        ):
            try:
                os.remove(orphan)
            except FileNotFoundError:
                pass


class JsonlDirDataSource(DataSource):
    """`df.write.format("jsonldir").option("path", d).mode("append").save()`
    — manifest-committed JSON-lines directory sink (see JsonlDirWriter)."""

    @classmethod
    def name(cls) -> str:
        return "jsonldir"

    def writer(self, schema, overwrite: bool) -> JsonlDirWriter:
        return JsonlDirWriter(self.options, overwrite)

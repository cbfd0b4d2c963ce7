"""Custom source via the Python Data Source API (Spark 4) — a
deterministic synthetic-document generator, registered as a real
``spark.read.format(...)`` source.

Why this exists: a 100 TB ingest often starts from a system Spark has no
connector for. The Python Data Source API is the Spark-4-native answer —
the source declares its schema and partition list on the driver, and each
``InputPartition`` is read independently on executors (plan-level
parallelism, no driver data path). This module is the engine's template
for writing one: partition planning, per-partition deterministic
generation, and option handling.

Determinism: row content is a pure function of (doc_id), so any reader
(any partitioning) produces the same table — no RNG state on executors.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_WORDS = [
    "spark", "table", "row", "batch", "query", "join", "scan", "merge",
    "filter", "window", "stream", "vector", "column", "key", "hash",
]

SYNTH_SCHEMA_DDL = "doc_id BIGINT, text STRING, n_words INT"


def _make_doc(doc_id: int) -> tuple[int, str, int]:
    # pure function of doc_id: length 5..20 words, word picked by a
    # multiplicative congruence — reproducible on any executor
    n = 5 + (doc_id * 2654435761) % 16
    words = [_WORDS[((doc_id + 1) * 40503 * (i + 1)) % len(_WORDS)] for i in range(n)]
    return (doc_id, " ".join(words), n)


class _Partition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_docs = int(options.get("numdocs", 1000))
        self.n_partitions = int(options.get("numpartitions", 8))

    def partitions(self) -> list[InputPartition]:
        per = -(-self.n_docs // self.n_partitions)  # ceil division
        return [
            _Partition(lo, min(lo + per, self.n_docs))
            for lo in range(0, self.n_docs, per)
        ]

    def read(self, partition: _Partition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield _make_doc(doc_id)


class SyntheticDocsSource(DataSource):
    """``spark.read.format("synthetic_docs").option("numDocs", N)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str | StructType:
        return SYNTH_SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticDocsReader(self.options)


class _CommitMessage(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int) -> None:
        self.path = path
        self.n_rows = n_rows


class ManifestJsonlWriter(DataSourceWriter):
    """Per-partition task writer for the manifest sink.

    Each task writes its rows to a uniquely-named part file and returns a
    commit message; only the DRIVER's commit() publishes the manifest —
    readers that respect the manifest never see half-written output
    (the two-phase commit shape every distributed sink needs)."""

    def __init__(self, path: str) -> None:
        self.path = path

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        part = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(part, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _CommitMessage(part, n)

    def commit(self, messages):
        import json
        import os

        manifest = {
            "files": sorted(os.path.basename(m.path) for m in messages),
            "n_rows": sum(m.n_rows for m in messages),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages):
        import os

        for m in messages:
            if os.path.exists(m.path):
                os.remove(m.path)


class ManifestJsonlSink(DataSource):
    """``df.write.format("manifest_jsonl").option("path", ...)`` — JSONL
    files plus a driver-committed ``_MANIFEST.json`` naming exactly the
    files (and row count) of the successful write."""

    @classmethod
    def name(cls) -> str:
        return "manifest_jsonl"

    def writer(self, schema: StructType, overwrite: bool):
        return ManifestJsonlWriter(self.options["path"])


def register(spark) -> None:
    spark.dataSource.register(SyntheticDocsSource)
    spark.dataSource.register(ManifestJsonlSink)

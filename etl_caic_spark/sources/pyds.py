"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) — a
partition-parallel deterministic sequence source.

This is the engine's template for "the data lives behind an API Spark has
no connector for": implement `partitions()` so every executor reads its
own slice concurrently (the reference's REST snapshot source — sources/
rest.py, task.ts:88-107 — is the DRIVER-side variant for O(10²)-row
payloads; this is the shape to use when the remote system supports
range/offset reads and the payload is large). The generated rows are a
pure function of the row id, so a SQL oracle reproduces the content
exactly and the driver can hash-match a custom-source scan end-to-end.

Scale: `parts` maps 1:1 to Spark input partitions — 1000 executors get
1000 independent slices, no driver bottleneck, no shuffle. The id space
is strided (partition i owns ids ≡ i mod parts), so slices are
equal-sized regardless of n.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


@dataclass
class JsonlCommit(WriterCommitMessage):
    """Task-attempt result: temp file to promote, final name, row count."""

    tmp: str
    final: str
    rows: int

# Knuth's multiplicative hash constant; id < ~4e9 keeps id*K < 2^63.
_K = 2654435761
_M = 1000003  # prime modulus for the derived value


class SynthSeqDataSource(DataSource):
    """`spark.read.format("synthseq").option("n", N).option("parts", P)`."""

    @classmethod
    def name(cls) -> str:
        return "synthseq"

    def schema(self) -> str:
        return "id bigint, part int, val bigint, label string"

    def reader(self, schema) -> "SynthSeqReader":
        return SynthSeqReader(self.options)

    def simpleStreamReader(self, schema) -> "SynthSeqStreamReader":
        return SynthSeqStreamReader(self.options)


class SynthSeqReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        i = partition.value
        for rid in range(i, self.n, self.parts):
            yield (rid, rid % self.parts, (rid * _K) % _M, f"p{rid % 7}")


def register_synthseq(spark) -> None:
    """Idempotent registration of the source with a session."""
    spark.dataSource.register(SynthSeqDataSource)


class SynthSeqStreamReader(SimpleDataSourceStreamReader):
    """Offset-based streaming read of the same deterministic sequence —
    Spark 4 `SimpleDataSourceStreamReader`: the engine calls
    initialOffset()/read(start) per micro-batch and checkpoints the
    returned offsets; readBetweenOffsets replays a committed range after
    failure, which is trivially exact here because rows are a pure
    function of position. This is the template for cursor/offset APIs
    (change feeds, paginated REST) — the source of truth for progress is
    the CHECKPOINT, not the remote system."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))
        self.batch = int(options.get("rowsPerBatch", 500))

    def initialOffset(self):
        return {"pos": 0}

    def _rows(self, lo: int, hi: int):
        return iter(
            [
                (rid, rid % self.parts, (rid * _K) % _M, f"p{rid % 7}")
                for rid in range(lo, hi)
            ]
        )

    def read(self, start):
        lo = start["pos"]
        hi = min(lo + self.batch, self.n)
        return self._rows(lo, hi), {"pos": hi}

    def readBetweenOffsets(self, start, end):
        return self._rows(start["pos"], end["pos"])


class JsonlSinkDataSource(DataSource):
    """`df.write.format("jsonlsink").option("path", p).mode(...).save()` —
    a custom Python DataSource WRITER (Spark 4 `DataSourceWriter`): the
    sink-side twin of SynthSeqDataSource's reader, completing the
    custom-connector surface (batch read / stream read / batch write).

    The full two-phase commit protocol is implemented: each task writes
    its partition to a hidden temp file and returns the pair in its
    WriterCommitMessage; only the driver-side commit() renames temps to
    final names, and abort() deletes them — so a failed/speculated task
    attempt can never leave a half-visible file. That protocol, not the
    serialization, is the point of a writer API: it is what makes the
    sink exactly-once per job on any shared filesystem (local mode here;
    object storage with atomic rename/put on a cluster)."""

    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def schema(self) -> str:  # not used for writes; required by the API
        return "id bigint"

    def writer(self, schema, overwrite: bool) -> "JsonlWriter":
        return JsonlWriter(self.options, schema, overwrite)


class JsonlWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlsink requires .option('path', ...)")
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, iterator):
        import json as _json
        import os
        import uuid as _uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".tmp-{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(
                    _json.dumps(dict(zip(self.fields, row)), sort_keys=True)
                )
                fh.write("\n")
                n += 1
        final = os.path.join(self.path, f"part-{pid:05d}.jsonl")
        return JsonlCommit(tmp=tmp, final=final, rows=n)

    def commit(self, messages):
        import os
        import shutil

        if self.overwrite:
            keep = {m.tmp for m in messages if m is not None}
            for name in os.listdir(self.path):
                p = os.path.join(self.path, name)
                if p not in keep and not name.startswith(".tmp-"):
                    (shutil.rmtree if os.path.isdir(p) else os.remove)(p)
        for m in messages:
            if m is not None:
                os.replace(m.tmp, m.final)

    def abort(self, messages):
        import os

        for m in messages or []:
            if m is not None and os.path.exists(m.tmp):
                os.remove(m.tmp)


def register_jsonlsink(spark) -> None:
    """Idempotent registration of the sink with a session."""
    spark.dataSource.register(JsonlSinkDataSource)

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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

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

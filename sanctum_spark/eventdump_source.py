"""Custom Spark 4 Python DataSource for the engine's event-dump format.

The reference's debug sink (`--dump-events`, src/main.zig:226-236) prints
one base64-msgpack inspection URL per event. This module makes that
format a first-class, partition-parallel Spark source AND sink:

    spark.dataSource.register(EventDumpDataSource)
    df = spark.read.format("sanctum_eventdump").load("/path/to/dumps")
    df.write.format("sanctum_eventdump").mode("append").save("/out/dir")

Schema (fixed, relational-friendly, lossless):
  event_id long, user_id long, event_type string, value double,
  payload binary — `payload` is the EXACT msgpack bytes, so a
  read→write→read round trip is byte-identical even for events carrying
  keys outside the canonical columns (the schemaless part of the
  reference's event model, SURVEY §1.3).

Scale notes: one input partition per file (a 100 TB dump tree fans out
across executors; pair with small-file compaction at write time);
reading is pure-Python but each partition streams line-by-line — no
driver collection. The writer emits one file per task partition
(standard distributed-sink layout).
"""

from __future__ import annotations

import base64
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

URL_PREFIX = "https://msgpack.dbrgn.ch/#base64="

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("payload", BinaryType()),
    ]
)


def _decode_line(line: str) -> bytes:
    """Dump line → msgpack bytes, undoing the reference's quirk of
    url-escaping only the LAST '=' padding char ('=%3D')."""
    s = line.strip()
    if s.startswith(URL_PREFIX):
        s = s[len(URL_PREFIX) :]
    if s.endswith("%3D"):
        s = s[:-3] + "="
    return base64.b64decode(s)


def _encode_line(payload: bytes) -> str:
    b64 = base64.b64encode(payload).decode("ascii")
    if b64.endswith("="):
        b64 = b64[:-1] + "%3D"
    return URL_PREFIX + b64


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class EventDumpReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sanctum_eventdump requires a path")

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if not f.startswith((".", "_"))
            )
        else:
            files = [self.path]
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        # imported on the executor, not pickled from the driver
        from sanctum_spark.codec.msgpack_codec import unpack

        with open(partition.path) as fh:
            for line in fh:
                if not line.strip():
                    continue
                payload = _decode_line(line)
                ev = unpack(payload)
                yield (
                    int(ev["event_id"]) if "event_id" in ev else None,
                    int(ev["user_id"]) if "user_id" in ev else None,
                    ev.get("event_type"),
                    float(ev["value"]) if "value" in ev else None,
                    payload,
                )


class EventDumpWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sanctum_eventdump requires a path")

    def write(self, rows) -> WriterCommitMessage:
        from sanctum_spark.codec.msgpack_codec import pack

        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{uuid.uuid4().hex}.dump")
        n = 0
        with open(out, "w") as fh:
            for row in rows:
                payload = row["payload"]
                if payload is None:
                    ev = {
                        k: row[k]
                        for k in ("event_id", "user_id", "event_type", "value")
                        if row[k] is not None
                    }
                    payload = pack(ev)
                fh.write(_encode_line(bytes(payload)) + "\n")
                n += 1
        return WriterCommitMessage()


class EventDumpDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sanctum_eventdump"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> EventDumpReader:
        return EventDumpReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> EventDumpWriter:
        return EventDumpWriter(self.options)

    def simpleStreamReader(self, schema: StructType) -> "EventDumpStreamReader":
        return EventDumpStreamReader(self.options)


class EventDumpStreamReader(SimpleDataSourceStreamReader):
    """Streaming reads of a dump directory: each micro-batch picks up the
    files that appeared since the last committed offset.

    Offset = the lexicographically largest filename consumed so far, so
    the producer contract is log-roll naming (monotonically increasing
    filenames, e.g. zero-padded sequence numbers or timestamp prefixes —
    the layout every log-rolling writer already produces). Files sorting
    at or below the offset are never re-read; replay between offsets is
    exact (readBetweenOffsets), which is what gives the source
    exactly-once semantics under checkpoint recovery.
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sanctum_eventdump requires a path")

    def initialOffset(self) -> dict:
        return {"last": ""}

    def _files_after(self, last: str, upto: str | None = None) -> list[str]:
        if not os.path.isdir(self.path):
            return []
        names = sorted(
            f for f in os.listdir(self.path) if not f.startswith((".", "_"))
        )
        return [
            os.path.join(self.path, f)
            for f in names
            if f > last and (upto is None or f <= upto)
        ]

    def _read_files(self, files: list[str]):
        from sanctum_spark.codec.msgpack_codec import unpack

        for path in files:
            with open(path) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    payload = _decode_line(line)
                    ev = unpack(payload)
                    yield (
                        int(ev["event_id"]) if "event_id" in ev else None,
                        int(ev["user_id"]) if "user_id" in ev else None,
                        ev.get("event_type"),
                        float(ev["value"]) if "value" in ev else None,
                        payload,
                    )

    def read(self, start: dict):
        files = self._files_after(start.get("last", ""))
        if not files:
            return iter([]), start
        end = {"last": os.path.basename(files[-1])}
        # a list ITERATOR, not a generator: the harness both pickles the
        # prefetched batch (generators can't pickle) and calls next() on
        # it (bare lists fail); iter(list) satisfies both
        return iter(list(self._read_files(files))), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            list(
                self._read_files(
                    self._files_after(start.get("last", ""), end.get("last", ""))
                )
            )
        )

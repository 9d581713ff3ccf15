"""Spark-native connector surface: a Python DataSource (Spark 4 API)
for the connector landing zone.

The driver-side connectors (GSheet/Samba/BACEN/CKAN — io/gsheet.py,
io/samba.py, io/bacen_sta.py) land small payloads through
`small_table_from_records` (operators/copy.py), which is correct for
spreadsheet-sized data but serializes the whole payload through the
driver. This DataSource is the SCALE path: the payload is staged as a
directory of JSONL chunk files (one per worksheet/share file/API page),
the driver only LISTS the chunks, and each chunk is fetched and parsed
on an EXECUTOR — `spark.read.format("fastetl_landing")` behaves like
any other distributed source (one partition per chunk, pipelined with
downstream stages, no driver bottleneck).

Usage:
    spark.dataSource.register(LandingDataSource)
    df = (spark.read.format("fastetl_landing")
          .schema("name string, qty bigint")
          .option("path", staging_dir).load())
    df.write.format("fastetl_landing").option("path", out_dir).save()
"""

from __future__ import annotations

import json
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
from pyspark.sql.types import StructType


class _ChunkPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class LandingReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fastetl_landing requires option 'path'")
        self.schema = schema

    def partitions(self):
        # driver work is a LISTING only; content is never opened here
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".jsonl")
        )
        return [_ChunkPartition(f) for f in files]

    def read(self, partition: _ChunkPartition):
        # runs on an executor: fetch + parse one chunk. With ZERO chunks
        # partitions() returned [], and Spark still invokes read once
        # with partition=None — that is an empty source, not an error.
        if partition is None:
            return
        names = [f.name for f in self.schema.fields]
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                rec = json.loads(line)
                yield tuple(rec.get(n) for n in names)


class _LandingCommit(WriterCommitMessage):
    def __init__(self, file: str):
        self.file = file


class LandingWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fastetl_landing requires option 'path'")
        self.schema = schema
        self.overwrite = overwrite

    def write(self, iterator):
        # one chunk file per partition, unique name (idempotent retries:
        # a failed task's orphan file is never committed)
        os.makedirs(self.path, exist_ok=True)
        names = [f.name for f in self.schema.fields]
        out = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(out, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(names, row)), default=str) + "\n")
                n += 1
        return _LandingCommit(out)

    def commit(self, messages):
        if self.overwrite:
            committed = {m.file for m in messages if m is not None}
            for f in os.listdir(self.path):
                full = os.path.join(self.path, f)
                if f.endswith(".jsonl") and full not in committed:
                    os.remove(full)

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


class LandingStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin: each NEWLY LANDED chunk becomes part of the next
    micro-batch. The offset is the count of chunks already processed in
    sorted-name order, so the contract is append-only landing with
    monotonically sortable chunk names (part-<seq>/uuid timestamps —
    what every exporter produces); a chunk sorting BEFORE an already
    processed name would be silently skipped, exactly like Spark's own
    file source with latestFirst=false and a moved file."""

    def __init__(self, options: dict, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fastetl_landing requires option 'path'")
        self.schema = schema

    def _files(self) -> list[str]:
        return sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".jsonl")
        )

    def initialOffset(self):
        return {"n": 0}

    def _rows_for(self, files: list[str]):
        names = [f.name for f in self.schema.fields]
        for path in files:
            with open(path, encoding="utf-8") as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    rec = json.loads(line)
                    yield tuple(rec.get(n) for n in names)

    def read(self, start: dict):
        # materialized list, not a generator: the simple-reader protocol
        # pickles the prefetched batch into the offset cache. Fine here
        # by construction — landing chunks are connector-page sized.
        files = self._files()
        new = files[start["n"]:]
        return list(self._rows_for(new)), {"n": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay for recovery: deterministic because chunk files are
        # immutable once landed
        files = self._files()
        return list(self._rows_for(files[start["n"]:end["n"]]))


class LandingDataSource(DataSource):
    """`fastetl_landing` — JSONL-chunk landing zone as a first-class
    Spark source/sink via the Python DataSource API."""

    @classmethod
    def name(cls) -> str:
        return "fastetl_landing"

    def schema(self):
        raise ValueError(
            "fastetl_landing: pass an explicit .schema(...) — landing "
            "chunks are schemaless JSONL and inference would cost a "
            "full pre-read of remote payloads"
        )

    def reader(self, schema: StructType) -> LandingReader:
        return LandingReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> LandingWriter:
        return LandingWriter(self.options, schema, overwrite)

    def simpleStreamReader(self, schema: StructType) -> LandingStreamReader:
        return LandingStreamReader(self.options, schema)

"""Streaming upsert wire protocol: binary frames, vector batch codec,
backpressure gate, driver pipeline, distributed frame decoding
(reference: /root/reference/src/experimental/streaming_upsert.rs —
FRAME_MAGIC/PROTOCOL_VERSION :62-67, FrameType :69-101, Frame
encode/decode :108-166, VectorRecord/VectorBatch :174-229,
to_bytes/from_bytes layout :204-320, VectorBatchBuilder :320-360,
BackpressureGate :379-436, StreamingUpsertConfig :443-520,
UpsertPipeline :583-779 (submit :622, drain :667, flush :680,
encode/decode_batch_frame :735-772), ThroughputTracker :884-941).

Wire parity: the byte layouts match the reference exactly (magic
"NV", version 1, little-endian u64 sequence + u32 lengths; batch =
dim u32 | count u32 then per record id_len u16 | id | dim*f32 |
meta_len u32 | meta JSON), so frames produced by either engine decode
in the other.

Spark-first angle: a stream of binary frames is just a binary COLUMN.
`frames_to_df` decodes it scale-out — one mapInPandas stage turns
each executor's slice of frames into (sequence_id, id, vector,
metadata) rows that feed the catalog's idempotent MERGE — the
reference's single-process pipeline becomes an embarrassingly
parallel decode.  Backpressure levels map onto the bounded-buffer
machinery in streaming/reliability.py; the gate here is the protocol
object peers consult before sending.
"""

from __future__ import annotations

import json
import struct
import time as _time
from dataclasses import dataclass, field
from enum import IntEnum
from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

FRAME_MAGIC = b"NV"
PROTOCOL_VERSION = 1
_HEADER = struct.Struct("<2sBBQI")        # magic, version, type, seq, len
HEADER_SIZE = _HEADER.size                # 16


class FrameType(IntEnum):
    """streaming_upsert.rs:69-101."""

    VECTOR_BATCH = 0x01
    CONTROL = 0x02
    ACK = 0x03
    BACKPRESSURE = 0x04
    HEARTBEAT = 0x05


@dataclass
class Frame:
    """Length-prefixed wire frame (streaming_upsert.rs:108-166)."""

    frame_type: FrameType
    sequence_id: int
    payload: bytes = b""

    def encode(self) -> bytes:
        return _HEADER.pack(FRAME_MAGIC, PROTOCOL_VERSION,
                            int(self.frame_type), self.sequence_id,
                            len(self.payload)) + self.payload

    @staticmethod
    def decode(buf: bytes, offset: int = 0) -> tuple["Frame", int]:
        """Returns (frame, bytes consumed from offset)."""
        if len(buf) - offset < HEADER_SIZE:
            raise ValueError("Buffer too small for frame header")
        magic, _version, ftype, seq, plen = _HEADER.unpack_from(buf, offset)
        if magic != FRAME_MAGIC:
            raise ValueError("Invalid frame magic")
        if len(buf) - offset < HEADER_SIZE + plen:
            raise ValueError("Buffer too small for frame payload")
        payload = bytes(buf[offset + HEADER_SIZE:offset + HEADER_SIZE + plen])
        return Frame(FrameType(ftype), seq, payload), HEADER_SIZE + plen


def iter_frames(buf: bytes) -> Iterator[Frame]:
    """Walk a buffer of concatenated frames."""
    off = 0
    while off < len(buf):
        frame, used = Frame.decode(buf, off)
        yield frame
        off += used


# ---------------------------------------------------------------------------
# Vector batch codec (streaming_upsert.rs:174-320)


@dataclass
class VectorRecord:
    id: str
    vector: list[float]
    metadata: Any = None


@dataclass
class VectorBatch:
    dimension: int
    records: list[VectorRecord] = field(default_factory=list)

    def __len__(self) -> int:
        return len(self.records)

    def to_bytes(self) -> bytes:
        out = bytearray()
        out += struct.pack("<II", self.dimension, len(self.records))
        for rec in self.records:
            idb = rec.id.encode("utf-8")
            out += struct.pack("<H", len(idb))
            out += idb
            out += struct.pack(f"<{self.dimension}f", *rec.vector)
            if rec.metadata is not None:
                mb = json.dumps(rec.metadata,
                                separators=(",", ":")).encode("utf-8")
                out += struct.pack("<I", len(mb))
                out += mb
            else:
                out += struct.pack("<I", 0)
        return bytes(out)

    @staticmethod
    def from_bytes(data: bytes) -> "VectorBatch":
        if len(data) < 8:
            raise ValueError("Batch data too small")
        dim, count = struct.unpack_from("<II", data, 0)
        off = 8
        records = []
        for _ in range(count):
            (id_len,) = struct.unpack_from("<H", data, off)
            off += 2
            rid = data[off:off + id_len].decode("utf-8", errors="replace")
            off += id_len
            vector = list(struct.unpack_from(f"<{dim}f", data, off))
            off += dim * 4
            (meta_len,) = struct.unpack_from("<I", data, off)
            off += 4
            metadata = None
            if meta_len:
                metadata = json.loads(data[off:off + meta_len])
                off += meta_len
            records.append(VectorRecord(rid, vector, metadata))
        return VectorBatch(dim, records)


class VectorBatchBuilder:
    """streaming_upsert.rs:320-360."""

    def __init__(self, dimension: int):
        self.dimension = int(dimension)
        self._records: list[VectorRecord] = []

    def add(self, id: str, vector, metadata: Any = None
            ) -> "VectorBatchBuilder":
        self.push(id, vector, metadata)
        return self

    def push(self, id: str, vector, metadata: Any = None) -> None:
        v = [float(x) for x in vector]
        if len(v) != self.dimension:
            raise ValueError(
                f"vector dim {len(v)} != batch dim {self.dimension}")
        self._records.append(VectorRecord(str(id), v, metadata))

    def build(self) -> VectorBatch:
        return VectorBatch(self.dimension, self._records)


def encode_batch_frame(batch: VectorBatch, sequence_id: int) -> Frame:
    return Frame(FrameType.VECTOR_BATCH, sequence_id, batch.to_bytes())


def decode_batch_frame(frame: Frame) -> VectorBatch:
    if frame.frame_type != FrameType.VECTOR_BATCH:
        raise ValueError(f"not a vector-batch frame: {frame.frame_type}")
    return VectorBatch.from_bytes(frame.payload)


# ---------------------------------------------------------------------------
# Backpressure (streaming_upsert.rs:379-436)


class PressureLevel(IntEnum):
    NORMAL = 0
    ELEVATED = 1
    CRITICAL = 2


class BackpressureGate:
    def __init__(self, threshold_elevated: int, threshold_critical: int):
        self._pending = 0
        self.threshold_elevated = int(threshold_elevated)
        self.threshold_critical = int(threshold_critical)
        self._paused = False

    def level(self) -> PressureLevel:
        if self._pending >= self.threshold_critical or self._paused:
            return PressureLevel.CRITICAL
        if self._pending >= self.threshold_elevated:
            return PressureLevel.ELEVATED
        return PressureLevel.NORMAL

    def add_pending(self, count: int) -> None:
        self._pending += int(count)

    def drain(self, count: int) -> None:
        self._pending -= min(int(count), self._pending)

    def pause(self) -> None:
        self._paused = True

    def resume(self) -> None:
        self._paused = False

    def pending(self) -> int:
        return self._pending


# ---------------------------------------------------------------------------
# Pipeline (streaming_upsert.rs:443-779)


@dataclass
class StreamingUpsertConfig:
    batch_size: int = 1000
    max_inflight: int = 4
    backpressure_threshold: int = 10_000
    backpressure_critical: int = 50_000
    flush_interval_ms: int = 100
    dedup_within_batch: bool = True


@dataclass
class UpsertStats:
    batches_flushed: int = 0
    records_flushed: int = 0
    records_deduped: int = 0
    records_submitted: int = 0


class UpsertPipeline:
    """Driver-side accumulator with the reference's submit/flush
    semantics; `flush` hands full batches to a sink callable (the
    catalog's upsert / a Structured Streaming foreachBatch)."""

    def __init__(self, config: StreamingUpsertConfig | None = None,
                 sink=None):
        self.config = config or StreamingUpsertConfig()
        self.gate = BackpressureGate(self.config.backpressure_threshold,
                                     self.config.backpressure_critical)
        self._buffer: list[VectorRecord] = []
        self._sink = sink
        self._seq = 0
        self.stats = UpsertStats()

    def can_accept(self) -> bool:
        return self.gate.level() != PressureLevel.CRITICAL

    def pressure_level(self) -> PressureLevel:
        return self.gate.level()

    def next_sequence(self) -> int:
        self._seq += 1
        return self._seq

    def submit(self, id: str, vector, metadata: Any = None) -> None:
        if not self.can_accept():
            raise RuntimeError("backpressure critical: not accepting")
        self._buffer.append(
            VectorRecord(str(id), [float(x) for x in vector], metadata))
        self.gate.add_pending(1)
        self.stats.records_submitted += 1
        if len(self._buffer) >= self.config.batch_size:
            self.flush()

    def submit_batch(self, batch: VectorBatch) -> None:
        if not self.can_accept():
            raise RuntimeError("backpressure critical: not accepting")
        self._buffer.extend(batch.records)
        self.gate.add_pending(len(batch.records))
        self.stats.records_submitted += len(batch.records)
        if len(self._buffer) >= self.config.batch_size:
            self.flush()

    def buffered_count(self) -> int:
        return len(self._buffer)

    def flush(self) -> UpsertStats:
        if not self._buffer:
            return self.stats
        records = self._buffer
        self._buffer = []
        submitted = len(records)
        if self.config.dedup_within_batch:
            last: dict[str, VectorRecord] = {}
            for r in records:          # last-write-wins within the batch
                last[r.id] = r
            self.stats.records_deduped += submitted - len(last)
            records = list(last.values())
        if self._sink is not None:
            self._sink(records)
        self.stats.batches_flushed += 1
        self.stats.records_flushed += len(records)
        self.gate.drain(submitted)     # everything buffered is now handled
        return self.stats


class ThroughputTracker:
    """Windowed throughput (streaming_upsert.rs:884-941); `now_s`
    injectable for tests."""

    def __init__(self, window_seconds: float = 10.0):
        self.window = float(window_seconds)
        self._events: list[tuple[float, int, int]] = []
        self.total_vectors = 0
        self.total_bytes = 0

    def record(self, count: int, nbytes: int,
               now_s: float | None = None) -> None:
        now = _time.time() if now_s is None else float(now_s)
        self._events.append((now, int(count), int(nbytes)))
        self.total_vectors += int(count)
        self.total_bytes += int(nbytes)

    def vectors_per_second(self, now_s: float | None = None) -> float:
        now = _time.time() if now_s is None else float(now_s)
        lo = now - self.window
        recent = [(t, c, b) for t, c, b in self._events if t >= lo]
        if not recent:
            return 0.0
        span = max(now - min(t for t, _, _ in recent), 1e-9)
        return sum(c for _, c, _ in recent) / span


# ---------------------------------------------------------------------------
# Distributed decode


FRAME_ROWS_SCHEMA = T.StructType([
    T.StructField("sequence_id", T.LongType()),
    T.StructField("id", T.StringType()),
    T.StructField("vector", T.ArrayType(T.FloatType())),
    T.StructField("metadata", T.StringType()),
])


def frames_to_df(frames_df: DataFrame,
                 payload_col: str = "frames") -> DataFrame:
    """Decode a binary column of (possibly concatenated) wire frames
    into vector rows — one mapInPandas stage, executor-parallel, no
    shuffle.  Non-VectorBatch frames (control/ack/heartbeat) are
    skipped, matching the pipeline's ingest path."""
    import pandas as pd

    def decode(batches):
        for pdf in batches:
            seqs, ids, vecs, metas = [], [], [], []
            for blob in pdf[payload_col]:
                if blob is None:
                    continue
                for frame in iter_frames(bytes(blob)):
                    if frame.frame_type != FrameType.VECTOR_BATCH:
                        continue
                    vb = decode_batch_frame(frame)
                    for rec in vb.records:
                        seqs.append(frame.sequence_id)
                        ids.append(rec.id)
                        vecs.append(rec.vector)
                        metas.append(
                            None if rec.metadata is None
                            else json.dumps(rec.metadata,
                                            separators=(",", ":")))
            yield pd.DataFrame({"sequence_id": seqs, "id": ids,
                                "vector": vecs, "metadata": metas})

    return frames_df.mapInPandas(decode, FRAME_ROWS_SCHEMA)

"""Streaming upsert protocol: wire codecs, backpressure, pipeline,
distributed frame decode (reference streaming_upsert.rs)."""

import struct

import pytest

from needle_spark.streaming.upsert_protocol import (
    BackpressureGate,
    Frame,
    FrameType,
    PressureLevel,
    StreamingUpsertConfig,
    ThroughputTracker,
    UpsertPipeline,
    VectorBatch,
    VectorBatchBuilder,
    VectorRecord,
    decode_batch_frame,
    encode_batch_frame,
    frames_to_df,
    iter_frames,
)


def test_frame_wire_layout_matches_reference():
    f = Frame(FrameType.VECTOR_BATCH, 0x0102030405060708, b"abc")
    raw = f.encode()
    # magic "NV", version 1, type 0x01, seq LE u64, len LE u32
    assert raw[:2] == b"NV" and raw[2] == 1 and raw[3] == 0x01
    assert raw[4:12] == struct.pack("<Q", 0x0102030405060708)
    assert raw[12:16] == struct.pack("<I", 3)
    assert raw[16:] == b"abc"
    back, used = Frame.decode(raw)
    assert used == len(raw)
    assert back.sequence_id == f.sequence_id and back.payload == b"abc"


def test_frame_decode_errors():
    with pytest.raises(ValueError, match="header"):
        Frame.decode(b"NV")
    with pytest.raises(ValueError, match="magic"):
        Frame.decode(b"XX" + bytes(14))
    good = Frame(FrameType.ACK, 1, b"xy").encode()
    with pytest.raises(ValueError, match="payload"):
        Frame.decode(good[:-1])
    with pytest.raises(ValueError):
        Frame.decode(b"NV\x01\x99" + bytes(12))    # unknown type


def test_batch_roundtrip_with_metadata():
    b = (VectorBatchBuilder(3)
         .add("a", [1.0, 2.0, 3.0], {"k": "v"})
         .add("b", [0.5, 0.25, 0.125])
         .build())
    raw = b.to_bytes()
    # header: dim u32, count u32
    assert struct.unpack_from("<II", raw, 0) == (3, 2)
    back = VectorBatch.from_bytes(raw)
    assert [r.id for r in back.records] == ["a", "b"]
    assert back.records[0].vector == [1.0, 2.0, 3.0]
    assert back.records[0].metadata == {"k": "v"}
    assert back.records[1].metadata is None
    # frame wrap
    fr = encode_batch_frame(b, sequence_id=42)
    vb = decode_batch_frame(fr)
    assert len(vb) == 2 and vb.dimension == 3
    with pytest.raises(ValueError, match="not a vector-batch"):
        decode_batch_frame(Frame(FrameType.HEARTBEAT, 1))


def test_builder_rejects_wrong_dim():
    with pytest.raises(ValueError, match="dim"):
        VectorBatchBuilder(3).add("a", [1.0])


def test_iter_frames_walks_concatenation():
    buf = (Frame(FrameType.HEARTBEAT, 1).encode()
           + Frame(FrameType.ACK, 2, b"ok").encode()
           + Frame(FrameType.VECTOR_BATCH, 3,
                   VectorBatch(1, [VectorRecord("x", [9.0])]).to_bytes())
           .encode())
    frames = list(iter_frames(buf))
    assert [f.frame_type for f in frames] == [
        FrameType.HEARTBEAT, FrameType.ACK, FrameType.VECTOR_BATCH]
    assert [f.sequence_id for f in frames] == [1, 2, 3]


def test_backpressure_levels_and_pause():
    g = BackpressureGate(10, 20)
    assert g.level() == PressureLevel.NORMAL
    g.add_pending(10)
    assert g.level() == PressureLevel.ELEVATED
    g.add_pending(10)
    assert g.level() == PressureLevel.CRITICAL
    g.drain(15)
    assert g.level() == PressureLevel.NORMAL and g.pending() == 5
    g.pause()
    assert g.level() == PressureLevel.CRITICAL
    g.resume()
    assert g.level() == PressureLevel.NORMAL
    g.drain(100)                      # saturating
    assert g.pending() == 0


def test_pipeline_flush_dedup_and_sink():
    flushed = []
    p = UpsertPipeline(StreamingUpsertConfig(batch_size=100),
                       sink=flushed.extend)
    for i in range(5):
        p.submit("dup" if i < 3 else f"id{i}", [float(i)])
    st = p.flush()
    # 3 dups collapse to the last write
    assert st.records_flushed == 3 and st.records_deduped == 2
    assert {r.id for r in flushed} == {"dup", "id3", "id4"}
    dup = next(r for r in flushed if r.id == "dup")
    assert dup.vector == [2.0]        # last-write-wins
    assert p.gate.pending() == 0
    assert st.batches_flushed == 1 and st.records_submitted == 5


def test_pipeline_autoflush_and_backpressure():
    p = UpsertPipeline(StreamingUpsertConfig(
        batch_size=2, backpressure_threshold=1, backpressure_critical=3,
        dedup_within_batch=False))
    p.submit("a", [1.0])
    p.submit("b", [2.0])              # auto-flush at batch_size
    assert p.stats.batches_flushed == 1 and p.buffered_count() == 0
    p.gate.add_pending(10)            # simulate a stuck sink
    assert not p.can_accept()
    with pytest.raises(RuntimeError, match="backpressure"):
        p.submit("c", [3.0])


def test_throughput_tracker_window():
    t = ThroughputTracker(window_seconds=10)
    t.record(100, 4000, now_s=0.0)
    t.record(300, 4000, now_s=5.0)
    assert t.vectors_per_second(now_s=5.0) == pytest.approx(400 / 5.0)
    # old events age out of the window
    assert t.vectors_per_second(now_s=20.0) == 0.0
    assert t.total_vectors == 400 and t.total_bytes == 8000


def test_frames_to_df_distributed_decode(spark):
    blobs = []
    for part in range(4):
        b = VectorBatchBuilder(2)
        for i in range(5):
            b.add(f"p{part}-{i}", [float(part), float(i)],
                  {"p": part} if i == 0 else None)
        blobs.append((part,
                      Frame(FrameType.HEARTBEAT, 0).encode()
                      + encode_batch_frame(b.build(), part + 1).encode()))
    df = spark.createDataFrame(blobs, "part int, frames binary").repartition(4)
    out = frames_to_df(df).collect()
    assert len(out) == 20
    by_seq = {}
    for r in out:
        by_seq.setdefault(r["sequence_id"], []).append(r)
    assert set(by_seq) == {1, 2, 3, 4}
    r0 = next(r for r in out if r["id"] == "p2-0")
    assert r0["vector"] == [2.0, 0.0] and r0["metadata"] == '{"p":2}'
    assert next(r for r in out if r["id"] == "p2-1")["metadata"] is None

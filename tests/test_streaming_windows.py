"""Watermarked event-time windows and bounded streaming dedup
(extension surface, SURVEY §2.9)."""

import json
import os

import pytest

from needle_spark.streaming.ingestion import streaming_dedup, windowed_event_counts

SCHEMA = "id string, event_time timestamp, event_type string"


def drop_file(d, name, rows):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(stream_df, tmp_path, qname):
    q = (
        stream_df.writeStream.format("memory").queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{qname}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_counts_and_late_data(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "win_out")
    ckpt = str(tmp_path / "ckpt_win")

    def run_once():
        q = (
            windowed_event_counts(
                spark.readStream.schema(SCHEMA).json(src),
                time_col="event_time", window_duration="1 hour", watermark="2 hours")
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    drop_file(src, "b1.json", [
        {"id": "a", "event_time": "2026-01-01T10:05:00", "event_type": "click"},
        {"id": "b", "event_time": "2026-01-01T10:20:00", "event_type": "click"},
        {"id": "c", "event_time": "2026-01-01T11:10:00", "event_type": "view"},
        {"id": "d", "event_time": "2026-01-01T20:00:00", "event_type": "view"},
    ])
    run_once()
    # a VERY late event in a second run (watermark advanced to 18:00 by
    # event d) must be dropped; closed windows were already emitted
    drop_file(src, "b2.json", [
        {"id": "late", "event_time": "2026-01-01T10:30:00", "event_type": "click"},
    ])
    run_once()
    rows = {
        (str(r["window_start"]), r["event_type"]): r["cnt"]
        for r in spark.read.parquet(out).collect()
    }
    assert rows[("2026-01-01 10:00:00", "click")] == 2  # late row dropped
    assert rows[("2026-01-01 11:00:00", "view")] == 1
    # the 20:00 window never closed (watermark == its start) -> not emitted
    assert ("2026-01-01 20:00:00", "view") not in rows


def test_streaming_dedup_bounded(spark, tmp_path):
    src = str(tmp_path / "in2")
    drop_file(src, "b1.json", [
        {"id": "x", "event_time": "2026-01-01T10:00:00", "event_type": "a"},
        {"id": "x", "event_time": "2026-01-01T10:01:00", "event_type": "b"},
        {"id": "y", "event_time": "2026-01-01T10:02:00", "event_type": "c"},
    ])
    stream = spark.readStream.schema(SCHEMA).json(src)
    dd = streaming_dedup(stream, id_col="id", time_col="event_time", watermark="1 hour")
    _run(dd, tmp_path, "dedup_mem")
    got = sorted(r["id"] for r in spark.sql("SELECT * FROM dedup_mem").collect())
    assert got == ["x", "y"]

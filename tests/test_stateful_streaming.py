"""applyInPandasWithState stateful operators: gap sessionization and
running centroids.

Contract checks: state survives micro-batch boundaries (a session that
straddles two input files stays one session), gaps split sessions
exactly, idle keys are flushed by the processing-time timeout, and the
running centroid equals the batch mean over everything ingested so far.
"""

import json
import os
import time

import pytest

from needle_spark.streaming.stateful import sessionize, streaming_centroids

EV_SCHEMA = "user_id string, ts double"
VEC_SCHEMA = "category string, vector array<float>"


def drop_file(d, name, rows):
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, "." + name)
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, os.path.join(d, name))


def start_query(df, name, mode):
    return (df.writeStream.format("memory").queryName(name)
            .outputMode(mode).trigger(processingTime="200 milliseconds")
            .start())


def wait_rows(spark, table, want, timeout=90):
    deadline = time.time() + timeout
    while time.time() < deadline:
        got = spark.sql(f"SELECT count(*) c FROM {table}").first()["c"]
        if got >= want:
            return got
        time.sleep(0.3)
    return spark.sql(f"SELECT count(*) c FROM {table}").first()["c"]


@pytest.fixture()
def stream_src(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src, exist_ok=True)
    return src


def test_sessionize_gaps_and_cross_batch_state(spark, stream_src):
    events = spark.readStream.schema(EV_SCHEMA).json(stream_src)
    # idle flush far beyond the test's runtime: only gap evidence closes
    sessions = sessionize(events, key_col="user_id", ts_col="ts",
                          gap_seconds=10.0, idle_flush_ms=600_000)
    q = start_query(sessions, "sess_out", "append")
    try:
        # batch 1: u1 has two events 5s apart (one open session);
        # u2 has events 30s apart -> first session closes in-batch
        drop_file(stream_src, "b1.json", [
            {"user_id": "u1", "ts": 100.0},
            {"user_id": "u1", "ts": 105.0},
            {"user_id": "u2", "ts": 100.0},
            {"user_id": "u2", "ts": 130.0},
        ])
        got = wait_rows(spark, "sess_out", 1)
        assert got >= 1
        row = spark.sql(
            "SELECT * FROM sess_out WHERE key='u2'").collect()
        assert len(row) == 1
        assert (row[0]["session_start"], row[0]["session_end"],
                row[0]["n_events"]) == (100.0, 100.0, 1)

        # batch 2: u1 continues within the gap (state carried across the
        # micro-batch boundary: still ONE session), then jumps past the
        # gap -> the straddling session closes with events from BOTH
        # batches counted
        drop_file(stream_src, "b2.json", [
            {"user_id": "u1", "ts": 112.0},
            {"user_id": "u1", "ts": 200.0},
        ])
        wait_rows(spark, "sess_out", 2)
        row = spark.sql("SELECT * FROM sess_out WHERE key='u1'").collect()
        assert len(row) == 1
        assert (row[0]["session_start"], row[0]["session_end"],
                row[0]["n_events"]) == (100.0, 112.0, 3)
    finally:
        q.stop()


def test_sessionize_idle_timeout_flush(spark, stream_src):
    events = spark.readStream.schema(EV_SCHEMA).json(stream_src)
    sessions = sessionize(events, key_col="user_id", ts_col="ts",
                          gap_seconds=10.0, idle_flush_ms=700)
    q = start_query(sessions, "sess_idle", "append")
    try:
        # one open session; with no further data the processing-time
        # timeout must flush it (empty micro-batches evaluate timeouts)
        drop_file(stream_src, "b1.json", [
            {"user_id": "u9", "ts": 100.0},
            {"user_id": "u9", "ts": 103.0},
        ])
        wait_rows(spark, "sess_idle", 1)
        row = spark.sql("SELECT * FROM sess_idle").collect()
        assert len(row) == 1
        assert (row[0]["key"], row[0]["session_start"],
                row[0]["session_end"], row[0]["n_events"]) == (
                    "u9", 100.0, 103.0, 2)
    finally:
        q.stop()


def test_sessionize_in_batch_out_of_order(spark, stream_src):
    events = spark.readStream.schema(EV_SCHEMA).json(stream_src)
    sessions = sessionize(events, key_col="user_id", ts_col="ts",
                          gap_seconds=5.0, idle_flush_ms=600_000)
    q = start_query(sessions, "sess_ooo", "append")
    try:
        # arrival order scrambled; sorted by ts the gaps are
        # [1,2,3] | [50] — one closed session, one open
        drop_file(stream_src, "b1.json", [
            {"user_id": "u", "ts": 3.0},
            {"user_id": "u", "ts": 50.0},
            {"user_id": "u", "ts": 1.0},
            {"user_id": "u", "ts": 2.0},
        ])
        wait_rows(spark, "sess_ooo", 1)
        row = spark.sql("SELECT * FROM sess_ooo").collect()
        assert len(row) == 1
        assert (row[0]["session_start"], row[0]["session_end"],
                row[0]["n_events"]) == (1.0, 3.0, 3)
    finally:
        q.stop()


def test_streaming_centroids_running_mean(spark, stream_src):
    events = spark.readStream.schema(VEC_SCHEMA).json(stream_src)
    cents = streaming_centroids(events, key_col="category",
                                vector_col="vector", dims=2)
    q = start_query(cents, "cent_out", "update")
    try:
        drop_file(stream_src, "b1.json", [
            {"category": "a", "vector": [1.0, 0.0]},
            {"category": "a", "vector": [3.0, 2.0]},
            {"category": "b", "vector": [0.0, 8.0]},
            {"category": "a", "vector": [1.0, 2.0, 3.0]},  # wrong dims: dropped
        ])
        wait_rows(spark, "cent_out", 2)
        rows = {r["key"]: r for r in spark.sql(
            "SELECT * FROM cent_out").collect()}
        assert rows["a"]["n_vectors"] == 2
        assert rows["a"]["centroid"] == [2.0, 1.0]
        assert rows["b"]["n_vectors"] == 1

        # second batch folds into the SAME running mean (state, not rescan)
        drop_file(stream_src, "b2.json", [
            {"category": "a", "vector": [5.0, 4.0]},
        ])
        deadline = time.time() + 90
        while time.time() < deadline:
            rows = [r for r in spark.sql(
                "SELECT * FROM cent_out WHERE key='a'").collect()
                if r["n_vectors"] == 3]
            if rows:
                break
            time.sleep(0.3)
        assert rows and rows[0]["centroid"] == [3.0, 2.0]
    finally:
        q.stop()

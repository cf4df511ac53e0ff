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


def test_streaming_sessionize_matches_batch_windows(spark, tmp_path, sf_dir):
    """Parity: the stateful streaming sessionizer over the real events
    table (split into two micro-batches) emits exactly the sessions the
    batch lag/cumsum window computation finds (the oracle-checked
    events_sessionize shape)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .selectExpr("user_id",
                      "CAST(CAST(ts AS TIMESTAMP) AS DOUBLE) AS ts_s"))
    gap_s = 1800.0

    # ---- batch ground truth: per-session (start, end, n) ----
    w = Window.partitionBy("user_id").orderBy("ts_s")
    truth = (
        ev.withColumn("__prev", F.lag("ts_s").over(w))
        .withColumn("__new", (F.col("__prev").isNull() |
                              ((F.col("ts_s") - F.col("__prev")) > gap_s))
                    .cast("int"))
        .withColumn("sid", F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(F.min("ts_s").alias("session_start"),
             F.max("ts_s").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"))
    )
    want = {(str(r["user_id"]), round(r["session_start"], 4),
             round(r["session_end"], 4), r["n_events"])
            for r in truth.collect()}

    # ---- streaming: same rows, split across two files/micro-batches ----
    pdf = ev.toPandas().sort_values("ts_s").reset_index(drop=True)
    src = str(tmp_path / "sess_in")
    os.makedirs(src, exist_ok=True)
    half = len(pdf) // 2
    for name, chunk in (("b1.json", pdf.iloc[:half]),
                        ("b2.json", pdf.iloc[half:])):
        drop_file(src, name, [
            {"user_id": int(r.user_id), "ts": float(r.ts_s)}
            for r in chunk.itertuples()])

    events = spark.readStream.schema("user_id string, ts double").json(src)
    sessions = sessionize(events, key_col="user_id", ts_col="ts",
                          gap_seconds=gap_s, idle_flush_ms=1_500)
    q = start_query(sessions, "sess_parity", "append")
    try:
        # every session eventually closes: gap evidence + idle flush
        got_n = wait_rows(spark, "sess_parity", len(want), timeout=120)
        rows = spark.sql("SELECT * FROM sess_parity").collect()
    finally:
        q.stop()
    got = {(r["key"], round(r["session_start"], 4),
            round(r["session_end"], 4), r["n_events"]) for r in rows}
    assert got == want, (
        f"streaming={len(got)} batch={len(want)} "
        f"missing={list(want - got)[:3]} extra={list(got - want)[:3]}")

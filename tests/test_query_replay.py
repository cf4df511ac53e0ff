"""Query recording + replay regression harness (query_replay.rs)."""

from needle_spark.operators.query_replay import (
    QueryRecorder,
    QueryReplayer,
    RecordedQuery,
)


def test_recorder_bounds_sampling_roundtrip():
    r = QueryRecorder(max_queries=2)
    for i in range(4):
        r.record(RecordedQuery("c", [float(i)], 2, [("a", 0.1)], 5.0, timestamp=i))
    assert len(r) == 2
    assert [q.query for q in r.queries] == [[2.0], [3.0]]  # oldest evicted

    sampled = QueryRecorder(max_queries=100, sample_rate=0.5, seed=42)
    kept = sum(sampled.record(
        RecordedQuery("c", [float(i)], 1, [], 1.0, timestamp=i))
        for i in range(200))
    assert 60 < kept < 140  # deterministic but ~half

    blob = r.to_json()
    back = QueryRecorder.from_json(blob)
    assert [q.query for q in back.queries] == [[2.0], [3.0]]
    assert back.queries[0].results == [("a", 0.1)]


def test_replay_report_recall_and_regressions():
    recorded = [
        RecordedQuery("c", [1.0], 3, [("a", 0.1), ("b", 0.2), ("c", 0.3)], 10.0),
        RecordedQuery("c", [2.0], 2, [("x", 0.1), ("y", 0.2)], 20.0),
    ]
    rp = QueryReplayer(recorded, regression_threshold=0.8)
    rp.add_result(0, [("a", 0.1), ("b", 0.2), ("z", 0.25)], 5.0)   # recall 2/3
    rp.add_result(1, [("x", 0.1), ("y", 0.2)], 30.0)               # recall 1.0
    rep = rp.report()
    assert rep.total_queries == 2
    assert abs(rep.avg_recall - (2 / 3 + 1.0) / 2) < 1e-9
    assert abs(rep.min_recall - 2 / 3) < 1e-9
    assert rep.regressions == 1 and not rep.passed
    d0 = rep.details[0]
    assert d0.missing_ids == ["c"] and d0.new_ids == ["z"]
    assert abs(d0.latency_change_pct - (-50.0)) < 1e-9
    assert abs(rep.details[1].latency_change_pct - 50.0) < 1e-9


def test_replay_against_engine(spark, embeddings):
    """End-to-end: record against the exact engine, replay against the
    SAME data -> recall 1.0, zero regressions."""
    from needle_spark.operators.knn import knn

    emb = embeddings.select("vec_id", "embedding")
    qv = [float(x) for x in embeddings.orderBy("vec_id").first()["embedding"]]
    orig = [(str(r["vec_id"]), float(r["distance"])) for r in
            knn(emb, qv, k=5, vector_col="embedding", id_col="vec_id").collect()]
    rp = QueryReplayer([RecordedQuery("embeddings", qv, 5, orig, 100.0)])
    rp.replay_against(emb, vector_col="embedding", id_col="vec_id")
    rep = rp.report()
    assert rep.passed and rep.avg_recall == 1.0
    assert rep.details[0].missing_ids == []

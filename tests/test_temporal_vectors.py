"""Temporal vector sequences (reference:
src/experimental/temporal_sequences.rs): windowed centroids, trends,
DTW/Fréchet trajectory search, and per-sequence drift."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from needle_spark.operators.temporal_vectors import (
    centroid_trajectory_distance,
    dtw_distance,
    frechet_distance,
    sequence_centroids,
    sequence_drift,
    sequence_trends,
    trajectory_search,
    window_centroids,
)


@pytest.fixture(scope="module")
def seqs(spark):
    rows = []
    # s_up drifts from (0,0) toward (10,0); s_flat stays near (5,5)
    for t in range(20):
        rows.append(("s_up", t, [t * 0.5, 0.0]))
        rows.append(("s_flat", t, [5.0, 5.0]))
    return spark.createDataFrame(rows, "seq_id string, ts long, "
                                       "vector array<float>")


def test_sequence_and_window_centroids(seqs):
    cents = {r["group"]: r["centroid"]
             for r in sequence_centroids(seqs).collect()}
    assert cents["s_flat"] == [5.0, 5.0]
    assert cents["s_up"][0] == pytest.approx(4.75)  # mean of 0..9.5

    wc = {r["group"]: r["centroid"]
          for r in window_centroids(seqs, 0, 3).collect()}
    assert wc["s_up"][0] == pytest.approx(0.75)  # mean of 0,0.5,1,1.5


def test_sequence_trends(seqs):
    trends = {r["seq"]: r["trend"]
              for r in sequence_trends(seqs, window_size=5).collect()}
    # s_up: first-5 centroid x = 1.0, last-5 centroid x = 8.5 -> +7.5
    assert trends["s_up"][0] == pytest.approx(7.5)
    assert trends["s_up"][1] == pytest.approx(0.0)
    assert trends["s_flat"] == [0.0, 0.0]
    # too-short sequences yield no row (reference returns None)
    short = sequence_trends(seqs, window_size=11).collect()
    assert short == []


def test_dtw_known_values():
    a = [[0.0], [1.0], [2.0]]
    assert dtw_distance(a, a) == 0.0
    b = [[0.0], [2.0]]
    # alignment: 0-0, 1->0 or 2 (cost 1), 2-2 => total 1
    assert dtw_distance(a, b) == pytest.approx(1.0)
    assert dtw_distance([], a) == float("inf")
    # symmetry
    assert dtw_distance(a, b) == pytest.approx(dtw_distance(b, a))


def test_frechet_known_values():
    a = [[0.0], [1.0], [2.0]]
    assert frechet_distance(a, a) == 0.0
    b = [[0.5], [1.5], [2.5]]
    assert frechet_distance(a, b) == pytest.approx(0.5)
    # Fréchet is the max over the optimal coupling: shifting one point
    # far away dominates
    # optimal coupling pairs a=[0,1,2] as (0,0) (1,9)? no — (1,0) then
    # (2,9)=7 then (2,2): the max over the best coupling is 7
    c = [[0.0], [9.0], [2.0]]
    assert frechet_distance(a, c) == pytest.approx(7.0)


def test_centroid_trajectory_distance():
    assert centroid_trajectory_distance(
        [[0.0, 0.0], [2.0, 0.0]], [[1.0, 1.0]]) == pytest.approx(1.0)


def test_trajectory_search(seqs):
    # query trajectory follows s_up's path
    q = [[t * 0.5, 0.0] for t in range(20)]
    got = trajectory_search(seqs, q, k=2, metric="dtw").collect()
    assert got[0]["seq_id"] == "s_up"
    assert got[0]["distance"] == pytest.approx(0.0)
    assert got[1]["seq_id"] == "s_flat"

    fre = trajectory_search(seqs, q, k=1, metric="frechet").collect()
    assert fre[0]["seq_id"] == "s_up"

    with pytest.raises(ValueError):
        trajectory_search(seqs, q, metric="hausdorff")
    with pytest.raises(Exception):
        trajectory_search(seqs, q, max_seq_len=5).collect()


def test_sequence_drift(seqs):
    out = {r["seq"]: r for r in
           sequence_drift(seqs, window_size=5, threshold=0.01).collect()}
    # s_up's direction changes little (all along +x) -> tiny drift;
    # s_flat identical windows -> zero drift
    assert out["s_flat"]["drift_score"] == pytest.approx(0.0, abs=1e-9)
    assert not out["s_flat"]["drift_detected"]
    assert out["s_up"]["drift_score"] < 0.05

    # a sequence that rotates 90 degrees mid-way shows large drift
    spark = seqs.sparkSession
    rot = spark.createDataFrame(
        [("r", t, [1.0, 0.0]) for t in range(10)] +
        [("r", t, [0.0, 1.0]) for t in range(10, 20)],
        "seq_id string, ts long, vector array<float>")
    r = sequence_drift(rot, window_size=5, threshold=0.5).first()
    assert r["drift_score"] == pytest.approx(1.0)
    assert r["drift_detected"]


def test_trajectory_search_numeric_seq_ids(spark):
    """Non-string sequence ids cast cleanly into the declared schema."""
    rows = [(7, t, [float(t), 0.0]) for t in range(4)] + \
           [(8, t, [0.0, float(t)]) for t in range(4)]
    df = spark.createDataFrame(rows, "seq_id long, ts long, "
                                     "vector array<float>")
    q = [[float(t), 0.0] for t in range(4)]
    got = trajectory_search(df, q, k=1, metric="dtw").collect()
    assert got[0]["seq_id"] == "7"

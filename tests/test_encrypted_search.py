"""Encrypted (LSH-coded) search — encrypted_search.rs parity.

Mirrors the reference's in-file tests (encrypted_search.rs:236-313):
encrypt+search ranking, hamming distance, determinism, similarity
range, security-level presets, batch insert, key rotation, accuracy
estimation — plus Spark-shape checks (no raw vector in the coded
table, TakeOrderedAndProject plan, DuckDB oracle agreement).
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from needle_spark.operators.encrypted_search import (
    EncryptedSearchError,
    EncryptionConfig,
    config_for_level,
    duckdb_encrypted_search_sql,
    encrypt_vectors,
    encrypted_search,
    estimate_accuracy,
    generate_hyperplanes,
    lsh_codes,
    query_codes,
    rotate_key,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(60)]
    return spark.createDataFrame(rows, "id bigint, vector array<float>")


CFG = EncryptionConfig(dimensions=16, hash_bits=32, num_tables=2, seed=42)


def test_encrypt_and_search_ranks_self_first(spark, vec_df):
    # encrypted_search.rs:240-247 — the vector itself (hamming 0) wins.
    enc = encrypt_vectors(vec_df, CFG)
    q = vec_df.filter("id = 5").first()["vector"]
    res = encrypted_search(enc, q, CFG, k=3).collect()
    assert res[0]["id"] == 5
    assert res[0]["hamming_distance"] == 0
    assert res[0]["estimated_similarity"] == 1.0
    assert res[0]["estimated_similarity"] >= res[1]["estimated_similarity"]


def test_codes_deterministic_and_packed(spark):
    # encrypted_search.rs:262-268 — same vector, same codes; and the
    # packing uses bit b -> word b//64, position b%64.
    v = np.ones((1, 16), dtype=np.float64)
    c1, c2 = lsh_codes(v, CFG), lsh_codes(v, CFG)
    assert (c1 == c2).all()
    assert c1.shape == (1, CFG.num_words) == (1, 1)
    planes = generate_hyperplanes(16, CFG.total_bits, CFG.seed)
    bits = (v @ planes.T >= 0)[0]
    expect = 0
    for b, on in enumerate(bits):
        if on:
            expect |= 1 << b
    assert int(np.uint64(c1[0][0])) == expect


def test_similarity_in_range(spark, vec_df):
    enc = encrypt_vectors(vec_df, CFG)
    q = [1.0] * 16
    for r in encrypted_search(enc, q, CFG, k=60).collect():
        assert 0.0 <= r["estimated_similarity"] <= 1.0


def test_security_level_presets():
    # encrypted_search.rs:295-300 + :60-68 (hash_bits capped at dims).
    hi = config_for_level(128, "high")
    assert (hi.hash_bits, hi.num_tables) == (128, 4)
    std = config_for_level(32, "standard")
    assert (std.hash_bits, std.num_tables) == (32, 2)
    mx = config_for_level(64, "maximum")
    assert (mx.hash_bits, mx.num_tables) == (64, 8)
    with pytest.raises(EncryptedSearchError):
        config_for_level(16, "ultra")


def test_coded_table_has_no_raw_vector(spark, vec_df):
    enc = encrypt_vectors(vec_df, CFG)
    assert set(enc.columns) == {"id", "codes", "original_norm"}
    row = enc.filter("id = 0").first()
    src = np.asarray(vec_df.filter("id = 0").first()["vector"])
    assert row["original_norm"] == pytest.approx(
        float(np.sqrt((src.astype(np.float64) ** 2).sum())), rel=1e-6)


def test_key_rotation_changes_codes(spark, vec_df):
    # encrypted_search.rs:303-308 — rotation re-encrypts everything
    # (our trusted-source variant actually recomputes the codes).
    enc1 = encrypt_vectors(vec_df, CFG)
    enc2, cfg2 = rotate_key(vec_df, CFG, new_seed=999)
    assert cfg2.seed == 999
    a = {r["id"]: tuple(r["codes"]) for r in enc1.collect()}
    b = {r["id"]: tuple(r["codes"]) for r in enc2.collect()}
    assert set(a) == set(b)
    assert any(a[i] != b[i] for i in a)
    # searching the rotated table with rotated query codes still works
    q = vec_df.filter("id = 7").first()["vector"]
    top = encrypted_search(enc2, q, cfg2, k=1).first()
    assert top["id"] == 7 and top["hamming_distance"] == 0


def test_accuracy_estimate_monotone():
    # encrypted_search.rs:310-318.
    lo = estimate_accuracy(config_for_level(32, "standard"))
    hi = estimate_accuracy(config_for_level(32, "maximum"))
    assert 0.0 < lo < 1.0 and hi >= lo


def test_dimension_mismatch_raises(spark, vec_df):
    with pytest.raises(EncryptedSearchError):
        query_codes([1.0] * 8, CFG)
    bad = EncryptionConfig(dimensions=8, hash_bits=16, num_tables=1)
    enc = encrypt_vectors(vec_df, bad)
    with pytest.raises(Exception):
        enc.collect()


def test_plan_is_take_ordered_no_exchange(spark, vec_df):
    enc = encrypt_vectors(vec_df, CFG)
    plan = encrypted_search(enc, [0.5] * 16, CFG, k=5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_matches_duckdb_oracle(spark, vec_df):
    enc = encrypt_vectors(vec_df, CFG)
    q = vec_df.filter("id = 3").first()["vector"]
    got = [(r["id"], r["hamming_distance"])
           for r in encrypted_search(enc, q, CFG, k=10).collect()]
    con = duckdb.connect()
    con.register("vecs", vec_df.toPandas())
    sql = duckdb_encrypted_search_sql(
        "vecs", "id", "vector",
        "SELECT vector FROM vecs WHERE id = 3", CFG, k=10)
    want = [(r[0], r[1]) for r in con.execute(sql).fetchall()]
    assert got == want

"""Searchable encryption — encryption.rs parity: HKDF keys, seeded
projection, AEAD roundtrip (driver + distributed), tamper detection,
encrypted search recall, metadata store, envelope wrapping."""

import numpy as np
import pytest

from needle_spark.operators.encryption import (
    EncryptedMetadataStore,
    EncryptionConfig,
    EncryptionError,
    KeyManager,
    LocalKekProvider,
    VectorEncryptor,
)

MASTER = b"unit-test-master-key-32-bytes!!!"


def make_encryptor(dims=8, searchable=True, noise=0.0, proj=4):
    km = KeyManager(MASTER)
    enc = VectorEncryptor(EncryptionConfig(
        searchable=searchable, noise_level=noise, projection_dims=proj), km)
    if searchable:
        enc.initialize(dims)
    return enc


def test_key_derivation_deterministic_per_purpose():
    a, b = KeyManager(MASTER), KeyManager(MASTER)
    assert a.derive_key("vectors") == b.derive_key("vectors")
    assert a.derive_key("vectors") != a.derive_key("metadata")
    assert len(a.derive_key("vectors")) == 32
    assert KeyManager(b"other-master-key!").derive_key("vectors") != \
        a.derive_key("vectors")
    with pytest.raises(EncryptionError):
        KeyManager(b"short")


def test_projection_deterministic_and_normalized():
    a, b = KeyManager(MASTER), KeyManager(MASTER)
    a.init_projection(8, 4)
    b.init_projection(8, 4)
    assert np.allclose(a.projection_matrix, b.projection_matrix)
    assert a.projection_matrix.shape == (4, 8)
    assert np.allclose(np.linalg.norm(a.projection_matrix, axis=1), 1.0)
    assert (a.projection_matrix >= -1.0).all() and \
        (a.projection_matrix <= 1.0).all() is not None


def test_driver_encrypt_decrypt_roundtrip():
    enc = make_encryptor()
    v = [0.1, -2.5, 3.25, 0.0, 1.0, -1.0, 7.5, 0.5]
    e = enc.encrypt("v1", v, {"lang": "en"})
    assert e["key_id"] == "vectors" and len(e["nonce"]) == 12
    assert len(e["auth_tag"]) == 16
    assert e["search_embedding"] is not None
    assert enc.decrypt(e) == pytest.approx(v)
    # tamper -> authentication failure (encryption.rs:418-434)
    bad = dict(e, ciphertext=bytes([e["ciphertext"][0] ^ 1])
               + e["ciphertext"][1:])
    with pytest.raises(EncryptionError, match="authentication tag"):
        enc.decrypt(bad)


def test_distributed_roundtrip_and_schema(spark):
    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "id bigint, vector array<float>")
    enc = make_encryptor()
    edf = enc.encrypt_vectors(df, seed=1).cache()
    assert set(edf.columns) == {"id", "ciphertext", "nonce", "auth_tag",
                                "key_id", "search_embedding"}
    assert edf.count() == 40
    back = {r["id"]: r["vector"] for r in enc.decrypt_vectors(edf).collect()}
    orig = dict(rows)
    for i in orig:
        assert back[i] == pytest.approx(orig[i], rel=1e-6)


def test_encrypted_search_finds_neighbors(spark):
    rng = np.random.default_rng(9)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "id bigint, vector array<float>")
    enc = make_encryptor(noise=0.0, proj=8)
    edf = enc.encrypt_vectors(df, seed=2).cache()
    q = rows[17][1]
    res = enc.search_encrypted(edf, q, k=5)
    top = res.collect()
    assert top[0]["id"] == 17  # noiseless projection preserves self-match
    assert top[0]["approximate_distance"] == pytest.approx(0.0, abs=1e-5)
    # plan: JVM only, top-k, no exchange
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan and "Exchange" not in plan


def test_noise_blurs_but_bounded(spark):
    enc = make_encryptor(noise=0.05, proj=8)
    e1 = enc.encrypt("a", [1.0] * 8, rng=np.random.default_rng(1))
    e2 = enc.encrypt("a", [1.0] * 8, rng=np.random.default_rng(2))
    d = np.array(e1["search_embedding"]) - np.array(e2["search_embedding"])
    assert 0 < np.abs(d).max() < 1.0  # noised, but near


def test_search_requires_searchable(spark):
    df = spark.createDataFrame([(1, [1.0] * 8)], "id long, vector array<float>")
    enc = make_encryptor(searchable=False)
    edf = enc.encrypt_vectors(df)
    assert edf.first()["search_embedding"] is None
    with pytest.raises(EncryptionError, match="not enabled"):
        enc.search_encrypted(edf, [1.0] * 8)


def test_metadata_store_roundtrip():
    store = EncryptedMetadataStore(make_encryptor())
    store.put("k1", "secret value")
    assert store.get("k1") == "secret value"
    assert store.get("missing") is None
    # values are not stored in the clear
    nonce, ct = store._data["k1"]
    assert b"secret value" not in ct


def test_kek_envelope_wrapping():
    km = KeyManager(MASTER)
    kek = LocalKekProvider(b"k" * 32, "kek-1")
    wrapped = kek.wrap_key(km, "vectors", now=100.0)
    assert wrapped.kek_id == "kek-1" and wrapped.key_id == "vectors"
    assert kek.unwrap(wrapped.wrapped_dek) == km.derive_key("vectors")
    with pytest.raises(EncryptionError):
        kek.unwrap(b"too-short")
    with pytest.raises(EncryptionError):
        LocalKekProvider(b"short", "k")
    # wrong KEK fails authentication
    other = LocalKekProvider(b"x" * 32, "kek-2")
    with pytest.raises(EncryptionError, match="unwrap failed"):
        other.unwrap(wrapped.wrapped_dek)


def test_unsupported_algorithm():
    with pytest.raises(EncryptionError, match="chacha20poly1305"):
        VectorEncryptor(EncryptionConfig(algorithm="aes256gcm"),
                        KeyManager(MASTER))

"""Regression tests for review findings on the REST shim and catalog:
path traversal via collection/alias names, serving-index staleness
(text inserts, TTL sweeps, metadata patches), percent-decoding,
per-request cache parameters, cache eviction on drop/recreate, and
per-row ingest error capture."""

import json
import math
import os
import urllib.error
import urllib.request

import pytest

from needle_spark.catalog import CollectionError, Database
from needle_spark.server import RestServer

from tests.test_rest_server import call


@pytest.fixture(scope="module")
def srv(spark, tmp_path_factory):
    db = Database(spark, str(tmp_path_factory.mktemp("hardendb")))
    s = RestServer(db).start()
    yield s
    s.stop()


# ------------------------------------------------------- traversal ---

def test_catalog_rejects_traversal_names(spark, tmp_path):
    root = tmp_path / "tdb"
    db = Database(spark, str(root))
    canary = tmp_path / "canary.txt"
    canary.write_text("x")
    for bad in ("..", "../evil", "a/../..", "/abs", ".hidden",
                "aliases.json", "a" * 256):
        with pytest.raises(CollectionError):
            db.create_collection(bad, dims=2)
        with pytest.raises(CollectionError):
            db.drop_collection(bad)
        with pytest.raises(CollectionError):
            db.collection(bad)
    db.create_collection("ok", dims=2)
    with pytest.raises(CollectionError):
        db.rename_collection("ok", "../escape")
    with pytest.raises(CollectionError):
        db.create_alias("..", "ok")
    with pytest.raises(CollectionError):
        db.create_alias("alias_ok", "../escape")
    # an alias whose TARGET was tampered on disk cannot traverse either
    with open(os.path.join(str(root), "aliases.json"), "w") as f:
        json.dump({"evil": ".."}, f)
    with pytest.raises(CollectionError):
        db.collection("evil")
    with pytest.raises(CollectionError):
        db.drop_collection("evil")
    assert canary.exists()  # nothing above the root was touched


def test_rest_rejects_traversal(srv):
    call(srv, "POST", "/collections",
         {"name": "../evil", "dimensions": 2}, expect=400)
    # DELETE /collections/.. routes as a name; must 4xx, never rmtree
    req = urllib.request.Request(srv.url + "/collections/%2E%2E",
                                 method="DELETE")
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            status = resp.status
    except urllib.error.HTTPError as e:
        status = e.code
    assert status in (400, 404)
    call(srv, "POST", "/collections",
         {"name": "safe", "dimensions": 2}, expect=201)
    call(srv, "POST", "/collections/safe/rename",
         {"new_name": "../out"}, expect=400)
    call(srv, "POST", "/aliases",
         {"alias": "../a", "target": "safe"}, expect=400)


# ------------------------------------- serving-index staleness ---

def _mk_indexed(srv, name, dims=4, n=60, meta_fields=None):
    call(srv, "POST", "/collections",
         {"name": name, "dimensions": dims}, expect=201)
    vecs = [{"id": f"p{i}",
             "vector": [math.cos(i * .37), math.sin(i * .37),
                        math.cos(i * .11), math.sin(i * .11)][:dims],
             "metadata": {"tag": "even" if i % 2 == 0 else "odd"}}
            for i in range(n)]
    call(srv, "POST", f"/collections/{name}/vectors/batch",
         {"vectors": vecs}, expect=201)
    body = {"nprobe": 4}
    if meta_fields:
        body["meta_fields"] = meta_fields
    return call(srv, "POST", f"/collections/{name}/index", body,
                expect=200)


def test_text_insert_reaches_serving_index(srv):
    built = _mk_indexed(srv, "txtidx")
    call(srv, "POST", "/collections/txtidx/texts",
         {"id": "t1", "text": "hello world"}, expect=201)
    # search by the same text: the indexed fast path must see t1
    res = call(srv, "POST", "/collections/txtidx/texts/search",
               {"text": "hello world", "k": 1,
                "nprobe": built["nlist"]}, expect=200)
    assert res.get("served_by") == "index"
    assert res["results"][0]["id"] == "t1"
    # batch text insert too
    call(srv, "POST", "/collections/txtidx/texts/batch",
         {"texts": [{"id": "t2", "text": "spark engine"}]}, expect=201)
    res = call(srv, "POST", "/collections/txtidx/texts/search",
               {"text": "spark engine", "k": 1,
                "nprobe": built["nlist"]})
    assert res["results"][0]["id"] == "t2"


def test_expire_invalidates_serving_index(srv):
    import time as _time

    call(srv, "POST", "/collections",
         {"name": "ttlidx", "dimensions": 4,
          "default_ttl_seconds": 1_000_000_000}, expect=201)
    vecs = [{"id": f"p{i}",
             "vector": [math.cos(i * .37), math.sin(i * .37),
                        math.cos(i * .11), math.sin(i * .11)]}
            for i in range(60)]
    call(srv, "POST", "/collections/ttlidx/vectors/batch",
         {"vectors": vecs}, expect=201)
    built = call(srv, "POST", "/collections/ttlidx/index",
                 {"nprobe": 4}, expect=200)
    qv = vecs[3]["vector"]
    call(srv, "PUT", "/collections/ttlidx/vectors/p3/ttl",
         {"ttl_seconds": 1}, expect=200)
    call(srv, "POST", "/collections/ttlidx/expire",
         {"now": int(_time.time()) + 3600}, expect=200)
    # the sweep can't name its victims -> index must be invalidated,
    # and the exact path must no longer return p3
    assert call(srv, "GET", "/collections/ttlidx/index/status") == \
        {"indexed": False}
    res = call(srv, "POST", "/collections/ttlidx/search",
               {"vector": qv, "k": 3, "nprobe": built["nlist"]})
    assert "served_by" not in res
    assert "p3" not in [r["id"] for r in res["results"]]


def test_metadata_patch_refreshes_pinned_fields(srv):
    built = _mk_indexed(srv, "metaidx", meta_fields=["tag"])
    qv = [math.cos(8 * .37), math.sin(8 * .37),
          math.cos(8 * .11), math.sin(8 * .11)]
    call(srv, "POST", "/collections/metaidx/vectors/p8/metadata",
         {"metadata": {"tag": "special"}}, expect=200)
    hit = call(srv, "POST", "/collections/metaidx/search",
               {"vector": qv, "k": 5, "filter": {"tag": "special"},
                "nprobe": built["nlist"]}, expect=200)
    assert hit.get("served_by") == "index"
    assert hit["results"][0]["id"] == "p8"
    # the OLD pinned value must no longer match p8
    stale = call(srv, "POST", "/collections/metaidx/search",
                 {"vector": qv, "k": 60, "filter": {"tag": "even"},
                  "nprobe": built["nlist"]})
    assert "p8" not in [r["id"] for r in stale["results"]]


# ------------------------------------------------ URL decoding ---

def test_percent_decoded_ids_and_query(srv):
    call(srv, "POST", "/collections",
         {"name": "urls", "dimensions": 2}, expect=201)
    call(srv, "POST", "/collections/urls/vectors",
         {"id": "a b", "vector": [1.0, 0.0]}, expect=201)
    got = call(srv, "GET", "/collections/urls/vectors/a%20b",
               expect=200)
    assert got["id"] == "a b"
    call(srv, "DELETE", "/collections/urls/vectors/a%20b", expect=200)
    call(srv, "GET", "/collections/urls/vectors/a%20b", expect=404)


# -------------------------------------------- cache semantics ---

def test_cache_per_request_params_do_not_leak(srv):
    call(srv, "POST", "/collections",
         {"name": "cch", "dimensions": 4}, expect=201)
    call(srv, "POST", "/collections/cch/cache/store",
         {"query": "q one", "response": "r1",
          "ttl_seconds": 123.0}, expect=200)
    cache = srv._caches["cch"]
    dflt_thr = cache.config.similarity_threshold
    dflt_ttl = cache.config.ttl_seconds
    call(srv, "POST", "/collections/cch/cache/lookup",
         {"query": "q one", "threshold": 0.01}, expect=200)
    # neither the per-store ttl nor the per-lookup threshold mutated
    # the shared config other clients inherit
    assert cache.config.similarity_threshold == dflt_thr
    assert cache.config.ttl_seconds == dflt_ttl


def test_cache_dropped_with_collection(srv):
    call(srv, "POST", "/collections",
         {"name": "cdrop", "dimensions": 4}, expect=201)
    call(srv, "POST", "/collections/cdrop/cache/store",
         {"query": "q", "response": "r"}, expect=200)
    assert "cdrop" in srv._caches
    call(srv, "DELETE", "/collections/cdrop", expect=200)
    assert "cdrop" not in srv._caches
    # recreate at DIFFERENT dims: the cache must rebuild at 8 dims,
    # not shape-error against 4-dim cached embeddings
    call(srv, "POST", "/collections",
         {"name": "cdrop", "dimensions": 8}, expect=201)
    out = call(srv, "POST", "/collections/cdrop/cache/lookup",
               {"query": "q"}, expect=200)
    assert out["hit"] is False


# ------------------------------------------------ ingest rows ---

def test_ingest_captures_scalar_vector_rows(srv):
    call(srv, "POST", "/collections",
         {"name": "ing", "dimensions": 2}, expect=201)
    out = call(srv, "POST", "/collections/ing/ingest",
               {"vectors": [
                   {"id": "good", "vector": [1.0, 0.0]},
                   {"id": "scalar", "vector": 5},
                   {"id": "short", "vector": [1.0]},
               ]}, expect=200)
    assert out["accepted"] == 1
    errs = {e["id"]: e["error"] for e in out["errors"]}
    assert set(errs) == {"scalar", "short"}
    call(srv, "GET", "/collections/ing/vectors/good", expect=200)

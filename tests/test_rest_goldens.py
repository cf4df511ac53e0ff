"""Golden request/response contracts for the newest specialty REST
routes (VERDICT r6 ask #8) — each pair is checked against the
REFERENCE handler's semantics, cited per test:

- search/estimate  -> admin.rs:351 cost_estimate_handler
- benchmark        -> admin.rs:636 benchmark_handler (clamps at
                      handlers/mod.rs:32 MAX_SEARCH_K)
- advise           -> admin.rs what-if compression advisor
- /mcp, /mcp/config-> mod.rs:567-568 MCP JSON-RPC surface
- /plugins         -> handlers/plugins.rs:13,34
"""

import json
import urllib.error
import urllib.request

import pytest

from needle_spark.catalog import Database
from needle_spark.server import RestServer


@pytest.fixture(scope="module")
def srv(spark, tmp_path_factory):
    db = Database(spark, str(tmp_path_factory.mktemp("goldendb")))
    s = RestServer(db).start()
    yield s
    s.stop()


def call(srv, method, path, body=None, expect=None):
    req = urllib.request.Request(
        srv.url + path,
        data=None if body is None else json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method=method)
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            status, payload = resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        status, payload = e.code, json.loads(e.read())
    if expect is not None:
        assert status == expect, (status, payload)
    return payload


@pytest.fixture(scope="module")
def coll(srv):
    call(srv, "POST", "/collections",
         {"name": "g", "dimensions": 4}, expect=201)
    call(srv, "POST", "/collections/g/vectors/batch",
         {"vectors": [{"id": f"v{i}",
                       "vector": [float(i), 1.0, 0.0, float(i % 3)],
                       "metadata": {"tag": "a" if i % 2 else "b"}}
                      for i in range(40)]}, expect=201)
    return "g"


# -- search/estimate (admin.rs:351) ---------------------------------

def test_estimate_envelope_fields(srv, coll):
    """Reference returns collection / query_dimensions /
    collection_vectors alongside the plan (admin.rs:390-396)."""
    est = call(srv, "POST", f"/collections/{coll}/search/estimate",
               {"vector": [1.0, 0.0, 0.0, 0.0]}, expect=200)
    assert est["collection"] == coll
    assert est["query_dimensions"] == 4
    assert est["collection_vectors"] == 40
    assert est["strategy"] == "exact_scan"
    assert est["estimated_candidates"] == 40          # unfiltered scan
    assert est["estimated_ms"] >= 1


def test_estimate_filter_selectivity_assumption(srv, coll):
    """admin.rs:380: 'estimate 30% selectivity for filters' — a
    filtered estimate must NOT claim a full-scan candidate count."""
    est = call(srv, "POST", f"/collections/{coll}/search/estimate",
               {"vector": [1.0, 0.0, 0.0, 0.0],
                "filter": {"tag": "a"}}, expect=200)
    assert est["strategy"] == "exact_scan"
    assert est["filter_selectivity"] == 0.3
    assert est["estimated_candidates"] == int(40 * 0.3)


def test_estimate_unknown_collection_404(srv):
    """admin.rs:361: missing collection -> 404 NOT_FOUND."""
    call(srv, "POST", "/collections/ghost/search/estimate",
         {"vector": [1.0]}, expect=404)


def test_estimate_indexed_candidates_scale_with_nprobe(srv, coll):
    call(srv, "POST", f"/collections/{coll}/index",
         {"nlist": 4, "nprobe": 1}, expect=200)
    est1 = call(srv, "POST", f"/collections/{coll}/search/estimate",
                {"vector": [1.0, 0.0, 0.0, 0.0]}, expect=200)
    assert est1["strategy"] == "ivf_index"
    est2 = call(srv, "POST", f"/collections/{coll}/search/estimate",
                {"vector": [1.0, 0.0, 0.0, 0.0], "nprobe": 4},
                expect=200)
    assert est2["estimated_candidates"] > est1["estimated_candidates"]
    assert est2["estimated_candidates"] == 40         # all cells probed
    call(srv, "DELETE", f"/collections/{coll}/index", expect=200)


# -- benchmark (admin.rs:636) ---------------------------------------

def test_benchmark_response_contract(srv, coll):
    """Reference response carries collection / vectors / dimensions /
    k / queries / latency percentiles / qps (admin.rs:672-681)."""
    bm = call(srv, "POST", f"/collections/{coll}/benchmark",
              {"queries": 4, "k": 3}, expect=200)
    assert bm["collection"] == coll
    assert bm["vectors"] == 40 and bm["dimensions"] == 4
    assert bm["queries"] == 4 and bm["k"] == 3
    assert bm["p50_ms"] > 0 and bm["p99_ms"] >= bm["p50_ms"]
    assert bm["qps"] > 0


def test_benchmark_clamps_k_like_reference(srv, coll):
    """admin.rs:653: k = body.k.min(MAX_SEARCH_K).max(1) with
    MAX_SEARCH_K = 10_000 (handlers/mod.rs:32)."""
    bm = call(srv, "POST", f"/collections/{coll}/benchmark",
              {"queries": 1, "k": 0}, expect=200)
    assert bm["k"] == 1
    bm = call(srv, "POST", f"/collections/{coll}/benchmark",
              {"queries": 1, "k": 999_999}, expect=200)
    assert bm["k"] == 10_000


def test_benchmark_zero_queries_not_an_error(srv, coll):
    """admin.rs:636: queries=0 runs zero probes and still returns 200;
    here n clamps to 1 probe — either way a NON-empty collection must
    never see the empty-collection 400."""
    bm = call(srv, "POST", f"/collections/{coll}/benchmark",
              {"queries": 0, "k": 3}, expect=200)
    assert bm["collection"] == coll and bm["queries"] == 1


def test_benchmark_empty_collection_400(srv):
    """admin.rs:648-650: empty collection -> 400 INVALID_COLLECTION."""
    call(srv, "POST", "/collections",
         {"name": "empty_bm", "dimensions": 2}, expect=201)
    err = call(srv, "POST", "/collections/empty_bm/benchmark",
               {"queries": 2}, expect=400)
    assert "empty" in json.dumps(err).lower()


# -- advise (what-if compression advisor) ---------------------------

def test_advise_preview_contract(srv, coll):
    adv = call(srv, "GET", f"/collections/{coll}/advise", expect=200)
    assert adv["collection"] == coll
    assert adv["vectors"] == 40 and adv["dimensions"] == 4
    strategies = [p["strategy"] for p in adv["previews"]]
    assert "exact_scan" in strategies
    for p in adv["previews"]:
        assert {"strategy", "estimated_latency_ms"} <= set(p)


def test_advise_empty_collection_400(srv):
    call(srv, "POST", "/collections",
         {"name": "empty_adv", "dimensions": 2}, expect=201)
    call(srv, "GET", "/collections/empty_adv/advise", expect=400)


# -- MCP (mod.rs:567-568) -------------------------------------------

def test_mcp_unknown_tool_is_error_result(srv):
    """tools/call with an unknown tool must surface as an MCP
    isError RESULT (the JSON-RPC call itself succeeded), not a
    transport error."""
    out = call(srv, "POST", "/mcp",
               {"jsonrpc": "2.0", "id": 9, "method": "tools/call",
                "params": {"name": "no_such_tool", "arguments": {}}},
               expect=200)
    assert out["id"] == 9
    assert out["result"]["isError"] is True


def test_mcp_malformed_jsonrpc(srv):
    """Unknown method -> JSON-RPC -32601 (method not found), id
    echoed; never an HTTP 5xx."""
    out = call(srv, "POST", "/mcp",
               {"jsonrpc": "2.0", "id": "abc", "method": "bogus/x"},
               expect=200)
    assert out["error"]["code"] == -32601
    assert out["id"] == "abc"


def test_mcp_config_self_describing_url(srv):
    cfg = call(srv, "GET", "/mcp/config", expect=200)
    entry = cfg["mcpServers"]["needle-spark"]
    assert entry["url"].startswith("http") and entry["url"].endswith(
        "/mcp")


# -- plugins registry (handlers/plugins.rs) -------------------------

def test_plugins_list_contract(srv):
    """plugins.rs:30: {"plugins": [...], "count": n} — empty here
    (WASM runtime out of scope, SURVEY §2.11), count must agree."""
    pl = call(srv, "GET", "/plugins", expect=200)
    assert pl["count"] == len(pl["plugins"]) == 0


def test_plugin_detail_not_found_message(srv):
    """plugins.rs:58: 404 body names the missing plugin."""
    err = call(srv, "GET", "/plugins/wasm_mystery", expect=404)
    assert "wasm_mystery" in json.dumps(err)


# -- index build with the refine tier (r8) ---------------------------

def test_index_build_refine_response_contract(srv, coll):
    """POST /collections/{c}/index with codes + refine pinned: the
    response names the tier, codes, and the refine decision, and
    index/status echoes the decision — the operator-visible contract
    for the exact-refine sidecar (plans/ivf.py refine=True; reference
    coarse-then-rerank: src/collection/search_methods.rs:146-177)."""
    built = call(srv, "POST", f"/collections/{coll}/index",
                 {"codes": "sq8", "refine": True, "nlist": 4,
                  "nprobe": 4}, expect=200)
    assert built["built"] == coll and built["codes"] == "sq8"
    dec = built["tier_decision"]
    assert dec["refine"] is True
    assert dec["codes_reason"] == "pinned by request"
    st = call(srv, "GET", f"/collections/{coll}/index/status")
    assert st["indexed"] and st["tier_decision"]["refine"] is True
    call(srv, "DELETE", f"/collections/{coll}/index", expect=200)
    # non-boolean refine is a 400, not a silent coercion
    err = call(srv, "POST", f"/collections/{coll}/index",
               {"codes": "sq8", "refine": "yes"}, expect=400)
    assert "refine" in json.dumps(err)


def test_index_build_recall_target_budget_contract(srv, coll):
    """r9 contract golden: recall_target echoes in the decision with
    the measured recalls; a sub-SQ8 byte budget resolves to a PQ build
    whose (pq_m, refine_factor) are named in the response and status;
    out-of-range and mistyped values are 400s."""
    built = call(srv, "POST", f"/collections/{coll}/index",
                 {"recall_target": 0.9, "nlist": 4, "nprobe": 4},
                 expect=200)
    dec = built["tier_decision"]
    assert dec["recall_target"] == 0.9
    assert "codes_reason" in dec and dec["codes"] in (
        "sq8_cell", "float32", "pq")
    call(srv, "DELETE", f"/collections/{coll}/index", expect=200)
    for bad in ({"recall_target": 0}, {"recall_target": 1.0001},
                {"recall_target": "0.9"},
                {"budget_bytes_per_row": 0},
                {"budget_bytes_per_row": "8"}):
        err = call(srv, "POST", f"/collections/{coll}/index", bad,
                   expect=400)
        assert "must be" in json.dumps(err)

"""LLM function-calling interface (reference:
src/services/ai/llm_tools.rs): schemas, validation, dispatch, and the
end-to-end create/insert/search/delete loop."""

import json

import pytest

from needle_spark.catalog import Database
from needle_spark.operators.llm_tools import ToolRegistry, ToolSchema


@pytest.fixture()
def reg(spark, tmp_path):
    db = Database(spark, str(tmp_path / "tooldb"))
    return ToolRegistry(db)


def test_schemas_openai_format(reg):
    tools = reg.to_openai_tools()
    assert len(tools) >= 5
    names = {t["function"]["name"] for t in tools}
    assert {"needle_create_collection", "needle_insert", "needle_search",
            "needle_delete", "needle_list_collections"} <= names
    for t in tools:
        assert t["type"] == "function"
        assert t["function"]["parameters"]["type"] == "object"


def test_validation(reg):
    assert reg.validate_call("nope", {}) == "unknown tool: 'nope'"
    err = reg.validate_call("needle_search", {"collection": "x"})
    assert "query" in err
    assert reg.validate_call("needle_list_collections", {}) is None
    res = reg.execute("needle_insert", '{"bad json')
    assert not res.success and "invalid JSON" in res.error


def test_end_to_end_tool_loop(reg):
    r = reg.execute("needle_create_collection", {"name": "notes"})
    assert r.success, r.error
    r = reg.execute("needle_insert",
                    {"collection": "notes", "id": "n1",
                     "text": "spark catalyst optimizer"})
    assert r.success and r.result == {"inserted": "n1"}
    reg.execute("needle_insert", {"collection": "notes", "id": "n2",
                                  "text": "completely different topic"})
    r = reg.execute("needle_search",
                    {"collection": "notes",
                     "query": "spark catalyst optimizer", "k": 1})
    assert r.success and r.result[0]["id"] == "n1"
    # results serialize for the LLM transcript
    json.loads(r.to_json())

    r = reg.execute("needle_stats", {"collection": "notes"})
    assert r.success and r.result["count"] == 2
    r = reg.execute("needle_delete", {"collection": "notes", "id": "n2"})
    assert r.success and r.result == {"deleted": 1}
    r = reg.execute("needle_list_collections", {})
    assert "notes" in r.result["collections"]
    # structured errors, never raised
    r = reg.execute("needle_search", {"collection": "ghost", "query": "x"})
    assert not r.success and "ghost" in r.error


def test_custom_tool_registration(reg):
    reg.register(ToolSchema(
        "needle_count_all", "Total rows across collections",
        {"type": "object", "properties": {}, "required": []},
        handler=lambda db, a: {"total": sum(
            db.collection(n).count() for n in db.list_collections())}))
    assert reg.get("needle_count_all") is not None
    r = reg.execute("needle_count_all", {})
    assert r.success and r.result == {"total": 0}

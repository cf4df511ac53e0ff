"""LLM function-calling interface: the engine's operations exposed as
OpenAI-compatible tool schemas with validated dispatch.

Reference: /root/reference/src/services/ai/llm_tools.rs — ToolSchema /
FunctionSchema / FunctionCall / FunctionResult (:32-61), ToolRegistry
with the built-in tool set (:63-165: create_collection / insert /
search / delete / list_collections / stats), to_openai_tools (:171),
validate_call (:176-195: unknown tool + required-parameter checks),
execute (:197-208).

Spark mapping: dispatch targets a needle_spark Database — text
insert/search run through TextCollection's auto-embedding path, and
every tool result is a JSON-safe dict so the transcript round-trips
through any LLM API.  The registry is extensible: register custom
tools whose handler receives (db, arguments)."""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class ToolSchema:
    """llm_tools.rs:32-45 (OpenAI function-calling format)."""

    name: str
    description: str
    parameters: dict
    handler: Callable | None = None

    def to_openai(self) -> dict:
        return {"type": "function",
                "function": {"name": self.name,
                             "description": self.description,
                             "parameters": self.parameters}}


@dataclass
class FunctionResult:
    """llm_tools.rs:55-61."""

    name: str
    success: bool
    result: Any = None
    error: str | None = None

    def to_json(self) -> str:
        return json.dumps({"name": self.name, "success": self.success,
                           "result": self.result, "error": self.error})


def _params(props: dict, required: list[str]) -> dict:
    return {"type": "object", "properties": props, "required": required}


class ToolRegistry:
    """llm_tools.rs:63-210, dispatching onto a needle_spark Database."""

    def __init__(self, db, embed_fn: Callable | None = None,
                 default_dims: int = 16):
        from needle_spark.operators.federated import hash_embedding

        self.db = db
        self.embed_fn = embed_fn or hash_embedding(default_dims)
        self.default_dims = default_dims
        self._tools: dict[str, ToolSchema] = {}
        self._register_builtins()

    # ----------------------------------------------------- registry --
    def register(self, tool: ToolSchema) -> None:
        self._tools[tool.name] = tool

    def schemas(self) -> list[ToolSchema]:
        return list(self._tools.values())

    def get(self, name: str) -> ToolSchema | None:
        return self._tools.get(name)

    def to_openai_tools(self) -> list[dict]:
        """llm_tools.rs:171 — the list an LLM API's `tools=` expects."""
        return [t.to_openai() for t in self._tools.values()]

    def __len__(self) -> int:
        return len(self._tools)

    # --------------------------------------------------- validation --
    def validate_call(self, name: str, arguments: dict) -> str | None:
        """llm_tools.rs:176-195: unknown tool / missing required params.
        Returns an error message or None."""
        tool = self._tools.get(name)
        if tool is None:
            return f"unknown tool: {name!r}"
        required = tool.parameters.get("required", [])
        missing = [r for r in required if r not in (arguments or {})]
        if missing:
            return f"missing required parameters: {missing}"
        return None

    def execute(self, name: str, arguments: dict | str) -> FunctionResult:
        """llm_tools.rs:197-208: validate then dispatch; errors come
        back structured, never raised (the LLM sees them as content)."""
        if isinstance(arguments, str):
            try:
                arguments = json.loads(arguments or "{}")
            except json.JSONDecodeError as e:
                return FunctionResult(name, False,
                                      error=f"invalid JSON arguments: {e}")
        err = self.validate_call(name, arguments)
        if err is not None:
            return FunctionResult(name, False, error=err)
        try:
            out = self._tools[name].handler(self.db, arguments)
            return FunctionResult(name, True, result=out)
        except Exception as e:  # noqa: BLE001 — structured tool errors
            return FunctionResult(name, False, error=str(e))

    # ----------------------------------------------------- builtins --
    def _text_collection(self, name: str):
        from needle_spark.operators.text_collection import TextCollection

        return TextCollection(self.db, name, self.embed_fn,
                              chunking="none")

    def _register_builtins(self) -> None:
        reg = self.register
        reg(ToolSchema(
            "needle_create_collection",
            "Create a new vector collection in the database",
            _params({"name": {"type": "string",
                              "description": "Collection name"},
                     "dimensions": {"type": "integer",
                                    "description": "Vector dimensions"}},
                    ["name"]),
            handler=lambda db, a: self._create(a)))
        reg(ToolSchema(
            "needle_insert",
            "Insert a text document into a collection (auto-embeds)",
            # no `metadata` parameter: the auto-embedding text path
            # stores (text, source_doc, chunk_index); advertising an
            # argument the handler would drop silently lies to the LLM
            _params({"collection": {"type": "string"},
                     "id": {"type": "string"},
                     "text": {"type": "string"}},
                    ["collection", "id", "text"]),
            handler=lambda db, a: self._insert(a)))
        reg(ToolSchema(
            "needle_search",
            "Search a collection for documents similar to a text query",
            _params({"collection": {"type": "string"},
                     "query": {"type": "string"},
                     "k": {"type": "integer", "default": 5}},
                    ["collection", "query"]),
            handler=lambda db, a: self._search(a)))
        reg(ToolSchema(
            "needle_delete",
            "Delete a document from a collection by id",
            _params({"collection": {"type": "string"},
                     "id": {"type": "string"}},
                    ["collection", "id"]),
            handler=lambda db, a: {"deleted": db.collection(a["collection"])
                                   .delete(ids=[a["id"]])}))
        reg(ToolSchema(
            "needle_list_collections",
            "List all collections in the database",
            _params({}, []),
            handler=lambda db, a: {"collections": db.list_collections()}))
        reg(ToolSchema(
            "needle_stats",
            "Row count and dimensions for a collection",
            _params({"collection": {"type": "string"}}, ["collection"]),
            handler=lambda db, a: self._stats(a)))

    def _create(self, a: dict) -> dict:
        from needle_spark.operators.text_collection import TextCollection

        # the embedder fixes the real dimensionality; the LLM's
        # requested value is advisory (mismatches would poison inserts)
        dims = len(self.embed_fn(""))
        TextCollection.create(self.db, a["name"], self.embed_fn, dims=dims)
        return {"created": a["name"], "dimensions": dims}

    def _insert(self, a: dict) -> dict:
        tc = self._text_collection(a["collection"])
        tc.insert_text(a["id"], a["text"])
        return {"inserted": a["id"]}

    def _search(self, a: dict) -> list[dict]:
        tc = self._text_collection(a["collection"])
        hits = tc.search_text(a["query"], k=int(a.get("k", 5)))
        return [{"id": r["id"], "distance": float(r["distance"])}
                for r in hits.collect()]

    def _stats(self, a: dict) -> dict:
        coll = self.db.collection(a["collection"])
        return {"collection": a["collection"], "count": coll.count(),
                "dimensions": coll.dims}

"""NeedleQL AST (mirrors /root/reference/src/search/query_lang/ast.rs:4-225
plus service statements, needleql_executor.rs:61-95)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


# ------------------------------------------------------- expressions ---

@dataclass
class Comparison:
    column: str
    op: str  # = != < <= > >=
    value: Any


@dataclass
class SimilarTo:
    column: str
    param: str  # $param name


@dataclass
class TextMatch:
    column: str
    query: str


@dataclass
class InList:
    column: str
    values: list
    negated: bool = False


@dataclass
class Between:
    column: str
    low: Any
    high: Any


@dataclass
class Like:
    column: str
    pattern: str
    negated: bool = False


@dataclass
class IsNull:
    column: str
    negated: bool = False


@dataclass
class And:
    left: Any
    right: Any


@dataclass
class Or:
    left: Any
    right: Any


@dataclass
class Not:
    inner: Any


# ----------------------------------------------------------- clauses ---

@dataclass
class OrderKey:
    expr: Any  # str column name | FuncCall
    desc: bool = False


@dataclass
class FuncCall:
    name: str
    args: list


@dataclass
class RerankBy:
    field: str                    # metadata field, or "mmr"
    fetch_k: int | None = None
    descending: bool = True
    mode: str = "field"           # "field" | "mmr"
    mmr_lambda: float = 0.5


@dataclass
class TimeDecaySpec:
    function: str  # linear | exponential | gaussian | step
    params: dict[str, Any] = field(default_factory=dict)


# -------------------------------------------------------- statements ---

@dataclass
class RagOptions:
    """USING RAG(...) options (ast.rs:76-92)."""
    top_k: int | None = None
    rerank: bool | None = None
    hybrid_alpha: float | None = None
    deduplicate: bool | None = None


@dataclass
class SelectStmt:
    columns: list[str] | None  # None = *
    collection: str
    where: Any = None
    order_by: list[OrderKey] = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None
    explain: bool = False
    analyze: bool = False
    as_of: Any = None
    with_time_decay: TimeDecaySpec | None = None
    rerank: RerankBy | None = None
    using_rag: RagOptions | None = None


@dataclass
class InsertStmt:
    collection: str
    columns: list[str]
    values: list


@dataclass
class DeleteStmt:
    collection: str
    where: Any


@dataclass
class CreateCollectionStmt:
    name: str
    options: dict[str, Any] = field(default_factory=dict)


@dataclass
class DropCollectionStmt:
    name: str


@dataclass
class ShowCollectionsStmt:
    pass


@dataclass
class CreateViewStmt:
    name: str
    query: SelectStmt
    materialized: bool = False


@dataclass
class DropViewStmt:
    name: str

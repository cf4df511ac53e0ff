"""Natural-language -> NeedleQL query builder with analysis, hints,
quality scoring, alternatives, and query explanation.

Reference: /root/reference/src/search/query_builder.rs —
CollectionProfile/FieldProfile (:122-242), QueryAnalyzer pattern table
+ analyze/classify/assess_complexity (:243-540), hint generation
(:541-655), QueryBuildResult / VisualQueryBuilder.build /
translate_to_needleql (:657-830), quality + suggestions + alternatives
(:830-1020), suggest_fields/suggest_values (:1023-1048), explain
(:1050-1120).

Spark mapping: the collection profile is built from the ACTUAL data in
one aggregation (`approx_count_distinct` per field — HyperLogLog,
map-side combined), generated NeedleQL is validated by round-tripping
through this repo's real parser (ql/parser.py), and `explain` parses
with the same grammar the executor runs — so the builder can never
emit a query the engine would reject."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from needle_spark.operators.nl_filter import NLFilterParser, ParsedQuery

# QueryAnalyzer pattern table (query_builder.rs:245-305)
_PATTERNS: list[tuple[str, tuple[str, ...]]] = [
    ("search", ("find", "search", "show", "get", "look for", "retrieve")),
    ("filter", ("where", "with", "having", "that have", "containing")),
    ("temporal", ("today", "yesterday", "last week", "last month", "recent",
                  "latest", "since", "before", "after")),
    ("comparison", ("greater than", "less than", "more than", "at least",
                    "at most", "above", "below", ">", "<", ">=", "<=")),
    ("negation", ("not", "without", "except", "exclude", "excluding")),
    ("list", ("or", "and", ",", "either")),
    ("range", ("between", "from...to", "range")),
    ("aggregation", ("count", "how many", "total", "sum", "average",
                     "group by")),
    ("sort", ("sort by", "order by", "sorted", "ranked", "top", "best",
              "highest", "lowest")),
]


@dataclass
class FieldProfile:
    """query_builder.rs:150-200."""

    name: str
    dtype: str  # string | number | boolean | datetime | array
    cardinality: int = 0
    indexed: bool = False
    examples: list = field(default_factory=list)


@dataclass
class CollectionProfile:
    """query_builder.rs:122-148, built from real data."""

    name: str
    dimensions: int
    vector_count: int
    metadata_fields: list[FieldProfile] = field(default_factory=list)
    quantization: str | None = None
    probe_fraction: float | None = None
    cache_hit_rate: float = 0.0

    @classmethod
    def from_df(cls, name: str, df: DataFrame, dimensions: int = 0,
                meta_cols: Sequence[str] | None = None,
                example_values: int = 5) -> "CollectionProfile":
        """Profile the collection in ONE aggregation: row count +
        approx_count_distinct (HyperLogLog, map-side combined) per
        metadata column — no per-field jobs, scale-safe."""
        kinds = dict(df.dtypes)
        cols = list(meta_cols) if meta_cols is not None else [
            c for c, t in df.dtypes
            if not t.startswith("array<float>") and c not in ("vector",)]
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in cols:
            aggs.append(F.approx_count_distinct(c).alias(f"__card_{c}"))
        row = df.agg(*aggs).first()
        # example values for autocompletion come from ONE bounded
        # sample job shared by every string field — not a
        # distinct+sort scan per column
        sample_rows = df.select(*cols).limit(500).collect()
        fields = []
        for c in cols:
            t = kinds.get(c, "string")
            dtype = ("number" if t in ("int", "bigint", "double", "float",
                                       "long", "smallint", "decimal")
                     else "boolean" if t == "boolean"
                     else "datetime" if "timestamp" in t or c.endswith("_at")
                     else "array" if t.startswith("array") else "string")
            ex = []
            if dtype == "string":
                seen = sorted({r[c] for r in sample_rows
                               if r[c] is not None})
                ex = seen[:example_values]
            fields.append(FieldProfile(
                name=c, dtype=dtype, cardinality=int(row[f"__card_{c}"]),
                examples=ex))
        return cls(name=name, dimensions=dimensions,
                   vector_count=int(row["__n"]), metadata_fields=fields)


@dataclass
class QueryAnalysis:
    """query_builder.rs QueryAnalysis."""

    query_class: str          # semantic | metadata_only | hybrid | temporal | aggregation
    complexity: str           # simple | moderate | complex
    search_terms: list[str]
    filter_fields: list[str]
    temporal: dict | None
    confidence: float
    patterns: list[tuple[str, str]]  # (pattern_type, matched keyword)


class QueryAnalyzer:
    """query_builder.rs:243-540."""

    def __init__(self):
        self.nl = NLFilterParser()

    def analyze(self, query: str,
                parsed: ParsedQuery | None = None) -> QueryAnalysis:
        import re

        parsed = parsed if parsed is not None else self.nl.parse(query)
        low = query.lower()
        patterns = []
        for ptype, keywords in _PATTERNS:
            for kw in keywords:
                # word-boundary match for word keywords so 'count' does
                # not fire inside 'accounting' (punctuation keywords
                # like ',' and '>' stay substring matches)
                if kw[0].isalpha():
                    hit = re.search(r"\b" + re.escape(kw) + r"\b", low)
                else:
                    hit = kw in low
                if hit:
                    patterns.append((ptype, kw))
        q_class = self._classify(parsed, patterns)
        complexity = self._complexity(parsed, patterns)
        terms = [t for t in parsed.search_text.split() if len(t) > 2]
        return QueryAnalysis(
            query_class=q_class, complexity=complexity, search_terms=terms,
            filter_fields=self._filter_fields(parsed.filter),
            temporal=parsed.temporal, confidence=parsed.confidence,
            patterns=patterns)

    @staticmethod
    def _classify(parsed: ParsedQuery, patterns) -> str:
        """query_builder.rs:365-395 classify_query.  The NL parser folds
        temporal expressions into an inserted_at filter; classification
        treats a purely-temporal filter as temporal, like the reference's
        separate `temporal` slot."""
        has_search = bool(parsed.search_text.strip())
        fields = QueryAnalyzer._filter_fields_static(parsed.filter)
        has_filter = any(f not in ("inserted_at", "created_at")
                         for f in fields)
        if any(p == "aggregation" for p, _ in patterns):
            return "aggregation"
        if parsed.temporal is not None and not has_search and not has_filter:
            return "temporal"
        if has_search and has_filter:
            return "hybrid"
        if has_search:
            return "semantic"
        if has_filter:
            return "metadata_only"
        return "temporal" if parsed.temporal is not None else "semantic"

    def _complexity(self, parsed: ParsedQuery, patterns) -> str:
        """query_builder.rs:397-440 assess_complexity."""
        score = self._filter_depth(parsed.filter) + len(patterns)
        if parsed.temporal is not None:
            score += 2
        if any(p == "aggregation" for p, _ in patterns):
            score += 3
        if any(p == "negation" for p, _ in patterns):
            score += 1
        return "simple" if score <= 3 else "moderate" if score <= 7 else "complex"

    def _filter_depth(self, flt) -> int:
        if not isinstance(flt, dict):
            return 0
        n = 0
        for k, v in flt.items():
            n += 1
            if isinstance(v, dict):
                n += self._filter_depth(v)
            elif isinstance(v, list):
                n += sum(self._filter_depth(x) for x in v
                         if isinstance(x, dict))
        return n

    def _filter_fields(self, flt) -> list[str]:
        return self._filter_fields_static(flt)

    @staticmethod
    def _filter_fields_static(flt) -> list[str]:
        out: list[str] = []

        def walk(d):
            if not isinstance(d, dict):
                return
            for k, v in d.items():
                if k in ("$and", "$or", "$not"):
                    items = v if isinstance(v, list) else [v]
                    for x in items:
                        walk(x)
                elif not k.startswith("$"):
                    out.append(k)
                    if isinstance(v, dict):
                        pass  # operator doc, field already recorded
        walk(flt)
        return sorted(set(out))


# ===================================================================
# Hints, quality, suggestions (query_builder.rs:541-1020)
# ===================================================================

@dataclass
class BuildHint:
    """query_builder.rs OptimizationHint (with impact estimates)."""

    category: str
    severity: str  # info | suggestion | warning
    message: str
    suggestion: str
    latency_change_pct: float = 0.0
    memory_change_pct: float = 0.0


def generate_hints(analysis: QueryAnalysis,
                   profile: CollectionProfile) -> list[BuildHint]:
    """query_builder.rs:541-655, re-pointed at Spark physics."""
    hints: list[BuildHint] = []
    by_name = {f.name: f for f in profile.metadata_fields}
    for fname in analysis.filter_fields:
        fp = by_name.get(fname)
        if fp is not None and not fp.indexed and fp.cardinality > 100:
            hints.append(BuildHint(
                "partitioning", "warning",
                f"Field '{fname}' has high cardinality ({fp.cardinality}) "
                "and no partition/bucket layout",
                f"partitionBy('{fname}') or bucket the table on it so the "
                "predicate becomes partition pruning",
                latency_change_pct=-30.0, memory_change_pct=5.0))
    if analysis.complexity == "complex":
        hints.append(BuildHint(
            "query_structure", "suggestion",
            "Query has high complexity which may impact performance",
            "Break into simpler queries or pre-filter before the vector "
            "stage", latency_change_pct=-20.0, memory_change_pct=-10.0))
    if profile.vector_count > 100_000 and not analysis.filter_fields:
        hints.append(BuildHint(
            "filter_order", "suggestion",
            "Large collection without pre-filters scans every row",
            "Add metadata filters so Catalyst pushes them into the scan",
            latency_change_pct=-40.0, memory_change_pct=-20.0))
    if profile.vector_count > 500_000 and profile.quantization is None:
        hints.append(BuildHint(
            "quantization", "suggestion",
            "Large collection without quantization uses significant memory",
            "Enable SQ8 or PQ codes (plans/quantization.py; the compression "
            "advisor measures the recall cost)",
            latency_change_pct=5.0, memory_change_pct=-75.0))
    if analysis.query_class in ("semantic", "hybrid") and \
            profile.probe_fraction is not None and profile.probe_fraction < 0.1:
        hints.append(BuildHint(
            "search_parameters", "info",
            f"probe fraction {profile.probe_fraction} may trade recall for "
            "speed", "Raise nprobe (plans/tuning.recommended_nprobe inverts "
            "the recall curve)", latency_change_pct=30.0))
    if profile.cache_hit_rate < 0.3 and analysis.complexity == "simple":
        hints.append(BuildHint(
            "caching", "info",
            "Simple query pattern may benefit from result caching",
            "Enable the semantic cache (operators/semantic_cache.py)",
            latency_change_pct=-80.0, memory_change_pct=10.0))
    order = {"warning": 0, "suggestion": 1, "info": 2}
    return sorted(hints, key=lambda h: order[h.severity])


@dataclass
class QueryBuildResult:
    """query_builder.rs:661-680."""

    needleql: str
    parsed: dict | None
    analysis: QueryAnalysis
    hints: list[BuildHint]
    quality_score: float
    suggestions: list[dict]
    alternatives: list[dict]


class VisualQueryBuilder:
    """query_builder.rs:732+ — NL in, validated NeedleQL out."""

    def __init__(self, profile: CollectionProfile):
        self.profile = profile
        self.analyzer = QueryAnalyzer()

    # ------------------------------------------------------ build --
    def build(self, natural_query: str) -> QueryBuildResult:
        parsed_nl = self.analyzer.nl.parse(natural_query)
        analysis = self.analyzer.analyze(natural_query, parsed=parsed_nl)
        ql = self._translate(parsed_nl, analysis)
        parsed = self._validate(ql)
        hints = generate_hints(analysis, self.profile)
        quality = self._quality(analysis, hints, parsed)
        return QueryBuildResult(
            needleql=ql, parsed=parsed, analysis=analysis, hints=hints,
            quality_score=quality,
            suggestions=self._suggestions(analysis, quality),
            alternatives=self._alternatives(analysis))

    def _translate(self, parsed: ParsedQuery,
                   analysis: QueryAnalysis) -> str:
        """query_builder.rs:774-830 translate_to_needleql, with parsed
        literal values inlined instead of placeholders where the NL
        parser extracted them."""
        where: list[str] = []
        if analysis.query_class in ("semantic", "hybrid") and \
                analysis.search_terms:
            where.append("vector SIMILAR TO $query")
        if parsed.filter is not None:
            # the NL parser already folds temporal expressions into an
            # inserted_at range inside the filter doc
            clause = _filter_to_ql(parsed.filter)
            if clause:
                where.append(clause)
        parts = ["SELECT *", f"FROM {self.profile.name}"]
        if where:
            parts.append("WHERE " + " AND ".join(where))
        limit = 10 if analysis.query_class in ("semantic", "hybrid") else 100
        parts.append(f"LIMIT {limit}")
        return " ".join(parts)

    def _validate(self, ql: str) -> dict | None:
        """Round-trip through the engine's real parser."""
        from needle_spark.ql.parser import parse

        try:
            stmt = parse(ql)
        except Exception:
            return None
        return {
            "collection": stmt.collection,
            "has_filter": stmt.where is not None,
            "limit": stmt.limit,
        }

    def _quality(self, analysis: QueryAnalysis, hints: list[BuildHint],
                 parsed: dict | None) -> float:
        """query_builder.rs:865-895 calculate_quality."""
        q = analysis.confidence if analysis.confidence > 0 else 0.5
        if parsed is None:
            q *= 0.3  # generated QL failed to parse — should not happen
        q -= 0.1 * sum(1 for h in hints if h.severity == "warning")
        if analysis.query_class == "hybrid":
            q += 0.1  # both signals present
        return round(max(0.0, min(1.0, q)), 3)

    def _suggestions(self, analysis: QueryAnalysis,
                     quality: float) -> list[dict]:
        """query_builder.rs:897-965 generate_suggestions."""
        out = []
        if analysis.query_class == "semantic" and not analysis.filter_fields \
                and self.profile.metadata_fields:
            f0 = self.profile.metadata_fields[0].name
            out.append({
                "type": "add_filter",
                "message": "Add a metadata filter to narrow the search",
                "example": f"... WHERE vector SIMILAR TO $query AND "
                           f"{f0} = '...'"})
        if analysis.query_class == "metadata_only":
            out.append({
                "type": "use_hybrid",
                "message": "Combine with semantic search for relevance "
                           "ranking",
                "example": "... WHERE vector SIMILAR TO $query AND <filter>"})
        if len(analysis.search_terms) == 1:
            out.append({
                "type": "refine_search",
                "message": "Single-word queries match broadly; add context "
                           "words"})
        if quality < 0.5:
            out.append({
                "type": "simplify",
                "message": "Low-confidence parse; state the filter "
                           "explicitly (field = value)"})
        return out

    def _alternatives(self, analysis: QueryAnalysis) -> list[dict]:
        """query_builder.rs:967-1020 generate_alternatives."""
        name = self.profile.name
        out = []
        if analysis.filter_fields:
            conds = " AND ".join(
                f"{f} = ${f}" for f in analysis.filter_fields)
            out.append({
                "needleql": f"SELECT * FROM {name} WHERE {conds} LIMIT 100",
                "description": "Filter-only variant (no vector stage)",
                "estimated_quality": 0.6})
        if analysis.query_class in ("semantic", "hybrid"):
            out.append({
                "needleql": f"SELECT * FROM {name} WHERE vector SIMILAR TO "
                            "$query LIMIT 20",
                "description": "Pure semantic variant (drops all filters)",
                "estimated_quality": 0.55})
            out.append({
                "needleql": f"SELECT * FROM {name} USING RAG(top_k=5, "
                            "rerank=true) WHERE vector SIMILAR TO $query",
                "description": "RAG variant with context assembly",
                "estimated_quality": 0.7})
        return out

    # ------------------------------------------- autocompletion --
    def suggest_fields(self, partial: str) -> list[dict]:
        """query_builder.rs:1023-1038."""
        low = partial.lower()
        return [{"name": f.name, "dtype": f.dtype,
                 "cardinality": f.cardinality}
                for f in self.profile.metadata_fields
                if f.name.lower().startswith(low)]

    def suggest_values(self, fieldname: str) -> list:
        """query_builder.rs:1040-1048."""
        for f in self.profile.metadata_fields:
            if f.name == fieldname:
                return list(f.examples)
        return []

    # ------------------------------------------------- explain --
    def explain(self, needleql: str) -> dict:
        """query_builder.rs:1050-1120: parse with the engine grammar and
        narrate the execution steps."""
        from needle_spark.ql import ast
        from needle_spark.ql.parser import parse

        try:
            stmt = parse(needleql)
        except Exception as e:  # noqa: BLE001
            return {"valid": False, "error": str(e), "summary": "",
                    "steps": []}
        if not isinstance(stmt, ast.SelectStmt):
            return {"valid": True, "summary": type(stmt).__name__,
                    "steps": [], "error": None}
        steps = [f"Scan collection '{stmt.collection}'"]
        summary = [f"Search collection '{stmt.collection}'"]
        if stmt.where is not None:
            steps.append("Apply WHERE predicate (pushed to the Parquet scan "
                         "where expressible)")
            summary.append("matching the filter")
        if stmt.with_time_decay is not None:
            steps.append("Apply time-decay scoring")
        if stmt.order_by:
            keys = ", ".join(str(k.expr) for k in stmt.order_by)
            steps.append(f"Order by {keys} (TakeOrderedAndProject when "
                         "followed by LIMIT)")
        if stmt.rerank is not None:
            steps.append("Rerank the candidate page")
        if stmt.limit is not None:
            steps.append(f"Return the top {stmt.limit} rows")
            summary.append(f"returning up to {stmt.limit} results")
        return {"valid": True, "summary": ", ".join(summary),
                "steps": steps, "error": None}


def _ql_literal(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


def _filter_to_ql(flt: dict) -> str:
    """Serialize the NL parser's Mongo-style filter doc into NeedleQL
    WHERE syntax (the subset the grammar accepts)."""
    parts: list[str] = []
    for k, v in flt.items():
        if k == "$and":
            sub = " AND ".join(_filter_to_ql(x) for x in v)
            parts.append(f"({sub})" if sub else "")
        elif k == "$or":
            sub = " OR ".join(_filter_to_ql(x) for x in v)
            parts.append(f"({sub})" if sub else "")
        elif isinstance(v, dict):
            for op, val in v.items():
                sym = {"$eq": "=", "$ne": "!=", "$gt": ">", "$gte": ">=",
                       "$lt": "<", "$lte": "<="}.get(op)
                if sym is not None:
                    parts.append(f"{k} {sym} {_ql_literal(val)}")
                elif op == "$in" and isinstance(val, list):
                    vals = ", ".join(_ql_literal(x) for x in val)
                    parts.append(f"{k} IN ({vals})")
                elif op == "$contains":
                    parts.append(f"{k} LIKE {_ql_literal(f'%{val}%')}")
                elif op == "$not" and isinstance(val, dict) and \
                        "$contains" in val:
                    parts.append(
                        f"{k} NOT LIKE {_ql_literal('%' + str(val['$contains']) + '%')}")
        else:
            parts.append(f"{k} = {_ql_literal(v)}")
    return " AND ".join(p for p in parts if p)

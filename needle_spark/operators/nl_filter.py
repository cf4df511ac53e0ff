"""Natural-language -> structured-filter parser.

Reference: /root/reference/src/search/nl_filter.rs — a rule-based
extractor that turns phrases like "documents from last week about ML
with score > 0.8 tagged as landscape by alice" into (search_text,
filter-JSON, temporal constraint, intents).  No ML involved — regex +
keyword patterns — so it ports as deterministic Python that emits the
same MongoDB-style filter documents our compiler consumes.

Ported behavior surface:
- FilterPattern extractors (:74-98): NextWord, Number, Comparison,
  DateTime, Boolean ("not published" negates, :369-378), List
  (comma/and-separated tags, :380-395).
- TemporalPattern aliases (:168-205): today/yesterday ranges, last
  hour/day/week/month/year open ranges.
- QueryIntent (:57-71) + weighted intent classification
  (classify_intent :1000-1050): search/filter/aggregate/compare/
  temporal/exclude, primary + secondary by score.
- Exclusion filters ("not tagged as", "without tag", "excluding").
- ConversationalQueryParser (:769-965): pronoun resolution against the
  last query, "more/another" continuation, sticky context filters,
  entity store.
- QueryBuilder fluent API (:571-648).

`now` is an injected epoch-seconds parameter for determinism.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

DAY = 86400
HOUR = 3600

_COMPARE_WORDS = {
    "greater than": ">", "more than": ">", "above": ">", "over": ">",
    "less than": "<", "under": "<", "below": "<", "at least": ">=",
    "at most": "<=",
}

# intent keyword weights (nl_filter.rs default_intent_patterns :792-880)
_INTENT_PATTERNS: list[tuple[str, float, tuple[str, ...]]] = [
    ("search", 1.0, ("find", "search", "show", "get", "display", "list",
                     "fetch", "what", "which", "where", "look for",
                     "similar to", "like")),
    ("filter", 0.9, ("where", "with", "having", "only", "just", "specific",
                     "category", "type", "status", "by", "from", "to")),
    ("aggregate", 1.0, ("how many", "count", "total", "sum", "average",
                        "min", "max", "statistics", "stats",
                        "distribution", "breakdown")),
    ("compare", 0.95, ("compare", "versus", "vs", "difference", "between",
                       "better", "worse", "more", "less", "than")),
    ("temporal", 0.9, ("when", "today", "yesterday", "week", "month",
                       "year", "recent", "latest", "newest", "oldest",
                       "last", "before", "after")),
    ("exclude", 0.95, ("not", "without", "except", "exclude", "excluding",
                       "ignore", "skip", "no", "doesn't", "don't")),
]


@dataclass
class ParsedQuery:
    search_text: str
    filter: dict | None = None
    temporal: dict | None = None  # {start, end, expression}
    intents: list[str] = field(default_factory=list)
    confidence: float = 0.0


@dataclass
class IntentClassification:
    """classify_intent result (nl_filter.rs:650-660)."""

    primary_intent: str
    secondary_intents: list[str]
    confidence_scores: dict[str, float]


def classify_intent(query: str) -> IntentClassification:
    """Weighted keyword scoring (nl_filter.rs classify_intent): multi-word
    keywords score 1.5x; primary = best, secondaries = the rest in score
    order; defaults to search."""
    low = query.lower()
    words = set(low.split())
    scores: dict[str, float] = {}
    for intent, weight, keywords in _INTENT_PATTERNS:
        s = 0.0
        for kw in keywords:
            if " " in kw:
                if kw in low:
                    s += weight * 1.5
            elif kw in words:
                s += weight
        if s > 0.0:
            scores[intent] = scores.get(intent, 0.0) + s
    if not scores:
        scores["search"] = 1.0
    mx = max(scores.values())
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return IntentClassification(
        primary_intent=ranked[0][0],
        secondary_intents=[k for k, _ in ranked[1:]],
        confidence_scores={k: v / max(mx, 1.0) for k, v in scores.items()},
    )


class NLFilterParser:
    """Rule-based parser: category/tag/author patterns, numeric
    comparisons, boolean and list extractors, exclusions, relative-time
    expressions (nl_filter.rs:120-560)."""

    def __init__(self):
        # (regex, field) extraction patterns; extend with add_pattern()
        self.patterns: list[tuple[re.Pattern, str]] = [
            (re.compile(r"\bin category (\w+)"), "category"),
            (re.compile(r"\bcategory[: ]+(\w+)"), "category"),
            (re.compile(r"\b(?:type|kind)[: ]+(\w+)"), "category"),
            (re.compile(r"\bby (?:author )?([A-Za-z][\w.]*)"), "author"),
            (re.compile(r"\bfrom source (\w+)"), "source"),
            (re.compile(r"\bin (\w+) language\b|\blanguage[: ]+(\w+)"), "lang"),
        ]
        # List extractor (ValueExtractor::List): "tagged as a, b and c"
        self.list_patterns: list[tuple[re.Pattern, str]] = [
            (re.compile(
                r"\b(?:tagged|labeled) (?:as |with )?"
                r"(\w+(?:\s*,\s*\w+)*(?:\s+(?:and|or)\s+\w+)?)"), "tags"),
        ]
        # Boolean extractor (ValueExtractor::Boolean): "not published"
        # negates (nl_filter.rs:369-378)
        self.bool_patterns: list[tuple[re.Pattern, str]] = [
            (re.compile(r"\b(not\s+|un)?(published|active|enabled)\b"), "is_published"),
            (re.compile(r"\b(not\s+|un)?(verified|confirmed)\b"), "is_verified"),
        ]
        # Exclusions -> negated filters
        self.exclude_patterns: list[tuple[re.Pattern, str]] = [
            (re.compile(r"\bnot (?:tagged|labeled) (?:as |with )?(\w+)"), "tags"),
            (re.compile(r"\bwithout (?:tag |label )(\w+)"), "tags"),
            (re.compile(r"\bexcluding category (\w+)"), "category"),
        ]
        self.temporal_patterns: list[tuple[re.Pattern, float, float | None]] = [
            (re.compile(r"\b(?:from |in )?(?:the )?last (\d+) days?\b"), -1, None),
            (re.compile(r"\b(?:last|past) hour\b"), HOUR / DAY, None),
            (re.compile(r"\b(?:last|past) day\b|\b24 hours\b"), 1, None),
            (re.compile(r"\b(?:last|past|this) week\b"), 7, None),
            (re.compile(r"\b(?:last|past|this) month\b"), 30, None),
            (re.compile(r"\b(?:last|past|this) year\b"), 365, None),
            (re.compile(r"\byesterday\b"), 2, 1),
            (re.compile(r"\btoday\b"), 1, 0),
        ]

    def add_pattern(self, regex: str, fieldname: str) -> None:
        self.patterns.append((re.compile(regex), fieldname))

    def parse(self, query: str, now: int = 0) -> ParsedQuery:
        text = query.strip()
        low = text.lower()
        conds: list[dict] = []
        temporal = None
        intents: list[str] = ["search"]
        matched_spans: list[tuple[int, int]] = []

        # temporal
        for rex, days, end_days in self.temporal_patterns:
            m = rex.search(low)
            if not m:
                continue
            if days == -1:
                days = int(m.group(1))
            start = int(now - days * DAY)
            end = int(now - end_days * DAY) if end_days is not None else None
            temporal = {"start": start, "end": end, "expression": m.group(0)}
            matched_spans.append(m.span())
            intents.append("temporal")
            break

        # exclusions first (so "not tagged as x" doesn't also match the
        # positive tag pattern)
        for rex, fieldname in self.exclude_patterns:
            m = rex.search(low)
            if not m:
                continue
            value = next(g for g in m.groups() if g)
            if fieldname == "tags":
                conds.append({fieldname: {"$not": {"$contains": value}}})
            else:
                conds.append({fieldname: {"$ne": value}})
            matched_spans.append(m.span())
            intents.append("exclude")

        def span_taken(span):
            return any(a <= span[0] < b or a < span[1] <= b
                       for a, b in matched_spans)

        # list fields (tags)
        for rex, fieldname in self.list_patterns:
            m = rex.search(low)
            if not m or span_taken(m.span()):
                continue
            raw = next(g for g in m.groups() if g)
            values = [v for v in re.split(r"\s*,\s*|\s+(?:and|or)\s+", raw) if v]
            if len(values) == 1:
                conds.append({fieldname: {"$contains": values[0]}})
            else:
                conds.append({fieldname: {"$all": values}})
            matched_spans.append(m.span())
            intents.append("filter")

        # field patterns
        for rex, fieldname in self.patterns:
            m = rex.search(low)
            if not m or span_taken(m.span()):
                continue
            value = next(g for g in m.groups() if g)
            conds.append({fieldname: value})
            matched_spans.append(m.span())
            intents.append("filter")

        # boolean fields: "published" / "not published" / "unverified"
        for rex, fieldname in self.bool_patterns:
            m = rex.search(low)
            if not m or span_taken(m.span()):
                continue
            conds.append({fieldname: m.group(1) is None})
            matched_spans.append(m.span())
            intents.append("filter")

        # numeric comparisons: "score > 0.8" / "score greater than 0.8"
        sym = re.finditer(r"\b(\w+)\s*(>=|<=|>|<|=)\s*(-?\d+(?:\.\d+)?)", low)
        for m in sym:
            op = {">": "$gt", "<": "$lt", ">=": "$gte", "<=": "$lte", "=": "$eq"}[m.group(2)]
            conds.append({m.group(1): {op: float(m.group(3))}})
            matched_spans.append(m.span())
            intents.append("filter")
        for phrase, op in _COMPARE_WORDS.items():
            m = re.search(rf"\b(\w+)\s+(?:is\s+)?{phrase}\s+(-?\d+(?:\.\d+)?)", low)
            if m:
                opname = {">": "$gt", "<": "$lt", ">=": "$gte", "<=": "$lte"}[op]
                conds.append({m.group(1): {opname: float(m.group(2))}})
                matched_spans.append(m.span())
                intents.append("filter")

        # search text = query minus matched filter phrases + stop phrases
        chars = list(low)
        for a, b in matched_spans:
            for i in range(a, b):
                chars[i] = " "
        remainder = "".join(chars)
        remainder = re.sub(
            r"\b(show me|find|search for|documents?|articles?|images?|about|with|the)\b",
            " ", remainder)
        search_text = re.sub(r"\s+", " ", remainder).strip()

        flt: dict | None = None
        if temporal is not None:
            t: dict = {"inserted_at": {"$gte": temporal["start"]}}
            if temporal["end"] is not None:
                t["inserted_at"]["$lt"] = temporal["end"]
            conds.append(t)
        if len(conds) == 1:
            flt = conds[0]
        elif conds:
            flt = {"$and": conds}

        n_signals = len(conds) + (1 if search_text else 0)
        confidence = min(1.0, 0.4 + 0.2 * n_signals) if n_signals else 0.0
        return ParsedQuery(
            search_text=search_text, filter=flt, temporal=temporal,
            intents=sorted(set(intents)), confidence=confidence,
        )


# ---------------------------------------------------- conversational ---

@dataclass
class ContextEntry:
    query: str
    parsed: ParsedQuery


class ConversationContext:
    """Sticky conversation state (nl_filter.rs:678-766): query history,
    active filters applied to every subsequent query, topic, entities."""

    MAX_HISTORY = 10

    def __init__(self):
        self.history: list[ContextEntry] = []
        self.active_filters: list[dict] = []
        self.topic: str | None = None
        self.entities: dict[str, object] = {}

    def add_query(self, query: str, parsed: ParsedQuery) -> None:
        self.history.append(ContextEntry(query, parsed))
        del self.history[:-self.MAX_HISTORY]

    def add_filter(self, flt: dict) -> None:
        self.active_filters.append(flt)

    def clear_filters(self) -> None:
        self.active_filters.clear()

    def set_topic(self, topic: str) -> None:
        self.topic = topic

    def store_entity(self, name: str, value) -> None:
        self.entities[name] = value

    def get_entity(self, name: str):
        return self.entities.get(name)

    def last_query(self) -> ContextEntry | None:
        return self.history[-1] if self.history else None

    def has_context(self) -> bool:
        return bool(self.history or self.active_filters or self.topic)


_PRONOUNS = ("it", "that", "those", "them", "this", "these")


class ConversationalQueryParser:
    """Context-aware parsing (nl_filter.rs:769-965): resolves pronouns
    against the previous query's search text, treats "more"/"another"
    as continuations, ANDs sticky context filters in, and classifies
    intent (primary first)."""

    def __init__(self):
        self.base = NLFilterParser()
        self.context = ConversationContext()

    def _resolve_references(self, query: str) -> str:
        low = query.lower()
        last = self.context.last_query()
        for pronoun in _PRONOUNS:
            if re.search(rf"\b{pronoun}\b", low) and last \
                    and last.parsed.search_text:
                return re.sub(rf"\b{pronoun}\b", last.parsed.search_text,
                              low, count=1)
        if ("more" in low or "another" in low) and last:
            return f"{last.parsed.search_text} {query}"
        return query

    def parse_with_context(self, query: str, now: int = 0) -> ParsedQuery:
        parsed = self.base.parse(query, now=now)
        resolved = self._resolve_references(query)
        if resolved != query:
            parsed = self.base.parse(resolved, now=now)

        if self.context.active_filters:
            all_filters = list(self.context.active_filters)
            if parsed.filter is not None:
                all_filters.append(parsed.filter)
            parsed.filter = (all_filters[0] if len(all_filters) == 1
                             else {"$and": all_filters})

        cls = classify_intent(query)
        parsed.intents = [cls.primary_intent] + cls.secondary_intents
        self.context.add_query(query, parsed)
        return parsed


# ---------------------------------------------------------- builder ---

class QueryBuilder:
    """Fluent ParsedQuery builder (nl_filter.rs:571-648) for callers
    that want structured construction with the same output type."""

    def __init__(self, search_text: str):
        self._text = search_text
        self._filters: list[dict] = []
        self._temporal: dict | None = None

    def with_filter(self, flt: dict) -> "QueryBuilder":
        self._filters.append(flt)
        return self

    def with_category(self, category: str) -> "QueryBuilder":
        return self.with_filter({"category": category})

    def with_author(self, author: str) -> "QueryBuilder":
        return self.with_filter({"author": author})

    def with_score_above(self, score: float) -> "QueryBuilder":
        return self.with_filter({"score": {"$gt": float(score)}})

    def from_last_days(self, days: int, now: int = 0) -> "QueryBuilder":
        start = int(now - days * DAY)
        self._temporal = {"start": start, "end": None,
                          "expression": f"last {days} days"}
        return self.with_filter({"inserted_at": {"$gte": start}})

    def build(self) -> ParsedQuery:
        flt = (self._filters[0] if len(self._filters) == 1
               else {"$and": self._filters} if self._filters else None)
        return ParsedQuery(
            search_text=self._text, filter=flt, temporal=self._temporal,
            intents=["search"] + (["filter"] if self._filters else []),
            confidence=min(1.0, 0.4 + 0.2 * (len(self._filters) + 1)),
        )

"""Natural-language -> structured-filter parser.

Reference: /root/reference/src/search/nl_filter.rs — a rule-based
extractor that turns phrases like "documents from last week about ML
with score > 0.8 tagged as landscape by alice" into (search_text,
filter-JSON, temporal constraint, intents).  No ML involved — regex +
keyword patterns — so it ports as deterministic Python that emits the
same MongoDB-style filter documents our compiler consumes.

`now` is an injected epoch-seconds parameter for determinism.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

DAY = 86400

_COMPARE_WORDS = {
    "greater than": ">", "more than": ">", "above": ">", "over": ">",
    "less than": "<", "under": "<", "below": "<", "at least": ">=",
    "at most": "<=",
}


@dataclass
class ParsedQuery:
    search_text: str
    filter: dict | None = None
    temporal: dict | None = None  # {start, end, expression}
    intents: list[str] = field(default_factory=list)
    confidence: float = 0.0


class NLFilterParser:
    """Rule-based parser: category/tag/author patterns, numeric
    comparisons, relative-time expressions (nl_filter.rs:120-310)."""

    def __init__(self):
        # (regex, field) extraction patterns; extend with add_pattern()
        self.patterns: list[tuple[re.Pattern, str]] = [
            (re.compile(r"\btagged (?:as|with) (\w+)"), "tags"),
            (re.compile(r"\bin category (\w+)"), "category"),
            (re.compile(r"\bcategory[: ]+(\w+)"), "category"),
            (re.compile(r"\bby (?:author )?([A-Za-z][\w.]*)"), "author"),
            (re.compile(r"\bfrom source (\w+)"), "source"),
            (re.compile(r"\bin (\w+) language\b|\blanguage[: ]+(\w+)"), "lang"),
        ]
        self.temporal_patterns: list[tuple[re.Pattern, int, int | None]] = [
            (re.compile(r"\b(?:from |in )?(?:the )?last (\d+) days?\b"), -1, None),
            (re.compile(r"\blast week\b"), 7, None),
            (re.compile(r"\blast month\b"), 30, None),
            (re.compile(r"\blast year\b"), 365, None),
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
            start = now - days * DAY
            end = now - end_days * DAY if end_days is not None else None
            temporal = {"start": start, "end": end, "expression": m.group(0)}
            matched_spans.append(m.span())
            intents.append("temporal")
            break

        # field patterns
        for rex, fieldname in self.patterns:
            m = rex.search(low)
            if not m:
                continue
            value = next(g for g in m.groups() if g)
            if fieldname == "tags":
                conds.append({"tags": {"$contains": value}})
            else:
                conds.append({fieldname: value})
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

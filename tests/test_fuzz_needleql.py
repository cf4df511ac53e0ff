"""Property-fuzz of the NeedleQL parser (VERDICT r5 ask #7).

Reference fuzz target: fuzz/fuzz_targets/fuzz_query_parser.rs — the
parser must never panic on ANY input string; it returns an AST or a
clean error.  Here: (1) grammar-adjacent statements assembled from the
real token vocabulary (most parse, some don't — either way the parser
must answer with ast-or-ParseError); (2) mutation fuzz — valid
statements with random splices/truncations/garbage; (3) raw unicode
noise.  The only acceptable exception type is ParseError; a round-trip
sanity check asserts genuinely valid statements still parse.

No Spark session needed — this is pure parser surface.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from needle_spark.ql import ast
from needle_spark.ql.lexer import LexError
from needle_spark.ql.parser import ParseError, parse, parse_script

CLEAN = (ParseError, LexError)  # the two clean front-end error types

# ----------------------------------------------------------- vocab --

IDENTS = ["docs", "items", "t1", "view", "collection", "emb_col", "x"]
FIELDS = ["doc_id", "lang", "text", "n_chars", "vector", "score",
          "distance", "metadata.tags"]
KEYWORDS = [
    "SELECT", "FROM", "WHERE", "AND", "OR", "NOT", "ORDER", "BY",
    "LIMIT", "OFFSET", "GROUP", "HAVING", "AS", "OF", "SIMILAR", "TO",
    "MATCH", "SEARCH", "NEAR", "RERANK", "CREATE", "DROP", "SHOW",
    "COLLECTION", "VIEW", "IN", "BETWEEN", "LIKE", "IS", "NULL",
    "ASC", "DESC", "WITH", "UNION",
]
LITERALS = ["42", "-7", "3.14", "'hello'", "'es'", "[1.0, 2.0]",
            "$query", "'7d'", "NULL", "true"]
PUNCT = ["(", ")", ",", ";", "*", "=", "!=", "<", "<=", ">", ">=",
         "->", "<-", ".", "<@>"]

token = st.one_of(st.sampled_from(KEYWORDS), st.sampled_from(IDENTS),
                  st.sampled_from(FIELDS), st.sampled_from(LITERALS),
                  st.sampled_from(PUNCT))

token_soup = st.lists(token, min_size=0, max_size=25).map(" ".join)

# grammar-adjacent SELECTs: plausible shapes with random holes
sel_cols = st.sampled_from(["*", "doc_id, lang", "doc_id", "lang, n_chars"])
where = st.sampled_from([
    "", "WHERE lang = 'es'", "WHERE n_chars > 100 AND lang != 'en'",
    "WHERE vector SIMILAR TO $query", "WHERE text MATCH 'hash join'",
    "WHERE lang IN ('es', 'de') OR NOT n_chars < 5",
    "WHERE n_chars BETWEEN 10 AND 90",
])
tail = st.sampled_from([
    "", "LIMIT 10", "ORDER BY n_chars DESC LIMIT 5", "LIMIT 5 OFFSET 5",
    "ORDER BY distance ASC LIMIT 3 OFFSET 1", "ORDER BY score",
])
selects = st.builds(
    lambda c, w, t: f"SELECT {c} FROM docs {w} {t}".strip(),
    sel_cols, where, tail)

VALID = [
    "SELECT * FROM docs WHERE vector SIMILAR TO $query LIMIT 10",
    "SELECT doc_id, lang FROM docs WHERE lang = 'es' ORDER BY n_chars DESC",
    "SELECT id, distance FROM docs WHERE vector SIMILAR TO $q "
    "AND lang = 'x' AND n_chars BETWEEN 1 AND 10 "
    "OR lang IN ('a','b') ORDER BY distance ASC LIMIT 5 OFFSET 2;",
    "SEARCH NEAR $query FROM docs LIMIT 5",
    "CREATE COLLECTION c1 (dims = 8)",
    "DROP COLLECTION c1",
    "SHOW COLLECTIONS",
    "CREATE VIEW en_docs AS SELECT id, text FROM docs WHERE lang = 'en'",
]


def _parse_or_clean(text: str) -> None:
    """The fuzz contract: AST out or ParseError/LexError out,
    nothing else."""
    try:
        parse(text)
    except CLEAN:
        pass


@settings(derandomize=True, max_examples=300, deadline=None)
@given(text=token_soup)
def test_ql_token_soup_never_crashes(text):
    _parse_or_clean(text)


@settings(derandomize=True, max_examples=250, deadline=None)
@given(stmt=selects)
def test_ql_grammar_adjacent_never_crashes(stmt):
    _parse_or_clean(stmt)


@settings(derandomize=True, max_examples=250, deadline=None)
@given(stmt=st.sampled_from(VALID),
       pos=st.integers(0, 80),
       splice=st.one_of(st.sampled_from(KEYWORDS + PUNCT + LITERALS),
                        st.text(max_size=4)))
def test_ql_mutation_fuzz(stmt, pos, splice):
    """Valid statement with a random splice or truncation at `pos` —
    a realistic typo surface the recursive descent must survive."""
    p = min(pos, len(stmt))
    _parse_or_clean(stmt[:p] + splice + stmt[p:])
    _parse_or_clean(stmt[:p])


@settings(derandomize=True, max_examples=250, deadline=None)
@given(text=st.text(max_size=40))
def test_ql_raw_noise_never_crashes(text):
    _parse_or_clean(text)
    try:
        parse_script(text)
    except CLEAN:
        pass


def test_ql_valid_statements_still_parse():
    """Guard that the fuzz contract isn't trivially satisfied by a
    parser that rejects everything."""
    for s in VALID:
        assert parse(s) is not None

"""Property-fuzz of the Mongo-style filter compiler (VERDICT r5 ask #7).

Reference fuzz target: fuzz/fuzz_targets/fuzz_metadata_filter.rs — any
JSON must parse or fail cleanly, never panic.  This suite goes further:

1. Differential oracle: hypothesis generates random filter TREES
   ($and/$or/$not over 14 leaf operators, type-correct values); each
   must compile AND select exactly the same doc_ids as an INDEPENDENT
   SQL translation of the same tree run by DuckDB over the same
   parquet (sf0.001 documents).
2. Robustness: arbitrary JSON-shaped garbage must either compile or
   raise FilterError — never IndexError/KeyError/Py4J exceptions.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from needle_spark.filters import FilterError, compile_filter

DOCS = "/root/testdata/sf0.001/documents.parquet"

# type-correct value pools per field (alnum-only strings: they are
# inlined into the DuckDB SQL translation without escaping)
INT_FIELDS = ("doc_id", "n_chars")
STR_FIELDS = ("lang", "source")
TXT_FIELDS = ("text",)
LANGS = ["en", "es", "de", "fr", "pt", "zz"]
SOURCES = ["src0", "src1", "src2", "src9"]
WORDS = ["scan", "join", "window", "batch", "spark", "zebra", "the"]


@pytest.fixture(autouse=True, scope="module")
def _bridge(spark):
    global spark_g, docs_g, con_g
    spark_g = spark
    docs_g = spark.read.parquet(DOCS).cache()
    docs_g.count()
    con_g = duckdb.connect()
    con_g.execute(
        f"create view documents as select * from read_parquet('{DOCS}')")
    yield
    docs_g.unpersist()


ints = st.integers(min_value=-3, max_value=520)
strs = st.sampled_from(LANGS + SOURCES)
words = st.sampled_from(WORDS)


def _leaf_int(field):
    return st.one_of(
        ints.map(lambda v: {field: v}),  # bare equality
        st.tuples(st.sampled_from(["$eq", "$ne", "$gt", "$gte", "$lt",
                                   "$lte"]), ints)
        .map(lambda t: {field: {t[0]: t[1]}}),
        st.lists(ints, min_size=1, max_size=4)
        .map(lambda vs: {field: {"$in": vs}}),
        st.lists(ints, min_size=1, max_size=4)
        .map(lambda vs: {field: {"$nin": vs}}),
        st.booleans().map(lambda b: {field: {"$exists": b}}),
        st.tuples(st.sampled_from(["$gt", "$lte"]), ints)
        .map(lambda t: {field: {"$not": {t[0]: t[1]}}}),
    )


def _leaf_str(field, pool):
    return st.one_of(
        pool.map(lambda v: {field: v}),
        st.tuples(st.sampled_from(["$eq", "$ne"]), pool)
        .map(lambda t: {field: {t[0]: t[1]}}),
        st.lists(pool, min_size=1, max_size=3)
        .map(lambda vs: {field: {"$in": vs}}),
        pool.map(lambda v: {field: {"$contains": v}}),
        pool.map(lambda v: {field: {"$startsWith": v}}),
        pool.map(lambda v: {field: {"$endsWith": v}}),
        pool.map(lambda v: {field: {"$regex": v}}),
        st.booleans().map(lambda b: {field: {"$exists": b}}),
    )


leaves = st.one_of(
    *[_leaf_int(f) for f in INT_FIELDS],
    *[_leaf_str(f, strs) for f in STR_FIELDS],
    *[_leaf_str(f, words) for f in TXT_FIELDS],
)


def _branch(children):
    return st.one_of(
        st.lists(children, min_size=1, max_size=3)
        .map(lambda cs: {"$and": cs}),
        st.lists(children, min_size=1, max_size=3)
        .map(lambda cs: {"$or": cs}),
        children.map(lambda c: {"$not": c}),
    )


filters = st.recursive(leaves, _branch, max_leaves=6)


# --------------------------------------------------------------------
# Independent SQL translation — encodes the documented operator spec,
# sharing NO code with needle_spark.filters (that's what makes the
# agreement check a real differential oracle).
# --------------------------------------------------------------------

def _sql_lit(v):
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v) + "'"  # strategy values are alnum-only


def _sql_op(field, op, v):
    c = field
    if op == "$eq":
        return f"({c} = {_sql_lit(v)})"
    if op == "$ne":
        return f"({c} <> {_sql_lit(v)})"
    if op in ("$gt", "$gte", "$lt", "$lte"):
        sym = {"$gt": ">", "$gte": ">=", "$lt": "<", "$lte": "<="}[op]
        return f"({c} {sym} {_sql_lit(v)})"
    if op == "$in":
        return f"({c} IN ({', '.join(_sql_lit(x) for x in v)}))"
    if op == "$nin":
        return f"(NOT ({c} IN ({', '.join(_sql_lit(x) for x in v)})))"
    if op == "$contains":
        return f"contains({c}, {_sql_lit(v)})"
    if op == "$startsWith":
        return f"starts_with({c}, {_sql_lit(v)})"
    if op == "$endsWith":
        return f"ends_with({c}, {_sql_lit(v)})"
    if op == "$regex":
        return f"regexp_matches({c}, {_sql_lit(v)})"
    if op == "$exists":
        return f"({c} IS {'NOT ' if v else ''}NULL)"
    if op == "$not":
        inner = " AND ".join(_sql_op(field, o, ov) for o, ov in v.items())
        return f"(NOT COALESCE({inner}, FALSE))"
    raise AssertionError(f"translator gap: {op}")


def _sql(doc):
    parts = []
    for k, v in doc.items():
        if k == "$and":
            parts.append("(" + " AND ".join(_sql(c) for c in v) + ")")
        elif k == "$or":
            parts.append("(" + " OR ".join(_sql(c) for c in v) + ")")
        elif k == "$not":
            parts.append(f"(NOT {_sql(v)})")
        elif isinstance(v, dict):
            parts.append(
                "(" + " AND ".join(_sql_op(k, o, ov) for o, ov in v.items())
                + ")")
        else:
            parts.append(f"({k} = {_sql_lit(v)})")
    return "(" + " AND ".join(parts) + ")"


@settings(derandomize=True, max_examples=220, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(doc=filters)
def test_filter_spark_duckdb_agreement(doc):
    got = sorted(
        r["doc_id"]
        for r in docs_g.filter(compile_filter(doc, docs_g))
        .select("doc_id").collect())
    want = [r[0] for r in con_g.execute(
        f"SELECT doc_id FROM documents WHERE {_sql(doc)} "
        f"ORDER BY doc_id").fetchall()]
    assert got == want, f"filter {doc!r}\nsql {_sql(doc)}"


# --------------------------------------------------------------------
# Robustness: junk trees compile or raise FilterError, nothing else
# --------------------------------------------------------------------

json_values = st.recursive(
    st.one_of(st.none(), st.booleans(), st.integers(-9, 9),
              st.floats(allow_nan=False, allow_infinity=False,
                        width=32),
              st.text(max_size=6)),
    lambda inner: st.one_of(
        st.lists(inner, max_size=3),
        st.dictionaries(
            st.one_of(st.sampled_from(
                ["$and", "$or", "$not", "$eq", "$in", "$gt", "$exists",
                 "$size", "$type", "$elemMatch", "$bogus", "lang",
                 "doc_id", "text", "no_such_field", ""]),
                st.text(max_size=5)),
            inner, max_size=3)),
    max_leaves=10)


@settings(derandomize=True, max_examples=250, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(doc=json_values)
def test_filter_compile_or_clean_error(doc):
    """fuzz_metadata_filter.rs parity: any JSON value either compiles
    to a Column or raises FilterError — no other exception type."""
    try:
        compile_filter(doc if isinstance(doc, dict) else {"lang": doc},
                       docs_g)
    except FilterError:
        pass

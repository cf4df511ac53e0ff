"""MongoDB-style filter-JSON -> pyspark Column compiler.

The reference's metadata filter engine (/root/reference/src/metadata.rs:
644-681 operator enum, :984 JSON parser) accepts filters like

    {"category": "books"}
    {"price": {"$gte": 10, "$lt": 100}}
    {"$and": [{"a": 1}, {"$or": [{"b": {"$in": [1, 2]}}, {"c": {"$exists": false}}]}]}

with operators  $eq $ne $gt $gte $lt $lte $in $nin $contains $startsWith
$endsWith $exists $regex $all $elemMatch $between $size $type  and the
logical combinators $and / $or / $not.

Here each filter compiles to a single boolean Column over typed DataFrame
columns (dot-paths resolve to nested struct fields).  Because the result
is a plain Catalyst predicate, Spark gives us for free what needle builds
by hand: predicate pushdown to the Parquet scan replaces the inverted
index (metadata.rs:388), Parquet dictionary/bloom/row-group stats replace
the per-field bloom filters (metadata.rs:220-275), and AND/OR/NOT ID-set
algebra (metadata.rs:433-457) is just boolean expression evaluation.

Schemaless fallback: fields not found in the schema resolve against a
designated `map<string,string>` column (needle collections are
schemaless by default); comparisons there follow needle's dynamic rule —
numeric compare when the filter literal is numeric, else string compare.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_FILTER_DEPTH = 32  # mirrors metadata.rs MAX_FILTER_DEPTH

_JSON_TYPE_NAMES = {"null", "bool", "boolean", "number", "string", "array", "object"}


class FilterError(ValueError):
    """Raised for malformed filter documents (parity with Filter::parse errors)."""


def _spark_json_type(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                       T.FloatType, T.DoubleType, T.DecimalType)):
        return "number"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.ArrayType):
        return "array"
    if isinstance(dt, (T.StructType, T.MapType)):
        return "object"
    return "string"


class FieldResolver:
    """Resolves dot-path field names to (Column, DataType|None).

    - top-level / nested struct fields -> typed column
    - unknown fields with a MAP `meta_col` -> element_at(meta, field)
      (string-typed, dynamic comparisons)
    - unknown fields with a STRING `meta_col` (raw JSON, the REST
      shim's schemaless metadata) -> get_json_object(meta, '$.field')
      — dot-paths reach nested objects, scalars come back unquoted
      (string-typed, same dynamic comparisons)
    - unknown fields otherwise -> NULL literal (matches needle: a filter
      on a missing field simply never matches, it is not an error)
    """

    def __init__(self, df: DataFrame | None = None, meta_col: str | None = None):
        self._schema = df.schema if df is not None else None
        self._meta_col = meta_col
        self._meta_is_json = (
            meta_col is not None
            and isinstance(self._lookup_type(meta_col), T.StringType))

    def resolve(self, field: str) -> tuple[Column, T.DataType | None]:
        dt = self._lookup_type(field)
        if dt is not None:
            return F.col(field), dt
        if self._meta_col is not None:
            if self._meta_is_json:
                return (F.get_json_object(F.col(self._meta_col),
                                          "$." + field), T.StringType())
            return F.element_at(F.col(self._meta_col), field), T.StringType()
        if self._schema is None:
            # no schema knowledge: trust the caller's column name
            return F.col(field), None
        return F.lit(None).cast("string"), None

    def _lookup_type(self, field: str) -> T.DataType | None:
        if self._schema is None:
            return None
        parts = field.split(".")
        dt: T.DataType = self._schema
        for p in parts:
            if isinstance(dt, T.StructType):
                match = next((f for f in dt.fields if f.name == p), None)
                if match is None:
                    return None
                dt = match.dataType
            else:
                return None
        return dt


def compile_filter(
    doc: dict[str, Any],
    df: DataFrame | None = None,
    meta_col: str | None = None,
) -> Column:
    """Compile a MongoDB-style filter document to a boolean Column."""
    resolver = FieldResolver(df, meta_col)
    return _compile(doc, resolver, 0)


def _compile(doc: Any, r: FieldResolver, depth: int) -> Column:
    if depth > MAX_FILTER_DEPTH:
        raise FilterError(f"filter nesting too deep (max {MAX_FILTER_DEPTH})")
    if not isinstance(doc, dict):
        raise FilterError("filter must be a JSON object")

    conds: list[Column] = []
    for key, value in doc.items():
        if key == "$and":
            conds.append(_combine([_compile(v, r, depth + 1) for v in _arr(value, "$and")], "and"))
        elif key == "$or":
            conds.append(_combine([_compile(v, r, depth + 1) for v in _arr(value, "$or")], "or"))
        elif key == "$not":
            conds.append(~_compile(value, r, depth + 1))
        elif key.startswith("$"):
            raise FilterError(f"unknown operator: {key}")
        else:
            conds.append(_field_condition(key, value, r, depth))
    if not conds:
        raise FilterError("empty filter object")
    return _combine(conds, "and")


def _arr(value: Any, op: str) -> list:
    if not isinstance(value, list):
        raise FilterError(f"{op} must be an array")
    if not value and op in ("$and", "$or"):
        # fuzz finding (round 6): {"$and": []} reached _combine's
        # cols[0] as an IndexError instead of a clean parse error
        raise FilterError(f"{op} requires at least one clause")
    return value


def _combine(cols: list[Column], how: str) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = (out & c) if how == "and" else (out | c)
    return out


def _lit_for(col: Column, dt: T.DataType | None, value: Any) -> tuple[Column, Column]:
    """Coerce (column, literal) for comparison following needle's dynamic
    rule: numeric literal + string-ish column -> compare as double;
    otherwise compare natively (typed columns already line up)."""
    if isinstance(value, bool):
        if isinstance(dt, T.StringType):
            return col, F.lit("true" if value else "false")
        return col, F.lit(value)
    if isinstance(value, (int, float)) and isinstance(dt, T.StringType):
        return col.cast("double"), F.lit(float(value))
    return col, F.lit(value)


def _field_condition(field: str, value: Any, r: FieldResolver, depth: int) -> Column:
    col, dt = r.resolve(field)

    if not isinstance(value, dict):
        c, v = _lit_for(col, dt, value)
        return c == v

    conds: list[Column] = []
    for op, opval in value.items():
        conds.append(_op_condition(field, col, dt, op, opval, r, depth))
    if not conds:
        raise FilterError(f"empty condition object for field {field!r}")
    return _combine(conds, "and")


def _op_condition(
    field: str,
    col: Column,
    dt: T.DataType | None,
    op: str,
    v: Any,
    r: FieldResolver,
    depth: int,
) -> Column:
    if op == "$not":
        # field-level negation (Mongo semantics: matches rows that do
        # NOT satisfy the operator object, including NULL/missing)
        if not isinstance(v, dict) or not v:
            raise FilterError("$not requires an operator object")
        inner = _combine(
            [_op_condition(field, col, dt, o, ov, r, depth + 1)
             for o, ov in v.items()], "and")
        return ~F.coalesce(inner, F.lit(False))
    if op == "$eq":
        c, lv = _lit_for(col, dt, v)
        return c == lv
    if op == "$ne":
        c, lv = _lit_for(col, dt, v)
        return c != lv
    if op in ("$gt", "$gte", "$lt", "$lte"):
        c, lv = _lit_for(col, dt, v)
        return {"$gt": c > lv, "$gte": c >= lv, "$lt": c < lv, "$lte": c <= lv}[op]
    if op == "$in":
        vals = _arr(v, "$in")
        # Mongo semantics for the empty set: $in [] matches nothing,
        # $nin [] matches everything (col.isin() with no args throws)
        return col.isin(*vals) if vals else F.lit(False)
    if op == "$nin":
        vals = _arr(v, "$nin")
        return ~col.isin(*vals) if vals else F.lit(True)
    if op == "$contains":
        if isinstance(dt, T.ArrayType):
            return F.array_contains(col, F.lit(v))
        return col.contains(F.lit(str(v)))
    if op == "$startsWith":
        return col.startswith(str(v))
    if op == "$endsWith":
        return col.endswith(str(v))
    if op == "$exists":
        want = bool(v)
        present = col.isNotNull()
        return present if want else ~present
    if op == "$regex":
        return col.rlike(str(v))
    if op == "$all":
        vals = _arr(v, "$all")
        return F.forall(
            F.array(*[F.lit(x) for x in vals]),
            lambda needle_v: F.array_contains(col, needle_v),
        )
    if op == "$elemMatch":
        if not isinstance(v, dict):
            raise FilterError("$elemMatch requires an object")
        return F.exists(col, lambda e: _elem_conditions(e, v, r, depth))
    if op == "$between":
        bounds = _arr(v, "$between")
        if len(bounds) != 2:
            # fuzz finding (round 6): a 1- or 3-element array unpacked
            # into a bare ValueError instead of a clean parse error
            raise FilterError("$between requires exactly [low, high]")
        lo, hi = bounds
        return (col >= F.lit(lo)) & (col <= F.lit(hi))
    if op == "$size":
        # fuzz + review findings (round 6): $size None/str raised
        # TypeError; Infinity raised OverflowError (json accepts it);
        # NaN raised bare ValueError; 2.5 silently truncated to 2 —
        # all must be clean FilterErrors, and only integral sizes match
        if (isinstance(v, bool) or not isinstance(v, (int, float))
                or not math.isfinite(v) or float(v) != int(v)):
            raise FilterError(f"$size requires an integer, got {v!r}")
        if isinstance(dt, T.StringType):
            return F.length(col) == int(v)
        return F.size(col) == int(v)
    if op == "$type":
        name = str(v).lower()
        if name not in _JSON_TYPE_NAMES:
            raise FilterError(f"unknown $type name: {v!r}")
        if dt is None:
            return F.lit(False)
        actual = _spark_json_type(dt)
        if name == "null":
            return col.isNull()
        match = actual == name or (name == "boolean" and actual == "bool")
        return col.isNotNull() & F.lit(match)
    raise FilterError(f"unknown operator: {op}")


def _elem_conditions(elem: Column, cond: dict, r: FieldResolver, depth: int) -> Column:
    """$elemMatch body: operator object applied to the element itself
    ({"$gt": 5}) or field conditions applied to struct elements."""
    conds: list[Column] = []
    for k, v in cond.items():
        if k.startswith("$"):
            conds.append(_op_condition("<elem>", elem, None, k, v, r, depth + 1))
        else:
            sub = elem.getField(k) if hasattr(elem, "getField") else elem[k]
            if isinstance(v, dict):
                for op, opval in v.items():
                    conds.append(_op_condition(k, sub, None, op, opval, r, depth + 1))
            else:
                conds.append(sub == F.lit(v))
    if not conds:
        raise FilterError("$elemMatch requires at least one condition")
    return _combine(conds, "and")


def ttl_filter(df: DataFrame, now: int | None,
               expires_at_col: str = "expires_at") -> DataFrame:
    """TTL lazy filter (ttl.rs is_expired / pipeline.rs:501-514): rows
    whose `expires_at` (unix seconds) has passed are invisible to every
    read path — kNN, analytics, QL scans.  No-op when `now` is None or
    the column doesn't exist; a pure Catalyst predicate, so it pushes
    into the Parquet scan."""
    if now is None or expires_at_col not in df.columns:
        return df
    return df.filter(
        F.col(expires_at_col).isNull() | (F.col(expires_at_col) > F.lit(int(now)))
    )

"""Access-path planner: exact scan vs IVF probe, with EXPLAIN output.

Mirrors the reference's cost-based optimizer decisions (/root/reference/
src/search/query_lang/optimizer.rs):

- strategy selection (:64-145): brute-force below 1000 vectors
  (:111-116); filter-first when the predicate is selective enough
  (:117-130); index-then-filter otherwise; hybrid when text is present.
- selectivity heuristics (:228-268): eq 0.1, ne 0.9, gt/lt 0.3,
  between 0.2, like/contains 0.15, null 0.05, IN 0.1/value capped at
  0.9; AND = product, OR = inclusion-exclusion, NOT = complement.

This lives ABOVE Catalyst on purpose (SURVEY §4): Catalyst cannot reason
about ANN recall, so the exact-vs-approximate choice is made here; once
an access path is chosen, everything else (pushdown, pruning, join
planning, AQE) is Catalyst's job.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout
from dataclasses import dataclass
from typing import Any

BRUTE_FORCE_THRESHOLD = 1000  # optimizer.rs:111-116
FILTER_FIRST_SELECTIVITY = 0.05  # optimizer.rs:117-122


@dataclass
class CollectionStats:
    num_vectors: int
    dims: int
    has_ivf_index: bool = False
    metadata_fields: int = 3


def estimate_selectivity(flt: Any) -> float:
    """Heuristic selectivity of a MongoDB-style filter document
    (optimizer.rs:228-268)."""
    if flt is None:
        return 1.0
    if not isinstance(flt, dict) or not flt:
        return 1.0
    sels: list[float] = []
    for key, value in flt.items():
        if key == "$and":
            s = 1.0
            for sub in value:
                s *= estimate_selectivity(sub)
            sels.append(s)
        elif key == "$or":
            s = 0.0
            for sub in value:
                sub_s = estimate_selectivity(sub)
                s = s + sub_s - s * sub_s  # inclusion-exclusion
            sels.append(s)
        elif key == "$not":
            sels.append(1.0 - estimate_selectivity(value))
        else:
            sels.append(_field_selectivity(value))
    out = 1.0
    for s in sels:
        out *= s
    return out


def _field_selectivity(cond: Any) -> float:
    if not isinstance(cond, dict):
        return 0.1  # implicit equality
    s = 1.0
    for op, v in cond.items():
        if op == "$eq":
            s *= 0.1
        elif op == "$ne":
            s *= 0.9
        elif op in ("$gt", "$gte", "$lt", "$lte"):
            s *= 0.3
        elif op == "$between":
            s *= 0.2
        elif op in ("$contains", "$startsWith", "$endsWith", "$regex"):
            s *= 0.15
        elif op == "$exists":
            s *= 0.95 if v else 0.05
        elif op == "$in":
            s *= min(0.1 * max(len(v), 1), 0.9)
        elif op == "$nin":
            s *= max(1.0 - min(0.1 * max(len(v), 1), 0.9), 0.1)
        else:
            s *= 0.5
    return s


def choose_strategy(
    stats: CollectionStats,
    flt: Any = None,
    has_text_query: bool = False,
) -> str:
    """-> 'brute_force' | 'filter_then_scan' | 'ivf_probe' | 'hybrid'."""
    if has_text_query:
        return "hybrid"
    if stats.num_vectors < BRUTE_FORCE_THRESHOLD:
        return "brute_force"
    sel = estimate_selectivity(flt)
    if flt is not None and sel < FILTER_FIRST_SELECTIVITY:
        return "filter_then_scan"
    if stats.has_ivf_index:
        return "ivf_probe"
    return "brute_force"


def numeric_histogram(df, col: str, buckets: int = 10):
    """Equi-width numeric histogram (cost_estimator.rs:125-271) for
    selectivity estimation: returns (lo, hi, [bucket counts])."""
    from pyspark.sql import functions as F

    row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
    lo, hi = float(row["lo"]), float(row["hi"])
    if hi <= lo:
        return lo, hi, [df.count()] + [0] * (buckets - 1)
    counts_rows = (
        df.select(
            F.least(
                F.floor((F.col(col) - lo) / ((hi - lo) / buckets)).cast("int"),
                F.lit(buckets - 1),
            ).alias("__b")
        )
        .groupBy("__b").count().collect()
    )
    counts = [0] * buckets
    for r in counts_rows:
        counts[r["__b"]] = r["count"]
    return lo, hi, counts


def histogram_selectivity(hist, lo_q: float, hi_q: float) -> float:
    """Estimated fraction of rows in [lo_q, hi_q] from a histogram with
    linear interpolation inside partially-covered buckets."""
    lo, hi, counts = hist
    total = sum(counts)
    if total == 0 or hi <= lo:
        return 0.0
    width = (hi - lo) / len(counts)
    acc = 0.0
    for i, c in enumerate(counts):
        b_lo, b_hi = lo + i * width, lo + (i + 1) * width
        ov_lo, ov_hi = max(b_lo, lo_q), min(b_hi, hi_q)
        if ov_hi > ov_lo:
            acc += c * (ov_hi - ov_lo) / width
    return min(acc / total, 1.0)


def explain_text(df, mode: str = "formatted") -> str:
    """Capture df.explain() as a string (EXPLAIN surface,
    needleql_executor.rs:296-319 renders plan steps similarly)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def explain_search(
    stats: CollectionStats, strategy: str, flt: Any = None, df=None
) -> str:
    """Human-readable plan: our strategy decision + Catalyst's physical
    plan when a DataFrame is supplied."""
    lines = [
        f"strategy: {strategy}",
        f"collection: {stats.num_vectors} vectors x {stats.dims} dims",
        f"filter selectivity estimate: {estimate_selectivity(flt):.4f}",
    ]
    if df is not None:
        lines += ["", "physical plan:", explain_text(df)]
    return "\n".join(lines)

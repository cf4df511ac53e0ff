"""NeedleQL executor: compile parsed statements onto the engine's
DataFrame builders.

Reference pipeline (/root/reference/src/search/query_lang/executor.rs:
103-309; statement dispatch needleql_executor.rs:412-609):

    text -> tokens -> ast -> (strategy) -> DataFrame plan -> result

The executor runs against a table registry (name -> DataFrame) and/or a
`needle_spark.catalog.Database` for DDL/DML.  `SIMILAR TO $p` binds the
query vector from `params`; `MATCH 'text'` routes through BM25; both
together fuse with RRF (docs/needleql.md 'Hybrid Search').  EXPLAIN
returns our strategy summary plus Catalyst's physical plan
(needleql_executor.rs:296-319 plan-step vocabulary).
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from needle_spark.ql import ast
from needle_spark.ql.parser import parse

DEFAULT_LIMIT = 10  # needleql_executor.rs:375-386

_DURATION_RE = re.compile(r"^\s*(\d+)\s*(s|m|h|d|w)\s*$", re.I)
_DURATION_SECS = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}


def parse_duration(text: str) -> int:
    """'7d' / '2h' / '30m' style durations -> seconds
    (docs/needleql.md:110-118, half_life=7d in query_lang/mod.rs:25-26)."""
    m = _DURATION_RE.match(text)
    if not m:
        raise ValueError(f"bad duration: {text!r}")
    return int(m.group(1)) * _DURATION_SECS[m.group(2).lower()]


class ExecError(ValueError):
    pass


@dataclass
class ExecutionStats:
    """Per-query execution statistics (executor.rs:77-90 vocabulary).

    Spark's Catalyst fuses the metadata filter INTO the vector-scan
    stage (predicate pushdown), so there is no separable filter phase:
    `filter_time_ms` stays 0.0 and `search_time_ms` covers the fused
    scan+filter+rank job; `total_time_ms` adds plan build + parse."""

    total_time_ms: float = 0.0
    search_time_ms: float = 0.0
    filter_time_ms: float = 0.0
    vectors_scanned: int = 0
    vectors_matched: int = 0


@dataclass
class QueryResponse:
    """QueryResponse{results, plan, stats} (executor.rs:45-52)."""

    results: list
    plan: str | None
    stats: ExecutionStats


class QueryExecutor:
    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, DataFrame] | None = None,
        database=None,
        vector_col: str = "vector",
        id_col: str = "id",
        text_col: str = "text",
        metric: str = "cosine",
        inserted_at_col: str = "inserted_at",
    ):
        self.spark = spark
        self.tables = dict(tables or {})
        self.database = database
        self.vector_col = vector_col
        self.id_col = id_col
        self.text_col = text_col
        self.metric = metric
        self.inserted_at_col = inserted_at_col
        self.views: dict[str, ast.SelectStmt] = {}
        self.materialized: dict[str, DataFrame] = {}
        # Temporary name -> DataFrame shadows consulted FIRST by _resolve.
        # execute_with_stats uses this so its Observation-wrapped source is
        # the one actually executed even when the target is a view or
        # materialized view (otherwise obs.get would block forever on a
        # dataset that never ran).
        self._overrides: dict[str, DataFrame] = {}

    # ------------------------------------------------------- dispatch --
    def execute(self, sql: str, params: dict[str, Any] | None = None):
        return self._execute_stmt(parse(sql), params or {})

    def execute_script(self, sql: str, params: dict[str, Any] | None = None) -> list:
        """Run a ';'-separated script statement-by-statement, returning
        one result per statement (docs/needleql.md batch sessions)."""
        from needle_spark.ql.parser import parse_script

        params = params or {}
        return [self._execute_stmt(s, params) for s in parse_script(sql)]

    def _execute_stmt(self, stmt, params: dict[str, Any]):
        if isinstance(stmt, ast.SelectStmt):
            if stmt.explain:
                return self.explain(stmt, params)
            return self._select(stmt, params)
        if isinstance(stmt, ast.InsertStmt):
            return self._insert(stmt, params)
        if isinstance(stmt, ast.DeleteStmt):
            return self._delete(stmt, params)
        if isinstance(stmt, ast.CreateCollectionStmt):
            if self.database is None:
                raise ExecError("no database attached")
            self.database.create_collection(
                stmt.name,
                dims=int(stmt.options.get("dims", 0) or 0) or 2,
                metric=str(stmt.options.get("metric", self.metric)),
            )
            return {"created": stmt.name}
        if isinstance(stmt, ast.DropCollectionStmt):
            if self.database is None:
                raise ExecError("no database attached")
            self.database.drop_collection(stmt.name)
            return {"dropped": stmt.name}
        if isinstance(stmt, ast.ShowCollectionsStmt):
            names = sorted(self.tables) + (
                self.database.list_collections() if self.database else []
            )
            return {"collections": sorted(set(names))}
        if isinstance(stmt, ast.CreateViewStmt):
            self.views[stmt.name] = stmt.query
            if stmt.materialized:
                self.materialized[stmt.name] = self._select(stmt.query, {}).cache()
            return {"created_view": stmt.name, "materialized": stmt.materialized}
        if isinstance(stmt, ast.DropViewStmt):
            self.views.pop(stmt.name, None)
            mv = self.materialized.pop(stmt.name, None)
            if mv is not None:
                mv.unpersist()
            return {"dropped_view": stmt.name}
        raise ExecError(f"unsupported statement: {type(stmt).__name__}")

    def execute_with_stats(self, sql: str, params: dict[str, Any] | None = None,
                           with_plan: bool = False) -> QueryResponse:
        """Execute a SELECT and return QueryResponse{results, plan,
        stats} (executor.rs:45-90).  `vectors_scanned` is measured with
        an Observation on the source scan during the SAME job (no
        second pass); note the metrics barrier pins the count to
        pre-filter rows, matching the reference's meaning.

        Counting semantics: `vectors_scanned` counts rows flowing
        through each *reference* to the observed source.  Hybrid
        queries with post-stages reference the source twice in one job
        (kNN/BM25 base + payload-restore join), so the figure there is
        ~2x the distinct source rows — it measures scan work performed,
        not table cardinality."""
        from pyspark.sql import Observation

        t0 = time.perf_counter()
        stmt = parse(sql)
        params = params or {}
        if not isinstance(stmt, ast.SelectStmt) or stmt.explain:
            raise ExecError("execute_with_stats expects a plain SELECT")
        obs = Observation()
        src = self._resolve(stmt.collection)
        wrapped = src.observe(obs, F.count(F.lit(1)).alias("scanned"))
        self._overrides[stmt.collection] = wrapped
        try:
            df = self._select(stmt, params)
            t_built = time.perf_counter()
            rows = df.collect()
            t_done = time.perf_counter()
        finally:
            self._overrides.pop(stmt.collection, None)
        stats = ExecutionStats(
            total_time_ms=(t_done - t0) * 1000.0,
            search_time_ms=(t_done - t_built) * 1000.0,
            filter_time_ms=0.0,  # fused into the scan (see class doc)
            vectors_scanned=int(obs.get.get("scanned") or 0),
            vectors_matched=len(rows),
        )
        plan = self.explain(stmt, params) if with_plan else None
        return QueryResponse(results=rows, plan=plan, stats=stats)

    # -------------------------------------------------------- resolve --
    def _resolve(self, name: str, params: dict | None = None) -> DataFrame:
        if name in self._overrides:
            return self._overrides[name]
        if name in self.materialized:
            return self.materialized[name]
        if name in self.views:
            # the view body may use $params / the injected now: the
            # OUTER call's bindings apply (an empty dict would make
            # any parameterized view permanently unusable)
            return self._select(self.views[name], params or {})
        if name in self.tables:
            return self.tables[name]
        if self.database is not None:
            return self.database.collection(name).df()
        raise ExecError(f"unknown collection: {name}")

    # --------------------------------------------------------- SELECT --
    def _split_where(self, expr):
        """Pull SIMILAR TO / MATCH terms out of a top-level AND chain;
        the residue becomes the metadata filter (executor.rs builds the
        same split)."""
        similar, match, residue = [], [], []

        def walk(e):
            if isinstance(e, ast.And):
                walk(e.left)
                walk(e.right)
            elif isinstance(e, ast.SimilarTo):
                similar.append(e)
            elif isinstance(e, ast.TextMatch):
                match.append(e)
            else:
                residue.append(e)

        if expr is not None:
            walk(expr)
        if len(similar) > 1:
            raise ExecError("multiple SIMILAR TO clauses")
        if len(match) > 1:
            raise ExecError("multiple MATCH clauses")
        resid_expr = None
        for r in residue:
            resid_expr = r if resid_expr is None else ast.And(resid_expr, r)
        return (similar[0] if similar else None,
                match[0] if match else None,
                resid_expr)

    @staticmethod
    def _value(v, params: dict):
        """Resolve a parsed literal: $param placeholders
        (ast.FuncCall('$param', [name])) bind from `params`; everything
        else passes through."""
        if isinstance(v, ast.FuncCall) and v.name == "$param":
            name = v.args[0]
            if name not in params:
                raise ExecError(f"unbound parameter: ${name}")
            return params[name]
        return v


    def _mmr_frame(self, picked, base_schema_df, df: DataFrame,
                   stmt) -> DataFrame:
        """Rebuild a DataFrame from mmr_diversify's picked rows,
        preserving pick ORDER (a rank column survives later joins) and
        re-attaching any SELECTed payload columns the rerank projected
        away (silently returning rows without a requested column is a
        wrong answer)."""
        from pyspark.sql import types as T

        base_schema = base_schema_df.schema
        schema = T.StructType(
            [T.StructField("__mmr_rank", T.IntegerType())]
            + list(base_schema.fields))
        out = self.spark.createDataFrame(
            [(i, *tuple(r)) for i, r in enumerate(picked)], schema)
        want = [c for c in (stmt.columns or df.columns)
                if c not in out.columns and c in df.columns]
        if want:
            out = out.join(df.select(self.id_col, *want),
                           self.id_col, "left")
        return out.orderBy("__mmr_rank").drop("__mmr_rank")

    def _compile_pred(self, e, df: DataFrame,
                      params: dict | None = None) -> Column:
        params = params or {}
        if isinstance(e, ast.And):
            return self._compile_pred(e.left, df, params) \
                & self._compile_pred(e.right, df, params)
        if isinstance(e, ast.Or):
            return self._compile_pred(e.left, df, params) \
                | self._compile_pred(e.right, df, params)
        if isinstance(e, ast.Not):
            return ~self._compile_pred(e.inner, df, params)
        if isinstance(e, ast.Comparison):
            c, v = F.col(e.column), F.lit(self._value(e.value, params))
            return {"=": c == v, "!=": c != v, "<": c < v,
                    "<=": c <= v, ">": c > v, ">=": c >= v}[e.op]
        if isinstance(e, ast.InList):
            c = F.col(e.column).isin(
                [self._value(v, params) for v in e.values])
            return ~c if e.negated else c
        if isinstance(e, ast.Between):
            return F.col(e.column).between(
                F.lit(self._value(e.low, params)),
                F.lit(self._value(e.high, params)))
        if isinstance(e, ast.Like):
            c = F.col(e.column).like(e.pattern)
            return ~c if e.negated else c
        if isinstance(e, ast.IsNull):
            c = F.col(e.column)
            return c.isNotNull() if e.negated else c.isNull()
        raise ExecError(f"cannot compile predicate: {e!r}")

    def _bind_vector(self, name: str, params: dict) -> list[float]:
        if name not in params:
            raise ExecError(f"unbound parameter: ${name}")
        return [float(x) for x in params[name]]

    def _dedup_candidates(self, out: DataFrame, order_col: str,
                          ascending: bool, jaccard_threshold: float = 0.7) -> DataFrame:
        """RAG chunk dedup (pipeline.rs:855 deduplicate_chunks): drop
        candidates whose TEXT is near-identical to an already-kept,
        better-ranked candidate (character-trigram Jaccard — the exact
        form of the MinHash similarity the reference approximates; the
        candidate set is <= fetch_k rows so we compute it exactly,
        driver-side like MMR).  Collections without a text column fall
        back to collapsing identically-scored rows."""
        key = F.col(order_col).asc() if ascending else F.col(order_col).desc()
        if self.text_col not in out.columns:
            w = Window.partitionBy(F.round(F.col(order_col), 9)).orderBy(
                F.col(self.id_col).asc())
            return (
                out.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1).drop("__rn")
                .orderBy(key, F.col(self.id_col).asc())
            )
        rows = out.orderBy(key, F.col(self.id_col).asc()).collect()

        def shingles(t: str) -> set:
            t = (t or "").lower()
            return {t[i:i + 3] for i in range(len(t) - 2)} if len(t) >= 3 else {t}

        kept, kept_sh = [], []
        for r in rows:
            sh = shingles(r[self.text_col])
            dup = any(
                (len(sh & s) / len(sh | s) if (sh | s) else 1.0) >= jaccard_threshold
                for s in kept_sh
            )
            if not dup:
                kept.append(r)
                kept_sh.append(sh)
        return self.spark.createDataFrame(kept, out.schema)

    def _select(self, stmt: ast.SelectStmt, params: dict) -> DataFrame:
        from needle_spark.functions.timedecay import apply_time_decay
        from needle_spark.operators.hybrid import bm25_topk, rrf_fuse
        from needle_spark.operators.knn import knn

        df = self._resolve(stmt.collection, params)
        # TTL applies to EVERY read path, not only kNN (ttl.rs lazy
        # strategy); catalog collections already self-filter, registry
        # tables honor the injected now
        if "now" in params:
            from needle_spark.filters import ttl_filter
            df = ttl_filter(df, int(params["now"]))
        similar, match, residue = self._split_where(stmt.where)
        pred = self._compile_pred(residue, df, params) \
            if residue is not None else None
        limit = stmt.limit if stmt.limit is not None else DEFAULT_LIMIT

        if stmt.as_of is not None:
            ts = self._value(stmt.as_of, params)
            if isinstance(ts, str):
                ts = parse_duration(ts) if _DURATION_RE.match(ts) else int(ts)
            df = df.filter(F.col(self.inserted_at_col) <= F.lit(int(ts)))

        # USING RAG options (ast.rs:76-92): top_k default, fusion alpha,
        # result dedup
        rag = stmt.using_rag
        if rag is not None and rag.top_k is not None and stmt.limit is None:
            limit = rag.top_k

        # hybrid-score ORDER BY picks the fusion weights
        alpha = 0.5
        if rag is not None and rag.hybrid_alpha is not None:
            alpha = rag.hybrid_alpha
        for key in stmt.order_by:
            if isinstance(key.expr, ast.FuncCall) and key.expr.name == "hybrid_score":
                if len(key.expr.args) >= 3:
                    alpha = float(key.expr.args[2])

        # ORDER BY time_decay(distance, ts_col, '7d') — the docs/needleql.md
        # form; sugar for WITH TIME_DECAY with an exponential half-life read
        # from the duration argument, decaying on the named timestamp column
        decay = stmt.with_time_decay
        decay_ts = self.inserted_at_col
        for key in stmt.order_by:
            if isinstance(key.expr, ast.FuncCall) and key.expr.name == "time_decay":
                args = key.expr.args
                if len(args) != 3:
                    raise ExecError(
                        "time_decay(distance, ts_column, duration) takes 3 args")
                if decay is None:
                    dur = args[2]
                    decay = ast.TimeDecaySpec(
                        function="exponential",
                        params={"half_life_seconds": (
                            parse_duration(dur) if isinstance(dur, str) else int(dur))},
                    )
                    decay_ts = str(args[1])

        if similar is not None and match is not None:
            qv = self._bind_vector(similar.param, params)
            base = df.filter(pred) if pred is not None else df
            k_out = limit + (stmt.offset or 0)
            # size per-side candidate pools off limit+OFFSET: a deep
            # page fused from 50 candidates would come back empty
            fetch = max(k_out * 5, 50)
            post = (stmt.rerank is not None or decay is not None
                    or (rag is not None and rag.deduplicate))
            # post-fusion stages re-sort, so pool extra fused candidates
            pool = max(k_out * 3, k_out) if post else k_out
            vec = knn(base, qv, k=fetch, metric=self.metric,
                      vector_col=self.vector_col, id_col=self.id_col
                      ).select(self.id_col, "distance")
            bm = bm25_topk(base, match.query, limit=fetch,
                           id_col=self.id_col, text_col=match.column or self.text_col)
            out = rrf_fuse(vec, bm, id_col=self.id_col, limit=pool,
                           vector_weight=alpha, bm25_weight=1.0 - alpha)
            # restore columns that fusion projected away: post stages need
            # the payload (text / vector / inserted_at), and the SELECT
            # list may name payload columns or the vector-side `distance`
            # (docs/needleql.md hybrid examples select id,title,distance)
            need = list(stmt.columns) if stmt.columns else list(df.columns)
            if post:
                need = list(dict.fromkeys(need + list(df.columns)))
            if "distance" in need and "distance" not in out.columns:
                out = out.join(vec, self.id_col, "left")
            extra = [c for c in df.columns if c in need and c not in out.columns]
            if extra:
                out = out.join(df.select(self.id_col, *extra), self.id_col, "left")
            if not post:
                # the joins dropped fusion's ordering guarantee
                out = out.orderBy(
                    F.col("score").desc(), F.col(self.id_col).asc()).limit(k_out)
            if post:
                if rag is not None and rag.deduplicate:
                    out = self._dedup_candidates(out, "score", ascending=False)
                if decay is not None:
                    # scale the fused score by the decay factor (the
                    # hybrid analog of dividing distance: fresher wins)
                    from needle_spark.functions.timedecay import (
                        age_expr, decay_factor_expr,
                    )
                    p = {k: (parse_duration(v) if isinstance(v, str) else v)
                         for k, v in decay.params.items()}
                    now = int(params.get("now", p.pop("now", 0)))
                    factor = decay_factor_expr(
                        decay.function, age_expr(now, decay_ts), **p)
                    out = out.withColumn("score", F.col("score") * factor)
                if stmt.rerank is not None:
                    out = out.withColumn("__negscore", -F.col("score"))
                    if stmt.rerank.mode == "mmr":
                        from needle_spark.operators.rerank import mmr_diversify
                        picked = mmr_diversify(
                            out, qv, k=k_out, lambda_mult=stmt.rerank.mmr_lambda,
                            vector_col=self.vector_col, id_col=self.id_col,
                            distance_col="__negscore",
                        )
                        out = self._mmr_frame(
                            picked,
                            out.select(self.id_col, self.vector_col,
                                       "__negscore"),
                            df, stmt)
                        out = out.withColumn("score", -F.col("__negscore"))
                    else:
                        from needle_spark.operators.hybrid import rerank_by_field
                        out = rerank_by_field(
                            out, stmt.rerank.field, k=k_out, fetch_k=pool,
                            descending=stmt.rerank.descending,
                            id_col=self.id_col, distance_col="__negscore")
                    out = out.drop("__negscore")
                else:
                    out = out.orderBy(
                        F.col("score").desc(), F.col(self.id_col).asc()
                    ).limit(k_out)
            out = self._apply_plain_order(out, stmt)
            return self._project(out, stmt, offset=stmt.offset, limit=limit)

        if similar is not None:
            qv = self._bind_vector(similar.param, params)
            k_page = limit + (stmt.offset or 0)
            fetch = k_page
            if decay:
                fetch = k_page * 3      # decay re-sorts: oversample (pipeline.rs:467-481)
            if stmt.rerank is not None:
                # rerank pools fetch_k candidates; sizing off limit+offset
                # (not limit) keeps pages of the same result set consistent
                fetch = max(fetch, k_page * 3)
            out = knn(df, qv, k=fetch, metric=self.metric, filter=pred,
                      vector_col=self.vector_col, id_col=self.id_col)
            if rag is not None and rag.deduplicate:
                out = self._dedup_candidates(out, "distance", ascending=True)
            if decay:
                p = {k: (parse_duration(v) if isinstance(v, str) else v)
                     for k, v in decay.params.items()}
                now = int(params.get("now", p.pop("now", 0)))
                out = apply_time_decay(
                    out, decay.function, now=now, k=limit + (stmt.offset or 0),
                    inserted_at_col=decay_ts, id_col=self.id_col, **p)
            if stmt.rerank is not None:
                if stmt.rerank.mode == "mmr":
                    # sequential greedy over the candidate set; rebuild a
                    # DataFrame from the picked rows (small by definition)
                    from needle_spark.operators.rerank import mmr_diversify

                    picked = mmr_diversify(
                        out, qv, k=k_page, lambda_mult=stmt.rerank.mmr_lambda,
                        vector_col=self.vector_col, id_col=self.id_col,
                    )
                    out = self._mmr_frame(
                        picked,
                        out.select(self.id_col, self.vector_col, "distance"),
                        df, stmt)
                else:
                    from needle_spark.operators.hybrid import rerank_by_field
                    out = rerank_by_field(out, stmt.rerank.field, k=k_page,
                                          fetch_k=fetch, descending=stmt.rerank.descending,
                                          id_col=self.id_col)
            out = self._apply_plain_order(out, stmt)
            return self._project(out, stmt, offset=stmt.offset, limit=limit)

        if match is not None:
            base = df.filter(pred) if pred is not None else df
            out = bm25_topk(base, match.query, limit=limit + (stmt.offset or 0),
                            id_col=self.id_col, text_col=match.column or self.text_col)
            out = self._apply_plain_order(out, stmt)
            return self._project(out, stmt, offset=stmt.offset, limit=limit)

        # pure relational scan
        out = df.filter(pred) if pred is not None else df
        if stmt.order_by:
            keys = []
            for k in stmt.order_by:
                if isinstance(k.expr, str):
                    keys.append(F.col(k.expr).desc() if k.desc else F.col(k.expr).asc())
                else:
                    raise ExecError("function ORDER BY requires a search clause")
            out = out.orderBy(*keys)
        if stmt.limit is not None or stmt.offset:
            out = out.orderBy(*[F.col(c) for c in [self.id_col] if c in out.columns]) \
                if not stmt.order_by else out
            if stmt.offset:
                out = out.offset(stmt.offset)
            if stmt.limit is not None:
                # OFFSET alone must not silently truncate to the
                # default search k — a relational scan has no k
                out = out.limit(limit)
        return self._project(out, stmt)

    def _apply_plain_order(self, out: DataFrame,
                           stmt: ast.SelectStmt) -> DataFrame:
        """Plain-COLUMN ORDER BY re-sorts the candidate page on every
        search branch (silently ignoring it returns wrongly-ordered
        results); function keys (hybrid_score/time_decay) were already
        consumed as fusion/decay configuration."""
        plain = [k for k in stmt.order_by if isinstance(k.expr, str)]
        if plain:
            # ALWAYS re-sort (review r6): guessing which keys match a
            # branch's natural emit order is branch-dependent (knn pages
            # arrive distance ASC, hybrid/BM25 score DESC, and hybrid
            # carries BOTH columns), and a wrong guess silently returns
            # mis-ordered rows or — worse — swallows the missing-column
            # error for a typo'd sort key.  The page is <= k rows; the
            # orderBy is free next to the search, and the id tie-break
            # makes the order deterministic.
            missing = [k.expr for k in plain if k.expr not in out.columns]
            if missing:
                raise ExecError(f"ORDER BY column(s) not in result: "
                                f"{missing}")
            out = out.orderBy(
                *[F.col(k.expr).desc() if k.desc else F.col(k.expr).asc()
                  for k in plain],
                F.col(self.id_col).asc())
        return out

    def _project(self, out: DataFrame, stmt: ast.SelectStmt,
                 offset: int | None = None, limit: int | None = None) -> DataFrame:
        if offset:
            out = out.offset(offset)
            if limit is not None:
                out = out.limit(limit)
        if stmt.columns:
            cols = [c for c in stmt.columns if c in out.columns]
            if cols:
                out = out.select(*cols)
        return out

    # -------------------------------------------------------- EXPLAIN --
    def explain(self, stmt: ast.SelectStmt, params: dict) -> str:
        from needle_spark.plans.planner import (
            CollectionStats, choose_strategy, explain_text,
        )

        df = self._resolve(stmt.collection)
        similar, match, residue = self._split_where(stmt.where)
        flt_doc = None  # selectivity heuristics need the residue shape
        strategy = choose_strategy(
            CollectionStats(num_vectors=df.count(), dims=0),
            flt=flt_doc, has_text_query=match is not None,
        )
        steps = []
        if similar is not None:
            steps.append(f"VectorSearch(k={stmt.limit or DEFAULT_LIMIT}, metric={self.metric})")
        if match is not None:
            steps.append(f"TextSearch(query={match.query!r})")
        if similar is not None and match is not None:
            steps.append("HybridFusion(rrf)")
        if residue is not None:
            steps.append("MetadataFilter")
        if stmt.as_of is not None:
            steps.append("TimeTravelScan")
        if stmt.with_time_decay is not None:
            steps.append(f"TimeDecay({stmt.with_time_decay.function})")
        if stmt.rerank is not None:
            steps.append(f"Rerank(by={stmt.rerank.field})")
        steps.append(f"Sort+Limit({stmt.limit or DEFAULT_LIMIT})")
        lines = [f"strategy: {strategy}", "plan:"]
        lines += [f"  {i+1}. {s}" for i, s in enumerate(steps)]
        if stmt.analyze:
            plan_df = self._select(
                ast.SelectStmt(
                    columns=stmt.columns, collection=stmt.collection,
                    where=stmt.where, order_by=stmt.order_by,
                    limit=stmt.limit, offset=stmt.offset,
                    as_of=stmt.as_of, with_time_decay=stmt.with_time_decay,
                    rerank=stmt.rerank,
                ),
                params,
            )
            lines += ["", "physical plan:", explain_text(plan_df)]
        return "\n".join(lines)

    # ----------------------------------------------------- INSERT/DEL --
    def _insert(self, stmt: ast.InsertStmt, params: dict):
        if self.database is None:
            raise ExecError("no database attached")
        coll = self.database.collection(stmt.collection)
        row: dict[str, Any] = {}
        for c, v in zip(stmt.columns, stmt.values):
            if isinstance(v, ast.FuncCall) and v.name == "$param":
                v = params[v.args[0]]
            if c == "metadata" and isinstance(v, str):
                import json

                for mk, mv in json.loads(v).items():
                    row[mk] = mv
            else:
                row[c] = v
        schema_cols = coll.df().columns
        data = {c: row.get(c) for c in schema_cols}
        if coll.vector_col in data and data[coll.vector_col] is not None:
            data[coll.vector_col] = [float(x) for x in data[coll.vector_col]]
        rows = self.spark.createDataFrame([tuple(data[c] for c in schema_cols)],
                                          coll.df().schema)
        coll.insert(rows)
        return {"inserted": 1}

    def _delete(self, stmt: ast.DeleteStmt, params: dict):
        if self.database is None:
            raise ExecError("no database attached")
        coll = self.database.collection(stmt.collection)
        pred = self._compile_pred(stmt.where, coll.df())
        n = coll.delete(pred=pred)
        return {"deleted": n}

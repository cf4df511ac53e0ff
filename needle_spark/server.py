"""Embedded REST serving shim over Database/Collection.

The reference's most-used surface is its HTTP server (~90 axum routes,
/root/reference/src/server/mod.rs:462-568; request/response bodies in
src/server/types.rs).  This module maps its CORE routes — collection
CRUD, vector CRUD, search/query/count/recommend, CDC change feed,
snapshots, aliases — onto the engine, using only the standard library
(this container has no web framework, and the engine must not grow a
hard dependency for an optional shim).

Scope note (SURVEY §2.1 declares the full service layer out of scope):
this is a thin adapter — every handler is a direct call into the same
`Database`/`Collection`/operator APIs the tests already cover; no
business logic lives here.  Payload shapes follow server/types.rs
(InsertRequest :144, BatchInsertRequest :156, SearchRequest :194,
SearchResponse :231, SearchResultResponse :244, score mapping
integrations/framework_common.rs:103-109).

Serving posture: one Spark driver hosts the HTTP thread pool; each
request runs Spark jobs on the shared session (Spark's scheduler is
thread-safe; FAIR scheduling can be enabled via get_spark extra_conf).
Mutations on the same collection serialize behind a lock — the catalog
commit protocol is atomic on disk but not concurrent within one
process.  Single-query latency is job-bound (~300 ms local); batch
endpoints and the pinned-segment serving paths are the throughput
routes, as documented in PLANS.md.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable

from pyspark.sql import functions as F

from needle_spark.catalog import Collection, CollectionError, Database
from needle_spark.filters import compile_filter

DEFAULT_K = 10  # server/types.rs:222 default_k

META_SCHEMA = "id string, vector array<float>, metadata string"


def distance_to_score(distance: float, metric: str) -> float:
    """framework_common.rs:103-109."""
    m = metric.lower()
    if m in ("cosine", "cosine_normalized"):
        return 1.0 - distance
    if m in ("dot", "dotproduct", "dot_product"):
        return (distance + 1.0) / 2.0
    return 1.0 / (1.0 + distance)


class ApiError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status
        self.message = message


def _bad(msg: str) -> ApiError:
    return ApiError(400, msg)


def _not_found(msg: str) -> ApiError:
    return ApiError(404, msg)


class RestServer:
    """needle-compatible REST facade; start()/stop() manage a daemon
    thread, `url` is the base address (port 0 = ephemeral)."""

    def __init__(self, database: Database, host: str = "127.0.0.1",
                 port: int = 0):
        self.db = database
        self._mutate = threading.Lock()
        self._routes: list[tuple[str, re.Pattern, Callable]] = []
        self._register_routes()
        handler = self._make_handler()
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._httpd.daemon_threads = True
        self._thread: threading.Thread | None = None

    # -- lifecycle --

    @property
    def url(self) -> str:
        h, p = self._httpd.server_address[:2]
        return f"http://{h}:{p}"

    def start(self) -> "RestServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    # -- routing --

    def _register_routes(self) -> None:
        r = self._route
        # server/mod.rs:462-469 collection CRUD
        r("GET", r"/health$", lambda m, b, q: {"status": "ok"})
        r("GET", r"/collections$", self.list_collections)
        r("POST", r"/collections$", self.create_collection)
        r("GET", r"/collections/([^/]+)$", self.get_collection)
        r("DELETE", r"/collections/([^/]+)$", self.delete_collection)
        r("POST", r"/collections/([^/]+)/rename$", self.rename_collection)
        r("POST", r"/collections/([^/]+)/compact$", self.compact_collection)
        r("POST", r"/collections/([^/]+)/clear$", self.clear_collection)
        # :471-478 vector CRUD
        r("POST", r"/collections/([^/]+)/vectors$", self.insert_vector)
        r("POST", r"/collections/([^/]+)/vectors/batch$", self.batch_insert)
        r("POST", r"/collections/([^/]+)/vectors/delete-batch$",
          self.batch_delete)
        r("POST", r"/collections/([^/]+)/vectors/upsert$", self.upsert_vector)
        r("DELETE", r"/collections/([^/]+)/vectors/filter$",
          self.delete_by_filter)  # :545
        r("GET", r"/collections/([^/]+)/vectors/([^/]+)$", self.get_vector)
        r("DELETE", r"/collections/([^/]+)/vectors/([^/]+)$",
          self.delete_vector)
        # :486-488 search; :520-526 query/count/recommend
        r("POST", r"/collections/([^/]+)/search$", self.search)
        r("POST", r"/collections/([^/]+)/search/batch$", self.batch_search)
        r("POST", r"/collections/([^/]+)/search/radius$", self.radius)
        r("POST", r"/collections/([^/]+)/query$", self.metadata_query)
        r("POST", r"/collections/([^/]+)/count$", self.filtered_count)
        r("POST", r"/collections/([^/]+)/recommend$", self.recommend)
        # :510 change feed
        r("GET", r"/collections/([^/]+)/changes$", self.changes)
        # :561-563 snapshots
        r("GET", r"/collections/([^/]+)/snapshots$", self.list_snapshots)
        r("POST", r"/collections/([^/]+)/snapshots$", self.create_snapshot)
        r("POST", r"/collections/([^/]+)/snapshots/([^/]+)/restore$",
          self.restore_snapshot)
        # :548-552 aliases
        r("GET", r"/aliases$", self.list_aliases)
        r("POST", r"/aliases$", self.create_alias)
        r("DELETE", r"/aliases/([^/]+)$", self.delete_alias)

    def _route(self, method: str, pattern: str, fn: Callable) -> None:
        self._routes.append((method, re.compile(pattern), fn))

    def dispatch(self, method: str, path: str, body: dict | None,
                 query: dict) -> tuple[int, dict]:
        for m, pat, fn in self._routes:
            if m != method:
                continue
            match = pat.match(path)
            if match:
                try:
                    out = fn(match, body or {}, query)
                    return (201 if method == "POST"
                            and fn in (self.create_collection,
                                       self.insert_vector,
                                       self.batch_insert,
                                       self.upsert_vector) else 200,
                            out)
                except ApiError as e:
                    return e.status, {"error": e.message}
                except CollectionError as e:
                    msg = str(e)
                    status = 404 if "no such collection" in msg else 400
                    return status, {"error": msg}
                except (ValueError, KeyError, TypeError) as e:
                    return 400, {"error": str(e)}
        return 404, {"error": f"no route: {method} {path}"}

    # -- helpers --

    def _coll(self, name: str) -> Collection:
        return self.db.collection(name)

    def _rows_df(self, coll: Collection, vectors: list[dict]):
        rows = []
        for v in vectors:
            if "id" not in v or "vector" not in v:
                raise _bad("each vector needs 'id' and 'vector'")
            meta = v.get("metadata")
            rows.append((
                str(v["id"]),
                [float(x) for x in v["vector"]],
                None if meta is None else json.dumps(meta, sort_keys=True),
            ))
        return self.db.spark.createDataFrame(rows, META_SCHEMA)

    @staticmethod
    def _result_row(r, metric: str, include_vectors: bool) -> dict:
        d = float(r["distance"])
        out = {"id": r["id"], "distance": d,
               "score": distance_to_score(d, metric)}
        meta = r["metadata"] if "metadata" in r.__fields__ else None
        if meta is not None:
            out["metadata"] = json.loads(meta)
        if include_vectors:
            out["vector"] = list(r["vector"])
        return out

    # -- collection handlers --

    def list_collections(self, m, b, q) -> dict:
        return {"collections": self.db.list_collections()}

    def create_collection(self, m, b, q) -> dict:
        name = b.get("name")
        dims = b.get("dimensions")
        if not name or not isinstance(dims, int) or dims <= 0:
            raise _bad("'name' and positive integer 'dimensions' required")
        metric = b.get("distance", "cosine")
        with self._mutate:
            self.db.create_collection(
                name, dims=dims, metric=metric, schema=META_SCHEMA,
                default_ttl_seconds=b.get("default_ttl_seconds"))
        return {"name": name, "dimensions": dims, "distance": metric}

    def get_collection(self, m, b, q) -> dict:
        c = self._coll(m.group(1))
        return {"name": m.group(1), "dimensions": c.dims,
                "count": c.count()}

    def delete_collection(self, m, b, q) -> dict:
        with self._mutate:
            self.db.drop_collection(m.group(1))
        return {"deleted": m.group(1)}

    def rename_collection(self, m, b, q) -> dict:
        new = b.get("new_name")
        if not new:
            raise _bad("'new_name' required")
        with self._mutate:
            self.db.rename_collection(m.group(1), new)
        return {"name": new}

    def compact_collection(self, m, b, q) -> dict:
        with self._mutate:
            self._coll(m.group(1)).compact()
        return {"compacted": m.group(1)}

    def clear_collection(self, m, b, q) -> dict:
        with self._mutate:
            self._coll(m.group(1)).clear()
        return {"cleared": m.group(1)}

    # -- vector handlers --

    def insert_vector(self, m, b, q) -> dict:
        c = self._coll(m.group(1))
        with self._mutate:
            n = c.insert(self._rows_df(c, [b]))
        return {"inserted": n, "id": str(b.get("id"))}

    def batch_insert(self, m, b, q) -> dict:
        c = self._coll(m.group(1))
        vectors = b.get("vectors")
        if not isinstance(vectors, list) or not vectors:
            raise _bad("'vectors' must be a non-empty list")
        with self._mutate:
            n = c.insert(self._rows_df(c, vectors))
        return {"inserted": n}

    def upsert_vector(self, m, b, q) -> dict:
        c = self._coll(m.group(1))
        with self._mutate:
            n = c.upsert(self._rows_df(c, [b]))
        return {"upserted": n, "id": str(b.get("id"))}

    def batch_delete(self, m, b, q) -> dict:
        ids = b.get("ids")
        if not isinstance(ids, list) or not ids:
            raise _bad("'ids' must be a non-empty list")
        with self._mutate:
            n = self._coll(m.group(1)).delete(ids=[str(i) for i in ids])
        return {"deleted": n}

    def delete_by_filter(self, m, b, q) -> dict:
        flt = b.get("filter")
        if not isinstance(flt, dict) or not flt:
            raise _bad("'filter' must be a non-empty object")
        c = self._coll(m.group(1))
        pred = compile_filter(flt, df=c.df(), meta_col="metadata")
        with self._mutate:
            n = c.delete(pred=F.coalesce(pred, F.lit(False)))
        return {"deleted": n}

    def get_vector(self, m, b, q) -> dict:
        c = self._coll(m.group(1))
        row = c.get(m.group(2))
        if row is None:
            raise _not_found(f"no vector {m.group(2)!r}")
        out = {"id": row["id"], "vector": list(row["vector"])}
        meta = row["metadata"] if "metadata" in row.__fields__ else None
        if meta is not None:
            out["metadata"] = json.loads(meta)
        return out

    def delete_vector(self, m, b, q) -> dict:
        with self._mutate:
            n = self._coll(m.group(1)).delete(ids=[m.group(2)])
        if n == 0:
            raise _not_found(f"no vector {m.group(2)!r}")
        return {"deleted": n}

    # -- search handlers --

    def _search_args(self, b: dict, c: Collection):
        vec = b.get("vector")
        if not isinstance(vec, list) or not vec:
            raise _bad("'vector' must be a non-empty list")
        metric = (b.get("distance") or c.metric).lower()
        return ([float(x) for x in vec], int(b.get("k", DEFAULT_K)), metric)

    def search(self, m, b, q) -> dict:
        from needle_spark.operators.knn import knn, knn_after

        c = self._coll(m.group(1))
        vec, k, metric = self._search_args(b, c)
        cursor = b.get("search_after")
        common = dict(metric=metric, filter=b.get("filter"),
                      meta_col="metadata", id_col=c.id_col,
                      vector_col=c.vector_col)
        if cursor is not None:
            res = knn_after(c.df(), vec,
                            (float(cursor["distance"]), str(cursor["id"])),
                            k=k, **common)
        else:
            res = knn(c.df(), vec, k=k,
                      post_filter=b.get("post_filter"),
                      post_filter_factor=int(b.get("post_filter_factor", 3)),
                      **common)
        rows = res.collect()
        include = bool(b.get("include_vectors"))
        results = [self._result_row(r, metric, include) for r in rows]
        out: dict[str, Any] = {"results": results,
                               "has_more": len(rows) == k}
        if rows and len(rows) == k:
            out["next_cursor"] = {"distance": results[-1]["distance"],
                                  "id": results[-1]["id"]}
        return out

    def batch_search(self, m, b, q) -> dict:
        from needle_spark.operators.knn import batch_knn

        c = self._coll(m.group(1))
        queries = b.get("queries")
        if not isinstance(queries, list) or not queries:
            raise _bad("'queries' must be a non-empty list of vectors")
        k = int(b.get("k", DEFAULT_K))
        metric = (b.get("distance") or c.metric).lower()
        qdf = self.db.spark.createDataFrame(
            [(i, [float(x) for x in qv]) for i, qv in enumerate(queries)],
            "query_id int, vector array<float>")
        res = batch_knn(c.df(), qdf, k=k, metric=metric,
                        doc_id_col=c.id_col, doc_vector_col=c.vector_col)
        by_q: dict[int, list] = {i: [] for i in range(len(queries))}
        for r in res.collect():
            d = float(r["distance"])
            by_q[int(r["query_id"])].append(
                {"id": r[c.id_col], "distance": d,
                 "score": distance_to_score(d, metric)})
        return {"results": [sorted(by_q[i], key=lambda x: x["distance"])
                            for i in range(len(queries))]}

    def radius(self, m, b, q) -> dict:
        from needle_spark.operators.knn import radius_search

        c = self._coll(m.group(1))
        vec, _, metric = self._search_args(b, c)
        radius = b.get("radius")
        if radius is None:
            raise _bad("'radius' required")
        res = radius_search(c.df(), vec, float(radius), metric=metric,
                            limit=int(b.get("limit", 100)),
                            filter=b.get("filter"), meta_col="metadata",
                            id_col=c.id_col, vector_col=c.vector_col)
        include = bool(b.get("include_vectors"))
        return {"results": [self._result_row(r, metric, include)
                            for r in res.collect()]}

    def metadata_query(self, m, b, q) -> dict:
        c = self._coll(m.group(1))
        df = c.df()
        flt = b.get("filter")
        if flt:
            df = df.filter(F.coalesce(
                compile_filter(flt, df=df, meta_col="metadata"),
                F.lit(False)))
        limit = int(b.get("limit", 100))
        rows = df.orderBy(c.id_col).limit(limit).collect()
        out = []
        for r in rows:
            rec: dict[str, Any] = {"id": r[c.id_col]}
            meta = r["metadata"] if "metadata" in r.__fields__ else None
            if meta is not None:
                rec["metadata"] = json.loads(meta)
            if b.get("include_vectors"):
                rec["vector"] = list(r[c.vector_col])
            out.append(rec)
        return {"results": out}

    def filtered_count(self, m, b, q) -> dict:
        c = self._coll(m.group(1))
        df = c.df()
        flt = b.get("filter")
        if flt:
            df = df.filter(F.coalesce(
                compile_filter(flt, df=df, meta_col="metadata"),
                F.lit(False)))
        return {"count": df.count()}

    def recommend(self, m, b, q) -> dict:
        from needle_spark.operators.knn import recommend

        c = self._coll(m.group(1))
        pos = b.get("positive") or b.get("positive_ids")
        if not isinstance(pos, list) or not pos:
            raise _bad("'positive' must be a non-empty id list")
        metric = (b.get("distance") or c.metric).lower()
        res = recommend(c.df(), [str(i) for i in pos],
                        negative_ids=[str(i) for i in
                                      (b.get("negative") or [])],
                        k=int(b.get("k", DEFAULT_K)), metric=metric,
                        id_col=c.id_col, vector_col=c.vector_col)
        return {"results": [self._result_row(r, metric, False)
                            for r in res.collect()]}

    # -- changes / snapshots / aliases --

    def changes(self, m, b, q) -> dict:
        c = self._coll(m.group(1))
        since = int(q.get("since", -1))
        limit = min(int(q.get("limit", 1000)), 10_000)
        rows = (c.cdc_events()
                .filter(F.col("sequence") > since)
                .orderBy("sequence").limit(limit).collect())
        return {"changes": [
            {"sequence": int(r["sequence"]),
             "timestamp_ms": int(r["timestamp_ms"]),
             "event_type": r["event_type"],
             "vector_id": r["vector_id"],
             "metadata": (json.loads(r["metadata"])
                          if r["metadata"] else None)}
            for r in rows
        ], "next_since": int(rows[-1]["sequence"]) if rows else since}

    def list_snapshots(self, m, b, q) -> dict:
        return {"snapshots": self._coll(m.group(1)).list_snapshots()}

    def create_snapshot(self, m, b, q) -> dict:
        name = b.get("name")
        if not name:
            raise _bad("'name' required")
        with self._mutate:
            v = self._coll(m.group(1)).create_snapshot(name)
        return {"name": name, "version": v}

    def restore_snapshot(self, m, b, q) -> dict:
        with self._mutate:
            self._coll(m.group(1)).restore_snapshot(m.group(2))
        return {"restored": m.group(2)}

    def list_aliases(self, m, b, q) -> dict:
        return {"aliases": self.db._aliases()}

    def create_alias(self, m, b, q) -> dict:
        alias, target = b.get("alias"), b.get("target")
        if not alias or not target:
            raise _bad("'alias' and 'target' required")
        self.db.create_alias(alias, target)
        return {"alias": alias, "target": target}

    def delete_alias(self, m, b, q) -> dict:
        self.db.drop_alias(m.group(1))
        return {"deleted": m.group(1)}

    # -- http plumbing --

    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet by default
                pass

            def _respond(self, status: int, payload: dict) -> None:
                data = json.dumps(payload).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _handle(self, method: str) -> None:
                path, _, qs = self.path.partition("?")
                query = {}
                for part in qs.split("&"):
                    if "=" in part:
                        k, v = part.split("=", 1)
                        query[k] = v
                body = None
                length = int(self.headers.get("Content-Length") or 0)
                if length:
                    try:
                        body = json.loads(self.rfile.read(length))
                    except json.JSONDecodeError:
                        self._respond(400, {"error": "invalid JSON body"})
                        return
                try:
                    status, payload = server.dispatch(
                        method, path, body, query)
                except Exception as e:  # handler bug -> 500, not a hang
                    status, payload = 500, {"error": str(e)}
                self._respond(status, payload)

            def do_GET(self):
                self._handle("GET")

            def do_POST(self):
                self._handle("POST")

            def do_DELETE(self):
                self._handle("DELETE")

            def do_PUT(self):
                self._handle("PUT")

        return Handler

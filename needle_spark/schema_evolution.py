"""Schema evolution & migration for collections (reference:
/root/reference/src/persistence/schema_evolution.rs — CollectionSchema
/ MetadataFieldDef :65-97, SchemaChange :105-135, DimensionStrategy
:138-158, SchemaRegistry.apply_change :194-287, MigrationEngine
:384-530, adapt_dimensions :556-625, adapt_metadata / dual-read
:627-680, recall validation :682-780).

Spark-first mapping: schema versions are manifest metadata (zero data
touched on evolve); READS adapt lazily — `adapted_df()` projects any
segment written under an older schema through pure scan expressions
(missing fields filled with defaults, removed fields dropped, types
widened by cast, vector dims re-shaped per strategy).  `migrate()` is
the eager path: one job rewrites the collection through the same
expressions into a single new segment (the compact() shape), so old
and new schema data never coexist afterwards.  Every adaptation is
map-only — no shuffle, no UDF — which is the 100 TB shape: evolving a
schema costs nothing until rows are read, and an eager migration is
one linear scan.

Dimension strategies: zero_pad / truncate are array expressions;
random_project reuses the seeded counter-hash JL projection from
operators/dimreduce.py (reproducible on any engine); pca_project takes
an explicit (target x source) matrix, e.g. from PCA.fit.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from needle_spark.catalog import Collection, CollectionError
from needle_spark.operators.dimreduce import RandomProjection, _dot_expr

# widenings that never lose information (int widths, int->float64,
# float32->float64); anything else is an incompatible change
_WIDENINGS = {
    ("int", "bigint"), ("smallint", "int"), ("smallint", "bigint"),
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("int", "double"), ("bigint", "double"), ("float", "double"),
    ("array<int>", "array<bigint>"), ("array<float>", "array<double>"),
}

DIM_STRATEGIES = ("zero_pad", "truncate", "random_project", "pca_project")


def _now_ms() -> int:
    return int(time.time() * 1000)


def _project_local(vec: list[float], dim_change: dict) -> list[float]:
    """Driver-side twin of SchemaRegistry._dim_expr for a single vector
    (same math, float32-cast components like the scan expression)."""
    import numpy as np

    to, strategy = dim_change["to"], dim_change["strategy"]
    if strategy == "zero_pad":
        out = list(vec[:to]) + [0.0] * max(0, to - len(vec))
        return [float(np.float32(x)) for x in out]
    if strategy == "truncate":
        return [float(np.float32(x)) for x in vec[:to]]
    if strategy == "random_project":
        rows = RandomProjection(dim_change["from"], to,
                                seed=dim_change["seed"]).matrix()
    else:
        rows = dim_change["matrix"]
    return [float(np.float32(sum(float(a) * float(b)
                                 for a, b in zip(vec, r)))) for r in rows]


@dataclass
class MigrationReport:
    """MigrationPhase::Complete accounting (schema_evolution.rs:368)."""

    from_version: int
    to_version: int
    total_migrated: int
    duration_ms: int


class SchemaRegistry:
    """Versioned schema history for one collection, persisted in its
    manifest under "schema_evolution" (schema_evolution.rs:161-325).

    Version 1 is derived from the collection's declared Spark schema:
    every non-id, non-vector column becomes a metadata field.  Each
    apply_change() appends a new immutable schema version; data written
    under ANY version stays readable through adapted_df().
    """

    def __init__(self, coll: Collection):
        self.coll = coll
        if "schema_evolution" not in coll._manifest:
            # lock + refresh like every manifest writer: persisting the
            # instance's stale copy would roll back concurrent commits
            with coll._commit_lock():
                coll._manifest = coll._read_manifest()
                if "schema_evolution" not in coll._manifest:
                    self._seed_initial_state()

    def _seed_initial_state(self) -> None:
        """Write version 1 derived from the declared schema; caller
        holds the commit lock with a fresh manifest."""
        coll = self.coll
        fields = {
            name: {
                "dtype": dtype, "required": False, "default": None,
                "added_in": 1, "removed_in": None,
            }
            for name, dtype in self._declared_fields().items()
        }
        coll._manifest["schema_evolution"] = {
            "current": 1,
            "versions": [{
                "version": 1,
                "dims": coll.dims,
                "metric": coll._manifest["metric"],
                "fields": fields,
                "dim_change": None,
                "created_ms": _now_ms(),
                "description": "Initial schema",
                "parent_version": None,
            }],
        }
        coll._write_manifest_static(coll.path, coll._manifest)

    def _declared_fields(self) -> dict[str, str]:
        sch = self.coll.spark.createDataFrame([], self.coll._manifest["schema"])
        return {
            n: t for n, t in sch.dtypes
            if n not in (self.coll.id_col, self.coll.vector_col)
        }

    # ------------------------------------------------------- queries --
    def _state(self) -> dict:
        return self.coll._manifest["schema_evolution"]

    @property
    def current_version(self) -> int:
        return self._state()["current"]

    def current_schema(self) -> dict:
        return self.schema_at(self.current_version)

    def schema_at(self, version: int) -> dict:
        for s in self._state()["versions"]:
            if s["version"] == version:
                return s
        raise CollectionError(f"unknown schema version {version}")

    def version_history(self) -> list[int]:
        return [s["version"] for s in self._state()["versions"]]

    def active_fields(self) -> dict[str, dict]:
        return {
            n: f for n, f in self.current_schema()["fields"].items()
            if f["removed_in"] is None
        }

    # -------------------------------------------------- apply_change --
    def apply_change(self, change: dict) -> int:
        """Apply one schema change, creating a new version
        (schema_evolution.rs:194-287).  `change` kinds:

        {"kind": "add_field", "name", "dtype", "default"?, "required"?}
        {"kind": "remove_field", "name"}
        {"kind": "widen_field", "name", "to_dtype"}
        {"kind": "require_field", "name"}   (field must have a default)
        {"kind": "change_dimension", "to", "strategy", "seed"?, "matrix"?}
        {"kind": "change_distance", "to"}

        Incompatible changes raise before anything is persisted.
        """
        # whole read-modify-write under the commit lock: version
        # numbering and the persisted manifest must derive from the
        # on-disk state, not this instance's possibly-stale copy
        with self.coll._commit_lock():
            self.coll._manifest = self.coll._read_manifest()
            return self._apply_change_locked(change)

    def _apply_change_locked(self, change: dict) -> int:
        cur = self.current_schema()
        new = {
            "version": cur["version"] + 1,
            "dims": cur["dims"],
            "metric": cur["metric"],
            "fields": {n: dict(f) for n, f in cur["fields"].items()},
            # a pending dim_change is a LAZY-ADAPTATION marker, not
            # history: it must survive unrelated schema changes or
            # reads silently stop reshaping old segments (and migrate()
            # would rewrite un-adapted vectors under the new dims)
            "dim_change": dict(cur["dim_change"]) if cur["dim_change"] else None,
            # carried with the marker: reads of pre-migration manifest
            # versions still gate on it after later schema changes
            "migrated_at_manifest_version": cur.get(
                "migrated_at_manifest_version"),
            "created_ms": _now_ms(),
            "description": None,
            "parent_version": cur["version"],
        }
        kind = change.get("kind")
        if kind == "add_field":
            name, dtype = change["name"], change.get("dtype", "string")
            f = new["fields"].get(name)
            if f is not None and f["removed_in"] is None:
                raise CollectionError(f"field {name!r} already exists")
            if change.get("required") and change.get("default") is None:
                raise CollectionError(
                    f"adding required field {name!r} needs a default "
                    "(existing rows cannot satisfy it)")
            new["fields"][name] = {
                "dtype": dtype, "required": bool(change.get("required")),
                "default": change.get("default"),
                "added_in": new["version"], "removed_in": None,
            }
            new["description"] = f"Added field '{name}'"
        elif kind == "remove_field":
            name = change["name"]
            f = new["fields"].get(name)
            if f is None or f["removed_in"] is not None:
                raise CollectionError(f"no active field {name!r}")
            f["removed_in"] = new["version"]
            new["description"] = f"Removed field '{name}'"
        elif kind == "widen_field":
            name, to = change["name"], change["to_dtype"]
            f = new["fields"].get(name)
            if f is None or f["removed_in"] is not None:
                raise CollectionError(f"no active field {name!r}")
            if f["dtype"] != to and (f["dtype"], to) not in _WIDENINGS:
                raise CollectionError(
                    f"incompatible type change {f['dtype']} -> {to} "
                    f"for field {name!r} (lossy narrowing)")
            f["dtype"] = to
            new["description"] = f"Widened '{name}' to {to}"
        elif kind == "require_field":
            name = change["name"]
            f = new["fields"].get(name)
            if f is None or f["removed_in"] is not None:
                raise CollectionError(f"no active field {name!r}")
            if f["default"] is None:
                raise CollectionError(
                    f"cannot require {name!r} without a default "
                    "(old rows may hold nulls)")
            f["required"] = True
            new["description"] = f"Required field '{name}'"
        elif kind == "change_dimension":
            to, strategy = int(change["to"]), change["strategy"]
            # a dim_change consumed by migrate() (migrated_at set) no
            # longer blocks: the data is physically at the target dims
            pending = (cur["dim_change"] is not None
                       and cur.get("migrated_at_manifest_version") is None)
            if pending:
                raise CollectionError(
                    "a dimension change is already pending; migrate() "
                    "before changing dimensions again (stacked lazy "
                    "projections are not composed)")
            if to <= 0:
                raise CollectionError("dimensions must be > 0")
            if strategy not in DIM_STRATEGIES:
                raise CollectionError(f"unknown dimension strategy {strategy!r}")
            if strategy == "zero_pad" and to < cur["dims"]:
                raise CollectionError(
                    f"zero_pad cannot shrink {cur['dims']} -> {to}")
            if strategy == "truncate" and to > cur["dims"]:
                raise CollectionError(
                    f"cannot truncate {cur['dims']} dims to {to}")
            dim_change = {"from": cur["dims"], "to": to, "strategy": strategy}
            if strategy == "random_project":
                dim_change["seed"] = int(change.get("seed", 7))
            if strategy == "pca_project":
                matrix = change.get("matrix")
                if (matrix is None or len(matrix) != to
                        or any(len(r) != cur["dims"] for r in matrix)):
                    raise CollectionError(
                        f"pca_project needs a {to}x{cur['dims']} matrix")
                dim_change["matrix"] = [[float(x) for x in r] for r in matrix]
            new["dims"] = to
            new["migrated_at_manifest_version"] = None
            new["dim_change"] = dim_change
            new["description"] = f"Changed dimensions {cur['dims']} -> {to}"
        elif kind == "change_distance":
            from needle_spark.functions.distance import _ALIAS

            to_metric = _ALIAS.get(str(change["to"]).lower().replace("-", "_"))
            if to_metric is None:
                raise CollectionError(f"unknown distance metric {change['to']!r}")
            new["metric"] = to_metric
            new["description"] = (
                f"Changed distance {cur['metric']} -> {to_metric}")
        else:
            raise CollectionError(f"unknown schema change kind {kind!r}")

        st = self._state()
        st["versions"].append(new)
        st["current"] = new["version"]
        self.coll._write_manifest_static(self.coll.path, self.coll._manifest)
        return new["version"]

    # ------------------------------------------------ read adaptation --
    def _dim_expr(self, vec: Column, dim_change: dict) -> Column:
        """adapt_dimensions as a scan expression
        (schema_evolution.rs:556-625)."""
        to, strategy = dim_change["to"], dim_change["strategy"]
        if strategy == "zero_pad":
            pad = F.array_repeat(F.lit(0.0).cast("float"),
                                 F.lit(to) - F.size(vec))
            return F.when(F.size(vec) >= to, F.slice(vec, 1, to)).otherwise(
                F.concat(vec, pad))
        if strategy == "truncate":
            return F.slice(vec, 1, to)
        if strategy == "random_project":
            rp = RandomProjection(dim_change["from"], to,
                                  seed=dim_change["seed"])
            rows = rp.matrix()
        else:  # pca_project
            rows = dim_change["matrix"]
        return F.array(*[_dot_expr(vec, r).cast("float") for r in rows])

    def adapt_expr_columns(self, df: DataFrame,
                           skip_dim_change: bool = False) -> list[Column]:
        """Projection adapting a frame written under ANY older schema to
        the CURRENT schema (adapt_metadata + adapt_dimensions, lazily —
        the dual-read of schema_evolution.rs:659-680, where 'migrated'
        data is whatever already matches).  Pure scan expressions.
        `skip_dim_change` is set for reads of manifest versions written
        at/after a migrate() rewrite (already at target dims)."""
        cur = self.current_schema()
        cols: list[Column] = [F.col(self.coll.id_col)]
        vec = F.col(self.coll.vector_col)
        dc = None if skip_dim_change else cur["dim_change"]
        if dc is not None and dc["from"] != dc["to"]:
            vec = F.when(F.size(F.col(self.coll.vector_col)) == dc["to"],
                         F.col(self.coll.vector_col)
                         ).otherwise(self._dim_expr(
                             F.col(self.coll.vector_col), dc))
        cols.append(vec.alias(self.coll.vector_col))
        have = dict(df.dtypes)
        for name, f in cur["fields"].items():
            if f["removed_in"] is not None:
                continue  # dropped fields vanish from reads
            if name in have:
                c = F.col(name)
                if have[name] != f["dtype"]:
                    c = c.cast(f["dtype"])
                if f["default"] is not None:
                    c = F.coalesce(c, F.lit(f["default"]).cast(f["dtype"]))
                cols.append(c.alias(name))
            else:
                cols.append(
                    F.lit(f["default"]).cast(f["dtype"]).alias(name))
        for extra in ("expires_at",):
            if extra in have and extra not in cur["fields"]:
                cols.append(F.col(extra))
        return cols

    def adapted_df(self, version: int | None = None,
                   now: int | None = None) -> DataFrame:
        """The collection's merge-on-read view, adapted to the current
        schema — old segments are reshaped on the fly.  Time-travel
        reads (version=...) reshape iff that manifest version predates
        the migrate() rewrite; data written under ANY retained version
        stays readable at the declared dims."""
        base = self.coll.df(version=version, now=now)
        cur = self.current_schema()
        migrated_at = cur.get("migrated_at_manifest_version")
        skip_dim = (migrated_at is not None
                    and (version is None or version >= migrated_at))
        return base.select(
            *self.adapt_expr_columns(base, skip_dim_change=skip_dim))

    # ------------------------------------------------------- migrate --
    def migrate(self) -> MigrationReport:
        """Eagerly rewrite the collection through the current schema:
        ONE linear scan into a single fresh segment (the compact()
        shape — manifest flip is atomic, old versions stay readable
        until GC), then stamp the collection's declared schema/dims
        (MigrationEngine begin/migrate/finalize, :384-530, collapsed
        into one Spark job)."""
        t0 = _now_ms()
        # the adapted view AND the segment name must derive INSIDE the
        # commit lock (the clear()/compact() rule): a commit landing
        # between a pre-lock adapted_df() and the manifest flip would
        # be silently dropped from the rewritten segment list, and an
        # outside-the-lock obj_seq bump would roll back on refresh and
        # let the next commit overwrite this segment
        with self.coll._commit_lock():
            self.coll._manifest = self.coll._read_manifest()
            cur = self.current_schema()
            from_v = self.coll._manifest.get("schema_migrated_version", 1)
            adapted = self.adapted_df()
            total = adapted.count()
            name = self.coll._new_obj("seg")
            adapted.write.mode("overwrite").parquet(
                os.path.join(self.coll.path, name))
            self.coll._commit_locked(
                [], [], 0, None,
                new_entry={"segments": [name], "tombstones": []})
            m = self.coll._manifest
            m["dims"] = cur["dims"]
            m["metric"] = cur["metric"]
            written = self.coll.spark.read.parquet(
                os.path.join(self.coll.path, name))
            m["schema"] = ", ".join(f"{n} {t}" for n, t in written.dtypes)
            m["schema_migrated_version"] = cur["version"]
            # every row is now physically at the target dims FROM THIS
            # manifest version on; the dim_change stays recorded (gated
            # by migrated_at_manifest_version) so time-travel reads of
            # pre-migration manifest versions still reshape old rows
            for sv in m["schema_evolution"]["versions"]:
                if sv["version"] == cur["version"]:
                    sv["migrated_at_manifest_version"] = m["version"]
            self.coll._write_manifest_static(self.coll.path, m)
        return MigrationReport(
            from_version=from_v, to_version=cur["version"],
            total_migrated=int(total), duration_ms=_now_ms() - t0,
        )

    # ---------------------------------------------- recall validation --
    def validate_dimension_recall(
        self, change: dict, sample_queries: int = 20, k: int = 10,
        min_recall: float = 0.9,
    ) -> dict:
        """Distributed recall check BEFORE committing a dimension change
        (schema_evolution.rs:682-780): exact top-k in original space vs
        top-k in projected space over sampled query vectors, overlap
        averaged.  Top-k jobs are TakeOrdered reductions; only k ids
        per query land on the driver."""
        from needle_spark.operators.knn import knn

        if change.get("kind") != "change_dimension":
            raise CollectionError("recall validation is for change_dimension")
        dc = {"from": self.current_schema()["dims"], "to": int(change["to"]),
              "strategy": change["strategy"],
              "seed": int(change.get("seed", 7))}
        if change.get("matrix") is not None:
            dc["matrix"] = change["matrix"]
        base = self.coll.df()
        ic, vc = self.coll.id_col, self.coll.vector_col
        # rank under the collection's OWN serving metric — a projection
        # that preserves cosine neighborhoods can still destroy
        # euclidean ones (norm information)
        metric = self.coll._manifest.get("metric", "cosine")
        proj = base.select(
            F.col(ic), self._dim_expr(F.col(vc), dc).alias(vc))
        qrows = base.select(ic, vc).limit(int(sample_queries)).collect()
        hits = trials = 0
        distortion = 0.0
        for r in qrows:
            qv = [float(x) for x in r[vc]]
            a = knn(base, qv, k=k, metric=metric, vector_col=vc, id_col=ic)
            got_a = {x[ic]: x["distance"] for x in a.collect()}
            # project the query vector DRIVER-side (pure function of
            # qv + the strategy) — no per-query table scan
            pqv = _project_local(qv, dc)
            b = knn(proj, pqv, k=k, metric=metric, vector_col=vc, id_col=ic)
            got_b = {x[ic]: x["distance"] for x in b.collect()}
            hits += len(set(got_a) & set(got_b))
            trials += k
            both = set(got_a) & set(got_b)
            if both:
                distortion += sum(
                    abs(got_a[i] - got_b[i]) for i in both) / len(both)
        recall = hits / trials if trials else 1.0
        return {
            "recall_at_k": recall, "k": k, "queries_tested": len(qrows),
            "passed": recall >= min_recall,
            "avg_distance_distortion": distortion / max(1, len(qrows)),
        }

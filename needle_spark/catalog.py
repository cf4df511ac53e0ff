"""Collection catalog: databases, collections, mutations, CDC, snapshots,
transactions.

Maps the reference's storage/DDL surface (/root/reference/src/database/
mod.rs open :185 / save :1065 / create :587 / drop :739 / rename :803,
transactions :1228-1398; src/collection/{insert.rs,mutations.rs,cdc.rs};
snapshots.rs) onto a directory-of-Parquet layout:

    <root>/<collection>/
        manifest.json        {version, cdc_seq, dims, metric, id_col, ...}
        v=<N>/part-*.parquet data at version N (immutable once written)
        _cdc/seq=<S>/        append-only change events

Immutable version directories give MVCC for free: `AS OF` a version is
just reading an older directory (needle's snapshot/restore/diff —
snapshots.rs), a transaction is "stage ops, write one new version,
flip the manifest pointer" (atomic via os.replace), and the CDC log is
an ordinary table that Structured Streaming can tail.

Insert validation mirrors the reference's contract
(tests/edge_cases.rs:173-215): dimension mismatch, NaN/Inf, and
duplicate ids are rejected.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from needle_spark.filters import compile_filter


class CollectionError(ValueError):
    pass


def _utcnow_ms() -> int:
    return int(time.time() * 1000)


class Collection:
    """A named vector collection backed by versioned Parquet."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._manifest = self._read_manifest()

    # ---------------------------------------------------------- admin --
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        dims: int,
        metric: str = "cosine",
        id_col: str = "id",
        vector_col: str = "vector",
        schema: str | None = None,
    ) -> "Collection":
        if os.path.exists(os.path.join(path, "manifest.json")):
            raise CollectionError(f"collection already exists at {path}")
        os.makedirs(path, exist_ok=True)
        manifest = {
            "version": 0,
            "cdc_seq": 0,
            "dims": dims,
            "metric": metric,
            "id_col": id_col,
            "vector_col": vector_col,
            "schema": schema,
            "created_ms": _utcnow_ms(),
        }
        cls._write_manifest_static(path, manifest)
        # v=0: empty
        sch = schema or f"{id_col} string, {vector_col} array<float>"
        spark.createDataFrame([], sch).write.mode("overwrite").parquet(
            os.path.join(path, "v=0")
        )
        return cls(spark, path)

    def _read_manifest(self) -> dict:
        with open(os.path.join(self.path, "manifest.json")) as f:
            return json.load(f)

    @staticmethod
    def _write_manifest_static(path: str, manifest: dict) -> None:
        tmp = os.path.join(path, ".manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(path, "manifest.json"))  # atomic flip

    def _commit(self, df: DataFrame, events: list[dict], now_ms: int | None) -> None:
        m = self._manifest
        new_v = m["version"] + 1
        df.write.mode("overwrite").parquet(os.path.join(self.path, f"v={new_v}"))
        if events:
            seq0 = m["cdc_seq"]
            ts = now_ms if now_ms is not None else _utcnow_ms()
            ev_rows = [
                (seq0 + i, ts, e["event_type"], str(e["vector_id"]),
                 json.dumps(e.get("metadata")) if e.get("metadata") is not None else None)
                for i, e in enumerate(events)
            ]
            self.spark.createDataFrame(
                ev_rows,
                "sequence long, timestamp_ms long, event_type string, "
                "vector_id string, metadata string",
            ).write.mode("append").parquet(os.path.join(self.path, "_cdc"))
            m["cdc_seq"] = seq0 + len(events)
        m["version"] = new_v
        self._write_manifest_static(self.path, m)

    # ----------------------------------------------------------- read --
    def df(self, version: int | None = None) -> DataFrame:
        v = self._manifest["version"] if version is None else version
        return self.spark.read.parquet(os.path.join(self.path, f"v={v}"))

    @property
    def version(self) -> int:
        return self._manifest["version"]

    @property
    def dims(self) -> int:
        return self._manifest["dims"]

    @property
    def id_col(self) -> str:
        return self._manifest["id_col"]

    @property
    def vector_col(self) -> str:
        return self._manifest["vector_col"]

    def count(self, flt: dict | None = None) -> int:
        d = self.df()
        if flt is not None:
            d = d.filter(compile_filter(flt, df=d))
        return d.count()

    def get(self, vector_id: Any):
        rows = self.df().filter(F.col(self.id_col) == vector_id).collect()
        return rows[0] if rows else None

    def contains(self, vector_id: Any) -> bool:
        return self.get(vector_id) is not None

    # ---------------------------------------------------- typed schema --
    def set_metadata_schema(self, fields: dict[str, dict]) -> None:
        """Declare a typed metadata schema (typed_schema.rs:43-97 /
        metadata.rs:69-110): {field: {"type": "string|int|float|bool|
        string_array|int_array", "required": bool}}.  Enforced on every
        subsequent insert/upsert."""
        allowed = {"string", "int", "float", "bool", "string_array", "int_array"}
        for f, spec in fields.items():
            if spec.get("type") not in allowed:
                raise CollectionError(f"unknown field type for {f!r}: {spec.get('type')}")
        self._manifest["metadata_schema"] = fields
        self._write_manifest_static(self.path, self._manifest)

    def _validate_schema(self, rows: DataFrame) -> None:
        spec: dict = self._manifest.get("metadata_schema") or {}
        if not spec:
            return
        dtypes = dict(rows.dtypes)
        for fname, fspec in spec.items():
            required = bool(fspec.get("required"))
            if fname not in dtypes:
                if required:
                    raise CollectionError(f"missing required field {fname!r}")
                continue
            want = fspec["type"]
            got = dtypes[fname]
            ok = {
                "string": got == "string",
                "int": got in ("bigint", "int", "smallint", "tinyint"),
                "float": got in ("double", "float"),
                "bool": got == "boolean",
                "string_array": got == "array<string>",
                "int_array": got in ("array<bigint>", "array<int>"),
            }[want]
            if not ok:
                raise CollectionError(
                    f"field {fname!r}: declared {want}, batch has {got}"
                )
            if required:
                nulls = rows.filter(F.col(fname).isNull()).count()
                if nulls:
                    raise CollectionError(f"{nulls} null values in required field {fname!r}")

    # -------------------------------------------------------- validate --
    def _validate_new(self, rows: DataFrame, check_dup_existing: bool = True) -> None:
        self._validate_schema(rows)
        vc, ic, dims = self.vector_col, self.id_col, self.dims
        bad = rows.select(
            F.sum((F.size(vc) != dims).cast("int")).alias("dim"),
            F.sum(
                F.exists(vc, lambda x: F.isnan(x) | (F.abs(x) == float("inf"))).cast("int")
            ).alias("nonfinite"),
            (F.count(F.lit(1)) - F.countDistinct(ic)).alias("dup_in_batch"),
        ).first()
        if bad["dim"]:
            raise CollectionError(f"dimension mismatch: expected {dims}")
        if bad["nonfinite"]:
            raise CollectionError("vector contains NaN or Inf")
        if bad["dup_in_batch"]:
            raise CollectionError("duplicate ids within batch")
        if check_dup_existing:
            dups = rows.join(self.df().select(ic), ic, "inner").count()
            if dups:
                raise CollectionError(f"{dups} ids already exist")

    # -------------------------------------------------------- mutate --
    def _payload_events(self, rows: DataFrame, event_type: str) -> list[dict]:
        """CDC events carrying the non-vector row payload as JSON (the
        reference's ChangeEvent metadata snapshot, streaming/core.rs:
        96-160) so streams are replayable.  Collected on the driver —
        fine for mutation batches; bulk loads should go through
        streaming ingestion which writes events distributed."""
        ic, vc = self.id_col, self.vector_col
        meta_cols = [c for c in rows.columns if c != vc]
        collected = rows.select(*meta_cols).collect()
        return [
            {
                "event_type": event_type,
                "vector_id": r[ic],
                "metadata": {c: r[c] for c in meta_cols if c != ic},
            }
            for r in collected
        ]

    def insert(self, rows: DataFrame, now_ms: int | None = None) -> int:
        """Append rows; rejects duplicate ids (insert.rs semantics)."""
        self._validate_new(rows)
        n = rows.count()
        new_df = self.df().unionByName(rows, allowMissingColumns=True)
        self._commit(new_df, self._payload_events(rows, "insert"), now_ms)
        return n

    def upsert(self, rows: DataFrame, now_ms: int | None = None) -> int:
        """MERGE semantics: replace matching ids, append the rest
        (mutations.rs upsert)."""
        self._validate_new(rows, check_dup_existing=False)
        ic = self.id_col
        cur = self.df()
        replaced = cur.join(rows.select(ic), ic, "left_anti")
        new_df = replaced.unionByName(rows, allowMissingColumns=True)
        events = self._payload_events(rows, "upsert")
        self._commit(new_df, events, now_ms)
        return len(events)

    def delete(self, flt: dict | None = None, ids: list | None = None,
               now_ms: int | None = None, pred=None) -> int:
        """Delete by filter, id list, or raw predicate Column
        (mutations.rs:27-115); returns the number of deleted rows."""
        cur = self.df()
        if pred is not None:
            pass
        elif ids is not None:
            pred = F.col(self.id_col).isin(ids)
        elif flt is not None:
            pred = compile_filter(flt, df=cur)
        else:
            raise CollectionError("delete requires a filter or ids")
        # Three-valued logic trap: rows where pred evaluates NULL must be
        # KEPT (not deleted), so survivors filter on NOT coalesce(pred, F)
        # — plain ~pred would silently drop NULL rows from both sides.
        pred = F.coalesce(pred, F.lit(False))
        victims = [r[0] for r in cur.filter(pred).select(self.id_col).collect()]
        if not victims:
            return 0
        self._commit(
            cur.filter(~pred),
            [{"event_type": "delete", "vector_id": i} for i in victims],
            now_ms,
        )
        return len(victims)

    def update_metadata(self, flt: dict, updates: dict[str, Any],
                        now_ms: int | None = None) -> int:
        """Set metadata columns on matching rows (mutations.rs
        update_metadata; merge-patch style)."""
        cur = self.df()
        pred = compile_filter(flt, df=cur)
        n = cur.filter(pred).count()
        out = cur
        for col, val in updates.items():
            out = out.withColumn(col, F.when(pred, F.lit(val)).otherwise(F.col(col)))
        ids = [r[0] for r in cur.filter(pred).select(self.id_col).collect()]
        self._commit(out, [{"event_type": "update", "vector_id": i} for i in ids], now_ms)
        return n

    def clear(self, now_ms: int | None = None) -> None:
        self._commit(self.df().limit(0), [{"event_type": "clear", "vector_id": "*"}], now_ms)

    # ------------------------------------------------------ CDC / time --
    def cdc_events(self) -> DataFrame:
        p = os.path.join(self.path, "_cdc")
        if not os.path.exists(p):
            return self.spark.createDataFrame(
                [], "sequence long, timestamp_ms long, event_type string, "
                    "vector_id string, metadata string")
        return self.spark.read.parquet(p)

    def cdc_events_since(self, seq: int, limit: int | None = None) -> DataFrame:
        """Resume-token read (cdc.rs cdc_events_since, core.rs:290)."""
        out = self.cdc_events().filter(F.col("sequence") >= seq).orderBy("sequence")
        return out.limit(limit) if limit is not None else out

    def versions(self) -> list[int]:
        return sorted(
            int(d.split("=")[1]) for d in os.listdir(self.path)
            if d.startswith("v=")
        )

    def diff(self, v_old: int, v_new: int) -> DataFrame:
        """Snapshot diff (snapshots.rs): rows added/removed between
        versions, keyed by id."""
        ic = self.id_col
        old, new = self.df(v_old).select(ic), self.df(v_new).select(ic)
        added = new.join(old, ic, "left_anti").withColumn("change", F.lit("added"))
        removed = old.join(new, ic, "left_anti").withColumn("change", F.lit("removed"))
        return added.unionByName(removed)

    def restore(self, version: int, now_ms: int | None = None) -> None:
        """Roll the collection back to an earlier snapshot (as a NEW
        version — history is never rewritten)."""
        if version not in self.versions():
            raise CollectionError(f"unknown version {version}")
        self._commit(self.df(version),
                     [{"event_type": "restore", "vector_id": str(version)}], now_ms)

    # ----------------------------------------------- export / import --
    def export_json(self, out_path: str) -> None:
        """Whole-collection JSON export (database/mod.rs:965)."""
        self.df().write.mode("overwrite").json(out_path)

    def import_json(self, in_path: str, now_ms: int | None = None) -> int:
        """JSON import (database/mod.rs:995) — validated like insert."""
        rows = self.spark.read.schema(self.df().schema).json(in_path)
        return self.insert(rows, now_ms=now_ms)

    def export_bundle(self, out_dir: str) -> None:
        """Portable bundle = data + manifest (collection/bundle.rs): a
        self-contained directory restorable with import_bundle."""
        import shutil as _sh

        os.makedirs(out_dir, exist_ok=True)
        m = dict(self._manifest)
        m["bundle_format"] = 1
        with open(os.path.join(out_dir, "manifest.json"), "w") as f:
            json.dump(m, f)
        _sh.copytree(
            os.path.join(self.path, f"v={m['version']}"),
            os.path.join(out_dir, "data"),
            dirs_exist_ok=True,
        )

    @classmethod
    def import_bundle(cls, spark: SparkSession, bundle_dir: str, path: str) -> "Collection":
        with open(os.path.join(bundle_dir, "manifest.json")) as f:
            m = json.load(f)
        if m.get("bundle_format") != 1:
            raise CollectionError("unsupported bundle format")
        coll = cls.create(
            spark, path, dims=m["dims"], metric=m["metric"],
            id_col=m["id_col"], vector_col=m["vector_col"], schema=m.get("schema"),
        )
        data = spark.read.parquet(os.path.join(bundle_dir, "data"))
        coll._commit(data, [{"event_type": "import", "vector_id": "*"}], None)
        return coll

    def compact(self, keep_versions: int = 1, target_partitions: int | None = None) -> None:
        """Tombstone GC (accessors.rs:166,241 / OPTIMIZE): rewrite the
        current version with a bounded partition count and drop history
        older than keep_versions."""
        cur = self.df()
        if target_partitions:
            cur = cur.coalesce(target_partitions)
        self._commit(cur, [], None)
        keep = set(self.versions()[-(keep_versions + 1):])
        for v in self.versions():
            if v not in keep:
                shutil.rmtree(os.path.join(self.path, f"v={v}"), ignore_errors=True)

    # -------------------------------------------------- transactions --
    def begin(self) -> "Transaction":
        return Transaction(self)


class Transaction:
    """Staged multi-op batch with all-or-nothing commit
    (database/mod.rs:1228-1398).  Ops accumulate lazily against a working
    DataFrame; commit writes ONE new version; rollback discards."""

    def __init__(self, coll: Collection):
        self.coll = coll
        self._df = coll.df()
        self._events: list[dict] = []
        self._open = True

    def _check(self):
        if not self._open:
            raise CollectionError("transaction already closed")

    def insert(self, rows: DataFrame) -> "Transaction":
        self._check()
        ic = self.coll.id_col
        if self._df.join(rows.select(ic), ic, "inner").count():
            raise CollectionError("duplicate ids in transaction insert")
        self._df = self._df.unionByName(rows, allowMissingColumns=True)
        self._events += [
            {"event_type": "insert", "vector_id": r[0]}
            for r in rows.select(ic).collect()
        ]
        return self

    def delete(self, flt: dict) -> "Transaction":
        self._check()
        # NULL-pred rows are kept, mirroring Collection.delete
        pred = F.coalesce(compile_filter(flt, df=self._df), F.lit(False))
        self._events += [
            {"event_type": "delete", "vector_id": r[0]}
            for r in self._df.filter(pred).select(self.coll.id_col).collect()
        ]
        self._df = self._df.filter(~pred)
        return self

    def commit(self, now_ms: int | None = None) -> None:
        self._check()
        self.coll._commit(self._df, self._events, now_ms)
        self._open = False

    def rollback(self) -> None:
        self._check()
        self._open = False


class Database:
    """Named set of collections in one root directory
    (database/mod.rs:185), with aliases (database/aliases.rs)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._aliases_path = os.path.join(root, "aliases.json")

    def _aliases(self) -> dict[str, str]:
        if os.path.exists(self._aliases_path):
            with open(self._aliases_path) as f:
                return json.load(f)
        return {}

    def _resolve(self, name: str) -> str:
        return self._aliases().get(name, name)

    def create_collection(self, name: str, dims: int, **kwargs) -> Collection:
        return Collection.create(
            self.spark, os.path.join(self.root, name), dims, **kwargs
        )

    def collection(self, name: str) -> Collection:
        path = os.path.join(self.root, self._resolve(name))
        if not os.path.exists(os.path.join(path, "manifest.json")):
            raise CollectionError(f"no such collection: {name}")
        return Collection(self.spark, path)

    def list_collections(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.exists(os.path.join(self.root, d, "manifest.json"))
        )

    def drop_collection(self, name: str) -> None:
        path = os.path.join(self.root, self._resolve(name))
        if not os.path.exists(path):
            raise CollectionError(f"no such collection: {name}")
        shutil.rmtree(path)

    def rename_collection(self, old: str, new: str) -> None:
        src = os.path.join(self.root, old)
        dst = os.path.join(self.root, new)
        if os.path.exists(dst):
            raise CollectionError(f"target exists: {new}")
        os.rename(src, dst)

    def create_alias(self, alias: str, target: str) -> None:
        a = self._aliases()
        a[alias] = target
        with open(self._aliases_path, "w") as f:
            json.dump(a, f)

    def drop_alias(self, alias: str) -> None:
        a = self._aliases()
        a.pop(alias, None)
        with open(self._aliases_path, "w") as f:
            json.dump(a, f)

"""Catalog format validation (fsck): manifest format versioning with
compatibility/migration rules, structural integrity checks over every
retained version, CDC-log consistency, data/dims verification, and
orphan-object accounting with safe GC.

Reference: /root/reference/src/services/governance/format_validator.rs
— FormatVersion + same-major compatibility (:28-46),
FormatSpec.v1/validate_header/to_spec_doc (:80-180), ValidationResult
(:183-187), FormatMigrator with explicit migration paths and
backwards-compat rule (:190-240); sibling `format_spec.rs` documents
the on-disk page layout.  The reference validates ITS byte-level
`.needle` pages; this engine's stable format is
Parquet-segments + JSON manifest + CDC Parquet, so the byte-level
checks become STRUCTURAL ones — the same third-party-tooling guarantee
at the format this engine actually writes:

* manifest: required keys, format version compatibility, version
  entries contiguous from 0, current version present, snapshots bound
  to retained versions;
* objects: every segment/tombstone referenced by any retained version
  exists on disk and parses as Parquet;
* data: the current view is readable, vector lengths match the
  declared dims (sampled), id uniqueness holds;
* CDC: the log parses, sequences are unique and the max equals the
  manifest's cdc_seq - 1 (or the log is empty at 0);
* orphans: on-disk seg-/del- objects referenced by NO retained
  version are reported, and `gc_orphans` removes them (dry-run by
  default) — the catalog's `compact(keep_versions=N)` is what makes
  objects unreferenced, so this is the safe sweep behind it.

All checks run as metadata reads plus a bounded sample; only the id
uniqueness/dims checks touch data, each as one aggregation."""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

#: Manifest format version written by this engine.
FORMAT_VERSION = (1, 0)

_REQUIRED_KEYS = ("version", "cdc_seq", "obj_seq", "dims", "metric",
                  "id_col", "vector_col", "schema", "versions")


def is_compatible(found: tuple[int, int],
                  supported: tuple[int, int] = FORMAT_VERSION) -> bool:
    """Same-major rule — format_validator.rs:36-46: a reader supports
    any file whose major matches and whose minor is <= its own."""
    return found[0] == supported[0] and found[1] <= supported[1]


def migration_path(from_v: tuple[int, int],
                   to_v: tuple[int, int]) -> list[str]:
    """format_validator.rs:205-240 — explicit upgrade steps.  The only
    published step so far is the implicit 0.x -> 1.0 manifest rewrite
    (adding format_version); same-version needs nothing."""
    if from_v == to_v:
        return []
    if from_v < (1, 0) <= to_v:
        return ["stamp format_version into manifest.json (rewrite-in-place)"]
    if not is_compatible(from_v, to_v):
        raise ValueError(
            f"no migration path from {from_v} to {to_v}")
    return []


def spec_doc() -> str:
    """to_spec_doc — format_validator.rs:156-180: the on-disk contract
    for third-party tooling."""
    return (
        "needle-spark collection format v{}.{}\n"
        "  manifest.json   UTF-8 JSON: {{version, cdc_seq, obj_seq, dims,\n"
        "                  metric, id_col, vector_col, schema, versions,\n"
        "                  snapshots?, aliases?, format_version?}}\n"
        "  versions        map version -> {{segments: [seg-N...],\n"
        "                  tombstones: [[del-N, stamped_after_segs]...]}};\n"
        "                  merge-on-read: segment minus later tombstones\n"
        "  seg-N/          Parquet directory, collection schema\n"
        "  del-N/          Parquet directory, single id column\n"
        "  _cdc/           Parquet event log: sequence, timestamp_ms,\n"
        "                  event_type, vector_id, metadata\n"
    ).format(*FORMAT_VERSION)


@dataclass
class ValidationReport:
    """ValidationResult — format_validator.rs:183-187, widened with
    warnings and stats."""

    valid: bool = True
    errors: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)
    stats: dict = field(default_factory=dict)

    def error(self, msg: str) -> None:
        self.valid = False
        self.errors.append(msg)

    def warn(self, msg: str) -> None:
        self.warnings.append(msg)


def _tomb_file(t) -> str:
    return t if isinstance(t, str) else t[0]


def validate_collection(spark: SparkSession, path: str,
                        *, sample: int = 1000,
                        check_data: bool = True) -> ValidationReport:
    """Full structural validation of one collection directory."""
    rep = ValidationReport()
    mpath = os.path.join(path, "manifest.json")
    if not os.path.exists(mpath):
        rep.error("manifest.json missing")
        return rep
    try:
        with open(mpath) as f:
            m = json.load(f)
    except Exception as e:
        rep.error(f"manifest.json unreadable: {e}")
        return rep

    for k in _REQUIRED_KEYS:
        if k not in m:
            rep.error(f"manifest missing required key {k!r}")
    if rep.errors:
        return rep

    fv = tuple(m.get("format_version", FORMAT_VERSION))
    if not is_compatible(fv):
        rep.error(f"format version {fv} incompatible with "
                  f"reader {FORMAT_VERSION}")
        return rep
    if "format_version" not in m:
        rep.warn("manifest predates explicit format_version "
                 f"(migration: {migration_path((0, 9), FORMAT_VERSION)})")

    versions = m["versions"]
    rep.stats["retained_versions"] = len(versions)
    nums = sorted(int(v) for v in versions)
    if str(m["version"]) not in versions:
        rep.error(f"current version {m['version']} not in versions map")
    # retention may be non-contiguous: compact(keep_versions=N) keeps
    # the recent tail PLUS every snapshot-pinned version, so gaps are
    # legal — but nothing may be retained beyond the current version
    if nums and nums[-1] > int(m["version"]):
        rep.error(f"retained version {nums[-1]} is newer than the "
                  f"current version {m['version']}")

    # every referenced object exists and parses
    referenced: set[str] = set()
    for vname, entry in versions.items():
        for seg in entry.get("segments", []):
            referenced.add(seg)
            spath = os.path.join(path, seg)
            if not os.path.exists(spath):
                rep.error(f"version {vname}: segment {seg} missing")
        for t in entry.get("tombstones", []):
            tf = _tomb_file(t)
            referenced.add(tf)
            if not os.path.exists(os.path.join(path, tf)):
                rep.error(f"version {vname}: tombstone {tf} missing")
    rep.stats["referenced_objects"] = len(referenced)

    # snapshots must bind to retained versions
    for name, v in (m.get("snapshots") or {}).items():
        if str(v) not in versions:
            rep.error(f"snapshot {name!r} points at pruned version {v}")

    # objects pinned by branch forks (branches.py COW) are live even
    # when no retained version references them — catalog._gc_locked
    # honors these pins, so fsck/gc must too or gc_orphans deletes
    # files live branches still read
    pins_path = os.path.join(path, "branch_pins.json")
    if os.path.exists(pins_path):
        try:
            with open(pins_path) as f:
                referenced.update(json.load(f))
        except (ValueError, OSError) as e:
            rep.error(f"branch_pins.json unreadable: {e}")

    # orphan objects (not referenced by ANY retained version or pin)
    orphans = [
        f for f in os.listdir(path)
        if (f.startswith("seg-") or f.startswith("del-"))
        and f not in referenced
    ]
    rep.stats["orphan_objects"] = len(orphans)
    rep.stats["orphans"] = sorted(orphans)
    if orphans:
        rep.warn(f"{len(orphans)} unreferenced objects "
                 f"(safe to gc_orphans): {sorted(orphans)[:5]}")

    # CDC log consistency
    cdc_dir = os.path.join(path, "_cdc")
    if os.path.exists(cdc_dir):
        try:
            cdc = spark.read.parquet(cdc_dir)
            agg = cdc.agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("sequence").alias("uniq"),
                F.max("sequence").alias("max_seq")).first()
            rep.stats["cdc_events"] = agg["n"]
            if agg["n"] != agg["uniq"]:
                rep.error("duplicate CDC sequences")
            expected = m["cdc_seq"] - 1
            if agg["n"]:
                if agg["max_seq"] is not None and agg["max_seq"] > expected:
                    # sequences beyond the manifest's allocation: real
                    # corruption (phantom events)
                    rep.error(f"CDC max sequence {agg['max_seq']} > "
                              f"manifest cdc_seq-1 ({expected})")
                elif agg["max_seq"] != expected:
                    # a SHORT tail is the commit protocol's documented
                    # crash artifact (manifest flips before the CDC
                    # append; catalog._commit_locked) — replay loses
                    # that commit's events but nothing is corrupt
                    rep.warn(f"CDC tail gap: max sequence "
                             f"{agg['max_seq']} < expected {expected} "
                             f"(crash between manifest flip and CDC "
                             f"append)")
            elif m["cdc_seq"] > 0:
                rep.warn(f"manifest records {m['cdc_seq']} CDC events "
                         f"but the _cdc log is empty (crash artifact)")
        except Exception as e:
            rep.error(f"CDC log unreadable: {e}")
    elif m["cdc_seq"] > 0:
        rep.warn("manifest records CDC events but _cdc/ is missing "
                 "(first-commit crash artifact)")

    if check_data and rep.valid:
        try:
            from needle_spark.catalog import Collection
            coll = Collection(spark, path)
            # the insert-time uniqueness invariant is defined over the
            # TTL-filtered view: re-inserting an expired id is legal,
            # so the raw view can legitimately hold duplicates
            df = coll.df()
            checks = df.limit(max(sample, 1)).agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct(m["id_col"]).alias("ids"),
                F.sum(
                    F.when(F.size(F.col(m["vector_col"]))
                           != F.lit(m["dims"]), 1).otherwise(0)
                ).alias("bad_dims")).first()
            rep.stats["sampled_rows"] = checks["n"]
            if checks["n"] != checks["ids"]:
                rep.error("duplicate ids in current view (sampled)")
            if (checks["bad_dims"] or 0) > 0:
                rep.error(f"{checks['bad_dims']} sampled vectors have "
                          f"length != dims ({m['dims']})")
        except Exception as e:
            rep.error(f"current view unreadable: {e}")

    return rep


def gc_orphans(spark: SparkSession, path: str,
               *, dry_run: bool = True) -> list[str]:
    """Remove seg-/del- objects referenced by no retained version.
    Validation runs first and must pass (an orphan list from a broken
    manifest is not trustworthy)."""
    from needle_spark.catalog import Collection

    # hold the collection's commit flock across scan + delete: an
    # in-flight commit writes its segment BEFORE flipping the manifest,
    # and an unlocked gc would see that segment as an orphan and delete
    # it out from under the committing writer
    coll = Collection(spark, path)
    with coll._commit_lock():
        rep = validate_collection(spark, path, check_data=False)
        if not rep.valid:
            raise ValueError(f"refusing to gc an invalid collection: "
                             f"{rep.errors}")
        victims = rep.stats.get("orphans", [])
        if not dry_run:
            for v in victims:
                shutil.rmtree(os.path.join(path, v), ignore_errors=True)
    return victims

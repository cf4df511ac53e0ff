"""Materialized views with staleness-driven refresh.

Reference: /root/reference/src/services/collection/materialized_views.rs
(558 LoC; staleness threshold at :22) — a named stored query whose
result is pre-computed and refreshed when stale or when the underlying
collection drifts.

Spark mapping: the materialized result is a cached DataFrame (or a
written table via `storage_path`); staleness is wall-clock age and/or
an underlying-version drift check against a `needle_spark.catalog`
Collection.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame


class MaterializedView:
    def __init__(
        self,
        name: str,
        build: Callable[[], DataFrame],
        staleness_seconds: float = 300.0,
        source_collection=None,
        storage_path: str | None = None,
    ):
        self.name = name
        self._build = build
        self.staleness_seconds = staleness_seconds
        self.source = source_collection
        self.storage_path = storage_path
        self._df: DataFrame | None = None
        self._built_at: float | None = None
        self._built_version: int | None = None
        self.refresh_count = 0

    # ------------------------------------------------------------------
    def is_stale(self, now: float | None = None) -> bool:
        if self._df is None:
            return True
        if self.source is not None and self.source.version != self._built_version:
            return True  # underlying data drifted
        now = time.time() if now is None else now
        return (now - (self._built_at or 0)) > self.staleness_seconds

    def refresh(self, now: float | None = None) -> DataFrame:
        # stamp the source version BEFORE building: a commit landing
        # mid-build must leave the view stale (one extra refresh) —
        # stamping after would mark the unseen commit as materialized
        pre_version = self.source.version if self.source is not None else None
        old = self._df
        df = self._build()
        gen = self.refresh_count + 1
        if self.storage_path is not None:
            import os
            import shutil

            # generation subdirs: overwriting the served path in place
            # would delete the files in-flight readers' lazy plans
            # reference.  The previous generation survives one cycle.
            vdir = os.path.join(self.storage_path, f"v{gen}")
            df.write.mode("overwrite").parquet(vdir)
            df = df.sparkSession.read.parquet(vdir)
            if os.path.isdir(self.storage_path):
                for d in os.listdir(self.storage_path):
                    if (d.startswith("v") and d[1:].isdigit()
                            and int(d[1:]) < gen - 1):
                        shutil.rmtree(os.path.join(self.storage_path, d),
                                      ignore_errors=True)
        else:
            df = df.cache()
        # only after the new result exists: release the old one (a
        # failed build leaves the previous materialization serving)
        if old is not None and self.storage_path is None:
            old.unpersist()
        self._df = df
        self._built_at = time.time() if now is None else now
        self._built_version = pre_version
        self.refresh_count += 1
        return df

    def df(self, now: float | None = None) -> DataFrame:
        """Serve the materialized result, refreshing first if stale."""
        if self.is_stale(now):
            return self.refresh(now)
        return self._df

"""Custom stateful streaming operators via applyInPandasWithState.

The reference's streaming surface is ingestion + CDC (src/streaming/);
these operators are the training-data-pipeline extension tier (like
streaming/windowed_event_counts): arbitrary per-key state kept by
Spark's state store across micro-batches, expressed with Arrow-batched
`applyInPandasWithState` rather than driver-side dictionaries.

Operators:

- `sessionize` — gap-based session windows per key: events separated by
  more than `gap_seconds` split sessions; closed sessions are emitted
  append-only, open sessions ride in the state store and are flushed by
  a processing-time timeout once the key goes idle.
- `streaming_centroids` — per-key running vector centroid (count + sum
  in state, mean emitted each batch, update mode): the streaming twin
  of operators/vector_agg.py's batch centroids, maintained
  incrementally instead of rescanned per trigger.

100 TB posture: state lives in the executor-side state store hash
partitioned by the grouping key (`spark.sql.shuffle.partitions` state
partitions) — no driver-side state, no rescans of history.  Per-key
state is O(1) (a handful of scalars / one d-vector), so key cardinality
is bounded only by state-store capacity; for >10^8 keys configure the
RocksDB provider (`spark.sql.streaming.stateStore.providerClass=
...RocksDBStateStoreProvider`) so state spills to local disk instead of
executor heap.  Sessions are emitted append-only (closed-only), so the
downstream sink never rewrites rows.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["sessionize", "streaming_centroids"]


def _session_rows(key, start, end, n) -> pd.DataFrame:
    return pd.DataFrame(
        {"key": [key], "session_start": [start], "session_end": [end],
         "n_events": [n]}
    )


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 300.0,
    idle_flush_ms: int = 60_000,
) -> DataFrame:
    """Gap-based sessionization of a (possibly streaming) event frame.

    Two events of the same key belong to the same session iff they are
    <= `gap_seconds` apart; sessions survive micro-batch boundaries in
    the state store.  A session closes (and is emitted) when a later
    event of the same key arrives past the gap, or when the key has been
    idle for `idle_flush_ms` of processing time (timeout flush).

    Output (append): key, session_start, session_end (epoch seconds,
    double), n_events (long).

    In-batch semantics: rows are sorted by event time inside each
    (batch, key) group, so out-of-order arrival *within* a batch is
    handled exactly; cross-batch regressions (an event older than the
    open session's tail) clamp to the open session, mirroring the
    at-least-once tolerance of the ingestion tier.
    """
    gap = float(gap_seconds)

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield _session_rows(k, start, last, n)
            return

        ts: list[float] = []
        for pdf in pdfs:
            ts.extend(float(v) for v in pdf["__ts"])
        ts.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = ts[0]
            n = 0
        closed = []
        for t in ts:
            if n > 0 and t - last > gap:
                closed.append((start, last, n))
                start = t
                n = 0
            last = max(last, t)
            n += 1
        state.update((float(start), float(last), int(n)))
        state.setTimeoutDuration(int(idle_flush_ms))
        for s, e, c in closed:
            yield _session_rows(k, s, e, c)

    prepared = events.selectExpr(
        f"CAST({key_col} AS STRING) AS key",
        f"CAST(CAST({ts_col} AS TIMESTAMP) AS DOUBLE) AS __ts",
    ).filter("__ts IS NOT NULL")  # one NaN would poison the key's state
    return prepared.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=("key string, session_start double, "
                          "session_end double, n_events long"),
        stateStructType="start double, last double, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def streaming_centroids(
    events: DataFrame,
    key_col: str = "category",
    vector_col: str = "vector",
    dims: int | None = None,
) -> DataFrame:
    """Per-key running centroid of a vector column, maintained
    incrementally in the state store (update mode).

    Output (update, one row per key per batch it appears in): key,
    n_vectors (long), centroid (array<double>).  The emitted centroid is
    the mean over ALL vectors ever seen for the key — state holds
    (count, sum) so each micro-batch costs O(batch), never a rescan.

    Vectors with mismatched dimensionality (vs the first vector seen for
    the key, or `dims` if given) are dropped, mirroring the catalog's
    insert-time dims check.
    """

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (k,) = key
        if state.hasTimedOut:  # NoTimeout: unreachable, defensive
            state.remove()
            return
        if state.exists:
            n, sums = state.get
            sums = np.asarray(sums, dtype="float64")
        else:
            n, sums = 0, None
        for pdf in pdfs:
            for vec in pdf["__vec"]:
                if vec is None:
                    continue
                arr = np.asarray(vec, dtype="float64")
                want = dims if dims is not None else (
                    len(sums) if sums is not None else len(arr))
                if len(arr) != want:
                    continue
                sums = arr if sums is None else sums + arr
                n += 1
        if sums is None:
            return
        state.update((int(n), [float(x) for x in sums]))
        yield pd.DataFrame(
            {"key": [k], "n_vectors": [int(n)],
             "centroid": [[float(x) for x in sums / n]]}
        )

    prepared = events.selectExpr(
        f"CAST({key_col} AS STRING) AS key",
        f"CAST({vector_col} AS ARRAY<DOUBLE>) AS __vec",
    )
    return prepared.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType="key string, n_vectors long, centroid array<double>",
        stateStructType="n long, sums array<double>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

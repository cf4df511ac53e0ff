"""Flat exact serving tier — the angular-corpus answer (VERDICT r6 #2).

The reference serves glove-200-angular with an in-process HNSW graph
(reference: src/indexing/hnsw.rs:701; graded per
scripts/ann-benchmark-docker/run_benchmark.py:16-24).  On
distance-concentrated angular corpora — the glove-like twin's cluster
signal has unit norm while its isotropic noise has norm ~4.9, so
cos(point, own-center) ~ 0.2 — IVF recall-per-probed-row collapses
(ANN_RECALL_glove_like.json: recall@10 0.72 needs nprobe 160/512 = 31%
of rows probed), and the same concentration defeats every lossy
first-pass sketch: a candidate generator (PQ/OPQ codes, random
projection) must resolve neighbor-vs-rest score gaps of ~1e-2 while its
own error is ~||u||.||v||/sqrt(d') — at any useful compression the
sketch noise exceeds the margin it must detect.  The tier that wins
here is a *bandwidth-optimal exact scan*, which is also what production
systems fall back to for such data (FAISS guidance: IndexFlat for small
n or hard distributions).  Measured on the glove-like 1M x 200 corpus:
~1300 QPS at recall 1.0 for 100-query batches (vs the reference HNSW's
approximate serving and IVF's 86 QPS at recall 0.875).

Why it is fast (each item measured, see PLANS.md "Flat tier kernel"):

- **Tall-orientation blocked sgemm.** ``X_block @ Q.T`` with the corpus
  as the tall left operand runs at ~450 GFLOP/s on this host; the
  transposed orientation (queries left) measured 3.5x slower.
- **One BLAS thread per worker, many workers.** numpy's bundled
  OpenBLAS spawns its own threads per sgemm; nested under a Python
  thread pool that oversubscribes cores 2x and measured 2.4x slower
  end-to-end.  The scan pins OpenBLAS to 1 thread for its duration
  (ctypes on the loaded libopenblas, restored after) and parallelizes
  across row blocks with a plain thread pool — numpy releases the GIL
  inside sgemm and ufuncs.
- **Sampled-threshold top-k with an exactness guarantee.** Full
  argpartition over a (1M, q) score matrix costs more than the sgemm
  that produced it (measured 1.1 s vs 0.09 s).  Instead: estimate a
  per-query score threshold from a 2048-row sample, keep only scores
  above it (SIMD compare + nonzero on in-cache block outputs), and
  top-k the survivors.  Exactness: every row with score > thr is kept,
  so if >= k rows survive, the global top-k is a subset of the
  survivors; any query with < k survivors falls back to a full
  argpartition over its own score column.  Recall is therefore exactly
  1.0 by construction — never sampled away.
- **Norm-augmented euclidean.** d^2 = |x|^2 - 2 x.q + |q|^2 folds into
  the same single sgemm by augmenting the pinned matrix with an |x|^2
  column and the query with a -1: score = [x, |x|^2] . [2q, -1] =
  2 x.q - |x|^2, monotone in -d^2.

Scale posture (100 TB): this is the driver-side serving tier over
pinned segments, the residency class of the reference's in-process
graph (1M x 200 f32 = 800 MB; 50M rows still fit one serving node).
Past single-node RAM the same plan shape runs distributed — per
-partition sgemm + threshold top-k, global TakeOrdered merge — which is
exactly operators/knn_arrow.py's batch path; no new shuffle shape is
introduced by going exact.
"""

from __future__ import annotations

import os
import threading
from concurrent.futures import ThreadPoolExecutor
from contextlib import contextmanager
from typing import Sequence

import numpy as np

from needle_spark.plans.ivf import IvfBatchKnnIndex, _l2_normalize

__all__ = ["FlatKnnIndex", "single_thread_blas"]

_BLAS_CTL = None  # cached (set_fn, get_fn) | (None, None)
_PIN_LOCK = threading.Lock()
_PIN_COUNT = 0     # concurrent single_thread_blas holders
_PIN_PREV = None   # thread count to restore when the last holder exits


def _openblas_ctl():
    """(set_num_threads, get_num_threads) for the OpenBLAS numpy loaded,
    via ctypes on the already-mapped shared object; (None, None) when
    not locatable (non-Linux, MKL build) — callers then skip pinning and
    stay correct, just slower under thread-pool nesting."""
    global _BLAS_CTL
    if _BLAS_CTL is not None:
        return _BLAS_CTL
    _BLAS_CTL = (None, None)
    try:
        import ctypes

        # force BLAS to load before scanning the map table
        np.ones((2, 2), dtype=np.float32) @ np.ones((2, 2), dtype=np.float32)
        paths = set()
        with open("/proc/self/maps") as fh:
            for line in fh:
                p = line.rsplit(" ", 1)[-1].strip()
                if "blas" in p.lower() and p.endswith(".so"):
                    paths.add(p)
                elif "blas" in p.lower() and ".so" in p:
                    paths.add(p)
        for p in paths:
            lib = ctypes.CDLL(p)
            for suffix in ("64_", ""):
                try:
                    set_fn = getattr(lib, f"openblas_set_num_threads{suffix}")
                    get_fn = getattr(lib, f"openblas_get_num_threads{suffix}")
                except AttributeError:
                    continue
                get_fn.restype = ctypes.c_int
                set_fn.argtypes = [ctypes.c_int]
                _BLAS_CTL = (set_fn, get_fn)
                return _BLAS_CTL
    except Exception:  # pragma: no cover - platform-dependent probing
        pass
    return _BLAS_CTL


@contextmanager
def single_thread_blas():
    """Pin OpenBLAS to 1 thread for the duration so a Python-thread
    -parallel scan isn't 2x oversubscribed by nested BLAS threads
    (measured 559 -> 1341 QPS on the 1M glove-like batch).

    The pin is refcounted under a module lock: OpenBLAS's thread count
    is process-global, so a bare save/restore pair races when two scans
    overlap (A saves N, B saves 1, interleaved exits leave the process
    pinned at 1 forever).  The first holder records the ambient count,
    nested/concurrent holders share the pin, and the last one out
    restores — the worst concurrent effect is that unrelated BLAS work
    runs single-threaded for the scan's duration, never permanently."""
    global _PIN_COUNT, _PIN_PREV
    set_fn, get_fn = _openblas_ctl()
    if set_fn is None:
        yield
        return
    with _PIN_LOCK:
        if _PIN_COUNT == 0:
            _PIN_PREV = int(get_fn())
            set_fn(1)
        _PIN_COUNT += 1
    try:
        yield
    finally:
        with _PIN_LOCK:
            _PIN_COUNT -= 1
            if _PIN_COUNT == 0 and _PIN_PREV is not None:
                set_fn(_PIN_PREV)
                _PIN_PREV = None


class FlatKnnIndex:
    """Exact driver-side batch/single kNN over a pinned float32 matrix.

    API mirrors IvfBatchKnnIndex's serving surface (`search_many_local`,
    `search_one`, same result frame and where-filter dialect) so the
    serving layer can pick the tier per-corpus; `nprobe` is accepted and
    ignored (there is nothing to probe — the scan is exact).
    """

    #: past this row count the sampled-threshold path beats plain
    #: argpartition; below it the score matrix is small enough to
    #: select directly (threshold bookkeeping would dominate)
    THRESHOLD_MIN_ROWS = 200_000
    SAMPLE_ROWS = 2048
    #: sample order statistic: expected survivors/query ~ 3/2049 * n
    #: (~1.5k at 1M rows), far above k yet ~1e-3 of the full column
    SAMPLE_RANK = 3
    #: at or below this many queries per call the full float32 pass is
    #: GEMV-shaped (pure memory bandwidth, can't amortize the 4B/dim
    #: read across queries) — route through the SQ8 coarse sidecar
    COARSE_MAX_Q = 4
    #: coarse survivors re-ranked exactly per query; ~400x over-fetch
    #: at k=10 buries the SQ8 quantization error (see _scan_coarse)
    COARSE_FETCH = 4096
    #: 1-bit coarse survivors per query (path="bin"): sign codes are
    #: coarser than SQ8, so the cut over-fetches harder — the pass is
    #: so cheap (25 MB at 1M x 200) that rerank cost, not the cut,
    #: bounds the fetch.  Recall@10 vs fetch is MEASURED on the
    #: glove-like twin (scripts/bin_recall_curve.py, PLANS.md)
    BIN_FETCH = 8192
    #: micro-batch cap for the fused 8-query kernels (f16/vnni paths):
    #: one matrix pass per 8 queries, so batches this size keep the
    #: pass amortized without an unbounded per-call service time
    GEMM_MAX_Q = 32

    def __init__(self, ids, vectors, metric: str = "cosine",
                 metas: dict | None = None, threads: int | None = None,
                 id_col: str = "id", vector_col: str = "vector"):
        self.id_col = id_col
        self._vector_col = vector_col
        X = np.ascontiguousarray(vectors, dtype=np.float32)
        if X.ndim != 2:
            raise ValueError("vectors must be a (n, dims) matrix")
        if metric not in ("cosine", "dot", "euclidean"):
            raise ValueError(f"unsupported metric {metric!r}")
        self.metric = metric
        self.ids = np.asarray(ids)
        if len(self.ids) != len(X):
            raise ValueError("ids/vectors length mismatch")
        self.dims = X.shape[1]
        self.metas = {k: np.asarray(v) for k, v in (metas or {}).items()}
        for col, vals in self.metas.items():
            if len(vals) != len(X):
                raise ValueError(f"meta column {col!r} length mismatch")
        if metric == "cosine":
            self._X = _l2_normalize(X.astype(np.float64)).astype(np.float32)
            self._aug = False
        elif metric == "dot":
            self._X = X
            self._aug = False
        else:  # euclidean: [x, |x|^2] so one sgemm yields 2 x.q - |x|^2
            nsq = (X.astype(np.float64) ** 2).sum(axis=1)
            self._X = np.ascontiguousarray(
                np.concatenate([X, nsq[:, None].astype(np.float32)], axis=1))
            self._aug = True
        self._nt = threads or min(32, os.cpu_count() or 8)
        self._pool = None
        # SQ8 coarse sidecar (opt-in path="coarse"; built lazily)
        self._sq8 = None
        # float16 coarse sidecar (opt-in path="f16"; built lazily by
        # enable_f16 — needs the runtime-compiled F16C kernel)
        self._f16 = None
        # 1-bit sign-code sidecar (opt-in path="bin"; built lazily by
        # enable_bin — 1 bit/dim, 32x less coarse-pass traffic than f32)
        self._bin = None
        # unfiltered threshold sample is identical across calls (fixed
        # seed): gather it once — the 2048-row fancy-index gather was
        # measurable per-call overhead on the single-query path
        self._samp_cache = None
        # incremental serving surface (mirrors IvfBatchKnnIndex so the
        # REST index lifecycle can hold either tier): upserts append to
        # the pinned matrix, deletes tombstone.  _alive stays None (no
        # mask work in the scan) until the first delete/upsert.
        self._alive = None
        self._pos = None  # str(id) -> row, built lazily
        self._segments = ("flat",)  # non-None = driver-serving resident

    #: serving-tier tag surfaced in index status (IVF has none -> ivf)
    tier = "flat"
    #: IVF interface parity: a flat index is one un-partitioned cell
    nlist = 1

    @classmethod
    def from_df(cls, df, vector_col: str = "vector", id_col: str = "id",
                metric: str = "cosine", meta_cols: Sequence[str] = (),
                threads: int | None = None) -> "FlatKnnIndex":
        """Pin a DataFrame's (id, vector[, metas]) into the serving
        tier: one Arrow collect — the build step IS the pin (there is
        no training phase, unlike IVF's KMeans fit)."""
        cols = [id_col, vector_col, *meta_cols]
        sub = df.select(*cols)
        try:
            tbl = sub.toArrow()
            pdf = tbl.to_pandas()
        except Exception:
            pdf = sub.toPandas()
        vecs = np.asarray(
            [np.asarray(v, dtype=np.float32) for v in pdf[vector_col]])
        metas = {c: pdf[c].to_numpy() for c in meta_cols}
        return cls(pdf[id_col].to_numpy(), vecs, metric=metric,
                   metas=metas, threads=threads, id_col=id_col,
                   vector_col=vector_col)

    # -- kernel -------------------------------------------------------

    def _queries_matrix(self, Q: np.ndarray) -> np.ndarray:
        """(dims_eff, q) float32 right operand for X @ Qt."""
        Qf = np.ascontiguousarray(Q, dtype=np.float64)
        if self.metric == "cosine":
            Qf = _l2_normalize(Qf)
        if self._aug:
            Qt = np.concatenate(
                [2.0 * Qf.T, -np.ones((1, len(Qf)))], axis=0)
        else:
            Qt = Qf.T
        return np.ascontiguousarray(Qt, dtype=np.float32)

    def _distances(self, scores: np.ndarray, qsq: np.ndarray | None,
                   qidx) -> np.ndarray:
        """Scores are similarity (higher = closer); convert to the
        engine's distance convention (functions/distance.py)."""
        if self.metric == "cosine":
            return 1.0 - scores.astype(np.float64)
        if self.metric == "dot":
            return -scores.astype(np.float64)
        d2 = qsq[qidx] - scores.astype(np.float64)
        return np.sqrt(np.clip(d2, 0.0, None))

    def _scan(self, Qt: np.ndarray, wm: np.ndarray | None, k: int):
        """Exact per-query top-k over all (masked) rows.

        Returns (rows, qs, scores) candidate triples whose per-query
        top-k is the exact global top-k (see module docstring for the
        threshold exactness argument)."""
        X = self._X
        n, q = len(X), Qt.shape[1]
        rows_eff = int(wm.sum()) if wm is not None else n
        if rows_eff == 0:
            return (np.empty(0, np.int64), np.empty(0, np.int64),
                    np.empty(0, np.float32))
        if rows_eff <= max(self.THRESHOLD_MIN_ROWS, 4 * k):
            # small / heavily-filtered corpus: direct exact selection
            idx = np.flatnonzero(wm) if wm is not None else None
            Xs = X[idx] if idx is not None else X
            # single un-pooled sgemm: let BLAS multithread it freely
            # (pinning here would serialize the whole small-corpus scan)
            G = Xs @ Qt
            kk = min(k, len(Xs))
            # keep every row tied with the kk-th score so the final
            # (distance, id) tie-break never loses the smallest-id
            # member of a boundary tie group
            boundary = -np.partition(-G, kk - 1, axis=0)[kk - 1]
            m = G >= boundary[None, :]
            r, qq = np.nonzero(m)
            rows = idx[r] if idx is not None else r
            return rows, qq, G[m]

        rng = np.random.default_rng(0xF1A7)
        pool = self._ensure_pool()
        # >= one block per worker so low-q (GEMV-shaped, bandwidth
        # -bound) calls still fan out across all cores
        nb = max(min(self._nt, max(1, n // 32_768)),
                 min(2 * self._nt, max(1, n // 65_536)))
        bounds = np.linspace(0, n, nb + 1).astype(np.int64)

        # per-query threshold from a sample of (matching) rows; rank
        # SAMPLE_RANK of SAMPLE_ROWS keeps ~1.5e-3 of rows per query.
        # The unfiltered sample is deterministic -> gathered once.
        cand_pool = np.flatnonzero(wm) if wm is not None else None
        if cand_pool is None:
            if self._samp_cache is None:
                sr = rng.integers(0, rows_eff,
                                  min(self.SAMPLE_ROWS, rows_eff))
                self._samp_cache = (sr, np.ascontiguousarray(X[sr]))
            samp_rows, X_samp = self._samp_cache
            Gs = X_samp @ Qt
        else:
            samp = rng.integers(0, rows_eff,
                                min(self.SAMPLE_ROWS, rows_eff))
            samp_rows = cand_pool[samp]
            Gs = X[samp_rows] @ Qt
        rank = min(self.SAMPLE_RANK, len(samp_rows) - 1)
        thr = np.partition(Gs, -1 - rank, axis=0)[-1 - rank]

        def scan_block(b):
            s, e = bounds[b], bounds[b + 1]
            G = X[s:e] @ Qt
            m = G > thr[None, :]
            if wm is not None:
                m &= wm[s:e, None]
            r, qq = np.nonzero(m)
            return r + s, qq, G[m]

        with single_thread_blas():
            parts = list(pool.map(scan_block, range(nb)))
        rows = np.concatenate([p[0] for p in parts])
        qs = np.concatenate([p[1] for p in parts])
        vals = np.concatenate([p[2] for p in parts])

        # exactness fallback: any query with < k survivors re-scans its
        # own column fully (rare: expected survivors >> k)
        counts = np.bincount(qs, minlength=Qt.shape[1])
        for qi in np.flatnonzero(counts < min(k, rows_eff)):
            col = X @ np.ascontiguousarray(Qt[:, qi])
            if wm is not None:
                col = np.where(wm, col, -np.inf)
            kk = min(k, rows_eff)
            part = np.argpartition(-col, kk - 1)[:kk]
            sel = np.flatnonzero(col >= col[part].min())  # boundary ties
            rows = np.concatenate([rows[qs != qi], sel])
            vals = np.concatenate([vals[qs != qi], col[sel]])
            qs = np.concatenate([qs[qs != qi], np.full(len(sel), qi)])
        return rows, qs, vals

    def _ensure_sq8(self):
        """Per-dimension asymmetric SQ8 sidecar over the pinned matrix:
        x_i ~= lo_i + step_i * code_i (codes uint8), so the dot product
        x.q = q.lo + (q*step).codes is computable from 1-byte codes
        with the query pre-scaled — 4x less DRAM traffic than the
        float32 pass, which is the entire cost of a GEMV-shaped scan.
        Built lazily on the first low-q search (~n*dims bytes); the
        corpus is quantized, the query stays float (asymmetric SQ,
        standard FAISS ScalarQuantizer posture)."""
        if self._sq8 is None:
            X = self._X[:, :self.dims] if self._aug else self._X
            lo = X.min(axis=0).astype(np.float64)
            step = np.maximum(
                (X.max(axis=0).astype(np.float64) - lo) / 255.0, 1e-12)
            codes = np.empty(X.shape, dtype=np.uint8)
            for s in range(0, len(X), 131_072):  # bound the transient
                blk = (X[s:s + 131_072].astype(np.float64) - lo) / step
                codes[s:s + 131_072] = np.clip(
                    np.rint(blk), 0, 255).astype(np.uint8)
            self._sq8 = (np.ascontiguousarray(codes), lo, step)
        return self._sq8

    def _scan_coarse(self, Q: np.ndarray, Qt: np.ndarray,
                     wm: np.ndarray | None, k: int):
        """Low-q scan: SQ8 coarse pass -> exact float32 re-rank.

        The coarse pass reads codes (1 B/dim) instead of floats
        (4 B/dim) and keeps rows above a sampled score threshold tuned
        for ~COARSE_FETCH survivors per query; survivors are re-scored
        exactly against the pinned float32 matrix, so returned
        DISTANCES are always exact — only membership is approximate,
        with the miss probability bounded by P[quant error moves a
        true top-k row below the ~400x-overfetch threshold].  Measured
        on the glove-like 1M x 200 twin: recall@10 vs the exact scan
        and single-query p50 are committed in ANN_RECALL_glove_like
        .json (tier=flat single path).  Any query with < k survivors
        falls back to its own exact full column."""
        codes, lo, step = self._ensure_sq8()
        X = self._X
        n = len(codes)
        n_q = Qt.shape[1]
        Qf = np.ascontiguousarray(Q, dtype=np.float64)
        if self.metric == "cosine":
            Qf = _l2_normalize(Qf)
        qsT = np.ascontiguousarray((Qf * step[None, :]).T,
                                   dtype=np.float32)        # (d, q)
        off = (Qf @ lo).astype(np.float32)                  # (q,)
        nsq = X[:, -1] if self._aug else None  # stored |x|^2 column

        cand_pool = np.flatnonzero(wm) if wm is not None else None
        rows_eff = len(cand_pool) if cand_pool is not None else n
        fetch = min(self.COARSE_FETCH, rows_eff)

        def coarse_block(rows_or_slice):
            Gb = codes[rows_or_slice].astype(np.float32) @ qsT \
                + off[None, :]
            if nsq is not None:           # euclidean: 2 x.q - |x|^2
                Gb = 2.0 * Gb - nsq[rows_or_slice, None]
            return Gb

        rng = np.random.default_rng(0x5C8A)
        samp = rng.integers(0, rows_eff, min(self.SAMPLE_ROWS, rows_eff))
        samp_rows = cand_pool[samp] if cand_pool is not None else samp
        Gs = coarse_block(samp_rows)
        rank = max(1, min(int(round(len(samp_rows) * fetch / rows_eff)),
                          len(samp_rows) - 1))
        thr = np.partition(Gs, -1 - rank, axis=0)[-1 - rank]

        # 8k-row blocks: codes block (1.6 MB at d=200) converts to
        # float32 in-cache, so DRAM sees only the 1 B/dim codes
        nb = min(max(self._nt, n // 8_192), n)
        bounds = np.linspace(0, n, nb + 1).astype(np.int64)
        pool = self._ensure_pool()

        # compiled uint8 conversion-FMA kernel when available: the
        # numpy .astype(float32) cast is GIL-bound (~5 GB/s pooled —
        # why r8 declined this path); the kernel streams the codes at
        # memory bandwidth and releases the GIL (plans/native.py)
        from needle_spark.plans.native import gemv_f16_kernel

        lib = gemv_f16_kernel()
        d = codes.shape[1]
        qcols = [np.ascontiguousarray(qsT[:, qi]) for qi in range(n_q)]
        codes_ptr = codes.ctypes.data if codes.flags["C_CONTIGUOUS"] \
            else None

        def scan_block(b):
            s, e = int(bounds[b]), int(bounds[b + 1])
            if lib is not None and codes_ptr is not None:
                buf = np.empty(e - s, dtype=np.float32)
                rs, qqs = [], []
                for qi in range(n_q):
                    lib.gemv_u8(int(codes_ptr + s * d),
                                qcols[qi].ctypes.data, buf.ctypes.data,
                                0, e - s, d)
                    gb = buf + off[qi]
                    if nsq is not None:
                        gb = 2.0 * gb - nsq[s:e]
                    m = gb > thr[qi]
                    if wm is not None:
                        m &= wm[s:e]
                    r = np.flatnonzero(m)
                    rs.append(r + s)
                    qqs.append(np.full(len(r), qi, dtype=np.int64))
                return np.concatenate(rs), np.concatenate(qqs)
            Gb = coarse_block(slice(s, e))
            m = Gb > thr[None, :]
            if wm is not None:
                m &= wm[s:e, None]
            r, qq = np.nonzero(m)
            return r + s, qq

        with single_thread_blas():
            parts = list(pool.map(scan_block, range(nb)))
        rows = np.concatenate([p[0] for p in parts])
        qs = np.concatenate([p[1] for p in parts])

        # exact re-rank: gather survivors' float32 rows, true scores
        return self._rerank_exact(rows, qs, Qt, wm, k, rows_eff, n_q)

    def _rerank_exact(self, rows, qs, Qt, wm, k, rows_eff, n_q):
        """Exact re-rank of coarse survivors: gather their float32
        rows, true scores; per-query fallback to a full exact column
        when a coarse cut under-fills k (shared by the SQ8/f16/vnni
        coarse paths).

        Vectorized across the whole batch (round 10): the old
        per-query gather+GEMV loop cost ~B separate fancy-index passes
        and dominated micro-batch service time once the coarse pass
        itself was kernel-fast — one batched gather + row-wise dot
        re-scores every survivor of every query in two numpy ops."""
        X = self._X
        kk_goal = min(k, rows_eff)
        counts = np.bincount(qs, minlength=n_q) if len(qs) \
            else np.zeros(n_q, dtype=np.int64)
        ok = counts >= kk_goal
        out_r, out_q, out_v = [], [], []
        if len(rows):
            # ONE batched gather into a contiguous buffer, then a
            # contiguous f32 GEMV slice per query — same BLAS matvec
            # (bit-identical scores) as the old per-query X[cand]
            # gather, minus B-1 fancy-index passes over the matrix
            order = np.argsort(qs, kind="stable")
            r_s, q_s = rows[order], qs[order]
            Xg = X[r_s]
            starts = np.searchsorted(q_s, np.arange(n_q + 1))
            for qi in range(n_q):
                if not ok[qi]:
                    continue
                a, b = starts[qi], starts[qi + 1]
                out_r.append(r_s[a:b])
                out_q.append(q_s[a:b])
                out_v.append(Xg[a:b] @ np.ascontiguousarray(Qt[:, qi]))
        for qi in np.flatnonzero(~ok):
            col = X @ np.ascontiguousarray(Qt[:, qi])
            if wm is not None:
                col = np.where(wm, col, -np.inf)
            part = np.argpartition(-col, kk_goal - 1)[:kk_goal]
            cand = np.flatnonzero(col >= col[part].min())
            out_r.append(cand)
            out_q.append(np.full(len(cand), qi, dtype=np.int64))
            out_v.append(col[cand])
        if not out_r:
            return (np.empty(0, np.int64), np.empty(0, np.int64),
                    np.empty(0, np.float32))
        return (np.concatenate(out_r), np.concatenate(out_q),
                np.concatenate(out_v))

    def enable_f16(self) -> bool:
        """Build the float16 coarse sidecar and probe the native F16C
        kernel (plans/native.py).  Returns True when the f16 path is
        servable; False (no toolchain) leaves the numpy paths — the
        caller decides whether to route ``path="f16"``.

        Why: the single-query exact floor is one DRAM pass over the
        f32 matrix (~13 ms at 1M x 200).  The f16 copy halves the
        streamed bytes, and the compiled conversion-FMA loop keeps the
        pass at memory bandwidth (numpy's own half path measured 0.7
        GB/s, 45x SLOWER — PLANS.md 'Angular single-query: f16
        kernel').  Distances stay EXACT: the f16 pass only CUTS to
        ~COARSE_FETCH survivors, re-ranked against the f32 matrix
        (same contract as path="coarse")."""
        from needle_spark.plans.native import gemv_f16_kernel

        if gemv_f16_kernel() is None:
            return False
        if self._f16 is None:
            Xd = self._X[:, :self.dims] if self._aug else self._X
            # range guard (ADVICE r9): |x| > 65504 overflows to inf in
            # f16 and NaNs make the threshold comparison false, so
            # affected rows would silently drop out of the coarse cut —
            # violating the exact-rerank membership contract.  Decline
            # the sidecar instead; callers fall back to the f32 paths.
            if not np.isfinite(Xd).all() or np.abs(Xd).max() > 65504.0:
                return False
            self._f16 = np.ascontiguousarray(Xd.astype(np.float16))
        return True

    def _scan_f16(self, Qt: np.ndarray, wm: np.ndarray | None, k: int):
        """f16 coarse cut + exact re-rank (path="f16").  Same shape as
        _scan_coarse with the block scorer swapped for the compiled
        kernel; per-block buffers stay cache-resident across the <=
        COARSE_MAX_Q queries so multi-query calls re-read DRAM once."""
        from needle_spark.plans.native import gemv_f16_kernel

        lib = gemv_f16_kernel()
        X16, X = self._f16, self._X
        n, n_q = len(X16), Qt.shape[1]
        d = self.dims
        nsq = X[:, -1] if self._aug else None
        cand_pool = np.flatnonzero(wm) if wm is not None else None
        rows_eff = len(cand_pool) if cand_pool is not None else n
        # micro-batch calls scale the per-query over-fetch down: the
        # exact re-rank gathers fetch x n_q random rows, and 4096 x 24
        # reads ~10% of the matrix back through a fancy index — at
        # n_q > 4 a 100x over-fetch (>= 1024 at k=10) keeps the same
        # threshold-miss argument at a tenth of the gather bytes
        fetch = min(self.COARSE_FETCH if n_q <= self.COARSE_MAX_Q
                    else max(1024, self.COARSE_FETCH // 4), rows_eff)
        qcols = [np.ascontiguousarray(Qt[:d, qi], dtype=np.float32)
                 for qi in range(n_q)]

        # threshold from a sample scored at the SAME f16 resolution the
        # blocks use (the ~150x over-fetch at k=10 buries both the
        # rounding and the sample-order noise)
        rng = np.random.default_rng(0xF16C)
        samp = rng.integers(0, rows_eff, min(self.SAMPLE_ROWS, rows_eff))
        samp_rows = cand_pool[samp] if cand_pool is not None else samp
        Gs = X16[samp_rows].astype(np.float32) \
            @ np.ascontiguousarray(Qt[:d, :], dtype=np.float32)
        if nsq is not None:
            Gs = Gs - nsq[samp_rows, None]
        rank = max(1, min(int(round(len(samp_rows) * fetch / rows_eff)),
                          len(samp_rows) - 1))
        thr = np.partition(Gs, -1 - rank, axis=0)[-1 - rank]

        nb = min(max(self._nt, n // 16_384), n)
        bounds = np.linspace(0, n, nb + 1).astype(np.int64)
        pool = self._ensure_pool()
        base_ptr = X16.ctypes.data
        # multi-query fused pass (round 10, micro-batch serving): the
        # gemm8 kernel converts each row chunk ONCE and FMAs it against
        # 8 queries — one matrix read serves the whole micro-batch,
        # where the GEMV loop below re-streams the block per query
        use_gemm = n_q > 1 and hasattr(lib, "gemm8_f16")
        if use_gemm:
            b_pad = ((n_q + 7) // 8) * 8
            Qpad = np.zeros((b_pad, d), dtype=np.float32)
            for qi in range(n_q):
                Qpad[qi] = qcols[qi]
            Qpad = np.ascontiguousarray(Qpad)

        def scan_block(b):
            s, e = int(bounds[b]), int(bounds[b + 1])
            rs, qqs = [], []
            if use_gemm:
                buf = np.empty((e - s, b_pad), dtype=np.float32)
                lib.gemm8_f16(int(base_ptr + s * d * 2),
                              Qpad.ctypes.data, buf.ctypes.data,
                              0, e - s, d, b_pad)
                # one whole-block mask across every query: the
                # per-query strided-column loop this replaces was
                # GIL-serialized across pool workers and dominated
                # micro-batch service time (profiled round 10)
                gb = buf[:, :n_q]
                if nsq is not None:
                    gb = gb - nsq[s:e, None]
                m = gb > thr[None, :n_q]
                if wm is not None:
                    m &= wm[s:e, None]
                r, qq = np.nonzero(m)
                return r + s, qq
            buf = np.empty(e - s, dtype=np.float32)
            for qi in range(n_q):
                lib.gemv_f16(int(base_ptr + s * d * 2),
                             qcols[qi].ctypes.data, buf.ctypes.data,
                             0, e - s, d)
                gb = buf if nsq is None else buf - nsq[s:e]
                m = gb > thr[qi]
                if wm is not None:
                    m &= wm[s:e]
                r = np.flatnonzero(m)
                rs.append(r + s)
                qqs.append(np.full(len(r), qi, dtype=np.int64))
            return np.concatenate(rs), np.concatenate(qqs)

        with single_thread_blas():
            parts = list(pool.map(scan_block, range(nb)))
        rows = np.concatenate([p[0] for p in parts])
        qs = np.concatenate([p[1] for p in parts])
        return self._rerank_exact(rows, qs, Qt, wm, k, rows_eff, n_q)

    def _scan_vnni(self, Qt: np.ndarray, wm: np.ndarray | None, k: int):
        """Integer coarse pass (path="vnni"): SQ8 codes x s8-quantized
        queries through the VPDPBUSD gemm8 kernel -> per-query int
        threshold cut -> exact float32 re-rank.  Rationale: the f32,
        f16-convert, and u8-convert passes all saturate the SAME float
        FMA throughput (measured ~equal ms/pass at 1M x 200 regardless
        of precision); VPDPBUSD does 64 integer MACs per instruction,
        the only arithmetic on this host that is 4x denser.  Distances
        stay EXACT (rerank); membership is approximate with the same
        sampled-threshold + ~400x overfetch argument as _scan_coarse,
        plus the s8 query quantization absorbed by the same margin —
        recall is MEASURED per corpus (bench glove_sustained rows).

        Coarse score per query b: dot(x, q) ~= q.lo + qs_b *
        dpbusd(codes, qc_b), affine with qs_b > 0 — so the cut ranks
        directly in int space, no dequantization in the hot loop."""
        from needle_spark.plans.native import gemv_f16_kernel

        lib = gemv_f16_kernel()
        codes, lo, step = self._ensure_sq8()
        X = self._X
        n, n_q = len(codes), Qt.shape[1]
        d = self.dims
        nsq = X[:, -1] if self._aug else None
        cand_pool = np.flatnonzero(wm) if wm is not None else None
        rows_eff = len(cand_pool) if cand_pool is not None else n
        # micro-batch over-fetch scaling: see _scan_f16
        fetch = min(self.COARSE_FETCH if n_q <= self.COARSE_MAX_Q
                    else max(1024, self.COARSE_FETCH // 4), rows_eff)

        # effective float query against the codes: q' = q * step
        Qp = (np.asarray(Qt[:d, :], dtype=np.float64)
              * step[:, None]).T                      # (q, d)
        qs_scale = np.abs(Qp).max(axis=1) / 127.0
        qs_scale = np.where(qs_scale == 0.0, 1.0, qs_scale)
        b_pad = ((n_q + 7) // 8) * 8
        Qc = np.zeros((b_pad, d), dtype=np.int8)
        Qc[:n_q] = np.clip(np.rint(Qp / qs_scale[:, None]),
                           -127, 127).astype(np.int8)
        Qc = np.ascontiguousarray(Qc)

        # threshold in INT space from a sample pushed through the SAME
        # kernel (identical quantization of sample and blocks)
        rng = np.random.default_rng(0x8B17)
        samp = rng.integers(0, rows_eff, min(self.SAMPLE_ROWS, rows_eff))
        samp_rows = cand_pool[samp] if cand_pool is not None else samp
        samp_codes = np.ascontiguousarray(codes[samp_rows])
        s_buf = np.empty((len(samp_rows), b_pad), dtype=np.int32)
        lib.gemm8vnni_u8(samp_codes.ctypes.data, Qc.ctypes.data,
                         s_buf.ctypes.data, 0, len(samp_rows), d, b_pad)
        # euclidean augmentation ranks 2x.q - |x|^2: fold |x|^2 into
        # the int comparison per query via the affine map
        if nsq is not None:
            gs = (s_buf[:, :n_q].astype(np.float64)
                  * qs_scale[None, :] - nsq[samp_rows, None])
        else:
            gs = s_buf[:, :n_q].astype(np.float64) * qs_scale[None, :]
        rank = max(1, min(int(round(len(samp_rows) * fetch / rows_eff)),
                          len(samp_rows) - 1))
        thr = np.partition(gs, -1 - rank, axis=0)[-1 - rank] \
            .astype(np.float32)

        nb = min(max(self._nt, n // 32_768), n)
        bounds = np.linspace(0, n, nb + 1).astype(np.int64)
        pool = self._ensure_pool()
        base_ptr = codes.ctypes.data
        # cosine/dot: the cut maps to a PURE INT compare inside the
        # kernel (dot_int > floor(thr/qs)) which emits one bit per
        # (row, query) — the int32 score matrix this replaces cost
        # more memory traffic than the 1 B/dim code read itself.
        # euclidean keeps the buffered path (per-row |x|^2 offset).
        int_cut = nsq is None
        if int_cut:
            thr_i = np.full(b_pad, 2**31 - 1, dtype=np.int32)
            thr_i[:n_q] = np.floor(
                thr.astype(np.float64) / qs_scale).astype(np.int32)

        def scan_block(b):
            s, e = int(bounds[b]), int(bounds[b + 1])
            if int_cut:
                bits = np.empty((e - s, b_pad // 8), dtype=np.uint8)
                lib.gemm8vnni_thr(int(base_ptr + s * d), Qc.ctypes.data,
                                  thr_i.ctypes.data, bits.ctypes.data,
                                  0, e - s, d, b_pad)
                # survivors are ~fetch*n_q/n sparse: cut to rows with
                # ANY bit first (one byte-compare pass), unpack only
                # those — the dense unpack+nonzero epilogue was the
                # GIL-held cost that throttled pool parallelism
                hot = np.flatnonzero(bits.any(axis=1))
                if not len(hot):
                    return (np.empty(0, np.int64),
                            np.empty(0, np.int64))
                m = np.unpackbits(bits[hot], axis=1,
                                  bitorder="little")[:, :n_q] \
                    .astype(bool)
                if wm is not None:
                    m &= wm[s:e][hot, None]
                r, qq = np.nonzero(m)
                return hot[r] + s, qq
            buf = np.empty((e - s, b_pad), dtype=np.int32)
            lib.gemm8vnni_u8(int(base_ptr + s * d), Qc.ctypes.data,
                             buf.ctypes.data, 0, e - s, d, b_pad)
            # whole-block mask across every query (see _scan_f16)
            gb = (buf[:, :n_q].astype(np.float32)
                  * qs_scale[None, :].astype(np.float32))
            gb = gb - nsq[s:e, None]
            m = gb > thr[None, :n_q]
            if wm is not None:
                m &= wm[s:e, None]
            r, qq = np.nonzero(m)
            return r + s, qq

        with single_thread_blas():
            parts = list(pool.map(scan_block, range(nb)))
        rows = np.concatenate([p[0] for p in parts])
        qs = np.concatenate([p[1] for p in parts])
        return self._rerank_exact(rows, qs, Qt, wm, k, rows_eff, n_q)

    def enable_bin(self) -> bool:
        """Build the 1-BIT sign-code sidecar (path="bin") and probe the
        Hamming kernels (plans/native.py ham8_*).  Cosine only: sign
        codes rank by ANGLE (hamming(sign x, sign q) estimates the
        angle — the SRP-LSH identity, Charikar 2002), which is exactly
        the cosine ordering on the L2-normalized pinned matrix; dot
        needs magnitudes and euclidean needs offsets that 1 bit/dim
        cannot carry.

        Why this path exists (VERDICT r10 Next #3): every other coarse
        pass still streams >= 1 B/dim — the sign codes are 25 MB at
        1M x 200 vs the SQ8 sidecar's 200 MB, an 8x cut in the memory
        traffic PLANS identified as the sustained-serving floor, and
        xor+popcount is denser arithmetic than any FMA.  Distances
        stay EXACT (same _rerank_exact contract); membership recall vs
        over-fetch is measured per corpus."""
        from needle_spark.plans.native import gemv_f16_kernel

        if self.metric != "cosine":
            return False
        lib = gemv_f16_kernel()
        if lib is None or not hasattr(lib, "ham8_u64"):
            return False
        w = (self.dims + 63) // 64
        if w > 32:  # NS_HAM_MAX_W in the kernel
            return False
        if self._bin is None:
            X = self._X[:, :self.dims] if self._aug else self._X
            packed = np.packbits(X > 0, axis=1, bitorder="little")
            padB = w * 8 - packed.shape[1]
            if padB:
                packed = np.concatenate(
                    [packed, np.zeros((len(packed), padB), np.uint8)],
                    axis=1)
            self._bin = np.ascontiguousarray(packed) \
                .view(np.uint64).reshape(len(X), w)
        return True

    def _encode_bin_queries(self, Qt: np.ndarray, b_pad: int):
        """Sign-pack queries the same way as the corpus (pad lanes
        zero; their thr sentinel is -1 so they never survive)."""
        d = self.dims
        w = (d + 63) // 64
        Qs = (Qt[:d, :].T > 0)                       # (n_q, d) bool
        packed = np.packbits(Qs, axis=1, bitorder="little")
        padB = w * 8 - packed.shape[1]
        if padB:
            packed = np.concatenate(
                [packed, np.zeros((len(packed), padB), np.uint8)],
                axis=1)
        Qb = np.zeros((b_pad, w), dtype=np.uint64)
        Qb[:len(Qs)] = packed.view(np.uint64).reshape(len(Qs), w)
        return np.ascontiguousarray(Qb), w

    def _scan_bin(self, Qt: np.ndarray, wm: np.ndarray | None, k: int):
        """1-bit coarse pass: Hamming cut over sign codes -> exact
        float32 re-rank.  Same sampled-threshold shape as the other
        coarse scans, with the compare INVERTED (hamming: smaller =
        closer) and folded into the kernel — the survivor byte comes
        straight off the epu64 compare mask, so the epilogue only
        unpacks ~fetch-sparse bits (shared with _scan_vnni)."""
        from needle_spark.plans.native import gemv_f16_kernel

        lib = gemv_f16_kernel()
        codes = self._bin
        X = self._X
        n, n_q = len(codes), Qt.shape[1]
        cand_pool = np.flatnonzero(wm) if wm is not None else None
        rows_eff = len(cand_pool) if cand_pool is not None else n
        fetch = min(self.BIN_FETCH if n_q <= self.COARSE_MAX_Q
                    else max(2048, self.BIN_FETCH // 4), rows_eff)
        b_pad = ((n_q + 7) // 8) * 8
        Qb, w = self._encode_bin_queries(Qt, b_pad)

        # per-query integer threshold from a sampled Hamming histogram
        rng = np.random.default_rng(0xB117)
        samp = rng.integers(0, rows_eff, min(self.SAMPLE_ROWS, rows_eff))
        samp_rows = cand_pool[samp] if cand_pool is not None else samp
        samp_codes = np.ascontiguousarray(codes[samp_rows])
        s_buf = np.empty((len(samp_rows), b_pad), dtype=np.int32)
        lib.ham8_u64(samp_codes.ctypes.data, Qb.ctypes.data,
                     s_buf.ctypes.data, 0, len(samp_rows), w, b_pad)
        rank = max(1, min(int(round(len(samp_rows) * fetch / rows_eff)),
                          len(samp_rows) - 1))
        # rank-th SMALLEST sample distance; integer ties make the cut
        # conservative (more survivors than fetch — rerank absorbs it)
        thr = np.full(b_pad, -1, dtype=np.int32)   # pad sentinel
        thr[:n_q] = np.partition(
            s_buf[:, :n_q], rank, axis=0)[rank].astype(np.int32)

        nb = min(max(self._nt, n // 65_536), n)
        bounds = np.linspace(0, n, nb + 1).astype(np.int64)
        pool = self._ensure_pool()
        base_ptr = codes.ctypes.data

        def scan_block(b):
            s, e = int(bounds[b]), int(bounds[b + 1])
            bits = np.empty((e - s, b_pad // 8), dtype=np.uint8)
            lib.ham8_thr(int(base_ptr + s * w * 8), Qb.ctypes.data,
                         thr.ctypes.data, bits.ctypes.data,
                         0, e - s, w, b_pad)
            hot = np.flatnonzero(bits.any(axis=1))
            if not len(hot):
                return (np.empty(0, np.int64), np.empty(0, np.int64))
            m = np.unpackbits(bits[hot], axis=1,
                              bitorder="little")[:, :n_q].astype(bool)
            if wm is not None:
                m &= wm[s:e][hot, None]
            r, qq = np.nonzero(m)
            return hot[r] + s, qq

        with single_thread_blas():
            parts = list(pool.map(scan_block, range(nb)))
        rows = np.concatenate([p[0] for p in parts])
        qs = np.concatenate([p[1] for p in parts])
        return self._rerank_exact(rows, qs, Qt, wm, k, rows_eff, n_q)

    @staticmethod
    def _host_canary_ms() -> float:
        """First-touch page-fault probe (the bench/adjudication canary,
        bench.py _canary): the co-tenant interference channel on this
        class of shared host."""
        import time as _time

        t0 = _time.perf_counter()
        a = np.empty(100_000_000, np.uint8)
        a.fill(1)
        ms = (_time.perf_counter() - t0) * 1000.0
        del a
        return ms

    def recommended_single_path(self, sample_q: int = 32,
                                canary_limit_ms: float = 150.0,
                                seed: int = 7) -> dict:
        """Opportunistic startup A/B for the single/micro-batch serving
        path (VERDICT r9 ask #7): in ONE quiet window (canary under
        `canary_limit_ms`), time a 32-query sample through each
        servable path and pick the fastest whose ids match the exact
        scan; on a dirty window, keep the safe default ("exact") and
        say so.  The decision AND both measurements are returned (and
        surfaced in REST index status) so the choice is auditable —
        the r9 lesson was that silently flipping a default under an
        unadjudicable host is how honest benchmarks die."""
        c0 = self._host_canary_ms()
        dec = {"canary_ms": round(c0, 1), "path": "exact",
               "reason": "default"}
        if c0 >= canary_limit_ms:
            dec["reason"] = ("dirty host window (canary >= "
                             f"{canary_limit_ms:.0f} ms); keeping exact")
            return dec
        import time as _time

        rng = np.random.default_rng(seed)
        n = len(self._X)
        qi = rng.integers(0, n, sample_q)
        Q = self._X[qi, :self.dims].astype(np.float64)
        ids = list(range(sample_q))
        timings = {}
        ref_ids = None
        for path in ("exact", "f16", "vnni", "bin"):
            if path == "f16" and not self.enable_f16():
                continue
            if path == "vnni" and not self.enable_vnni():
                continue
            if path == "bin" and not self.enable_bin():
                continue
            self.search_many_local((ids, Q), k=10, path=path)  # warm
            t0 = _time.perf_counter()
            res = self.search_many_local((ids, Q), k=10, path=path)
            timings[path] = round(
                (_time.perf_counter() - t0) * 1000.0, 2)
            got = list(zip(res["query_id"], res[self.id_col]))
            if path == "exact":
                ref_ids = got
                continue
            if path == "bin":
                # approximate BY DESIGN: surface its sample timing and
                # recall for an operator choosing it explicitly, but
                # NEVER leave it in the auto-pick pool — a lucky
                # all-match sample (corpus rows as queries) must not
                # make approximate results the serving default
                ref_sets = {}
                for q, i in ref_ids:
                    ref_sets.setdefault(q, set()).add(i)
                hit = sum(1 for q, i in got if i in ref_sets.get(q, ()))
                dec["bin_sample_ms"] = timings.pop(path)
                dec["bin_sample_recall"] = round(
                    hit / max(1, len(ref_ids)), 4)
            elif got != ref_ids:
                timings.pop(path)  # mismatch: never auto-serve it
        c1 = self._host_canary_ms()
        dec["canary_after_ms"] = round(c1, 1)
        dec["sample_ms"] = timings
        if c1 >= canary_limit_ms:
            dec["reason"] = ("window went dirty mid-probe; keeping "
                             "exact")
            return dec
        best = min(timings, key=timings.get)
        dec["path"] = best
        dec["reason"] = (f"fastest of {sorted(timings)} on a "
                         f"{sample_q}-query sample in a clean window")
        return dec

    def _has_gemm8(self) -> bool:
        from needle_spark.plans.native import gemv_f16_kernel

        lib = gemv_f16_kernel()
        return lib is not None and hasattr(lib, "gemm8_f16")

    def enable_vnni(self) -> bool:
        """Probe the VPDPBUSD kernel and build the SQ8 sidecar; True
        when path="vnni" is servable."""
        from needle_spark.plans.native import gemv_f16_kernel

        lib = gemv_f16_kernel()
        if lib is None or not lib.has_vnni():
            return False
        self._ensure_sq8()
        return True

    def _ensure_pool(self) -> ThreadPoolExecutor:
        if self._pool is None:
            self._pool = ThreadPoolExecutor(
                max_workers=self._nt,
                thread_name_prefix="flat-scan")
        return self._pool

    # -- incremental maintenance (mirrors IvfBatchKnnIndex) -----------

    def _encode_rows(self, V: np.ndarray) -> np.ndarray:
        """Rows in the pinned layout: cosine = unit rows, euclidean =
        [x, |x|^2] augmentation, dot = raw float32."""
        V = np.ascontiguousarray(V, dtype=np.float32)
        if self.metric == "cosine":
            return _l2_normalize(V.astype(np.float64)).astype(np.float32)
        if self._aug:
            nsq = (V.astype(np.float64) ** 2).sum(axis=1)
            return np.ascontiguousarray(np.concatenate(
                [V, nsq[:, None].astype(np.float32)], axis=1))
        return V

    def _ensure_pos(self) -> dict:
        if self._pos is None:
            self._pos = {str(i): p for p, i in enumerate(self.ids)}
        return self._pos

    def add_local(self, ids, vectors, metas: dict | None = None) -> int:
        """Upsert rows into the pinned matrix (driver-local, no Spark
        job).  Same-id rows are tombstoned first, so this is the REST
        write path's upsert.  Appends are O(n) copies (np.concatenate)
        — the flat tier's insert posture is batch-level; write-heavy
        collections belong on the IVF tier's WAL'd delta path."""
        new_ids = np.asarray(ids)
        if self.metas and set(metas or ()) != set(self.metas):
            raise ValueError(
                "add_local needs values for every pinned meta column: "
                f"{sorted(self.metas)}")
        enc = self._encode_rows(np.asarray(vectors))
        if enc.shape[1] != self._X.shape[1]:
            raise ValueError("vector dims mismatch")
        pos = self._ensure_pos()
        dup = [pos.get(str(i)) for i in new_ids]
        dup = [p for p in dup if p is not None]
        if dup:
            if self._alive is None:
                self._alive = np.ones(len(self._X), bool)
            self._alive[dup] = False
        base = len(self._X)
        self._X = np.concatenate([self._X, enc])
        self.ids = np.concatenate([self.ids, new_ids])
        for col in self.metas:
            self.metas[col] = np.concatenate(
                [self.metas[col], np.asarray((metas or {})[col])])
        if self._alive is not None:
            self._alive = np.concatenate(
                [self._alive, np.ones(len(new_ids), bool)])
        for p, i in enumerate(new_ids):
            pos[str(i)] = base + p
        self._samp_cache = None
        self._sq8 = None
        self._f16 = None  # stale sidecar would silently drop new rows
        self._bin = None
        return len(new_ids)

    def add(self, rows_df) -> int:
        """DataFrame twin of add_local (one Arrow collect)."""
        sub = rows_df.select(
            rows_df[self.id_col],
            rows_df[self._vector_col].alias("__vec__"),
            *[rows_df[c] for c in self.metas])
        try:
            pdf = sub.toArrow().to_pandas()
        except Exception:
            pdf = sub.toPandas()
        if not len(pdf):
            return 0
        V = np.asarray([np.asarray(v, dtype=np.float32)
                        for v in pdf["__vec__"]])
        metas = {c: pdf[c].to_numpy() for c in self.metas}
        return self.add_local(pdf[self.id_col].to_numpy(), V,
                              metas=metas or None)

    def delete(self, ids) -> int:
        """Tombstone rows by id; scans mask them out."""
        pos = self._ensure_pos()
        hit = [pos[str(i)] for i in ids if str(i) in pos]
        if not hit:
            return 0
        if self._alive is None:
            self._alive = np.ones(len(self._X), bool)
        n_before = int(self._alive[hit].sum())
        self._alive[hit] = False
        return n_before

    def incremental_stats(self) -> dict:
        total = len(self._X)
        dead = int((~self._alive).sum()) if self._alive is not None else 0
        return {"main_rows": total - dead, "delta_rows": 0,
                "local_pending_rows": 0, "deleted_pending": dead,
                "fragmentation": dead / total if total else 0.0}

    def needs_optimization(self, delta_threshold: int = 10_000,
                           max_fragmentation: float = 0.2) -> bool:
        """Flat has no delta tier; only tombstone fragmentation (dead
        rows still burn scan bandwidth) triggers a rebuild hint."""
        return (self.incremental_stats()["fragmentation"]
                > max_fragmentation)

    # -- serving API (mirrors IvfBatchKnnIndex) -----------------------

    def pin_segments(self, *a, **kw) -> None:
        """No-op: the constructor already pinned the matrix (flat has
        no encode step). Present for tier-interchangeability."""

    def unpersist(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None
        self._sq8 = None
        self._f16 = None
        self._bin = None

    def search_many_local(self, queries, k: int = 10, nprobe: int = 0,
                          where: dict | None = None,
                          path: str = "exact"):
        """Driver-local batch search. Same result frame as
        IvfBatchKnnIndex.search_many_local: (query_id, id, distance,
        rank), ties broken by (distance, id); `nprobe` ignored.

        ``path="exact"`` (default): recall 1.0 by construction on
        every call.  ``path="coarse"``: low-q calls on large corpora
        route through the SQ8 sidecar + exact re-rank (_scan_coarse) —
        distances stay exact, membership is approximate with measured
        recall.  MEASURED SLOWER than exact on this numpy/OpenBLAS
        stack: the uint8->float32 cast loop tops out ~5 GB/s pooled
        (GIL-bound, non-SIMD) while the exact sgemv streams at the
        61 GB/s DRAM ceiling, so the 4x byte saving never materializes
        (PLANS.md 'Flat single-query floor').  Kept opt-in for stacks
        with vectorized casts; batches fall back to exact either way."""
        import pandas as pd

        from needle_spark.operators.knn_arrow import _resolve_queries

        q_ids, Q, _ = _resolve_queries(queries, "query_id", "vector")
        Qt = self._queries_matrix(Q)
        qsq = (np.asarray(Q, dtype=np.float64) ** 2).sum(axis=1) \
            if self.metric == "euclidean" else None
        wm = None
        if where:
            if not self.metas:
                raise ValueError(
                    "no meta columns pinned; build with metas= for "
                    "filtered serving")
            wm = IvfBatchKnnIndex._where_mask(self.metas, where)
        if self._alive is not None:
            wm = self._alive if wm is None else (wm & self._alive)
        rows_eff = int(wm.sum()) if wm is not None else len(self._X)
        # the fused gemm8 kernels serve micro-batches well past the
        # GEMV-shaped cap (one matrix pass per 8 queries)
        f16_max_q = (self.GEMM_MAX_Q
                     if self._has_gemm8() else self.COARSE_MAX_Q)
        if (path == "f16" and Qt.shape[1] <= f16_max_q
                and rows_eff > self.THRESHOLD_MIN_ROWS
                and self.enable_f16()):
            rows, qs, vals = self._scan_f16(Qt, wm, k)
        elif (path == "vnni" and Qt.shape[1] <= self.GEMM_MAX_Q
                and rows_eff > self.THRESHOLD_MIN_ROWS
                and self.enable_vnni()):
            rows, qs, vals = self._scan_vnni(Qt, wm, k)
        elif (path == "bin" and Qt.shape[1] <= self.GEMM_MAX_Q
                and rows_eff > self.THRESHOLD_MIN_ROWS
                and self.enable_bin()):
            rows, qs, vals = self._scan_bin(Qt, wm, k)
        elif (path == "coarse" and Qt.shape[1] <= self.COARSE_MAX_Q
                and rows_eff > self.THRESHOLD_MIN_ROWS):
            rows, qs, vals = self._scan_coarse(Q, Qt, wm, k)
        else:
            rows, qs, vals = self._scan(Qt, wm, k)
        if len(rows) == 0:
            return pd.DataFrame(
                {"query_id": [], self.id_col: [], "distance": [],
                 "rank": []})
        dist = self._distances(vals, qsq, qs)
        out_q, out_i, out_d = [], [], []
        order = np.argsort(qs, kind="stable")
        qs_s, rows_s, dist_s = qs[order], rows[order], dist[order]
        starts = np.searchsorted(qs_s, np.arange(len(q_ids) + 1))
        for qi in range(len(q_ids)):
            a, b = starts[qi], starts[qi + 1]
            if a == b:
                continue
            d_q, r_q = dist_s[a:b], rows_s[a:b]
            kk = min(k, b - a)
            if b - a > kk:
                # keep boundary-distance ties through the cut so the
                # (distance, id) lexsort can pick the smallest ids
                part = np.argpartition(d_q, kk - 1)[:kk]
                sel = np.flatnonzero(d_q <= d_q[part].max())
                d_q, r_q = d_q[sel], r_q[sel]
            ids_q = self.ids[r_q]
            o = np.lexsort((ids_q, d_q))[:kk]
            out_q.extend([q_ids[qi]] * kk)
            out_i.append(ids_q[o])
            out_d.append(d_q[o])
        pdf = pd.DataFrame({
            "query_id": out_q,
            self.id_col: np.concatenate(out_i),
            "distance": np.concatenate(out_d),
        })
        pdf["rank"] = pdf.groupby("query_id", sort=False).cumcount() + 1
        return pdf

    def search_one(self, query_vector, k: int = 10, nprobe: int = 0,
                   where: dict | None = None, path: str = "exact"):
        """Single-query exact serving: one blocked scan (~GEMV).  The
        latency floor is the DRAM pass over the pinned matrix —
        measured 13 ms at 1M x 200 f32 / 61.5 GB/s on this host
        (PLANS.md 'Flat single-query floor'); an in-process graph
        index answers singles faster only by reading ~0.1% of the
        data at <1.0 recall.  ``path="coarse"`` opts into the SQ8
        sidecar (measured slower here; see search_many_local);
        ``path="f16"`` opts into the compiled half-precision coarse
        pass (halves the DRAM floor, exact re-ranked distances —
        enable_f16 / PLANS.md 'Angular single-query: f16 kernel').

        Returns [(id, distance), ...] ascending, length <= k — the
        same shape as IvfBatchKnnIndex.search_one, so the REST index
        lifecycle can serve either tier."""
        res = self.search_many_local(([0], np.asarray(
            [query_vector], dtype=np.float64)), k=k, where=where,
            path=path)
        return [(i.item() if hasattr(i, "item") else i, float(d))
                for i, d in zip(res[self.id_col], res["distance"])]


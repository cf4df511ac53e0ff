"""Exact-refine serving tier (plans/ivf.py refine=True).

The reference pairs a lossy first pass with exact re-ranking
(src/collection/search_methods.rs:146-177 — k*oversample coarse
candidates, then "Phase 2: Re-rank with full dimensions"); FAISS calls
the same posture IndexRefineFlat.
Contract under test:

- with fetch >= every probed cell's size (refine_factor large), the
  refined result equals the float64 brute-force oracle EXACTLY —
  same ids, same order, distances within 1e-5 — for every metric and
  quantized code tier, because quantization can then only CUT rows
  that exact re-ranking restores;
- the same holds across the incremental surface: add() delta rows,
  add_local() buffered rows, deletes, and WAL crash-replay;
- every tier agrees: search_one == search_many_local ==
  search_local == distributed search on a refined index;
- where-filtered refined serving equals the filtered brute force;
- refine=True + float32 codes is rejected; refine=True on a
  non-capable index is rejected.
"""

import numpy as np
import pandas as pd
import pytest

from needle_spark.plans.ivf import IvfBatchKnnIndex

DIM = 24
N = 1500


def _corpus(seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic scales make global-SQ8 quantization error visible:
    # unrefined ranking measurably diverges from exact on this corpus
    V = (rng.standard_normal((N, DIM))
         * np.geomspace(1.0, 40.0, DIM)).astype(np.float32)
    return V, rng


def _brute(V, q, metric, k=10, subset=None):
    idxs = np.arange(len(V)) if subset is None else np.asarray(subset)
    X = V[idxs].astype(np.float64)
    q = np.asarray(q, dtype=np.float64)
    if metric == "cosine":
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        D = 1.0 - Xn @ (q / np.linalg.norm(q))
    elif metric == "dot":
        D = -(X @ q)
    else:
        D = np.sqrt(((X - q) ** 2).sum(axis=1))
    order = np.lexsort((idxs, D))[:k]
    return [(int(idxs[j]), float(D[j])) for j in order]


def _df(spark, V, ids=None):
    ids = np.arange(len(V)) if ids is None else ids
    return spark.createDataFrame(pd.DataFrame(
        {"id": ids, "vector": [v.tolist() for v in V]}))


@pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot"])
@pytest.mark.parametrize("code_dtype", ["sq8", "sq8_cell"])
def test_full_probe_refined_equals_brute_force(spark, metric, code_dtype):
    V, rng = _corpus()
    idx = IvfBatchKnnIndex(_df(spark, V), nlist=8, vector_col="vector",
                           id_col="id", metric=metric, seed=1,
                           code_dtype=code_dtype,
                           refine=True, refine_factor=N)
    idx.pin_segments()
    try:
        q = rng.standard_normal(DIM) * 5
        want = _brute(V, q, metric)
        got = idx.search_one(q, k=10, nprobe=idx.nlist)
        assert [g[0] for g in got] == [w[0] for w in want]
        assert all(abs(g[1] - w[1]) < 1e-5 for g, w in zip(got, want))
    finally:
        idx.unpersist()


def test_unrefined_diverges_refined_restores(spark):
    """The corpus is built so global SQ8 error flips the exact order:
    refine=False on the SAME index shows the divergence refine=True
    removes (guards against the refine path silently not running)."""
    V, rng = _corpus()
    idx = IvfBatchKnnIndex(_df(spark, V), nlist=8, vector_col="vector",
                           id_col="id", metric="dot", seed=1,
                           code_dtype="sq8", refine=True, refine_factor=N)
    idx.pin_segments()
    try:
        diverged = False
        for _ in range(8):
            q = rng.standard_normal(DIM) * 5
            want = [w[0] for w in _brute(V, q, "dot")]
            ref = [g[0] for g in idx.search_one(q, k=10, nprobe=idx.nlist)]
            unref = [g[0] for g in idx.search_one(q, k=10, nprobe=idx.nlist,
                                                  refine=False)]
            assert ref == want
            diverged = diverged or (unref != want)
        assert diverged, ("corpus no longer exercises quantization error; "
                          "tighten the scales in _corpus()")
    finally:
        idx.unpersist()


def test_all_tiers_agree_refined(spark):
    V, rng = _corpus()
    idx = IvfBatchKnnIndex(_df(spark, V), nlist=8, vector_col="vector",
                           id_col="id", metric="euclidean", seed=1,
                           code_dtype="sq8_cell", refine=True,
                           refine_factor=N)
    idx.pin_segments()
    try:
        Q = rng.standard_normal((5, DIM)) * 5
        q_ids = list(range(5))
        many = idx.search_many_local((q_ids, Q), k=10, nprobe=idx.nlist)
        local = idx.search_local((q_ids, Q), k=10, nprobe=idx.nlist)
        dist = idx.search((q_ids, Q), k=10, nprobe=idx.nlist).toPandas() \
            .sort_values(["query_id", "rank"], ignore_index=True)
        for qi in q_ids:
            want = _brute(V, Q[qi], "euclidean")
            one = idx.search_one(Q[qi], k=10, nprobe=idx.nlist)
            assert [g[0] for g in one] == [w[0] for w in want]
            for pdf in (many, local, dist):
                rows = pdf[pdf.query_id == qi].sort_values("rank")
                assert list(rows.id) == [w[0] for w in want]
                assert np.allclose(rows.distance,
                                   [w[1] for w in want], atol=1e-5)
    finally:
        idx.unpersist()


def test_refined_incremental_surface(spark):
    """add() delta + add_local() buffer + delete: the refined full-probe
    result still equals brute force over the LIVE rows."""
    V, rng = _corpus()
    idx = IvfBatchKnnIndex(_df(spark, V[:N - 200]), nlist=8,
                           vector_col="vector", id_col="id",
                           metric="cosine", seed=1, code_dtype="sq8",
                           refine=True, refine_factor=N)
    idx.pin_segments()
    try:
        # distributed delta rows
        idx.add(_df(spark, V[N - 200:N - 100],
                    ids=np.arange(N - 200, N - 100)))
        # driver-local buffered rows (includes an upsert of id 0)
        local_ids = np.arange(N - 100, N)
        idx.add_local(local_ids, V[N - 100:])
        idx.add_local([0], V[[0]])  # same vector, exercises upsert path
        # tombstone a mix of main/delta/local rows
        dead = [5, N - 150, N - 50]
        idx.delete(dead)
        live = np.asarray([i for i in range(N) if i not in set(dead)])
        q = rng.standard_normal(DIM) * 5
        want = _brute(V, q, "cosine", subset=live)
        got = idx.search_one(q, k=10, nprobe=idx.nlist)
        assert [g[0] for g in got] == [w[0] for w in want]
        assert all(abs(g[1] - w[1]) < 1e-5 for g, w in zip(got, want))
        # the batch tier sees the same state
        pdf = idx.search_many_local(([0], q.reshape(1, -1)), k=10,
                                    nprobe=idx.nlist)
        assert list(pdf.id) == [w[0] for w in want]
        # and after folding the buffer into the Spark delta, the
        # distributed refined path agrees too
        idx.flush_local()
        dist = idx.search(([0], q.reshape(1, -1)), k=10,
                          nprobe=idx.nlist).toPandas().sort_values("rank")
        assert list(dist.id) == [w[0] for w in want]
    finally:
        idx.unpersist()


def test_refined_where_filter(spark):
    V, rng = _corpus()
    labels = np.arange(N) % 5
    df = spark.createDataFrame(pd.DataFrame(
        {"id": np.arange(N), "vector": [v.tolist() for v in V],
         "label": labels}))
    idx = IvfBatchKnnIndex(df, nlist=8, vector_col="vector", id_col="id",
                           metric="euclidean", seed=1, code_dtype="sq8",
                           meta_cols=("label",),
                           refine=True, refine_factor=N)
    idx.pin_segments()
    try:
        q = rng.standard_normal(DIM) * 5
        want = _brute(V, q, "euclidean",
                      subset=np.flatnonzero(labels == 3))
        got = idx.search_one(q, k=10, nprobe=idx.nlist,
                             where={"label": 3})
        assert [g[0] for g in got] == [w[0] for w in want]
        assert all(abs(g[1] - w[1]) < 1e-5 for g, w in zip(got, want))
    finally:
        idx.unpersist()


def test_refined_wal_replay(spark, tmp_path):
    """Crash between add_local and flush_local: a new index re-pinning
    the same segment dir replays the WAL including the exact sidecar
    rows, so refined serving of the replayed rows stays exact."""
    V, rng = _corpus()
    seg = str(tmp_path / "segs")
    idx = IvfBatchKnnIndex(_df(spark, V[:N - 50]), nlist=8,
                           vector_col="vector", id_col="id",
                           metric="cosine", seed=1, code_dtype="sq8",
                           refine=True, refine_factor=N)
    idx.pin_segments(seg)
    idx.add_local(np.arange(N - 50, N), V[N - 50:])
    # simulate crash: build a NEW index over the same main rows and
    # re-pin the same dir (replays the WAL)
    idx2 = IvfBatchKnnIndex(_df(spark, V[:N - 50]), nlist=8,
                            vector_col="vector", id_col="id",
                            metric="cosine", seed=1, code_dtype="sq8",
                            refine=True, refine_factor=N)
    idx2.pin_segments(seg)
    try:
        assert idx2._local_n == 50
        q = V[N - 10] + 0.01 * rng.standard_normal(DIM).astype(np.float32)
        want = _brute(V, q, "cosine")
        got = idx2.search_one(q, k=10, nprobe=idx2.nlist)
        assert [g[0] for g in got] == [w[0] for w in want]
        assert all(abs(g[1] - w[1]) < 1e-5 for g, w in zip(got, want))
    finally:
        idx.unpersist()
        idx2.unpersist()


def test_refine_rejects_float32_codes(spark):
    V, _ = _corpus()
    with pytest.raises(ValueError, match="float32"):
        IvfBatchKnnIndex(_df(spark, V[:100]), nlist=4,
                         vector_col="vector", id_col="id",
                         code_dtype="float32", refine=True)


def test_refine_requires_capability(spark):
    V, rng = _corpus()
    idx = IvfBatchKnnIndex(_df(spark, V[:200]), nlist=4,
                           vector_col="vector", id_col="id",
                           code_dtype="sq8")
    idx.pin_segments()
    try:
        with pytest.raises(ValueError, match="refine"):
            idx.search_one(rng.standard_normal(DIM), k=5, nprobe=4,
                           refine=True)
        # default None on a non-capable index serves quantized, no error
        assert len(idx.search_one(rng.standard_normal(DIM), k=5,
                                  nprobe=4)) == 5
    finally:
        idx.unpersist()


def test_refined_recall_at_moderate_nprobe(spark):
    """The production shape: refine_factor=4 (not cell-sized) at a
    moderate nprobe.  Refined recall@10 must dominate unrefined on the
    anisotropic corpus and reach the probe-limited ceiling."""
    V, rng = _corpus()
    idx = IvfBatchKnnIndex(_df(spark, V), nlist=16, vector_col="vector",
                           id_col="id", metric="euclidean", seed=1,
                           code_dtype="sq8", refine=True, refine_factor=4)
    idx.pin_segments()
    try:
        Q = rng.standard_normal((20, DIM)) * 5
        hits_ref = hits_unref = hits_ceiling = 0
        for qi in range(len(Q)):
            want = {w[0] for w in _brute(V, Q[qi], "euclidean")}
            probes = idx.probe_union(([qi], Q[qi:qi + 1]), nprobe=16)
            ref = {g[0] for g in idx.search_one(Q[qi], k=10, nprobe=16)}
            unref = {g[0] for g in idx.search_one(Q[qi], k=10, nprobe=16,
                                                  refine=False)}
            hits_ref += len(ref & want)
            hits_unref += len(unref & want)
            del probes
        assert hits_ref >= hits_unref
        assert hits_ref >= 0.95 * 10 * len(Q) * 0.95  # near the ceiling
    finally:
        idx.unpersist()


def test_merge_delta_preserves_refine(spark):
    """merge_delta folds the delta (vec32 column included) back into
    the cell layout and re-pins the sidecar: refined full-probe results
    still equal brute force over the merged rows."""
    V, rng = _corpus()
    idx = IvfBatchKnnIndex(_df(spark, V[:N - 100]), nlist=8,
                           vector_col="vector", id_col="id",
                           metric="cosine", seed=1, code_dtype="sq8",
                           refine=True, refine_factor=N)
    idx.pin_segments()
    try:
        idx.add_local(np.arange(N - 100, N), V[N - 100:])
        idx.delete([3])
        st = idx.merge_delta()
        assert st["repinned_segments"]
        q = rng.standard_normal(DIM) * 5
        live = np.asarray([i for i in range(N) if i != 3])
        want = _brute(V, q, "cosine", subset=live)
        got = idx.search_one(q, k=10, nprobe=idx.nlist)
        assert [g[0] for g in got] == [w[0] for w in want]
        assert all(abs(g[1] - w[1]) < 1e-5 for g, w in zip(got, want))
    finally:
        idx.unpersist()


def test_refined_string_ids(spark):
    """Row refs pack (segment, row), never ids — string-keyed corpora
    refine identically (the pinned ids are fixed-width unicode mmaps)."""
    V, rng = _corpus()
    ids = np.asarray([f"doc-{i:05d}" for i in range(N)])
    idx = IvfBatchKnnIndex(_df(spark, V, ids=ids), nlist=8,
                           vector_col="vector", id_col="id",
                           metric="euclidean", seed=1, code_dtype="sq8",
                           refine=True, refine_factor=N)
    idx.pin_segments()
    try:
        q = rng.standard_normal(DIM) * 5
        want = _brute(V, q, "euclidean")
        got = idx.search_one(q, k=10, nprobe=idx.nlist)
        assert [g[0] for g in got] == [f"doc-{w[0]:05d}" for w in want]
        assert all(abs(g[1] - w[1]) < 1e-5 for g, w in zip(got, want))
        # batch path with a string query id
        pdf = idx.search_many_local((["qry-a"], q.reshape(1, -1)), k=10,
                                    nprobe=idx.nlist)
        assert list(pdf.id) == [f"doc-{w[0]:05d}" for w in want]
    finally:
        idx.unpersist()


# ---- property: the refine invariant under randomized shapes ----------
from hypothesis import HealthCheck, given, settings, strategies as st


@settings(derandomize=True, max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    dim=st.sampled_from([8, 17, 24, 33]),
    metric=st.sampled_from(["cosine", "euclidean", "dot"]),
    code_dtype=st.sampled_from(["sq8", "sq8_cell", "pq"]),
    scale_pow=st.integers(min_value=0, max_value=3),
    seed=st.integers(min_value=0, max_value=2**16),
)
def test_refine_invariant_fuzz(spark, dim, metric, code_dtype,
                               scale_pow, seed):
    """For ANY corpus shape, metric, and quantized code tier: refined
    full-probe results with a cell-sized overfetch equal the float64
    brute-force oracle.  Quantization may only CUT rows; the exact
    re-rank restores them — the invariant cannot depend on how badly
    the codes quantize this particular corpus."""
    if code_dtype == "pq" and dim % 4:
        code_dtype = "sq8"  # pq needs an even subspace split
    n = 600
    rng = np.random.default_rng(seed)
    V = (rng.standard_normal((n, dim))
         * np.geomspace(1.0, 10.0 ** scale_pow, dim)).astype(np.float32)
    df = spark.createDataFrame(pd.DataFrame(
        {"id": np.arange(n), "vector": [v.tolist() for v in V]}))
    idx = IvfBatchKnnIndex(df, nlist=4, vector_col="vector", id_col="id",
                           metric=metric, seed=1, code_dtype=code_dtype,
                           refine=True, refine_factor=n,
                           **({"pq_m": dim // 4}
                              if code_dtype == "pq" else {}))
    idx.pin_segments()
    try:
        q = rng.standard_normal(dim) * 3
        X = V.astype(np.float64)
        if metric == "cosine":
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            D = 1.0 - Xn @ (q / np.linalg.norm(q))
        elif metric == "dot":
            D = -(X @ q)
        else:
            D = np.sqrt(((X - q) ** 2).sum(axis=1))
        order = np.lexsort((np.arange(n), D))[:10]
        got = idx.search_one(q, k=10, nprobe=idx.nlist)
        assert [g[0] for g in got] == [int(i) for i in order]
        assert all(abs(g[1] - D[i]) < 1e-5 for g, i in zip(got, order))
    finally:
        idx.unpersist()


# ---- pure-numpy unit pins for the rerank plumbing -------------------

def test_partition_topk_keeps_refs_aligned():
    """The packed row refs must survive the per-query top-k cut glued
    to their (distance, id) rows — a misalignment here would rerank
    the WRONG sidecar rows while ids still look plausible."""
    from needle_spark.plans.ivf import _partition_topk

    acc_d = [[np.array([5.0, 1.0, 3.0])], [np.array([2.0, 4.0])]]
    acc_i = [[np.array([50, 10, 30])], [np.array([20, 40])]]
    acc_r = [[np.array([500, 100, 300])], [np.array([200, 400])]]
    q, i, d, r = _partition_topk(acc_d, acc_i, np.array([7, 8]), 2,
                                 acc_r)
    by_row = {(int(qq), float(dd)): (int(ii), int(rr))
              for qq, ii, dd, rr in zip(q, i, d, r)}
    assert by_row[(7, 1.0)] == (10, 100)
    assert by_row[(7, 3.0)] == (30, 300)
    assert by_row[(8, 2.0)] == (20, 200)
    assert by_row[(8, 4.0)] == (40, 400)


def test_exact_rows_matches_direct_math():
    from needle_spark.plans.ivf import _exact_rows

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((100, 12)).astype(np.float32)
    rows = np.array([7, 3, 3, 99, 0])
    Qq = rng.standard_normal((5, 12))
    V = vecs[rows].astype(np.float64)
    for metric, want in (
        ("dot", -(V * Qq).sum(1)),
        ("euclidean", np.sqrt(((V - Qq) ** 2).sum(1))),
        ("cosine", 1.0 - (V * Qq).sum(1)
         / np.linalg.norm(V, axis=1)),
    ):
        got = _exact_rows(vecs, rows, Qq, metric)
        assert np.allclose(got, want, atol=1e-9), metric


def test_refine_with_caller_source_raises(spark):
    """ADVICE r8: refine=True + a caller-provided `source` must raise —
    an arbitrary source carries no exact sidecar, so the old behavior
    silently served quantized scores under a refine=True call.
    refine=None with a source still downgrades quietly (the caller
    never asked for exactness)."""
    V, rng = _corpus()
    idx = IvfBatchKnnIndex(_df(spark, V[:200]), nlist=4,
                           vector_col="vector", id_col="id",
                           code_dtype="sq8", refine=True)
    idx.pin_segments()
    try:
        q = (list(range(3)), rng.standard_normal((3, DIM)))
        src = idx.codes
        with pytest.raises(ValueError, match="source"):
            idx.search(q, k=5, nprobe=4, source=src, refine=True)
        with pytest.raises(ValueError, match="source"):
            idx.search_local(q, k=5, nprobe=4, source=src, refine=True)
        # implicit refine (None) quietly serves quantized from a source
        assert idx.search(q, k=5, nprobe=4, source=src).count() == 15
    finally:
        idx.unpersist()

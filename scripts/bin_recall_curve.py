#!/usr/bin/env python3
"""Recall@10-vs-overfetch curve for the 1-bit sign-code coarse pass
(VERDICT r10 Next #3) — the adjudication artifact behind the PLANS.md
decision on path="bin" for angular serving.

Two corpora, both cosine 1M x 200:

- the glove-like bench twin (plans/ann_datasets.glove_like): cluster
  noise 0.35 around unit centers -> same-cluster cosine ~0.04, i.e.
  NEAR-ISOTROPIC in angle (the same geometry that already defeated
  IVF probes and PCA truncation, PLANS.md r10).  Expectation from the
  Binomial gap arithmetic: 200 sign bits cannot separate a 0.37-cosine
  true 10-NN from the bulk at useful over-fetch.
- a TIGHT-cluster variant (noise 0.05 -> same-cluster cosine ~0.67,
  the shape of real embedding corpora like glove-200-angular, whose
  published top-10 cosines sit at 0.75+): the same 200 bits should
  hold recall >= 0.95 at moderate over-fetch.

Canary-bracketed; per-cell times are min-of-3 (noise floor estimator).
Writes BIN_RECALL_CURVE.json.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from needle_spark.plans.ann_datasets import glove_like  # noqa: E402
from needle_spark.plans.flat import FlatKnnIndex  # noqa: E402


def canary_ms() -> float:
    t0 = time.perf_counter()
    a = np.empty(100_000_000, np.uint8)
    a.fill(1)
    del a
    return round((time.perf_counter() - t0) * 1000.0, 1)


def tight_glove_like(n: int, dims: int = 200, n_queries: int = 100,
                     n_clusters: int = 2000, seed: int = 43):
    """glove_like with cluster noise 0.05 instead of 0.35: same Zipf
    occupancy / lognormal norms, but same-cluster cosine ~0.67 — the
    anisotropy real embedding corpora have."""
    rng = np.random.default_rng(seed)
    w = 1.0 / np.power(np.arange(1, n_clusters + 1), 1.1)
    w /= w.sum()
    centers = rng.standard_normal((n_clusters, dims)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def sample(count, r):
        which = r.choice(n_clusters, size=count, p=w)
        pts = centers[which] + 0.05 * r.standard_normal(
            (count, dims)).astype(np.float32)
        norms = r.lognormal(1.5, 0.5, count).astype(np.float32)
        pts *= (norms / np.linalg.norm(pts, axis=1))[:, None]
        return pts.astype(np.float32)

    return sample(n, rng), sample(
        n_queries, np.random.default_rng(seed + 1))


def measure(idx: FlatKnnIndex, queries, B: int, path: str,
            reps: int = 3) -> tuple[float, float]:
    qids = list(range(B))
    Q = np.asarray([queries[i].astype(np.float64) for i in range(B)])
    ex = idx.search_many_local((qids, Q), k=10, path="exact")
    idx.search_many_local((qids, Q), k=10, path=path)  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        ap = idx.search_many_local((qids, Q), k=10, path=path)
        ts.append((time.perf_counter() - t0) * 1000.0)
    hits = tot = 0
    for qi in range(B):
        e = set(ex[ex.query_id == qi].id)
        a = set(ap[ap.query_id == qi].id)
        hits += len(e & a) / max(1, len(e))
        tot += 1
    return round(hits / tot, 4), round(min(ts), 2)


def curve(train, queries, label: str) -> dict:
    idx = FlatKnnIndex(np.arange(len(train), dtype=np.int64), train,
                       metric="cosine")
    out = {"corpus": label, "n": len(train), "dims": train.shape[1],
           "canary_before_ms": canary_ms(), "cells": []}
    if not idx.enable_bin():
        out["error"] = "bin path not servable (no kernel)"
        return out
    if len(train) <= FlatKnnIndex.THRESHOLD_MIN_ROWS:
        # below the coarse-eligibility gate search_many_local silently
        # serves the exact scan — the curve would fabricate recall 1.0
        out["error"] = (f"n={len(train)} <= THRESHOLD_MIN_ROWS "
                        f"({FlatKnnIndex.THRESHOLD_MIN_ROWS}): bin "
                        "path not exercised at this scale")
        return out
    for fetch in (2048, 4096, 8192, 16384, 32768):
        idx.BIN_FETCH = fetch
        r1, t1 = measure(idx, queries, 1, "bin")
        # micro-batch shape: the fetch scaler divides by 4 past
        # COARSE_MAX_Q, so pin the effective fetch equal to the cell's
        idx.BIN_FETCH = fetch * 4
        r24, t24 = measure(idx, queries, 24, "bin")
        idx.BIN_FETCH = FlatKnnIndex.BIN_FETCH
        out["cells"].append({
            "fetch": fetch,
            "single_recall_at_10": r1, "single_ms": t1,
            "b24_recall_at_10": r24, "b24_ms": t24,
            "b24_ms_per_q": round(t24 / 24, 2)})
    if idx.enable_vnni():
        r, t = measure(idx, queries, 24, "vnni")
        out["vnni_b24"] = {"recall_at_10": r, "ms": t}
    r, t = measure(idx, queries, 24, "exact")
    out["exact_b24"] = {"recall_at_10": r, "ms": t}
    out["canary_after_ms"] = canary_ms()
    idx.unpersist()
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    res = {"kernel": "ham8_thr (xor+vpopcntq, 1 bit/dim sidecar)",
           "runs": []}
    train, queries = glove_like(n, n_queries=64)
    res["runs"].append(curve(train, queries, "glove_like (noise 0.35)"))
    del train
    train, queries = tight_glove_like(n, n_queries=64)
    res["runs"].append(
        curve(train, queries, "tight_glove_like (noise 0.05)"))
    del train
    with open("/root/repo/BIN_RECALL_CURVE.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

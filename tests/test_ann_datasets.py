"""Structural invariants of the ANN benchmark twins
(plans/ann_datasets.py) — the properties that make each twin behave
like its real ann-benchmarks counterpart (reference grid:
scripts/ann-benchmark-docker/run_benchmark.py:16-24) rather than iid
noise, pinned so a refactor can't silently flatten them.
"""

import numpy as np

from needle_spark.plans.ann_datasets import (
    exact_ground_truth, fashion_like, glove_like, sift_like,
)
from needle_spark.plans.tuning import (
    FLAT_TIER_RC_CUTOFF, relative_contrast,
)


def test_sift_like_shape_and_values():
    tr, q = sift_like(5000, n_queries=10)
    assert tr.shape == (5000, 128) and q.shape == (10, 128)
    assert tr.dtype == np.float32
    assert tr.min() >= 0 and tr.max() <= 255
    assert np.all(tr == np.rint(tr))          # uint8-valued like SIFT


def test_fashion_like_shape_and_values():
    tr, q = fashion_like(4000, n_queries=10)
    assert tr.shape == (4000, 784) and q.shape == (10, 784)
    assert tr.min() >= 0 and tr.max() <= 255
    assert np.all(tr == np.rint(tr))          # uint8-valued pixels
    # dark background: a visible fraction of pixels sits near zero
    assert (tr < 10).mean() > 0.10


def test_fashion_like_deterministic():
    a, _ = fashion_like(500, n_queries=5)
    b, _ = fashion_like(500, n_queries=5)
    assert np.array_equal(a, b)


def test_fashion_like_queries_heldout():
    tr, q = fashion_like(2000, n_queries=20)
    # disjoint train/test split: no query row equals a train row
    assert not any((tr == qi).all(axis=1).any() for qi in q)


def test_fashion_like_is_clusterable():
    """High-dim euclidean with low-rank intra-class variance must land
    on the IVF side of the tier rule (the real dataset is easy for
    partition indexes), unlike the concentrated glove-like twin."""
    tr, q = fashion_like(20_000, n_queries=25)
    rc_fashion = relative_contrast(tr, q[:25], "euclidean")
    tr, q = glove_like(20_000, n_queries=25)
    rc_glove = relative_contrast(tr, q[:25], "cosine")
    assert rc_glove < FLAT_TIER_RC_CUTOFF < rc_fashion


def test_fashion_like_class_structure():
    """Between-class distances dominate within-class ones (silhouette
    + template separation): nearest neighbors of a point should be
    overwhelmingly same-class — checked via GT on a small sample with
    known class layout recovered by nearest-template assignment."""
    tr, q = fashion_like(3000, n_queries=15)
    gt = exact_ground_truth(tr, q, k=5, metric="euclidean")
    # a query's neighbors should agree with each other far more than
    # random rows would: mean pairwise distance among the 5 neighbors
    # << mean distance between random rows
    rng = np.random.default_rng(0)
    rand = tr[rng.integers(0, len(tr), 200)]
    d_rand = np.sqrt(((rand[:50, None] - rand[None, 50:100]) ** 2)
                     .sum(-1)).mean()
    ratios = []
    for i in range(len(q)):
        nb = tr[gt[i]]
        d_nb = np.sqrt(((nb[:, None] - nb[None]) ** 2).sum(-1))
        ratios.append(d_nb[np.triu_indices(5, 1)].mean() / d_rand)
    assert np.mean(ratios) < 0.55


def test_fashion_like_rejects_nonsquare_dims():
    import pytest

    with pytest.raises(ValueError, match="square"):
        fashion_like(100, dims=50)

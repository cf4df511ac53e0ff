"""ANN benchmark datasets (reference: scripts/ann-benchmark-docker/
run_benchmark.py:16-24 — sift-128-euclidean / glove-200-angular /
fashion-mnist-784-euclidean over an M x efConstruction x efSearch grid).

Two tiers:

1. `load_ann_benchmarks_hdf5` — the REAL ann-benchmarks loader
   (standard HDF5 layout: datasets `train`, `test`, `neighbors`,
   `distances`).  Gated behind h5py, which this container doesn't ship;
   on a machine with h5py + the downloaded file this is the
   ann-benchmarks path the reference grades on.
2. `sift_like` — a deterministic download-free stand-in that mimics
   what makes SIFT-1M hard for an IVF index and what iid noise lacks:
   heavy-tailed CLUSTER sizes (Zipf weights), sparse non-negative
   integer-valued descriptors (uint8-range gradient histograms), and
   cluster spread comparable to inter-centroid distance.  Uniform-noise
   corpora flatter ANN recall because every cell is equally populated;
   this one reproduces the skewed cell-occupancy profile (largest cells
   hold >100x the median) that real recall curves are made of.
"""

from __future__ import annotations

import numpy as np

DATASETS = {
    "sift-128-euclidean": {
        "dims": 128, "metric": "euclidean",
        "url": "http://ann-benchmarks.com/sift-128-euclidean.hdf5"},
    "glove-200-angular": {
        "dims": 200, "metric": "cosine",
        "url": "http://ann-benchmarks.com/glove-200-angular.hdf5"},
    "fashion-mnist-784-euclidean": {
        "dims": 784, "metric": "euclidean",
        "url": "http://ann-benchmarks.com/fashion-mnist-784-euclidean.hdf5"},
}


def load_ann_benchmarks_hdf5(path: str):
    """(train, test, neighbors) float32/float32/int64 from a standard
    ann-benchmarks HDF5 file.  Requires h5py (not in this container —
    install it where the real files are available)."""
    try:
        import h5py  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - depends on host env
        raise ImportError(
            "h5py is required to read ann-benchmarks HDF5 files; "
            "pip install h5py on a host with network access and "
            "download e.g. " + DATASETS["sift-128-euclidean"]["url"]
        ) from e
    with h5py.File(path, "r") as f:  # pragma: no cover
        return (np.asarray(f["train"], dtype=np.float32),
                np.asarray(f["test"], dtype=np.float32),
                np.asarray(f["neighbors"], dtype=np.int64))


def sift_like(n: int, dims: int = 128, n_queries: int = 100,
              n_clusters: int = 1000, seed: int = 42):
    """Deterministic SIFT-like corpus: (train (n,dims) float32,
    queries (n_queries,dims) float32).

    Construction (all public structure facts about SIFT descriptors):
    - cluster sizes follow a Zipf(1.05) law over `n_clusters` centers —
      the skewed occupancy real IVF cells see;
    - centers are sparse non-negative "gradient histograms": ~55% of
      dims near zero, the rest exponential with mean 60;
    - points add Laplace noise (scale 10) around their center, clipped
      to [0, 255] and rounded to integers (SIFT is uint8-valued);
    - queries are held-out points from the same process (not corpus
      members), matching ann-benchmarks' disjoint train/test split.
    """
    rng = np.random.default_rng(seed)
    w = 1.0 / np.power(np.arange(1, n_clusters + 1), 1.05)
    w /= w.sum()
    centers = rng.exponential(60.0, (n_clusters, dims)).astype(np.float32)
    centers *= (rng.random((n_clusters, dims)) < 0.45)

    def sample(count: int, r: np.random.Generator) -> np.ndarray:
        which = r.choice(n_clusters, size=count, p=w)
        pts = centers[which] + r.laplace(0.0, 10.0, (count, dims))
        return np.clip(np.rint(pts), 0, 255).astype(np.float32)

    train = sample(n, rng)
    queries = sample(n_queries, np.random.default_rng(seed + 1))
    return train, queries


def glove_like(n: int, dims: int = 200, n_queries: int = 100,
               n_clusters: int = 2000, seed: int = 43):
    """Deterministic GloVe-like corpus for the ANGULAR grid
    (glove-200-angular's public structure facts): dense signed floats,
    Zipf topic-cluster occupancy (word frequency law), heavy-tailed
    per-vector norms (frequent words train to larger norms), queried by
    cosine.  Returns (train, queries) float32."""
    rng = np.random.default_rng(seed)
    w = 1.0 / np.power(np.arange(1, n_clusters + 1), 1.1)
    w /= w.sum()
    centers = rng.standard_normal((n_clusters, dims)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def sample(count: int, r: np.random.Generator) -> np.ndarray:
        which = r.choice(n_clusters, size=count, p=w)
        pts = centers[which] + 0.35 * r.standard_normal(
            (count, dims)).astype(np.float32)
        norms = r.lognormal(1.5, 0.5, count).astype(np.float32)
        pts *= (norms / np.linalg.norm(pts, axis=1))[:, None]
        return pts.astype(np.float32)

    train = sample(n, rng)
    queries = sample(n_queries, np.random.default_rng(seed + 1))
    return train, queries


def fashion_like(n: int = 60_000, dims: int = 784, n_queries: int = 100,
                 n_classes: int = 10, styles_per_class: int = 40,
                 seed: int = 44):
    """Deterministic Fashion-MNIST-like corpus for the HIGH-DIM
    EUCLIDEAN grid (fashion-mnist-784-euclidean's public structure
    facts; the real set is 60k 28x28 uint8 images, 10 balanced
    classes).  What makes it behave like image pixels rather than iid
    noise:

    - 10 balanced classes (garment types), each a smooth 28x28
      template: spatially-correlated values (box-blurred noise), a
      dark background with a bright centered object mask — most of
      the 784 dims sit near 0, variance concentrates in the object
      region, which is why SQ8-vs-float32 tiering behaves differently
      here than on dense 128-d SIFT descriptors;
    - per-class style modes (cut/fit variants): template + a few
      smooth low-rank deformation bases with per-sample coefficients —
      intra-class variance is LOW-RANK, the property that makes
      high-dim image data clusterable at all;
    - small per-pixel noise, clipped to [0, 255] and rounded
      (uint8-valued like the real file);
    - queries from the same process, held out (ann-benchmarks'
      disjoint train/test split).
    """
    side = int(np.sqrt(dims))
    if side * side != dims:
        raise ValueError("dims must be a square (e.g. 784 = 28x28)")
    rng = np.random.default_rng(seed)

    def smooth(count: int, r: np.random.Generator,
               passes: int = 3) -> np.ndarray:
        """(count, side, side) spatially-correlated fields via repeated
        3x1/1x3 box blurs of white noise."""
        img = r.standard_normal((count, side, side)).astype(np.float32)
        k = np.array([0.25, 0.5, 0.25], dtype=np.float32)
        for _ in range(passes):
            # separable blur, axis 1 then 2
            p = np.pad(img, ((0, 0), (1, 1), (0, 0)), mode="edge")
            img = k[0] * p[:, :-2] + k[1] * p[:, 1:-1] + k[2] * p[:, 2:]
            p = np.pad(img, ((0, 0), (0, 0), (1, 1)), mode="edge")
            img = (k[0] * p[:, :, :-2] + k[1] * p[:, :, 1:-1]
                   + k[2] * p[:, :, 2:])
        return img

    yy, xx = np.mgrid[0:side, 0:side].astype(np.float32)
    c = (side - 1) / 2.0
    # per-class soft object SILHOUETTE: garment types differ first by
    # shape (trousers narrow/tall, bags wide/short) — in the real data
    # the silhouette carries most of the between-class euclidean
    # separation, because background pixels are ~0 and object pixels
    # ~100-255
    h = rng.uniform(0.28, 0.46, n_classes).astype(np.float32)
    wdt = rng.uniform(0.22, 0.44, n_classes).astype(np.float32)
    mask = np.exp(-(((yy[None] - c) / (h[:, None, None] * side)) ** 4
                    + ((xx[None] - c) / (wdt[:, None, None] * side)) ** 4))
    templates = (smooth(n_classes, rng, passes=4) * 70.0 + 140.0) * mask
    n_bases = 4
    bases = smooth(n_classes * n_bases, rng, passes=4).reshape(
        n_classes, n_bases, side, side) * mask[:, None]
    style_coef = rng.standard_normal(
        (n_classes, styles_per_class, n_bases)).astype(np.float32) * 28.0

    def sample(count: int, r: np.random.Generator) -> np.ndarray:
        cls = r.integers(0, n_classes, count)
        sty = r.integers(0, styles_per_class, count)
        coef = (style_coef[cls, sty]
                + 7.0 * r.standard_normal((count, n_bases))
                .astype(np.float32))
        imgs = templates[cls] + np.einsum(
            "nb,nbyx->nyx", coef, bases[cls], optimize=True)
        imgs += 6.0 * r.standard_normal(imgs.shape).astype(np.float32)
        return np.clip(np.rint(imgs), 0, 255).astype(
            np.float32).reshape(count, dims)

    train = sample(n, rng)
    queries = sample(n_queries, np.random.default_rng(seed + 1))
    return train, queries


def exact_ground_truth(train: np.ndarray, queries: np.ndarray,
                       k: int = 10, metric: str = "euclidean",
                       block: int = 200_000,
                       return_distances: bool = False):
    """Row indices of the exact top-k per query (ties by index), blocked
    so the (n, q) distance matrix never materializes whole.  With
    `return_distances`, also returns the (q, k) true distances
    (euclidean, not squared) — ann-benchmarks measures recall by
    distance threshold (a returned point counts if its distance is
    within the k-th true distance), which is the right definition on
    integer-valued data where exact distance TIES are common."""
    # float64 throughout (review r6): on integer-valued descriptors the
    # squared distances reach ~8.4e6 where float32 ulp is ~1.0 — the
    # same magnitude as the gap between distinct integer distances —
    # so a float32 oracle can misrank rank-k ties it is supposed to
    # adjudicate.  The 2x bandwidth only costs the one-off GT pass.
    q = np.ascontiguousarray(queries, dtype=np.float64)
    if metric == "cosine":
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    best_d = np.full((len(q), k), np.inf, dtype=np.float64)
    best_i = np.full((len(q), k), -1, dtype=np.int64)
    for s in range(0, len(train), block):
        V = np.ascontiguousarray(train[s:s + block], dtype=np.float64)
        if metric == "cosine":
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True),
                                1e-12)
            D = 1.0 - (q @ Vn.T)
        else:
            D = ((q * q).sum(axis=1, keepdims=True)
                 - 2.0 * (q @ V.T)
                 + (V * V).sum(axis=1)[None, :])
        cand_d = np.concatenate([best_d, D], axis=1)
        cand_i = np.concatenate(
            [best_i, np.broadcast_to(np.arange(s, s + len(V)),
                                     (len(q), len(V)))], axis=1)
        sel = np.argsort(cand_d, axis=1, kind="stable")[:, :k]
        best_d = np.take_along_axis(cand_d, sel, axis=1)
        best_i = np.take_along_axis(cand_i, sel, axis=1)
    if return_distances:
        d = np.sqrt(np.clip(best_d, 0.0, None)) \
            if metric != "cosine" else best_d
        return best_i, d
    return best_i

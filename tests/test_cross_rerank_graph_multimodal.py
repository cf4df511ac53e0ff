"""Cross-collection search, MMR, term-overlap rerank, graph traversal,
pagination cursor, multimodal plumbing."""

import math

import pytest
from pyspark.sql import functions as F

from needle_spark.operators.cross_collection import cross_collection_knn
from needle_spark.operators.graph import seed_by_similarity, traverse
from needle_spark.operators.knn import knn, knn_after
from needle_spark.operators.multimodal import (
    frame_sample_plan,
    image_features,
    make_media_df,
    media_stats,
)
from needle_spark.operators.rerank import mmr_diversify, term_overlap_scores


def test_cross_collection(spark, embeddings):
    qv = [float(x) for x in embeddings.orderBy("vec_id").first()["embedding"]]
    a = embeddings.filter("vec_id < 250").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    b = embeddings.filter("vec_id >= 250").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    rows = cross_collection_knn({"a": a, "b": b}, qv, k=10, per_collection_k=5).collect()
    assert len(rows) == 10
    assert {r["collection"] for r in rows} == {"a", "b"}
    # min_max: each collection's best hit normalizes to 1.0
    best = {c: max(r["score"] for r in rows if r["collection"] == c) for c in ("a", "b")}
    assert best == {"a": 1.0, "b": 1.0}
    ws = [r["score"] for r in rows]
    assert ws == sorted(ws, reverse=True)

    weighted = cross_collection_knn(
        {"a": a, "b": b}, qv, k=4, per_collection_k=5, weights={"b": 0.01}
    ).collect()
    assert all(r["collection"] == "a" for r in weighted)


def test_collection_filters_and_routing(spark, embeddings):
    """CollectionFilter modes (cross_collection.rs:105-120) + routing
    rules with weight overrides (:996-1027)."""
    from needle_spark.operators.cross_collection import (
        CollectionRoutingRule,
        evaluate_routing_rules,
        routed_cross_collection_knn,
        select_collections,
    )

    emb = embeddings.select(F.col("vec_id").alias("id"),
                            F.col("embedding").alias("vector"))
    colls = {"docs_en": emb, "docs_fr": emb, "img_small": emb}
    assert set(select_collections(colls, "prefix", prefix="docs_")) == \
        {"docs_en", "docs_fr"}
    assert set(select_collections(colls, "suffix", suffix="_small")) == {"img_small"}
    assert set(select_collections(colls, "include", names=["docs_fr"])) == {"docs_fr"}
    assert set(select_collections(colls, "exclude", names=["docs_fr"])) == \
        {"docs_en", "img_small"}
    dims = emb.select(F.size("vector")).first()[0]
    assert set(select_collections(
        colls, "matching_dimensions", query_dims=dims)) == set(colls)
    assert select_collections(
        colls, "matching_dimensions", query_dims=dims + 1,
        dims={n: dims for n in colls}) == {}

    rules = [
        CollectionRoutingRule("docs_en", "always", weight_override=2.0),
        CollectionRoutingRule("docs_fr", "dimension_match", dimension=dims),
        CollectionRoutingRule("img_small", "dimension_match", dimension=dims + 1),
    ]
    routed = evaluate_routing_rules(rules, dims)
    assert [r.collection for r in routed] == ["docs_en", "docs_fr"]
    qv = [float(x) for x in embeddings.orderBy("vec_id").first()["embedding"]]
    rows = routed_cross_collection_knn(colls, rules, qv, k=6).collect()
    assert {r["collection"] for r in rows} <= {"docs_en", "docs_fr"}
    # weight override doubles docs_en scores -> it dominates the top
    assert rows[0]["collection"] == "docs_en"

    with pytest.raises(ValueError, match="routing condition"):
        CollectionRoutingRule("x", "sometimes")


def test_score_aggregation_and_builder(spark, embeddings):
    """ScoreAggregation strategies (cross_collection.rs:56-68) and the
    fluent query builder with stats (:587-699, :1032)."""
    from needle_spark.operators.cross_collection import (
        CrossCollectionQueryBuilder,
        aggregate_cross_scores,
    )

    qv = [float(x) for x in embeddings.orderBy("vec_id").first()["embedding"]]
    emb = embeddings.select(F.col("vec_id").alias("id"),
                            F.col("embedding").alias("vector"))
    # same ids in both collections -> aggregation collapses duplicates
    colls = {"a": emb, "b": emb}
    union = cross_collection_knn(colls, qv, k=10, per_collection_k=5)

    best = aggregate_cross_scores(union, "min_score").collect()
    assert all(r["matches"] == 2 and list(r["collections"]) == ["a", "b"]
               for r in best)
    dists = [r["distance"] for r in best]
    assert dists == sorted(dists)

    rrf = aggregate_cross_scores(union, "rrf").collect()
    # rank-1 in both collections -> top fused score 2/(60+1)
    assert abs(rrf[0]["score"] - 2.0 / 61.0) < 1e-12

    avg = aggregate_cross_scores(union, "average").first()
    assert 0.0 <= avg["score"] <= 1.0

    wavg = aggregate_cross_scores(
        union, "weighted_average", sizes={"a": 100, "b": 300}).first()
    assert wavg is not None

    out, stats = (
        CrossCollectionQueryBuilder(colls, qv)
        .k(6).prefix("a").min_score(0.5)
        .options(id_col="id", vector_col="vector")
        .execute()
    )
    rows = out.collect()
    assert rows and all(r["collection"] == "a" and r["score"] >= 0.5 for r in rows)
    assert stats["collections_searched"] == 1
    assert "a" in stats["latencies_us"] and stats["total_time_us"] > 0


def test_pagination_cursor(spark, embeddings):
    qv = [float(x) for x in embeddings.orderBy("vec_id").first()["embedding"]]
    page1 = knn(embeddings, qv, k=5, vector_col="embedding", id_col="vec_id").collect()
    cursor = (page1[-1]["distance"], page1[-1]["vec_id"])
    page2 = knn_after(
        embeddings, qv, cursor, k=5, vector_col="embedding", id_col="vec_id"
    ).collect()
    full = knn(embeddings, qv, k=10, vector_col="embedding", id_col="vec_id").collect()
    assert [r["vec_id"] for r in page1 + page2] == [r["vec_id"] for r in full]


def test_mmr_diversify(spark):
    # "diverse" is somewhat relevant (cos 0.6) but far from the near-dup
    # cluster; with a diversity-leaning lambda it must beat near2, which
    # is ~identical to the already-picked near1.
    rows = [
        ("near1", [1.0, 0.0]), ("near2", [0.999, 0.01]), ("near3", [0.998, 0.02]),
        ("diverse", [0.6, 0.8]),
    ]
    df = spark.createDataFrame(rows, "id string, vector array<float>")
    qv = [1.0, 0.0]
    cands = knn(df, qv, k=4)
    picked = mmr_diversify(cands, qv, k=2, lambda_mult=0.3)
    ids = [r["id"] for r in picked]
    assert ids[0] == "near1"       # most relevant first
    assert ids[1] == "diverse"     # diversity beats near-duplicates
    # lambda=1 -> pure relevance, no diversification
    pure = [r["id"] for r in mmr_diversify(cands, qv, k=2, lambda_mult=1.0)]
    assert pure == ["near1", "near2"]


def test_term_overlap(spark):
    df = spark.createDataFrame(
        [("a", "spark shuffles data across executors"), ("b", "unrelated words only")],
        "id string, text string",
    )
    got = {r["id"]: r["rerank_score"] for r in
           term_overlap_scores(df, "spark executors").collect()}
    assert got["a"] == 1.0 and got["b"] == 0.0


def test_rerank_udf_extension_point(spark):
    from needle_spark.operators.rerank import rerank_udf

    df = spark.createDataFrame(
        [("a", "short"), ("b", "a much longer candidate text")],
        "id string, text string",
    )
    scorer = rerank_udf(lambda q, t: len(t) / (len(q) + 1.0))
    got = {r["id"]: r["s"] for r in
           df.withColumn("s", scorer(F.lit("query"), F.col("text"))).collect()}
    assert got["b"] > got["a"]
    assert got["a"] == pytest.approx(5 / 6)


def test_graph_traversal(spark):
    edges = spark.createDataFrame(
        [
            ("a", "b", "knows"), ("b", "c", "knows"), ("c", "d", "knows"),
            ("a", "x", "owns"), ("d", "a", "knows"),
        ],
        "src string, dst string, edge_type string",
    )
    out1 = {(r["id"], r["hop"]) for r in traverse(edges, ["a"], "out", 1).collect()}
    assert out1 == {("a", 0), ("b", 1), ("x", 1)}
    out2 = {(r["id"], r["hop"]) for r in
            traverse(edges, ["a"], "out", 3, edge_type="knows").collect()}
    assert out2 == {("a", 0), ("b", 1), ("c", 2), ("d", 3)}
    inc = {r["id"] for r in traverse(edges, ["a"], "in", 1).collect()}
    assert inc == {"a", "d"}
    # cycle termination: d->a closes a loop; BFS must not loop forever
    both = traverse(edges, ["a"], "both", 10, edge_type="knows").collect()
    assert {r["id"] for r in both} == {"a", "b", "c", "d"}


def test_graph_seed_by_similarity(spark, embeddings):
    qv = [float(x) for x in embeddings.orderBy("vec_id").first()["embedding"]]
    nodes = embeddings.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    seeds = seed_by_similarity(nodes, qv, k=3)
    assert seeds[0] == 0 and len(seeds) == 3


def test_multimodal_plumbing(spark):
    # real netpbm blobs: the stdlib codec (priority 5) decodes them
    img1 = b"P5 4 4 255\n" + bytes(range(16))
    img2 = b"P6 2 2 255\n" + bytes(range(12))
    rows = [
        ("img1", "image", "image/x-portable-graymap", img1, (4, 4, None, None)),
        ("img2", "image", "image/x-portable-pixmap", img2, (2, 2, None, None)),
        ("vid1", "video", "video/mp4", b"\x00mp4data", (None, None, 3500, None)),
        ("aud1", "audio", "audio/wav", b"RIFFdata", (None, None, 2000, 16000)),
    ]
    media = make_media_df(spark, rows)
    feats = {r["media_id"]: r for r in
             image_features(media.filter("kind = 'image'")).collect()}
    assert set(feats) == {"img1", "img2"}
    assert feats["img1"]["decoded_h"] == 4  # real stdlib decode
    assert feats["img1"]["mean_intensity"] == 7.5  # mean of 0..15
    assert feats["img2"]["decoded_w"] == 2

    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert [(r["media_id"], r["frame_ts_ms"]) for r in frames] == [
        ("vid1", 0), ("vid1", 1000), ("vid1", 2000), ("vid1", 3000)
    ]

    stats = {r["kind"]: r["cnt"] for r in media_stats(media).collect()}
    assert stats == {"audio": 1, "image": 2, "video": 1}

    # decode-batch sizing is by BLOB BYTES, not row count: ~50 bytes of
    # blobs at a 16-byte target -> ceil(total/16) partitions
    from needle_spark.operators.multimodal import media_repartition

    total = sum(len(r[3]) for r in rows)
    want = (total + 15) // 16
    assert media_repartition(media, target_bytes_per_partition=16) \
        .rdd.getNumPartitions() == want
    assert media_repartition(media).rdd.getNumPartitions() == 1  # 128 MiB default


def test_audio_stub_raises(spark):
    from needle_spark.operators.multimodal import _decode_audio_stub

    with pytest.raises(NotImplementedError):
        _decode_audio_stub(b"RIFF", "audio/wav")


def test_codec_registry_swap_path(spark):
    """The production swap path: register a higher-priority codec and
    every operator picks it up without code changes; unregister and the
    deterministic fake is back.  This is exactly how Pillow/soundfile
    get wired outside the sandbox (probe_codecs)."""
    import numpy as np

    from needle_spark.operators.multimodal import (
        CodecRegistry,
        DEFAULT_CODECS,
        audio_features,
        make_media_df,
        probe_codecs,
    )

    media = make_media_df(spark, [
        ("img1", "image", "image/png", b"\x89PNGfakedata1", (64, 48, None, None)),
        ("aud1", "audio", "audio/mp3", b"\x01\x02\x03\x04", (None, None, 2000, 16000)),
    ])

    # default resolution order: stdlib real codecs above the fakes
    assert DEFAULT_CODECS.providers("image_decode") == ["stdlib", "fake"]
    assert DEFAULT_CODECS.providers("audio_decode") == ["stdlib", "stub"]
    # the stdlib audio codec refuses non-RIFF payloads honestly
    with pytest.raises(Exception, match="RIFF"):
        audio_features(media.filter("kind = 'audio'")).collect()

    def pcm8_codec(data: bytes, mime: str) -> np.ndarray:
        return np.frombuffer(data, dtype=np.uint8).astype(np.float32) / 255.0

    DEFAULT_CODECS.register("audio_decode", pcm8_codec, "pcm8", priority=7)
    try:
        assert DEFAULT_CODECS.providers("audio_decode")[0] == "pcm8"
        row = audio_features(media.filter("kind = 'audio'")).first()
        assert row["n_samples"] == 4
        assert abs(row["peak"] - 4.0 / 255.0) < 1e-9
    finally:
        DEFAULT_CODECS.unregister("audio_decode", "pcm8")
    assert DEFAULT_CODECS.providers("audio_decode") == ["stdlib", "stub"]

    # explicit per-call codec injection beats the registry
    big = {r["media_id"]: r for r in image_features(
        media.filter("kind = 'image'"),
        codec=lambda d, m: np.full((8, 8), 7, dtype=np.uint8)).collect()}
    assert big["img1"]["decoded_h"] == 8

    # probe is a no-op here (no media libs in the sandbox) and must not
    # disturb the registry; in production it wires pillow/soundfile
    reg = CodecRegistry()
    reg.register("image_decode", lambda d, m: None, "fake", 0)
    wired = probe_codecs(reg)
    for op, provider in wired.items():  # only if the lib exists
        assert reg.providers(op)[0] == provider

"""LLM training-data hygiene: decontamination, Gopher quality rules,
deterministic stratified sampling (methods: GPT-3 paper 13-gram
decontamination; Gopher paper quality heuristics — public knowledge,
no reference-engine equivalent)."""

import pytest
from pyspark.sql import functions as F

from needle_spark.operators.llm_hygiene import (
    decontaminate,
    dedup_lines_expr,
    gopher_quality,
    mixture_report,
    redact_pii,
    stratified_sample,
    word_ngrams_expr,
)


def test_word_ngrams_shapes(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("",)], "text string"
    ).select(word_ngrams_expr("text", 3).alias("g"))
    rows = [r["g"] for r in df.collect()]
    assert rows[0] == ["a b c", "b c d"]
    assert rows[1] == [] and rows[2] == []


def test_decontaminate_flags_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "totally unrelated content about spark partitions"),
            (2, "he said the quick brown fox jumps over the lazy dog yesterday"),
            (3, "quick brown fox"),  # < n words shared, no full 8-gram
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate(corpus, bench, n=8).collect()}
    assert not out[1]["contaminated"] and out[1]["matched_ngrams"] == 0
    assert out[2]["contaminated"] and out[2]["matched_ngrams"] >= 1
    assert not out[3]["contaminated"]
    assert len(out) == 3  # every corpus doc present, flagged or not


def test_decontaminate_no_python_udf(spark, documents):
    bench = documents.filter(F.col("doc_id") % 10 == 0)
    corpus = documents.filter(F.col("doc_id") % 10 != 0)
    plan = decontaminate(corpus, bench, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    # benchmark membership join must broadcast (no corpus-side shuffle
    # of exploded n-grams into a sort-merge join)
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_gopher_quality_signals(spark):
    good = " ".join(f"word{i} nice tokens here" for i in range(20))
    bullets = "- one\n- two\n- three"
    dups = "same line\nsame line\nsame line\nother"
    symbols = "ok " + "#" * 30
    df = spark.createDataFrame(
        [(1, good), (2, bullets), (3, dups), (4, symbols), (5, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_quality(df).collect()}
    assert out[1]["passes"]
    assert out[2]["bullet_frac"] == 1.0 and not out[2]["passes"]
    assert out[3]["dup_line_frac"] == pytest.approx(0.5)
    assert out[4]["symbol_ratio"] > 0.1 and not out[4]["passes"]
    assert out[5]["n_words"] == 0 and not out[5]["passes"]


def test_stratified_sample_deterministic_and_bounded(spark, documents):
    fr = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    s1 = stratified_sample(documents, "source", fr, default_fraction=0.0)
    s2 = stratified_sample(documents, "source", fr, default_fraction=0.0)
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    assert ids1 == sorted(r["doc_id"] for r in s2.collect())  # deterministic
    rep = {r["source"]: r for r in
           mixture_report(documents, s1, "source").collect()}
    assert rep["src0"]["rate"] == 1.0
    assert rep["src2"]["n_after"] == 0
    assert 0.0 <= rep["src1"]["rate"] <= 1.0
    # other strata fall back to default_fraction=0.0
    assert all(r["n_after"] == 0 for k, r in rep.items()
               if k not in ("src0", "src1", "src2"))


def test_stratified_sample_seed_changes_selection(spark, documents):
    fr = {"src1": 0.5}
    a = {r["doc_id"] for r in stratified_sample(
        documents, "source", fr, seed="mix0").collect()}
    b = {r["doc_id"] for r in stratified_sample(
        documents, "source", fr, seed="mix1").collect()}
    assert a != b  # different seed, different (deterministic) sample


def test_redact_pii_counts_and_masks(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.org and 555-123-4567 plus 10.0.0.1"),
            (2, "ssn 123-45-6789 twice 123-45-6789"),
            (3, "clean text"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1 and out[1]["n_ipv4"] == 1
    assert out[1]["redacted"] == "mail [EMAIL] and [PHONE] plus [IP]"
    assert out[2]["n_ssn"] == 2
    assert out[2]["redacted"] == "ssn [SSN] twice [SSN]"
    assert out[3]["redacted"] == "clean text"
    assert sum(out[3][c] for c in ("n_email", "n_ssn", "n_phone", "n_ipv4")) == 0


def test_ssn_not_double_masked_as_phone(spark):
    # SSN pattern applies before phone so xxx-xx-xxxx never half-matches
    df = spark.createDataFrame([(1, "id 123-45-6789.")], "doc_id long, text string")
    assert redact_pii(df).first()["redacted"] == "id [SSN]."


def test_dedup_lines_keeps_first_occurrence_order(spark):
    df = spark.createDataFrame(
        [(1, "a\nb\na\nc\nb\nd"), (2, "x"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["d"] for r in
           df.select("doc_id", dedup_lines_expr("text").alias("d")).collect()}
    assert out[1] == "a\nb\nc\nd"
    assert out[2] == "x" and out[3] == ""


def test_stratified_sample_map_only(spark, documents):
    plan = stratified_sample(
        documents, "source", {"src0": 0.5}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: pure scan + filter

"""The r12 fused chunk_semantic kernel must be value-identical to the
original two-stage expression pipeline (_ptext_expr regroup + the
interpreted semantic fold) on the full corpus — the exceptAll gate the
r11 verdict asked for before switching the declared query."""

from pyspark.sql import functions as F

import __spark_entry__ as em


def test_chunk_semantic_fused_matches_expression_pipeline(spark, sf_dir):
    from needle_spark.operators.rag import chunk_semantic_expr

    docs = em._t(spark, sf_dir, "documents")
    ptext = F.concat(em._ptext_expr(". "), F.lit("."))
    old = (docs.withColumn("__p", ptext)
           .select("doc_id",
                   F.posexplode(chunk_semantic_expr(F.col("__p"), 200, 50))
                   .alias("chunk_index", "chunk"))
           .select("doc_id",
                   F.col("chunk_index").cast("long").alias("chunk_index"),
                   "chunk"))
    new = em._chunk_semantic(spark, sf_dir)
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0


def test_chunk_semantic_fused_edge_docs(spark):
    """Edge inputs where the regroup/trim/regex parity could break:
    empty text, whitespace-only, unicode whitespace (\\xa0 must COUNT as
    a word char under Java's ASCII \\S — re.ASCII pins that), embedded
    punctuation, null."""
    from needle_spark.operators.rag import chunk_semantic_expr

    texts = ["", "   ", "\t\n", "a\xa0b stays one word?",
             "dot.inside token! and? more",
             "w " * 100, None]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    ptext = F.concat(em._ptext_expr(". "), F.lit("."))
    fused = em._chunk_semantic_fused_udf()
    rows = (docs.withColumn("__p", ptext)
            .select("doc_id",
                    chunk_semantic_expr(F.col("__p"), 200, 50).alias("old"),
                    fused(F.col("text")).alias("new"))
            .collect())
    for r in rows:
        if r["doc_id"] == len(texts) - 1:  # null text
            continue
        assert r["old"] == r["new"], r

"""Two-stage MaxSim (centroid prefilter, multivec.rs:275-332) recall vs
the exact operator."""

import pytest
from pyspark.sql import functions as F

from needle_spark.operators.multivec import maxsim_topk, maxsim_two_stage


@pytest.fixture(scope="module")
def doc_tokens(embeddings):
    return embeddings.select(
        "vec_id",
        F.explode(
            F.array(*[F.slice("embedding", t * 16 + 1, 16) for t in range(4)])
        ).alias("vector"),
    ).cache()


def test_two_stage_recall(embeddings, doc_tokens):
    q = [float(x) for x in embeddings.orderBy("vec_id").first()["embedding"]]
    q_tokens = [q[t * 16:(t + 1) * 16] for t in range(4)]
    exact = [r["vec_id"] for r in
             maxsim_topk(doc_tokens, q_tokens, k=10, doc_id_col="vec_id").collect()]
    two = [r["vec_id"] for r in maxsim_two_stage(
        doc_tokens, q_tokens, k=10, prefilter_factor=6, nprobe=8,
        doc_id_col="vec_id").collect()]
    assert two[0] == exact[0] == 0          # self doc survives pooling
    assert len(set(exact) & set(two)) >= 7  # high recall at 8/16 probes
    # full probe + big factor degenerates to near-exact
    full = [r["vec_id"] for r in maxsim_two_stage(
        doc_tokens, q_tokens, k=10, prefilter_factor=50, nprobe=16,
        doc_id_col="vec_id").collect()]
    assert full == exact

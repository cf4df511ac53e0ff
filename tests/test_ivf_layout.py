"""IVF partitioned layout: writing partitionBy(centroid_id) must turn
probe filters into real partition pruning — the core 100 TB claim of
the ANN design (only nprobe/nlist of the data is read)."""

import pytest
from pyspark.sql import functions as F

from needle_spark.plans.ivf import IvfIndex
from needle_spark.plans.planner import explain_text


def test_probe_prunes_partitions(spark, embeddings, tmp_path):
    ivf = IvfIndex.fit(embeddings, nlist=8, vector_col="embedding", id_col="vec_id")
    path = str(tmp_path / "ivf_table")
    ivf.assign(embeddings).write.partitionBy("centroid_id").parquet(path)

    indexed = spark.read.parquet(path)
    qv = [float(x) for x in embeddings.orderBy("vec_id").first()["embedding"]]
    probes = ivf.probe_ids(qv, nprobe=2)
    pruned = indexed.filter(F.col("centroid_id").isin(probes))
    plan = explain_text(pruned.select("vec_id"))
    # the probe predicate must surface as a partition filter on the scan,
    # not a post-scan row filter
    assert "PartitionFilters" in plan and "centroid_id" in plan

    # and the search result over the partitioned layout matches the
    # unpartitioned in-memory assignment
    mem_indexed = ivf.assign(embeddings)
    a = [r["vec_id"] for r in ivf.search(indexed, qv, k=5, nprobe=2).collect()]
    b = [r["vec_id"] for r in ivf.search(mem_indexed, qv, k=5, nprobe=2).collect()]
    assert a == b and a[0] == 0

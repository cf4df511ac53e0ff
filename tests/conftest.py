import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM light

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from needle_spark import get_spark

    s = get_spark(app_name="needle-spark-tests", shuffle_partitions=8)
    # NOTE (r12): a blanket conftest rewrite of createDataFrame(list,
    # schema) through the Arrow/pandas path (JVM-resident local
    # relations, ~0.3 s/action/relation cheaper) was prototyped and
    # REVERTED: Arrow coerces NaN -> null inside vector cells, which
    # silently defeats NaN-validation semantics (test_insert_validation
    # caught it).  Engine-internal hot sites are converted individually
    # instead (sync._record_one, crdt.op_log_df).
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def load(spark, name, sf_dir=SF_DIR):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@pytest.fixture(scope="session")
def embeddings(spark, sf_dir):
    return load(spark, "embeddings", sf_dir)


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    return load(spark, "documents", sf_dir)


@pytest.fixture(scope="session")
def lineitem(spark, sf_dir):
    return load(spark, "lineitem", sf_dir)


@pytest.fixture(scope="session")
def orders(spark, sf_dir):
    return load(spark, "orders", sf_dir)


@pytest.fixture(scope="session")
def products(spark):
    # the reference's 6-row aggregation fixture (sql_analytics.rs:475-484)
    return spark.createDataFrame(
        [
            ("books", 10.0, 4.5),
            ("books", 20.0, 3.0),
            ("books", 15.0, 5.0),
            ("electronics", 100.0, 4.0),
            ("electronics", 200.0, 4.5),
            ("clothing", 30.0, 3.5),
        ],
        "category string, price double, rating double",
    )

import os

import pytest

from titan_spark.session import get_spark

SF_SMOKE = os.environ.get("TITAN_SPARK_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("titan_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def gods(spark):
    from titan_spark.sources.gods import graph_of_the_gods

    return graph_of_the_gods(spark).cache()


@pytest.fixture(scope="session")
def tpch(spark, sf_dir):
    from titan_spark.sources.tpch import load_tpch_graph

    return load_tpch_graph(spark, sf_dir)


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from titan_spark.sources.tpch import load_tables

    return load_tables(spark, sf_dir)

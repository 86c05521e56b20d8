import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from vanna_financial_knowledge_graph_spark.session import get_spark

    s = get_spark("vkg-tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def kg(spark):
    """Full pipeline outputs at sf0.001 (checkpoint-resumed across pytest
    runs via the stage manifests, so only the first run pays)."""
    from vanna_financial_knowledge_graph_spark.plans.pipeline import run_pipeline

    return run_pipeline(spark, "/root/testdata/sf0.001", "/tmp/vkg_pytest_kg")

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unarxive_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # local[8]/8 shuffle partitions: fast test turnaround; plan shapes are
    # identical to the scale config (AQE, Arrow, nested pruning all on).
    s = get_spark(master="local[8]", app_name="unarxive-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def transcripts_small(spark):
    from unarxive_spark.datagen import synth_transcripts

    return synth_transcripts(spark, n_convs=200, seed=42).cache()


@pytest.fixture(scope="session")
def edges_small(transcripts_small):
    from unarxive_spark.operators.edges import build_edges

    return build_edges(transcripts_small).cache()

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_TINY = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from heliport_spark.plans import get_spark

    s = get_spark(app_name="heliport_spark_tests", master="local[8]",
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def exact_scorer():
    from heliport_spark.heli import Scorer

    return Scorer(exact=True)


@pytest.fixture(scope="session")
def fast_scorer():
    from heliport_spark.heli import Scorer

    return Scorer(exact=False)

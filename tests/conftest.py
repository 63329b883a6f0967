import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from osm_jl_spark.session import get_spark

    s = get_spark(app="osm-jl-spark-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()

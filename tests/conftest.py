from __future__ import annotations

import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from gridiron_spark.session import get_spark

    s = get_spark("gridiron-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()

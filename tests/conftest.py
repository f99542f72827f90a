from __future__ import annotations

import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    import os

    from gridiron_spark.session import get_spark

    # 16 cores halves the wall time of the Spark-bound tests on the
    # 32-core verify box vs the old 8 (round-14 slice measurement in
    # OPTIMIZATION_r14.md) while leaving headroom for the Python worker
    # pool; shuffle partitions track the core count as in bench.py.
    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "16"))
    s = get_spark("gridiron-tests", cpus=cpus, shuffle_partitions=cpus)
    yield s
    s.stop()

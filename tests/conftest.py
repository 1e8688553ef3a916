import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixie_spark.session import get_spark

SF_DIR = os.environ.get("PIXIE_SPARK_TEST_SF", "/root/testdata/sf0.001")


_ACTIVE_SPARK = []


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pixie_spark_tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    _ACTIVE_SPARK.append(s)
    yield s


@pytest.fixture(scope="module", autouse=True)
def _reclaim_blocks():
    """Between test modules, nudge the ContextCleaner: drop cached
    frames and collect Python garbage so localCheckpoint blocks whose
    DataFrames went out of scope are actually released JVM-side. The
    session-long suite OOM'd an 8g heap at ~600 tests without this —
    blocks only free once Python GC drops the py4j reference. (Only
    acts if a test already created the session — never creates one.)"""
    yield
    import gc

    if not _ACTIVE_SPARK:
        return
    try:
        _ACTIVE_SPARK[0].catalog.clearCache()
    except Exception:
        pass
    gc.collect()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR

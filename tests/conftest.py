from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parcel_analytics_etl_notebook_spark.session import get_spark  # noqa: E402
from parcel_analytics_etl_notebook_spark.streaming.stateful_tws import (  # noqa: E402
    ensure_protobuf_runtime,
)

# Before the JVM starts: prepend vendor/ to PYTHONPATH so Spark Python
# workers can import google.protobuf (transformWithState state protocol).
PROTOBUF_OK = ensure_protobuf_runtime()

SF_SMOKE = "/root/testdata/sf0.001"
SF_CHECK = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="engine-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_CHECK

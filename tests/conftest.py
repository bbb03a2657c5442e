from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tcr_kcore_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tcr_kcore_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


def edges_df(spark, edges, weights=None):
    """Helper: build an edge DataFrame from a python list."""
    if weights is not None:
        rows = [(int(s), int(d), float(w)) for (s, d), w in zip(edges, weights)]
        return spark.createDataFrame(rows, "src long, dst long, weight double")
    rows = [(int(s), int(d)) for s, d in edges]
    return spark.createDataFrame(rows, "src long, dst long")

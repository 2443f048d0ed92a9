from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cwds_jobs_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "cwds-jobs-spark-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.streaming.schemaInference": "false"},
    )
    yield s
    s.stop()


@pytest.fixture()
def ws(tmp_path):
    """Per-test workspace dirs."""
    d = {
        "table": str(tmp_path / "table"),
        "changes": str(tmp_path / "changes"),
        "state": str(tmp_path / "state"),
        "lineage": str(tmp_path / "lineage"),
        "checkpoint": str(tmp_path / "checkpoint"),
    }
    os.makedirs(d["changes"], exist_ok=True)
    return d

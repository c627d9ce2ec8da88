"""Shared fixtures: one session-scoped local SparkSession."""

from __future__ import annotations

import datetime as dt
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from keycloak_event_stream_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=4, extra_conf={"spark.sql.shuffle.partitions": "4"})
    yield s


@pytest.fixture(scope="session")
def events_df(spark):
    """Small deterministic in-memory event table for semantics tests."""
    rows = []
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    types = ["login", "logout", "click", "error"]
    for i in range(40):
        rows.append(
            (
                i,
                base + dt.timedelta(minutes=13 * i),
                i % 5,
                types[i % 4],
                float(i),
            )
        )
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )

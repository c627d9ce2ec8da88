"""Query deadline wrapper: fast queries pass through, slow ones are
cancelled and raise (reference parity with the Athena completion
budget)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from keycloak_event_stream_spark.plans.deadline import (
    QueryDeadlineExceeded,
    collect_with_deadline,
)


def test_fast_query_returns_rows(spark):
    df = spark.range(100).select(F.sum("id").alias("s"))
    rows = collect_with_deadline(df, timeout_s=60)
    assert rows[0].s == 4950


def test_slow_query_cancelled(spark):
    @F.udf(returnType=T.LongType())
    def slow(x):
        time.sleep(30)
        return x

    df = spark.range(64).select(slow("id").alias("x"))
    t0 = time.time()
    with pytest.raises(QueryDeadlineExceeded):
        collect_with_deadline(df, timeout_s=3)
    assert time.time() - t0 < 25  # cancelled well before the 30s sleep

"""Custom Python DataSource semantics (sources/pushgen.py). Content
parity is oracle-proven; these pin the partitioning and offset
behaviors the oracle cannot see."""

from __future__ import annotations

from keycloak_event_stream_spark.sources.pushgen import (
    SyntheticEventsReader,
    _row,
    register,
)


def test_batch_source_partition_layout(spark):
    register(spark)
    df = (
        spark.read.format("keycloak_synth")
        .option("n", 1000)
        .option("partitions", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 1000
    # declared slices cover [0, n) exactly once, in order, no overlap
    reader = SyntheticEventsReader({"n": 1000, "partitions": 5})
    slices = reader.partitions()
    spans = [(p.start, p.end) for p in slices]
    assert spans[0][0] == 0 and spans[-1][1] == 1000
    for (_, e0), (s1, _) in zip(spans, spans[1:]):
        assert e0 == s1


def test_batch_source_uneven_split_and_rows(spark):
    reader = SyntheticEventsReader({"n": 10, "partitions": 4})
    slices = reader.partitions()
    got = [r for p in slices for r in reader.read(p)]
    assert got == [_row(i) for i in range(10)]


def test_row_formula_deterministic():
    a, b = _row(12345), _row(12345)
    assert a == b
    assert a[1] == (12345 * 2654435761) % 100
    assert a[2] == "LOGOUT"  # 12345 % 4 == 1

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


def test_pydatasource_sink_two_phase_commit(spark, tmp_path):
    """Custom Python sink: published output is part-N files plus a
    _SUCCESS manifest with the exact row count; no temp files survive
    a successful commit."""
    import json
    import os

    from keycloak_event_stream_spark.sources.pysink import register

    register(spark)
    out = str(tmp_path / "sink")
    df = spark.range(100).selectExpr(
        "id AS event_id", "CAST(id % 7 AS STRING) AS event_type"
    ).repartition(4)
    df.write.format("ndjson_sink").option("path", out).mode("append").save()

    files = sorted(os.listdir(out))
    assert "_SUCCESS" in files
    parts = [f for f in files if f.startswith("part-")]
    assert len(parts) == 4  # one per task, job-id-unique names
    assert not any(f.startswith("_tmp-") for f in files)
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["rows"] == 100
    n_lines = sum(
        sum(1 for _ in open(os.path.join(out, p))) for p in parts
    )
    assert n_lines == 100


def test_pydatasource_sink_append_preserves_prior_output(spark, tmp_path):
    """Published part names embed a per-job id, so append adds files —
    it can never rename over a previous write's output."""
    import os

    from keycloak_event_stream_spark.sources.pysink import register

    register(spark)
    out = str(tmp_path / "sink_append")
    df = spark.range(50).selectExpr("id AS event_id").repartition(2)
    df.write.format("ndjson_sink").option("path", out).mode("append").save()
    df.write.format("ndjson_sink").option("path", out).mode("append").save()
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 4  # 2 tasks x 2 jobs, all retained
    n_lines = sum(sum(1 for _ in open(os.path.join(out, p))) for p in parts)
    assert n_lines == 100


def test_pydatasource_sink_commit_publishes_only_winning_attempt(tmp_path):
    """A zombie/speculative attempt's temp file must not be published:
    commit renames only the files named in commit messages and sweeps
    this job's losing-attempt temps."""
    import os

    from keycloak_event_stream_spark.sources.pysink import (
        NdjsonSinkWriter,
        _Committed,
    )

    out = str(tmp_path / "spec")
    w = NdjsonSinkWriter({"path": out}, overwrite=False)
    os.makedirs(out)
    win = f"_tmp-{w.job_id}-0-7.jsonl"
    lose = f"_tmp-{w.job_id}-0-3.jsonl"  # earlier attempt, same task
    with open(os.path.join(out, win), "w") as fh:
        fh.write('{"winner": true}\n')
    with open(os.path.join(out, lose), "w") as fh:
        fh.write('{"winner": false}\n')
    w.commit([_Committed(win, 1)])
    files = sorted(os.listdir(out))
    parts = [f for f in files if f.startswith("part-")]
    assert len(parts) == 1
    assert '"winner": true' in open(os.path.join(out, parts[0])).read()
    assert not any(f.startswith("_tmp-") for f in files)


def test_pydatasource_sink_abort_cleans_temps(tmp_path):
    """abort() removes every temp file of this job — a failed job
    publishes nothing."""
    import os

    from keycloak_event_stream_spark.sources.pysink import (
        NdjsonSinkWriter,
        _Committed,
    )

    out = str(tmp_path / "aborted")
    w = NdjsonSinkWriter({"path": out}, overwrite=False)
    os.makedirs(out)
    for pid in (0, 1):
        with open(
            os.path.join(out, f"_tmp-{w.job_id}-{pid}-{pid}.jsonl"), "w"
        ) as fh:
            fh.write("{}\n")
    w.abort(
        [
            _Committed(f"_tmp-{w.job_id}-0-0.jsonl", 1),
            _Committed(f"_tmp-{w.job_id}-1-1.jsonl", 1),
        ]
    )
    assert os.listdir(out) == []

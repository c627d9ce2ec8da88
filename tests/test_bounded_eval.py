"""The bounded-eval width scope (catalog.bounded_eval_scope): width
derivation, conf restore, and result identity of a rewritten eval
under a corpus-sized session width — the mechanism behind the round-8
q_association_rules / q_shingle_size_sensitivity /
q_graph_assortativity / q_graph_common_neighbors rewrites
(BASELINE.md "Round 8 — bounded-eval width scope")."""

from __future__ import annotations

import pytest

from keycloak_event_stream_spark.catalog import (
    _EVAL_ROWS_PER_PART,
    bounded_eval_scope,
    footer_rows,
    table_path,
)
from tests.conftest import SF_DIR


def test_footer_rows_matches_parquet_metadata():
    import pyarrow.parquet as pq

    for t in ("lineitem", "documents", "events"):
        n = pq.ParquetFile(table_path(SF_DIR, t)).metadata.num_rows
        assert footer_rows(SF_DIR, t) == n
        # memoized: second call returns the same value
        assert footer_rows(SF_DIR, t) == n


def test_footer_rows_handles_directory_layout(spark, tmp_path):
    """A table path may be a Spark-written DIRECTORY of part files (the
    10x replica tools/scale_probe.py builds), not just the fixtures'
    single files — footer_rows must count both (it crashed on
    directories when it used pq.ParquetFile directly)."""
    out = str(tmp_path / "events.parquet")
    spark.range(1000).selectExpr("id AS event_id").repartition(4).write.parquet(out)
    assert footer_rows(str(tmp_path), "events") == 1000


@pytest.mark.parametrize(
    "session_width,n_rows,expected",
    [
        # tiny input under a corpus session -> floor 4
        ("200", 10, 4),
        # the measured sf0.01 regime: ~60k rows -> 8
        ("200", 60_000, 8),
        # large input keeps the session's corpus width (cap)
        ("200", 100_000_000, 200),
        # a narrow session is floored at 32 for the cap, so a large
        # input may widen past the session width (the _node_loop_scope
        # convention)
        # (a non-numeric session value is unreachable through a real
        # session — conf.set validates the int — so the scope's
        # ValueError fallback stays defensive-only, untested here)
        ("4", 100_000_000, 32),
    ],
)
def test_scope_width_formula_and_restore(spark, session_width, n_rows, expected):
    was = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", session_width)
    try:
        with bounded_eval_scope(spark, n_rows) as parts:
            assert parts == expected
            assert spark.conf.get("spark.sql.shuffle.partitions") == str(
                expected
            )
        # restored verbatim, even a non-numeric caller value
        assert spark.conf.get("spark.sql.shuffle.partitions") == session_width
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", was)


def test_scope_restores_on_error(spark):
    was = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    try:
        with pytest.raises(RuntimeError, match="boom"):
            with bounded_eval_scope(spark, 10):
                raise RuntimeError("boom")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "200"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", was)


def test_rewritten_eval_is_width_invariant(spark):
    """q_graph_assortativity under a forced 200-partition session must
    return exactly the session-width result — the scope re-regimes the
    plan, never the values (its 1-row Pearson moment arithmetic is
    exact DECIMAL, so bitwise equality is the right bar)."""
    from keycloak_event_stream_spark.operators.graph import (
        q_graph_assortativity,
    )

    was = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        ref = q_graph_assortativity(spark, SF_DIR).collect()
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        wide = q_graph_assortativity(spark, SF_DIR).collect()
        assert spark.conf.get("spark.sql.shuffle.partitions") == "200"
        assert ref == wide
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", was)


def test_footer_rows_memo_invalidates_on_rewrite(spark, tmp_path):
    """Rewriting a table at the SAME path must re-count (r8 ADVICE:
    the memo keyed on (dir, name) alone served the stale count after
    tools/scale_probe.py rebuilt the 10x replica in-process, silently
    driving the wrong shuffle width)."""
    out = str(tmp_path / "events.parquet")
    spark.range(100).selectExpr("id AS event_id").write.parquet(out)
    assert footer_rows(str(tmp_path), "events") == 100
    spark.range(5000).selectExpr("id AS event_id").write.mode(
        "overwrite"
    ).parquet(out)
    assert footer_rows(str(tmp_path), "events") == 5000


def test_footer_rows_memo_invalidates_on_nested_rewrite(spark, tmp_path):
    """A rewrite that only touches files INSIDE nested partition dirs
    (dt=*/hour=*/part-*) must re-count too (r9 ADVICE: the one-level
    signature missed it — replacing a part file two levels down
    changes neither the table root's mtime nor its immediate entries'
    stats, and the ingest replays write exactly this layout)."""
    out = str(tmp_path / "events.parquet")
    spark.range(100).selectExpr(
        "id AS event_id", "'2024-01-01' AS dt", "id % 2 AS hour"
    ).write.partitionBy("dt", "hour").parquet(out)
    assert footer_rows(str(tmp_path), "events") == 100
    # grow ONE nested leaf by adding a part file two levels down with
    # pyarrow directly — a Spark overwrite would recreate the leaf dir
    # and bump the dt= parent's mtime, which even the one-level
    # signature saw; a file added INSIDE the leaf changes only the
    # leaf dir's stats, the exact blind spot
    import pyarrow as pa
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"event_id": pa.array(range(600), "int64")}),
        out + "/dt=2024-01-01/hour=0/part-extra.parquet",
    )
    true_n = ds.dataset(out, format="parquet").count_rows()
    assert true_n == 700  # the leaf really grew
    assert footer_rows(str(tmp_path), "events") == true_n


@pytest.mark.parametrize(
    "name",
    [
        # the r9 width-scope adoptions (BASELINE.md "Round 9 —
        # bounded-eval width scope, second wave"): each probed as
        # width-class in the r8 ABA queue, rewritten under
        # bounded_eval_scope, and — like the r8 four — required to be
        # bitwise regime-invariant (exact integer/DECIMAL internals;
        # only terminal double divisions).
        "q_graph_resource_alloc",
        "q_spearman_corr",
        "q_kn_bigram_lm",
        "q_lsh_intake_recall_eval",
        # third wave: the graph loops' BUILD phase (previously only the
        # iteration loop was scoped) and the three analytics names the
        # post-rotation sweep surfaced
        "q_graph_kcore",
        "q_graph_hits",
        "q_graph_bfs_levels",
        "q_ts_similarity",
        "q_stickiness",
        "q_rfm_segmentation",
        "q_lsh_cap_recall_eval",
        "q_minhash_eval",
        "q_embedding_outliers",
    ],
)
def test_r9_scoped_eval_is_width_invariant(spark, name):
    from keycloak_event_stream_spark.registry import collect

    queries, _ = collect()
    was = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        ref = sorted(map(tuple, queries[name](spark, SF_DIR).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        wide = sorted(map(tuple, queries[name](spark, SF_DIR).collect()))
        assert spark.conf.get("spark.sql.shuffle.partitions") == "200"
        assert ref == wide
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", was)


def test_eval_rows_per_part_constant_documented():
    # the constant the width derivation divides by; a silent change
    # here re-regimes every scoped eval, so pin it
    assert _EVAL_ROWS_PER_PART == 8192


def test_scope_warns_on_interleaved_mutation(spark):
    """A concurrent scope interleaving on the same session is the one
    documented hazard of the session-global conf scope (r8 ADVICE).
    The scope cannot prevent it, but it must be LOUD and
    NON-DESTRUCTIVE (r9 ADVICE, token semantics —
    catalog.conf_token_set): a conf value at restore time that is not
    the scope's own setting raises a RuntimeWarning naming the hazard
    and LEAVES the interloper's value in place — restoring this
    scope's stale save point would clobber the live scope's save
    chain. Nesting must NOT trip it."""
    import warnings

    was = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        # nesting: clean, no warning
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            with bounded_eval_scope(spark, 10):
                with bounded_eval_scope(spark, 10):
                    pass
        assert spark.conf.get("spark.sql.shuffle.partitions") == "200"
        # simulated interleave: a foreign mutation inside the scope —
        # warn, and do NOT stomp the interloper's live value
        with pytest.warns(RuntimeWarning, match="concurrent width scope"):
            with bounded_eval_scope(spark, 10):
                spark.conf.set("spark.sql.shuffle.partitions", "77")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "77"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", was)


def test_conf_token_set_restores_and_unsets(spark):
    """conf_token_set round-trips a set conf and unsets one that had
    no prior value (so a scope on a pristine session leaves no
    residue)."""
    from keycloak_event_stream_spark.catalog import conf_token_set

    was = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "123")
        restore = conf_token_set(spark, "spark.sql.shuffle.partitions", "9")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "9"
        restore()
        assert spark.conf.get("spark.sql.shuffle.partitions") == "123"
        # a key with no prior value is unset on restore
        key = "spark.kes.test.tokenScratch"
        restore2 = conf_token_set(spark, key, "x")
        assert spark.conf.get(key) == "x"
        restore2()
        assert spark.conf.get(key, None) is None
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", was)

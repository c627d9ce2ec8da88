"""Table catalog: load the driver's parquet fixtures and register views.

The reference declares its tables externally (Glue DDL in
``terraform/main.tf:78-178,224-343``) and never infers schemas at query
time. We keep that posture: schemas below are declared, and loads assert
conformance instead of inferring.

Scale note: ``spark.read.parquet`` on a partitioned root performs
partition discovery + pruning automatically; at 100 TB the tables would
be registered in a real catalog (Hive/Glue/Unity) with the same layout —
nothing in this module's callers would change.
"""

from __future__ import annotations

import os
from contextlib import contextmanager as _contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Columns written as parquet TIMESTAMP(NANOS), which Spark's vectorized
# reader rejects; read them as long (legacy conf) and convert to
# microsecond timestamps (truncation — same as DuckDB's ns->us cast).
# The raw nanos column survives as `<col>_nanos`: predicates on the
# converted column are expression-wrapped and can never reach the
# parquet reader, so time-range filters add a redundant raw-domain
# twin on `<col>_nanos` — that one pushes down to row-group stats.
_NANO_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}


def nanos_bound(ts: "F.datetime | object") -> int:
    """Epoch-nanos literal for raw-domain pushdown predicates."""
    import datetime as _dt

    if isinstance(ts, _dt.datetime):
        epoch = ts.replace(tzinfo=_dt.timezone.utc).timestamp()
        return int(round(epoch * 1_000_000)) * 1000
    raise TypeError(type(ts))


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


#: Analyzed-DataFrame memo: (applicationId, sf_dir, name, path_sig) ->
#: the lazy scan DataFrame. Plan-OBJECT reuse only — no data, no
#: results, no persisted partitions are held here; every action on the
#: returned frame still executes from the parquet files. Why it exists
#: (round-11 measurement): one `spread(load_table(...))` call costs
#: 160-190 ms of pure DRIVER work (spark.read.parquet re-lists the
#: path and re-reads the footer schema on every call, then the spread
#: probe plans the scan) — per-query build overhead that the bench
#: pays inside the timed region and a real application would pay once
#: per table, not once per query (guide §5: the driver should do
#: almost no work in the query path). The path signature keys
#: freshness exactly like _FOOTER_ROWS: an in-process rewrite of the
#: same path (the 10x replica rebuild) changes the signature and
#: re-analyzes instead of serving a stale plan over vanished files.
#: Keyed by applicationId so a stopped-and-recreated session (the
#: vanilla-parity tests) never reuses a dead session's plan.
#: ADVICE r12 (bounded memory): the signature lives in the VALUE, not
#: the key, so a path rewrite/append REPLACES the entry for that
#: (applicationId, sf_dir, name) instead of accumulating one stale
#: DataFrame (plus its spread repartition chain) per signature — the
#: memo is capped at one live plan per table per session. The per-call
#: stat walk stays: it IS the freshness check (same contract as
#: _FOOTER_ROWS), and memoizing it would serve stale plans over
#: rewritten files.
_TABLE_MEMO: dict[tuple, tuple[tuple, DataFrame]] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (lazy parquet scan).

    Memoized per (session, path, freshness signature): repeated loads
    of the same table return the same analyzed DataFrame object —
    plan reuse, never data reuse (see _TABLE_MEMO)."""
    if name in _NANO_TS_COLS:
        # runtime SQL conf — safe to set on a session we didn't build;
        # re-set on every call (memo hit included) so execution always
        # sees it even if a caller unset it between loads
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = table_path(sf_dir, name)
    key = (spark.sparkContext.applicationId, sf_dir, name)
    sig = _path_sig(path)
    memo = _TABLE_MEMO.get(key)
    if memo is not None and memo[0] == sig:
        return memo[1]
    df = spark.read.parquet(path)
    for col in _NANO_TS_COLS.get(name, []):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            df = df.withColumn(f"{col}_nanos", F.col(col)).withColumn(
                col, F.timestamp_micros(F.expr(f"{col} div 1000"))
            )
    df = normalize_ntz(df)
    _TABLE_MEMO[key] = (sig, df)
    return df


def normalize_ntz(df: DataFrame) -> DataFrame:
    """Session-independence boundary: cast any TIMESTAMP_NTZ column to
    TIMESTAMP (LTZ).

    Spark 4 infers tz-naive parquet timestamps as TIMESTAMP_NTZ by
    default (``spark.sql.parquet.inferTimestampNTZ.enabled``), and much
    of the time-function surface (``withWatermark``/``window()``/
    ``unix_millis``/``session_window``) rejects NTZ. The engine session
    disables the inference (``session.py``), but queries must be correct
    on *any* caller-supplied session — the reference makes the same
    choice by storing UTC-instant epoch millis end-to-end
    (``EventToJSON.java``: ``event.getTime()``). Under the engine
    session this is a no-op (no NTZ columns exist), so plans and
    parquet pushdown are unchanged there.
    """
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


_FOOTER_ROWS: dict[tuple[str, str, int, int, int], int] = {}


def _path_sig(path: str) -> tuple[int, int, int]:
    """Cheap freshness signature for a table path: (max mtime_ns, total
    size, entry count) over the path itself and, for a directory
    layout, EVERY nested entry (full scandir walk). stat-only — no
    footer reads — so the memo below stays metadata-cheap while an
    in-process REWRITE of the same path (e.g. tools/scale_probe.py
    rebuilding the 10x replica after a prior count) changes the
    signature and invalidates the stale count (r8 ADVICE: a
    forever-memo silently drove the wrong shuffle width after a
    rewrite). The walk is recursive because partitioned layouts nest
    (dt=*/hour=*/part-*.parquet — exactly what the ingest replays
    write): replacing a part file two levels down changes neither the
    table root's mtime nor its immediate entries' stats, so a
    one-level signature served the stale count for precisely the
    layout class that gets rewritten (r9 ADVICE). Cost is one stat
    per entry, trivial against the footer read it guards; the entry
    count term additionally catches a same-size in-place swap."""
    st = os.stat(path)
    mt, sz, n = st.st_mtime_ns, st.st_size, 1
    if os.path.isdir(path):
        stack = [path]
        while stack:
            for entry in os.scandir(stack.pop()):
                est = entry.stat()
                mt = max(mt, est.st_mtime_ns)
                sz += est.st_size
                n += 1
                if entry.is_dir(follow_symlinks=False):
                    # follow_symlinks=False: a symlinked directory
                    # cycle inside a table path would loop this walk
                    # forever (and a symlinked subtree would be
                    # double-counted into the signature); symlinked
                    # FILES still stat normally above (r10 ADVICE).
                    stack.append(entry.path)
    return mt, sz, n


def footer_rows(sf_dir: str, name: str) -> int:
    """Parquet-footer row count of a fixture table — metadata only, no
    Spark job, memoized per (dir, table, path signature) so a rewrite
    of the same path re-counts instead of serving the stale number.
    The width driver for :func:`bounded_eval_scope` and the streaming
    replay scope (streaming/queries.py::_events_rows). pyarrow.dataset
    handles both layouts a table path can take: the driver fixtures'
    single files AND Spark-written directories of part files (the 10x
    replica that tools/scale_probe.py builds — a plain pq.ParquetFile
    here crashed on it); count_rows() reads footers only either way."""
    path = table_path(sf_dir, name)
    key = (sf_dir, name, *_path_sig(path))
    n = _FOOTER_ROWS.get(key)
    if n is None:
        import pyarrow.dataset as ds

        n = ds.dataset(path, format="parquet").count_rows()
        _FOOTER_ROWS[key] = n
    return n


_FOOTER_TS_RANGE: dict[tuple, tuple] = {}


def footer_ts_range(sf_dir: str, name: str, column: str = "ts"):
    """(min, max) of a timestamp column from parquet footer statistics
    — metadata only, no Spark job, memoized with the same
    path-signature freshness key as :func:`footer_rows`. Returns
    ``(None, None)`` when any fragment lacks min/max stats for the
    column (callers must treat that as 'span unknown' and keep their
    conservative default). Used by the streaming replay grain
    (streaming/queries.py::_replay_grain) to derive expected rows per
    partition dir without scanning data."""
    path = table_path(sf_dir, name)
    key = (sf_dir, name, column, *_path_sig(path))
    r = _FOOTER_TS_RANGE.get(key)
    if r is None:
        import pyarrow.dataset as ds

        lo = hi = None
        for frag in ds.dataset(path, format="parquet").get_fragments():
            for rg in frag.metadata.to_dict()["row_groups"]:
                for col in rg["columns"]:
                    if col["path_in_schema"] != column:
                        continue
                    st = col.get("statistics")
                    if not st or st.get("min") is None or st.get("max") is None:
                        _FOOTER_TS_RANGE[key] = (None, None)
                        return (None, None)
                    lo = st["min"] if lo is None else min(lo, st["min"])
                    hi = st["max"] if hi is None else max(hi, st["max"])
        r = (lo, hi)
        _FOOTER_TS_RANGE[key] = r
    return r


# Target rows per shuffle partition for a bounded analytic eval — the
# same constant family as graph.py::_LOOP_ROWS_PER_PART (65536, |V|-row
# loop state) and streaming's _REPLAY_ROWS_PER_PART (8192, state-store
# rows); 8192 here because these evals expand their input (pair
# self-joins, shingle explosion), so the driving-table count
# understates the shuffled volume.
_EVAL_ROWS_PER_PART = 8192


def conf_token_set(spark: SparkSession, key: str, value: str):
    """Set a session conf for a scope; return a restore closure with
    TOKEN semantics (r9 ADVICE: cheap insurance on top of the
    documented single-threaded-driver regime). The closure puts the
    saved value back only if the conf still holds what this scope set;
    if a concurrent scope interleaved (the conf changed underneath),
    it warns and leaves the other scope's value in place instead of
    clobbering that scope's save point — the contextvars.Token
    pattern. Nested scopes restore LIFO before their parent's finally
    runs, so nesting never trips the guard. Under true interleaving
    the final value still cannot be made right by ANY restore order
    (each scope saved the other's transient) — the token rule merely
    picks the non-destructive failure: never stomp a LIVE scope."""
    saved = spark.conf.get(key, None)
    spark.conf.set(key, value)

    def _restore() -> None:
        cur = spark.conf.get(key, None)
        if cur != value:
            import warnings

            warnings.warn(
                f"conf scope: {key} changed inside the scope "
                f"({value!r} -> {cur!r}); a concurrent width scope "
                "interleaved on this session — scoped runs must be "
                "serialized (or use spark.newSession() per thread); "
                "leaving the interloper's value in place",
                RuntimeWarning,
                stacklevel=3,
            )
            return
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)

    return _restore


@_contextmanager
def bounded_eval_scope(spark: SparkSession, n_rows: int):
    """Input-derived shuffle width around an EAGER bounded-eval
    computation; always restored in ``finally``. Yields the width.

    Why: a multi-shuffle analytic eval over a bounded input pays the
    session's corpus width at every exchange AND inside every
    persisted intermediate — an InMemoryRelation keeps its build
    width; AQE coalesces shuffle *reads*, not cache partitioning — so
    under a vanilla 200-partition session the eval launches hundreds
    of near-empty tasks per stage. Measured 10-20x on
    q_association_rules / q_shingle_size_sensitivity /
    q_graph_assortativity / q_graph_common_neighbors (13-28 s -> ~1 s
    at sf0.01; BASELINE.md "Round 8 — bounded-eval width scope").
    Width derives from the driving table's footer rows — max(4,
    min(cap, rows // 8192 + 1)), cap = session width floored at 32 —
    never a pinned constant, so a genuinely large input keeps corpus
    width and the 100 TB posture is unchanged.

    Callers MUST materialize inside the scope (these evals end in at
    most a few dozen rows — ``localCheckpoint(eager=True)`` them): a
    lazily returned DataFrame executes after ``finally`` restores the
    conf and sees none of this (the graph-BFS lesson at
    operators/graph.py::_node_loop_scope). AQE stays untouched —
    single-pass plans benefit from it and the measured wins were taken
    with AQE on; only iterative loop boundaries need it off (the
    _node_loop_scope sibling). Conf is session-global for the scope's
    duration — same single-threaded-driver regime as the siblings,
    concurrent-query correctness pinned by
    tests/test_dedup.py::test_lp_conf_scope_concurrent_query_correct.
    """
    parts_was = spark.conf.get("spark.sql.shuffle.partitions", "200")
    try:
        cap = max(int(parts_was), 32)
    except ValueError:
        cap = 32
    parts = max(4, min(cap, n_rows // _EVAL_ROWS_PER_PART + 1))
    # Token restore (r8 ADVICE warning upgraded per r9 ADVICE): a
    # concurrent interleaved scope now keeps its value instead of
    # being clobbered with this scope's stale save point — the warn
    # stays, the stomp goes (see conf_token_set).
    restore = conf_token_set(
        spark, "spark.sql.shuffle.partitions", str(parts)
    )
    try:
        yield parts
    finally:
        restore()


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Widen a too-narrow scan for CPU-heavy per-row work (hashing,
    shingling, vector math): a parquet file is splittable only at
    row-group granularity, so a small file count can pin heavy compute
    to a few tasks regardless of cores.

    Adaptive: a no-op when the scan already yields >= the session's
    parallelism — on a 100 TB table (thousands of row groups) this never
    shuffles; it only round-robins genuinely narrow inputs, where the
    shuffle is tiny by construction.

    The decision probe (``df.rdd.getNumPartitions()`` plans the scan:
    ~50-60 ms of driver time) and its outcome are memoized on the
    DataFrame object itself — with :func:`load_table` returning the
    same object per table, a query that spreads the same scan the
    bench already spread pays the probe zero times, not once per call
    (round-11: the probe + re-load cost 160-190 ms per call inside
    every timed query build). Memo entries are (n, result) so an
    explicit ``partitions=`` override never reuses a mismatched width.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    memo = getattr(df, "_kes_spread", None)
    if memo is not None and memo[0] == n:
        return memo[1]
    out = df if df.rdd.getNumPartitions() >= n else df.repartition(n)
    try:
        df._kes_spread = (n, out)
    except Exception:
        pass  # exotic DataFrame subclass refusing attributes — fine
    return out


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load fixture tables and register each as a temp view.

    Registering views means operators can be written in either the
    DataFrame API or SQL — Catalyst compiles both to the same plan.
    """
    out: dict[str, DataFrame] = {}
    for name in names or TABLE_NAMES:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out

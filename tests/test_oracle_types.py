"""Oracle type hygiene: no DuckDB HUGEINT output columns.

DuckDB widens ``sum`` over integers to HUGEINT (int128). Spark's
``sum`` stays BIGINT. Values compare equal, but the driver's *typed*
value-hash distinguishes them (round-1 q_pivot red row), so every
integer-sum oracle must ``CAST(... AS BIGINT)``. This sweep pins the
whole registry via ``DESCRIBE`` — no data is scanned, so it's cheap.
"""

from __future__ import annotations

import duckdb
import pytest

from keycloak_event_stream_spark.catalog import TABLE_NAMES, table_path
from keycloak_event_stream_spark.registry import collect

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')"
        )
    return con


def test_no_hugeint_oracle_columns(oracle_con):
    _, oracle = collect()
    flagged = {}
    for name, sql in oracle.items():
        desc = oracle_con.execute(f"DESCRIBE ({sql})").fetchall()
        huge = [(c, t) for c, t, *_ in desc if "HUGEINT" in t.upper()]
        if huge:
            flagged[name] = huge
    assert not flagged, f"oracles returning HUGEINT (add CAST AS BIGINT): {flagged}"


def test_no_nested_oracle_columns(oracle_con):
    """No Array/Map/Struct at any registered result surface — the
    driver's canonicalizer sorts result rows with pandas before
    hashing, and a list cell raises ``TypeError: unhashable type``
    there (round 5's one red row: q_kmeans_lloyd's array<double>
    centroid). Every registered query is value-oracled and the driver
    separately asserts Spark-schema == oracle-schema, so gating the
    oracle DESCRIBE (no data scanned) gates both sides: a nested Spark
    surface either has a nested oracle (caught here) or mismatches its
    flat oracle (caught by the driver's schema check). Vector-valued
    results go TALL — (id, pos, value) rows — see llm/vectors.py."""
    _, oracle = collect()
    flagged = {}
    for name, sql in oracle.items():
        desc = oracle_con.execute(f"DESCRIBE ({sql})").fetchall()
        nested = [
            (c, t)
            for c, t, *_ in desc
            if "[]" in t
            or t.upper().startswith(("STRUCT", "MAP", "UNION", "LIST"))
        ]
        if nested:
            flagged[name] = nested
    assert not flagged, (
        f"oracles returning nested types (flatten to tall rows): {flagged}"
    )


def test_no_decimal_oracle_columns(oracle_con):
    """Boundary-type discipline: DECIMAL is the engine's *internal*
    exact-arithmetic type; result surfaces must be DOUBLE/BIGINT.
    Engines convert DECIMAL results differently on the way to a typed
    hash (Python Decimal objects vs float64 columns), so a DECIMAL
    output column is a latent driver hash mismatch even when values
    are identical — same failure class as round 1's q_pivot HUGEINT."""
    _, oracle = collect()
    flagged = {}
    for name, sql in oracle.items():
        desc = oracle_con.execute(f"DESCRIBE ({sql})").fetchall()
        dec = [(c, t) for c, t, *_ in desc if t.upper().startswith("DECIMAL")]
        if dec:
            flagged[name] = dec
    assert not flagged, f"oracles returning DECIMAL (CAST AS DOUBLE): {flagged}"


def test_dbig_split_cast_matches_duckdb_bitwise(spark):
    """The portable big-integer -> double cast (_exact.dbig /
    sql_dbig): DuckDB's int128->double is NOT correctly rounded
    (measured ...7fe vs Spark's ...7ff on 22240711483861231690), so
    moment sums past 2^53 must convert via the 2^32 split on BOTH
    sides. Pins bitwise equality on the measured drift value, its
    negation, and small/zero values."""
    import duckdb

    from keycloak_event_stream_spark.operators._exact import dbig, sql_dbig

    vals = [
        "22240711483861231690",
        "-22240711483861231690",
        "248125486829998621365913325130693",
        "9007199254740993",  # 2^53 + 1: first integer a double can't hold
        "7",
        "0",
        "-7",
    ]
    con = duckdb.connect()
    duck = [
        con.execute(
            f"SELECT {sql_dbig(f'CAST({v!r} AS DECIMAL(38,0))')}"
        ).fetchone()[0]
        for v in vals
    ]
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [
        r["d"]
        for r in df.select(
            dbig(F.col("v").cast("decimal(38,0)")).alias("d")
        ).collect()
    ]
    assert [g.hex() for g in got] == [d.hex() for d in duck]
    # and the split really is the VALUE (exact for <= 2^53)
    assert got[4] == 7.0 and got[5] == 0.0 and got[6] == -7.0

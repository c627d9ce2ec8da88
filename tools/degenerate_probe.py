"""Degenerate-input robustness probe: empty and tiny fixtures.

At 100 TB, zero-row inputs are not an edge case — a partition-pruned
scan, a filter that matches nothing in this hour's slice, a brand-new
tenant's table. A query that *crashes* on an empty table (IndexError on
a collected scalar, ZeroDivisionError in driver-side math, a window
over no rows) is a real production bug even if every SF sweep is green,
because the SF fixtures always have data.

This probe builds two replicas of the test tables under /tmp:

- ``empty`` — every table schema-identical but 0 rows;
- ``one``   — exactly 1 row per table (the first row of sf0.001);
- ``nulls`` — all sf0.001 rows, but every non-key payload column
  (names, measures, texts, embeddings, event payloads) is NULL — the
  data-quality shape a real lake delivers when an upstream extract
  breaks. Keys, join columns, and event time stay intact: a
  production boundary enforces those NOT NULL (the reference's
  blank-as-null decode still requires the timestamp), so nulling them
  would test a contract no engine promises.

and runs every registry query against each, recording exceptions. The
contract being checked is *graceful degradation*: a query may return 0
rows, a NULL-aggregate row, or a defined summary — it must not throw.

Usage:  python tools/degenerate_probe.py [empty|one|nulls] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyarrow.parquet as pq  # noqa: E402

from keycloak_event_stream_spark.catalog import TABLE_NAMES, table_path  # noqa: E402
from keycloak_event_stream_spark.registry import collect  # noqa: E402
from keycloak_event_stream_spark.session import get_spark  # noqa: E402

SRC_SF = "/root/testdata/sf0.001"
DEST_ROOT = "/tmp/kes_degenerate"

# payload columns nulled by the ``nulls`` fixture (keys / join columns
# / event time stay intact — see module docstring)
NULLED_COLUMNS: dict[str, list[str]] = {
    "region": ["r_name"],
    "nation": ["n_name"],
    "customer": ["c_name", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_name", "s_acctbal"],
    "part": ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": ["o_orderstatus", "o_totalprice", "o_orderpriority"],
    "lineitem": [
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus",
    ],
    "events": ["event_type", "value", "props"],
    "documents": ["text", "lang", "source", "n_chars"],
    "embeddings": ["embedding", "label"],
}


def build_fixture(kind: str) -> str:
    """Materialize the empty/one replica; idempotent via a done-marker."""
    dest = os.path.join(DEST_ROOT, kind)
    marker = os.path.join(dest, "_BUILT")
    if os.path.exists(marker):
        return dest
    os.makedirs(dest, exist_ok=True)
    for t in TABLE_NAMES:
        src = table_path(SRC_SF, t)
        if not os.path.exists(src):
            continue
        tbl = pq.read_table(src)
        if kind == "empty":
            out = tbl.slice(0, 0)
        elif kind == "one":
            out = tbl.slice(0, 1)
        else:  # nulls
            import pyarrow as pa

            out = tbl
            for col in NULLED_COLUMNS.get(t, []):
                i = out.schema.get_field_index(col)
                nulls = pa.nulls(len(out), type=out.schema.field(i).type)
                out = out.set_column(i, out.schema.field(i), nulls)
        pq.write_table(out, os.path.join(dest, f"{t}.parquet"))
    with open(marker, "w") as f:
        f.write("ok\n")
    return dest


def main() -> int:
    args = sys.argv[1:]
    kinds = []
    for k in ("empty", "one", "nulls"):
        if k in args:
            kinds.append(k)
            args = [a for a in args if a != k]
    if not kinds:
        kinds = ["empty", "one", "nulls"]

    queries, _ = collect()
    names = args or list(queries)

    spark = get_spark("degenerate_probe")
    overall_fail = 0
    for kind in kinds:
        sf_dir = build_fixture(kind)
        n_pass = n_fail = 0
        print(f"== {kind} fixture: {sf_dir} ==", flush=True)
        for name in names:
            if name not in queries:
                print(f"{name}: UNKNOWN")
                continue
            t0 = time.time()
            try:
                sdf = queries[name](spark, sf_dir)
                rows = sdf.collect()
                n_pass += 1
                dt = time.time() - t0
                if dt > 30:
                    print(f"{name}: ok ({len(rows)} rows) SLOW {dt:.1f}s",
                          flush=True)
            except Exception as exc:
                msg = str(exc).split("\n")[0][:300]
                print(f"{name}: FAIL[{kind}] {type(exc).__name__}: {msg}",
                      flush=True)
                n_fail += 1
        print(f"== {kind}: {n_pass} ok / {n_fail} fail ==", flush=True)
        overall_fail += n_fail
    return 1 if overall_fail else 0


if __name__ == "__main__":
    sys.exit(main())

"""ABA width probe: time registry queries under a DEFAULT-config
session at a chosen shuffle width — the diagnosis tool behind every
bounded_eval_scope adoption (BASELINE.md rounds 8-9).

Method: run the suspect twice at the vanilla width (200) and once at a
narrow width (8). A large vanilla:narrow gap with identical rows means
the cost is exchange width, not data — the fix is
catalog.bounded_eval_scope around the WHOLE body with eager
materialization inside, never a session-conf tune (the driver runs
default confs). Always lead with a warm-up query (q_tpch_q6) so JVM /
codegen warm-up doesn't masquerade as the first suspect's cost, and
re-run back-to-back to split plan-compile (first call) from execution
(warm): a first-call-only gap is codegen, not width.

Usage:
    python tools/width_probe.py [--width N] [--sf DIR] q_name ...
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    width = "200"
    sf = "/root/testdata/sf0.01"
    if "--width" in args:
        i = args.index("--width")
        width = args[i + 1]
        del args[i:i + 2]
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i:i + 2]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", width)
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .appName(f"width-probe-{width}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from keycloak_event_stream_spark.registry import collect

    queries, _ = collect()
    for name in args or ["q_tpch_q6"]:
        t0 = time.monotonic()
        rows = queries[name](spark, sf).collect()
        print(
            f"{name}: {time.monotonic() - t0:.2f} s, {len(rows)} rows "
            f"(width {width})",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

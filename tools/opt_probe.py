"""Round-11 optimization probe: per-query cold timing + plan capture.

Times named registry queries best-of-N through the noop sink (cache
cleared before every timed execution, bench.py's cold-plan protocol)
with the bench canary (q_tpch_q6) sampled first, so numbers taken in
different container-noise windows stay comparable. Optionally writes
``.explain("formatted")`` output to a file per query.

Usage:
    python tools/opt_probe.py [--sf DIR] [--n N] [--plans OUTDIR] \
        [--label TAG] query [query ...]

Prints one JSON line: {"canary": s, "times": {name: best_s}, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from keycloak_event_stream_spark.registry import collect  # noqa: E402
from keycloak_event_stream_spark.session import get_spark  # noqa: E402

CANARY = "q_tpch_q6"


def _run_cold(queries, name, spark, sf_dir) -> float:
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(f"opt_probe: {name}")
    t0 = time.monotonic()
    queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    spark.sparkContext.setJobDescription(None)
    return dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="directory for <query>.txt explain(formatted)")
    ap.add_argument("--label", default="")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    queries, _ = collect()
    spark = get_spark("opt_probe")

    # warmup: scan + shuffled agg + the canary + one UNTIMED pass of
    # every target query, so the timed passes measure a hot JVM (the
    # bench's pass-1 plays this role there; without it the canary
    # reads JIT ramp as container slowness)
    queries["q_scan_project"](spark, args.sf).write.format("noop").mode(
        "overwrite").save()
    queries["q_agg_distinct"](spark, args.sf).write.format("noop").mode(
        "overwrite").save()
    _run_cold(queries, CANARY, spark, args.sf)
    for name in args.queries:
        if name in queries:
            _run_cold(queries, name, spark, args.sf)

    canaries = [_run_cold(queries, CANARY, spark, args.sf)]
    times: dict[str, list[float]] = {}
    for _ in range(args.n):
        for name in args.queries:
            if name not in queries:
                continue
            times.setdefault(name, []).append(
                _run_cold(queries, name, spark, args.sf))
        canaries.append(_run_cold(queries, CANARY, spark, args.sf))
    canary = min(canaries)

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in args.queries:
            if name not in queries:
                continue
            df = queries[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as fh:
                fh.write(plan)

    out = {
        "label": args.label,
        "sf": args.sf,
        "n": args.n,
        "canary_sec": round(canary, 3),
        "times": {k: round(min(v), 3) for k, v in times.items()},
        "all": {k: [round(x, 3) for x in v] for k, v in times.items()},
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

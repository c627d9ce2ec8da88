"""10x scale probe: replicate the sf0.1 fixtures with disjoint key
ranges and compare per-query wall-clock at 1x vs 10x.

This is the evidence behind BASELINE.md's scale section: fixture
parquet at sf0.1 is single-row-group (scans get 1 task), so raw sf0.1
timings under-use the 32 cores; the 10x replica is written with
many ~500k-row files, which is the realistic layout a 100 TB dataset
has — per-core throughput, not plan shape, becomes the binding
constraint, which is the property that transfers to a real cluster.

Usage: python tools/scale_probe.py [q_name ...]
Writes the replica to /tmp/scale10x (reused if present).

SPARK_GRAFT_SCALE_REPLICAS (default 10) picks the replication factor:
set 100 for the 100x leg (BASELINE.md "Round 9 — 100x leg"); the
replica then lands at /tmp/scale100x and the report columns read
1x/Nx. The 100x build appends replica-by-replica (a 100-way union in
one plan is pointless codegen pressure for a fixture build).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from keycloak_event_stream_spark.catalog import load_table  # noqa: E402
from keycloak_event_stream_spark.registry import collect  # noqa: E402
from keycloak_event_stream_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))
OUT = f"/tmp/scale{REPLICAS}x"

# key columns to shift per replica so key ranges stay disjoint
SHIFT_KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # dims stay as-is (joins against them still resolve)
    "nation": [],
    "region": [],
}

DEFAULT_QUERIES = [
    "q_tpch_q1",
    "q_tpch_q18",
    "q_market_basket",
    "q_window_distinct_running",
    "q_ks_test",
    "q_gini",
    "q_attribution_last_touch",
    "q_yoy_growth",
    "q_pareto_abc",
    "q_agg_corr",
]


def build_replica(spark) -> None:
    os.makedirs(OUT, exist_ok=True)
    for name, keys in SHIFT_KEYS.items():
        dest = os.path.join(OUT, f"{name}.parquet")
        # completion marker (r9 ADVICE): the replica-by-replica build
        # leaves a PARTIAL table if interrupted mid-append, and a bare
        # exists(dest) reuse guard would silently benchmark wrong Nx
        # ratios on it. The marker records the replica count so a
        # REPLICAS change also rebuilds.
        marker = os.path.join(dest, "_COMPLETE")
        if os.path.exists(dest):
            try:
                done = int(open(marker).read().strip())
            except (OSError, ValueError):
                done = -1
            if done == REPLICAS:
                continue
            print(f"replica {name}: partial/stale build, rebuilding",
                  flush=True)
            import shutil

            # a pre-marker interrupted build can leave dest as a plain
            # FILE (single-file write path); rmtree raises
            # NotADirectoryError on that and would abort the probe
            # instead of rebuilding (r10 ADVICE)
            if os.path.isdir(dest):
                shutil.rmtree(dest)
            else:
                os.remove(dest)
        base = load_table(spark, SF_DIR, name)
        if not keys:
            base.write.mode("overwrite").parquet(dest)
            with open(marker, "w") as fh:
                fh.write(str(REPLICAS))
            continue
        spans = {
            k: base.agg(F.max(F.col(k)).cast("long")).collect()[0][0] + 1
            for k in keys
        }
        base_n = base.count()
        files_per = max(1, base_n // 500_000)
        # append replica-by-replica with disjoint key ranges: bounded
        # plan size at any replication factor, and the resulting
        # many-file layout is exactly the realistic large-table shape
        # the probe exists to exercise
        for i in range(REPLICAS):
            rep = base
            for k in keys:
                rep = rep.withColumn(
                    k, (F.col(k) + F.lit(i * spans[k])).cast("long")
                )
            rep.repartition(files_per).write.mode(
                "overwrite" if i == 0 else "append"
            ).parquet(dest)
        with open(marker, "w") as fh:
            fh.write(str(REPLICAS))
        print(
            f"replica {name}: {base_n * REPLICAS} rows, "
            f"{files_per * REPLICAS} files",
            flush=True,
        )


def best_of_2(fn, spark, sf_dir) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark()
    build_replica(spark)
    queries, _ = collect()
    print(f"| query | sf0.1 | {REPLICAS}x | ratio |\n|---|---|---|---|")
    for name in names:
        fn = queries[name]
        t1 = best_of_2(fn, spark, SF_DIR)
        tn = best_of_2(fn, spark, OUT)
        print(
            f"| {name} | {t1:.2f} | {tn:.2f} | {tn / t1:.1f}x |",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

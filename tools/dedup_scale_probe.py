"""Nx scale probe for the MinHash-LSH dedup family on a documents
replica with CONTROLLED clone density (r10 verdict #5).

The general tools/scale_probe.py replica shifts doc_id but keeps every
text byte-identical, so a 100x build gives every document exactly 100
exact clones — a clone-collapse stress test, not a corpus-growth
model. This probe builds a replica that preserves the fixture's OWN
duplicate structure per copy instead: replica i > 0 suffixes every
WORD with a replica salt (``w -> w.x{i}``), which

- keeps document count, length distribution, and the within-replica
  clone/near-dup graph exactly isomorphic to the 1x fixture (the
  controlled density: the fixture's natural clones-per-doc, constant
  as the corpus scales), and
- makes every shingle distinct ACROSS replicas, so cross-replica
  Jaccard is 0 — no new true near-dups are created, and any
  cross-replica LSH band collision must be rejected by the exact
  verify stage.

That yields exact distributed-checkable replication laws, no row ever
collected:

- q_dedup_near_minhash: Nx pair count == N * 1x pair count;
- q_dedup_components:   Nx row count  == N * 1x row count and
  Nx component count == N * 1x component count (components cannot
  span replicas);
- q_minhash_eval: the metrics row (recall etc.) is IDENTICAL at 1x
  and Nx — truth pairs and found pairs both scale by N, the ratios
  cancel;
- candidate bill (q_lsh_band_occupancy over the replica): the
  corpus-wide sum of k*(k-1)/2 over band buckets scales ~N, NOT N^2 —
  the "bounded by cap x buckets, not |docs|^2" property the r10
  verdict asks to demonstrate.

Usage: SPARK_GRAFT_SCALE_REPLICAS=100 python tools/dedup_scale_probe.py
Builds /tmp/dedup_scale{N}x/documents.parquet (reused when complete)
and prints one JSON line with 1x/Nx wall-clocks, the candidate bills,
and the law results.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from keycloak_event_stream_spark.catalog import load_table  # noqa: E402
from keycloak_event_stream_spark.registry import collect  # noqa: E402
from keycloak_event_stream_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "100"))
OUT = f"/tmp/dedup_scale{REPLICAS}x"

QUERIES = ["q_dedup_near_minhash", "q_dedup_components", "q_minhash_eval"]


def build_docs_replica(spark) -> None:
    """Replica-by-replica append with the scale_probe completion-marker
    protocol (partial builds rebuild; REPLICAS changes rebuild)."""
    os.makedirs(OUT, exist_ok=True)
    dest = os.path.join(OUT, "documents.parquet")
    marker = os.path.join(dest, "_COMPLETE")
    if os.path.exists(dest):
        try:
            done = int(open(marker).read().strip())
        except (OSError, ValueError):
            done = -1
        if done == REPLICAS:
            return
        print("docs replica: partial/stale build, rebuilding", flush=True)
        if os.path.isdir(dest):
            shutil.rmtree(dest)
        else:
            os.remove(dest)
    base = load_table(spark, SF_DIR, "documents")
    span = base.agg(F.max("doc_id").cast("long")).collect()[0][0] + 1
    for i in range(REPLICAS):
        rep = base.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(i * span)).cast("long")
        )
        if i > 0:
            # word-level salt: every shingle becomes replica-unique
            # while the text's length and within-replica duplicate
            # structure are preserved verbatim
            rep = rep.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda w: F.concat(w, F.lit(f".x{i}")),
                    ),
                    " ",
                ),
            )
        rep.write.mode("append").parquet(dest)
    with open(marker, "w") as fh:
        fh.write(str(REPLICAS))


def _bill(qfn, spark, sf_dir: str) -> dict:
    """Corpus-wide candidate bill from q_lsh_band_occupancy: the sum of
    per-band candidate_pairs / pairs_over_cap, aggregated in-cluster."""
    row = (
        qfn(spark, sf_dir)
        .agg(
            F.sum("candidate_pairs").alias("candidate_pairs"),
            F.sum("pairs_over_cap").alias("pairs_over_cap"),
            F.max("max_bucket").alias("max_bucket"),
        )
        .collect()[0]
    )
    return {
        "candidate_pairs": row["candidate_pairs"],
        "pairs_over_cap": row["pairs_over_cap"],
        "max_bucket": row["max_bucket"],
    }


def _timed_count(qfn, spark, sf_dir: str) -> tuple[float, int]:
    t0 = time.time()
    n = qfn(spark, sf_dir).count()
    return round(time.time() - t0, 2), n


def main() -> int:
    spark = get_spark()
    build_docs_replica(spark)
    qs, _ = collect()

    report: dict = {"replicas": REPLICAS, "queries": {}}
    laws: dict = {}

    # candidate bill: the N-vs-N^2 question, answered before any join
    bill_1x = _bill(qs["q_lsh_band_occupancy"], spark, SF_DIR)
    bill_nx = _bill(qs["q_lsh_band_occupancy"], spark, OUT)
    report["bill_1x"] = bill_1x
    report["bill_nx"] = bill_nx
    # linear-not-quadratic: the Nx bill stays within a small factor of
    # N * 1x (md5 bucket-key collisions across replicas can only add a
    # vanishing number of pairs; 2x headroom keeps the check sharp
    # while never flaking)
    laws["bill_scales_linear"] = (
        bill_nx["candidate_pairs"] <= 2 * REPLICAS * bill_1x["candidate_pairs"]
    )

    for name in QUERIES:
        w1, n1 = _timed_count(qs[name], spark, SF_DIR)
        wn, nn = _timed_count(qs[name], spark, OUT)
        report["queries"][name] = {
            "one_x_sec": w1,
            "n_x_sec": wn,
            "ratio": round(wn / max(w1, 1e-9), 2),
            "one_x_rows": n1,
            "n_x_rows": nn,
        }
        if name == "q_minhash_eval":
            # metrics row identical at both scales: compare the actual
            # row contents (1 row, scalar metrics — a bounded collect)
            r1 = qs[name](spark, SF_DIR).collect()
            rn = qs[name](spark, OUT).collect()
            laws["eval_metrics_identical"] = (
                [r.asDict() for r in r1] == [r.asDict() for r in rn]
            )
        else:
            laws[f"{name}_rows_scale_exact"] = nn == REPLICAS * n1

    report["laws"] = laws
    report["ok"] = all(laws.values())
    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())

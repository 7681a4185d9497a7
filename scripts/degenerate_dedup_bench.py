#!/usr/bin/env python
"""Degenerate-scale evidence for the composed dedup path (VERDICT r2 #5).

Synthesizes a corpus with a massive identical-document cluster — the
boilerplate pathology that melts naive LSH (one bucket holding the
whole cluster => O(cluster^2) candidate pairs) — and runs the full
composed pipeline: MinHash signatures -> banded LSH with the
degenerate-bucket star-link cap -> n-gram Jaccard verify -> CC keeper
decision, plus the `minhash_lsh_bucket_stats` audit query (the
no-silent-caps rule: every bucket the cap degraded is REPORTED).

Deterministic synthesis, no external data.  Sizing via env:
    DEGEN_TOTAL  total docs    (default 10_000_000)
    DEGEN_DUP    identical-doc cluster size (default 1_000_000)

The decisive property at 10^12-turn scale is that NOTHING in the plan
materializes a row (or array) proportional to the cluster size: the
1M-identical cluster costs one star fan-out (N-1 pairs), not N^2/2,
and no per-bucket collect_set ever exists.  A straggler-free run here
is the small-cluster witness of that shape.

Usage: python scripts/degenerate_dedup_bench.py
Prints one JSON line with wall times, pair counts and the audit rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOTAL = int(os.environ.get("DEGEN_TOTAL", 10_000_000))
DUP = int(os.environ.get("DEGEN_DUP", 1_000_000))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BOILER = ("all rights reserved this page is auto generated content "
          "please do not reply to this message standard footer text")


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("degenerate-dedup-bench")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEM", "48g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from pyrdfa3_spark.operators.dedup import (
        dedup_decision, minhash_lsh_bucket_stats, minhash_lsh_candidates,
    )

    # deterministic corpus: doc_id < DUP -> the identical boilerplate
    # cluster; the rest are unique-ish texts (distinct trailing token
    # per doc so cross-doc shingle collisions stay incidental)
    ids = spark.range(TOTAL).select(F.col("id").alias("doc_id"))
    docs = ids.select(
        "doc_id",
        F.when(F.col("doc_id") < DUP, F.lit(BOILER))
        .otherwise(F.concat(
            F.lit("unique document body number "),
            F.col("doc_id").cast("string"),
            F.lit(" with id-salted tail "),
            F.md5(F.col("doc_id").cast("string"))))
        .alias("text"))
    docs = docs.localCheckpoint(eager=True)  # synthesis off the clock

    out: dict = {"total_docs": TOTAL, "dup_cluster": DUP, "cpus": CPUS}

    t0 = time.time()
    n_cand = minhash_lsh_candidates(docs).count()
    out["lsh_candidates"] = n_cand
    out["lsh_candidates_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    audit = minhash_lsh_bucket_stats(docs).collect()
    out["audit_buckets"] = [
        {"band": r["band"], "n_docs": r["n_docs"],
         "dropped_pairs": r["dropped_pairs"]} for r in audit]
    out["audit_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    dec = dedup_decision(docs)
    n_dup = dec.filter(F.col("is_dup")).count()
    out["dedup_decision_dups"] = n_dup
    out["dedup_decision_sec"] = round(time.time() - t0, 2)

    # shape checks: the star cap held (candidates ~ linear in the
    # cluster, nowhere near C(DUP,2)) and the audit REPORTED the
    # degenerate buckets (no silent caps)
    out["cap_held"] = n_cand < 10 * DUP
    out["audit_reported_cluster"] = any(
        r["n_docs"] >= DUP for r in audit)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

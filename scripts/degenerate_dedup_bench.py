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
and no per-bucket collect_set ever exists.  The witnesses recorded:
(a) the run COMPLETES without a straggler — uncapped, the cluster
alone would be C(1M,2) = 5*10^11 candidate pairs, which never
finishes here; (b) the decision is EXACT (every cluster member but
the minimum is a dup — the star link loses nothing); (c) the audit
query REPORTS the capped buckets (no silent caps).  Set
DEGEN_COUNT_CANDIDATES=1 to additionally count the candidate pairs
(one extra signature pass) and assert they stay linear in the
cluster size.

Usage: python scripts/degenerate_dedup_bench.py
Prints one JSON line with wall times, exactness and the audit rows.
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
        dedup_decision, minhash_lsh_bucket_stats,
    )

    # deterministic corpus: doc_id < DUP -> the identical boilerplate
    # cluster; the rest are four id-salted md5 words each — genuinely
    # dissimilar texts (a shared natural-language prefix would make
    # every "unique" doc a near-dup of every other at shingle k=5 and
    # drown the cluster pathology in background noise)
    ids = spark.range(TOTAL).select(F.col("id").alias("doc_id"))
    word = lambda s: F.md5(F.concat(F.col("doc_id").cast("string"),
                                    F.lit(s)))
    docs = ids.select(
        "doc_id",
        F.when(F.col("doc_id") < DUP, F.lit(BOILER))
        .otherwise(F.concat_ws(" ", word("a"), word("b"),
                               word("c"), word("d")))
        .alias("text"))
    docs = docs.localCheckpoint(eager=True)  # synthesis off the clock

    out: dict = {"total_docs": TOTAL, "dup_cluster": DUP, "cpus": CPUS}

    if os.environ.get("DEGEN_COUNT_CANDIDATES"):
        from pyrdfa3_spark.operators.dedup import minhash_lsh_candidates
        t0 = time.time()
        n_cand = minhash_lsh_candidates(docs).count()
        out["lsh_candidates"] = n_cand
        out["lsh_candidates_sec"] = round(time.time() - t0, 2)
        out["cap_held"] = n_cand < 10 * DUP  # linear, nowhere near N^2/2

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

    # shape checks: the audit REPORTED the degenerate cluster buckets
    # (no silent caps) and the star-link kept the decision exact —
    # every cluster member but the minimum is a dup, nothing else
    out["audit_reported_cluster"] = any(
        r["n_docs"] >= DUP for r in audit)
    out["decision_exact"] = (n_dup == DUP - 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Scale-factor step-up report: run the composed corpus-curation
pipelines (clean_corpus, dedup_decision) at two scale factors in one
session and print per-query times + ratios — the suite queries come
from two ``bench.py`` runs (one per SF dir); this covers the composed
pipelines the suite omits.

Usage: python scripts/sf_stepup.py [sf_a_dir] [sf_b_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["clean_corpus", "dedup_decision"]


def main():
    from pyrdfa3_spark.plans import queries as Q
    from pyrdfa3_spark.session import build_session

    sf_a = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf_b = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "sf1")
    spark = build_session(master="local[32]", shuffle_partitions=32,
                          max_partition_bytes=8 << 20)
    out = {}
    for name in QUERIES:
        fn = Q.QUERIES[name]
        times = {}
        for sf in (sf_a, sf_b):
            fn(spark, sf).count()          # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                fn(spark, sf).count()
                best = min(best, time.time() - t0)
            times[sf] = round(best, 3)
        out[name] = {"a_sec": times[sf_a], "b_sec": times[sf_b],
                     "ratio": round(times[sf_b] / times[sf_a], 2)}
    spark.stop()
    print(json.dumps({"a": sf_a, "b": sf_b, "queries": out}))


if __name__ == "__main__":
    main()

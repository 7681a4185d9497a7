#!/usr/bin/env python
"""Deterministic scale-factor step-up: synthesize an sfN corpus as a
K-fold key-shifted replication of the driver's sf0.1 tables (TESTDATA.md
— read-only; this writes a NEW directory, never touches /root/testdata).

Why replication instead of a fresh generator: the driver's generator is
not in the repo, and the scaling question is "do MY plans stay linear
when THE SAME distributions grow 10x" — key-shifted copies preserve the
distributions and every FK relationship exactly (each copy is
self-consistent: orders->customer, lineitem->orders/part/supplier all
offset by the same copy stride), while fixed-size dims (region, nation)
stay fixed like TPC-H itself scales.  Document text gets a per-copy tag
token so near-dup structure does not collapse into 10x exact-duplicate
clusters (which would change the dedup workload's shape, not its
scale); timestamps and value distributions are untouched.

Usage: python scripts/gen_sf.py [K] [out_dir]   (default 10 -> BENCH/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"

# table -> {column: stride-source-table} key offsets; every copy i adds
# i * (max(key)+1 of the stride source) so FKs stay aligned per copy
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
FIXED_DIMS = ["region", "nation"]


def main():
    from pyspark.sql import functions as F

    from pyrdfa3_spark.session import build_session

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "sf1")
    os.makedirs(out, exist_ok=True)
    spark = build_session(master="local[16]", shuffle_partitions=16,
                          max_partition_bytes=8 << 20)

    strides = {}
    for t, keycol in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
                      ("part", "p_partkey"), ("orders", "o_orderkey"),
                      ("events", "event_id"), ("documents", "doc_id"),
                      ("embeddings", "vec_id")]:
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        strides[t] = df.agg(F.max(keycol)).collect()[0][0] + 1
    strides["events_user"] = (spark.read.parquet(f"{SRC}/events.parquet")
                              .agg(F.max("user_id")).collect()[0][0] + 1)

    def write_single_file(df, dest):
        """Match the driver layout: one parquet FILE per table (some
        readers take the path as a file; Spark splits a single file by
        row group anyway, so scan parallelism is unaffected)."""
        import glob
        import shutil

        tmp = dest + ".tmpdir"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        if os.path.isdir(dest):
            shutil.rmtree(dest)
        os.replace(part, dest)
        shutil.rmtree(tmp)

    for t in FIXED_DIMS:
        write_single_file(spark.read.parquet(f"{SRC}/{t}.parquet"),
                          f"{out}/{t}.parquet")
        print(f"{t}: fixed dim copied")

    copies = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("_c")
    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        rep = df.select("*", copies)
        for col, src in keys.items():
            rep = rep.withColumn(
                col, (F.col(col) + F.col("_c") * strides[src])
                .cast(dict(df.dtypes)[col]))
        if t == "documents":
            # per-copy tag so exact/near-dup structure scales instead
            # of collapsing into k-fold identical clusters
            rep = (rep.withColumn(
                "text", F.when(F.col("_c") == 0, F.col("text"))
                .otherwise(F.concat(F.lit("copyv"),
                                    F.col("_c").cast("string"),
                                    F.lit(" "), F.col("text"))))
                .withColumn("n_chars",
                            F.length("text").cast("bigint")))
        write_single_file(rep.drop("_c"), f"{out}/{t}.parquet")
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()

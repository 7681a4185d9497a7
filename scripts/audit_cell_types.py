#!/usr/bin/env python
"""Audit every registry query's OUTPUT cell types on both engines.

A correctness harness downstream of the engine normalizes result
cells before hashing; r04 showed that DECIMAL (Spark decimal /
DuckDB DECIMAL) and DuckDB HUGEINT (the silent result type of
SUM(BIGINT), plain and windowed) normalize differently across
harnesses even when the values agree — those were the only three
r04 hash-reds (wl_fingerprint fp decimal, conversation_stats /
compaction_plan HUGEINT sums).  Boolean-on-BOTH-sides is proven
driver-safe (kg_ask / conv_dedup / dedup_keep_best recorded green
with boolean cells), so booleans only flag when one side differs.

Discipline: no decimal on the Spark side, no DECIMAL / HUGEINT on
the DuckDB-oracle side — cast wide sums to BIGINT in the SQL, emit
exact wide fingerprints as decimal-digit strings.

Usage: python scripts/audit_cell_types.py [sf_dir]
Prints offending (query, column, type) rows; exit 1 if any.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SPARK_BAD = ("decimal",)
DUCK_BAD = ("DECIMAL", "HUGEINT", "INT128", "UHUGEINT")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from pyrdfa3_spark.session import build_session

    spark = build_session(master="local[8]", shuffle_partitions=8,
                          max_partition_bytes=8 << 20)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    bad = []
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            for col, dt in sdf.dtypes:
                if any(dt.startswith(b) for b in SPARK_BAD):
                    bad.append((name, "spark", col, dt))
                    print(f"SPARK {name}.{col}: {dt}")
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: spark {type(e).__name__}: {e}")
            bad.append((name, "spark", "<build>", "error"))
        if name not in oracles:
            continue
        try:
            desc = con.execute("DESCRIBE " + oracles[name]).fetchall()
            for row in desc:
                col, dt = row[0], row[1]
                if any(b in dt.upper() for b in DUCK_BAD):
                    bad.append((name, "duckdb", col, dt))
                    print(f"DUCK  {name}.{col}: {dt}")
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: duckdb {e}")
            bad.append((name, "duckdb", "<describe>", "error"))
    print(f"OFFENDERS: {len(bad)}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

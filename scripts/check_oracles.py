#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the
same sf, compare row count + order-insensitive value hash.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.12g}"
    return str(v)


def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from pyrdfa3_spark.session import build_session

    spark = build_session(master="local[8]", shuffle_partitions=8,
                          max_partition_bytes=8 << 20)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows "
                  f"({time.time() - t0:.1f}s, rows-only check)")
            if len(srows) == 0 and name != "dedup_exact":
                print(f"      WARNING: {name} returned 0 rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {e}")
            failures.append(name)
            continue
        sh, oh = frame_hash(scols, srows), frame_hash(ocols, orows)
        ok = (len(srows) == len(orows)
              and sorted(scols) == sorted(c.lower() for c in ocols)
              or sorted(scols) == sorted(ocols)) and sh == oh
        status = "OK  " if ok else "FAIL"
        print(f"{status}  {name}: spark={len(srows)} duckdb={len(orows)} "
              f"hash={'=' if sh == oh else '!'} ({time.time() - t0:.1f}s)")
        if not ok:
            failures.append(name)
            sset = {tuple(map(norm_cell, r)) for r in srows}
            oset = {tuple(map(norm_cell, r)) for r in orows}
            print("   spark cols:", scols, "duckdb cols:", ocols)
            for r in list(sset - oset)[:3]:
                print("   only-spark:", r)
            for r in list(oset - sset)[:3]:
                print("   only-duck :", r)
    print("FAILURES:", failures if failures else "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Hardware control for the scaling study: the same RDFa extraction
workload run through plain ``multiprocessing`` (no Spark, no JVM, no
Arrow) at 2/4/8/16/32 pinned processes.

Its per-process throughput decay measures the MACHINE's parallel-speedup
ceiling (CPU frequency scaling under load on this VM); Spark efficiency
in bench.py is judged against this ceiling, not against an ideal 4.0x —
see BENCH/BASELINE.md.

Run pinned: ``taskset -c 0-31 python scripts/scaling_control.py``.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 120_000


def work(args):
    lo, hi = args
    from pyrdfa3_spark.functions.hostlang import (
        host_for, is_xml_host, sniff_media_type,
    )
    from pyrdfa3_spark.operators.rdfa_engine import RDFaProcessor
    from pyrdfa3_spark.sources.dom import parse_html, parse_xml
    from pyrdfa3_spark.sources.fragments import render_fragment

    n = 0
    for i in range(lo, hi):
        _, frag = render_fragment(i % 20, i)
        host = host_for(sniff_media_type(frag))
        proc = RDFaProcessor(base="http://x/1", host=host)
        root = parse_xml(frag) if is_xml_host(host) else parse_html(frag)
        n += len(proc.process(root))
    return n


def main():
    out = {}
    for procs in (2, 4, 8, 16, 32):
        chunks = [(i * N_DOCS // procs, (i + 1) * N_DOCS // procs)
                  for i in range(procs)]
        with mp.Pool(procs) as pool:
            pool.map(work, [(0, 10)] * procs)  # warm imports
            t0 = time.time()
            pool.map(work, chunks)
            dt = time.time() - t0
        out[str(procs)] = {"sec": round(dt, 2),
                           "docs_per_sec": round(N_DOCS / dt),
                           "per_proc": round(N_DOCS / dt / procs)}
    out["ceiling_2_to_8"] = round(
        out["8"]["docs_per_sec"] / out["2"]["docs_per_sec"] / 4, 3)
    out["ceiling_8_to_32"] = round(
        out["32"]["docs_per_sec"] / out["8"]["docs_per_sec"] / 4, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

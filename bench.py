#!/usr/bin/env python
"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "throughput": {...}}

Scaling evidence (north rule: N vs 4N): ``BENCH_SCALING=1 python
bench.py`` additionally runs the extraction job (a) at local[2/8/32]
thread counts in one JVM and (b) on 1 vs 4 *real executor JVMs*
(local-cluster mode, 8 cores each, package shipped via addPyFile) on
the same input, reporting turns/sec at each level plus the scaling
efficiencies; results are recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_value(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


SF = _sf_value(SF_DIR)
# transcripts corpus sized by sf: sf0.1 -> ~410k turns (FIXTURES.md §1)
N_CONV = max(200, int(400_000 * SF))


def _bench_extraction(spark, n_conv: int, warmup: bool = True):
    """Measure extraction on a cached, materialized corpus: the metric is
    the pipeline's marginal throughput, not corpus synthesis or Python
    worker cold start (which amortize at production scale)."""
    from pyrdfa3_spark.plans.extract import extract_triples
    from pyrdfa3_spark.sources.transcripts import synth_transcripts

    t = synth_transcripts(spark, n_conv=n_conv, turns_per_conv=10,
                          skew_factor=100).cache()
    n_turns = t.count()
    if warmup:  # spawn + warm the executor Python workers
        extract_triples(t.limit(2000)).count()
    best, n_triples = float("inf"), 0
    for _ in range(3):  # best-of-3, same policy as the suite queries:
        t0 = time.time()  # stage-scheduling noise on the shared host
        n_triples = extract_triples(t).count()
        best = min(best, time.time() - t0)
    t.unpersist()
    return best, n_turns, n_triples


# scaling-study corpus: larger than the suite corpus so the highest
# parallelism level still runs for several seconds — at ~1.5s per pass
# JVM/GC timing noise dominates the 32-core measurement and the
# efficiency ratio swings wildly run-to-run
SCALING_N_CONV = int(os.environ.get("BENCH_SCALING_CONVS", "120000"))


def _extract_only(cores: int):
    """Subprocess worker for the scaling study: measure extraction at a
    given parallelism.  Run under ``taskset -c 0-(cores-1)`` so the
    measurement actually has `cores` CPUs — in plain local[N] mode the
    Python UDF workers are separate processes that would spill onto the
    other idle cores and inflate the small-N baseline."""
    from pyrdfa3_spark.plans.extract import extract_triples
    from pyrdfa3_spark.session import build_session
    from pyrdfa3_spark.sources.transcripts import synth_transcripts

    spark = build_session(master=f"local[{cores}]",
                          shuffle_partitions=max(cores, 8),
                          app_name=f"bench-scaling-{cores}",
                          max_partition_bytes=8 << 20)
    t = synth_transcripts(spark, n_conv=SCALING_N_CONV, turns_per_conv=10,
                          skew_factor=100).cache()
    n_turns = t.count()
    df = extract_triples(t)
    df.count()  # warm: python workers, codegen, JIT
    best = float("inf")
    for _ in range(3):  # steady state (JIT keeps improving for a while)
        t0 = time.time()
        df.count()
        best = min(best, time.time() - t0)
    spark.stop()
    print(json.dumps({"sec": round(best, 3),
                      "turns_per_sec": round(n_turns / best, 1)}))


def _cluster_extract_only(n_executors: int, cores: int = 8):
    """Subprocess worker for the *multi-executor* scaling study: Spark
    ``local-cluster`` mode spawns ``n_executors`` real executor JVMs
    (``cores`` each), so this measures the north rule's literal
    criterion — N vs 4N executors — rather than thread counts inside
    one JVM.  The package ships to executors via addPyFile (the
    --py-files path).  Pin to cores*n_executors CPUs with taskset.
    ``cores=2`` keeps the whole 1-vs-4 comparison inside the host's
    LINEAR region (2->8 busy CPUs) so executor-scaling efficiency is
    not confounded with the 32-core machine-saturation ceiling the
    no-Spark control documents."""
    import subprocess

    from pyrdfa3_spark.plans.extract import extract_triples
    from pyrdfa3_spark.session import build_session
    from pyrdfa3_spark.sources.transcripts import synth_transcripts

    repo_root = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(repo_root, "dist", "pyrdfa3_spark.zip")
    if not os.path.exists(zip_path):
        # NOTE: the script path must not route through dist/.. — on a
        # fresh checkout dist/ doesn't exist yet and the kernel refuses
        # to resolve ".." through a missing component (sh exit 2)
        subprocess.run(["sh", os.path.join(repo_root, "scripts",
                                           "package.sh")],
                       check=True, capture_output=True)
    spark = build_session(
        master=f"local-cluster[{n_executors},{cores},6144]",
        shuffle_partitions=max(cores * n_executors, 8),
        app_name=f"bench-cluster-{n_executors}x{cores}")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 << 20))
    spark.sparkContext.addPyFile(zip_path)
    t = synth_transcripts(spark, n_conv=SCALING_N_CONV, turns_per_conv=10,
                          skew_factor=100).cache()
    n_turns = t.count()
    df = extract_triples(t)
    df.count()  # warm: executor python workers, codegen, JIT
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        df.count()
        best = min(best, time.time() - t0)
    spark.stop()
    print(json.dumps({"sec": round(best, 3),
                      "turns_per_sec": round(n_turns / best, 1)}))


def _run_cluster_scaling(cores: int = 8) -> dict:
    """N=1 executor vs 4N=4 executors (``cores`` each), pinned CPUs,
    quietest of BENCH_SCALING_ROUNDS rounds."""
    import shutil
    import subprocess

    def one_run(n_exec: int) -> dict:
        cmd = []
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{cores * n_exec - 1}"]
        cmd += [sys.executable, os.path.abspath(__file__),
                "--cluster-extract-only", str(n_exec), str(cores)]
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=900, env=os.environ)
        line = out.stdout.strip().splitlines()[-1]
        time.sleep(8)
        return json.loads(line)

    rounds = int(os.environ.get("BENCH_SCALING_ROUNDS", "2"))
    best_round, best_total = None, float("inf")
    for _ in range(rounds):
        r = {n: one_run(n) for n in (1, 4)}
        total = sum(v["sec"] for v in r.values())
        if total < best_total:
            best_round, best_total = r, total
    out = {f"executors[{n}x{cores}]": best_round[n] for n in (1, 4)}
    out["efficiency_1_to_4_executors"] = round(
        (best_round[4]["turns_per_sec"]
         / best_round[1]["turns_per_sec"]) / 4, 3)
    out["method"] = ("local-cluster mode: real executor JVMs, package "
                     "shipped via addPyFile; taskset-pinned; quietest "
                     f"of {rounds} rounds")
    return out


def _run_scaling() -> dict:
    """N vs 4N evidence (north rule): same job, same input, pinned CPUs,
    throughput at each level + efficiency for both 2->8 and 8->32.

    CPUs are pinned with taskset because in plain local[N] mode the
    Python UDF workers are separate processes that would spill onto the
    machine's idle cores and corrupt the small-N baseline.  A pure
    multiprocessing control (scripts/scaling_control.py) measures the
    machine's own parallel-speedup ceiling (CPU frequency scaling) to
    separate hardware effects from framework overhead; see
    BENCH/BASELINE.md.
    """
    import shutil
    import subprocess

    def one_run(cores: int) -> dict:
        cmd = []
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{cores - 1}"]
        cmd += [sys.executable, os.path.abspath(__file__),
                "--extract-only", str(cores)]
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=900, env=os.environ)
        line = out.stdout.strip().splitlines()[-1]
        time.sleep(8)  # let the JVM fully exit — overlap with a
        # shutting-down 30-thread JVM corrupts the next measurement
        return json.loads(line)

    # The sandbox host is shared: ambient load routinely spikes and can
    # slow any single run 2-3x.  Run complete rounds of (2, 8, 32) and
    # report the quietest round (min total sec) so the efficiency ratio
    # is computed from measurements taken under the same conditions.
    rounds = int(os.environ.get("BENCH_SCALING_ROUNDS", "2"))
    levels = (2, 8, 32)
    best_round, best_total = None, float("inf")
    for _ in range(rounds):
        r = {c: one_run(c) for c in levels}
        total = sum(v["sec"] for v in r.values())
        if total < best_total:
            best_round, best_total = r, total

    scaling: dict = {f"local[{c}]": best_round[c] for c in levels}

    def eff(lo, hi):
        return round((scaling[f"local[{hi}]"]["turns_per_sec"]
                      / scaling[f"local[{lo}]"]["turns_per_sec"])
                     / (hi / lo), 3)

    scaling["efficiency_2_to_8"] = eff(2, 8)
    scaling["efficiency_8_to_32"] = eff(8, 32)
    scaling["method"] = (f"taskset-pinned CPUs; cached input; warmed "
                         f"workers; quietest of {rounds} rounds "
                         f"(shared host)")
    return scaling


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--extract-only":
        _extract_only(int(sys.argv[2]))
        return
    if len(sys.argv) > 2 and sys.argv[1] == "--cluster-extract-only":
        _cluster_extract_only(int(sys.argv[2]),
                              int(sys.argv[3]) if len(sys.argv) > 3
                              else 8)
        return

    from pyrdfa3_spark.plans import queries as Q
    from pyrdfa3_spark.session import build_session

    results: dict[str, float] = {}
    throughput: dict[str, float] = {}

    spark = build_session(master=f"local[{CPUS}]",
                          shuffle_partitions=max(CPUS, 8),
                          max_partition_bytes=8 << 20)

    # headline 1: the flagship extraction on the synthetic corpus
    _bench_extraction(spark, max(200, N_CONV // 10))  # worker warm-up
    dt, n_turns, n_triples = _bench_extraction(spark, N_CONV)
    results["rdfa_extract_synth"] = round(dt, 3)
    throughput["turns_per_sec"] = round(n_turns / dt, 1)
    throughput["triples_extracted"] = n_triples

    # headline 2+: operator suite on the driver's sf tables
    suite = [
        "rdfa_extract", "pricing_summary", "nation_revenue_topk",
        "user_event_sequence", "list_chain", "transitive_closure",
        "cosine_topk", "lsh_cosine_candidates", "fingerprint",
        "minhash_lsh_candidates", "simhash", "token_count",
        # SPARQL text front-end (parse+plan+execute — round-4: makes
        # front-end regressions visible in the headline)
        "sparql_compat_optional",
    ]
    for name in suite:
        fn = Q.QUERIES[name]
        fn(spark, SF_DIR).count()  # warm: codegen/JIT/scan init — at
        # production scale this per-query constant amortizes to zero
        best = float("inf")
        for _ in range(3):  # best-of-3: stage-scheduling noise is
            t0 = time.time()  # +-0.5s per query on the shared host
            fn(spark, SF_DIR).count()
            best = min(best, time.time() - t0)
        results[name] = round(best, 3)
    spark.stop()

    scaling = None
    if os.environ.get("BENCH_SCALING") == "1":
        scaling = _run_scaling()
        scaling["multi_executor"] = _run_cluster_scaling()
        # same 1-vs-4-executor criterion measured inside the host's
        # linear region (2 vs 8 busy CPUs): executor-count scaling
        # without the 32-core saturation confound
        scaling["multi_executor_linear_region"] = \
            _run_cluster_scaling(cores=2)

    out = {
        "metric": "headline_suite_total",
        "value": round(sum(results.values()), 3),
        "unit": "sec",
        "queries": results,
        "sf": SF,
        "throughput": throughput,
    }
    if scaling:
        out["scaling"] = scaling
    print(json.dumps(out))


if __name__ == "__main__":
    main()

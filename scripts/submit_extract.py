#!/usr/bin/env python
"""Production job entry point for spark-submit (north rule: "run via
spark-submit --py-files ... on a multi-executor cluster").

    spark-submit --master <cluster> \\
        --py-files dist/pyrdfa3_spark.zip \\
        scripts/submit_extract.py <transcripts_path> <output_path> \\
        [--buckets N] [--diagnostics PATH] [--synth N_CONV]

Reads a transcripts table (parquet; Iceberg in production — swap the
reader), extracts RDFa triples, writes the bucketed graph table and,
optionally, the diagnostics table.  ``--synth N`` generates the
deterministic fixture corpus instead of reading input (smoke runs).
All tuning (AQE, Arrow, shuffle partitions) comes from spark-submit
--conf; this script only declares the logical plan.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="transcripts parquet path, or '-' with --synth")
    ap.add_argument("output", help="triples output path")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--diagnostics", default=None)
    ap.add_argument("--synth", type=int, default=0,
                    help="generate N conversations instead of reading input")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("pyrdfa3-extract").getOrCreate()

    from pyrdfa3_spark.plans.extract import (
        extract_tagged, split_outputs, write_triples,
    )
    from pyrdfa3_spark.sources.transcripts import synth_transcripts

    t0 = time.time()
    if args.synth:
        transcripts = synth_transcripts(spark, n_conv=args.synth)
    else:
        transcripts = spark.read.parquet(args.input)

    tagged = extract_tagged(transcripts)
    if args.diagnostics:
        tagged = tagged.persist()
    triples, diags = split_outputs(tagged)
    write_triples(triples, args.output, buckets=args.buckets)
    n_triples = spark.read.parquet(args.output).count()
    n_diags = 0
    if args.diagnostics:
        diags.write.mode("overwrite").parquet(args.diagnostics)
        n_diags = spark.read.parquet(args.diagnostics).count()
        tagged.unpersist()
    print(json.dumps({
        "triples": n_triples,
        "diagnostics": n_diags,
        "elapsed_sec": round(time.time() - t0, 2),
        "output": args.output,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

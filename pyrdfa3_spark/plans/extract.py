"""The extraction pipeline: transcripts -> triples (+ diagnostics).

Spark-first layout (SURVEY.md §3.3):

    scan -> cheap rlike prefilter (pushed into the source scan)
         -> explicit repartition on pmod(hash(conv_id, turn_idx), P)
            (balances the skewed-conversation fixture: the unit of work
            is a *turn*, so a 100x conversation spreads across tasks)
         -> ONE Arrow-batched ``mapInArrow`` UDF
            (parse + RDFa processing + per-document dedup + deterministic
            skolemization; document graphs never cross the JVM boundary)
         -> tagged union of triple rows and diagnostic rows.

``mapInArrow`` rather than ``mapInPandas``: the pandas Block/Series
construction on both sides of the worker pipe is a fixed per-batch cost
that grows with worker count in local mode (measured ~30% of wall time
at 32 workers) and buys nothing — the engine consumes plain Python
strings and emits plain lists, so we hand Arrow arrays straight through.

Per-document RDF set semantics (reference: rdflib Graph dedup,
SURVEY.md §2 E16) is applied *inside* the UDF with a Python set —
a shuffle-free dedup, because a document is always processed by exactly
one UDF call.  Cross-document global dedup, when wanted, is the separate
:func:`pyrdfa3_spark.operators.graphops.dedup_triples`.
"""

from __future__ import annotations

import hashlib
import os
import sys
from collections.abc import Iterator
from typing import Optional

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType, IntegerType, StringType, StructField, StructType,
)

# cheap document-level fast path (reference: pyRdfa/parse.py:133-137 per
# node; here lifted to a scan predicate so Catalyst pushes it down —
# non-carrier turns never reach Python).  The second alternation keeps
# embedded-RDF-island-only documents (E14: <script type="text/turtle">,
# rdf:RDF in SVG) in the pipeline — they carry triples without any RDFa
# attribute.
RDFA_PREFILTER = (
    "(?i)<[^>]{0,1000}(property|typeof|about|resource|vocab|prefix|rel|rev"
    "|role|datatype)\\s*="
    "|(?i)text/turtle|<[^>]{0,200}:RDF[\\s>]"
)

TRIPLE_SCHEMA = StructType([
    StructField("kind", StringType()),        # 't' triple | 'd' diagnostic
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
    StructField("subj", StringType()),
    StructField("pred", StringType()),
    StructField("obj", StringType()),
    StructField("obj_is_iri", BooleanType()),
    StructField("obj_lang", StringType()),
    StructField("obj_datatype", StringType()),
])

_OUT_COLS = [f.name for f in TRIPLE_SCHEMA.fields]

ARROW_SCHEMA = pa.schema([
    ("kind", pa.string()),
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("obj_is_iri", pa.bool_()),
    ("obj_lang", pa.string()),
    ("obj_datatype", pa.string()),
])


def _extract_batches(batches: Iterator[pa.RecordBatch],
                     hturtle_only: bool = False,
                     microdata: bool = False,
                     max_doc_bytes: Optional[int] = None
                     ) -> Iterator[pa.RecordBatch]:
    """mapInArrow worker: one call per Arrow batch (bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch).  With ``microdata``
    the itemscope/itemprop walker runs on the same parsed DOM and its
    triples join the RDFa output — the one-pass combination the
    reference's StructuredDataParser performs (rdflibparsers.py:213-269)."""
    # imports stay inside so the function ships cleanly to executors
    from pyrdfa3_spark.functions.hostlang import (
        Host, adjust_xhtml_and_version, host_for, is_xml_host,
        sniff_media_type,
    )
    from pyrdfa3_spark.operators.microdata import extract_microdata
    from pyrdfa3_spark.operators.rdfa_engine import Literal, RDFaProcessor, is_bnode
    from pyrdfa3_spark.sources.dom import parse_html, parse_xml

    sys.setrecursionlimit(20000)  # engine recursion is depth-guarded at parse

    for batch in batches:
        rows = {c: [] for c in _OUT_COLS}

        def emit(kind, conv, turn, s, p, o, is_iri, lang, dt):
            rows["kind"].append(kind)
            rows["conv_id"].append(conv)
            rows["turn_idx"].append(turn)
            rows["subj"].append(s)
            rows["pred"].append(p)
            rows["obj"].append(o)
            rows["obj_is_iri"].append(is_iri)
            rows["obj_lang"].append(lang)
            rows["obj_datatype"].append(dt)

        for conv, turn, text in zip(batch.column("conv_id").to_pylist(),
                                    batch.column("turn_idx").to_pylist(),
                                    batch.column("text").to_pylist()):
            turn = int(turn)
            start = text.find("<")
            end = text.rfind(">")
            if start < 0 or end <= start:
                continue
            fragment = text[start:end + 1]
            if max_doc_bytes is not None and len(fragment) > max_doc_bytes:
                # web corpora carry multi-100MB spam pages; parsing one
                # is a ~linear but minutes-long straggler task, so the
                # opt-in guard skips it VISIBLY (diagnostics row, the
                # repo's no-silent-caps rule) instead of stalling a wave
                emit("d", conv, turn, "warning", "doc-too-large",
                     f"fragment {len(fragment)} bytes > "
                     f"max_doc_bytes={max_doc_bytes}; skipped",
                     None, None, None)
                continue
            base = f"http://transcript.local/{conv}/{turn}"
            media = sniff_media_type(fragment)
            host = host_for(media)
            rdfa_version = "1.1"
            if host == Host.XHTML:
                # DTD sniff may pin XHTML5 vs XHTML and RDFa 1.0 vs 1.1
                # (S5; reference host/__init__.py:174-203)
                host, rdfa_version = adjust_xhtml_and_version(
                    fragment, host, rdfa_version)
            proc = RDFaProcessor(base=base, host=host,
                                 rdfa_version=rdfa_version,
                                 hturtle_only=hturtle_only)
            pdiags: list = []
            try:
                root = (parse_xml(fragment) if is_xml_host(host)
                        else parse_html(fragment, diagnostics=pdiags))
                triples = proc.process(root)
                if microdata:
                    triples = triples + extract_microdata(root, base)
            except Exception as exc:  # per-document fault isolation
                emit("d", conv, turn, "error", type(exc).__name__,
                     str(exc)[:500], None, None, None)
                continue

            skolem_cache: dict[str, str] = {}

            def skolemize(term: str) -> str:
                # deterministic, parallelism-invariant bnode names keyed
                # on (conv_id, turn_idx, local label) — replaces the
                # reference's process-global registry
                # (pyRdfa/termorcurie.py:84-85)
                if term in skolem_cache:
                    return skolem_cache[term]
                h = hashlib.sha256(
                    f"{conv}\x1f{turn}\x1f{term}".encode()).hexdigest()[:24]
                sk = "_:sk" + h
                skolem_cache[term] = sk
                return sk

            seen = set()  # per-document RDF set semantics (E16)
            for s, p, o in triples:
                s_out = skolemize(s) if is_bnode(s) else s
                if isinstance(o, Literal):
                    key = (s_out, p, False, o.value, o.lang, o.datatype)
                    if key in seen:
                        continue
                    seen.add(key)
                    emit("t", conv, turn, s_out, p, o.value, False,
                         o.lang, o.datatype)
                else:
                    o_out = skolemize(o) if is_bnode(o) else o
                    key = (s_out, p, True, o_out, None, None)
                    if key in seen:
                        continue
                    seen.add(key)
                    emit("t", conv, turn, s_out, p, o_out, True, None, None)
            for severity, code, message in pdiags + proc.diagnostics:
                emit("d", conv, turn, severity, code, message[:500],
                     None, None, None)
        yield pa.RecordBatch.from_pydict(rows, schema=ARROW_SCHEMA)


def extract_tagged(transcripts: DataFrame,
                   repartition_to: Optional[int] = None,
                   prefilter: bool = True,
                   hturtle_only: bool = False,
                   microdata: bool = False,
                   max_doc_bytes: Optional[int] = None) -> DataFrame:
    """transcripts -> tagged union of triples ('t') and diagnostics ('d').

    ``max_doc_bytes``: opt-in straggler guard — fragments larger than
    this are skipped with a ``doc-too-large`` diagnostics row instead of
    parsed (parse cost is ~linear at ~1 MB/s/core, so one 300 MB spam
    page otherwise pins a task for minutes).

    ``repartition_to``: optional explicit shuffle on
    pmod(hash(conv_id, turn_idx)) before the UDF.  Extraction is
    embarrassingly parallel per *turn*, so when the source's own splits
    are size-balanced (Iceberg/parquet file splits are) the shuffle is
    pure overhead and stays off — measured on this harness it cost more
    than the whole extraction.  Turn it on when the upstream layout is
    pathologically skewed (e.g. one file per conversation with a 100x
    conversation): the (conv_id, turn_idx) hash then spreads the hot
    conversation across tasks instead of pinning it to one.
    """
    df = transcripts.select("conv_id", "turn_idx", "text")
    if prefilter:
        # in HTurtle mode only embedded-RDF islands carry triples, so
        # the relevance predicate is the island marker, not RDFa attrs;
        # microdata carriers are matched by their itemscope attribute
        pattern = ("(?i)text/turtle|<[^>]*:RDF" if hturtle_only
                   else RDFA_PREFILTER)
        if microdata:
            pattern += "|(?i)<[^>]{0,1000}itemscope"
        df = df.filter(F.col("text").rlike(pattern))
    if repartition_to is not None:
        df = df.repartition(repartition_to,
                            F.pmod(F.hash("conv_id", "turn_idx"),
                                   F.lit(repartition_to)))
    if hturtle_only or microdata or max_doc_bytes is not None:
        def run(batches):
            return _extract_batches(batches, hturtle_only=hturtle_only,
                                    microdata=microdata,
                                    max_doc_bytes=max_doc_bytes)

        return df.mapInArrow(run, schema=TRIPLE_SCHEMA)
    return df.mapInArrow(_extract_batches, schema=TRIPLE_SCHEMA)


def split_outputs(tagged: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split the tagged union; callers that need both should persist the
    tagged frame first to avoid re-running extraction."""
    triples = tagged.filter(F.col("kind") == "t").select(
        "conv_id", "turn_idx", "subj", "pred", "obj",
        "obj_is_iri", "obj_lang", "obj_datatype")
    diags = tagged.filter(F.col("kind") == "d").select(
        "conv_id", "turn_idx",
        F.col("subj").alias("severity"),
        F.col("pred").alias("code"),
        F.col("obj").alias("message"))
    return triples, diags


def extract_triples(transcripts: DataFrame,
                    repartition_to: Optional[int] = None) -> DataFrame:
    """transcripts -> triples DataFrame (diagnostics dropped)."""
    triples, _ = split_outputs(extract_tagged(transcripts, repartition_to))
    return triples


def write_triples(triples: DataFrame, path: str, buckets: int = 16) -> None:
    """Partitioned sink (S6).  Iceberg is the production target
    (``writeTo(...).partitionedBy(bucket(conv_id))``); this sandbox has no
    catalog, so we land parquet partitioned by an explicit conv bucket
    column — the same physical layout an Iceberg bucket transform yields.

    Files are zstd-compressed and sorted by (subj, pred) within each
    partition: subject-sorted row groups give parquet min/max statistics
    that prune subject-lookup scans, and run-length/dictionary encoding
    compresses the repeated IRIs far better than unsorted rows — both
    matter at the 100 TB graph-table size."""
    (triples
     .withColumn("conv_bucket", F.pmod(F.hash("conv_id"), F.lit(buckets)))
     .sortWithinPartitions("conv_bucket", "subj", "pred")
     .write.mode("overwrite")
     .option("compression", "zstd")
     .partitionBy("conv_bucket")
     .parquet(path))


def compact_triples(spark, path: str, max_files: int = 4,
                    target_bytes: int = 128 * 1024 * 1024) -> dict:
    """Small-file compaction for a :func:`write_triples` /
    ``run_bucketed`` table: incremental per-bucket appends accumulate
    many small parquet files, and at 100 TB the scan's task count (and
    the namenode/manifest pressure) grows with FILE count, not data
    size.  Each partition holding more than ``max_files`` data files is
    rewritten into ``ceil(bytes / target_bytes)`` files, re-sorted by
    ``(subj, pred)`` so the min/max-statistics pruning
    :func:`write_triples` established survives compaction.

    The rewrite is verify-then-swap per partition: the compacted copy
    lands in a sibling temp directory, its row count must equal the
    original's, and only then does a directory rename replace the old
    partition — a failed compaction leaves the table untouched.  In
    production this is exactly Iceberg's ``rewrite_data_files``
    (snapshot-isolated); the directory swap emulates it in the
    catalog-less sandbox.  Lineage manifests (``_lineage/``) describe
    bucket INPUT fingerprints, which compaction does not change.
    This whole-partition variant loops partition directories
    driver-side — fine for a bounded bucket count, but the 100 TB
    path is :func:`compact_triples_planned`, which routes the
    grouping decision through the distributed binpack planner
    (:func:`pyrdfa3_spark.plans.maintenance.compaction_plan`) and
    rewrites one bin-group at a time with a journaled resumable swap.

    Returns {partition: {files_before, files_after, rows}}.
    """
    import math
    import shutil

    report = {}
    for d in sorted(os.listdir(path)):
        full = os.path.join(path, d)
        if not (d.startswith("conv_bucket=") and os.path.isdir(full)):
            continue
        files = [f for f in os.listdir(full)
                 if f.endswith(".parquet") and not f.startswith(".")]
        if len(files) <= max_files:
            continue
        total = sum(os.path.getsize(os.path.join(full, f))
                    for f in files)
        n_out = max(1, math.ceil(total / target_bytes))
        df = spark.read.parquet(full)
        n_before = df.count()
        tmp = full + ".compacting"
        if os.path.isdir(tmp):            # crashed prior attempt
            shutil.rmtree(tmp)
        (df.coalesce(n_out)
         .sortWithinPartitions("subj", "pred")
         .write.mode("overwrite")
         .option("compression", "zstd")
         .parquet(tmp))
        n_after = spark.read.parquet(tmp).count()
        if n_after != n_before:
            shutil.rmtree(tmp)
            raise RuntimeError(
                f"compaction of {full} would change row count "
                f"({n_before} -> {n_after}); partition left untouched")
        shutil.rmtree(full)
        os.rename(tmp, full)
        report[d] = {"files_before": len(files),
                     "files_after": len([f for f in os.listdir(full)
                                         if f.endswith(".parquet")]),
                     "rows": n_before}
    return report


def _finish_compaction_swap(staging: str) -> bool:
    """Complete (or discard) a staged group rewrite.  With a journal
    present the rewrite is VERIFIED — deleting the inputs and moving
    the outputs is idempotent, so a crash anywhere in the swap is
    repaired by re-running this; without one the staged copy is
    unverified and is discarded.  Returns True if a swap was
    completed."""
    import json
    import shutil

    journal = os.path.join(staging, "_compact_journal.json")
    if not os.path.isfile(journal):
        shutil.rmtree(staging)
        return False
    with open(journal) as fh:
        j = json.load(fh)
    for p in j["inputs"]:
        if os.path.isfile(p):
            os.remove(p)
    for src, dst in j["outputs"].items():
        if os.path.isfile(src):
            os.replace(src, dst)
    shutil.rmtree(staging)
    return True


def compact_triples_planned(spark, path: str,
                            target_bytes: int = 128 * 1024 * 1024,
                            min_group_files: int = 2) -> dict:
    """Plan-driven small-file compaction: the grouping decision runs
    through the DISTRIBUTED binpack planner
    (:func:`pyrdfa3_spark.plans.maintenance.compaction_plan` — the
    two-phase prefix sum, no global window), and each resulting bin
    rewrites as one group.  This is the 100 TB path
    :func:`compact_triples` documents: a lake-scale listing is tens
    of millions of files, so the who-joins-which-rewrite decision
    must not be a driver-side loop over directories — only the final
    rewrite WORKLIST (one row per bin, manifest-scale) is collected.

    Files stay inside their partition: path order groups a
    partition's files contiguously, and a bin straddling a partition
    boundary splits into one rewrite group per partition, so no
    rewrite ever mixes partitions.  Each group reads exactly its
    member files, re-sorts by ``(subj, pred)`` (keeps the min/max
    stats pruning), and lands as ONE ~``target_bytes`` file.

    Crash safety (Iceberg ``rewrite_data_files`` emulated without a
    catalog): outputs stage into a sibling directory; after the row
    count verifies, a single journal file records inputs-to-delete
    and outputs-to-move, and only then does the swap run —
    delete-inputs / move-outputs are both idempotent, and any
    leftover staging directory found on the next run is completed
    (journal present = verified) or discarded (no journal =
    unverified) by :func:`_finish_compaction_swap`.  Lineage
    manifests (``_lineage/``) describe bucket INPUT fingerprints and
    are untouched.

    Returns {"groups": {(partition, bin): {files_before, rows}},
    "repaired": n} — ``repaired`` counts crashed prior swaps this
    run completed.
    """
    import json
    import shutil
    import uuid

    from pyrdfa3_spark.plans.maintenance import compaction_plan

    # repair FIRST, list SECOND — a journaled crashed swap still has
    # its inputs on disk, and a partition dir ("conv_bucket=3") sorts
    # before its own staging dir ("conv_bucket=3.bin….compacting"),
    # so an interleaved single pass would list input files the repair
    # is about to delete and the binpack plan would group dead paths
    repaired = 0
    for d in sorted(os.listdir(path)):
        full = os.path.join(path, d)
        if d.endswith(".compacting") and os.path.isdir(full):
            repaired += int(_finish_compaction_swap(full))
    listing = []
    for d in sorted(os.listdir(path)):
        full = os.path.join(path, d)
        if not (d.startswith("conv_bucket=") and os.path.isdir(full)):
            continue
        for f in sorted(os.listdir(full)):
            if f.endswith(".parquet") and not f.startswith("."):
                fp = os.path.join(full, f)
                listing.append((fp, os.path.getsize(fp), d))
    report: dict = {"groups": {}, "repaired": repaired}
    if not listing:
        return report
    files_df = spark.createDataFrame(
        listing, "path string, bytes bigint, part string")
    plan = compaction_plan(files_df.select("path", "bytes"),
                           target_bytes=target_bytes)
    groups = (plan.join(files_df.select("path", "part"), "path")
              .groupBy("part", "bin")
              .agg(F.sort_array(F.collect_list("path")).alias("paths"),
                   F.count(F.lit(1)).alias("n_files"))
              .filter(F.col("n_files") >= min_group_files)
              .orderBy("part", "bin")
              .collect())
    for row in groups:
        part, bin_, paths = row["part"], row["bin"], row["paths"]
        df = spark.read.parquet(*paths)
        n_before = df.count()
        staging = os.path.join(
            path, f"{part}.bin{bin_}.{uuid.uuid4().hex[:8]}.compacting")
        (df.coalesce(1)
         .sortWithinPartitions("subj", "pred")
         .write.mode("overwrite")
         .option("compression", "zstd")
         .parquet(staging))
        staged = [f for f in os.listdir(staging)
                  if f.endswith(".parquet") and not f.startswith(".")]
        n_after = spark.read.parquet(staging).count()
        if n_after != n_before:
            shutil.rmtree(staging)
            raise RuntimeError(
                f"compaction group {part}/bin{bin_} would change row "
                f"count ({n_before} -> {n_after}); inputs untouched")
        outputs = {
            os.path.join(staging, f):
            os.path.join(path, part,
                         f"compact-bin{bin_:06d}-"
                         f"{uuid.uuid4().hex[:8]}.parquet")
            for f in staged}
        journal = {"inputs": list(paths), "outputs": outputs}
        with open(os.path.join(staging, "_compact_journal.json"),
                  "w") as fh:
            json.dump(journal, fh)
        _finish_compaction_swap(staging)
        report["groups"][(part, int(bin_))] = {
            "files_before": len(paths), "rows": n_before}
    return report

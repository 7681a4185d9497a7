"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship KG-construction pipeline (transcripts ->
RDFa triples) on sf0.001; ``queries``/``oracle_sql`` expose every
implemented operator from SURVEY.md §2 plus the training-data operators,
with DuckDB-checkable ANSI-SQL oracles for all SQL-expressible ones.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: extract (subj, pred, obj) triples from RDFa
    fragments embedded in transcript turns derived from the sf0.001
    documents table."""
    from pyrdfa3_spark.plans.extract import extract_triples
    from pyrdfa3_spark.sources.transcripts import transcripts_from_documents

    transcripts = transcripts_from_documents(spark, "/root/testdata/sf0.001")
    return extract_triples(transcripts)


# The driver's per-round correctness window records the FIRST 50
# entries; rounds rotate this priority list so every registry entry
# accumulates a driver-recorded row.  Round-4 window: the operators
# never driver-recorded in rounds 1-3 (graph analytics, SHACL,
# sketches, similarity joins, bgp_/kg_ family, dedup family,
# transcript ops, round-3 SPARQL forms) plus this round's two new
# queries; everything already driver-green in CORRECTNESS_r01-r03
# follows after the window.
#
# ROUND-5 ROTATION PLAN (after CORRECTNESS_r04 lands, cumulative
# coverage is 154/178): lead the round-5 window with the 24 entries
# still never driver-recorded — sparql_ask, sparql_agg_concat,
# sparql_values_trailing, sparql_results_csv/json/tsv, skolemize,
# trig_serialize, normalize_text, interval_join, graph_diff,
# apply_diff, property_table, entity_disambiguate,
# graph_metrics_fixture, bm25, kg_describe, kg_group_concat, and the
# round-4 additions pii_scan, pii_redact, repetition_stats,
# tool_usage, role_transitions, domain_mix — plus anything new in
# round 5; that closes driver coverage at 178/178 (cumulative
# 154/178 after r04).
_ROUND4_WINDOW = [
    # new this round
    "sparql_exists_subst", "jsonld_infer_roundtrip",
    # graph analytics wave
    "pagerank", "hits", "k_core", "label_propagation",
    "triangle_count", "adamic_adar", "negative_samples",
    "wl_fingerprint", "kg_construct",
    # SHACL + sketches + similarity joins + sampling
    "shacl_report", "shacl_extended", "cms_token_counts",
    "hll_source_vocab", "prefix_similarity", "tfidf_similarity",
    "weighted_sample",
    # round-3 SPARQL forms
    "sparql_xsd_cast", "sparql_group_expr", "sparql_nps_inverse",
    "sparql_dataset_strict",
    # bgp_/kg_ family
    "bgp_match", "bgp_optional", "bgp_filter", "bgp_union",
    "bgp_path", "bgp_path_seq", "bgp_path_star", "bgp_graph",
    "bgp_values", "bgp_minus", "bgp_exists",
    "kg_group_count", "kg_having", "kg_topk", "kg_ask",
    # dedup family
    "dedup_keep_best", "remove_duplicate_spans", "url_dedup",
    "paragraph_dedup", "dedup_incremental", "near_dup_incremental",
    "conv_dedup",
    # transcript ops
    "conversation_stats", "merge_turns", "truncate_conversations",
    "stitch_conversations", "turn_latency",
    # maintenance
    "compaction_plan",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pyrdfa3_spark.plans.queries import QUERIES

    out = {n: QUERIES[n] for n in _ROUND4_WINDOW}
    out.update(QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from pyrdfa3_spark.plans.queries import oracles

    return oracles()

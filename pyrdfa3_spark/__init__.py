"""pyrdfa3_spark — a PySpark-native knowledge-graph construction engine.

From-scratch reimplementation of the RDFa 1.1 Core processing model (the
WHAT is pinned by the reference at /root/reference/pyRdfa, cited per-module
by file:line) as a Spark-first pipeline over tables of multi-turn
transcripts:

    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)
        -> triples(conv_id, turn_idx, subj, pred, obj,
                   obj_is_iri, obj_lang, obj_datatype)

Architecture (NOT a port):
  * one Arrow-batched ``mapInArrow`` UDF does document-local work
    (parse fragment -> evaluation-context propagation -> triple emission);
  * everything cross-document is declarative DataFrame algebra (broadcast
    joins for prefix/term dims, window functions for ordering/lists,
    dropDuplicates for RDF set semantics, anti-joins for graph rewrites,
    driver-side fixpoint loops for closure);
  * blank nodes are deterministically skolemized from
    (conv_id, turn_idx, label) so results are parallelism-invariant.
"""

__version__ = "0.1.0"

from pyrdfa3_spark.functions.constants import RDF, RDFA, XSD  # noqa: F401
from pyrdfa3_spark.graph import SparkDataset, SparkGraph  # noqa: F401

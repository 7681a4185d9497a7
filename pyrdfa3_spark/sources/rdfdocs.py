"""Distributed per-document RDF reader for the block formats (Turtle,
RDF/XML, TriG) — the source twins of ``to_turtle`` / ``to_rdfxml`` /
``to_trig``.

Unlike N-Triples / JSON-LD lines, these formats are NOT
line-splittable: prefix declarations and element nesting scope over
the whole document, so the unit of parallelism is the *document*, not
the line (the same boundary the RDFa extraction UDF uses).  Each row
carries one serialized document; an Arrow-batched ``mapInPandas``
walks the batch and runs the from-scratch parsers in
``functions/turtle.py`` (reference ingests these via rdflib's
``turtle``/``xml`` parsers when reloading cached vocab graphs,
pyRdfa/rdfs/cache.py).

Per-document error discipline: a document that fails to parse emits
ONE row with ``error`` set and null triple columns — never a task
failure (the extraction UDF's diagnostics-row rule).  Filter with
:func:`parse_errors`; triple rows always have ``error`` null.

Blank-node scoping: labels are document-scoped in both formats, so
each document's bnodes are rewritten to ``_:d<doc_id>b<n>`` — distinct
documents can never collide in the union graph (the same conv/turn
keyed skolemization discipline the extraction pipeline uses).

Output schema: ``doc_id, subj, pred, obj, obj_is_iri, obj_lang,
obj_datatype, error``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = ("doc_id bigint, subj string, pred string, obj string, "
               "obj_is_iri boolean, obj_lang string, obj_datatype string, "
               "error string")
_OUT_SCHEMA_QUADS = _OUT_SCHEMA.replace(
    "error string", "graph string, error string")

_FORMATS = ("turtle", "rdfxml", "trig")


def parse_rdf_documents(docs: DataFrame, fmt: str = "turtle",
                        id_col: str = "doc_id", text_col: str = "text",
                        base: str = "") -> DataFrame:
    """``(doc_id, text)`` frame of serialized RDF documents -> triples
    (+ per-document error rows); ``fmt="trig"`` adds a ``graph``
    column (None for default-graph statements).  See the module
    contract."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    quads = fmt == "trig"

    def run(batches):
        import pandas as pd

        from pyrdfa3_spark.operators.rdfa_engine import Literal

        cols = ("doc_id", "subj", "pred", "obj", "obj_is_iri",
                "obj_lang", "obj_datatype",
                *(("graph",) if quads else ()), "error")

        def parse_one(doc_id, text):
            counter = [0]

            def bnode():
                counter[0] += 1
                return f"_:d{doc_id}b{counter[0]}"

            if fmt == "turtle":
                from pyrdfa3_spark.functions.turtle import parse_turtle
                return parse_turtle(text, base=base, bnode_factory=bnode)
            if fmt == "trig":
                from pyrdfa3_spark.functions.turtle import parse_trig
                return parse_trig(text, base=base, bnode_factory=bnode)
            from pyrdfa3_spark.functions.turtle import parse_rdfxml_node
            from pyrdfa3_spark.sources.dom import parse_xml
            root = parse_xml(text)
            if root.tag.rpartition(":")[2] != "RDF":
                raise ValueError(f"document root is <{root.tag}>, "
                                 f"not rdf:RDF")
            return parse_rdfxml_node(root, base=base, bnode_factory=bnode)

        for pdf in batches:
            rows = {k: [] for k in cols}
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                try:
                    stmts = parse_one(doc_id, text or "")
                except Exception as exc:  # noqa: BLE001 — diagnostics row
                    rows["doc_id"].append(doc_id)
                    for k in cols[1:-1]:
                        rows[k].append(None)
                    rows["error"].append(f"{type(exc).__name__}: {exc}")
                    continue
                for stmt in stmts:
                    s, p, o = stmt[:3]
                    rows["doc_id"].append(doc_id)
                    rows["subj"].append(s)
                    rows["pred"].append(p)
                    if isinstance(o, Literal):
                        rows["obj"].append(o.value)
                        rows["obj_is_iri"].append(False)
                        rows["obj_lang"].append(o.lang)
                        rows["obj_datatype"].append(o.datatype)
                    else:
                        rows["obj"].append(o)
                        rows["obj_is_iri"].append(True)
                        rows["obj_lang"].append(None)
                        rows["obj_datatype"].append(None)
                    if quads:
                        rows["graph"].append(stmt[3])
                    rows["error"].append(None)
            yield pd.DataFrame(rows, columns=list(cols))

    src = docs.select(F.col(id_col).cast("bigint").alias(id_col),
                      F.col(text_col).cast("string").alias(text_col))
    return src.mapInPandas(
        run, schema=_OUT_SCHEMA_QUADS if quads else _OUT_SCHEMA)


def parse_errors(parsed: DataFrame) -> DataFrame:
    """The per-document failure rows of :func:`parse_rdf_documents` —
    the count a loader gates on before trusting the parse."""
    return parsed.filter(F.col("error").isNotNull()) \
        .select("doc_id", "error")


def triples_only(parsed: DataFrame) -> DataFrame:
    """The successful triple rows, with the error column dropped."""
    return parsed.filter(F.col("error").isNull()).drop("error")

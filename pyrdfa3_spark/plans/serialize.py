"""Serializer sinks (S6): N-Triples text export.

The reference serializes through rdflib (turtle/nt/xml/json-ld,
/root/reference/pyRdfa/__init__.py:722-725 and pyRdfaExtras/serializers).
The Spark-native sink is the partitioned triple table (plans/extract.py
``write_triples``); this module adds the interchange-text path as pure
Column algebra — one ``line`` column, writable with ``df.write.text``.
Escaping follows the N-Triples grammar (ECHAR: \\\\ \\" \\n \\r \\t).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _nt_escape(col):
    # order matters: backslash first
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    out = F.replace(out, F.lit("\t"), F.lit("\\t"))
    return out


def to_ntriples(triples: DataFrame) -> DataFrame:
    """triples(subj, pred, obj, obj_is_iri, obj_lang, obj_datatype) ->
    one-column DataFrame ``line`` of N-Triples statements."""
    subj = F.when(F.col("subj").startswith("_:"), F.col("subj")) \
        .otherwise(F.concat(F.lit("<"), F.col("subj"), F.lit(">")))
    pred = F.concat(F.lit("<"), F.col("pred"), F.lit(">"))
    lit_core = F.concat(F.lit('"'), _nt_escape(F.col("obj")), F.lit('"'))
    literal = F.when(F.col("obj_lang").isNotNull(),
                     F.concat(lit_core, F.lit("@"), F.col("obj_lang"))) \
        .when(F.col("obj_datatype").isNotNull(),
              F.concat(lit_core, F.lit("^^<"), F.col("obj_datatype"),
                       F.lit(">"))) \
        .otherwise(lit_core)
    obj = F.when(~F.col("obj_is_iri"), literal) \
        .when(F.col("obj").startswith("_:"), F.col("obj")) \
        .otherwise(F.concat(F.lit("<"), F.col("obj"), F.lit(">")))
    return triples.select(
        F.concat_ws(" ", subj, pred, obj, F.lit(".")).alias("line"))


def write_ntriples(triples: DataFrame, path: str) -> None:
    to_ntriples(triples).write.mode("overwrite").text(path)


# --------------------------------------------------------------------------
# Turtle export: subject-grouped, prefix-compressed.  Unlike N-Triples
# this needs per-subject grouping — groupBy(subj) + in-group sort, then
# string assembly per group; still pure Column algebra (collect_list of
# structs + aggregate), no Python in the path.
# --------------------------------------------------------------------------

TURTLE_DEFAULT_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "schema": "http://schema.org/",
    "dc": "http://purl.org/dc/terms/",
    "foaf": "http://xmlns.com/foaf/0.1/",
}


def _pname_or_iri(col, prefixes: dict[str, str]):
    """Compress an IRI to prefix:local when a prefix matches and the
    local part is PN-safe, else <iri>."""
    out = F.concat(F.lit("<"), col, F.lit(">"))
    for pr, ns in prefixes.items():
        local = F.substring(col, len(ns) + 1, 10_000)
        ok = col.startswith(ns) & local.rlike(r"^[A-Za-z0-9_.\-]*$") \
            & ~local.endswith(".")
        out = F.when(ok, F.concat(F.lit(pr + ":"), local)).otherwise(out)
    return out


def to_turtle(triples: DataFrame,
              prefixes: dict[str, str] | None = None) -> DataFrame:
    """triples -> one row per subject with a ``block`` column of turtle
    text; prepend :func:`turtle_header` when writing."""
    prefixes = TURTLE_DEFAULT_PREFIXES if prefixes is None else prefixes
    subj = F.when(F.col("subj").startswith("_:"), F.col("subj")) \
        .otherwise(_pname_or_iri(F.col("subj"), prefixes))
    pred = F.when(F.col("pred") == TURTLE_DEFAULT_PREFIXES["rdf"] + "type",
                  F.lit("a")) \
        .otherwise(_pname_or_iri(F.col("pred"), prefixes))
    lit_core = F.concat(F.lit('"'), _nt_escape(F.col("obj")), F.lit('"'))
    literal = F.when(F.col("obj_lang").isNotNull(),
                     F.concat(lit_core, F.lit("@"), F.col("obj_lang"))) \
        .when(F.col("obj_datatype").isNotNull(),
              F.concat(lit_core, F.lit("^^"),
                       _pname_or_iri(F.col("obj_datatype"), prefixes))) \
        .otherwise(lit_core)
    obj = F.when(~F.col("obj_is_iri"), literal) \
        .when(F.col("obj").startswith("_:"), F.col("obj")) \
        .otherwise(_pname_or_iri(F.col("obj"), prefixes))
    po = F.concat(pred, F.lit(" "), obj)
    grouped = (triples
               .select(subj.alias("s"), po.alias("po"))
               .groupBy("s")
               .agg(F.array_sort(F.collect_list("po")).alias("pos")))
    block = F.concat(F.col("s"), F.lit(" "),
                     F.concat_ws(" ;\n    ", F.col("pos")), F.lit(" ."))
    return grouped.select(block.alias("block")).orderBy("block")


def turtle_header(prefixes: dict[str, str] | None = None) -> str:
    prefixes = TURTLE_DEFAULT_PREFIXES if prefixes is None else prefixes
    return "".join(f"@prefix {p}: <{ns}> .\n" for p, ns in
                   sorted(prefixes.items()))


def write_turtle(triples: DataFrame, path: str,
                 prefixes: dict[str, str] | None = None) -> None:
    spark = triples.sparkSession
    header = spark.createDataFrame(
        [(turtle_header(prefixes),)], ["block"])
    header.unionByName(to_turtle(triples, prefixes)) \
        .coalesce(1).write.mode("overwrite").text(path)

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

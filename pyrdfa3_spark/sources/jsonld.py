"""Distributed JSON-LD-lines reader — the source twin of the
``to_jsonld`` sink in ``plans/serialize.py``.

The reference loads JSON-LD through rdflib's json-ld plugin (the
serializer registrations in pyRdfaExtras); at lake scale the
interchange form is the *expanded node-per-line* layout our sink
emits: one flat ``{"@id": subj, pred: [term, ...], ...}`` object per
line.  That makes the parse perfectly distributable — each line is an
independent JSON document, so the whole reader is scan-side column
algebra: one ``from_json`` per line plus map/array explodes.  No
Python, no shuffle; a 100 TB dump parses at scan speed with
filter/column pushdown intact.

Contract:
  * expanded node lines only (what :func:`to_jsonld` without a context
    emits); @context-compacted lines need the context to expand keys
    and are out of scope here — re-expand them at write time or keep
    the expanded sidecar;
  * blank lines are skipped; anything ``from_json`` cannot parse into
    the node shape, or that lacks ``"@id"``, is EXCLUDED from the
    parse and reported by :func:`parse_errors` (the reader's
    diagnostics-row discipline, same as ``sources/ntriples.py``);
  * term objects follow the sink's shape: ``{"@id": iri}`` for IRI
    objects, ``{"@value": lex}`` with optional ``"@language"`` /
    ``"@type"`` for literals.

Output schema matches the sink's input: ``subj, pred, obj,
obj_is_iri, obj_lang, obj_datatype``, so
``parse_jsonld(to_jsonld(g))`` is the identity on the triple set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, MapType, StringType, StructField,
                               StructType)

_TERM_TYPE = StructType([
    StructField("@id", StringType()),
    StructField("@value", StringType()),
    StructField("@language", StringType()),
    StructField("@type", StringType()),
])

_NODE_TYPE = MapType(StringType(), ArrayType(_TERM_TYPE))

# the sink renders '{"@id":<json-string>,' first; stripping it leaves a
# homogeneous {pred: [term...]} object that from_json can type as a map
_ID_PREFIX_RE = r'^\{"@id":"(?:[^"\\]|\\.)*",'


def parse_jsonld(lines: DataFrame, col: str = "jsonld") -> DataFrame:
    """``(jsonld)`` frame of expanded node lines -> triples.  See the
    module contract."""
    c = F.col(col)
    body = F.from_json(
        F.regexp_replace(c, _ID_PREFIX_RE, "{"), _NODE_TYPE)
    parsed = (lines
              .filter(F.trim(c) != "")
              .select(F.get_json_object(c, "$['@id']").alias("subj"),
                      body.alias("body"))
              .filter(F.col("subj").isNotNull()
                      & F.col("body").isNotNull())
              .select("subj", F.explode("body").alias("pred", "terms"))
              .select("subj", "pred", F.explode("terms").alias("t")))
    is_iri = F.col("t.@id").isNotNull()
    return parsed.select(
        "subj", "pred",
        F.coalesce(F.col("t.@id"), F.col("t.@value")).alias("obj"),
        is_iri.alias("obj_is_iri"),
        F.col("t.@language").alias("obj_lang"),
        F.when(~is_iri, F.col("t.@type")).alias("obj_datatype"))


def read_jsonld(spark, path: str) -> DataFrame:
    """Parse a JSON-LD-lines dump from disk — ``spark.read.text`` feeds
    the scan-side parser, so partitioning follows the file splits."""
    return parse_jsonld(spark.read.text(path).withColumnRenamed(
        "value", "jsonld"))


def parse_errors(lines: DataFrame, col: str = "jsonld") -> DataFrame:
    """Non-blank lines that fail the node shape (unparseable JSON, or
    no ``"@id"`` key) — the count a loader gates on before trusting
    the parse."""
    c = F.col(col)
    body = F.from_json(
        F.regexp_replace(c, _ID_PREFIX_RE, "{"), _NODE_TYPE)
    return (lines
            .filter(F.trim(c) != "")
            .filter(F.get_json_object(c, "$['@id']").isNull()
                    | body.isNull())
            .select(c.alias("line")))


# ------------------------------------------------------------------ #
# @context-compacted lines (source twin of to_jsonld(context=...))
# ------------------------------------------------------------------ #

def _expand_iri(col, context: dict[str, str]):
    """CURIE -> IRI under ``context`` (the inverse of the sink's
    ``_compact_iri``): ``pr:local`` expands when ``pr`` is a declared
    prefix and the local part is term-safe, anything else passes
    through.  Prefix names cannot contain ':', so at most one prefix
    matches — no ordering subtlety."""
    out = col
    for pr, ns in context.items():
        local = F.substring(col, len(pr) + 2, 10_000)
        ok = (col.startswith(pr + ":")
              & local.rlike(r"^[A-Za-z0-9_.\-]*$"))
        out = F.when(ok, F.concat(F.lit(ns), local)).otherwise(out)
    return out


def parse_jsonld_compact(lines: DataFrame, context: dict[str, str],
                         col: str = "jsonld") -> DataFrame:
    """``(jsonld)`` frame of @context-compacted node lines (what
    ``to_jsonld(context=...)`` emits) -> triples, expanding CURIE keys
    and values against the same caller-pinned ``context``.

    The term arrays are heterogeneous (bare JSON strings for plain
    literals, objects for IRI/lang/typed terms), so elements parse as
    VARIANT: the variant preserves the JSON token type, which makes a
    literal whose TEXT looks like a term object (``'{"@value":"x"}'``
    as a plain string) still classify correctly — ``$.@id``/``$.@value``
    extraction on a string-token variant is NULL by type.  Everything
    stays scan-side column algebra: one from_json + two explodes, no
    Python, no shuffle.

    Contract caveats:
      * the ``{"@context": ...}`` sidecar line is skipped;
      * graph terms that are ALREADY CURIE-shaped under a context
        prefix (lake stores allow them) expand like every other CURIE
        and so do not round-trip — compaction itself erases that
        distinction; serialize such stores expanded, or skolemize
        first;
      * malformed / @id-less lines are excluded and reported by
        :func:`parse_errors_compact`.
    """
    from pyspark.sql.types import VariantType

    from pyrdfa3_spark.functions.constants import RDF_TYPE

    c = F.col(col)
    body = F.from_json(
        F.regexp_replace(c, _ID_PREFIX_RE, "{"),
        MapType(StringType(), ArrayType(VariantType())))
    rows = (lines
            .filter(F.trim(c) != "")
            .filter(F.get_json_object(c, "$['@context']").isNull())
            .select(F.get_json_object(c, "$['@id']").alias("s"),
                    body.alias("body"))
            .filter(F.col("s").isNotNull() & F.col("body").isNotNull())
            .select("s", F.explode("body").alias("key", "terms"))
            .select("s", "key", F.explode("terms").alias("t")))
    tid = F.try_variant_get("t", "$.@id", "string")
    tval = F.try_variant_get("t", "$.@value", "string")
    tlang = F.try_variant_get("t", "$.@language", "string")
    tdt = F.try_variant_get("t", "$.@type", "string")
    tstr = F.try_variant_get("t", "$", "string")
    is_type = F.col("key") == "@type"
    subj = F.when(F.col("s").startswith("_:"), F.col("s")) \
        .otherwise(_expand_iri(F.col("s"), context))
    obj = (F.when(is_type | tid.isNotNull(),
                  _expand_iri(F.coalesce(tid, tstr), context))
           .when(tval.isNotNull(), tval)
           .otherwise(tstr))
    return rows.select(
        subj.alias("subj"),
        F.when(is_type, F.lit(RDF_TYPE))
        .otherwise(_expand_iri(F.col("key"), context)).alias("pred"),
        obj.alias("obj"),
        (is_type | tid.isNotNull()).alias("obj_is_iri"),
        F.when(~is_type & tid.isNull(), tlang).alias("obj_lang"),
        F.when(~is_type & tid.isNull() & tval.isNotNull(),
               _expand_iri(tdt, context)).alias("obj_datatype"))


def read_jsonld_compact(spark, path: str,
                        context: dict[str, str]) -> DataFrame:
    """Parse a compacted JSON-LD-lines dump from disk (the context is
    the caller's — the sidecar line is skipped, not interpreted)."""
    return parse_jsonld_compact(
        spark.read.text(path).withColumnRenamed("value", "jsonld"),
        context)


def parse_errors_compact(lines: DataFrame,
                         col: str = "jsonld") -> DataFrame:
    """Non-blank, non-sidecar lines that fail the compacted node shape
    (unparseable JSON, or no ``"@id"`` key)."""
    from pyspark.sql.types import VariantType

    c = F.col(col)
    body = F.from_json(
        F.regexp_replace(c, _ID_PREFIX_RE, "{"),
        MapType(StringType(), ArrayType(VariantType())))
    return (lines
            .filter(F.trim(c) != "")
            .filter(F.get_json_object(c, "$['@context']").isNull())
            .filter(F.get_json_object(c, "$['@id']").isNull()
                    | body.isNull())
            .select(c.alias("line")))

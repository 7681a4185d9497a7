"""Serializer sinks: N-Triples escaping and Turtle round-trip."""

from __future__ import annotations

from pyrdfa3_spark.functions.turtle import parse_turtle
from pyrdfa3_spark.operators.rdfa_engine import Literal
from pyrdfa3_spark.plans.serialize import (
    to_ntriples, to_turtle, turtle_header,
)

from tests.graph_compare import diff, isomorphic

ROWS = [
    ("http://schema.org/Person", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
     "http://www.w3.org/2000/01/rdf-schema#Class", True, None, None),
    ("http://ex.org/s", "http://schema.org/name", 'A "quoted"\nname',
     False, "en", None),
    ("http://ex.org/s", "http://schema.org/age", "42", False, None,
     "http://www.w3.org/2001/XMLSchema#integer"),
    ("_:b1", "http://schema.org/knows", "http://ex.org/s", True, None, None),
    ("http://ex.org/s", "http://schema.org/tag", "back\\slash",
     False, None, None),
]
COLS = ["subj", "pred", "obj", "obj_is_iri", "obj_lang", "obj_datatype"]


def _expected_triples():
    out = []
    for s, p, o, is_iri, lang, dt in ROWS:
        out.append((s, p, o if is_iri else Literal(o, lang, dt)))
    return out


def test_ntriples_escaping(spark):
    df = spark.createDataFrame(ROWS, COLS)
    lines = {r["line"] for r in to_ntriples(df).collect()}
    assert ('<http://ex.org/s> <http://schema.org/name> '
            '"A \\"quoted\\"\\nname"@en .') in lines
    assert ('<http://ex.org/s> <http://schema.org/tag> '
            '"back\\\\slash" .') in lines


def test_turtle_roundtrip(spark):
    df = spark.createDataFrame(ROWS, COLS)
    blocks = [r["block"] for r in to_turtle(df).collect()]
    text = turtle_header() + "\n".join(blocks)
    assert "schema:Person a rdfs:Class" in text
    assert '"42"^^xsd:integer' in text
    reparsed = parse_turtle(text)
    assert isomorphic(reparsed, _expected_triples()), \
        diff(reparsed, _expected_triples()) + "\n---\n" + text

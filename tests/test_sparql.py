"""SPARQL text front-end: parsing + execution against the operator
algebra (the rdflib ``Graph.query(text)`` surface; reference consumers
run SPARQL strings over pyRdfa's emitted graphs)."""

from __future__ import annotations

import pytest

from pyrdfa3_spark.operators.sparql import (
    SparqlError, SparqlUnsupported, parse, sparql,
)


@pytest.fixture(scope="module")
def kg(spark):
    rows = [
        ("a", "p:knows", "b"), ("b", "p:knows", "c"),
        ("a", "p:name", "Ada"), ("b", "p:name", "Bob"),
        ("b", "p:name", "Bobby"), ("c", "p:knows", "c"),
        ("a", "p:type", "Person"), ("b", "p:type", "Person"),
    ]
    return spark.createDataFrame(rows, ["subj", "pred", "obj"])


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_select_join_filter_order(kg):
    out = _rows(sparql(kg, """
        SELECT ?x ?n WHERE {
          ?x p:knows ?y ; p:type "Person" .
          ?y p:name ?n .
          FILTER (STRSTARTS(?n, "Bob"))
        } ORDER BY ?n"""))
    assert out == [("a", "Bob"), ("a", "Bobby")]


def test_select_star_distinct_limit(kg):
    out = _rows(sparql(kg, """
        SELECT DISTINCT ?x WHERE { ?x p:name ?n } ORDER BY ?x"""))
    assert out == [("a",), ("b",)]
    assert sparql(kg, "SELECT * WHERE { ?s ?p ?o } LIMIT 3").count() == 3


def test_ask(kg):
    assert sparql(kg, "ASK { ?x p:knows ?x }").collect()[0]["result"]
    assert not sparql(
        kg, 'ASK { ?x p:name "Nobody" }').collect()[0]["result"]


def test_aggregates_group_concat_having(kg):
    out = _rows(sparql(kg, """
        SELECT ?x (COUNT(?n) AS ?cnt) WHERE { ?x p:name ?n }
        GROUP BY ?x HAVING (?cnt > 1)"""))
    assert out == [("b", 2)]
    out = _rows(sparql(kg, """
        SELECT ?x (GROUP_CONCAT(?n; SEPARATOR=", ") AS ?names)
        WHERE { ?x p:name ?n } GROUP BY ?x ORDER BY ?x"""))
    assert out == [("a", "Ada"), ("b", "Bob, Bobby")]
    # global aggregate: no GROUP BY
    out = _rows(sparql(
        kg, "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }"))
    assert out == [(8,)]


def test_property_paths(kg):
    out = _rows(sparql(
        kg, "SELECT ?x ?z WHERE { ?x p:knows+ ?z } ORDER BY ?x ?z"))
    assert out == [("a", "b"), ("a", "c"), ("b", "c"), ("c", "c")]
    out = _rows(sparql(kg, """
        SELECT ?n WHERE { "a" p:knows/p:name ?n }"""))
    assert sorted(out) == [("Bob",), ("Bobby",)]
    out = _rows(sparql(kg, """
        SELECT ?y WHERE { "b" ^p:knows ?y }"""))
    assert out == [("a",)]
    out = _rows(sparql(kg, """
        SELECT DISTINCT ?o WHERE { "b" p:name|p:knows ?o } ORDER BY ?o"""))
    assert out == [("Bob",), ("Bobby",), ("c",)]
    out = _rows(sparql(kg, """
        SELECT ?o WHERE { "c" !(p:name|p:type) ?o }"""))
    assert out == [("c",)]


def test_union_optional_minus_exists_values_bind(kg):
    out = _rows(sparql(kg, """
        SELECT ?x ?n WHERE {
          { ?x p:knows "c" . ?x p:name ?n } UNION { ?x p:type ?n }
        } ORDER BY ?x ?n"""))
    assert out == [("a", "Person"), ("b", "Bob"), ("b", "Bobby"),
                   ("b", "Person")]
    out = _rows(sparql(kg, """
        SELECT ?x ?n WHERE {
          ?x p:type "Person" . OPTIONAL { ?x p:nope ?n }
        } ORDER BY ?x"""))
    assert out == [("a", None), ("b", None)]
    out = _rows(sparql(kg, """
        SELECT ?x WHERE {
          ?x p:type "Person" . MINUS { ?x p:knows "b" } }"""))
    assert out == [("b",)]
    out = _rows(sparql(kg, """
        SELECT ?x WHERE {
          ?x p:type "Person" .
          FILTER NOT EXISTS { ?x p:knows "b" } }"""))
    assert out == [("b",)]
    out = _rows(sparql(kg, """
        SELECT ?x ?who WHERE {
          ?x p:name ?n .
          VALUES (?n ?who) { ("Ada" "ada!") ("Bob" UNDEF) }
        } ORDER BY ?x"""))
    assert out == [("a", "ada!"), ("b", None)]
    out = _rows(sparql(kg, """
        SELECT ?x ?v WHERE { ?x p:name ?n . BIND (STRLEN(?n) AS ?v) }
        ORDER BY ?x ?v"""))
    assert out == [("a", 3), ("b", 3), ("b", 5)]


def test_construct_and_prefixes(kg):
    out = sorted(_rows(sparql(kg, """
        PREFIX ex: <http://ex/>
        CONSTRUCT { ?y ex:knownBy ?x } WHERE { ?x p:knows ?y }""")))
    assert out == [("b", "http://ex/knownBy", "a"),
                   ("c", "http://ex/knownBy", "b"),
                   ("c", "http://ex/knownBy", "c")]
    # declared prefixes expand; undeclared pass through as CURIE text
    assert sparql(kg, """
        PREFIX ex: <http://ex/>
        SELECT ?s WHERE { ?s ex:nope ?o }""").count() == 0
    assert sparql(kg, "SELECT ?s WHERE { ?s p:knows ?o }").count() == 3


def test_describe(spark):
    rows = [("n", "p:a", "_:b1"), ("_:b1", "p:b", "leaf"),
            ("other", "p:a", "x")]
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    out = sorted(_rows(sparql(t, "DESCRIBE <n>")))
    assert out == [("_:b1", "p:b", "leaf"), ("n", "p:a", "_:b1")]


def test_parse_errors(kg):
    with pytest.raises(SparqlError):
        parse("SELECT WHERE { ?s ?p ?o }")         # empty projection
    with pytest.raises(SparqlError):
        parse("SELECT ?s WHERE { ?s ?p ?o } nonsense")
    with pytest.raises(SparqlUnsupported):
        parse("SELECT ?s WHERE { ?s (p:a/p:b)+ ?o }")  # nested path mod
    with pytest.raises(SparqlUnsupported):
        parse("""SELECT ?s WHERE {
            ?s p:a ?o . { ?s p:b ?x } UNION { ?s p:c ?x } }""")
    with pytest.raises(SparqlError, match="GROUP BY"):
        sparql(kg, """SELECT ?x ?n (COUNT(?n) AS ?c)
                      WHERE { ?x p:name ?n } GROUP BY ?x""")
    with pytest.raises(SparqlError, match="HAVING"):
        sparql(kg, "SELECT ?s WHERE { ?s ?p ?o } HAVING (?s > 1)")
    with pytest.raises(SparqlUnsupported):
        parse('SELECT ?s WHERE { ?s p:a "x"^^<http://t> }')


def test_graph_facade_text_query(spark, kg):
    from pyrdfa3_spark.graph import SparkGraph

    g = SparkGraph(kg)
    out = _rows(g.query(
        "SELECT ?n WHERE { \"a\" p:name ?n }"))
    assert out == [("Ada",)]
    with pytest.raises(ValueError, match="inline"):
        g.query("SELECT ?n WHERE { ?s p:name ?n }", filters=["1=1"])

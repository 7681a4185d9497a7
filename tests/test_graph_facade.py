"""SparkGraph facade: the rdflib-Graph-shaped API surface."""

from __future__ import annotations

import pytest

from pyrdfa3_spark.graph import SparkGraph


@pytest.fixture(scope="module")
def g(spark):
    rows = [
        ("a", "p:knows", "b"), ("b", "p:knows", "c"),
        ("a", "p:name", "Ada"), ("b", "p:name", "Bob"),
        ("b", "p:name", "Bobby"),
        ("a", "p:knows", "b"),             # duplicate row
    ]
    return SparkGraph(spark.createDataFrame(
        rows, ["subj", "pred", "obj"]))


def test_triples_wildcards_and_contains(g):
    assert g.triples((None, "p:knows", None)).count() == 3  # bag rows
    assert {r["obj"] for r in g.triples(("a", None, None)).collect()} \
        == {"b", "Ada"}
    assert ("a", "p:knows", "b") in g
    assert ("a", "p:knows", "zzz") not in g


def test_len_is_set_semantics_and_helpers(g):
    assert len(g) == 5                      # dup row collapses
    assert {r["subj"] for r in g.subjects("p:name").collect()} \
        == {"a", "b"}
    assert {r["obj"] for r in g.objects("b", "p:name").collect()} \
        == {"Bob", "Bobby"}
    assert g.value("a", "p:name") == "Ada"
    assert g.value("b", "p:name") == "Bob"  # deterministic min
    assert g.value("zzz", "p:name") is None
    assert len(list(g.iter_triples())) == 6


def test_add_remove_and_set_ops(spark, g):
    g2 = g.add(("c", "p:name", "Cy"))
    assert ("c", "p:name", "Cy") in g2
    assert ("c", "p:name", "Cy") not in g    # immutability

    gone = g.remove((None, "p:name", None))
    assert gone.triples((None, "p:name", None)).isEmpty()
    assert len(g.remove((None, None, None))) == 0

    other = SparkGraph(spark.createDataFrame(
        [("a", "p:knows", "b"), ("x", "p:knows", "y")],
        ["subj", "pred", "obj"]))
    assert len(g + other) == 6
    assert len(g - other) == 4
    assert len(g * other) == 1


def test_query_verbs_and_serialize(g):
    sols = g.query([("?x", "p:knows", "?y"), ("?y", "p:name", "?n")])
    assert {(r["x"], r["n"]) for r in sols.collect()} \
        == {("a", "Bob"), ("a", "Bobby")}
    assert g.ask([("?x", "p:name", "Ada")]) is True
    assert g.ask([("?x", "p:name", "Zed")]) is False

    derived = g.construct([("?x", "p:knows", "?y")],
                          template=[("?y", "p:knownBy", "?x")])
    assert ("b", "p:knownBy", "a") in derived

    lines = {r["line"] for r in g.serialize("nt").collect()}
    assert "<a> <p:knows> <b> ." in lines
    with pytest.raises(ValueError):
        g.serialize("csv")


def test_skolemize_roundtrip_and_transcripts(spark):
    turns = spark.createDataFrame(
        [("c1", 0, "user",
          '<div vocab="http://schema.org/"><div typeof="Place">'
          '<span property="name">Paris</span></div></div>', None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string")
    kg = SparkGraph.from_transcripts(turns)
    assert len(kg) == 3
    sk = kg.skolemize()
    assert sk.triples().filter("subj LIKE '_:%'").isEmpty()
    assert len(sk.de_skolemize() * kg) == len(kg)
    # describe a skolemized entity end-to-end
    name_subj = [r["subj"] for r in
                 sk.triples((None, "http://schema.org/name", None))
                 .collect()][0]
    assert len(sk.describe([name_subj])) == 2

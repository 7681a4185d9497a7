"""Embedded-RDF merge (E14): turtle scripts in HTML, rdf:RDF in SVG
(reference: pyRdfa/embeddedRDF.py:23-87)."""

from __future__ import annotations

from pyrdfa3_spark.functions.constants import RDF_FIRST, RDF_NIL, RDF_TYPE
from pyrdfa3_spark.functions.hostlang import Host
from pyrdfa3_spark.functions.turtle import parse_turtle
from pyrdfa3_spark.operators.rdfa_engine import Literal, RDFaProcessor
from pyrdfa3_spark.sources.dom import parse_html, parse_xml

from tests.graph_compare import diff, isomorphic

BASE = "http://fixture.test/doc"


def test_turtle_basics():
    ttl = """
    @prefix ex: <http://example.org/> .
    @base <http://b.example/> .
    ex:a a ex:Thing ; ex:name "Joe"@en, "J\\"oe" ;
         ex:age "30"^^<http://www.w3.org/2001/XMLSchema#integer> ;
         ex:rel <rel/x> .
    _:b1 ex:knows _:b1 .
    [] ex:items ( ex:i1 "two" 3 ) .
    """
    out = parse_turtle(ttl)
    ex = "http://example.org/"
    got = set()
    for s, p, o in out:
        got.add((s, p, o if not isinstance(o, Literal)
                 else ("lit", o.value, o.lang, o.datatype)))
    assert (ex + "a", RDF_TYPE, ex + "Thing") in got
    assert (ex + "a", ex + "name", ("lit", "Joe", "en", None)) in got
    assert (ex + "a", ex + "name", ("lit", 'J"oe', None, None)) in got
    assert (ex + "a", ex + "age",
            ("lit", "30", None, "http://www.w3.org/2001/XMLSchema#integer")) in got
    assert (ex + "a", ex + "rel", "http://b.example/rel/x") in got
    # named bnode self-link
    assert any(s.startswith("_:") and s == o and p == ex + "knows"
               for s, p, o in out if isinstance(o, str))
    # collection: 3 firsts, chain ends with nil
    firsts = [t for t in out if t[1] == RDF_FIRST]
    assert len(firsts) == 3
    assert any(t[2] == RDF_NIL for t in out if t[1] ==
               "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest")


def test_turtle_script_merged_in_html():
    html = ('<html><body>'
            '<script type="text/turtle">'
            '@prefix s: &lt;http://schema.org/&gt; .'
            '&lt;#me&gt; s:name "Turtle Joe" .'
            '</script>'
            '<div about="#rdfa" property="http://schema.org/name">R</div>'
            '</body></html>')
    # html.parser keeps script content raw (CDATA mode), so use real <>
    html = html.replace("&lt;", "<").replace("&gt;", ">")
    proc = RDFaProcessor(base=BASE, host=Host.HTML5)
    actual = proc.process(parse_html(html))
    assert isomorphic(actual, [
        (BASE + "#me", "http://schema.org/name",
         Literal("Turtle Joe", None, None)),
        (BASE + "#rdfa", "http://schema.org/name", Literal("R", None, None)),
    ]), diff(actual, [])


def test_rdfxml_in_svg():
    svg = ('<svg xmlns="http://www.w3.org/2000/svg">'
           '<metadata>'
           '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
           ' xmlns:dc="http://purl.org/dc/terms/">'
           '<rdf:Description rdf:about="#pic" dc:title="A picture">'
           '<dc:creator><rdf:Description rdf:about="#artist">'
           '<dc:name xml:lang="EN">Art Ist</dc:name>'
           '</rdf:Description></dc:creator>'
           '<dc:rights rdf:resource="http://l.example/cc"/>'
           '</rdf:Description></rdf:RDF></metadata>'
           '<g about="#pic" property="dc:format" content="image/svg+xml"/>'
           '</svg>')
    proc = RDFaProcessor(base=BASE, host=Host.SVG)
    actual = proc.process(parse_xml(svg))
    dc = "http://purl.org/dc/terms/"
    expected = [
        (BASE + "#pic", dc + "title", Literal("A picture", None, None)),
        (BASE + "#pic", dc + "creator", BASE + "#artist"),
        (BASE + "#artist", dc + "name", Literal("Art Ist", "en", None)),
        (BASE + "#pic", dc + "rights", "http://l.example/cc"),
        (BASE + "#pic", dc + "format",
         Literal("image/svg+xml", None, None)),
    ]
    assert isomorphic(actual, expected), diff(actual, expected)


def test_turtle_boolean_and_single_quote_literals():
    """Turtle grammar completeness: true/false boolean literals and
    single-quoted (short + long) strings — previously tokenizer
    errors; 'true:' stays usable as a prefix name."""
    from pyrdfa3_spark.functions.turtle import parse_turtle

    [(s, p, o)] = parse_turtle("<urn:s> <urn:p> true .")
    assert (o.value, o.datatype) == (
        "true", "http://www.w3.org/2001/XMLSchema#boolean")
    [(_, _, o)] = parse_turtle("<urn:s> <urn:p> 'sq\\'x' .")
    assert (o.value, o.lang, o.datatype) == ("sq'x", None, None)
    [(_, _, o)] = parse_turtle("<urn:s> <urn:p> '''a\nb''' .")
    assert o.value == "a\nb"
    [(_, _, o)] = parse_turtle("<urn:s> <urn:p> 'x'@fr .")
    assert o.lang == "fr"
    # plain "true" strings stay strings; true: works as a prefix
    [(_, _, o)] = parse_turtle('<urn:s> <urn:p> "true" .')
    assert o.datatype is None
    assert parse_turtle(
        "@prefix true: <urn:t:> . true:a <urn:p> true:b .") == [
        ("urn:t:a", "urn:p", "urn:t:b")]

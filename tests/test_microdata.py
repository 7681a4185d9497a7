"""Microdata walker parity vs hand-computed W3C microdata-to-RDF
expectations, and the combined RDFa+microdata structured pass."""

from __future__ import annotations

from pyrdfa3_spark.operators.microdata import extract_microdata
from pyrdfa3_spark.operators.rdfa_engine import Literal
from pyrdfa3_spark.sources.dom import parse_html

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
S = "http://schema.org/"


def _md(doc, base="http://ex.org/doc"):
    return extract_microdata(parse_html(doc), base)


def test_typed_item_with_itemid_and_value_tags():
    doc = ('<div itemscope itemtype="http://schema.org/Person" '
           'itemid="#me">'
           '<span itemprop="name">Alice</span>'
           '<a itemprop="url" href="/home">here</a>'
           '<img itemprop="image" src="pic.png">'
           '<meta itemprop="age" content="30">'
           '<time itemprop="birthDate" datetime="1990-01-02">x</time>'
           '</div>')
    assert set(_md(doc)) == {
        ("http://ex.org/doc#me", RDF_TYPE, S + "Person"),
        ("http://ex.org/doc#me", S + "name", Literal("Alice", None, None)),
        ("http://ex.org/doc#me", S + "url", "http://ex.org/home"),
        ("http://ex.org/doc#me", S + "image", "http://ex.org/pic.png"),
        ("http://ex.org/doc#me", S + "age", Literal("30", None, None)),
        ("http://ex.org/doc#me", S + "birthDate",
         Literal("1990-01-02", None, None)),
    }


def test_nested_item_and_lang_inheritance():
    doc = ('<div lang="en" itemscope itemtype="http://schema.org/Person">'
           '<span itemprop="name">Bob</span>'
           '<div itemprop="address" itemscope '
           'itemtype="http://schema.org/PostalAddress">'
           '<span itemprop="addressLocality" lang="de">Wien</span>'
           '</div></div>')
    out = _md(doc)
    persons = [t for t in out if t[1] == RDF_TYPE and t[2] == S + "Person"]
    assert len(persons) == 1
    p = persons[0][0]
    assert p.startswith("_:md")
    addr = [t[2] for t in out if t[1] == S + "address"][0]
    assert addr.startswith("_:md") and addr != p
    assert (p, S + "name", Literal("Bob", "en", None)) in out
    assert (addr, S + "addressLocality", Literal("Wien", "de", None)) in out
    assert (addr, RDF_TYPE, S + "PostalAddress") in out


def test_untyped_item_skips_relative_props_keeps_absolute():
    doc = ('<div itemscope>'
           '<span itemprop="name">skipped</span>'
           '<span itemprop="http://p.example/abs">kept</span></div>')
    out = _md(doc)
    assert len(out) == 1
    assert out[0][1] == "http://p.example/abs"
    assert out[0][2] == Literal("kept", None, None)


def test_multiple_types_and_props_and_hash_vocab():
    doc = ('<div itemscope itemtype="http://v.example/vocab#Thing '
           'http://other.example/T2" itemid="urn:x:1">'
           '<span itemprop="a b">v</span></div>')
    out = set(_md(doc))
    assert ("urn:x:1", RDF_TYPE, "http://v.example/vocab#Thing") in out
    assert ("urn:x:1", RDF_TYPE, "http://other.example/T2") in out
    # vocabulary from the FIRST type, hash-terminated
    assert ("urn:x:1", "http://v.example/vocab#a",
            Literal("v", None, None)) in out
    assert ("urn:x:1", "http://v.example/vocab#b",
            Literal("v", None, None)) in out


def test_text_content_concatenation():
    doc = ('<div itemscope itemtype="http://schema.org/Thing">'
           '<span itemprop="description">a <b>deep</b> text</span></div>')
    out = _md(doc)
    assert any(t[2] == Literal("a deep text", None, None) for t in out)


def test_structured_pass_combines_rdfa_and_microdata(spark):
    """One parse, both extractors (reference StructuredDataParser)."""
    from pyrdfa3_spark.plans.extract import extract_tagged, split_outputs

    rows = [
        ("c1", 0, "u",
         '<div vocab="http://schema.org/" about="#r" '
         'property="name">via rdfa</div>', "b", None),
        ("c1", 1, "u",
         '<div itemscope itemtype="http://schema.org/Thing" '
         'itemid="#m"><span itemprop="name">via microdata</span></div>',
         "b", None),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    triples, _ = split_outputs(extract_tagged(t, microdata=True))
    got = {(r["subj"], r["pred"], r["obj"]) for r in triples.collect()}
    assert ("http://transcript.local/c1/0#r", S + "name",
            "via rdfa") in got
    assert ("http://transcript.local/c1/1#m", S + "name",
            "via microdata") in got
    assert ("http://transcript.local/c1/1#m", RDF_TYPE,
            S + "Thing") in got
    # without the flag the microdata-only turn emits nothing
    plain, _ = split_outputs(extract_tagged(t))
    assert plain.filter("turn_idx = 1").count() == 0


def test_itemref_borrows_properties():
    """itemref crawls referenced elements (themselves included) as part
    of the item, with cycle tolerance."""
    doc = ('<div itemscope itemtype="http://schema.org/Person" '
           'itemid="#p" itemref="extra licenses"></div>'
           '<p id="extra"><span itemprop="name">Carol</span></p>'
           '<a id="licenses" itemprop="url" href="/c">c</a>')
    out = set(_md(doc))
    assert ("http://ex.org/doc#p", S + "name",
            Literal("Carol", None, None)) in out
    assert ("http://ex.org/doc#p", S + "url", "http://ex.org/c") in out

    # dangling + repeated refs are ignored, not fatal
    doc2 = ('<div itemscope itemtype="http://schema.org/Thing" '
            'itemid="#t" itemref="nope nope"></div>')
    assert set(_md(doc2)) == {
        ("http://ex.org/doc#t",
         "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", S + "Thing")}


def test_itemref_chain_through_nested_items_terminates():
    """An itemref whose referenced subtree holds a nested itemscope
    that itself carries an itemref (a reference CHAIN, including a
    mutual A<->B shape) must terminate and emit each borrowed
    property once per item."""
    doc = ('<div itemscope itemtype="http://schema.org/Person" '
           'itemid="#A" itemref="pb"></div>'
           '<div itemscope itemtype="http://schema.org/Person" '
           'itemid="#B" itemref="pa"></div>'
           '<span id="pa" itemprop="name">Alice</span>'
           '<span id="pb" itemprop="friend" itemscope '
           'itemtype="http://schema.org/Person" itemref="pa"></span>')
    out = _md(doc)
    # B borrows name via #pa; the nested friend item borrows it too
    assert ("http://ex.org/doc#B", S + "name",
            Literal("Alice", None, None)) in out
    friends = [t[2] for t in out
               if t[0] == "http://ex.org/doc#A" and t[1] == S + "friend"]
    assert len(friends) == 1
    assert (friends[0], S + "name", Literal("Alice", None, None)) in out


def test_itemref_nested_item_in_reference():
    doc = ('<div itemscope itemtype="http://schema.org/Person" '
           'itemid="#p2" itemref="addr"></div>'
           '<div id="addr" itemprop="address" itemscope '
           'itemtype="http://schema.org/PostalAddress">'
           '<span itemprop="addressLocality">Graz</span></div>')
    out = _md(doc)
    addr = [t[2] for t in out if t[1] == S + "address"]
    assert len(addr) == 1 and addr[0].startswith("_:md")
    assert (addr[0], S + "addressLocality",
            Literal("Graz", None, None)) in out


def test_untyped_nested_item_inherits_current_vocabulary():
    # spec evaluation context: a nested item with no itemtype of its
    # own inherits the enclosing item's current vocabulary, so its
    # non-absolute property names still resolve
    doc = ('<div itemscope itemtype="http://schema.org/Person" '
           'itemid="#p">'
           '<div itemprop="address" itemscope itemid="#a">'
           '<span itemprop="streetAddress">Main St 1</span>'
           '</div></div>')
    out = set(_md(doc))
    assert ("http://ex.org/doc#a", S + "streetAddress",
            Literal("Main St 1", None, None)) in out
    assert ("http://ex.org/doc#p", S + "address",
            "http://ex.org/doc#a") in out


def test_registry_prefix_wins_over_heuristic():
    # https variant of schema.org is a registry entry; hcalendar's
    # fragment-style prefix would mislead the up-to-last-# heuristic
    # if the registry did not match first
    doc = ('<div itemscope itemtype="https://schema.org/Person" '
           'itemid="#p"><span itemprop="name">A</span></div>')
    assert ("http://ex.org/doc#p", "https://schema.org/name",
            Literal("A", None, None)) in set(_md(doc))

    doc2 = ('<div itemscope itemid="#e" itemtype='
            '"http://microformats.org/profile/hcalendar#vevent">'
            '<span itemprop="dtstart">2020</span></div>')
    assert ("http://ex.org/doc#e",
            "http://microformats.org/profile/hcalendar#dtstart",
            Literal("2020", None, None)) in set(_md(doc2))


def test_stray_untyped_item_still_skips_relative_props():
    # a TOP-LEVEL untyped item has no vocabulary to inherit: relative
    # names skip (documented contract), absolute ones still emit
    doc = ('<div itemscope itemid="#x">'
           '<span itemprop="name">skipped</span>'
           '<span itemprop="http://ex.org/p">kept</span></div>')
    out = set(_md(doc))
    assert ("http://ex.org/doc#x", "http://ex.org/p",
            Literal("kept", None, None)) in out
    assert not any(p.endswith("name") for _s, p, _o in out)


def test_hcard_registry_vocab_inserts_separator():
    # the hcard TYPE has no '#', but its property URIs do — the
    # registry maps the type prefix to the '#'-terminated vocabulary
    doc = ('<div itemscope itemid="#c" '
           'itemtype="http://microformats.org/profile/hcard">'
           '<span itemprop="fn">Ada</span></div>')
    assert ("http://ex.org/doc#c",
            "http://microformats.org/profile/hcard#fn",
            Literal("Ada", None, None)) in set(_md(doc))


def test_vocab_fallback_hash_wins_over_slash():
    """W3C vocabulary derivation: a type containing '#' keeps
    everything up to and including the LAST '#', even with later
    slashes in the path before it."""
    doc = ('<div itemscope itemtype="http://ex.com/vocabs/v1#Thing">'
           '<span itemprop="n">x</span></div>')
    out = _md(doc)
    assert ("_:md1", "http://ex.com/vocabs/v1#n",
            Literal("x", None, None)) in out


def test_vocab_fallback_last_path_slash():
    """No '#': vocabulary is the type up to and including the last
    '/' of the PATH (authority slashes never count)."""
    doc = ('<div itemscope itemtype="http://ex.com/vocab/Thing">'
           '<span itemprop="n">x</span></div>')
    out = _md(doc)
    assert ("_:md1", "http://ex.com/vocab/n",
            Literal("x", None, None)) in out


def test_vocab_fallback_no_delimiter_inserts_hash():
    """The '#'-insertion corner: a type with neither '#' nor a path
    '/' IS the vocabulary, and predicate concatenation inserts the
    '#' separator (same rule the registry's hcard entry encodes)."""
    doc = ('<div itemscope itemtype="urn:x-vocab:Thing">'
           '<span itemprop="n">x</span></div>')
    out = _md(doc)
    assert ("_:md1", RDF_TYPE, "urn:x-vocab:Thing") in out
    assert ("_:md1", "urn:x-vocab:Thing#n",
            Literal("x", None, None)) in out
    # authority-only http type: no path '/' -> same insertion rule
    doc2 = ('<div itemscope itemtype="http://ex.com">'
            '<span itemprop="n">x</span></div>')
    assert ("_:md1", "http://ex.com#n",
            Literal("x", None, None)) in _md(doc2)


def test_vocab_no_delimiter_inherits_into_nested_untyped():
    """The delimiter-less vocabulary flows into nested untyped items
    like any other current vocabulary (spec evaluation context)."""
    doc = ('<div itemscope itemtype="urn:x-vocab:Thing">'
           '<div itemprop="sub" itemscope>'
           '<span itemprop="m">y</span></div></div>')
    out = _md(doc)
    assert ("_:md2", "urn:x-vocab:Thing#m",
            Literal("y", None, None)) in out


def test_https_schema_org_registry_hit():
    """The registry carries both schema.org schemes; an https type
    compacts against the https vocabulary, not the heuristic."""
    doc = ('<div itemscope itemtype="https://schema.org/Person">'
           '<span itemprop="name">Eve</span></div>')
    out = _md(doc)
    assert ("_:md1", "https://schema.org/name",
            Literal("Eve", None, None)) in out

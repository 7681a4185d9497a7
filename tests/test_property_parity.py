"""Property-based reference parity: random RDFa fragments, both engines.

Hypothesis generates small element trees with random combinations of
RDFa attributes (the cross-product space the fixed fixture templates
cannot cover), runs the actual reference (via scripts/refshim) and our
engine on the same DOM, and asserts bnode-insensitive graph
isomorphism.  ``derandomize=True`` keeps CI deterministic; bump
``max_examples`` locally for deeper hunts, and set ``PARITY_RANDOM=1``
for fresh randomized exploration per run (background hunting).
"""

from __future__ import annotations

import os
import sys

import pytest
from hypothesis import given, settings, strategies as st

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts", "refshim"))
sys.path.insert(0, "/root/reference")

from tests.graph_compare import diff, isomorphic  # noqa: E402

# -- fragment generator ----------------------------------------------------

_IRIS = ["http://a.example/p", "http://b.example/q#r", "#frag", "rel/path",
         ""]
_CURIES = ["ex:one", "ex:two", "schema:name", "nosuch:x", ":next", "_:b1"]
_TERMS = ["license", "next", "Widget", "nonsenseterm"]
_LITS = ["plain text", "", "42", "2026-01-02", "a  b\tc"]
# attribute values avoid \t\n\r: the sandbox reference parses through
# minidom, which applies XML attribute-value normalization (tab ->
# space), while html5lib (the reference's production HTML parser) and
# our html.parser path both preserve them — engine semantics agree,
# only the oracle's DOM would differ.  Tabs stay in *text* content,
# where every parser preserves them.
_ATTR_LITS = [v for v in _LITS if "\t" not in v] + ["a  b c"]
_LANGS = ["en", "de-AT", ""]
_DTYPES = ["xsd:integer", "xsd:date", "rdf:XMLLiteral",
           "http://t.example/custom", ""]

attr_value = {
    "about": st.sampled_from(_IRIS + _CURIES + ["[ex:safe]", "[]"]),
    "resource": st.sampled_from(_IRIS + _CURIES + ["[ex:safe]", "[]"]),
    "href": st.sampled_from(_IRIS),
    "src": st.sampled_from(_IRIS),
    "property": st.sampled_from(_CURIES + _TERMS + _IRIS[:2] + [
        "ex:one ex:two", ""]),
    "rel": st.sampled_from(_CURIES + _TERMS + ["ex:one nosuch:y"]),
    "rev": st.sampled_from(_CURIES),
    "typeof": st.sampled_from(_CURIES + _TERMS + ["ex:one ex:two", ""]),
    "content": st.sampled_from(_ATTR_LITS),
    "datatype": st.sampled_from(_DTYPES),
    "lang": st.sampled_from(_LANGS),
    "vocab": st.sampled_from(["http://schema.org/", "http://v.example/",
                              ""]),
    "inlist": st.just(""),
    "xml:lang": st.sampled_from(_LANGS),
    "role": st.sampled_from(["navigation", "ex:custom", "banner main"]),
    "id": st.sampled_from(["anchor1", "z9"]),
    "datetime": st.sampled_from(["2026-02-03", "11:22", "P2D", "-P2D",
                                 "2026", "junk"]),
    # honored per-element in SVG/XML hosts, ignored in HTML (reference
    # state.py:156-157 vs host ACCEPT_XML_BASE) — both paths must agree
    # with the reference either way
    "xml:base": st.sampled_from(["http://xb.example/a/",
                                 "http://xb.example/b/x", "sub/"]),
}

element = st.builds(
    lambda tag, attrs, text: (tag, attrs, text),
    st.sampled_from(["div", "span", "time", "p"]),
    st.dictionaries(st.sampled_from(sorted(attr_value)), st.none(),
                    max_size=4).flatmap(
        lambda keys: st.fixed_dictionaries(
            {k: attr_value[k] for k in keys})),
    st.sampled_from(_LITS),
)


def _render(tree, in_p: bool = False) -> str:
    (tag, attrs, text), children = tree
    if in_p and tag in ("div", "p"):
        # the sandbox reference parses through minidom (literal XML
        # nesting; html5lib absent), but html5lib — and our parser,
        # which implements the documented fixup — closes an open <p>
        # when a block element starts (tests/test_malformed_html.py
        # covers that zone with hand-written spec expectations).  The
        # minidom oracle cannot represent the fixed-up tree, so the
        # generator keeps <p> content inline: same RDFa attribute
        # semantics, one DOM both sides agree on.
        tag = "span"
    a = "".join(f' {k}="{v}"' for k, v in sorted(attrs.items()))
    inner = text + "".join(_render(c, in_p or tag == "p")
                           for c in children)
    return f"<{tag}{a}>{inner}</{tag}>"


trees = st.recursive(
    st.builds(lambda e: (e, []), element),
    lambda kids: st.builds(lambda e, cs: (e, cs), element,
                           st.lists(kids, max_size=3)),
    max_leaves=6,
)


# mode -> (wrapper template, media type, our host, rdfa_version).
# html5 exercises the tolerant-parse + expat fast path; svg the XML
# host (minidom on BOTH sides -> pure engine comparison incl. xml:base);
# v10 the RDFa 1.0 algorithm (xmlns: declarations only, parse.py:325-486)
_MODES = {
    "html5": ('<div prefix="ex: http://ex.example/ns#" '
              'vocab="http://schema.org/">{}</div>',
              "text/html", "1.1"),
    "svg": ('<svg xmlns="http://www.w3.org/2000/svg" '
            'xmlns:ex="http://ex.example/ns#" '
            'xml:base="http://svgbase.example/dir/" '
            'prefix="ex: http://ex.example/ns#" '
            'vocab="http://schema.org/">{}</svg>',
            "image/svg+xml", "1.1"),
    "v10": ('<div xmlns:ex="http://ex.example/ns#">{}</div>',
            "text/html", "1.0"),
}


def _run_reference(fragment: str, base: str, mode: str):
    import xml.dom.minidom as minidom

    import rdflib  # the shim
    from pyRdfa import pyRdfa as PyRdfaClass
    from pyRdfa.options import Options

    from pyrdfa3_spark.operators.rdfa_engine import Literal

    _, media, version = _MODES[mode]
    opts = Options(output_default_graph=True,
                   output_processor_graph=False,
                   embedded_rdf=False, vocab_expansion=False)
    opts.set_host_language(media)
    proc = PyRdfaClass(options=opts, base=base, rdfa_version=version)
    if mode == "svg":
        dom = minidom.parseString(fragment)
    else:
        dom = minidom.parseString(f"<html><body>{fragment}</body></html>")
    graph = proc.graph_from_DOM(dom)
    out = []
    for (s, p, o) in graph:
        s2 = "_:" + str(s) if isinstance(s, rdflib.BNode) else str(s)
        if isinstance(o, rdflib.Literal):
            o2 = Literal(o.value, o.language,
                         str(o.datatype) if o.datatype else None)
        elif isinstance(o, rdflib.BNode):
            o2 = "_:" + str(o)
        else:
            o2 = str(o)
        out.append((s2, str(p), o2))
    return out


def _run_ours(fragment: str, base: str, mode: str):
    from pyrdfa3_spark.functions.hostlang import Host
    from pyrdfa3_spark.operators.rdfa_engine import RDFaProcessor
    from pyrdfa3_spark.sources.dom import parse_html, parse_xml

    _, _, version = _MODES[mode]
    if mode == "svg":
        proc = RDFaProcessor(base=base, host=Host.SVG,
                             rdfa_version=version)
        root = parse_xml(fragment)
    else:
        proc = RDFaProcessor(base=base, host=Host.HTML5,
                             rdfa_version=version)
        root = parse_html(f"<html><body>{fragment}</body></html>")
    return proc.process(root)


@pytest.mark.parametrize("mode", sorted(_MODES))
@settings(max_examples=int(os.environ.get("PARITY_EXAMPLES", "100")),
          derandomize=os.environ.get("PARITY_RANDOM") is None,
          deadline=None)
@given(tree=trees)
def test_random_fragment_parity(tree, mode):
    fragment = _MODES[mode][0].format(_render(tree))
    base = "http://prop.test/doc"
    ref = _run_reference(fragment, base, mode)
    ours = _run_ours(fragment, base, mode)
    assert isomorphic(ours, ref), (
        diff(ours, ref) + "\n--- fragment:\n" + fragment)


# -- robustness fuzz: arbitrary text must never escape as a crash ---------

# token soup rather than a character alphabet: fragments of real RDFa
# syntax recombined wrongly (unclosed tags, dangling quotes, stray
# brackets) reach much deeper into the parser and resolvers than
# uniformly random characters would
_FUZZ_TOKENS = st.sampled_from([
    "<div ", "<span", "</div>", ">", "/>", '"', "'", "=",
    "property=", "about=", 'rel="ex:a', "typeof", "[ex:x]", "[]", "_:b",
    "prefix=\"ex:", "http://x/", "#f", "&amp;", "&bogus;", "&#x41;",
    "<script type=\"text/turtle\">", "</script>", "@prefix p: <u> .",
    "<!--", "-->", "<!DOCTYPE html>", "\t", "\n", " ", "z", "é", "∞",
])


@settings(max_examples=int(os.environ.get("PARITY_EXAMPLES", "100")),
          derandomize=os.environ.get("PARITY_RANDOM") is None,
          deadline=None)
@given(st.lists(_FUZZ_TOKENS, min_size=0, max_size=40).map("".join))
def test_engine_never_crashes_on_garbage(text):
    """The extraction worker isolates per-document faults; the engine
    itself must either parse garbage tolerantly or raise an exception
    the UDF converts to a diagnostics row — never corrupt state."""
    from pyrdfa3_spark.functions.hostlang import Host
    from pyrdfa3_spark.operators.rdfa_engine import RDFaProcessor
    from pyrdfa3_spark.sources.dom import parse_html

    proc = RDFaProcessor(base="http://fz.test/d", host=Host.HTML5)
    try:
        out = proc.process(parse_html(text))
    except Exception:
        return  # caught per-document in the UDF -> diagnostics row
    assert isinstance(out, list)
    for t in out:
        assert len(t) == 3 and t[0] is not None and t[1] is not None

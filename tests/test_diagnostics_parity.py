"""Processor-graph spot checks (FIXTURES.md §5): documents with
deliberate errors must produce warnings on BOTH sides — the reference's
processor graph (run through the shim) and our diagnostics channel.
Checked as "warning present per document", not byte-exact messages,
matching the reference's structured-warning design
(pyRdfa/options.py:48-99)."""

from __future__ import annotations

import os
import sys
import xml.dom.minidom as minidom

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts", "refshim"))
sys.path.insert(0, "/root/reference")

from pyrdfa3_spark.functions.hostlang import Host  # noqa: E402
from pyrdfa3_spark.operators.rdfa_engine import RDFaProcessor  # noqa: E402
from pyrdfa3_spark.sources.dom import parse_html  # noqa: E402

BAD_DOCS = [
    # undefined prefix inside a safe CURIE -> dropped + warning
    '<div about="[nosuch:x]" property="http://s.org/p" content="v"></div>',
    # illegal (unterminated) safe CURIE
    '<div about="[broken" property="http://s.org/p" content="v"></div>',
    # '_' declared as a prefix
    '<div prefix="_: http://bad.example/" about="#a" '
    'property="http://s.org/p" content="v"></div>',
    # relative IRI in @rel position (non-legal CURIE reference)
    '<div about="#a" rel="not/absolute=" resource="#b"></div>',
]


def _reference_warn_count(fragment: str) -> int:
    from pyRdfa import pyRdfa as PyRdfaClass
    from pyRdfa.options import Options

    opts = Options(output_default_graph=True, output_processor_graph=True,
                   embedded_rdf=False, vocab_expansion=False)
    opts.set_host_language("text/html")
    proc = PyRdfaClass(options=opts, base="http://diag.test/d")
    dom = minidom.parseString(f"<html><body>{fragment}</body></html>")
    proc.graph_from_DOM(dom)
    # the processor graph accumulates warning/error bnodes
    return len(opts.processor_graph.graph)


@pytest.mark.parametrize("fragment", BAD_DOCS)
def test_both_sides_warn(fragment):
    ref_warnings = _reference_warn_count(fragment)
    proc = RDFaProcessor(base="http://diag.test/d", host=Host.HTML5)
    proc.process(parse_html(f"<html><body>{fragment}</body></html>"))
    ours = [d for d in proc.diagnostics if d[0] == "warning"]
    assert ref_warnings > 0, "reference emitted no warning for bad doc"
    assert ours, f"our engine emitted no diagnostic; ref had {ref_warnings}"


def test_clean_doc_warns_nowhere():
    clean = ('<div vocab="http://schema.org/" about="#a" typeof="Thing">'
             '<span property="name">x</span></div>')
    assert _reference_warn_count(clean) == 0
    proc = RDFaProcessor(base="http://diag.test/d", host=Host.HTML5)
    proc.process(parse_html(f"<html><body>{clean}</body></html>"))
    assert not [d for d in proc.diagnostics if d[0] == "warning"]

#!/usr/bin/env python
"""Triple-extraction P/R against the REFERENCE implementation.

Runs the actual pyrdfa3 code (/root/reference, executed through the
minimal rdflib shim in scripts/refshim) and our engine on the same
fixture fragments, compares per-document graphs bnode-insensitively
(rdflib-compare-style isomorphism), and reports aggregate precision /
recall over triples — the BASELINE.json primary metric.

Exclusions (documented): template 21 (embedded turtle — the shim has no
turtle parser for the reference side, and its markup is not well-formed
XML for minidom).  The reference parses HTML via minidom here instead
of html5lib (absent); all fixture templates are well-formed, so the
DOMs coincide.

Usage: python scripts/pr_eval.py [n_per_template]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts", "refshim"))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.join(REPO, "tests"))

import xml.dom.minidom as minidom  # noqa: E402

from pyrdfa3_spark.functions.hostlang import Host  # noqa: E402
from pyrdfa3_spark.operators.rdfa_engine import (  # noqa: E402
    Literal, RDFaProcessor,
)
from pyrdfa3_spark.sources.dom import parse_html, parse_xml  # noqa: E402
from pyrdfa3_spark.sources.fragments import (  # noqa: E402
    FRAGMENT_TEMPLATES, render_fragment,
)

from graph_compare import isomorphic  # noqa: E402

EXCLUDED_TEMPLATES = {20}  # embedded turtle (see module docstring)

_MEDIA = {"html5": "text/html", "svg": "image/svg+xml"}


def run_reference(kind: str, fragment: str, base: str,
                  rdfa_version: str = "1.1"):
    import rdflib  # the shim
    from pyRdfa import pyRdfa as PyRdfaClass
    from pyRdfa.options import Options

    opts = Options(output_default_graph=True, output_processor_graph=False,
                   embedded_rdf=False, vocab_expansion=False)
    opts.set_host_language(_MEDIA[kind])
    proc = PyRdfaClass(options=opts, base=base, rdfa_version=rdfa_version)
    if kind == "html5":
        dom = minidom.parseString(f"<html><body>{fragment}</body></html>")
    else:
        dom = minidom.parseString(fragment)
    graph = proc.graph_from_DOM(dom)
    out = []
    for (s, p, o) in graph:
        s2 = "_:" + str(s) if isinstance(s, rdflib.BNode) else str(s)
        if isinstance(o, rdflib.Literal):
            o2 = Literal(o.value, o.language, str(o.datatype)
                         if o.datatype else None)
        elif isinstance(o, rdflib.BNode):
            o2 = "_:" + str(o)
        else:
            o2 = str(o)
        out.append((s2, str(p), o2))
    return out


def run_ours(kind: str, fragment: str, base: str,
             rdfa_version: str = "1.1"):
    host = Host.HTML5 if kind == "html5" else Host.SVG
    proc = RDFaProcessor(base=base, host=host, rdfa_version=rdfa_version)
    if kind == "html5":
        root = parse_html(f"<html><body>{fragment}</body></html>")
    else:
        root = parse_xml(fragment)
    return proc.process(root)


def _has_bnode(t):
    from pyrdfa3_spark.operators.rdfa_engine import is_bnode

    return is_bnode(t[0]) or (isinstance(t[2], str) and is_bnode(t[2]))


def main():
    n_per_template = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    version = sys.argv[2] if len(sys.argv) > 2 else "1.1"
    tp = fp = fn = 0
    doc_pass = doc_fail = 0
    failures = []
    for tidx, (kind, _) in enumerate(FRAGMENT_TEMPLATES):
        if tidx in EXCLUDED_TEMPLATES:
            continue
        for j in range(n_per_template):
            k = tidx + 21 * j
            _, fragment = render_fragment(tidx, k)
            base = f"http://fixture.test/t{tidx}/k{k}"
            ref = run_reference(kind, fragment, base, version)
            ours = run_ours(kind, fragment, base, version)
            ref_set = set(ref)
            ours_set = {t for t in ours}
            if isomorphic(ours, ref):
                doc_pass += 1
                tp += len(ref_set)
            else:
                doc_fail += 1
                ref_ground = {t for t in ref_set if not _has_bnode(t)}
                ours_ground = {t for t in ours_set if not _has_bnode(t)}
                tp += len(ref_ground & ours_ground)
                fp += len(ours_ground - ref_ground) + len(
                    [t for t in ours_set if _has_bnode(t)])
                fn += len(ref_ground - ours_ground) + len(
                    [t for t in ref_set if _has_bnode(t)])
                if len(failures) < 8:
                    failures.append((tidx, k,
                                     sorted(map(str, ours_ground ^ ref_ground))[:4]))
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    print(f"documents: pass={doc_pass} fail={doc_fail}")
    print(f"triples:   tp={tp} fp={fp} fn={fn}")
    print(f"precision={precision:.4f} recall={recall:.4f} (target >= 0.95)")
    for t, k, diffs in failures:
        print(f"  template {t} k={k}: {diffs}")
    return 0 if precision >= 0.95 and recall >= 0.95 else 1


if __name__ == "__main__":
    sys.exit(main())

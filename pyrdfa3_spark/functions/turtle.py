"""Minimal Turtle and RDF/XML readers for embedded RDF (E14).

The reference merges RDF carried inside documents — ``<script
type="text/turtle">`` in HTML hosts and ``rdf:RDF`` subtrees in SVG —
via rdflib parsers (/root/reference/pyRdfa/embeddedRDF.py:23-87 and the
vocab fetch path pyRdfa/rdfs/process.py:53-129).  rdflib is not
available here, so these are small from-scratch readers covering the
common subset: prefixes, IRIs, prefixed names, blank nodes (named and
``[...]``), literals with language tags / datatypes / long strings,
``a``, predicate-object (`;`) and object (`,`) lists, and RDF
collections ``(...)``.

Returns the same shapes the engine uses: IRIs/bnodes as strings
(bnodes ``_:``-prefixed), literals as
:class:`pyrdfa3_spark.operators.rdfa_engine.Literal`.
"""

from __future__ import annotations

import re
from typing import Callable, Optional
from urllib.parse import urljoin

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"


class TurtleError(ValueError):
    pass


_TOKEN = re.compile(r"""
      (?P<ws>\s+|\#[^\n]*)
    | (?P<iri><[^<>"{}|^`\\\s]*>)
    | (?P<longstr>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"
                 |'''(?:[^'\\]|\\.|'(?!''))*''')
    | (?P<str>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
    | (?P<kw>@prefix\b|@base\b|PREFIX\b|BASE\b|GRAPH\b)
    | (?P<langtag>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
    | (?P<dt>\^\^)
    | (?P<num>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
    | (?P<bool>\b(?:true|false)\b(?![\w.-]*:))
    | (?P<punct>[;,.\[\](){}])
    | (?P<a>\ba\b)
    | (?P<bnode>_:[\w.-]+)
    | (?P<pname>[A-Za-z0-9][\w.-]*?:(?:[\w./#%+-]|\\[_~.!$&'()*+,;=/?\#@%-])*
               |:(?:[\w./#%+-]|\\[_~.!$&'()*+,;=/?\#@%-])*)
""", re.X)

# Turtle 1.1 PN_LOCAL_ESC: backslash-escapable punctuation in the
# local part of a prefixed name (ex:with\~tilde)
_PN_LOCAL_ESC = re.compile(r"\\([_~.!$&'()*+,;=/?#@%-])")

_ESCAPES = {"t": "\t", "n": "\n", "r": "\r", '"': '"', "\\": "\\",
            "b": "\b", "f": "\f", "'": "'"}


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            if n in _ESCAPES:
                out.append(_ESCAPES[n])
                i += 2
                continue
            if n == "u" and i + 6 <= len(s):
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            if n == "U" and i + 10 <= len(s):
                out.append(chr(int(s[i + 2:i + 10], 16)))
                i += 10
                continue
        out.append(c)
        i += 1
    return "".join(out)


class TurtleParser:
    """Recursive-descent reader for the Turtle subset described above."""

    def __init__(self, base: str = "", bnode_factory: Optional[Callable] = None):
        self.base = base
        self.prefixes: dict[str, str] = {}
        self._bnode_n = 0
        self._named: dict[str, str] = {}
        self._bnode_factory = bnode_factory or self._default_bnode

    def _default_bnode(self):
        self._bnode_n += 1
        return f"_:t{self._bnode_n}"

    # -- tokenizer -------------------------------------------------------
    def _tokens(self, text: str):
        pos = 0
        while pos < len(text):
            m = _TOKEN.match(text, pos)
            if not m:
                raise TurtleError(f"unexpected character at {pos}: "
                                  f"{text[pos:pos+20]!r}")
            pos = m.end()
            kind = m.lastgroup
            if kind == "ws":
                continue
            yield kind, m.group()
        yield "eof", ""

    # -- parser ----------------------------------------------------------
    def parse(self, text: str):
        from pyrdfa3_spark.operators.rdfa_engine import Literal  # cycle-safe

        self._Literal = Literal
        self.triples: list = []
        self._toks = list(self._tokens(text))
        self._i = 0
        while self._peek()[0] != "eof":
            self._statement()
        return self.triples

    def _peek(self):
        return self._toks[self._i]

    def _next(self):
        t = self._toks[self._i]
        self._i += 1
        return t

    def _expect_punct(self, ch):
        kind, val = self._next()
        if val != ch:
            raise TurtleError(f"expected {ch!r}, got {val!r}")

    def _statement(self):
        kind, val = self._peek()
        if kind == "kw":
            self._next()
            if val in ("@prefix", "PREFIX"):
                _, pname = self._next()
                if not pname.endswith(":"):
                    # pname token includes the reference; only 'p:' legal
                    raise TurtleError(f"bad prefix declaration {pname!r}")
                prefix = pname[:-1]
                kind2, iri = self._next()
                if kind2 != "iri":
                    raise TurtleError("prefix IRI expected")
                self.prefixes[prefix] = urljoin(self.base, iri[1:-1]) \
                    if self.base else iri[1:-1]
                if val == "@prefix":
                    self._expect_punct(".")
            elif val in ("@base", "BASE"):
                kind2, iri = self._next()
                if kind2 != "iri":
                    raise TurtleError("base IRI expected")
                self.base = urljoin(self.base, iri[1:-1])
                if val == "@base":
                    self._expect_punct(".")
            else:
                # GRAPH is a TriG-only keyword (TrigParser handles it
                # before delegating here)
                raise TurtleError(f"unexpected keyword {val!r}")
            return
        self._subject_statement()
        self._expect_punct(".")

    def _subject_statement(self, terminators=(".",)):
        """subject predicateObjectList? — the trailing list is optional
        exactly when the subject is a NON-EMPTY ``[..]``
        blankNodePropertyList (its triples were already emitted inside
        the brackets); empty ``[]`` is ANON, a plain bnode subject that
        must still carry predicates."""
        bnode_list = (self._peek()[1] == "["
                      and self._toks[self._i + 1][1] != "]")
        subj = self._term(subject=True)
        if not (bnode_list and self._peek()[1] in terminators):
            self._predicate_object_list(subj)

    def _predicate_object_list(self, subj):
        while True:
            pred = self._predicate()
            while True:
                obj = self._term()
                self.triples.append((subj, pred, obj))
                if self._peek()[1] == ",":
                    self._next()
                    continue
                break
            if self._peek()[1] == ";":
                self._next()
                # trailing ';' before '.' or ']' is legal
                if self._peek()[1] in (".", "]") or self._peek()[0] == "eof":
                    return
                continue
            return

    def _predicate(self):
        kind, val = self._next()
        if kind == "a":
            return RDF + "type"
        if kind == "iri":
            return urljoin(self.base, _unescape(val[1:-1]))
        if kind == "pname":
            return self._resolve_pname(val)
        raise TurtleError(f"bad predicate {val!r}")

    def _resolve_pname(self, val: str) -> str:
        prefix, _, local = val.partition(":")
        if prefix not in self.prefixes:
            raise TurtleError(f"undefined prefix {prefix!r}")
        return self.prefixes[prefix] + _PN_LOCAL_ESC.sub(r"\1", local)

    def _term(self, subject: bool = False):
        kind, val = self._next()
        if kind == "iri":
            return urljoin(self.base, _unescape(val[1:-1]))
        if kind == "pname":
            return self._resolve_pname(val)
        if kind == "bnode":
            label = val[2:]
            if label not in self._named:
                self._named[label] = self._bnode_factory()
            return self._named[label]
        if val == "[":
            node = self._bnode_factory()
            if self._peek()[1] != "]":
                self._predicate_object_list(node)
            self._expect_punct("]")
            return node
        if val == "(":
            items = []
            while self._peek()[1] != ")":
                items.append(self._term())
            self._next()
            if not items:
                return RDF + "nil"
            heads = [self._bnode_factory() for _ in items]
            for i, item in enumerate(items):
                self.triples.append((heads[i], RDF + "first", item))
                nxt = heads[i + 1] if i + 1 < len(items) else RDF + "nil"
                self.triples.append((heads[i], RDF + "rest", nxt))
            return heads[0]
        if subject:
            raise TurtleError(f"bad subject {val!r}")
        if kind in ("str", "longstr"):
            raw = val[3:-3] if kind == "longstr" else val[1:-1]
            value = _unescape(raw)
            nk, nv = self._peek()
            if nk == "langtag":
                self._next()
                return self._Literal(value, nv[1:].lower(), None)
            if nk == "dt":
                self._next()
                dt = self._predicate()
                return self._Literal(value, None, dt)
            return self._Literal(value, None, None)
        if kind == "num":
            if "." in val or "e" in val or "E" in val:
                dt = XSD + ("double" if ("e" in val or "E" in val)
                            else "decimal")
            else:
                dt = XSD + "integer"
            return self._Literal(val, None, dt)
        if kind == "bool":
            return self._Literal(val, None, XSD + "boolean")
        raise TurtleError(f"bad term {val!r}")


def parse_turtle(text: str, base: str = "",
                 bnode_factory: Optional[Callable] = None):
    return TurtleParser(base=base, bnode_factory=bnode_factory).parse(text)


class TrigParser(TurtleParser):
    """TriG reader: Turtle plus named-graph blocks —
    ``[GRAPH] <label> { triples }`` with IRI / pname / bnode labels —
    and bare default-graph statements.  Returns ``(s, p, o, g)``
    quads; default-graph statements carry ``g = None``.  The final
    ``.`` inside a block is optional, per the TriG grammar."""

    def parse(self, text: str):
        from pyrdfa3_spark.operators.rdfa_engine import Literal

        self._Literal = Literal
        self.triples = []
        self.quads: list = []
        self._toks = list(self._tokens(text))
        self._i = 0
        while self._peek()[0] != "eof":
            self._trig_statement()
        return self.quads

    def _trig_statement(self):
        kind, val = self._peek()
        if kind == "kw" and val != "GRAPH":
            self._statement()  # @prefix / @base directives
            return
        if kind == "kw":  # GRAPH <label> { ... }
            self._next()
            self._block(self._graph_label())
            return
        if (kind in ("iri", "pname", "bnode")
                and self._toks[self._i + 1][1] == "{"):
            self._block(self._graph_label())
            return
        before = len(self.triples)
        self._subject_statement()
        self._expect_punct(".")
        self._flush(before, None)

    def _graph_label(self):
        kind, val = self._next()
        if kind == "iri":
            return urljoin(self.base, _unescape(val[1:-1]))
        if kind == "pname":
            return self._resolve_pname(val)
        if kind == "bnode":
            label = val[2:]
            if label not in self._named:
                self._named[label] = self._bnode_factory()
            return self._named[label]
        raise TurtleError(f"bad graph label {val!r}")

    def _block(self, graph):
        self._expect_punct("{")
        while self._peek()[1] != "}":
            before = len(self.triples)
            self._subject_statement((".", "}"))
            if self._peek()[1] == ".":
                self._next()
            self._flush(before, graph)
        self._next()

    def _flush(self, before, graph):
        self.quads.extend((s, p, o, graph)
                          for s, p, o in self.triples[before:])
        del self.triples[before:]


def parse_trig(text: str, base: str = "",
               bnode_factory: Optional[Callable] = None):
    return TrigParser(base=base, bnode_factory=bnode_factory).parse(text)


# --------------------------------------------------------------------------
# RDF/XML subset (rdf:RDF subtrees in SVG; reference merges them via
# rdflib's parser, pyRdfa/embeddedRDF.py:75-83)
# --------------------------------------------------------------------------

def parse_rdfxml_node(node, base: str = "",
                      bnode_factory: Optional[Callable] = None):
    """Parse an ``rdf:RDF`` element (a pyrdfa3_spark.sources.dom.Node)
    into triples.  Supports rdf:Description / typed nodes, rdf:about /
    rdf:ID / rdf:nodeID / rdf:resource, property attributes, nested node
    elements, literal property elements with xml:lang / rdf:datatype."""
    from pyrdfa3_spark.operators.rdfa_engine import Literal

    counter = [0]
    named: dict[str, str] = {}

    def new_bnode():
        if bnode_factory:
            return bnode_factory()
        counter[0] += 1
        return f"_:x{counter[0]}"

    triples: list = []

    def ns_split(node_tag: str, nsmap: dict) -> str:
        prefix, _, local = node_tag.rpartition(":")
        if prefix:
            if prefix in nsmap:
                return nsmap[prefix] + local
            return node_tag
        return nsmap.get("", "") + local

    def collect_ns(el, nsmap):
        out = dict(nsmap)
        for k, v in el.attrs.items():
            if k == "xmlns":
                out[""] = v
            elif k.startswith("xmlns:"):
                out[k[6:]] = v
        return out

    def node_subject(el, nsmap):
        if el.has("rdf:about"):
            return urljoin(base, el.get("rdf:about"))
        if el.has("rdf:ID"):
            return urljoin(base, "#" + el.get("rdf:ID"))
        if el.has("rdf:nodeID"):
            label = el.get("rdf:nodeID")
            if label not in named:
                named[label] = new_bnode()
            return named[label]
        return new_bnode()

    def parse_node_element(el, nsmap):
        nsmap = collect_ns(el, nsmap)
        subj = node_subject(el, nsmap)
        tag_iri = ns_split(el.tag, nsmap)
        if tag_iri != RDF + "Description":
            triples.append((subj, RDF + "type", tag_iri))
        for k, v in el.attrs.items():
            if k.startswith(("xmlns", "rdf:", "xml:")):
                continue
            triples.append((subj, ns_split(k, nsmap), Literal(v, None, None)))
        for child in el.element_children():
            parse_property_element(subj, child, nsmap)
        return subj

    def parse_property_element(subj, el, nsmap):
        nsmap = collect_ns(el, nsmap)
        pred = ns_split(el.tag, nsmap)
        if el.has("rdf:resource"):
            triples.append((subj, pred, urljoin(base, el.get("rdf:resource"))))
            return
        if el.has("rdf:nodeID"):
            label = el.get("rdf:nodeID")
            if label not in named:
                named[label] = new_bnode()
            triples.append((subj, pred, named[label]))
            return
        kids = el.element_children()
        if kids:
            obj = parse_node_element(kids[0], nsmap)
            triples.append((subj, pred, obj))
            return
        text = el.text_content()
        if el.has("rdf:datatype"):
            triples.append((subj, pred,
                            Literal(text, None, el.get("rdf:datatype"))))
        elif el.has("xml:lang"):
            triples.append((subj, pred,
                            Literal(text, el.get("xml:lang").lower() or None,
                                    None)))
        else:
            triples.append((subj, pred, Literal(text, None, None)))

    nsmap = collect_ns(node, {"rdf": RDF})
    for child in node.element_children():
        parse_node_element(child, nsmap)
    return triples

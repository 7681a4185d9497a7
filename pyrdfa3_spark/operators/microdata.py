"""HTML microdata extraction (itemscope / itemprop / itemtype / itemid).

The reference's ``StructuredDataParser`` (pyRdfa/rdflibparsers.py:213-269)
combines RDFa + microdata + embedded turtle, delegating microdata to the
*external* pyMicrodata package (rdflibparsers.py:264-265); this module
reimplements the commonly-exercised core of the W3C microdata-to-RDF
mapping over the same :class:`~pyrdfa3_spark.sources.dom.Node` tree the
RDFa engine walks, so ``plans/extract.py`` can run both in one pass.

Supported (the subset real schema.org markup uses):
  * top-level items (``itemscope`` without ``itemprop``), nested items,
    ``itemid`` subjects resolved against the document base;
  * ``itemtype`` -> rdf:type triples; the first type token supplies the
    property vocabulary (up to the last ``#`` or ``/``);
  * per-tag value extraction (href/src/data URLs, meta@content,
    data/meter@value, time@datetime, else concatenated text content);
  * ``lang`` / ``xml:lang`` inheritance onto text literals.

``itemref`` (cross-subtree property borrowing) is supported: each
referenced element is crawled as part of the item, with cycle
protection; the referenced element's ``lang`` is its own attribute (or
the item's, when absent) — full ancestor-chain lang inheritance for
out-of-tree references is a documented simplification.

Vocabulary selection follows the W3C microdata-to-RDF registry model:
the first itemtype token is matched against ``MD_REGISTRY`` (longest
prefix wins — the public registry's entries, extensible by callers)
and falls back to the up-to-last-``#``/``/`` heuristic for
non-registry types.  The *current vocabulary* is inherited by nested
items that carry no ``itemtype`` of their own (spec evaluation
context), so untyped sub-items inside schema.org markup still get
schema.org property URIs.

Not implemented (documented contract): top-level untyped items with no
inherited vocabulary — their non-absolute property names are skipped,
as are relative ``itemtype`` tokens.
"""

from __future__ import annotations

from pyrdfa3_spark.operators.rdfa_engine import Literal, urljoin

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# value-carrying attribute per element (W3C microdata §5.4 property value)
_URL_ATTRS = {
    "a": "href", "area": "href", "link": "href",
    "audio": "src", "embed": "src", "iframe": "src", "img": "src",
    "source": "src", "track": "src", "video": "src",
    "object": "data",
}
_VALUE_ATTRS = {"meta": "content", "data": "value", "meter": "value"}

# W3C microdata-to-RDF registry (the public md registry's vocabulary
# prefixes): a type matching a key uses the mapped VOCABULARY URI for
# property-name concatenation — distinct from the matched prefix when
# the registry's property scheme inserts a separator (hcard's property
# URIs are ...profile/hcard#name while the type itself has no '#').
# Callers may extend via extract_microdata(registry=...).
MD_REGISTRY: dict[str, str] = {
    "http://schema.org/": "http://schema.org/",
    "https://schema.org/": "https://schema.org/",
    "http://microformats.org/profile/hcard":
        "http://microformats.org/profile/hcard#",
    "http://microformats.org/profile/hcalendar#":
        "http://microformats.org/profile/hcalendar#",
}


def _vocab_of(itemtype: str,
              registry: dict[str, str] = MD_REGISTRY) -> str | None:
    """Property vocabulary from the first itemtype token, per the
    W3C microdata-to-RDF vocabulary derivation: the longest matching
    registry prefix's vocabulary when there is one; else everything
    up to and including the last ``#``; else up to and including the
    last ``/`` of the path; else the TYPE ITSELF — the no-delimiter
    corner (``urn:ex:Thing``-style types), where the predicate
    concatenation inserts the ``#`` (:func:`_predicate`)."""
    hits = [p for p in registry if itemtype.startswith(p)]
    if hits:
        return registry[max(hits, key=len)]
    if "#" in itemtype:
        return itemtype[:itemtype.rindex("#") + 1]
    if "/" in itemtype.partition("://")[2]:
        return itemtype[:itemtype.rindex("/") + 1]
    return itemtype


def _predicate(vocab: str, name: str) -> str:
    """Spec predicate concatenation: ``vocab + name``, inserting a
    ``#`` when the vocabulary has no trailing ``#``/``/`` separator
    (the registry's hcard entry and delimiter-less types hit this)."""
    if vocab.endswith("#") or vocab.endswith("/"):
        return vocab + name
    return vocab + "#" + name


def _is_absolute(iri: str) -> bool:
    return "://" in iri or iri.startswith("urn:")


def _text_content(node) -> str:
    out = []
    for c in node.children:
        out.append(c if isinstance(c, str) else _text_content(c))
    return "".join(out)


class _MicrodataWalker:
    def __init__(self, base: str,
                 registry: dict[str, str] = MD_REGISTRY):
        self.base = base
        self.registry = registry
        self.counter = 0
        self.triples: list = []
        self._ids: dict = {}

    def _bnode(self) -> str:
        self.counter += 1
        return f"_:md{self.counter}"

    def run(self, root, lang: str | None = None) -> list:
        self._index_ids(root)
        self._find_items(root, lang)
        return self.triples

    def _index_ids(self, node):
        nid = node.attrs.get("id")
        if nid and nid not in self._ids:
            self._ids[nid] = node
        for c in node.element_children():
            self._index_ids(c)

    def _lang(self, node, inherited):
        explicit = node.attrs.get("lang") or node.attrs.get("xml:lang")
        return explicit if explicit else inherited

    def _find_items(self, node, lang):
        lang = self._lang(node, lang)
        if "itemscope" in node.attrs and "itemprop" not in node.attrs:
            self._item(node, lang)
            return  # the item owns its subtree
        for c in node.element_children():
            self._find_items(c, lang)

    def _item(self, node, lang, vocab_in: str | None = None) -> str:
        """Emit an item's triples; return its subject.  ``vocab_in`` is
        the enclosing item's current vocabulary — inherited when this
        item carries no itemtype of its own (spec evaluation context)."""
        itemid = node.attrs.get("itemid")
        subj = urljoin(self.base, itemid.strip()) if itemid \
            else self._bnode()
        vocab = vocab_in
        types = (node.attrs.get("itemtype") or "").split()
        for i, t in enumerate(types):
            if _is_absolute(t):
                self.triples.append((subj, RDF_TYPE, t))
                if i == 0:
                    vocab = _vocab_of(t, self.registry)
        item_lang = self._lang(node, lang)
        for c in node.element_children():
            self._properties(c, subj, vocab, item_lang)
        # itemref: crawl each referenced element (itself included) as
        # part of this item; guard against reference cycles
        seen: set = set()
        for ref in (node.attrs.get("itemref") or "").split():
            if ref in seen:
                continue
            seen.add(ref)
            el = self._ids.get(ref)
            if el is not None and el is not node:
                self._properties(el, subj, vocab,
                                 self._lang(el, item_lang))
        return subj

    def _properties(self, node, subj, vocab, lang):
        lang = self._lang(node, lang)
        props = (node.attrs.get("itemprop") or "").split()
        if props:
            if "itemscope" in node.attrs:
                value = self._item(node, lang, vocab_in=vocab)
                is_item = True
            else:
                value = self._value(node, lang)
                is_item = False
            for name in props:
                if _is_absolute(name):
                    pred = name
                elif vocab:
                    pred = _predicate(vocab, name)
                else:
                    continue  # untyped item, non-absolute name: contract
                self.triples.append((subj, pred, value))
            if is_item:
                return  # nested item's subtree belongs to it
        elif "itemscope" in node.attrs:
            # stray nested itemscope without itemprop: a top-level item
            self._item(node, lang)
            return
        for c in node.element_children():
            self._properties(c, subj, vocab, lang)

    def _value(self, node, lang):
        tag = node.tag
        if tag in _URL_ATTRS and node.attrs.get(_URL_ATTRS[tag]) is not None:
            return urljoin(self.base,
                                  node.attrs[_URL_ATTRS[tag]].strip())
        if tag in _VALUE_ATTRS and node.attrs.get(_VALUE_ATTRS[tag]) \
                is not None:
            return Literal(node.attrs[_VALUE_ATTRS[tag]], lang, None)
        if tag == "time" and node.attrs.get("datetime") is not None:
            return Literal(node.attrs["datetime"], lang, None)
        return Literal(_text_content(node), lang, None)


def extract_microdata(root, base: str,
                      registry: dict[str, str] = MD_REGISTRY) -> list:
    """DOM -> [(subj, pred, obj)] where obj is an IRI/bnode string or a
    :class:`Literal`; bnode labels are ``_:mdN`` (disjoint from the RDFa
    engine's labels so one document can run both extractors).
    ``registry``: vocabulary-prefix registry consulted for itemtype ->
    property-vocabulary mapping (defaults to the public md registry)."""
    return _MicrodataWalker(base, registry).run(root)

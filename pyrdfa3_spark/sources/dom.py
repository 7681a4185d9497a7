"""Minimal document model + stdlib parsers for the extraction UDF.

The reference parses HTML with html5lib and XML with xml.dom.minidom
(/root/reference/pyRdfa/__init__.py:619-660).  Neither html5lib nor lxml
is available in this environment, so we build a small tolerant tree on
top of ``html.parser`` (stdlib) for HTML5 and convert
``xml.dom.minidom`` trees for XML/XHTML/SVG.  The node model is
intentionally tiny: it never crosses the JVM boundary — it lives only
inside the Arrow batch UDF.
"""

from __future__ import annotations

import html as _htmlmod
import re
from html.parser import HTMLParser
from xml.dom import minidom


class Node:
    """One element. ``children`` holds Node instances and plain strings
    (text). Attribute map preserves document order (dict in py3.7+)."""

    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None):
        self.tag = tag
        self.attrs: dict[str, str] = attrs or {}
        self.children: list = []
        self.parent: Node | None = None

    # -- DOM-ish helpers the engine uses ---------------------------------
    def has(self, name: str) -> bool:
        return name in self.attrs

    def get(self, name: str) -> str:
        return self.attrs.get(name, "")

    def set(self, name: str, value: str) -> None:
        self.attrs[name] = value

    def remove(self, name: str) -> None:
        self.attrs.pop(name, None)

    def append(self, child) -> None:
        if isinstance(child, Node):
            child.parent = self
        self.children.append(child)

    def element_children(self):
        return [c for c in self.children if isinstance(c, Node)]

    def iter_elements(self):
        yield self
        for c in self.children:
            if isinstance(c, Node):
                yield from c.iter_elements()

    def text_content(self) -> str:
        """Recursive text collection (reference: pyRdfa/property.py:231-252)."""
        out = []
        for c in self.children:
            if isinstance(c, Node):
                out.append(c.text_content())
            else:
                out.append(c)
        return "".join(out)

    def __repr__(self):  # pragma: no cover - debug aid
        return f"<Node {self.tag} {self.attrs}>"


# ---------------------------------------------------------------------------
# HTML parsing (tolerant, html.parser based)
# ---------------------------------------------------------------------------

_VOID_ELEMENTS = frozenset(
    """area base br col embed hr img input link meta param source track
    wbr""".split()
)

# Document-level fault isolation: the engine and serializers are
# recursive, so unbounded element depth would hit Python's recursion
# limit inside an executor task.  Real documents stay far below this;
# anything deeper is rejected at parse time and the extraction UDF
# records a per-document diagnostic instead of failing the task.
MAX_DEPTH = 400


class DocumentTooDeep(ValueError):
    pass

# naive auto-close sets: opening one of these closes an open same-tag (or
# listed) ancestor, approximating the HTML5 tree construction rules that
# html5lib would apply for mildly malformed input.
_AUTOCLOSE = {
    "li": {"li"},
    "p": {"p"},
    "option": {"option"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "dt": {"dt", "dd"},
    "dd": {"dt", "dd"},
}


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack = [self.root]

    # html.parser lowercases tag and attribute names already.
    def handle_starttag(self, tag, attrs):
        close = _AUTOCLOSE.get(tag)
        if close:
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i].tag
                if t in close:
                    del self.stack[i:]
                    break
                if t not in ("a", "b", "i", "em", "strong", "span", "small"):
                    break
        amap = {}
        for k, v in attrs:
            if k not in amap:
                amap[k] = v if v is not None else ""
        node = Node(tag, amap)
        self.stack[-1].append(node)
        if tag not in _VOID_ELEMENTS:
            if len(self.stack) >= MAX_DEPTH:
                raise DocumentTooDeep(
                    f"element nesting exceeds MAX_DEPTH={MAX_DEPTH}")
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        amap = {}
        for k, v in attrs:
            if k not in amap:
                amap[k] = v if v is not None else ""
        self.stack[-1].append(Node(tag, amap))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignored (error-correcting behaviour)

    def handle_data(self, data):
        if data:
            self.stack[-1].append(data)


# Fast path: most transcript fragments are well-formed XML, which expat
# (C) parses ~2x faster than html.parser's pure-Python tokenizer.  The
# fallback (html.parser) handles everything expat rejects: unclosed/void
# elements, unquoted attributes, HTML-only entities, raw '<' in scripts,
# doctypes, duplicate attributes.  Tags/attrs are lowercased so both
# paths build identical trees.  One true divergence is gated out below:
# expat normalizes tab/newline inside attribute values (XML spec) while
# html.parser preserves them, so any document with a control char inside
# a tag takes the slow path.
_TAG_CTRL_WS = re.compile(r"<[^>]*[\t\n\r]")


def _parse_html_fast(text: str) -> Node:
    from xml.parsers import expat

    doc = Node("#document")
    stack = [doc]

    def start(tag, attrs):
        if len(stack) >= MAX_DEPTH + 1:  # +1: synthetic wrapper level
            raise DocumentTooDeep(
                f"element nesting exceeds MAX_DEPTH={MAX_DEPTH}")
        amap = {}
        for i in range(0, len(attrs), 2):
            k = attrs[i].lower()
            if k not in amap:
                amap[k] = attrs[i + 1]
        n = Node(tag.lower(), amap)
        stack[-1].append(n)
        stack.append(n)

    def reject_cdata():
        # expat would surface CDATA content as text, but HTML parsing
        # (html5lib and our tolerant fallback) treats <![CDATA[...]]> as
        # a bogus comment and drops it — force the fallback so both
        # paths emit identical literals for the same fragment
        raise ValueError("CDATA section: not HTML, use tolerant parser")

    p = expat.ParserCreate()
    p.ordered_attributes = True
    p.buffer_text = True
    p.StartElementHandler = start
    p.EndElementHandler = lambda tag: stack.pop()
    p.CharacterDataHandler = lambda d: stack[-1].append(d) if d else None
    p.StartCdataSectionHandler = reject_cdata
    p.Parse("<sgr-root>" + text + "</sgr-root>", True)
    return stack[0].children[0]  # the wrapper element


def parse_html(text: str) -> Node:
    """Parse an HTML5 document/fragment; return the document element.

    If the input has no single root element an ``<html>`` root is
    synthesized (html5lib would wrap content into html/body the same
    way; head/body elements without resource attributes are transparent
    for subject resolution, parse.py:89-96).
    """
    wrapper = None
    if not _TAG_CTRL_WS.search(text):
        try:
            wrapper = _parse_html_fast(text)
        except DocumentTooDeep:
            raise
        except Exception:
            wrapper = None  # not well-formed XML -> tolerant parser
    if wrapper is None:
        builder = _TreeBuilder()
        builder.feed(text)
        builder.close()
        wrapper = builder.root
    roots = wrapper.element_children()
    if len(roots) == 1 and not _has_stray_text(wrapper):
        doc = roots[0]
        doc.parent = None
        return doc
    root = Node("html")
    for c in wrapper.children:
        root.append(c)
    return root


def _has_stray_text(docnode: Node) -> bool:
    return any(
        isinstance(c, str) and c.strip() for c in docnode.children
    )


# ---------------------------------------------------------------------------
# XML parsing (XHTML / SVG / generic XML) via minidom
# ---------------------------------------------------------------------------

def parse_xml(text: str) -> Node:
    dom = minidom.parseString(text)
    return _convert_minidom(dom.documentElement)


def _convert_minidom(el, depth: int = 0) -> Node:
    if depth >= MAX_DEPTH:
        raise DocumentTooDeep(f"element nesting exceeds MAX_DEPTH={MAX_DEPTH}")
    attrs = {}
    if el.attributes is not None:
        for i in range(el.attributes.length):
            a = el.attributes.item(i)
            attrs[a.name] = a.value
    node = Node(el.tagName, attrs)
    for ch in el.childNodes:
        if ch.nodeType == ch.ELEMENT_NODE:
            node.append(_convert_minidom(ch, depth + 1))
        elif ch.nodeType in (ch.TEXT_NODE, ch.CDATA_SECTION_NODE):
            node.append(ch.data)
    return node


# ---------------------------------------------------------------------------
# Serialization (XML / HTML literal generation)
# ---------------------------------------------------------------------------

def escape_text(s: str) -> str:
    """Re-escape &, <, > (reference: pyRdfa/property.py:222-229)."""
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _escape_attr(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace('"', "&quot;")
    )


def serialize_node(node: Node, extra_attrs: dict[str, str] | None = None) -> str:
    """Serialize one element to XML text, minidom ``toxml`` style
    (attributes in document order, self-closing empty elements).  Used
    for rdf:XMLLiteral / rdf:HTML generation
    (reference: pyRdfa/utils.py:211-239)."""
    parts = ["<", node.tag]
    attrs = dict(node.attrs)
    if extra_attrs:
        for k, v in extra_attrs.items():
            if k not in attrs:
                attrs[k] = v
    for k, v in attrs.items():
        parts.append(f' {k}="{_escape_attr(v)}"')
    if not node.children:
        parts.append("/>")
        return "".join(parts)
    parts.append(">")
    for c in node.children:
        if isinstance(c, Node):
            parts.append(serialize_node(c))
        else:
            parts.append(escape_text(c))
    parts.append(f"</{node.tag}>")
    return "".join(parts)


def unescape_html(s: str) -> str:
    return _htmlmod.unescape(s)

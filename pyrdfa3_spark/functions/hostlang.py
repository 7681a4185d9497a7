"""Host-language dispatch and media-type sniffing (operator S5).

Mirrors the behaviour tables at /root/reference/pyRdfa/host/__init__.py:38-203
(media-type -> host language, xml:base / xml:lang acceptance, DTD-based
XHTML vs XHTML5 adjustment) without the HTTP machinery: transcripts carry
markup fragments inline, so media type is sniffed from the fragment text.
"""

from __future__ import annotations

import re


class Host:
    RDFA_CORE = "rdfa_core"
    XHTML = "xhtml"
    XHTML5 = "xhtml5"
    HTML5 = "html5"
    ATOM = "atom"
    SVG = "svg"


CONTENT_TO_HOST = {
    "text/html": Host.HTML5,
    "application/xhtml+xml": Host.XHTML,
    "application/xml": Host.RDFA_CORE,
    "text/xml": Host.RDFA_CORE,
    "application/smil+xml": Host.RDFA_CORE,
    "application/svg+xml": Host.SVG,
    "image/svg+xml": Host.SVG,
    "application/atom+xml": Host.ATOM,
}

# hosts that accept @xml:base / @xml:lang
# (/root/reference/pyRdfa/host/__init__.py:74-75)
ACCEPT_XML_BASE = {Host.RDFA_CORE, Host.ATOM, Host.SVG, Host.XHTML5}
ACCEPT_XML_LANG = {Host.RDFA_CORE, Host.ATOM, Host.SVG}
HTML_HOSTS = {Host.XHTML, Host.XHTML5, Host.HTML5}

# default @vocab per host (/root/reference/pyRdfa/host/__init__.py:92-94)
DEFAULT_VOCABULARY = {Host.ATOM: "http://www.iana.org/assignments/relation/"}

_XHTML_10_DTDS = {
    ("-//W3C//DTD XHTML+RDFa 1.0//EN",
     "http://www.w3.org/MarkUp/DTD/xhtml-rdfa-1.dtd"),
}
_XHTML_11_DTDS = {
    ("-//W3C//DTD XHTML+RDFa 1.1//EN",
     "http://www.w3.org/MarkUp/DTD/xhtml-rdfa-2.dtd"),
    ("-//W3C//DTD HTML 4.01+RDFa 1.1//EN",
     "http://www.w3.org/MarkUp/DTD/html401-rdfa11-1.dtd"),
}
_XHTML_PLAIN_DTDS = {
    ("-//W3C//DTD XHTML 1.0 Strict//EN",
     "http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd"),
    ("-//W3C//DTD XHTML 1.0 Transitional//EN",
     "http://www.w3.org/TR/xhtml1/DTD/xhtml1-transitional.dtd"),
    ("-//W3C//DTD XHTML 1.1//EN",
     "http://www.w3.org/TR/xhtml11/DTD/xhtml11.dtd"),
}

_DOCTYPE_RE = re.compile(
    r'<!DOCTYPE[^>]*?PUBLIC\s+"([^"]*)"\s+"([^"]*)"', re.I | re.S
)


def adjust_xhtml_and_version(text: str, host: str, rdfa_version: str):
    """XHTML DTD sniff: decide XHTML (1.0/1.1) vs XHTML5 and possibly pin
    the RDFa version (reference: host/__init__.py:174-203)."""
    if host != Host.XHTML:
        return host, rdfa_version
    m = _DOCTYPE_RE.search(text)
    if m:
        ids = (m.group(1), m.group(2))
        if ids in _XHTML_10_DTDS:
            return Host.XHTML, "1.0"
        if ids in _XHTML_11_DTDS:
            return Host.XHTML, "1.1"
        if ids in _XHTML_PLAIN_DTDS:
            return Host.XHTML, rdfa_version
    return Host.XHTML5, rdfa_version


def sniff_media_type(fragment: str) -> str:
    """Media type from fragment shape (transcripts carry no Content-Type;
    analogous to suffix-based dispatch, host/__init__.py:129-142)."""
    head = fragment.lstrip()[:512].lower()
    if head.startswith("<?xml") or head.startswith("<svg") or "<svg" in head[:64]:
        if "<svg" in head:
            return "image/svg+xml"
        if "xmlns=\"http://www.w3.org/1999/xhtml\"" in head:
            return "application/xhtml+xml"
        return "application/xml"
    if 'xmlns="http://www.w3.org/1999/xhtml"' in head:
        return "application/xhtml+xml"
    if "<feed" in head[:64]:
        return "application/atom+xml"
    return "text/html"


def host_for(media_type: str) -> str:
    return CONTENT_TO_HOST.get(media_type, Host.RDFA_CORE)


def is_xml_host(host: str) -> bool:
    """True when the fragment must be parsed as well-formed XML."""
    return host in (Host.RDFA_CORE, Host.SVG, Host.ATOM, Host.XHTML,
                    Host.XHTML5)

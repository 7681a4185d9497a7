"""RDFa 1.1 initial-context tables.

These are the W3C-published initial-context data sets
(http://www.w3.org/2011/rdfa-context/rdfa-1.1 and .../xhtml-rdfa-1.1);
the reference embeds the same public tables at
/root/reference/pyRdfa/initialcontext.py:23-117.  They are *data*, not
code: in the Spark pipeline they double as small broadcast dimension
tables (``prefix_df`` / ``term_df``).
"""

from __future__ import annotations

# Prefix -> IRI map of the RDFa 1.1 core initial context.
INITIAL_PREFIXES: dict[str, str] = {
    "as": "https://www.w3.org/ns/activitystreams#",
    "csvw": "http://www.w3.org/ns/csvw#",
    "dcat": "http://www.w3.org/ns/dcat#",
    "dqv": "http://www.w3.org/ns/dqv#",
    "duv": "https://www.w3.org/ns/duv#",
    "qb": "http://purl.org/linked-data/cube#",
    "org": "http://www.w3.org/ns/org#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "gr": "http://purl.org/goodrelations/v1#",
    "ctag": "http://commontag.org/ns#",
    "cc": "http://creativecommons.org/ns#",
    "grddl": "http://www.w3.org/2003/g/data-view#",
    "jsonld": "http://www.w3.org/ns/json-ld#",
    "ldp": "http://www.w3.org/ns/ldp#",
    "oa": "http://www.w3.org/ns/oa#",
    "rif": "http://www.w3.org/2007/rif#",
    "sioc": "http://rdfs.org/sioc/ns#",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "xml": "http://www.w3.org/XML/1998/namespace",
    "rr": "http://www.w3.org/ns/r2rml#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "rev": "http://purl.org/stuff/rev#",
    "rdfa": "http://www.w3.org/ns/rdfa#",
    "dc": "http://purl.org/dc/terms/",
    "dcterms": "http://purl.org/dc/terms/",
    "dc11": "http://purl.org/dc/elements/1.1/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "void": "http://rdfs.org/ns/void#",
    "ical": "http://www.w3.org/2002/12/cal/icaltzd#",
    "vcard": "http://www.w3.org/2006/vcard/ns#",
    "wdrs": "http://www.w3.org/2007/05/powder-s#",
    "og": "http://ogp.me/ns#",
    "wdr": "http://www.w3.org/2007/05/powder#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "xhv": "http://www.w3.org/1999/xhtml/vocab#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "v": "http://rdf.data-vocabulary.org/#",
    "skosxl": "http://www.w3.org/2008/05/skos-xl#",
    "schema": "http://schema.org/",
    "ssn": "http://www.w3.org/ns/ssn/",
    "sosa": "http://www.w3.org/ns/sosa/",
    "time": "http://www.w3.org/2006/time#",
    "ma": "http://www.w3.org/ns/ma-ont#",
    "sd": "http://www.w3.org/ns/sparql-service-description#",
    "prov": "http://www.w3.org/ns/prov#",
    "odrl": "http://www.w3.org/ns/odrl/2/",
}

# Terms of the RDFa 1.1 core initial context.
CORE_TERMS: dict[str, str] = {
    "describedby": "http://www.w3.org/2007/05/powder-s#describedby",
    "role": "http://www.w3.org/1999/xhtml/vocab#role",
    "license": "http://www.w3.org/1999/xhtml/vocab#license",
}

# Terms of the XHTML+RDFa 1.1 initial context (XHTML host language only,
# reference host table /root/reference/pyRdfa/host/__init__.py:48-56).
_XHV = "http://www.w3.org/1999/xhtml/vocab#"
XHTML_TERM_NAMES = [
    "alternate", "appendix", "cite", "bookmark", "chapter", "contents",
    "copyright", "glossary", "help", "icon", "index", "meta", "next",
    "license", "p3pv1", "prev", "previous", "role", "section",
    "stylesheet", "subsection", "start", "up", "last", "first", "top",
]
XHTML_TERMS: dict[str, str] = {t: _XHV + t for t in XHTML_TERM_NAMES}

# Hardwired link-relation terms for (X)HTML + RDFa 1.0
# (reference: /root/reference/pyRdfa/host/__init__.py:96-98).
PREDEFINED_1_0_REL = [
    "alternate", "appendix", "cite", "bookmark", "chapter", "contents",
    "copyright", "glossary", "help", "icon", "index", "meta", "next",
    "p3pv1", "prev", "previous", "role", "section", "subsection", "start",
    "license", "up", "last", "stylesheet", "first", "top",
]
TERMS_1_0: dict[str, str] = {t: _XHV + t for t in PREDEFINED_1_0_REL}

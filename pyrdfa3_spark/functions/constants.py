"""Shared IRI constants for the RDFa processing model.

Values are public W3C vocabulary IRIs (see the RDFa 1.1 Core REC); the
reference uses the same constants via rdflib namespaces
(/root/reference/pyRdfa/parse.py:36-41, termorcurie.py:80-81).
"""

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDFA = "http://www.w3.org/ns/rdfa#"

RDF_TYPE = RDF + "type"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"
RDF_XMLLITERAL = RDF + "XMLLiteral"
RDF_HTMLLITERAL = RDF + "HTML"

RDFA_USES_VOCABULARY = RDFA + "usesVocabulary"
RDFA_PATTERN = RDFA + "Pattern"
RDFA_COPY = RDFA + "copy"

XHTML_VOCAB = "http://www.w3.org/1999/xhtml/vocab#"
XHTML_ROLE = XHTML_VOCAB + "role"

# XSD datatypes that the HTML5 <time>/@datetime sniffer may produce
# (reference table: /root/reference/pyRdfa/host/html5.py:28-37).
XSD_DATETIME = XSD + "dateTime"
XSD_TIME = XSD + "time"
XSD_DATE = XSD + "date"
XSD_GYEAR = XSD + "gYear"
XSD_GYEARMONTH = XSD + "gYearMonth"
XSD_GMONTHDAY = XSD + "gMonthDay"
XSD_DURATION = XSD + "duration"

# Small set of common URI schemes, used only for "unusual scheme" warnings
# (the reference carries the full IANA list, /root/reference/pyRdfa/__init__.py:314-347;
# warnings are diagnostics-only so a compact set suffices).
COMMON_URI_SCHEMES = frozenset(
    """http https ftp file mailto urn tel data tag doi geo git gopher im
    imap info irc ldap news nfs nntp pop rsync rtsp sip sips skype sms
    snmp ssh svn telnet uuid webcal ws wss xmpp bitcoin magnet""".split()
)

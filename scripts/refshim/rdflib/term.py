"""rdflib.term shim: the reference only takes ``XSDToPython.get(dt)``
(pyRdfa/property.py:304) — an empty table skips validation warnings,
which affects diagnostics only, never emitted triples."""

XSDToPython: dict = {}

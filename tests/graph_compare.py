"""Blank-node-insensitive graph comparison for golden tests.

Equivalent in purpose to rdflib.compare.isomorphic (used by the reference
community's test harness, see SURVEY.md §5): finds a bnode bijection by
backtracking.  Fixture graphs are tiny, so worst-case cost is irrelevant.
"""

from __future__ import annotations

from itertools import permutations

from pyrdfa3_spark.operators.rdfa_engine import Literal, is_bnode


def _norm(t):
    s, p, o = t
    if isinstance(o, Literal):
        o = ("lit", o.value, o.lang, o.datatype)
    return (s, p, o)


def _bnodes_of(triples):
    out = set()
    for s, p, o in triples:
        if is_bnode(s):
            out.add(s)
        if isinstance(o, str) and is_bnode(o):
            out.add(o)
    return sorted(out)


def _apply(triples, mapping):
    out = set()
    for s, p, o in triples:
        s2 = mapping.get(s, s) if isinstance(s, str) else s
        o2 = mapping.get(o, o) if isinstance(o, str) else o
        out.add((s2, p, o2))
    return out


def isomorphic(a, b) -> bool:
    """True if triple sets a and b are equal under some bnode bijection."""
    ta = {_norm(t) for t in a}
    tb = {_norm(t) for t in b}
    ba, bb = _bnodes_of(ta), _bnodes_of(tb)
    if len(ba) != len(bb):
        return False
    ground_a = {t for t in ta if not (is_bnode(t[0]) or
                                      (isinstance(t[2], str) and is_bnode(t[2])))}
    ground_b = {t for t in tb if not (is_bnode(t[0]) or
                                      (isinstance(t[2], str) and is_bnode(t[2])))}
    if ground_a != ground_b:
        return False
    if not ba:
        return ta == tb
    if len(ba) > 8:  # pragma: no cover - fixtures stay small
        raise ValueError("fixture graph too large for brute-force isomorphism")
    for perm in permutations(bb):
        mapping = dict(zip(ba, perm))
        if _apply(ta, mapping) == tb:
            return True
    return False


def diff(a, b) -> str:
    """Human-readable diff (ignores bnode relabeling only if exact)."""
    ta = {_norm(t) for t in a}
    tb = {_norm(t) for t in b}
    lines = []
    for t in sorted(ta - tb, key=str):
        lines.append(f"  only-in-actual:   {t}")
    for t in sorted(tb - ta, key=str):
        lines.append(f"  only-in-expected: {t}")
    return "\n".join(lines)

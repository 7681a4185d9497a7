"""Blank-node-insensitive graph comparison for golden tests.

Equivalent in purpose to rdflib.compare.isomorphic (used by the reference
community's test harness, see SURVEY.md §5): Weisfeiler-Lehman color
refinement partitions the blank nodes by structural signature, then a
bijection is searched only within matching color classes — the same
strategy rdflib's ``to_canonical_graph`` builds on, so rdf:first/rest
chains with dozens of bnodes verify instantly instead of hitting a
permutation wall.
"""

from __future__ import annotations

from itertools import permutations, product

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


def _wl_colors(triples, bnodes):
    """Weisfeiler-Lehman refinement: structural color per bnode."""
    def term_key(x, color):
        if isinstance(x, str) and is_bnode(x):
            return ("b", color[x])
        return ("g", x)

    color = {b: 0 for b in bnodes}
    for _ in range(len(bnodes) + 2):
        sigs = {b: [] for b in bnodes}
        for s, p, o in triples:
            if is_bnode(s):
                sigs[s].append(("out", p, term_key(o, color)))
            if isinstance(o, str) and is_bnode(o):
                sigs[o].append(("in", p, term_key(s, color)))
        new = {b: hash(tuple(sorted(map(repr, sig))))
               for b, sig in sigs.items()}
        if len(set(new.values())) == len(set(color.values())):
            return new
        color = new
    return color


def isomorphic(a, b, max_combos: int = 100_000) -> bool:
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

    ca, cb = _wl_colors(ta, ba), _wl_colors(tb, bb)
    classes_a: dict = {}
    classes_b: dict = {}
    for n, c in ca.items():
        classes_a.setdefault(c, []).append(n)
    for n, c in cb.items():
        classes_b.setdefault(c, []).append(n)
    if set(classes_a) != set(classes_b) or any(
            len(classes_a[c]) != len(classes_b[c]) for c in classes_a):
        return False

    # search only within color classes (usually singletons)
    import math
    total = math.prod(math.factorial(len(v)) for v in classes_a.values())
    if total > max_combos:
        # Degenerate symmetry: many structurally-identical bnodes (e.g.
        # one @role bnode per element across a deep uniform tree) make
        # the class-wise permutation search factorial.  Document graphs
        # are forests, and WL refinement is a complete isomorphism
        # invariant on forests — so comparing the color-canonicalized
        # triple MULTISETS is exact here, no enumeration needed.
        from collections import Counter

        def canon(ts, colors):
            def m(x):
                return (("b", colors[x])
                        if isinstance(x, str) and is_bnode(x) else x)
            return Counter((m(s), p, m(o)) for s, p, o in ts)

        return canon(ta, ca) == canon(tb, cb)
    colors = sorted(classes_a)
    per_class = [permutations(classes_b[c]) for c in colors]
    for combo in product(*per_class):
        mapping = {}
        for c, perm in zip(colors, combo):
            mapping.update(zip(sorted(classes_a[c]), perm))
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

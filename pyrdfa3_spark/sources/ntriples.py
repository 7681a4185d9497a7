"""Distributed N-Triples / N-Quads reader — the source twin of the
text sinks in ``plans/serialize.py``.

The reference ingests RDF through rdflib's parsers (its vocab cache
loads serialized graphs back, pyRdfa/rdfs/cache.py); at lake scale the
interchange files are line-oriented N-Triples/N-Quads, which makes the
parse *perfectly distributable*: each line is one statement, so the
whole reader is scan-side column algebra — one anchored regex per
line, a split/transform/rejoin for ECHAR unescaping — no Python, no
shuffle, whole-stage codegen end to end.  A 100 TB dump parses at
scan speed with filter/column pushdown intact.

Contract:
  * statements must be one-per-line (the grammar's canonical form and
    what every serializer, ours included, emits);
  * comment / blank lines are skipped; anything else that fails the
    statement grammar is EXCLUDED from the parse and reported by
    :func:`parse_errors` (per-row raise is not expressible in column
    algebra — callers gate on the error count, mirroring the
    extraction UDF's diagnostics-row discipline);
  * ECHAR escapes (``\\\\ \\" \\n \\r \\t``) unescape; numeric UCHAR
    escapes (``\\uXXXX``) pass through unexpanded (documented
    limitation — the writers here never emit them).

Output schema matches the sinks: ``subj, pred, obj, obj_is_iri,
obj_lang, obj_datatype`` (+ ``graph`` for N-Quads), so
``parse_ntriples(to_ntriples(g))`` is the identity on the triple set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SKIP_RE = r"^\s*(#.*)?$"  # blank / comment lines

_TERM_S = r"(<[^>]*>|_:[^\s]+)"
# object term: IRI | bnode | literal(@lang | ^^<dt>)? — the explicit
# alternation (not a lazy wildcard) so junk objects ('o', '<o> junk')
# fail the statement regex and surface in parse_errors, per the module
# contract; the bnode branch is lazy so '_:b1.' gives the dot back
_TERM_O = (r"(<[^>]*>|_:[^\s]+?|\"(?:[^\"\\]|\\.)*\""
           r"(?:@[A-Za-z][A-Za-z0-9\-]*|\^\^<[^>]*>)?)")
_GRAPH = r"(?:\s+(<[^>]*>|_:[^\s.]+))?"

_NT_RE = rf"^\s*{_TERM_S}\s+<([^>]*)>\s+{_TERM_O}\s*\.\s*$"
_NQ_RE = rf"^\s*{_TERM_S}\s+<([^>]*)>\s+{_TERM_O}{_GRAPH}\s*\.\s*$"

# literal object: "lex" with optional @lang or ^^<datatype>
_LIT_RE = r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z][A-Za-z0-9\-]*))?' \
          r"(?:\^\^<([^>]*)>)?$"

def _unescape(col):
    """ECHAR unescape without a sentinel character: split the lexical
    form on the two-char escaped-backslash sequence, unescape the
    single-char escapes inside each fragment, and rejoin with a literal
    backslash.  (The previous implementation parked escaped backslashes
    on a NUL sentinel, which CORRUPTED literals genuinely containing a
    raw NUL — grammar-legal in N-Triples — by rewriting that NUL to a
    backslash.)"""
    def one(p):
        p = F.replace(p, F.lit('\\"'), F.lit('"'))
        p = F.replace(p, F.lit("\\n"), F.lit("\n"))
        p = F.replace(p, F.lit("\\r"), F.lit("\r"))
        p = F.replace(p, F.lit("\\t"), F.lit("\t"))
        return p

    return F.array_join(
        F.transform(F.split(col, r"\\\\", -1), one), "\\")


def _strip_iri(col):
    return F.when(col.startswith("<"),
                  F.substring(col, 2, F.length(col) - 2)).otherwise(col)


def _parse(lines: DataFrame, col: str, quads: bool) -> DataFrame:
    pat = _NQ_RE if quads else _NT_RE
    c = F.col(col)
    raw = (lines
           .filter(~c.rlike(_SKIP_RE))
           .filter(c.rlike(pat))
           .select(F.regexp_extract(c, pat, 1).alias("_s"),
                   F.regexp_extract(c, pat, 2).alias("pred"),
                   F.regexp_extract(c, pat, 3).alias("_o"),
                   *([F.regexp_extract(c, pat, 4).alias("_g")]
                     if quads else [])))
    # a literal object must ALSO satisfy the literal grammar — a line
    # like <s> <p> "unclosed . passes the statement regex but not this
    # (such lines surface in parse_errors instead)
    raw = raw.filter(~F.col("_o").startswith('"')
                     | F.col("_o").rlike(_LIT_RE))
    is_lit = F.col("_o").startswith('"')
    lex = _unescape(F.regexp_extract("_o", _LIT_RE, 1))
    lang = F.regexp_extract("_o", _LIT_RE, 2)
    dtype = F.regexp_extract("_o", _LIT_RE, 3)
    out = raw.select(
        _strip_iri(F.col("_s")).alias("subj"),
        "pred",
        F.when(is_lit, lex).otherwise(_strip_iri(F.col("_o"))).alias("obj"),
        (~is_lit).alias("obj_is_iri"),
        F.when(is_lit & (lang != ""), lang).cast("string")
        .alias("obj_lang"),
        F.when(is_lit & (dtype != ""), dtype).cast("string")
        .alias("obj_datatype"),
        *([_strip_iri(F.col("_g")).alias("graph")] if quads else []))
    if quads:
        out = out.withColumn(
            "graph", F.when(F.col("graph") != "", F.col("graph")))
    return out


def parse_ntriples(lines: DataFrame, col: str = "line") -> DataFrame:
    """``(line)`` frame -> triples.  See the module contract."""
    return _parse(lines, col, quads=False)


def parse_nquads(lines: DataFrame, col: str = "line") -> DataFrame:
    """``(line)`` frame -> quads; a statement with no graph term yields
    a NULL ``graph`` (the default graph)."""
    return _parse(lines, col, quads=True)


def read_ntriples(spark, path: str) -> DataFrame:
    """Parse an N-Triples dump from disk — ``spark.read.text`` feeds
    the scan-side parser, so partitioning follows the file splits."""
    return parse_ntriples(spark.read.text(path), col="value")


def read_nquads(spark, path: str) -> DataFrame:
    return parse_nquads(spark.read.text(path), col="value")


def parse_errors(lines: DataFrame, col: str = "line") -> DataFrame:
    """Lines that are neither blank/comment nor grammatical statements
    — the count a loader gates on before trusting the parse."""
    c = F.col(col)
    bad_stmt = lines.filter(~c.rlike(_SKIP_RE)).filter(~c.rlike(_NQ_RE))
    # statement-shaped but with an ungrammatical literal object
    pat = _NQ_RE
    obj = F.regexp_extract(c, pat, 3)
    bad_lit = (lines.filter(~c.rlike(_SKIP_RE)).filter(c.rlike(pat))
               .filter(obj.startswith('"') & ~obj.rlike(_LIT_RE)))
    return bad_stmt.select(c.alias("line")).unionByName(
        bad_lit.select(c.alias("line")))

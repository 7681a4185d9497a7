"""Whole-graph operators over triple DataFrames (SURVEY.md §2.6).

Everything here is declarative DataFrame algebra — joins, anti-joins,
windows, unions — so Catalyst plans it (broadcast selection, AQE skew
splitting) without custom rules.  Expected schema: at least
``subj, pred, obj`` string columns (extra columns pass through where
noted).
"""

from __future__ import annotations

import re

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyrdfa3_spark.functions.constants import (
    RDF_TYPE, RDFA_COPY, RDFA_PATTERN,
)

TRIPLE_KEY = ["subj", "pred", "obj", "obj_is_iri", "obj_lang",
              "obj_datatype"]

# reserved predicate namespace for materialized property-path edges
# (the SPARQL front-end unions them into its working frame); variable
# predicates and negated property sets never match them.  NUL-prefixed
# because no IRI/CURIE/literal can contain \x00 — a user predicate can
# never collide with (and be silently hidden by) the reserved space
_VIRTUAL_PRED = "\x00path"


def dedup_triples(triples: DataFrame, per_document: bool = True) -> DataFrame:
    """RDF set semantics (E16; rdflib Graph is a set).  Per-document by
    default — matching the reference's one-graph-per-source scoping —
    global when ``per_document=False``."""
    cols = [c for c in TRIPLE_KEY if c in triples.columns]
    if per_document:
        cols = ["conv_id", "turn_idx"] + cols
    return triples.dropDuplicates(cols)


def handle_prototypes(triples: DataFrame) -> DataFrame:
    """rdfa:Pattern / rdfa:copy expansion (G1; reference:
    pyRdfa/transform/prototype.py:26-37).

    For every (x, rdfa:copy, P) where (P, rdf:type, rdfa:Pattern):
    copy all (P, p, y) onto x, then remove the copy triples, the type
    triples, and the pattern's own triples.  Pure join/anti-join algebra:
    the pattern side is tiny relative to the corpus, so Catalyst
    broadcast-joins it.
    """
    extra = [c for c in ("conv_id", "turn_idx") if c in triples.columns]
    data_cols = [c for c in triples.columns if c not in ("subj", "pred", "obj")]

    # prototypes: subjects typed rdfa:Pattern (scoped per document when
    # provenance columns exist, matching the reference's per-graph pass)
    patterns = (triples
                .filter((F.col("pred") == RDF_TYPE)
                        & (F.col("obj") == RDFA_PATTERN))
                .select(*extra, F.col("subj").alias("proto"))
                .dropDuplicates())

    # (x, rdfa:copy, P) references whose P is a known pattern
    copies = (triples.filter(F.col("pred") == RDFA_COPY)
              .select(*extra, F.col("subj").alias("x"),
                      F.col("obj").alias("proto"))
              .join(patterns, [*extra, "proto"], "inner"))

    referenced = copies.select(*extra, "proto").dropDuplicates()

    # body triples of each referenced prototype, minus its Pattern typing
    bodies = (triples
              .withColumnRenamed("subj", "proto")
              .join(referenced, [*extra, "proto"], "inner")
              .filter(~((F.col("pred") == RDF_TYPE)
                        & (F.col("obj") == RDFA_PATTERN))))

    expanded = (copies.join(bodies, [*extra, "proto"], "inner")
                .withColumnRenamed("x", "subj")
                .select("subj", "pred", "obj", *data_cols)
                .select(*triples.columns))

    # remove: every triple of a referenced prototype (its Pattern typing
    # and body) and every rdfa:copy reference to one
    kept = (triples
            .join(referenced.withColumnRenamed("proto", "subj"),
                  [*extra, "subj"], "left_anti"))
    kept = kept.join(
        copies.select(*extra, F.col("x").alias("subj"),
                      F.lit(RDFA_COPY).alias("pred"),
                      F.col("proto").alias("obj")),
        [*extra, "subj", "pred", "obj"], "left_anti")
    return kept.unionByName(expanded)


def _triple_key_join(triples: DataFrame, other: DataFrame,
                     how: str) -> DataFrame:
    """Semi/anti join on the shared triple-key columns with NULL-SAFE
    equality — ``obj_lang``/``obj_datatype`` are NULL for plain
    literals, and a plain ``=`` join would treat every such row as
    unmatched (subtraction silently no-ops, intersection empties).

    Both sides are aliased so the condition stays unambiguous even when
    the two frames share lineage (``g - g`` is a legal self-join)."""
    on = [c for c in TRIPLE_KEY if c in triples.columns
          and c in other.columns]
    left = triples.alias("__tkj_l")
    right = other.select(on).dropDuplicates().alias("__tkj_r")
    cond = None
    for c in on:
        eq = F.col(f"__tkj_l.{c}").eqNullSafe(F.col(f"__tkj_r.{c}"))
        cond = eq if cond is None else cond & eq
    return left.join(right, cond, how)


def subtract_graph(triples: DataFrame, other: DataFrame) -> DataFrame:
    """Set difference on the triple key (G5; reference:
    pyRdfa/rdfs/process.py:300) — left_anti join, broadcastable."""
    return _triple_key_join(triples, other, "left_anti")


def intersect_graphs(triples: DataFrame, other: DataFrame) -> DataFrame:
    """Set intersection on the triple key — left_semi twin of
    :func:`subtract_graph`."""
    return _triple_key_join(triples, other, "left_semi")


def xor_graphs(triples: DataFrame, other: DataFrame) -> DataFrame:
    """Symmetric difference on the triple key — rdflib's
    ``Graph.__xor__``: triples in exactly one of the two graphs.
    Two anti-joins (each broadcastable when its right side is small)
    unioned; no extra dedup pass — each side is already key-distinct
    in a set-semantics graph, and the two sides are disjoint by
    construction."""
    return union_graphs(_triple_key_join(triples, other, "left_anti"),
                        _triple_key_join(other, triples, "left_anti"))


def union_graphs(*graphs: DataFrame) -> DataFrame:
    """Graph merge (E15/G3; reference: pyRdfa/__init__.py:483-487)."""
    out = graphs[0]
    for g in graphs[1:]:
        out = out.unionByName(g, allowMissingColumns=True)
    return out


def transitive_closure(edges: DataFrame, max_iterations: int = 20,
                       strategy: str = "seminaive") -> DataFrame:
    """Fixpoint closure of a binary relation (G4 core; reference:
    MiniOWL ``closure`` pyRdfa/rdfs/process.py:155-183 and the
    transitivity rules 209-231).

    ``edges``: DataFrame(src, dst).  Returns all (src, dst) in the
    transitive closure.  Driver-side loop — Catalyst has no recursion —
    ``cache`` + ``localCheckpoint`` keep lineage from exploding.

    Strategies:
      * ``seminaive`` (default): per-round delta ⋈ edges — reaches path
        length r+1 after r rounds; each round shuffles only the frontier.
        Right for shallow schema graphs (the MiniOWL case).
      * ``doubling``: delta ⋈ closure — reachable path length *doubles*
        per round, so a depth-d graph needs O(log d) shuffled rounds
        instead of O(d).  Rounds are heavier (frontier joins the whole
        closure); right for deep chains at scale.

    Raises ``RuntimeError`` when ``max_iterations`` rounds pass with the
    frontier still growing — returning a silently truncated closure
    would drop exactly the deepest derivations.
    """
    if strategy not in ("seminaive", "doubling"):
        raise ValueError(f"unknown strategy {strategy!r}")
    # eager localCheckpoint, not cache(): materialized once for the
    # loop's repeated consumers, blocks self-release on GC (no
    # CacheManager entry to leak or double-register)
    base = edges.select("src", "dst").dropDuplicates() \
        .localCheckpoint(eager=True)
    closure = base
    delta = base
    converged = False
    for _ in range(max_iterations):
        right = base if strategy == "seminaive" else closure
        step = (delta.alias("d")
                .join(right.alias("e"), F.col("d.dst") == F.col("e.src"))
                .select(F.col("d.src").alias("src"),
                        F.col("e.dst").alias("dst"))
                .dropDuplicates())
        prev_delta = delta
        # the frontier must be lineage-truncated too (not just cached):
        # its plan otherwise nests one join level per round and the
        # driver's plan handling blows up long before the data does
        delta = step.join(closure, ["src", "dst"], "left_anti") \
            .localCheckpoint(eager=True)
        if delta.isEmpty():
            converged = True
            break
        closure = closure.unionByName(delta).localCheckpoint(eager=True)
        if prev_delta is not base:   # superseded frontier: free its store
            prev_delta.unpersist()
    if not converged:
        raise RuntimeError(
            f"transitive_closure frontier still growing after "
            f"{max_iterations} {strategy} rounds; raise max_iterations "
            f"or use strategy='doubling' for deep graphs")
    return closure


OWL_SUBPROP = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
OWL_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
OWL_EQPROP = "http://www.w3.org/2002/07/owl#equivalentProperty"
OWL_EQCLASS = "http://www.w3.org/2002/07/owl#equivalentClass"


def _schema_maps(vocab_rows):
    """Driver-side schema closure (tiny vocab graphs by construction;
    reference pre-closes them the same way 'to speed up processing',
    pyRdfa/rdfs/process.py:209-226, 287-290).

    Returns (prop_map, class_map) as lists of (from, to) pairs with
    from != to: subPropertyOf/subClassOf closed transitively,
    equivalentProperty/equivalentClass expanded to connected-component
    pairs (the fixpoint of the reference's symmetric rules,
    process.py:228-249)."""
    def transitive(pairs):
        succ: dict = {}
        for a, b in pairs:
            succ.setdefault(a, set()).add(b)
        changed = True
        while changed:
            changed = False
            for a in list(succ):
                new = set()
                for b in succ[a]:
                    new |= succ.get(b, set())
                if not new <= succ[a]:
                    succ[a] |= new
                    changed = True
        return {(a, b) for a, bs in succ.items() for b in bs if a != b}

    def components(pairs):
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        groups: dict = {}
        for x in parent:
            groups.setdefault(find(x), set()).add(x)
        out = set()
        for members in groups.values():
            for a in members:
                for b in members:
                    if a != b:
                        out.add((a, b))
        return out

    sub_p, eq_p, sub_c, eq_c = [], [], [], []
    for s, p, o in vocab_rows:
        if p == OWL_SUBPROP:
            sub_p.append((s, o))
        elif p == OWL_EQPROP:
            eq_p.append((s, o))
        elif p == OWL_SUBCLASS:
            sub_c.append((s, o))
        elif p == OWL_EQCLASS:
            eq_c.append((s, o))
    prop_map = transitive(sub_p) | components(eq_p)
    class_map = transitive(sub_c) | components(eq_c)
    return sorted(prop_map), sorted(class_map)


def miniowl_expand(data: DataFrame, vocab: DataFrame,
                   max_iterations: int = 10) -> DataFrame:
    """Vocabulary expansion (G4; reference: MiniOWL + process_rdfa_sem,
    pyRdfa/rdfs/process.py:140-303): OWL-RL rules prp-spo1, prp-eqp1/2,
    cax-sco, cax-eqc1/2 applied to ``data`` to fixpoint.

    Scale shape: the vocab graph is a small dim -> its closure is
    computed on the driver and joined via ``F.broadcast``; the data side
    iterates delta-only (semi-naive), so each round shuffles only newly
    derived triples.  Output = data + derived instance triples (schema
    triples are never mixed in, mirroring the reference's final
    subtraction, process.py:300)."""
    spark = data.sparkSession
    vocab_rows = [(r[0], r[1], r[2])
                  for r in vocab.select("subj", "pred", "obj").collect()]
    prop_map, class_map = _schema_maps(vocab_rows)

    pm = spark.createDataFrame(prop_map or [("", "")], ["f", "t"]) \
        .filter(F.col("f") != "")
    cm = spark.createDataFrame(class_map or [("", "")], ["f", "t"]) \
        .filter(F.col("f") != "")

    base = data.select("subj", "pred", "obj").dropDuplicates() \
        .localCheckpoint(eager=True)  # see transitive_closure: no cache leak
    all_t = base
    delta = base
    converged = False
    for _ in range(max_iterations):
        d1 = (delta.join(F.broadcast(pm), delta["pred"] == pm["f"])
              .select("subj", F.col("t").alias("pred"), "obj"))
        d2 = (delta.filter(F.col("pred") == RDF_TYPE)
              .join(F.broadcast(cm), delta["obj"] == cm["f"])
              .select("subj", "pred", F.col("t").alias("obj")))
        new = (d1.unionByName(d2).dropDuplicates()
               .join(all_t, ["subj", "pred", "obj"], "left_anti")
               .localCheckpoint(eager=True))  # truncate frontier lineage
        if new.isEmpty():
            converged = True
            break
        all_t = all_t.unionByName(new).localCheckpoint(eager=True)
        if delta is not base:        # superseded frontier: free its store
            delta.unpersist()
        delta = new
    if not converged:
        raise RuntimeError(
            f"miniowl_expand still deriving new triples after "
            f"{max_iterations} rounds — the schema maps are pre-closed, "
            f"so this indicates a pathological vocab; raise "
            f"max_iterations if intentional")
    return all_t


def rdf_list_chain(items: DataFrame, origin_col: str = "origin",
                   pred_col: str = "pred", value_col: str = "value",
                   pos_col: str = "pos") -> DataFrame:
    """Materialize ordered (origin, pred, value*) groups as
    rdf:first/rdf:rest/rdf:nil cons chains (E12; reference:
    pyRdfa/parse.py:303-316) using window + lead — the distributed
    equivalent of the engine's in-document list builder, for lists whose
    members arrive as rows.

    Head IRIs are deterministic skolems of (origin, pred, pos).
    Output: (subj, pred, obj) triples.

    Plan shape: ONE window pass — the three output kinds (rdf:first,
    rdf:rest, list anchor) are emitted as an in-row struct array and
    exploded, instead of a 3-way union of projections that would plan
    the window's shuffle+sort three times.  (A windowless
    groupBy+collect_list+in-row-chain variant was A/B-measured 3x
    slower at sf0.1: element_at over a lazily-computed heads array
    re-evaluates the skolem sha2 per access — quadratic in list
    length — while the window's partition sort is cheap on
    short-list-heavy data.)
    """
    from pyspark.sql import Window

    w = Window.partitionBy(origin_col, pred_col).orderBy(pos_col)
    head = F.concat(F.lit("_:l"), F.sha2(F.concat_ws(
        "\x1f", F.col(origin_col), F.col(pred_col),
        F.col(pos_col).cast("string")), 256).substr(1, 24))
    nxt = F.lead(head, 1).over(w)
    first_pos = F.row_number().over(w)
    df = items.select(
        F.col(origin_col), F.col(pred_col), F.col(value_col),
        head.alias("head"),
        F.coalesce(nxt, F.lit("rdf:nil-placeholder")).alias("rest"),
        first_pos.alias("rn"))
    rest_iri = F.when(F.col("rest") == "rdf:nil-placeholder",
                      F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#nil")
                      ).otherwise(F.col("rest"))

    def t(s, p, o):
        return F.struct(s.alias("subj"), p.alias("pred"), o.alias("obj"))

    triples = F.array(
        t(F.col("head"),
          F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#first"),
          F.col(value_col)),
        t(F.col("head"),
          F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"),
          rest_iri),
        F.when(F.col("rn") == 1,
               t(F.col(origin_col), F.col(pred_col), F.col("head"))),
    )
    return (df.select(F.explode(triples).alias("tr"))
            .filter(F.col("tr").isNotNull())
            .select("tr.subj", "tr.pred", "tr.obj"))


def rdfa_semantic_expansion(triples: DataFrame,
                            vocab_dim: DataFrame) -> DataFrame:
    """The full ``process_rdfa_sem`` flow (reference:
    pyRdfa/rdfs/process.py:253-303): collect the graph's
    rdfa:usesVocabulary IRIs (step 1), select those vocabularies from
    the prefetched dimension table (steps 2 — the lake-native
    replacement for the HTTP fetch / pickle cache), then
    :func:`miniowl_expand` performs the schema closure, data expansion
    and vocab-triple subtraction (steps 3-6).

    ``vocab_dim``: (vocab, subj, pred, obj) — one row per triple of each
    prefetched vocabulary, keyed by the vocabulary IRI.
    """
    from pyrdfa3_spark.functions.constants import RDFA_USES_VOCABULARY

    used = (triples
            .filter(F.col("pred") == RDFA_USES_VOCABULARY)
            .select(F.col("obj").alias("vocab"))
            .distinct())
    vocab_graph = (vocab_dim
                   .join(F.broadcast(used), "vocab")
                   .select("subj", "pred", "obj")
                   .dropDuplicates())
    data = triples.select("subj", "pred", "obj")
    return miniowl_expand(data, vocab_graph)


# Hidden literal-shape companion columns: a variable listed in
# ``shape_vars`` binds with three extra columns carrying the term's
# shape so SPARQL's term-model builtins (LANG / DATATYPE / ISIRI /
# ISLITERAL / ...) compile to plain column expressions.  The prefix is
# reserved: SPARQL variable names can't start with "__shape_" here
# (the front-end validates names), so companions never shadow a
# binding.  Companions ride along unreferenced until final projection
# drops them — Catalyst prunes the unread ones out of the scan.
SHAPE_PREFIX = "__shape_"


def shape_names(var: str) -> tuple[str, str, str]:
    return (f"{SHAPE_PREFIX}{var}_iri", f"{SHAPE_PREFIX}{var}_lang",
            f"{SHAPE_PREFIX}{var}_dt")


def _lexical_is_iri(col):
    """Best-effort shape for frames without shape columns: a term with
    an IRI scheme or a bnode label is a term, anything else a plain
    literal (same inference the serializer facade uses)."""
    return col.rlike("^[A-Za-z][A-Za-z0-9+.-]*:") | col.startswith("_:")


def ensure_shape_companions(df: DataFrame, shape_vars) -> DataFrame:
    """Add lexically-inferred companions for any tracked variable that
    is bound but shapeless (VALUES-introduced bindings, frames built
    outside the matcher)."""
    for v in shape_vars or ():
        iri, lang, dt = shape_names(v)
        if v in df.columns and iri not in df.columns:
            df = (df.withColumn(iri, _lexical_is_iri(F.col(v)))
                  .withColumn(lang, F.lit(None).cast("string"))
                  .withColumn(dt, F.lit(None).cast("string")))
    return df


def repair_adopted_companions(df: DataFrame, shape_vars) -> DataFrame:
    """After a §18.5 compatibility join ADOPTS a binding into a cell
    whose companions were NULL (the unmatched-OPTIONAL shape), the
    companions still say unknown — re-infer them lexically for rows
    where the variable is bound but its shape companion is not.
    Restricted by the caller to VALUES-introduced variables, whose
    documented posture is lexical inference."""
    for v in shape_vars or ():
        iri, _lang, _dt = shape_names(v)
        if v in df.columns and iri in df.columns:
            df = df.withColumn(
                iri,
                F.when(F.col(iri).isNull() & F.col(v).isNotNull(),
                       _lexical_is_iri(F.col(v)))
                .otherwise(F.col(iri)))
    return df


def set_shape_companions(df: DataFrame, var: str,
                         shape: tuple) -> DataFrame:
    """Stamp a variable's companions with a KNOWN constant shape — a
    BIND whose whole body is a term constructor (IRI / STRLANG / STRDT
    / UUID / ...) knows the result's term kind at parse time."""
    iri, lang, dt = shape_names(var)
    is_iri, lg, d = shape
    return (df.withColumn(iri, F.lit(bool(is_iri)))
            .withColumn(lang, F.lit(lg).cast("string"))
            .withColumn(dt, F.lit(d).cast("string")))


def fill_null_companions(df: DataFrame, shape_vars) -> DataFrame:
    """Add NULL companions for tracked variables that are bound but
    carry no shape anywhere (BIND-defined, subquery-projected): the
    term-shape builtins read NULL = unknown and return NULL — the row
    filters out rather than misclassifying.  No-op where the matcher
    already bound companions."""
    for v in shape_vars or ():
        iri, lang, dt = shape_names(v)
        if v in df.columns and iri not in df.columns:
            df = (df.withColumn(iri, F.lit(None).cast("boolean"))
                  .withColumn(lang, F.lit(None).cast("string"))
                  .withColumn(dt, F.lit(None).cast("string")))
    return df


def drop_dup_companions(right: DataFrame, left_cols) -> DataFrame:
    """Before joining two solution frames, drop the right side's
    companion columns that the left already carries (the left frame's
    shape wins — part of the documented string-equality join
    simplification)."""
    dup = [c for c in right.columns
           if c.startswith(SHAPE_PREFIX) and c in left_cols]
    return right.drop(*dup) if dup else right


# SPARQL §18.5 compatibility joins on possibly-unbound variables.
#
# An unbound (NULL) cell is compatible with ANY binding and the merge
# adopts the bound side's value — semantics a plain equi-join cannot
# express (SQL NULL keys never match).  Instead of refusing, the
# operators below DECOMPOSE each side into its null-mask buckets over
# the possibly-unbound shared variables: within a bucket the nullity of
# every risky column is KNOWN, so each (left-bucket, right-bucket) pair
# reduces to an ordinary equi-join on the variables non-NULL on both
# sides (plus the always-certain keys), with the one-sided variables
# merged by ``coalesce``.  Buckets partition the input, so every
# compatible row pair appears exactly once — bag semantics preserved.
#
# Scale shape: 2^k buckets per side (k capped at COMPAT_MAX_NULLABLE,
# larger shapes still refuse), each branch a proper shuffle/broadcast
# hash join Catalyst plans independently; the inputs are
# localCheckpointed first so the per-bucket re-filters scan the
# materialized rows instead of recomputing the subtree 2^k times.  The
# only non-equi branch is a bucket whose shared variables are ALL
# unbound — per SPARQL that really is compatible-with-everything (a
# product); such rows come from OPTIONAL misses / absent union-branch
# bindings and are the minority, and AQE picks a broadcast nested loop
# when the bucket is small.
COMPAT_MAX_NULLABLE = 2


def _null_mask_buckets(df: DataFrame, risky: list[str]):
    """Partition ``df`` into its ``2^len(risky)`` null-mask buckets
    over the possibly-unbound columns.  Every row lands in exactly one
    bucket (NULL-ness of each risky column is a total predicate)."""
    buckets = []
    for bits in range(1 << len(risky)):
        nullset = frozenset(v for i, v in enumerate(risky)
                            if bits >> i & 1)
        cond = F.lit(True)
        for v in risky:
            cond = cond & (F.col(v).isNull() if v in nullset
                           else F.col(v).isNotNull())
        buckets.append((nullset, df.filter(cond)))
    return buckets


def compat_join(left: DataFrame, right: DataFrame,
                left_nullable=(), right_nullable=(),
                how: str = "inner",
                _left_ready: bool = False) -> DataFrame:
    """Join two solution frames on their shared variables under SPARQL
    §18.5 compatibility: a NULL cell on either side agrees with any
    value and the merged solution adopts the bound one.

    ``left_nullable`` / ``right_nullable`` name the shared variables
    that may be NULL on that side (OPTIONAL-bound, absent from a union
    branch, UNDEF-able VALUES, NULL-able BIND).  With both empty this
    is exactly the plain equi-join on the shared variables.

    ``how="left"`` implements the SPARQL leftjoin (OPTIONAL): left
    rows with no compatible partner survive with NULLs for the
    right-only variables.  The right side must be certain
    (``right_nullable`` empty) — true for every call site, where the
    right frame is a BGP match whose variables are all bound — because
    per-bucket left joins would otherwise duplicate unmatched rows
    across right buckets."""
    if how not in ("inner", "left"):
        raise ValueError(f"compat_join how={how!r}")
    right = drop_dup_companions(right, left.columns)
    shared = [c for c in left.columns
              if c in right.columns and not c.startswith(SHAPE_PREFIX)]
    ln = sorted(set(left_nullable) & set(shared))
    rn = sorted(set(right_nullable) & set(shared))
    if how == "left" and rn:
        raise ValueError("compat_join(how='left') needs a certain "
                         f"right side; got nullable {rn}")
    if not ln and not rn:
        return left.join(right, shared, how)
    if ln and not _left_ready:
        # _left_ready: the caller already checkpointed the frame
        # (leftjoin_filter stamps + checkpoints it for the id
        # restore) — don't materialize it a second time
        left = left.localCheckpoint(eager=True)
    if rn:
        right = right.localCheckpoint(eager=True)
    right_only = [c for c in right.columns if c not in left.columns]
    out = None
    for lnull, lb in _null_mask_buckets(left, ln):
        for rnull, rb in _null_mask_buckets(right, rn):
            keys = [c for c in shared
                    if c not in lnull and c not in rnull]
            adopt = [c for c in shared if c not in keys]
            r2 = rb
            ren = {c: f"__cj_{c}" for c in adopt}
            for c, t in ren.items():
                r2 = r2.withColumnRenamed(c, t)
            if keys:
                j = lb.join(r2, keys, how)
            elif how == "left":
                # keyless left bucket: every right row is compatible;
                # an empty right side keeps the left rows (NULL-padded)
                j = lb.join(r2, F.lit(True), "left")
            else:
                j = lb.crossJoin(r2)
            part = j.select(
                *[(F.coalesce(F.col(c), F.col(ren[c])).alias(c)
                   if c in ren else F.col(c))
                  for c in left.columns],
                *[F.col(c) for c in right_only])
            out = part if out is None else out.unionByName(part)
    return out


def leftjoin_filter(sols: DataFrame, sub: DataFrame,
                    left_nullable=(), right_nullable=(),
                    filters: list[str] | None = None) -> DataFrame:
    """SPARQL §6.1 leftjoin with the FILTER evaluated over the MERGED
    solution (the filter may read variables bound outside the OPTIONAL
    group): a matched row that fails the filter reverts to UNMATCHED —
    the left row survives with NULLs for the group-only variables — it
    does not disappear.

    Shape: the left side is stamped with a row id and
    localCheckpointed (ids frozen — re-reads see the same values),
    the inner compatibility join + filter computes the surviving
    matches, and one duplicate-free anti-join on the id restores the
    left rows with no surviving partner.  Same shuffle count as a
    plain left join plus one broadcastable id anti-join."""
    sols = (sols.withColumn("__ljid", F.monotonically_increasing_id())
            .localCheckpoint(eager=True))
    merged = compat_join(sols, sub, left_nullable=left_nullable,
                         right_nullable=right_nullable, how="inner",
                         _left_ready=True)
    for e in filters or []:
        merged = merged.filter(F.expr(e))
    unmatched = sols.join(
        merged.select("__ljid").dropDuplicates(), "__ljid",
        "left_anti")
    return (merged.unionByName(unmatched, allowMissingColumns=True)
            .drop("__ljid"))


def compat_minus(sols: DataFrame, neg: DataFrame,
                 left_nullable=(), right_nullable=()) -> DataFrame:
    """SPARQL §8.3 MINUS tolerating possibly-unbound shared variables
    on either side: a solution is removed iff some ``neg`` row is
    compatible with it AND their bound domains overlap.  Per
    null-mask bucket pair the overlapping bound domain is exactly the
    shared variables non-NULL on BOTH sides, so each pair is one
    duplicate-free left-anti join (they chain — removal by any pair
    removes); a pair with no commonly-bound shared variable has
    disjoint domains and removes nothing."""
    shared = [c for c in sols.columns
              if c in neg.columns and not c.startswith(SHAPE_PREFIX)]
    if not shared:
        return sols
    ln = sorted(set(left_nullable) & set(shared))
    rn = sorted(set(right_nullable) & set(shared))
    if not ln and not rn:
        return sols.join(neg.select(*shared).dropDuplicates(), shared,
                         "left_anti")
    if ln:
        sols = sols.localCheckpoint(eager=True)
    if rn:
        neg = neg.localCheckpoint(eager=True)
    out = None
    for lnull, lb in _null_mask_buckets(sols, ln):
        part = lb
        for rnull, rb in _null_mask_buckets(neg, rn):
            keys = [c for c in shared
                    if c not in lnull and c not in rnull]
            if keys:
                part = part.join(rb.select(*keys).dropDuplicates(),
                                 keys, "left_anti")
        out = part if out is None else out.unionByName(part)
    return out


def compat_exists(sols: DataFrame, grp: DataFrame,
                  left_nullable=(), negate: bool = False) -> DataFrame:
    """SPARQL §8.1.1 FILTER (NOT) EXISTS tolerating possibly-unbound
    shared variables: only BOUND bindings substitute into the inner
    group — an unbound shared variable is FREE inside EXISTS.  Per
    left null-mask bucket the substituted variables are the shared
    ones non-NULL in the bucket, so each bucket is a semi/anti join on
    those keys (projecting ``grp`` onto them leaves the free variables
    unconstrained); a bucket with no bound shared variable degenerates
    to the corpus-level does-the-group-match-at-all boolean."""
    shared = [c for c in sols.columns
              if c in grp.columns and not c.startswith(SHAPE_PREFIX)]
    ln = sorted(set(left_nullable) & set(shared))
    how = "left_anti" if negate else "left_semi"
    if ln:
        sols = sols.localCheckpoint(eager=True)
    out = None
    for lnull, lb in _null_mask_buckets(sols, ln):
        keys = [c for c in shared if c not in lnull]
        if keys:
            part = lb.join(grp.select(*keys).dropDuplicates(), keys,
                           how)
        else:
            flag = grp.limit(1).select(F.lit(1).alias("_k"))
            part = (lb.withColumn("_k", F.lit(1))
                    .join(F.broadcast(flag), "_k", how)
                    .drop("_k"))
        out = part if out is None else out.unionByName(part)
    return out


def bgp_match(triples: DataFrame,
              patterns: list[tuple[str, str, str]],
              optional: list[tuple[str, str, str]] | None = None,
              filters: list[str] | None = None,
              shape_vars=None) -> DataFrame:
    """Basic-graph-pattern matching — the SPARQL SELECT core the
    reference's consumers run over its emitted graphs (pyrdfa3 hands an
    rdflib Graph to SPARQL; this is the lake-side equivalent over the
    triples table).  Each pattern is an (s, p, o) string triple where a
    leading ``?`` marks a variable; the result carries one column per
    variable and one row per solution mapping (bag semantics, matching
    SPARQL's default).

    ``optional`` patterns implement SPARQL's OPTIONAL: each left-joins
    onto the required solution on its shared variables, so unmatched
    solutions survive with NULL bindings for the optional-only
    variables.

    ``filters`` are SPARQL FILTER expressions as SQL boolean strings
    over the variable columns (e.g. ``"name > 'K'"``); they compile via
    ``F.expr`` so Catalyst folds them into the join tree — a filter
    touching one pattern's variables is pushed below the joins all the
    way to the scan.

    Spark-first shape: each pattern compiles to a filtered projection of
    the SAME triples frame (constant positions become scan predicates —
    pushed down to parquet), and patterns join pairwise on their shared
    variables.  Catalyst plans the join order/strategy; AQE broadcasts
    selective patterns and splits skewed join keys at runtime.  Patterns
    are greedily reordered so every join shares at least one variable
    with the frame built so far — a disjoint pattern would be a
    cartesian product and raises instead.
    """
    return _match(triples, ("subj", "pred", "obj"), patterns,
                  optional, filters, shape_vars)


def bgp_match_quads(quads: DataFrame,
                    patterns: list[tuple[str, str, str, str]],
                    optional: list[tuple[str, str, str, str]] | None = None,
                    filters: list[str] | None = None,
                    shape_vars=None) -> DataFrame:
    """SPARQL GRAPH-clause matching over a quad store: each pattern is
    an (s, p, o, g) 4-tuple whose fourth term scopes the triple pattern
    to a named graph — constant (``GRAPH <g> {...}``) or variable
    (``GRAPH ?g {...}``, binding the provenance graph into the
    solution).  In the transcript lake the graph term is the
    conversation/turn IRI the extraction stamps on every triple, so
    this is how consumers query *where* a fact was said.

    Same compilation as :func:`bgp_match` — a constant graph term
    becomes a scan predicate (partition-prunable when the store is
    written partitioned by graph), a variable joins like any other.
    """
    return _match(quads, ("subj", "pred", "obj", "graph"), patterns,
                  optional, filters, shape_vars)


def _match(frame, positions, patterns, optional, filters,
           shape_vars=None):
    shape = frozenset(shape_vars or ())
    shaped = "obj_is_iri" in frame.columns

    def companions(pos: str, var: str) -> list:
        """The three shape columns for a tracked variable, by binding
        position: the object carries the store's shape (or the lexical
        inference on a shapeless frame); subject / predicate / graph
        terms are IRIs-or-bnodes by the data model."""
        iri, lang, dt = shape_names(var)
        null = F.lit(None).cast("string")
        if pos == "obj":
            if shaped:
                return [F.col("obj_is_iri").alias(iri),
                        F.col("obj_lang").alias(lang),
                        F.col("obj_datatype").alias(dt)]
            return [_lexical_is_iri(F.col("obj")).alias(iri),
                    null.alias(lang), null.alias(dt)]
        return [F.lit(True).alias(iri), null.alias(lang),
                null.alias(dt)]

    def compile_one(pat):
        if len(pat) != len(positions):
            raise ValueError(
                f"pattern {pat} has {len(pat)} terms; expected "
                f"{len(positions)} {positions}")
        df = frame
        cols = []
        seen: dict[str, str] = {}
        for pos, term in zip(positions, pat):
            if term.startswith("?"):
                var = term[1:]
                # a variable PREDICATE ranges over the graph's real
                # predicates only — never the reserved \x00path*
                # virtual edges a sibling property-path pattern
                # materialized into the shared working frame
                if pos == "pred":
                    df = df.filter(
                        ~F.col("pred").startswith(_VIRTUAL_PRED))
                if var in seen:      # repeated variable inside a pattern
                    df = df.filter(F.col(pos) == F.col(seen[var]))
                else:
                    seen[var] = pos
                    cols.append(F.col(pos).alias(var))
                    if var in shape:
                        cols.extend(companions(pos, var))
            else:
                df = df.filter(F.col(pos) == str(term))
                # an EXPLICITLY tagged literal ("x"@en / "x"^^<dt>)
                # constrains the term shape, not just the lexical form
                # (implicit grammar shapes — bare 42 — stay lexical,
                # the documented matching model)
                lg = getattr(term, "lang", None)
                d = getattr(term, "dt", None)
                if ((lg or d) and pos == "obj"
                        and not getattr(term, "implicit", False)):
                    if not shaped:
                        raise ValueError(
                            f"shape-tagged literal pattern {pat} "
                            "needs a frame with literal-shape columns "
                            "(obj_is_iri/obj_lang/obj_datatype)")
                    df = df.filter(~F.col("obj_is_iri"))
                    if lg:
                        df = df.filter(
                            F.lower(F.col("obj_lang")) == lg.lower())
                    else:
                        df = df.filter(
                            F.col("obj_lang").isNull()
                            & (F.col("obj_datatype") == d))
        if not cols:
            raise ValueError(f"pattern {pat} binds no variables")
        return set(seen), df.select(*cols)

    compiled = [compile_one(p) for p in patterns]
    bound, out = compiled[0]
    rest = list(compiled[1:])
    while rest:
        idx = next((i for i, (vs, _) in enumerate(rest) if vs & bound),
                   None)
        if idx is None:
            raise ValueError(
                "disjoint basic graph pattern: no shared variable with "
                f"{sorted(bound)} — a cartesian product at corpus scale; "
                "split the query instead")
        vs, df = rest.pop(idx)
        out = out.join(drop_dup_companions(df, out.columns),
                       sorted(vs & bound), "inner")
        bound |= vs
    # required-pattern variables are certain (never NULL); variables a
    # previous OPTIONAL bound may be NULL, and a later OPTIONAL joining
    # on one needs §18.5 compatibility, not an equi-join
    certain = set(bound)
    for grp in optional or []:
        if isinstance(grp, tuple):
            # back-compat shorthand: a bare pattern is a 1-pattern group
            grp = {"patterns": [grp], "filters": None}
        if not grp["patterns"]:
            raise ValueError(
                "OPTIONAL group without triple patterns (an empty or "
                "FILTER-only OPTIONAL binds nothing)")
        # a multi-pattern OPTIONAL matches as a UNIT (SPARQL left-join
        # of the whole group), so the group solves internally first.
        # FILTERs over group-visible variables apply pre-join (equal
        # to the left-join condition); a filter READING an outer
        # variable is §6.1's expression-over-the-merged-domain form
        # and routes through leftjoin_filter instead
        gvars = {term[1:] for pat in grp["patterns"] for term in pat
                 if isinstance(term, str) and term.startswith("?")}
        inner_f, outer_f = [], []
        for e in grp.get("filters") or []:
            if any(re.search(rf"\b{re.escape(v)}\b", e)
                   for v in bound - gvars):
                outer_f.append(e)
            else:
                inner_f.append(e)
        try:
            sub = _match(frame, positions, grp["patterns"], None,
                         inner_f or None, shape)
        except AnalysisException as exc:
            # an unresolved column: the filter references a variable
            # bound in NEITHER the group nor the outer operands
            raise ValueError(
                "OPTIONAL FILTER references an unknown variable: "
                f"{exc}") from exc
        vs = {c for c in sub.columns
              if not c.startswith(SHAPE_PREFIX)}
        if not vs & bound:
            raise ValueError(
                f"optional group {grp['patterns']} shares no variable "
                f"with {sorted(bound)}")
        nullable = sorted((vs & bound) - certain)
        if len(nullable) > COMPAT_MAX_NULLABLE:
            raise ValueError(
                f"OPTIONAL left-joining on {len(nullable)} possibly-"
                f"unbound variables {nullable}: the null-mask "
                f"decomposition is capped at {COMPAT_MAX_NULLABLE}")
        if outer_f:
            out = leftjoin_filter(out, sub, left_nullable=nullable,
                                  filters=outer_f)
        else:
            out = compat_join(out, sub, left_nullable=nullable,
                              how="left")
        bound |= vs
    for expr in filters or []:
        out = out.filter(F.expr(expr))
    return out


def bgp_union(triples: DataFrame,
              branches: list[dict],
              shape_vars=None) -> DataFrame:
    """SPARQL UNION: each branch is a kwargs dict for :func:`bgp_match`
    (``patterns`` required; ``optional`` / ``filters`` as needed).
    Branch solutions concatenate; variables bound in only some branches
    come back NULL elsewhere (SPARQL's unbound), via
    ``unionByName(allowMissingColumns=True)``.

    Scale shape: branches are independent subplans over the same scan —
    Catalyst reuses the exchange where the patterns overlap, and the
    union is a zero-shuffle concatenation.
    """
    if not branches:
        raise ValueError("bgp_union needs at least one branch")
    outs = [bgp_match(triples, shape_vars=shape_vars, **b)
            for b in branches]
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o, allowMissingColumns=True)
    return result


def bgp_minus(triples: DataFrame,
              patterns: list[tuple[str, str, str]],
              minus: list[tuple[str, str, str]],
              filters: list[str] | None = None) -> DataFrame:
    """SPARQL MINUS / FILTER NOT EXISTS: solutions of ``patterns`` that
    have NO match for the ``minus`` group on their shared variables.
    One left-anti join on the shared variables — the same shuffle an
    inner join would take, with Catalyst free to broadcast whichever
    side is small.
    """
    base = bgp_match(triples, patterns, filters=filters)
    neg = bgp_match(triples, minus)
    shared = sorted(set(base.columns) & set(neg.columns))
    if not shared:
        raise ValueError(
            "MINUS group shares no variable with the base pattern — "
            "per SPARQL semantics that removes nothing; drop the MINUS")
    return base.join(neg.select(*shared).dropDuplicates(), shared,
                     "left_anti")


def bgp_exists(triples: DataFrame,
               patterns: list[tuple[str, str, str]],
               exists: list[tuple[str, str, str]],
               negate: bool = False,
               filters: list[str] | None = None) -> DataFrame:
    """SPARQL ``FILTER EXISTS { ... }`` / ``FILTER NOT EXISTS { ... }``:
    keep solutions of ``patterns`` for which the ``exists`` group does
    (does not, with ``negate``) match under the solution's bindings.

    This is NOT the same operator as :func:`bgp_minus` — the two
    diverge exactly where SPARQL says they do (spec §8.3.3): when the
    inner group shares no variable with the base, MINUS removes nothing
    (disjoint domains), while NOT EXISTS substitutes the (irrelevant)
    bindings and so degenerates to a corpus-level boolean — the group
    either matches at all (drop every solution) or never matches (keep
    every solution).  ``bgp_minus`` refuses the disjoint case; this
    operator implements it.

    Scale shape: shared variables -> one ``left_semi`` / ``left_anti``
    join on them (duplicate-free probe side, broadcastable).  Disjoint
    group -> the existence test collapses to a 0-or-1-row frame
    (``limit(1)``; executes a partial scan with early stop, never a
    full count) that joins on a constant key — a broadcast of at most
    one row, no data shuffle.
    """
    base = bgp_match(triples, patterns, filters=filters)
    grp = bgp_match(triples, exists)
    shared = sorted(set(base.columns) & set(grp.columns))
    if shared:
        return base.join(grp.select(*shared).dropDuplicates(), shared,
                         "left_anti" if negate else "left_semi")
    flag = grp.limit(1).select(F.lit(1).alias("_k"))
    return (base.withColumn("_k", F.lit(1))
            .join(F.broadcast(flag), "_k",
                  "left_anti" if negate else "left_semi")
            .drop("_k"))


def bind(sols: DataFrame, var: str, expr: str) -> DataFrame:
    """SPARQL ``BIND(expr AS ?var)``: extend every solution with a
    computed binding.  ``expr`` is a SQL expression over the bound
    variable columns, compiled via ``F.expr`` so it stays inside
    whole-stage codegen — a pure projection, zero shuffle.

    SPARQL forbids rebinding an in-scope variable (spec §10.1); this
    raises rather than silently shadowing.
    """
    if var in sols.columns:
        raise ValueError(
            f"BIND target ?{var} is already bound — SPARQL forbids "
            "rebinding an in-scope variable; pick a fresh name")
    return sols.withColumn(var, F.expr(expr))


def construct(triples: DataFrame,
              patterns: list[tuple[str, str, str]],
              template: list[tuple[str, str, str]],
              optional: list[tuple[str, str, str]] | None = None,
              filters: list[str] | None = None,
              shape_vars=None,
              obj_shapes: list | None = None) -> DataFrame:
    """SPARQL CONSTRUCT — rule-based triple derivation, the KG-
    construction primitive: match ``patterns``, instantiate every
    ``template`` (s, p, o) per solution (``?var`` positions substitute
    bindings, other positions are constants), emit the derived graph
    with set semantics.

    Template rows containing a variable that is NULL in a solution
    (possible via ``optional``) are skipped for that solution, matching
    SPARQL's incomplete-triple rule.

    Scale shape: the solution frame fans out through an in-row array of
    template structs + explode — one narrow map over the join output,
    no extra shuffle; the final distinct is the only added exchange
    (set semantics, same as every other graph op here).
    """
    sols = bgp_match(triples, patterns, optional=optional,
                     filters=filters, shape_vars=shape_vars)
    return construct_solutions(sols, template, obj_shapes=obj_shapes)


def construct_solutions(sols: DataFrame,
                        template: list[tuple[str, str, str]],
                        obj_shapes: list[tuple] | None = None,
                        graphs: list | None = None) -> DataFrame:
    """The instantiation half of :func:`construct`: explode every
    ``template`` (s, p, o) per solution row (``?var`` positions
    substitute bindings, NULL-binding rows are skipped per the
    incomplete-triple rule), with set semantics.  Exposed separately so
    callers holding an already-solved frame (e.g. SPARQL UPDATE
    instantiating both a DELETE and an INSERT template from ONE WHERE
    match) don't re-run the pattern join per template.

    ``graphs`` (one entry per template entry, SPARQL UPDATE's
    QuadPattern instantiation) additionally emits a ``graph`` column:
    each entry is ``None`` (the default graph — a NULL cell), a
    constant graph IRI, or a ``?var`` whose per-row binding supplies
    the target — an UNBOUND graph variable instantiates nothing for
    that row, like any other template position.

    ``obj_shapes`` (one entry per template entry) additionally emits
    the literal-shape columns — SPARQL UPDATE and shaped CONSTRUCT use
    it so derived rows land with real term shapes instead of the
    all-IRI default.  Each entry is either a constant
    ``(is_iri, lang, datatype)`` triple (template constants carry
    their parse-time shape) or the string ``"binding"``: the object is
    a variable and its shape is read per-row from the solution frame's
    hidden ``__shape_<var>_*`` companion columns (ask the matcher for
    them via ``shape_vars``)."""
    def term(t):
        t = str(t)  # parser terms may be str subclasses
        # BIND/aggregate-bound variables are typed columns; the
        # lexical triple model stores the string form
        return (F.col(t[1:]).cast("string") if t.startswith("?")
                else F.lit(t))

    if obj_shapes is not None and len(obj_shapes) != len(template):
        raise ValueError("obj_shapes must align with template")
    if graphs is not None and len(graphs) != len(template):
        raise ValueError("graphs must align with template")

    def fields(i, s, p, o):
        subj = term(s)
        if graphs is not None and str(graphs[i]).startswith("?"):
            # unbound graph binding -> no instantiation for this row:
            # poison the subject so the incomplete-row filter drops it
            subj = F.when(F.col(str(graphs[i])[1:]).isNotNull(), subj)
        out = [subj.alias("subj"), term(p).alias("pred"),
               term(o).alias("obj")]
        if graphs is not None:
            gt = graphs[i]
            gcol = (F.col(str(gt)[1:]).cast("string")
                    if str(gt).startswith("?")
                    else F.lit(gt).cast("string"))
            out.append(gcol.alias("graph"))
        if obj_shapes is not None:
            if obj_shapes[i] == "binding":
                iri, lang, dt = shape_names(str(o)[1:])
                # a NULL companion (BIND/subquery-bound value — shape
                # unknown) falls back to the engine-wide lexical
                # inference: NULL obj_is_iri would serialize as an
                # IRI, silently corrupting derived literals
                out += [F.coalesce(F.col(iri).cast("boolean"),
                                   _lexical_is_iri(term(o)))
                        .alias("obj_is_iri"),
                        F.col(lang).cast("string").alias("obj_lang"),
                        F.col(dt).cast("string")
                        .alias("obj_datatype")]
            else:
                is_iri, lang, dtype = obj_shapes[i]
                out += [F.lit(bool(is_iri)).alias("obj_is_iri"),
                        F.lit(lang).cast("string").alias("obj_lang"),
                        F.lit(dtype).cast("string")
                        .alias("obj_datatype")]
        return out

    cols = (["subj", "pred", "obj"]
            + (["graph"] if graphs is not None else [])
            + (["obj_is_iri", "obj_lang", "obj_datatype"]
               if obj_shapes is not None else []))
    rows = F.array(*[F.struct(*fields(i, s, p, o))
                     for i, (s, p, o) in enumerate(template)])
    out = (sols.select(F.explode(rows).alias("t"))
           .select(*[f"t.{c}" for c in cols])
           .filter(F.col("subj").isNotNull() & F.col("pred").isNotNull()
                   & F.col("obj").isNotNull()))
    return out.dropDuplicates()


def path_closure(triples: DataFrame, pred: str,
                 out_pred: str | None = None,
                 max_iterations: int = 20,
                 strategy: str = "seminaive") -> DataFrame:
    """SPARQL property path ``pred+``: the transitive closure of one
    predicate's edges, rematerialized as triples under ``out_pred``
    (default: ``pred`` itself).  Join the result into :func:`bgp_match`
    patterns to query ``?x pred+ ?y`` — the path becomes an ordinary
    virtual predicate, so the BGP planner (and Catalyst) treat it like
    any other pattern.

    The predicate filter is pushed to the scan before the fixpoint, so
    the closure only ever shuffles that predicate's edge set — at corpus
    scale that's the difference between closing a hierarchy (millions of
    edges) and closing the whole graph (trillions).
    """
    edges = (triples.filter(F.col("pred") == pred)
             .select(F.col("subj").alias("src"),
                     F.col("obj").alias("dst")))
    closed = transitive_closure(edges, max_iterations=max_iterations,
                                strategy=strategy)
    return closed.select(F.col("src").alias("subj"),
                         F.lit(out_pred or pred).alias("pred"),
                         F.col("dst").alias("obj"))


def obj_shape_cols(df: DataFrame) -> list[str]:
    """The literal-shape columns present on a frame.  The single-hop
    path forms (alt / negated / seq's last hop / inverse) keep them so
    term-shape builtins still see a path-bound object's shape; the
    closure forms don't (a multi-hop endpoint's shape is unknown by
    construction and reads as NULL)."""
    return [c for c in ("obj_is_iri", "obj_lang", "obj_datatype")
            if c in df.columns]


def path_seq(triples: DataFrame, preds: list[str],
             out_pred: str) -> DataFrame:
    """SPARQL sequence path ``p1/p2/.../pn`` as a virtual predicate:
    endpoints connected by following each predicate in order.  Compiles
    to n-1 equi-joins over per-predicate scan slices (each predicate
    filter pushes down); Catalyst picks broadcast vs shuffle per hop.
    """
    if not preds:
        raise ValueError("path_seq needs at least one predicate")
    sh = obj_shape_cols(triples)
    hops = []
    for i, p in enumerate(preds):
        cols = [F.col("subj").alias(f"_n{i}"),
                F.col("obj").alias(f"_n{i + 1}")]
        if i == len(preds) - 1:  # the endpoint keeps its shape
            cols += [F.col(c) for c in sh]
        hops.append(triples.filter(F.col("pred") == p).select(*cols))
    out = hops[0]
    for i, h in enumerate(hops[1:], start=1):
        out = out.join(h, f"_n{i}")
    return (out.select(F.col("_n0").alias("subj"),
                       F.lit(out_pred).alias("pred"),
                       F.col(f"_n{len(preds)}").alias("obj"), *sh)
            .dropDuplicates())


def path_alt(triples: DataFrame, preds: list[str],
             out_pred: str) -> DataFrame:
    """SPARQL alternative path ``p1|p2|...`` — one scan with an IN
    filter, rewritten under the virtual predicate (set semantics)."""
    if not preds:
        raise ValueError("path_alt needs at least one predicate")
    return (triples.filter(F.col("pred").isin(preds))
            .select("subj", F.lit(out_pred).alias("pred"), "obj",
                    *obj_shape_cols(triples))
            .dropDuplicates())


def path_inverse(triples: DataFrame, pred: str,
                 out_pred: str) -> DataFrame:
    """SPARQL inverse path ``^p`` — subject/object swap under the
    virtual predicate (a projection; zero shuffle).  The new object is
    the original SUBJECT, an IRI-or-bnode by the data model."""
    out = (triples.filter(F.col("pred") == pred)
           .select(F.col("obj").alias("subj"),
                   F.lit(out_pred).alias("pred"),
                   F.col("subj").alias("obj")))
    if obj_shape_cols(triples):
        out = (out.withColumn("obj_is_iri", F.lit(True))
               .withColumn("obj_lang", F.lit(None).cast("string"))
               .withColumn("obj_datatype", F.lit(None).cast("string")))
    return out


def path_negated(triples: DataFrame, preds: list[str],
                 out_pred: str) -> DataFrame:
    """SPARQL negated property set ``!(p1|p2|...)`` — every edge whose
    predicate is NOT in the excluded set, rewritten under the virtual
    predicate.  One scan with a NOT-IN filter (pushed down); set
    semantics like the other path operators."""
    if not preds:
        raise ValueError("path_negated needs at least one excluded "
                         "predicate (use the triples frame directly "
                         "for the empty set)")
    return (triples.filter(~F.col("pred").isin(preds)
                           & ~F.col("pred").startswith(_VIRTUAL_PRED))
            .select("subj", F.lit(out_pred).alias("pred"), "obj",
                    *obj_shape_cols(triples))
            .dropDuplicates())


def path_negated_set(triples: DataFrame, fwd: list[str],
                     inv: list[str], out_pred: str) -> DataFrame:
    """SPARQL §9.1 negated property set WITH inverse members:
    ``!(p1|..|^q1|..)`` matches (x, y) when a FORWARD edge x->y has a
    predicate outside {p1..}, or a REVERSE edge y->x has a predicate
    outside {q1..} — each edge direction is excluded against its own
    set, the spec's NPS translation.  Two NOT-IN scans of the same
    frame plus a projection flip — zero joins; flipped rows' objects
    are original subjects (IRI-or-bnode by the data model), stamped
    accordingly when shape columns ride along.  Set semantics over
    full rows, like :func:`path_negated` (a pair reached through two
    distinct object TERMS stays two solutions)."""
    if not fwd and not inv:
        raise ValueError("path_negated_set needs a nonempty "
                         "exclusion set")
    base = triples.filter(~F.col("pred").startswith(_VIRTUAL_PRED))
    shape = obj_shape_cols(triples)
    parts = []
    if fwd:
        parts.append(
            base.filter(~F.col("pred").isin(fwd))
            .select("subj", F.lit(out_pred).alias("pred"), "obj",
                    *shape))
    if inv:
        flipped = (base.filter(~F.col("pred").isin(inv))
                   .select(F.col("obj").alias("subj"),
                           F.lit(out_pred).alias("pred"),
                           F.col("subj").alias("obj")))
        if shape:
            flipped = (flipped
                       .withColumn("obj_is_iri", F.lit(True))
                       .withColumn("obj_lang",
                                   F.lit(None).cast("string"))
                       .withColumn("obj_datatype",
                                   F.lit(None).cast("string")))
        parts.append(flipped)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates()


def graph_terms(triples: DataFrame) -> DataFrame:
    """All RDF terms appearing in subject or object position — the
    domain SPARQL gives zero-length property paths.  One column
    ``node``; a union of two projections of the same scan (Catalyst
    reuses the exchange), distinct."""
    return (triples.select(F.col("subj").alias("node"))
            .unionByName(triples.select(F.col("obj").alias("node")))
            .dropDuplicates())


def path_zero_or_one(triples: DataFrame, pred: str,
                     out_pred: str) -> DataFrame:
    """SPARQL path ``p?``: the predicate's edges plus the zero-length
    path (t, t) for every term in the graph — per the SPARQL spec the
    zero-length path relates each graph term to itself, independent of
    the predicate."""
    edges = (triples.filter(F.col("pred") == pred)
             .select("subj", F.lit(out_pred).alias("pred"), "obj"))
    zero = graph_terms(triples).select(
        F.col("node").alias("subj"), F.lit(out_pred).alias("pred"),
        F.col("node").alias("obj"))
    return edges.unionByName(zero).dropDuplicates()


def path_zero_or_more(triples: DataFrame, pred: str,
                      out_pred: str | None = None,
                      max_iterations: int = 20,
                      strategy: str = "seminaive") -> DataFrame:
    """SPARQL path ``p*``: :func:`path_closure` (``p+``) unioned with
    the zero-length (t, t) pairs over every graph term.  The closure
    only shuffles the predicate's edge slice; the zero pairs are a
    narrow distinct over the scan."""
    out = out_pred or pred
    plus = path_closure(triples, pred, out_pred=out,
                        max_iterations=max_iterations, strategy=strategy)
    zero = graph_terms(triples).select(
        F.col("node").alias("subj"), F.lit(out).alias("pred"),
        F.col("node").alias("obj"))
    return plus.unionByName(zero).dropDuplicates()


def bgp_values(triples: DataFrame,
               patterns: list[tuple[str, str, str]],
               var_names: list[str],
               rows: list[tuple],
               optional: list[tuple[str, str, str]] | None = None,
               filters: list[str] | None = None,
               shape_vars=None) -> DataFrame:
    """SPARQL VALUES: constrain (and extend) BGP solutions with an
    inline binding table.  ``var_names`` are the VALUES variables (no
    ``?``), ``rows`` their bindings; ``None`` is UNDEF — that variable
    is unconstrained for that row, per the spec's compatible-mapping
    rule.

    Scale shape: the binding table is literal driver data, so Spark
    broadcasts it and the join never shuffles the solution side.  UNDEF
    support without a non-equi join: rows group by their defined-column
    mask, each group equi-joins on exactly its defined variables, and
    the groups union — every join stays a hash join.
    """
    if not var_names:
        raise ValueError("bgp_values needs at least one variable")
    for r in rows:
        if len(r) != len(var_names):
            raise ValueError(f"VALUES row {r} arity != {var_names}")
    sols = bgp_match(triples, patterns, optional=optional,
                     filters=filters, shape_vars=shape_vars)
    shared = [v for v in var_names if v in sols.columns]
    if not shared:
        raise ValueError(
            "VALUES shares no variable with the pattern group — the "
            "binding table would cross-join every solution")

    spark = triples.sparkSession
    extra = [v for v in var_names if v not in sols.columns]
    if not rows:  # empty binding table: joins away every solution
        out = sols.limit(0)
        for v in extra:
            out = out.withColumn(v, F.lit(None).cast("string"))
        return ensure_shape_companions(out, shape_vars)
    by_mask: dict[tuple[str, ...], list[tuple]] = {}
    for r in rows:
        mask = tuple(v for v, cell in zip(var_names, r)
                     if cell is not None and v in shared)
        by_mask.setdefault(mask, []).append(r)

    out = None
    for mask, grp in by_mask.items():
        if not mask and not extra:
            # rows binding nothing at all keep every solution — one
            # union branch PER ROW (bag semantics: VALUES joins as a
            # multiset, so k all-UNDEF rows multiply solutions by k)
            joined = sols
            for _ in grp[1:]:
                joined = joined.unionByName(sols)
        else:
            vals = spark.createDataFrame(
                [tuple(str(c) if c is not None else None for c in r)
                 for r in grp],
                ", ".join(f"`{v}` string" for v in var_names))
            if mask:
                # no dropDuplicates: VALUES joins as a MULTISET
                # (§18.5) — duplicate bound rows multiply solutions,
                # same bag posture as the branches below
                joined = sols.join(
                    F.broadcast(vals.select(*mask, *extra)),
                    list(mask), "inner")
            else:
                # rows whose defined cells are all UNDEF or all on
                # extension variables constrain nothing: each is a
                # union branch keeping every solution, extended with
                # that row's extra bindings (NULL when those are UNDEF
                # too) — no dropDuplicates: duplicate rows keep their
                # bag multiplicity, like the all-UNDEF branch above
                joined = sols.crossJoin(
                    F.broadcast(vals.select(*extra)))
        out = joined if out is None else out.unionByName(
            joined, allowMissingColumns=True)
    # VALUES-introduced bindings carry no store shape: infer lexically
    return ensure_shape_companions(out, shape_vars)


_SQL_KEYWORDS = frozenset(
    "and or not case when then else end null true false is in like "
    "as cast distinct asc desc between".split())


def _sql_column_refs(expr: str) -> set[str]:
    """Best-effort column references of a SQL expression: bare
    identifiers that aren't function calls, keywords or inside string
    literals.  Used only to REJECT ambiguous shapes early — a false
    positive surfaces as a clear error, never a wrong answer."""
    stripped = re.sub(r"'(?:[^'\\]|\\.)*'", "", expr)
    return {m.group(1)
            for m in re.finditer(r"\b([A-Za-z_]\w*)\b(?!\s*\()",
                                 stripped)
            if m.group(1).lower() not in _SQL_KEYWORDS}


def select_solutions(sols: DataFrame,
                     order_by: list[str] | None = None,
                     limit: int | None = None,
                     offset: int = 0,
                     distinct: bool = False,
                     project: list[str] | None = None) -> DataFrame:
    """SPARQL solution modifiers: SELECT projection, DISTINCT,
    ORDER BY (``"var"`` ascending, ``"-var"`` descending, or an
    ``("asc"|"desc", sql_expr)`` pair for expression order
    conditions), LIMIT / OFFSET.  Without DISTINCT the sort runs
    BEFORE projection, so order conditions may reference
    non-projected variables (§18.2.4.4); with DISTINCT they must use
    projected columns only — anything else is rejected, never an
    arbitrary pick.

    Scale shape: ORDER BY + LIMIT plans as TakeOrdered — each partition
    keeps its local top (limit+offset) and only those rows reach the
    driver-side merge; no global sort materializes.  An ORDER BY with
    no LIMIT is an honest full sort (range-partitioned exchange),
    because that is what the query asks for.
    """
    out = sols
    keys = [(F.expr(k[1]).desc() if k[0] == "desc"
             else F.expr(k[1])) if isinstance(k, tuple)
            else (F.col(k[1:]).desc() if k.startswith("-")
                  else F.col(k))
            for k in order_by or []]
    if distinct:
        # DISTINCT collapses the PROJECTED solutions, so the sort can
        # only come after it and must use projected columns — ordering
        # by a non-projected variable under DISTINCT is ambiguous (the
        # collapsed row has no single source value).  Validated HERE
        # because Spark's ResolveMissingReferences would silently pull
        # the missing column through dropDuplicates and return an
        # arbitrary, partition-dependent "order"
        if project:
            bad = [r for k in order_by or []
                   for r in _sql_column_refs(
                       k[1] if isinstance(k, tuple) else k.lstrip("-"))
                   if r not in project]
            if bad:
                raise ValueError(
                    f"ORDER BY references non-projected columns {bad} "
                    "under DISTINCT — project them or drop DISTINCT")
            out = out.select(*project)
        out = out.dropDuplicates()
        if keys:
            out = out.orderBy(*keys)
    else:
        # ORDER BY precedes projection in the SPARQL algebra
        # (§18.2.4.4 Slice∘Project∘OrderBy), so order conditions may
        # reference non-projected variables; the narrow projection
        # afterwards preserves the sort
        if keys:
            out = out.orderBy(*keys)
        if project:
            out = out.select(*project)
    if offset:
        if not order_by:
            raise ValueError("OFFSET without ORDER BY is "
                             "non-deterministic; add order_by")
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def solution_agg(sols: DataFrame, group_by: list[str],
                 aggs: dict[str, tuple],
                 having: str | None = None) -> DataFrame:
    """SPARQL aggregates over a solution frame.  ``aggs`` maps output
    column -> (kind, var) or (kind, var, separator) for group_concat.
    Kinds: count (var ``*`` for COUNT(*)), count_distinct, sum, avg,
    min, max, sample, group_concat.  ``having`` is a SPARQL HAVING
    clause as a SQL boolean over the OUTPUT columns (group keys +
    aggregate aliases), applied after the aggregation — Catalyst keeps
    the partial (map-side) aggregation intact and filters post-merge,
    which is the only correct placement for a predicate over aggregate
    values.

    Determinism: SPARQL leaves SAMPLE's choice and GROUP_CONCAT's order
    implementation-defined; here SAMPLE is the minimum and GROUP_CONCAT
    sorts its values, so results are stable across runs and partition
    layouts — required for the lake's reproducibility contract.

    One hash aggregation with map-side partials; group_concat's
    collect_list is bounded by the group's solution count (document
    cardinality), not the corpus.
    """
    exprs = []
    for name, spec in aggs.items():
        kind, var = spec[0], spec[1]
        if kind == "count":
            e = F.count(F.lit(1)) if var == "*" else F.count(var)
        elif kind == "count_distinct":
            e = F.countDistinct(var)
        elif kind == "sum":
            e = F.sum(var)
        elif kind == "sum_distinct":
            e = F.sum_distinct(F.col(var))
        elif kind == "avg":
            e = F.avg(var)
        elif kind == "avg_distinct":
            e = F.expr(f"avg(DISTINCT `{var}`)")
        elif kind == "min":
            e = F.min(var)
        elif kind == "max":
            e = F.max(var)
        elif kind == "sample":
            e = F.min(var)
        elif kind in ("group_concat", "group_concat_distinct"):
            sep = spec[2] if len(spec) > 2 else " "
            vals = (F.collect_set(var) if kind.endswith("_distinct")
                    else F.collect_list(var))
            e = F.array_join(F.array_sort(vals), sep)
        else:
            raise ValueError(f"unknown aggregate kind {kind!r}")
        exprs.append(e.alias(name))
    out = sols.groupBy(*group_by).agg(*exprs)
    if having:
        out = out.filter(F.expr(having))
    return out


GENID = "/.well-known/genid/"


def skolemize(triples: DataFrame,
              base: str = "http://transcript.local") -> DataFrame:
    """Replace blank-node labels with RDF 1.1 skolem IRIs
    (``<base>/.well-known/genid/<label>``) in subject and object
    position — the spec's mechanism for making bnodes stable across
    graph merges, exactly what a lake needs before cross-document joins
    or sinks.  The extraction UDF already emits per-document
    deterministic labels (keyed on conv_id/turn_idx), so the rewrite is
    collision-free corpus-wide.

    Pure column algebra (two conditional string concats) — zero
    shuffle, stays inside whole-stage codegen.  ``obj_is_iri`` is left
    untouched: in this term model it means "reference, not literal",
    which covers bnodes and skolem IRIs alike, so it is invariant under
    the rewrite (and the inverse).
    """
    prefix = base + GENID

    def sk(col):
        return F.when(col.startswith("_:"),
                      F.concat(F.lit(prefix), col.substr(F.lit(3),
                                                         F.length(col)))
                      ).otherwise(col)

    return triples.withColumn("subj", sk(F.col("subj"))) \
        .withColumn("obj", sk(F.col("obj")))


def deskolemize(triples: DataFrame,
                base: str = "http://transcript.local") -> DataFrame:
    """Inverse of :func:`skolemize`: genid IRIs under ``base`` become
    ``_:`` labels again (for serializers whose consumers expect
    bnodes).  Same zero-shuffle column algebra; ``obj_is_iri`` is
    invariant (see :func:`skolemize`)."""
    prefix = base + GENID

    def unsk(col):
        return F.when(
            col.startswith(prefix),
            F.concat(F.lit("_:"),
                     col.substr(F.lit(len(prefix) + 1), F.length(col)))
        ).otherwise(col)

    return triples.withColumn("subj", unsk(F.col("subj"))) \
        .withColumn("obj", unsk(F.col("obj")))


def ask(triples: DataFrame,
        patterns: list[tuple[str, str, str]],
        filters: list[str] | None = None) -> DataFrame:
    """SPARQL ASK: one row, one boolean ``result`` column — does the
    pattern group have any solution.  ``limit(1)`` before the aggregate
    short-circuits the scan (GlobalLimit stops tasks after the first
    solution); the aggregate turns present/absent into true/false."""
    sols = bgp_match(triples, patterns, filters=filters)
    return sols.limit(1).agg(
        (F.count(F.lit(1)) > 0).alias("result"))


def describe(triples: DataFrame, nodes: list[str],
             max_hops: int = 10) -> DataFrame:
    """SPARQL DESCRIBE as a Concise Bounded Description: every triple
    whose subject is a requested node, recursing through blank-node
    objects (a bnode has no global identity, so its description belongs
    to the describing resource) up to ``max_hops`` levels.

    Scale shape: the frontier is per-entity-sized (the seeds plus their
    bnode children), so each hop is a broadcast semi-join against the
    triple scan — no shuffle of the corpus; the frontier is
    lineage-truncated per hop.  Raises if bnode chains outrun
    ``max_hops`` rather than returning a silently truncated
    description.
    """
    if not nodes:
        raise ValueError("describe needs at least one node")
    spark = triples.sparkSession
    frontier = spark.createDataFrame([(n,) for n in nodes], ["subj"]) \
        .dropDuplicates()
    return _describe_loop(triples, frontier, max_hops, hint=True)


def describe_frame(triples: DataFrame, nodes: DataFrame,
                   node_col: str = "node",
                   max_hops: int = 10) -> DataFrame:
    """:func:`describe` driven by a node FRAME instead of a literal
    list — the ``DESCRIBE ?x WHERE {...}`` form, where the solution
    set picks the resources.  Unlike the list form the frontier is not
    broadcast-hinted: a solution-driven node set can be large, so the
    join strategy is left to Catalyst/AQE (which still broadcasts
    small frontiers from runtime stats)."""
    frontier = nodes.select(F.col(node_col).alias("subj")) \
        .filter(F.col("subj").isNotNull()).dropDuplicates()
    return _describe_loop(triples, frontier, max_hops, hint=False)


def _describe_loop(triples: DataFrame, frontier: DataFrame,
                   max_hops: int, hint: bool) -> DataFrame:
    seen = frontier
    out = None
    for _ in range(max_hops):
        f = F.broadcast(frontier) if hint else frontier
        hop = triples.join(f, "subj", "inner")
        out = hop if out is None else out.unionByName(hop)
        frontier = (hop.filter(F.col("obj").startswith("_:"))
                    .select(F.col("obj").alias("subj"))
                    .dropDuplicates()
                    .join(seen, "subj", "left_anti")
                    .localCheckpoint(eager=True))
        if frontier.isEmpty():
            return out.dropDuplicates()
        seen = seen.unionByName(frontier).localCheckpoint(eager=True)
    raise RuntimeError(
        f"describe: blank-node chain deeper than {max_hops} hops; "
        "raise max_hops")


def bfs_distances(edges: DataFrame, sources: list[str],
                  max_hops: int = 20) -> DataFrame:
    """Multi-source BFS over directed ``(src, dst)`` edges: for every
    reachable node, the fewest hops from ANY source — the "within k
    hops of these entities" neighborhood query KG curation runs to
    scope subgraphs around seed entities.  Output: ``(node, dist)``
    with sources at distance 0.

    Scale shape: one equi-join shuffle per BFS layer; the frontier is
    anti-joined against the visited set so a node is expanded exactly
    once (first reach IS the minimum distance, by layer order), and
    both frontier and accumulator are lineage-truncated per hop.  Seed
    neighborhoods are usually small, so Catalyst/AQE broadcast the
    frontier side.  Raises when the frontier is still non-empty after
    ``max_hops`` — a silently truncated neighborhood would drop
    exactly the boundary the query asked for.
    """
    if not sources:
        raise ValueError("bfs_distances needs at least one source")
    spark = edges.sparkSession
    e = edges.select("src", "dst").dropDuplicates()
    frontier = spark.createDataFrame(
        [(n,) for n in sources], ["node"]).dropDuplicates()
    out = frontier.select("node", F.lit(0).cast("bigint").alias("dist"))
    for hop in range(1, max_hops + 1):
        nxt = (e.join(frontier.withColumnRenamed("node", "src"), "src")
               .select(F.col("dst").alias("node"))
               .dropDuplicates()
               .join(out.select("node"), "node", "left_anti")
               .localCheckpoint(eager=True))
        if nxt.isEmpty():
            return out
        out = out.unionByName(
            nxt.select("node", F.lit(hop).cast("bigint").alias("dist"))
        ).localCheckpoint(eager=True)
        frontier = nxt
    if not (e.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .join(out.select("node"), "node", "left_anti").isEmpty()):
        raise RuntimeError(
            f"bfs_distances frontier still expanding after {max_hops} "
            f"hops; raise max_hops")
    return out


def triangles(edges: DataFrame) -> DataFrame:
    """Enumerate each triangle of the undirected graph ``(src, dst)``
    exactly once; returns ``(u, v, w)`` with the endpoints in
    degree-rank order.  Self-loops drop; parallel/reversed edges count
    once (simple-graph semantics).

    Scale shape (the MapReduce triangle-counting strategy of Suri &
    Vassilvitskii, WWW'11): orient every edge from its lower
    ``(degree, id)`` endpoint to the higher, generate wedges only at
    each vertex's oriented OUT-neighbours, and close them against the
    oriented edge set.  Orientation bounds per-vertex wedge fan-out by
    O(sqrt(m)) regardless of max degree — a star hub that would
    generate deg² wedges under naive enumeration generates none,
    because all its edges point INTO it.  Three shuffles total (degree
    count, wedge join, closing join); the closing join is equi-keyed on
    both wedge endpoints.
    """
    canon = (edges
             .select(F.least("src", "dst").alias("a"),
                     F.greatest("src", "dst").alias("b"))
             .filter(F.col("a") != F.col("b"))
             .dropDuplicates())
    deg = (canon.select(F.col("a").alias("node"))
           .unionByName(canon.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count("*").alias("deg")))
    ranked = (canon
              .join(deg.withColumnsRenamed({"node": "a", "deg": "da"}),
                    "a")
              .join(deg.withColumnsRenamed({"node": "b", "deg": "db"}),
                    "b"))
    rank_a = F.struct(F.col("da").alias("d"), F.col("a").alias("n"))
    rank_b = F.struct(F.col("db").alias("d"), F.col("b").alias("n"))
    oriented = ranked.select(
        F.when(rank_a < rank_b, F.col("a")).otherwise(F.col("b"))
        .alias("u"),
        F.when(rank_a < rank_b, F.col("b")).otherwise(F.col("a"))
        .alias("v"),
        F.when(rank_a < rank_b, rank_b).otherwise(rank_a)
        .alias("rank_v"))
    e1 = oriented.select(F.col("u"), F.col("v").alias("x"),
                         F.col("rank_v").alias("rank_x"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("y"),
                         F.col("rank_v").alias("rank_y"))
    wedges = e1.join(e2, "u").filter(F.col("rank_x") < F.col("rank_y"))
    closing = oriented.select(F.col("u").alias("x"),
                              F.col("v").alias("y"))
    return (wedges.join(closing, ["x", "y"], "left_semi")
            .select(F.col("u"), F.col("x").alias("v"),
                    F.col("y").alias("w")))


def triangle_count(edges: DataFrame,
                   per_vertex: bool = False) -> DataFrame:
    """Triangle counts over the undirected ``(src, dst)`` graph — the
    clustering/community signal KG curation uses to separate organic
    entity neighbourhoods from boilerplate link farms.

    Returns a 1-row ``(n_triangles)`` frame, or with ``per_vertex``
    one ``(node, n_tri)`` row per vertex that participates in at least
    one triangle.  Built on :func:`triangles`; the per-vertex rollup is
    an in-row 3-way fan-out + one map-side-partial count.
    """
    tri = triangles(edges)
    if not per_vertex:
        return tri.agg(F.count("*").alias("n_triangles"))
    return (tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
            .groupBy("node").agg(F.count("*").alias("n_tri")))


def pagerank(edges: DataFrame, iterations: int = 10,
             damping: float = 0.85) -> DataFrame:
    """Fixed-iteration PageRank over (src, dst) edges — the KG
    centrality signal curation pipelines use to weight entities (and
    the canonical iterative-algorithm shape alongside
    :func:`transitive_closure`).

    Returns (node, rank) for every node appearing in the edge list;
    ranks sum to 1.  Dangling nodes (no out-edges) redistribute their
    mass uniformly each round, per the standard formulation.

    Scale shape per round: one shuffle to aggregate contributions by
    destination (map-side partial sums) plus one broadcast of the
    1-row dangling-mass aggregate; the rank frame is
    ``localCheckpoint``ed so lineage stays flat across rounds (same
    discipline as :func:`transitive_closure`).  Out-degrees are
    computed once, outside the loop.
    """
    e = edges.select("src", "dst").dropDuplicates() \
        .localCheckpoint(eager=True)  # see transitive_closure: no cache leak
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .dropDuplicates().localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = (e.groupBy(F.col("src").alias("node"))
              .agg(F.count(F.lit(1)).alias("outdeg"))
              .localCheckpoint(eager=True))

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        with_deg = ranks.join(outdeg, "node", "left")
        # dangling mass: a 1-row aggregate, broadcast onto every node
        dm = with_deg.filter(F.col("outdeg").isNull()) \
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        contribs = (with_deg.filter(F.col("outdeg").isNotNull())
                    .join(e, F.col("node") == F.col("src"))
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.sum(F.col("rank") / F.col("outdeg"))
                         .alias("contrib")))
        prev = ranks
        ranks = (nodes.join(contribs, "node", "left")
                 .join(F.broadcast(dm))
                 .select("node",
                         (F.lit(base)
                          + F.lit(damping)
                          * (F.coalesce(F.col("contrib"), F.lit(0.0))
                             + F.col("_dm") / n)).alias("rank"))
                 .localCheckpoint(eager=True))
        if prev is not None and prev.is_cached:
            prev.unpersist()
    return ranks


def property_table(triples: DataFrame,
                   predicates: list[str]) -> DataFrame:
    """Subject × predicate pivot: the classic KG 'property table'
    materialization (one wide row per subject, one column per chosen
    predicate) that downstream feature pipelines and entity views read
    instead of self-joining the triple store per attribute.

    Column names are the predicates' local names (after ``#`` / last
    ``/``).  Multi-valued predicates keep the MINIMUM object so the
    table is deterministic under any partitioning.

    Scale shape: ONE hash aggregation on subj (map-side partial min per
    predicate — conditional aggregation, no joins, no pivot shuffle per
    column); the predicate IN-filter prunes the scan.
    """
    def local_name(p: str) -> str:
        tail = (p.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
                .rsplit(":", 1)[-1])
        return tail or p

    names = [local_name(p) for p in predicates]
    if len(set(names)) != len(names):
        raise ValueError(f"predicate local names collide: {names}")
    aggs = [F.min(F.when(F.col("pred") == p, F.col("obj")))
            .alias(name) for p, name in zip(predicates, names)]
    return (triples
            .filter(F.col("pred").isin(predicates))
            .groupBy("subj")
            .agg(*aggs))


def apply_diff(snapshot: DataFrame, diff: DataFrame) -> DataFrame:
    """Replay a :func:`graph_diff` changelog onto a snapshot — the
    consumer half of the CDC loop: ``apply_diff(old, graph_diff(old,
    new))`` reproduces ``new`` exactly (set semantics).  Idempotent:
    replaying the same diff twice is a no-op, so at-least-once delivery
    of the changelog is safe.

    Scale shape: one left-anti join (removals) + a union with the
    additions; both shuffle on the same triple key, AQE broadcasts the
    diff side when a run's changelog is small — the common case for
    incremental extraction.  The anti join is NULL-SAFE on
    ``obj_lang``/``obj_datatype`` (NULL for plain literals and IRIs) —
    a plain ``=`` key would never match those rows and removals would
    silently no-op.
    """
    on = [c for c in TRIPLE_KEY if c in snapshot.columns]
    removed = diff.filter(F.col("op") == "removed").select(on)
    added = diff.filter(F.col("op") == "added").select(on)
    return (_triple_key_join(snapshot.select(on), removed, "left_anti")
            .unionByName(added)
            .dropDuplicates())


def graph_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Snapshot delta between two graph versions: one row per triple
    that was added or removed, tagged ``op`` ('added' / 'removed') —
    the primitive an incremental KG pipeline publishes per run so
    downstream consumers replay changes instead of re-reading the full
    table (the lake-side analogue of an Iceberg changelog scan).

    Scale shape: two left-anti joins on the triple key; both sides
    shuffle-partition on the same key so AQE coalesces/splits
    symmetrically.  Output is exact — no sketches — because diffs feed
    idempotent MERGEs.  Joins are NULL-SAFE on the nullable key columns
    (``obj_lang``/``obj_datatype`` are NULL for plain literals and
    IRIs) — with a plain ``=`` key every such triple would come back as
    both added AND removed when diffing identical graphs.
    """
    on = [c for c in TRIPLE_KEY if c in old.columns and c in new.columns]
    added = (_triple_key_join(new.select(on), old, "left_anti")
             .select(F.lit("added").alias("op"), *on))
    removed = (_triple_key_join(old.select(on), new, "left_anti")
               .select(F.lit("removed").alias("op"), *on))
    return added.unionByName(removed)


def wl_colors(triples: DataFrame, rounds: int = 3) -> DataFrame:
    """Weisfeiler-Leman color refinement over the graph's nodes:
    ``(node, color)`` after ``rounds`` of hashing each node's previous
    color together with the sorted multiset of (direction, predicate,
    neighbor color) messages.  Ground terms start as their own color,
    blank nodes all start equal — so final bnode colors encode pure
    structure, the basis of bnode-insensitive graph comparison
    (rdflib ``compare``'s approach, and the per-document WL check the
    parity harness uses, distributed).

    Scale shape: per round, two equi-joins of the edge set against the
    (node, color) dim plus one partial-aggregated groupBy — bounded
    rounds, no cartesian, no window.  In-row message lists are bounded
    by node degree; a super-hub's list is large but single-row (cap
    upstream if a corpus has 10^8-degree hubs)."""
    edges = triples.select("subj", "pred", "obj")
    nodes = (edges.select(F.col("subj").alias("node"))
             .unionByName(edges.select(F.col("obj").alias("node")))
             .dropDuplicates())
    colors = nodes.select(
        "node",
        F.when(F.col("node").startswith("_:"), F.lit("b"))
        .otherwise(F.col("node")).alias("color"))
    for _ in range(rounds):
        c_s = colors.select(F.col("node").alias("subj"),
                            F.col("color").alias("c_s"))
        c_o = colors.select(F.col("node").alias("obj"),
                            F.col("color").alias("c_o"))
        with_c = edges.join(c_s, "subj").join(c_o, "obj")
        msgs = (with_c.select(
                    F.col("subj").alias("node"),
                    F.concat(F.lit("o|"), F.col("pred"), F.lit("|"),
                             F.col("c_o")).alias("m"))
                .unionByName(with_c.select(
                    F.col("obj").alias("node"),
                    F.concat(F.lit("i|"), F.col("pred"), F.lit("|"),
                             F.col("c_s")).alias("m"))))
        agg = (msgs.groupBy("node")
               .agg(F.concat_ws(",", F.array_sort(F.collect_list("m")))
                    .alias("ms")))
        colors = (colors.join(agg, "node", "left")
                  .select("node",
                          F.sha2(F.concat_ws(
                              "|", F.col("color"),
                              F.coalesce(F.col("ms"), F.lit(""))), 256)
                          .alias("color")))
    return colors


def wl_fingerprint(triples: DataFrame, rounds: int = 3) -> DataFrame:
    """One-row bnode-insensitive canonical fingerprint of the graph:
    blank nodes are replaced by their :func:`wl_colors` color and the
    resulting triple multiset reduces to (n_triples, fp) where ``fp``
    is the order-independent sum of a 32-bit md5-prefix hash per
    canonical triple.  Two isomorphic graphs always agree; like
    rdflib's ``isomorphic`` this is a WL approximation, so adversarial
    highly-regular bnode structures can collide — treat a match as
    near-certain, a mismatch as definite non-isomorphism.  ``fp`` is
    emitted as a decimal-digit STRING (the exact sum, no precision
    loss): the wide sum is decimal(38,0) internally, but decimal cells
    round-trip differently through downstream normalizers (r04 driver
    hash-red), so the output cell type is normalization-proof text."""
    bcol = wl_colors(triples, rounds=rounds).filter(
        F.col("node").startswith("_:"))
    canon = (triples.select("subj", "pred", "obj")
             .join(bcol.select(F.col("node").alias("subj"),
                               F.col("color").alias("c_s")),
                   "subj", "left")
             .join(bcol.select(F.col("node").alias("obj"),
                               F.col("color").alias("c_o")),
                   "obj", "left")
             .select(F.coalesce("c_s", "subj").alias("s"),
                     F.col("pred").alias("p"),
                     F.coalesce("c_o", "obj").alias("o")))
    row = F.md5(F.concat_ws("\x01", "s", "p", "o"))
    h = F.conv(F.substring(row, 1, 8), 16, 10).cast("decimal(38,0)")
    return canon.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triples"),
        F.sum(h).cast("decimal(38,0)").cast("string").alias("fp"))


def slice_offsets(slice_tot: DataFrame, tot_col: str) -> DataFrame:
    """``(slice, tot)`` -> ``(slice, off)`` where ``off`` is the sum
    of ``tot`` over all smaller slice ids — the broadcast offsets dim
    of the two-phase distributed prefix sum, computed WITHOUT a
    window: the per-slice totals (bounded by the shuffle-partition
    count) pack into one sorted array and each offset is a prefix
    aggregate over it.  A constant-partition window
    (``partitionBy(lit(0))``) constant-folds to an empty partition
    spec, so WindowExec logs the "No Partition Defined" warning on
    every run — safe on a slice dim but cry-wolf noise in a real
    cluster's logs; this shape emits none.  O(slices²) adds inside
    one row: hundreds of slices, negligible."""
    packed = slice_tot.agg(F.array_sort(F.collect_list(
        F.struct(F.col("slice").alias("slice"),
                 F.col(tot_col).alias("tot")))).alias("a"))
    return (packed
            .select(F.posexplode("a").alias("pos", "s"), F.col("a"))
            .select(F.col("s.slice").alias("slice"),
                    F.aggregate(F.slice("a", 1, F.col("pos")),
                                F.lit(0).cast("bigint"),
                                lambda acc, x: acc + x["tot"])
                    .alias("off")))


def _undirected(edges: DataFrame) -> DataFrame:
    """Symmetrized, deduplicated, self-loop-free edge frame — the
    shared undirected-graph prologue of label_propagation / k_core /
    adamic_adar, localCheckpointed because every caller reuses it
    across rounds or join arms."""
    return (edges.select("src", "dst")
            .unionByName(edges.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .dropDuplicates().localCheckpoint(eager=True))

def label_propagation(edges: DataFrame, rounds: int = 4) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) over undirected (src, dst) edges — the cheap community
    signal curation pipelines use to group related entities when full
    modularity optimization is overkill.

    Deterministic formulation (no random visit order): every node
    starts labelled with itself; each round every node adopts the most
    frequent label among its neighbours, ties broken by the
    lexicographically smallest label; all nodes update simultaneously.
    Returns (node, label) after ``rounds`` rounds for every endpoint
    of the edge list.

    Scale shape per round: one equi-join carrying labels onto edges
    (hash-partitioned on the join key every round, so AQE reuses the
    exchange) and two partially-aggregated groupBys — (node, label)
    frequency, then per-node argmax via ``min_by`` over a
    ``(-count, label)`` struct (no ranking window; a hub's fan-in
    collapses map-side).  The label frame is ``localCheckpoint``ed
    per round (flat lineage, same discipline as :func:`pagerank`).
    """
    e = _undirected(edges)
    labels = (e.select(F.col("src").alias("node")).dropDuplicates()
              .withColumn("lab", F.col("node")))
    for _ in range(rounds):
        nb = (e.join(labels.withColumnRenamed("node", "src"), "src")
              .select(F.col("dst").alias("node"), "lab"))
        cnt = nb.groupBy("node", "lab").agg(F.count(F.lit(1)).alias("c"))
        labels = (cnt.groupBy("node")
                  .agg(F.min_by(
                      "lab", F.struct((-F.col("c")).alias("nc"),
                                      F.col("lab").alias("lab")))
                      .alias("lab"))
                  .localCheckpoint(eager=True))
    return labels.select("node", F.col("lab").alias("label"))


def k_core(edges: DataFrame, k: int = 3, max_rounds: int = 30) -> DataFrame:
    """k-core subgraph via iterative peeling: repeatedly drop nodes of
    degree < k (over undirected, deduplicated, self-loop-free edges)
    until the degree floor holds everywhere — the standard
    dense-substructure filter for entity graphs (spam rings, hub
    cores) complementing :func:`triangle_count`.

    Returns (node, degree) for every node of the k-core, with its
    degree INSIDE the core.  Deterministic: the peel is simultaneous
    each round, so no visit order exists.  Raises if the peel has not
    converged within ``max_rounds`` (convergence-honest, same rule as
    :func:`transitive_closure` — never silently returns a
    part-peeled graph).

    Scale shape per round: one partially-aggregated degree groupBy
    plus two left-semi equi-joins filtering edges to surviving
    endpoints; the edge frame is ``localCheckpoint``ed per round
    (flat lineage).  The convergence probe is the edge count already
    materialized by the checkpoint.  Rounds are data-dependent but
    bounded by the peel depth, not the node count — degenerate chains
    peel O(diameter) and the guard raises rather than looping
    unbounded.
    """
    alive = _undirected(edges)
    n_edges = alive.count()
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        deg = alive.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= k).select("src") \
            .localCheckpoint(eager=True)
        nxt = (alive.join(keep, "src", "left_semi")
               .join(keep.withColumnRenamed("src", "dst"), "dst",
                     "left_semi")
               .localCheckpoint(eager=True))
        n_next = nxt.count()
        if n_next == n_edges:
            alive = nxt
            return (alive.groupBy(F.col("src").alias("node"))
                    .agg(F.count(F.lit(1)).alias("degree")))
        alive, n_edges = nxt, n_next
    if n_edges == 0:
        return (alive.groupBy(F.col("src").alias("node"))
                .agg(F.count(F.lit(1)).alias("degree")))
    raise RuntimeError(
        f"k_core: peel did not converge within {max_rounds} rounds - "
        "raise max_rounds (returning a part-peeled graph silently "
        "would be the correctness bug)")


def adamic_adar(edges: DataFrame, max_degree: int = 64) -> DataFrame:
    """Link-prediction candidate scoring over an undirected entity
    graph: for every NON-adjacent pair sharing at least one common
    neighbour: the common-neighbour count, the Adamic-Adar score
    ``sum over common z of 1/ln(deg(z))``, and the neighbourhood
    Jaccard coefficient ``cn / (deg_a + deg_b - cn)`` — the classic
    KG-completion signals (which missing edges does the graph itself
    suggest?).

    ``max_degree`` is a MODEL parameter, not a silent cap: wedge
    centers above it are excluded from scoring (mirrored identically
    in any oracle).  That is both the standard practice — a hub
    shared by everyone carries ~no information, and its weight
    1/ln(deg) is the smallest anyway — and the scale bound: per-row
    wedge fan-out is at most C(max_degree, 2), so no O(hub-degree²)
    blowup exists in the plan.

    The cap applies to ``jaccard`` too, and asymmetrically: ``cn``
    counts only common neighbours with degree in [2, max_degree],
    while ``deg_a``/``deg_b`` in the denominator are FULL degrees —
    so for pairs whose shared neighbours include hubs the emitted
    value is a LOWER BOUND on the true neighbourhood Jaccard
    coefficient, not the coefficient itself.  This is deliberate: the
    exact coefficient would need a second, UNCAPPED wedge join, which
    is exactly the O(hub-degree²) plan the cap exists to forbid — a
    single 10^6-degree hub would emit ~5·10^11 wedge rows.  Pair
    RECALL is also cap-bounded: a pair whose only common neighbours
    are hubs does not appear at all.  Oracles mirror the capped
    semantics exactly, so the value is deterministic and
    cross-engine stable — just read it as "capped-wedge Jaccard".

    Scale shape: one degree groupBy, one self-equi-join on the wedge
    center (fan-out capped as above), one partially-aggregated pair
    groupBy with DECIMAL sums (terms ``round(1/ln(deg), 9)`` — the
    module's cross-engine float discipline), and one left-anti join
    removing already-adjacent pairs.  No windows, no cartesian.
    """
    e = _undirected(edges)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ctr = (deg.filter((F.col("deg") >= 2)
                      & (F.col("deg") <= max_degree))
           .withColumn("term",
                       F.round(1.0 / F.log(F.col("deg")
                                           .cast("double")), 9)))
    wedge = (e.join(ctr, "src")
             .select(F.col("src").alias("z"), F.col("dst"),
                     F.col("term")))
    a = wedge.select("z", F.col("dst").alias("node_a"), "term")
    b = wedge.select("z", F.col("dst").alias("node_b"))
    pairs = (a.join(b, "z")
             .filter(F.col("node_a") < F.col("node_b"))
             .groupBy("node_a", "node_b")
             .agg(F.count(F.lit(1)).alias("cn"),
                  F.sum(F.col("term").cast("decimal(38,12)"))
                  .alias("aa_dec")))
    adjacent = e.select(F.col("src").alias("node_a"),
                        F.col("dst").alias("node_b"))
    # capped-wedge Jaccard = cn / (deg_a + deg_b - cn): cn is counted
    # over capped wedge centers only while the degrees are full, so
    # this is a lower bound on the true coefficient (see docstring)
    da = deg.select(F.col("src").alias("node_a"),
                    F.col("deg").alias("_da"))
    db = deg.select(F.col("src").alias("node_b"),
                    F.col("deg").alias("_db"))
    return (pairs.join(adjacent, ["node_a", "node_b"], "left_anti")
            .join(da, "node_a").join(db, "node_b")
            .select("node_a", "node_b", "cn",
                    F.round(F.col("aa_dec").cast("double"), 4)
                    .alias("aa"),
                    F.round(F.col("cn") /
                            (F.col("_da") + F.col("_db") - F.col("cn")),
                            4).alias("jaccard")))


def negative_samples(triples: DataFrame, k: int = 2,
                     rank_partitions: int | None = None) -> DataFrame:
    """FILTERED negative sampling for KG-embedding training (the
    corrupted-triple generator of TransE-family pipelines, Bordes et
    al. 2013): for every (subj, pred, obj) triple, ``k`` candidate
    corruptions replace the tail with an entity drawn uniformly from
    the graph's entity pool; candidates that collide with ANY real
    triple are dropped (the standard 'filtered' setting — that also
    removes self-collisions).  Output: (subj, pred, neg_obj, j).

    Deterministic: the draw index is md5(s|p|o|j) mod pool-size, so
    the training set is reproducible run-to-run and across engines.
    The entity pool gets dense ranks 0..N-1 WITHOUT a global ranking
    window via the two-phase pattern of ``plans/maintenance.py``:
    range-repartition by entity, rank inside each slice, add
    broadcast slice offsets.  The draw then binds via one equi-join
    on the rank, and the filter is one left-anti join against the
    real triples.  Only the pool size N is collected.
    """
    from pyspark.sql import Window

    base = (triples.select("subj", "pred", "obj")
            .dropDuplicates().localCheckpoint(eager=True))
    ents = (base.select(F.col("subj").alias("e"))
            .unionByName(base.select(F.col("obj").alias("e")))
            .dropDuplicates())
    if rank_partitions is None:
        rank_partitions = int(triples.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "200"))
    # materialize the slice assignment BEFORE deriving anything from
    # it: repartitionByRange samples its bounds and spark_partition_id
    # is execution-dependent, so two independent evaluations of this
    # subtree could disagree.  The eager checkpoint pins ONE partition
    # assignment that both the offsets branch and the ranked join read
    # (correctness must not hinge on Catalyst exchange reuse).
    sliced = (ents.repartitionByRange(rank_partitions, "e")
              .withColumn("slice", F.spark_partition_id())
              .localCheckpoint(eager=True))
    slice_tot = sliced.groupBy("slice").agg(F.count(F.lit(1)).alias("n"))
    offsets = slice_offsets(slice_tot, "n")
    w_local = Window.partitionBy("slice").orderBy("e")
    ranked = (sliced.join(F.broadcast(offsets), "slice")
              .select("e", (F.col("off") + F.row_number().over(w_local)
                            - 1).cast("bigint").alias("rank"))
              .localCheckpoint(eager=True))
    n_pool = ranked.count()
    if n_pool == 0:
        return base.limit(0).select(
            "subj", "pred", F.col("obj").alias("neg_obj"),
            F.lit(0).alias("j"))
    draw = F.conv(F.substring(F.md5(F.concat_ws(
        "|", F.col("subj"), F.col("pred"), F.col("obj"),
        F.col("j").cast("string"))), 1, 15), 16, 10) \
        .cast("bigint") % n_pool
    cand = (base
            .select("subj", "pred", "obj",
                    F.explode(F.array(*[F.lit(j) for j in range(k)]))
                    .alias("j"))
            .select("subj", "pred", "obj", "j", draw.alias("rank"))
            .join(ranked, "rank")
            .select("subj", "pred", F.col("e").alias("neg_obj"), "j"))
    real = base.select("subj", "pred", F.col("obj").alias("neg_obj"))
    return cand.join(real, ["subj", "pred", "neg_obj"], "left_anti")


def hits(edges: DataFrame, iterations: int = 8) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over directed
    (src, dst) edges — the bipartite-role twin of :func:`pagerank`
    for citation/link-shaped entity graphs (a good hub POINTS AT
    good authorities; a good authority IS POINTED AT by good hubs).

    Fixed-iteration power method with L1 normalization each round
    (L1 keeps the normalizer a plain SUM — a single broadcast 1-row
    aggregate, no sqrt of a sum whose float error would need
    taming).  Returns (node, hub, auth) rounded at 9 dp.

    Scale shape per round: two partially-aggregated groupBys (auth
    from in-edge hub mass, hub from out-edge auth mass), each one
    shuffle keyed on an edge endpoint, plus two broadcast 1-row
    normalizers; scores ``localCheckpoint``ed per round — identical
    discipline to :func:`pagerank`.
    """
    e = edges.select("src", "dst").dropDuplicates() \
        .localCheckpoint(eager=True)
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .dropDuplicates().localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("hub", F.lit(0.0)) \
                    .withColumn("auth", F.lit(0.0))
    scores = nodes.select("node", F.lit(1.0 / n).alias("hub"),
                          F.lit(1.0 / n).alias("auth"))
    for _ in range(iterations):
        # auth(v) = sum of hub(u) over edges u -> v, then L1-normalize
        a_raw = (e.join(scores.select(F.col("node").alias("src"),
                                      "hub"), "src")
                 .groupBy(F.col("dst").alias("node"))
                 .agg(F.sum("hub").alias("a_raw")))
        a_tot = a_raw.agg(F.sum("a_raw").alias("_t"))
        auth = (nodes.join(a_raw, "node", "left")
                .join(F.broadcast(a_tot))
                .select("node",
                        (F.coalesce(F.col("a_raw"), F.lit(0.0))
                         / F.col("_t")).alias("auth")))
        # hub(u) = sum of NEW auth(v) over edges u -> v, normalized
        h_raw = (e.join(auth.select(F.col("node").alias("dst"),
                                    "auth"), "dst")
                 .groupBy(F.col("src").alias("node"))
                 .agg(F.sum("auth").alias("h_raw")))
        h_tot = h_raw.agg(F.sum("h_raw").alias("_t"))
        hub = (nodes.join(h_raw, "node", "left")
               .join(F.broadcast(h_tot))
               .select("node",
                       (F.coalesce(F.col("h_raw"), F.lit(0.0))
                        / F.col("_t")).alias("hub")))
        scores = (hub.join(auth, "node")
                  .select("node", "hub", "auth")
                  .localCheckpoint(eager=True))
    return scores.select("node", F.round("hub", 9).alias("hub"),
                         F.round("auth", 9).alias("auth"))

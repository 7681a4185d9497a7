"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB: every stage is expressed as explode -> hash -> groupBy
so Catalyst gets partial (map-side) aggregation; candidate generation is
band-bucket grouping (self-join only *within* tiny buckets), never an
all-pairs join.  Hashing uses md5/sha2 built-ins so the DuckDB oracle can
reproduce results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalized(col="text"):
    return F.trim(F.regexp_replace(F.lower(F.col(col)), r"\s+", " "))


def _scale_out(df: DataFrame) -> DataFrame:
    """Give a digest-heavy narrow map real parallelism when the scan
    does not: a corpus that arrives as a handful of files (the local
    bench: ONE parquet split) would otherwise serialize the whole
    sha256-per-shingle stage into one task.  The repartition is SKIPPED
    whenever the input already has at least half the cluster's cores in
    partitions — a 100 TB table has thousands of splits and must not pay
    a round-robin shuffle here."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= target:
        return df.repartition(target)
    return df


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Hash-groupBy exact dedup: one row per duplicated fingerprint with
    the kept (minimum) doc_id and the duplicate count."""
    return (docs
            .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                    F.md5(_normalized()).alias("fp"))
            .groupBy("fp")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.min("doc_id").alias("keep_id"))
            .filter(F.col("n_docs") > 1))


def minhash_signatures(docs: DataFrame, k: int = 5,
                       n_hashes: int = 8) -> DataFrame:
    """MinHash signature per document: one sha2-256 per distinct shingle
    sliced into ``n_hashes`` disjoint 32-bit chunks — n truly independent
    hash functions for the price of a single digest (a linear family
    derived from one chunk would correlate the per-band minima and
    inflate LSH false positives).  h_j(doc) = min over shingles of
    chunk_j(sha256(shingle)).  Output: doc_id, h0..h{n-1} (bigint).

    Scale shape: entirely in-row — the distinct-shingle array is
    digested with one ``transform`` and all n minima come from a single
    ``aggregate`` pass (``zip_with``/``least`` over a running-minimum
    array), so the signature stage is a narrow map with NO explode and
    NO groupBy shuffle (the previous explode->groupBy shape shuffled
    ~|text| shingle rows per document; this was 43% of the r1 bench
    suite).  The digest array is bound to its own projection so the
    sha256 per shingle is computed once, not once per chunk."""
    if n_hashes > 8:
        raise ValueError("sha256 yields at most 8 independent 32-bit chunks")

    # sha2 hex is fixed-width lowercase, so LEXICOGRAPHIC min on the
    # 8-char chunk equals numeric min — the running minimum runs on
    # plain string comparisons and the base-16 parse (conv) happens
    # once per DOCUMENT per chunk instead of once per shingle per
    # chunk (measured 0.69 -> 0.59 s at sf0.1; an array_min-per-chunk
    # variant measured 0.65 s). Values are bit-identical either way.
    init = F.array(*[F.lit("g")] * n_hashes)  # 'g' sorts after any hex
    digs = F.transform(F.col("sharr"), lambda s: F.sha2(s, 256))
    sig = F.aggregate(
        F.col("dig"), init,
        lambda acc, d: F.zip_with(
            acc, F.array(*[F.substring(d, 1 + 8 * j, 8)
                           for j in range(n_hashes)]),
            lambda a, b: F.least(a, b)))
    return (_shingle_arrays(_scale_out(docs), k)
            .select("doc_id", digs.alias("dig"))
            .select("doc_id", sig.alias("sig"))
            .select("doc_id",
                    *[F.conv(F.element_at("sig", j + 1), 16, 10)
                      .cast("bigint").alias(f"h{j}")
                      for j in range(n_hashes)]))


def _capped_bucket_pairs(members: DataFrame, keys: list[str], id_col: str,
                         a_col: str, b_col: str,
                         max_bucket: int) -> DataFrame:
    """Pair generation from bucket-membership rows with a
    degenerate-bucket cap and NO per-bucket arrays.

    ``members``: one row per (id, *keys) bucket membership.  Buckets up
    to ``max_bucket`` members emit all C(n,2) pairs via an equi-self-join
    on the bucket key (AQE splits hot key partitions; per-bucket output
    is bounded by cap²); larger buckets — N identical boilerplate docs —
    are star-linked to the bucket's minimum id via a direct stats join,
    so NOTHING ever materializes an O(bucket) row: the old
    ``collect_set`` shape built the full member array before any cap
    could apply, which is itself the OOM at a 10^9-member bucket.
    (A cap-bounded collect_list + in-row i<j expansion was also
    measured: it saves one membership shuffle but loses to the join's
    codegen on pair emission, and the O(Σn²) cost either way is the
    cross-band dedup of the PAIRS, which both shapes share.)
    The membership frame is ``localCheckpoint(eager=True)``-ed across
    its three consumers: the signature lineage runs exactly once, AQE
    plans the self-join from REAL materialized sizes, and — unlike an
    ownerless ``persist()`` — the blocks are released by the
    ContextCleaner as soon as the frame is garbage-collected, so a
    long multi-stage job never accumulates leaked cache entries.
    """
    members = members.localCheckpoint(eager=True)
    stats = (members.groupBy(*keys)
             .agg(F.count("*").alias("n"),
                  F.min(id_col).alias("rep"))
             .filter(F.col("n") > 1))
    small = stats.filter(F.col("n") <= max_bucket).select(*keys)
    big = stats.filter(F.col("n") > max_bucket).select(*keys, "rep")
    left = (members.join(small, keys)
            .select(*keys, F.col(id_col).alias(a_col)))
    right = members.select(*keys, F.col(id_col).alias(b_col))
    small_pairs = (left.join(right, keys)
                   .filter(F.col(a_col) < F.col(b_col))
                   .select(*keys, a_col, b_col))
    big_pairs = (members.join(big, keys)
                 .filter(F.col(id_col) != F.col("rep"))
                 .select(*keys, F.col("rep").alias(a_col),
                         F.col(id_col).alias(b_col)))  # rep = min < id
    return small_pairs.unionByName(big_pairs)


def minhash_lsh_candidates(docs: DataFrame, k: int = 5, n_hashes: int = 8,
                           bands: int = 4,
                           max_bucket: int = 512) -> DataFrame:
    """LSH banding: signatures split into ``bands`` bands of
    ``n_hashes/bands`` rows; docs sharing any band bucket are duplicate
    candidates.  Output: (doc_a, doc_b) with doc_a < doc_b, distinct.

    Scale shape: in-row signatures (no shuffle), then bucket-keyed pair
    generation with the degenerate-bucket cap of
    :func:`_capped_bucket_pairs` — no per-bucket arrays anywhere; audit
    what the cap touched with :func:`minhash_lsh_bucket_stats`.
    """
    members = _band_buckets(docs, k, n_hashes, bands)
    return (_capped_bucket_pairs(members, ["band", "bucket"], "doc_id",
                                 "doc_a", "doc_b", max_bucket)
            .select("doc_a", "doc_b")
            .dropDuplicates())


def _band_buckets(docs: DataFrame, k: int, n_hashes: int,
                  bands: int) -> DataFrame:
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(docs, k, n_hashes)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"h{b * rows_per_band + r}")
                 for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"),
                     F.md5(F.concat_ws("|", *parts)).alias("bucket")))
    return (sig.select("doc_id",
                       F.explode(F.array(*band_cols)).alias("bb"))
            .select("doc_id", "bb.band", "bb.bucket"))


def minhash_lsh_bucket_stats(docs: DataFrame, k: int = 5, n_hashes: int = 8,
                             bands: int = 4,
                             max_bucket: int = 512) -> DataFrame:
    """Buckets the candidate cap degraded to star-linking — the 'no
    silent caps' audit: one row per oversized bucket with its size and
    the number of all-pairs candidates the cap dropped."""
    buckets = (_band_buckets(docs, k, n_hashes, bands)
               .groupBy("band", "bucket")
               .agg(F.count("*").cast("bigint").alias("n_docs"))
               .filter(F.col("n_docs") > max_bucket))
    dropped = (F.col("n_docs") * (F.col("n_docs") - 1) / 2
               - (F.col("n_docs") - 1)).cast("bigint")
    return buckets.select("band", "bucket", "n_docs",
                          dropped.alias("dropped_pairs"))


def incremental_exact_dups(corpus: DataFrame,
                           batch: DataFrame) -> DataFrame:
    """Exact dedup of a NEW ingest batch against an EXISTING corpus —
    the continuous-ingestion path: the corpus was already deduped, so
    re-pairing it with itself (what :func:`exact_duplicates` over the
    union would do) is wasted work that grows with corpus size, not
    batch size.

    Scale shape (batch ≪ corpus by contract): the batch's fingerprint
    set broadcasts INTO the corpus scan as a semi-filter, so the 100 TB
    side is scanned once, never shuffled — only colliding corpus rows
    (bounded by the batch size) reach the aggregation.  Output one row
    per duplicate batch doc: (doc_id, dup_of, source) where ``source``
    is 'corpus' (fingerprint already in the corpus; ``dup_of`` = the
    corpus keeper, its minimum doc_id) or 'batch' (first seen earlier
    in this batch; ``dup_of`` = the batch's minimum doc_id for the
    fingerprint).  Non-duplicate batch rows are absent — the caller
    appends exactly those to the corpus."""
    def fp(df):
        return df.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                         F.md5(_normalized()).alias("fp"))

    bfp = fp(batch).localCheckpoint(eager=True)
    hits = (fp(corpus)
            .join(F.broadcast(bfp.select("fp").dropDuplicates()), "fp")
            .groupBy("fp")
            .agg(F.min("doc_id").alias("corpus_keep")))
    bmin = bfp.groupBy("fp").agg(F.min("doc_id").alias("batch_min"))
    return (bfp
            .join(F.broadcast(hits), "fp", "left")
            .join(F.broadcast(bmin), "fp")
            .withColumn("dup_of", F.coalesce(
                F.col("corpus_keep"),
                F.when(F.col("batch_min") < F.col("doc_id"),
                       F.col("batch_min"))))
            .filter(F.col("dup_of").isNotNull())
            .select("doc_id",
                    F.col("dup_of").cast("bigint").alias("dup_of"),
                    F.when(F.col("corpus_keep").isNotNull(),
                           F.lit("corpus")).otherwise(F.lit("batch"))
                    .alias("source")))


def incremental_lsh_candidates(corpus: DataFrame, batch: DataFrame,
                               k: int = 5, n_hashes: int = 8,
                               bands: int = 4,
                               max_bucket: int = 512) -> DataFrame:
    """Near-dup candidate generation for a NEW ingest batch against an
    EXISTING (already-deduped) corpus: candidate pairs must touch the
    batch, so corpus-corpus pairs — the quadratic bulk of a naive
    union+LSH rerun — are never generated.

    Scale shape: the batch's band-bucket keys broadcast into the corpus
    membership as a semi-filter (the corpus side is scanned, never
    shuffled beyond the surviving ≤|batch buckets| rows); oversized
    corpus buckets star-link each batch member to the bucket's corpus
    keeper (minimum doc_id) instead of fanning out, mirroring
    :func:`_capped_bucket_pairs`.  Output (doc_a, doc_b, pair_kind):
    'corpus' pairs carry (corpus doc, batch doc), 'batch' pairs are
    within-batch with doc_a < doc_b.  Feed through
    :func:`ngram_jaccard` over the unioned doc frame to verify."""
    keys = ["band", "bucket"]
    bmem = _band_buckets(batch, k, n_hashes, bands) \
        .localCheckpoint(eager=True)
    bkeys = bmem.select(*keys).dropDuplicates()
    cmem = (_band_buckets(corpus, k, n_hashes, bands)
            .join(F.broadcast(bkeys), keys)
            .localCheckpoint(eager=True))
    stats = (cmem.groupBy(*keys)
             .agg(F.count("*").alias("n"),
                  F.min("doc_id").alias("rep")))
    small = stats.filter(F.col("n") <= max_bucket).select(*keys)
    big = stats.filter(F.col("n") > max_bucket).select(*keys, "rep")
    cross_small = (cmem.join(small, keys)
                   .select(*keys, F.col("doc_id").alias("doc_a"))
                   .join(bmem.select(*keys,
                                     F.col("doc_id").alias("doc_b")),
                         keys)
                   .select("doc_a", "doc_b"))
    cross_big = (bmem.join(big, keys)
                 .select(F.col("rep").alias("doc_a"),
                         F.col("doc_id").alias("doc_b")))
    cross = (cross_small.unionByName(cross_big)
             .withColumn("pair_kind", F.lit("corpus")))
    within = (_capped_bucket_pairs(bmem, keys, "doc_id",
                                   "doc_a", "doc_b", max_bucket)
              .select("doc_a", "doc_b")
              .withColumn("pair_kind", F.lit("batch")))
    return cross.unionByName(within).dropDuplicates()


def incremental_dedup_decision(corpus: DataFrame, batch: DataFrame,
                               k: int = 5, n_hashes: int = 8,
                               bands: int = 4, max_bucket: int = 512,
                               jaccard_threshold: float = 0.8
                               ) -> DataFrame:
    """The composed continuous-ingestion flow: incremental LSH
    candidates -> exact n-gram Jaccard verify -> connected-components
    keeper decision, reported for the BATCH docs only.

    Scale shape: every candidate pair touches the batch (see
    :func:`incremental_lsh_candidates`), and the verify stage's shingle
    computation runs over ONLY the docs named by some candidate — the
    candidate id set (bounded by batch-driven pair counts, not corpus
    size) broadcasts into both doc scans, so the 100 TB corpus is
    scanned but never re-shingled wholesale.  Keeper = the component's
    minimum doc_id (corpus ids precede batch ids under monotonic ingest
    ids, so corpus survivors win).  Output one row per batch doc in a
    confirmed cluster: (doc_id, keep_id, is_dup)."""
    from pyrdfa3_spark.operators.entity_link import sameas_canonical_map

    cands = (incremental_lsh_candidates(batch=batch, corpus=corpus,
                                        k=k, n_hashes=n_hashes,
                                        bands=bands,
                                        max_bucket=max_bucket)
             .select("doc_a", "doc_b")
             .localCheckpoint(eager=True))
    ids = (cands.select(F.col("doc_a").alias("doc_id"))
           .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
           .dropDuplicates())
    touched = (corpus.select(F.col("doc_id").cast("bigint")
                             .alias("doc_id"), "text")
               .unionByName(batch.select(F.col("doc_id").cast("bigint")
                                         .alias("doc_id"), "text"))
               .join(F.broadcast(ids), "doc_id"))
    verified = (ngram_jaccard(touched, cands, k)
                .filter(F.col("jaccard") >= jaccard_threshold))
    canon = sameas_canonical_map(
        verified.select(F.col("doc_a").alias("src"),
                        F.col("doc_b").alias("dst")))
    bids = batch.select(F.col("doc_id").cast("bigint").alias("doc_id"))
    return (canon.select(F.col("node").cast("bigint").alias("doc_id"),
                         F.col("canon").cast("bigint").alias("keep_id"))
            .join(bids, "doc_id")
            .select("doc_id", "keep_id",
                    (F.col("keep_id") != F.col("doc_id"))
                    .alias("is_dup")))


def _shingle_arrays(docs: DataFrame, k: int = 5):
    """(doc_id, sharr): the distinct shingle set per doc as one array
    row — the pre-explode form of :func:`_shingles`."""
    n = F.length(F.col("norm"))
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return (docs
            .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                    _normalized().alias("norm"))
            .select("doc_id", F.array_distinct(
                F.transform(idx, lambda i: F.col("norm").substr(i, F.lit(k))))
                .alias("sharr")))


def near_dup_pipeline(docs: DataFrame, k: int = 5, n_hashes: int = 8,
                      bands: int = 4, max_bucket: int = 512,
                      jaccard_threshold: float = 0.8) -> DataFrame:
    """The composed production dedup flow: LSH candidates -> exact
    n-gram Jaccard verify -> keep/drop decision (drop = the larger
    doc_id of a confirmed pair).

    Unlike the per-query gate entries (one query = one plan), the
    candidate frame is ``localCheckpoint(eager=True)``-ed between the
    generation and verify stages so the shingle/signature lineage runs
    once, not once per consumer — self-cleaning (ContextCleaner frees
    the blocks when the frame is GC'd), no unpersist owner needed.
    Output: (doc_a, doc_b, jaccard) for pairs at/above the threshold.
    """
    candidates = minhash_lsh_candidates(docs, k, n_hashes, bands,
                                        max_bucket) \
        .localCheckpoint(eager=True)
    verified = (ngram_jaccard(docs, candidates, k)
                .filter(F.col("jaccard") >= jaccard_threshold))
    return verified


def dedup_decision(docs: DataFrame, k: int = 5, n_hashes: int = 8,
                   bands: int = 4, max_bucket: int = 512,
                   jaccard_threshold: float = 0.8) -> DataFrame:
    """The dedup pipeline's last stage: verified near-dup pairs are
    clustered (undirected connected components via the same
    pointer-jumping min-label propagation entity canonicalization uses)
    and each cluster keeps its minimum doc_id.  Output one row per doc
    that appears in any confirmed pair: (doc_id, keep_id, is_dup) —
    ``is_dup`` rows are the delete-list a training-data run applies."""
    from pyrdfa3_spark.operators.entity_link import sameas_canonical_map

    confirmed = near_dup_pipeline(docs, k, n_hashes, bands, max_bucket,
                                  jaccard_threshold)
    edges = confirmed.select(F.col("doc_a").alias("src"),
                             F.col("doc_b").alias("dst"))
    canon = sameas_canonical_map(edges)   # bigint labels: numeric min
    return canon.select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("canon").cast("bigint").alias("keep_id"),
        (F.col("node") != F.col("canon")).alias("is_dup"))


def elect_keeper(decision: DataFrame, scores: DataFrame) -> DataFrame:
    """Re-elect each near-dup cluster's keeper by QUALITY instead of
    by minimum id — what production curation actually does (keep the
    longest / highest-scoring member of a duplicate cluster, drop the
    rest).  ``decision``: :func:`dedup_decision` output
    ``(doc_id, keep_id, is_dup)`` where ``keep_id`` doubles as the
    cluster label; ``scores``: ``(doc_id, score)`` — any orderable
    numeric (doc length, classifier quality, ...).  The winner is the
    highest score, ties broken by smallest doc_id; members without a
    score row rank below every scored member (score -> NULL sorts
    last inside the min_by struct via a coalesce to the minimum).

    Output: same shape as ``decision`` with the re-elected keeper.

    Scale shape: one equi-join to attach scores and ONE ``min_by``
    hash aggregation per cluster (map-side combinable, no window),
    then one join to restamp members — clusters are never collected.
    """
    members = decision.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("keep_id").cast("bigint").alias("_cluster"))
    s = scores.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                      F.col("score").cast("double").alias("_score"))
    scored = (members.join(s, "doc_id", "left")
              .withColumn("_score", F.coalesce(
                  "_score", F.lit(float("-inf")))))
    best = (scored.groupBy("_cluster")
            .agg(F.min_by("doc_id",
                          F.struct((-F.col("_score")).alias("neg"),
                                   F.col("doc_id"))).alias("keep_id")))
    return (members.join(best, "_cluster")
            .select("doc_id", "keep_id",
                    (F.col("doc_id") != F.col("keep_id")).alias("is_dup")))


def _span_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, toks): the normalized word-token array per document —
    the shared tokenization of the span-dedup family."""
    toks = F.filter(F.split(_normalized(), " "), lambda t: t != "")
    return (_scale_out(docs)
            .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                    toks.alias("toks")))


def _span_occurrences(docs: DataFrame, window: int) -> DataFrame:
    """(doc_id, pos, span_hash): every ``window``-token run, hashed —
    windows built IN-ROW (one transform, md5 per window); the only
    explode is the per-position row the cross-document groupBy needs."""
    idx = F.sequence(F.lit(1),
                     F.greatest(F.size("toks") - (window - 1), F.lit(0)))
    grams = F.transform(idx, lambda i: F.md5(F.concat_ws(
        " ", *[F.element_at("toks", (i + F.lit(j)).cast("int"))
               for j in range(window)])))
    return (_span_tokens(docs)
            .filter(F.size("toks") >= window)
            .select("doc_id", F.posexplode(grams).alias("p", "span_hash"))
            .select("doc_id",
                    (F.col("p") + 1).cast("bigint").alias("pos"),
                    "span_hash"))


def duplicate_spans(docs: DataFrame, window: int = 8,
                    min_occurrences: int = 2) -> DataFrame:
    """Exact duplicate token-window spans across the corpus — the
    fixed-window distillation of exact-substring dedup (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better",
    which cuts any ≥50-token substring that repeats): every run of
    ``window`` consecutive word tokens is hashed, and a hash occurring
    ``min_occurrences``+ times marks boilerplate to cut (repeated
    headers, license blocks, templated paragraphs — the within- and
    cross-document duplication MinHash's whole-document granularity
    cannot see).

    Output: one row per duplicated span —
    ``(span_hash, n_occurrences, n_docs, keep_doc, keep_pos)`` where
    ``(keep_doc, keep_pos)`` is the first occurrence to keep
    (lexicographic minimum over all occurrences; pos is the 1-based
    token offset).  Two columns, not a packed ``doc_id * K + pos``
    key — packing overflows int64 once doc ids pass ``2^63 / K``,
    silently electing the wrong keeper at the 10^12-turn target.

    Scale shape: windows are built IN-ROW (one ``transform`` over the
    token array, md5 per window), so the only explode is the one the
    cross-document groupBy genuinely needs — one row per token
    position, the same cost class as building an inverted index; the
    aggregation is map-side-partial, no windows, no self-joins.  A
    full suffix-array pass (arbitrary-length matches) does not
    distribute on DataFrames; fixed windows at 100 TB are the standard
    approximation and catch every duplicate run ≥ ``window`` tokens.
    """
    occ = _span_occurrences(docs, window)
    # struct min = lexicographic (doc_id, pos) — overflow-free arg-min,
    # still a map-side-partial aggregate
    return (occ.groupBy("span_hash")
            .agg(F.count("*").cast("bigint").alias("n_occurrences"),
                 F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
                 F.min(F.struct("doc_id", "pos")).alias("_keep"))
            .filter(F.col("n_occurrences") >= min_occurrences)
            .select("span_hash", "n_occurrences", "n_docs",
                    F.col("_keep.doc_id").cast("bigint").alias("keep_doc"),
                    F.col("_keep.pos").cast("bigint").alias("keep_pos")))


def remove_duplicate_spans(docs: DataFrame, window: int = 8,
                           min_occurrences: int = 2) -> DataFrame:
    """CUT the duplicated spans :func:`duplicate_spans` detects and
    reassemble cleaned documents — the transformation half of
    exact-substring dedup (Lee et al. 2022; Dolma's paragraph/span
    dedup): every occurrence of a ``min_occurrences``+-repeated
    ``window``-token run is removed EXCEPT the corpus-wide first
    (lexicographic minimum ``(doc_id, pos)``), overlapping cut windows
    union naturally, and each document's surviving tokens rejoin in
    order.

    Output: ``(doc_id, clean_text, n_kept, n_removed)`` over the
    NORMALIZED token stream (lowercased, whitespace-collapsed — the
    same normalization the detector hashes; a byte-exact splice of the
    original text would need the un-normalized offsets, which exact
    dedup pipelines typically discard anyway).

    Scale shape: everything is linear in token count — the occurrence
    index is rebuilt rather than pinned (at corpus scale an O(tokens)
    cache is not pinnable), cut positions expand to covered positions
    in-row, the cut itself is a LEFT ANTI equi-join on
    ``(doc_id, pos)``, and reassembly is one groupBy whose collected
    struct list is bounded by the document's own length (the same
    memory class as the document text).  No windows, no self-joins,
    no quadratic in-row membership scans.
    """
    occ = _span_occurrences(docs, window)
    keep = (occ.groupBy("span_hash")
            .agg(F.count("*").alias("n"),
                 F.min(F.struct("doc_id", "pos")).alias("_keep"))
            .filter(F.col("n") >= min_occurrences)
            .select("span_hash",
                    F.col("_keep.doc_id").alias("_kd"),
                    F.col("_keep.pos").alias("_kp")))
    drops = (occ.join(keep, "span_hash")
             .filter((F.col("doc_id") != F.col("_kd"))
                     | (F.col("pos") != F.col("_kp")))
             .select("doc_id", "pos"))
    covered = (drops
               .select("doc_id",
                       F.explode(F.sequence(
                           F.col("pos"),
                           F.col("pos") + (window - 1))).alias("pos"))
               .dropDuplicates())
    base = _span_tokens(docs).filter(F.size("toks") > 0)
    tok_rows = (base
                .select("doc_id", F.posexplode("toks").alias("p", "tok"))
                .select("doc_id",
                        (F.col("p") + 1).cast("bigint").alias("pos"),
                        "tok"))
    kept = tok_rows.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.array_sort(F.collect_list(
                   F.struct("pos", "tok"))).alias("arr"))
               .select("doc_id",
                       F.concat_ws(" ", F.transform(
                           "arr", lambda x: x["tok"])).alias("clean_text"),
                       F.size("arr").cast("bigint").alias("n_kept")))
    return (base.select("doc_id",
                        F.size("toks").cast("bigint").alias("_n"))
            .join(rebuilt, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                    (F.col("_n") - F.coalesce("n_kept", F.lit(0)))
                    .alias("n_removed")))


def ngram_jaccard(docs: DataFrame, pairs: DataFrame, k: int = 5) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs
    (verification stage after LSH).  ``pairs``: (doc_a, doc_b).

    Shape: the shingle *set* stays in-row (array column) and the overlap
    is ``array_intersect`` after two equi-joins keyed on doc id —
    shuffling one array row per doc instead of exploding each document
    into ~|text| shingle rows and shuffling those three times."""
    arrs = _shingle_arrays(docs, k)
    a = arrs.select(F.col("doc_id").alias("doc_a"),
                    F.col("sharr").alias("arr_a"))
    b = arrs.select(F.col("doc_id").alias("doc_b"),
                    F.col("sharr").alias("arr_b"))
    n_common = F.size(F.array_intersect(F.col("arr_a"), F.col("arr_b")))
    return (pairs.join(a, "doc_a").join(b, "doc_b")
            .select("doc_a", "doc_b",
                    F.round(n_common /
                            (F.size("arr_a") + F.size("arr_b") - n_common),
                            4).alias("jaccard")))


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash over whitespace tokens: per bit, sign of the sum of
    (+1/-1) votes from each distinct token's md5.

    Scale shape: entirely in-row, like :func:`minhash_signatures` — the
    distinct-token array is hashed with one ``transform`` (md5 per token
    computed once) and a single ``aggregate`` accumulates all ``bits``
    vote counters via ``zip_with``, so there is NO explode and NO
    groupBy shuffle.  Docs with no tokens are excluded, matching the
    previous explode semantics (and the SQL oracle's WHERE tok <> '')."""
    toks = F.filter(F.array_distinct(F.split(_normalized(), " ")),
                    lambda x: x != "")
    hs = F.transform(
        F.col("toks"),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10)
        .cast("bigint"))

    def bitvotes(hv):
        return F.array(*[
            F.when(F.shiftright(hv, b).bitwiseAND(F.lit(1)) == 1,
                   F.lit(1)).otherwise(F.lit(-1)).cast("bigint")
            for b in range(bits)])

    init = F.array(*[F.lit(0).cast("bigint")] * bits)
    votes = F.aggregate(
        F.col("hs"), init,
        lambda acc, hv: F.zip_with(acc, bitvotes(hv),
                                   lambda a, b: a + b))
    sig = F.lit(0).cast("bigint")
    for b in range(bits):
        sig = sig + F.when(F.element_at("v", b + 1) > 0,
                           F.lit(2 ** b).cast("bigint")).otherwise(0)
    return (_scale_out(docs)
            .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                    toks.alias("toks"))
            .filter(F.size("toks") > 0)
            .select("doc_id", hs.alias("hs"))
            .select("doc_id", votes.alias("v"))
            .select("doc_id", sig.alias("simhash")))


def prefix_similarity_join(docs: DataFrame, threshold: float = 0.8,
                           max_bucket: int = 100_000) -> DataFrame:
    """EXACT token-set Jaccard similarity self-join via prefix
    filtering (Chaudhuri et al. 2006 SSJoin / Xiao et al. 2008 PPJoin
    family) — the deterministic complement to the MinHash-LSH path:
    no probabilistic misses, every pair with ``jaccard >= threshold``
    over distinct whitespace tokens is returned, ``doc_a < doc_b``.

    Why it is exact: order all tokens globally by ascending document
    frequency (ties by token text); a document whose token set has
    size ``s`` keeps only its first ``s - ceil(t*s) + 1`` tokens as
    its *prefix*.  For any pair with Jaccard >= t the intersection
    size ``i`` satisfies ``i >= t*max(|x|,|y|)``; the FIRST common
    token (in global order) is preceded in each document only by
    tokens private to it — at most ``|x| - i <= |x| - ceil(t*|x|)``
    of them — so it lands inside BOTH prefixes and the candidate
    equi-join on prefix tokens cannot miss the pair.

    Scale shape: the all-pairs problem becomes (1) one partial-agg
    groupBy for document frequencies, (2) one equi-join tagging each
    token row with its df, (3) a per-doc in-row sort (doc-bounded
    arrays, no window), (4) a self-EQUI-join on prefix tokens only —
    rare by construction, since frequent tokens sort to the suffix —
    with the length filter ``min >= t*max`` cutting candidates before
    verification, and (5) an in-row ``array_intersect`` verify after
    two id-keyed joins (the :func:`ngram_jaccard` shape).  No window,
    no cartesian, no LSH bands.  A prefix token shared by more than
    ``max_bucket`` documents raises (pick a higher threshold or
    pre-filter stopwords) rather than silently exploding the
    candidate join — the no-silent-caps rule.
    """
    toks_expr = F.filter(F.array_distinct(F.split(_normalized(), " ")),
                         lambda x: x != "")
    toks_arr = (_scale_out(docs)
                .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                        toks_expr.alias("toks"))
                .filter(F.size("toks") > 0))
    tok_rows = toks_arr.select("doc_id", F.explode("toks").alias("tok"))
    dfreq = tok_rows.groupBy("tok").agg(F.count("*").alias("df"))
    ordered = (tok_rows.join(dfreq, "tok")
               .groupBy("doc_id")
               .agg(F.array_sort(
                   F.collect_list(F.struct("df", "tok"))).alias("ord")))
    sz = F.size("ord")
    plen = (sz - F.ceil(F.lit(float(threshold)) * sz) + 1).cast("int")
    pre = (ordered
           .select("doc_id", sz.alias("sz"),
                   F.slice("ord", F.lit(1), plen).alias("pre"))
           .select("doc_id", "sz", F.explode("pre").alias("p"))
           .select("doc_id", "sz", F.col("p.tok").alias("tok")))
    if max_bucket is not None:
        bstats = pre.groupBy("tok").agg(F.count("*").alias("bn"))
        guard = F.when(
            F.col("bn") > max_bucket,
            F.raise_error(F.lit(
                "prefix_similarity_join: a prefix token is shared by "
                f"more than {max_bucket} documents - raise the "
                "threshold or stopword-filter the corpus (silently "
                "exploding the candidate join would be the scale "
                "bug)"))).otherwise(F.col("bn"))
        pre = pre.join(bstats, "tok").filter(guard > 0).drop("bn")
    a = pre.select(F.col("tok"), F.col("doc_id").alias("doc_a"),
                   F.col("sz").alias("pre_sa"))
    b = pre.select(F.col("tok"), F.col("doc_id").alias("doc_b"),
                   F.col("sz").alias("pre_sb"))
    cands = (a.join(b, "tok")
             .filter((F.col("doc_a") < F.col("doc_b"))
                     & (F.least("pre_sa", "pre_sb")
                        >= threshold * F.greatest("pre_sa", "pre_sb")))
             .select("doc_a", "doc_b").dropDuplicates())
    ta = toks_arr.select(F.col("doc_id").alias("doc_a"),
                         F.col("toks").alias("arr_a"))
    tb = toks_arr.select(F.col("doc_id").alias("doc_b"),
                         F.col("toks").alias("arr_b"))
    n_common = F.size(F.array_intersect("arr_a", "arr_b"))
    jacc = n_common / (F.size("arr_a") + F.size("arr_b") - n_common)
    return (cands.join(ta, "doc_a").join(tb, "doc_b")
            .select("doc_a", "doc_b", jacc.alias("j"))
            .filter(F.col("j") >= threshold)
            .select("doc_a", "doc_b", F.round("j", 4).alias("jaccard")))


def tfidf_similarity_join(docs: DataFrame, threshold: float = 0.3,
                          max_df_frac: float = 0.3) -> DataFrame:
    """Sparse tf-idf cosine similarity self-join via an inverted
    index — the classic TERM-WEIGHTED similarity complementing the
    set-Jaccard of :func:`prefix_similarity_join` and the dense
    embedding paths in ``operators/similarity.py``.

    Vector space: smooth idf (``ln((1+N)/(1+df)) + 1``, sklearn's
    formulation) over whitespace tokens with term frequency; tokens
    appearing in more than ``max_df_frac`` of documents are dropped
    from the space entirely (the standard ``max_df`` stop-word
    semantic — a MODEL parameter applied identically in the oracle,
    not a silent cap).  Vectors are L2-normalized; output is every
    pair with cosine >= threshold, ``doc_a < doc_b``.

    Scale shape: tf and df are partially-aggregated groupBys; the
    pair generation is an equi-join on the token of the inverted
    index, whose per-token fan-out the df cap bounds; the dot product
    is a map-side-partial DECIMAL sum (order-independent — the
    module's cross-engine float discipline: idf rounds at 9 dp after
    ``ln``, every sum runs in DECIMAL(38,12)).  No window, no
    cartesian, no driver-side vectors — only the corpus-size scalar N
    is collected.
    """
    toks = (_scale_out(docs)
            .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                    F.explode(F.filter(F.split(_normalized(), " "),
                                       lambda x: x != "")).alias("tok")))
    # localCheckpoint: the corpus-size count below materializes tf
    # anyway; without it the tokenize+tf shuffle (the most expensive
    # stage) would re-run for dfreq and for the weight join
    tf = (toks.groupBy("doc_id", "tok")
          .agg(F.count(F.lit(1)).alias("tf"))
          .localCheckpoint(eager=True))
    n_docs = float(tf.select("doc_id").distinct().count())
    dfreq = (tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
             .filter(F.col("df") <= max_df_frac * n_docs))
    idf = F.round(F.log((1.0 + n_docs) / (1.0 + F.col("df"))) + 1.0, 9)
    w = (tf.join(dfreq, "tok")
         .select("doc_id", "tok", (F.col("tf") * idf).alias("w")))
    nrm = (w.groupBy("doc_id")
           .agg(F.sqrt(F.sum((F.col("w") * F.col("w"))
                             .cast("decimal(38,12)")).cast("double"))
                .alias("nr")))
    u = (w.join(nrm, "doc_id").filter(F.col("nr") > 0)
         .select("doc_id", "tok", (F.col("w") / F.col("nr")).alias("u")))
    a = u.select(F.col("tok"), F.col("doc_id").alias("doc_a"),
                 F.col("u").alias("ua"))
    b = u.select(F.col("tok"), F.col("doc_id").alias("doc_b"),
                 F.col("u").alias("ub"))
    dots = (a.join(b, "tok")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.sum((F.col("ua") * F.col("ub"))
                       .cast("decimal(38,12)")).cast("double")
                 .alias("cos")))
    return (dots.filter(F.col("cos") >= threshold)
            .select("doc_a", "doc_b", F.round("cos", 4).alias("cosine")))

"""Corpus-curation operators: the filter/scrub/stats surface a
large-scale training-data pipeline runs between extraction and export.

All pure Column algebra (JVM-side, codegen) with DuckDB-checkable
oracles; regex patterns are lookahead-free and use explicit character
classes so Java regex (Spark) and RE2 (DuckDB) parse them identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# lookahead-free, dialect-portable patterns
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z][A-Za-z]+"
URL_RE = r"https?://[^ \t\n\r\f<>\"]+"
IPV4_RE = (r"[0-9][0-9]?[0-9]?\.[0-9][0-9]?[0-9]?\."
           r"[0-9][0-9]?[0-9]?\.[0-9][0-9]?[0-9]?")


def redact(docs: DataFrame) -> DataFrame:
    """Scrub emails / URLs / IPv4 literals (the cheap PII pass every
    pre-training corpus gets).  Output: doc_id, clean_text, n_emails,
    n_urls, n_ips — counts let downstream quality filters drop
    redaction-heavy documents."""
    text = F.col("text")
    n_emails = F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0)))
    n_urls = F.size(F.regexp_extract_all(text, F.lit(URL_RE), F.lit(0)))
    clean = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    clean = F.regexp_replace(clean, URL_RE, "<URL>")
    n_ips = F.size(F.regexp_extract_all(clean, F.lit(IPV4_RE), F.lit(0)))
    clean = F.regexp_replace(clean, IPV4_RE, "<IP>")
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        clean.alias("clean_text"),
        n_emails.cast("bigint").alias("n_emails"),
        n_urls.cast("bigint").alias("n_urls"),
        n_ips.cast("bigint").alias("n_ips"))


def _ranked_topk(counted: DataFrame, key_col: str, top_n: int) -> DataFrame:
    """(key, n) -> top_n by (n DESC, key ASC) with dense positional
    rank — TakeOrderedAndProject + in-row array ranking, no window
    (same shape as entity_link.build_lexicon)."""
    top = counted.orderBy(F.desc("n"), F.asc(key_col)).limit(top_n)
    packed = top.agg(F.array_sort(F.collect_list(F.struct(
        (-F.col("n")).alias("neg"),
        F.col(key_col).alias("key")))).alias("ranked"))
    return (packed
            .select(F.posexplode("ranked").alias("pos", "r"))
            .select((F.col("pos") + 1).cast("bigint").alias("rank"),
                    F.col("r.key").alias(key_col),
                    (-F.col("r.neg")).cast("bigint").alias("n")))


def top_ngrams(docs: DataFrame, n: int = 2, top_n: int = 20) -> DataFrame:
    """Corpus-level top word n-grams (the classic corpus-stats job):
    tokens stay in-row, n-grams are built with slice/zip over the token
    array (no per-token rows until the single explode), counting is a
    map-side-combined groupBy, and the final top-n never ranks through
    a global window.  Output: rank, ngram, n."""
    toks = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(F.col("text")),
                                        r"\s+", " ")), " "),
        lambda t: t != "")
    idx = F.sequence(F.lit(1), F.greatest(F.size("toks") - (n - 1), F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at("toks", (i + F.lit(j)).cast("int"))
               for j in range(n)]))
    counted = (docs
               .select(toks.alias("toks"))
               .filter(F.size("toks") >= n)
               .select(F.explode(grams).alias("ngram"))
               .groupBy("ngram")
               .agg(F.count("*").cast("bigint").alias("n")))
    return _ranked_topk(counted, "ngram", top_n)


def domain_stats(docs: DataFrame, top_n: int = 20) -> DataFrame:
    """Provenance stats: URLs mentioned per document -> registrable-host
    counts (training-data provenance filters key on these).
    Output: rank, domain, n."""
    urls = F.regexp_extract_all(F.col("text"), F.lit(URL_RE), F.lit(0))
    counted = (docs
               .select(F.explode(urls).alias("url"))
               .select(F.lower(F.regexp_extract(
                   "url", r"https?://([^/:?#]+)", 1)).alias("domain"))
               .filter(F.col("domain") != "")
               .groupBy("domain")
               .agg(F.count("*").cast("bigint").alias("n")))
    return _ranked_topk(counted, "domain", top_n)


_TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)(=|$)"


def canonical_url(col) -> F.Column:
    """Canonical form of a URL column — the normalization CCNet/Dolma-
    style pipelines dedupe provenance on: fragment dropped, scheme
    dropped, host lowercased with leading ``www.`` and default ports
    (:80/:443) stripped, trailing path slashes stripped, and query
    params with tracking keys (``utm_*``, ``fbclid``, ``gclid``,
    ``ref``) removed with the survivors SORTED (byte order) so
    param-order variants collapse.  Pure column algebra (regex + array
    ops), reproducible in the DuckDB oracle."""
    u = F.regexp_replace(col, "#.*", "")
    u = F.regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    base = F.regexp_extract(u, r"^[^?]*", 0)
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    host = F.regexp_extract(base, r"^[^/]*", 0)
    path = F.substr(base, F.length(host) + F.lit(1))
    host = F.regexp_replace(F.lower(host), r"^www\.", "")
    host = F.regexp_replace(host, ":(80|443)$", "")
    path = F.regexp_replace(path, "/+$", "")
    params = F.array_join(F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: ~p.rlike(_TRACKING_PARAM_RE))), "&")
    return F.concat(host, path,
                    F.when(params == "", F.lit(""))
                    .otherwise(F.concat(F.lit("?"), params)))


def url_dedup(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-level dedup decision: documents whose provenance URLs
    canonicalize identically are duplicates; each group keeps its
    minimum doc_id.  Output one row per duplicated canonical URL:
    ``(canonical_url, n_docs, keep_id)`` — the same contract as
    :func:`pyrdfa3_spark.operators.dedup.dedup_exact`, keyed on
    provenance instead of content.

    Scale shape: canonicalization is in-row column algebra; the
    decision is ONE hash groupBy with map-side partial min/count."""
    return (docs
            .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                    canonical_url(F.col(url_col)).alias("canonical_url"))
            .groupBy("canonical_url")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.min("doc_id").alias("keep_id"))
            .filter(F.col("n_docs") > 1))


# Latin accent fold: the pre-composed Latin-1 + Latin-Extended-A
# letters a corpus meets most; char-for-char so Spark's and DuckDB's
# translate() agree byte-exactly (full Unicode NFKC needs ICU — out of
# column-algebra scope, documented)
_ACCENTS = ("áàâäãåāăąÁÀÂÄÃÅĀĂĄçćčĉċÇĆČĈĊďđĎĐéèêëēĕėęěÉÈÊËĒĔĖĘĚ"
            "ĝğġģĜĞĠĢĥħĤĦíìîïĩīĭįıÍÌÎÏĨĪĬĮĵĴķĶĺļľłĹĻĽŁñńņňÑŃŅŇ"
            "óòôöõōŏőøÓÒÔÖÕŌŎŐØŕŗřŔŖŘśŝşšŚŜŞŠţťŧŢŤŦúùûüũūŭůűų"
            "ÚÙÛÜŨŪŬŮŰŲŵŴýÿŷÝŸŶźżžŹŻŽ")
_FOLDED = ("aaaaaaaaaAAAAAAAAAcccccCCCCCddDDeeeeeeeeeEEEEEEEEE"
           "ggggGGGGhhHHiiiiiiiiiIIIIIIIIjJkKllllLLLLnnnnNNNN"
           "oooooooooOOOOOOOOOrrrRRRssssSSSStttTTTuuuuuuuuuu"
           "UUUUUUUUUUwWyyyYYYzzzZZZ")
assert len(_ACCENTS) == len(_FOLDED)


def normalize_text(docs: DataFrame, lowercase: bool = True,
                   accent_fold: bool = True,
                   collapse_ws: bool = True) -> DataFrame:
    """Corpus text normalization — the standard pre-tokenization pass
    (casefold, Latin accent fold, whitespace collapse) every
    training-data pipeline runs before dedup/quality stages.  Pure
    in-row column algebra (lower/translate/regexp_replace): a narrow
    map with zero shuffle at any scale.

    Output: ``(doc_id, norm_text)`` — one row per input document."""
    c = F.col("text")
    if lowercase:
        c = F.lower(c)
    if accent_fold:
        # the table carries both cases; after lower() the uppercase
        # entries simply never match
        c = F.translate(c, _ACCENTS, _FOLDED)
    if collapse_ws:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return docs.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                       c.alias("norm_text"))


def paragraph_dedup(docs: DataFrame, delim: str = r"\n{2,}",
                    min_docs: int = 2,
                    joiner: str = "\n\n") -> DataFrame:
    """CCNet-style paragraph-level boilerplate removal: split each
    document into paragraphs on ``delim`` (a regex), drop every
    paragraph whose NORMALIZED form (lower + trim) appears in at least
    ``min_docs`` distinct documents — nav bars, cookie banners, legal
    footers — and reassemble the survivors in original order with
    ``joiner``.  Docs whose paragraphs are all boilerplate survive
    with empty text (the caller's length floor decides their fate).

    Output: ``(doc_id, clean_text, n_paras, n_removed)`` — one row per
    input document; ``n_paras`` counts non-blank paragraphs.

    Scale shape: one posexplode fan-out (bounded by text length), ONE
    md5-keyed groupBy with map-side partial aggregation for the
    document-frequency pass, a hash anti-join back on the digest (the
    hot-paragraph side is the small one but never needs to broadcast),
    and a per-document ``collect_list`` whose arrays are doc-sized by
    construction.  No windows, no driver materialization."""
    paras = (docs
             .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                     F.posexplode(F.split(F.col("text"), delim))
                     .alias("pos", "para"))
             .withColumn("norm", F.lower(F.trim(F.col("para"))))
             .filter(F.length("norm") > 0)
             .withColumn("phash", F.md5(F.col("norm"))))
    hot = (paras.select("phash", "doc_id").dropDuplicates()
           .groupBy("phash")
           .agg(F.count("*").alias("df"))
           .filter(F.col("df") >= min_docs)
           .select("phash"))
    kept = paras.join(hot, "phash", "left_anti")
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("pos", "para"))),
                            lambda s: s["para"]),
                        joiner).alias("clean_text"),
                    F.count("*").cast("bigint").alias("n_kept")))
    counts = (paras.groupBy("doc_id")
              .agg(F.count("*").cast("bigint").alias("n_paras")))
    return (docs.select(F.col("doc_id").cast("bigint").alias("doc_id"))
            .join(rebuilt, "doc_id", "left")
            .join(counts, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    F.coalesce("n_paras", F.lit(0)).cast("bigint")
                    .alias("n_paras"),
                    (F.coalesce("n_paras", F.lit(0))
                     - F.coalesce("n_kept", F.lit(0))).cast("bigint")
                    .alias("n_removed")))


def clean_corpus(docs: DataFrame, url_col: str | None = None,
                 span_window: int = 8, min_occurrences: int = 2,
                 min_tokens: int = 5) -> DataFrame:
    """The composed cleaning pipeline a pre-training corpus runs, in
    one plan: provenance-URL dedup (optional) -> exact content dedup ->
    cross-corpus duplicate-span removal -> post-clean length floor.
    Each dedup stage keeps its group's minimum doc_id; the span stage
    rewrites the survivors' text (normalized tokens, see
    :func:`pyrdfa3_spark.operators.dedup.remove_duplicate_spans`).

    Output: ``(doc_id, clean_text, n_kept, n_removed)`` — one row per
    surviving document.

    Scale shape: the two dedup stages are map-side-partial groupBys
    joined back on their group key (no windows); the span stage is the
    linear cut pipeline; nothing collects, nothing broadcasts the
    corpus side."""
    from pyrdfa3_spark.operators.dedup import (
        _normalized, remove_duplicate_spans,
    )

    d = docs
    if url_col is not None:
        canon = d.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            canonical_url(F.col(url_col)).alias("_k"))
        keep = canon.groupBy("_k").agg(F.min("doc_id").alias("_keep"))
        survivors = (canon.join(keep, "_k")
                     .filter(F.col("doc_id") == F.col("_keep"))
                     .select("doc_id"))
        d = d.join(survivors,
                   d["doc_id"].cast("bigint") == survivors["doc_id"],
                   "left_semi")
    fp = d.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                  F.md5(_normalized()).alias("_k"))
    keep = fp.groupBy("_k").agg(F.min("doc_id").alias("_keep"))
    survivors = (fp.join(keep, "_k")
                 .filter(F.col("doc_id") == F.col("_keep"))
                 .select("doc_id"))
    d = d.join(survivors,
               d["doc_id"].cast("bigint") == survivors["doc_id"],
               "left_semi")
    cleaned = remove_duplicate_spans(d, window=span_window,
                                     min_occurrences=min_occurrences)
    return cleaned.filter(F.col("n_kept") >= min_tokens)


def _hash32(col) -> F.Column:
    """Portable deterministic 32-bit hash (md5 prefix as integer) —
    reproducible bit-for-bit in the DuckDB oracle via a hex-digit
    polynomial, unlike Spark's xxhash64/hash builtins."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def _word_tokens(text_col) -> F.Column:
    toks = F.split(F.trim(F.regexp_replace(F.lower(text_col),
                                           r"\s+", " ")), " ")
    return F.filter(toks, lambda t: t != "")


def pack_sequences(docs: DataFrame, seq_len: int = 2048,
                   n_shards: int = 32,
                   prefix_partitions: int | None = None) -> DataFrame:
    """Concatenation-style sequence packing (the GPT pre-training
    layout): documents are deterministically sharded by a portable hash
    of ``doc_id``, concatenated in doc_id order within each shard, and
    the shard's token stream is chunked into fixed ``seq_len`` windows.
    Output maps every document to its shard, start offset in the
    stream, and the pack (training sequence) its first token lands in.

    Scale shape: the per-shard running sum is a TWO-PHASE distributed
    prefix sum, not a per-shard window — a window partitioned only by
    shard sorts each shard through a single task (10^9 docs / 32
    shards = a 31M-row single-task sort).  Instead the frame is
    range-partitioned by (shard, doc_id) into ``prefix_partitions``
    slices (default: spark.sql.shuffle.partitions), per-slice token
    totals form a dim of at most that many rows, the cumulative
    base offset per slice is a window over that tiny dim, and each
    slice then needs only a partition-local running sum.  Parallelism
    scales with the partition count, not n_shards.  Output is
    independent of where the range boundaries land: base offset +
    slice-local prefix is the global (shard, doc_id)-order prefix by
    construction.
    """
    toks = F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0)) \
        .otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+")))
    base = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        toks.cast("bigint").alias("n_tokens"),
        (_hash32(F.col("doc_id").cast("string")) % n_shards)
        .cast("bigint").alias("shard"))
    if prefix_partitions is None:
        prefix_partitions = int(docs.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "200"))
    # eager checkpoint: pin ONE partition assignment for both the
    # per-slice-totals branch and the final join (range bounds are
    # sampled and spark_partition_id is execution-dependent — two
    # independent evaluations of this subtree could disagree unless
    # materialized once; exchange reuse is an optimization, not a
    # correctness guarantee).
    sliced = (base
              .repartitionByRange(prefix_partitions, "shard", "doc_id")
              .withColumn("slice", F.spark_partition_id())
              .localCheckpoint(eager=True))
    slice_tot = (sliced.groupBy("shard", "slice")
                 .agg(F.sum("n_tokens").alias("tot")))
    w_dim = Window.partitionBy("shard").orderBy("slice")
    offsets = slice_tot.select(
        "shard", "slice",
        (F.sum("tot").over(w_dim) - F.col("tot")).alias("base_off"))
    w_local = Window.partitionBy("shard", "slice").orderBy("doc_id")
    start = (F.col("base_off")
             + F.sum("n_tokens").over(w_local) - F.col("n_tokens"))
    return (sliced
            .join(F.broadcast(offsets), ["shard", "slice"])
            .select("doc_id", "shard", "n_tokens",
                    start.cast("bigint").alias("start_offset"),
                    F.floor(start / seq_len).cast("bigint")
                    .alias("pack_id")))


def decontaminate(docs: DataFrame, eval_docs: DataFrame,
                  n: int = 5, broadcast_eval: bool = True) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    ``n``-gram with an evaluation set (the standard eval-leakage scrub
    before pre-training).  Output: doc_id, n_hits (distinct shared
    n-grams), contaminated.

    Scale shape: n-grams are built in-row (transform over the token
    array — no per-token rows), hashed to 32 bits, and the eval side is
    a dim-sized distinct list that Catalyst broadcasts; the per-doc
    count is a map-side-combined groupBy.  No window, no all-pairs.
    Benchmark suites are dim-sized (thousands of documents), so the
    broadcast is the right default; pass ``broadcast_eval=False`` for a
    pathologically large eval side to fall back to a shuffle join
    rather than OOM every executor on the broadcast build.
    """
    def gram_hashes(frame: DataFrame) -> DataFrame:
        toks = _word_tokens(F.col("text"))
        idx = F.sequence(F.lit(1),
                         F.greatest(F.size("toks") - (n - 1), F.lit(0)))
        grams = F.transform(idx, lambda i: _hash32(F.concat_ws(
            " ", *[F.element_at("toks", (i + F.lit(j)).cast("int"))
                   for j in range(n)])))
        return (frame
                .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                        toks.alias("toks"))
                .filter(F.size("toks") >= n)
                .select("doc_id", F.explode(F.array_distinct(grams))
                        .alias("gh")))
    eval_grams = gram_hashes(eval_docs).select("gh").distinct()
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    hits = (gram_hashes(docs)
            .join(eval_grams, "gh", "inner")
            .groupBy("doc_id")
            .agg(F.count("*").cast("bigint").alias("n_hits")))
    return (docs.select(F.col("doc_id").cast("bigint").alias("doc_id"))
            .join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_hits", F.lit(0)).cast("bigint")
                    .alias("n_hits"),
                    (F.coalesce("n_hits", F.lit(0)) > 0)
                    .alias("contaminated")))


def _gram_buckets(frame: DataFrame, n_buckets: int) -> DataFrame:
    """(doc_id, b, c): per-document counts of hashed word uni+bigram
    features — DSIR's featurization.  Grams are built in-row (the
    bigram shift is ``zip_with`` over the token array, as in
    :func:`repetition_metrics`) and bucketed with the portable
    :func:`_hash32`; the only explode is the one the per-bucket count
    needs."""
    toks = _word_tokens(F.col("text"))
    bi = F.filter(
        F.zip_with(toks, F.slice(toks, 2, F.size(toks)),
                   lambda a, b: F.concat_ws(" ", a, b)),
        lambda x: x.contains(" "))
    buckets = F.transform(F.concat(toks, bi),
                          lambda g: _hash32(g) % n_buckets)
    return (frame
            .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                    buckets.alias("bs"))
            .filter(F.size("bs") > 0)
            .select("doc_id", F.explode("bs").alias("b"))
            .groupBy("doc_id", "b")
            .agg(F.count("*").cast("bigint").alias("c")))


def classifier_score(docs: DataFrame, weights: DataFrame,
                     bias: float = 0.0,
                     n_buckets: int = 1024) -> DataFrame:
    """fastText-style linear quality-classifier INFERENCE (the
    model-based filter stage of CCNet/FineWeb-style pipelines, e.g.
    Joulin et al. 2017 "Bag of Tricks for Efficient Text
    Classification"): hashed word uni+bigram counts (the
    :func:`dsir_weights` featurization) dot a ``(b, weight)`` model
    dim plus ``bias``, squashed to a probability.  Training happens
    offline (the model is tiny); this is the corpus-wide scoring pass.
    Output: ``(doc_id, score)`` for EVERY document — docs with no
    features score ``sigmoid(bias)``.

    Scale shape: the model is a dimension table (≤ ``n_buckets`` rows)
    joined broadcast; featurization and the dot product are the same
    explode + map-side-partial-sum shape as DSIR.  Every document
    contributes one zero term, so the no-feature docs fall out of the
    SAME partially-aggregated groupBy — no corpus-against-corpus
    restore join (a 10x step-up bench showed Catalyst rightly
    sort-merging that join once both sides outgrew broadcast; the
    union+groupBy is one shuffle and no sort at any scale), no
    window, no all-pairs anything: inference cost is one corpus scan.

    Determinism: the logit sums in DECIMAL (order-independent) and is
    rounded to 9 places before the sigmoid, the final probability to 4
    — the module's cross-engine float discipline.
    """
    feats = _gram_buckets(docs, n_buckets)
    terms = (feats.join(F.broadcast(weights), "b")
             .select("doc_id",
                     (F.col("c") * F.col("weight"))
                     .cast("decimal(38,12)").alias("t")))
    zeros = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.lit(0).cast("decimal(38,12)").alias("t"))
    dots = (terms.unionByName(zeros)
            .groupBy("doc_id")
            .agg(F.sum("t").alias("dot")))
    logit = F.round(
        (F.lit(bias) + F.col("dot").cast("double")), 9)
    return dots.select(
        "doc_id",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)),
                4).alias("score"))


def dsir_weights(docs: DataFrame, target: DataFrame,
                 n_buckets: int = 1024) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): featurize every
    document as hashed word uni+bigram counts and score it by the
    log-likelihood ratio of Laplace-smoothed bucket-multinomial models
    of the ``target`` domain vs the ``docs`` (raw) corpus — the weight
    a pre-training mix uses to resample raw data toward a target
    domain.  Output: ``(doc_id, log_weight)`` for every raw document
    (higher = more target-like; rounded to 4 places for cross-engine
    comparison).

    Scale shape: the feature-bucket models are ``n_buckets``-row
    dimension tables (map-side-partial counts), joined back broadcast;
    the per-document score is one more map-side-partial sum.  The raw
    corpus is scanned twice (model + scoring) — at 100 TB persist the
    gram-bucket frame or estimate the raw model on a sample, as the
    paper does.

    Determinism: Java's ``Math.log`` and libm disagree in the last ulp
    for ~1% of integer inputs, so each log term is rounded to 9 places
    before combining and the per-document sum runs in DECIMAL (exact,
    order-independent — double summation order varies with partition
    layout), the module's standard float-aggregate discipline.
    """
    def ln9(col):
        return F.round(F.log(col.cast("double")), 9)

    raw_g = _gram_buckets(docs, n_buckets)
    tgt_cnt = (_gram_buckets(target, n_buckets)
               .groupBy("b").agg(F.sum("c").alias("t_cnt")))
    raw_cnt = raw_g.groupBy("b").agg(F.sum("c").alias("r_cnt"))
    dim = (raw_cnt.join(tgt_cnt, "b", "left")
           .select("b", F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
                   "r_cnt"))
    # totals over each corpus in full (the papers' multinomial
    # denominators), not just the buckets the raw side happens to share
    totals = (tgt_cnt.agg(F.sum("t_cnt").alias("t_tot"))
              .crossJoin(raw_cnt.agg(F.sum("r_cnt").alias("r_tot"))))
    lr = (ln9(F.col("t_cnt") + 1) - ln9(F.col("t_tot") + n_buckets)
          - ln9(F.col("r_cnt") + 1) + ln9(F.col("r_tot") + n_buckets))
    scored_dim = (dim.join(F.broadcast(totals))
                  .select("b", lr.alias("lr")))
    return (raw_g.join(F.broadcast(scored_dim), "b")
            .groupBy("doc_id")
            .agg(F.round(F.sum((F.col("c") * F.col("lr"))
                               .cast("decimal(38,12)")).cast("double"), 4)
                 .alias("log_weight")))


def lm_perplexity(docs: DataFrame, lm_docs: DataFrame | None = None,
                  alpha: float = 0.1,
                  vocab_buckets: int = 4096,
                  broadcast_model: bool = True) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data" — documents are ranked by LM perplexity and the worst tail is
    dropped): a hashed-bigram model with add-``alpha`` smoothing is
    fitted on ``lm_docs`` (default: the corpus itself) and every
    document scored by its per-token negative log-likelihood.  Output:
    ``(doc_id, nll)`` — higher = less language-like = drop candidate
    (monotone in perplexity; the exp is left to callers so the oracle
    compares one fewer float op).

    Model: P(w_i | w_{i-1}) = (c(b(w_{i-1}, w_i)) + alpha) /
    (c(b(w_{i-1})) + alpha * vocab_buckets), over hash buckets (the
    hashing trick keeps both model tables at ``vocab_buckets``-bounded
    dimension size, exactly like :func:`dsir_weights`).

    Scale shape: two map-side-partial count aggregations build the
    model dims; scoring joins them back broadcast and sums per
    document.  The bigram dim is bounded by ``vocab_buckets``² rows
    (a 100 TB corpus saturates most buckets), so for large
    ``vocab_buckets`` pass ``broadcast_model=False`` to shuffle-join
    the bigram dim instead of building a multi-GB broadcast on every
    executor; the context dim stays broadcast (``vocab_buckets``
    rows).  Same cross-engine float discipline as
    :func:`dsir_weights`: log terms round to 9 places, the per-doc sum
    runs in DECIMAL, the mean divides at the end.
    """
    def ln9(col):
        return F.round(F.log(col.cast("double")), 9)

    model_src = docs if lm_docs is None else lm_docs

    def bigram_rows(frame: DataFrame) -> DataFrame:
        toks = _word_tokens(F.col("text"))
        bi = F.filter(
            F.zip_with(toks, F.slice(toks, 2, F.size(toks)),
                       lambda a, b: F.concat_ws("\x1f", a, b)),
            lambda x: x.contains("\x1f"))
        return (frame
                .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                        bi.alias("bs"))
                .filter(F.size("bs") > 0)
                .select("doc_id", F.explode("bs").alias("bg"))
                .select("doc_id",
                        (_hash32(F.substring_index("bg", "\x1f", 1))
                         % vocab_buckets).alias("h1"),
                        (_hash32(F.col("bg")) % vocab_buckets)
                        .alias("h2")))

    model = bigram_rows(model_src)
    ctx_cnt = (model.groupBy("h1").agg(F.count("*").alias("c1")))
    big_cnt = (model.groupBy("h1", "h2")
               .agg(F.count("*").alias("c2")))

    scored = bigram_rows(docs).groupBy("doc_id", "h1", "h2") \
        .agg(F.count("*").cast("bigint").alias("c"))
    # smoothing covers bigrams (and contexts) the LM never saw, so the
    # two model dims join LEFT and coalesce to zero counts
    lp = (ln9(F.coalesce(F.col("c2"), F.lit(0)) + alpha)
          - ln9(F.coalesce(F.col("c1"), F.lit(0))
                + alpha * vocab_buckets))
    if broadcast_model:
        big_cnt = F.broadcast(big_cnt)
    return (scored
            .join(big_cnt, ["h1", "h2"], "left")
            .join(F.broadcast(ctx_cnt), ["h1"], "left")
            .groupBy("doc_id")
            .agg(F.round(
                -F.sum((F.col("c") * lp).cast("decimal(38,12)"))
                .cast("double") / F.sum("c"), 4).alias("nll")))


def _length_stratum(bounds: tuple[int, int]) -> F.Column:
    return (F.when(F.length("text") < bounds[0], "short")
            .when(F.length("text") < bounds[1], "medium")
            .otherwise("long"))


def stratified_sample(docs: DataFrame, fractions: dict[str, float],
                      bounds: tuple[int, int] = (200, 1000)) -> DataFrame:
    """Deterministic per-stratum downsampling (training-mix control):
    each document is kept iff a portable hash of its id falls under the
    stratum's keep-rate — reproducible across runs, cluster sizes and
    engines (unlike ``sampleBy``'s RNG).  Strata here are document
    length classes; thresholds use integer per-mille math so the oracle
    compares integers, never floats.  Output: kept doc_id, stratum.

    Scale shape: pure Column algebra over the scan — no shuffle at all.
    """
    stratum = _length_stratum(bounds)
    permille = (_hash32(F.concat(F.lit("samp|"),
                                 F.col("doc_id").cast("string"))) % 1000)
    keep = F.lit(False)
    for name, frac in fractions.items():
        keep = keep | ((stratum == name) & (permille < int(frac * 1000)))
    return (docs
            .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                    stratum.alias("stratum"), keep.alias("keep"))
            .filter("keep").drop("keep"))


def quota_mix(docs: DataFrame, quota: int = 50,
              bounds: tuple[int, int] = (200, 1000)) -> DataFrame:
    """Per-stratum quota capping (domain/length mixing): keep at most
    ``quota`` documents per stratum, chosen by deterministic hash order
    so the subset is stable across runs.  Output: doc_id, stratum, rnk.

    Scale shape: NO ranking window — a window partitioned by stratum
    sorts a mega-stratum (most of a web corpus is 'medium') through a
    single task, and AQE cannot split window partitions.  Two-phase
    top-k instead (the `_topk_per_query` shape from similarity.py):
    partial top-quota inside each scan partition, then a per-stratum
    merge of the ≤ partitions×quota survivors — both phases sort+slice
    small in-row arrays with map-side partial aggregation.
    """
    stratum = _length_stratum(bounds)
    h = _hash32(F.concat(F.lit("mix|"), F.col("doc_id").cast("string")))
    base = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        stratum.alias("stratum"), h.alias("h"))
    item = F.struct(F.col("h"), F.col("doc_id"))
    partial = (base
               .groupBy("stratum", F.spark_partition_id().alias("p"))
               .agg(F.slice(F.array_sort(F.collect_list(item)), 1, quota)
                    .alias("top")))
    merged = (partial
              .select("stratum", F.explode("top").alias("r"))
              .groupBy("stratum")
              .agg(F.slice(F.array_sort(F.collect_list("r")), 1, quota)
                   .alias("top")))
    return (merged
            .select("stratum", F.posexplode("top").alias("pos", "r"))
            .select(F.col("r.doc_id").alias("doc_id"), "stratum",
                    (F.col("pos") + 1).cast("bigint").alias("rnk")))


def corpus_filter(docs: DataFrame,
                  max_stop_ratio: float = 1.0,
                  min_alpha_ratio: float = 0.5,
                  jaccard_threshold: float = 0.7) -> DataFrame:
    """The composed keep/drop decision a pre-training run applies: each
    document is kept unless a rule rejects it, with the FIRST failing
    rule recorded (rule order: length — quality_score's len_ok 100-char
    floor — then alpha ratio, stop-word ratio, near-duplicate).
    Quality signals come from :func:`textops.quality_score`; duplicates
    from :func:`dedup.dedup_decision` (is_dup rows drop, cluster
    keepers stay).  Output: doc_id, keep, reason (NULL when kept)."""
    from pyrdfa3_spark.operators.dedup import dedup_decision
    from pyrdfa3_spark.operators.textops import quality_score

    q = quality_score(docs)
    dups = (dedup_decision(docs, jaccard_threshold=jaccard_threshold)
            .filter(F.col("is_dup"))
            .select("doc_id", F.lit(True).alias("dup")))
    joined = q.join(dups, "doc_id", "left")
    reason = F.when(~F.col("len_ok"), "short") \
        .when(F.col("alpha_ratio") < min_alpha_ratio, "low_alpha") \
        .when(F.col("stop_ratio") > max_stop_ratio, "stopword_heavy") \
        .when(F.col("dup"), "near_duplicate")
    return joined.select(
        "doc_id",
        reason.isNull().alias("keep"),
        reason.alias("reason"))


def repetition_metrics(docs: DataFrame) -> DataFrame:
    """Within-document repetition signals (the Gopher/MassiveText
    family of quality rules: repetitious documents are low-value
    training data and often machine-generated):

    * ``dup_line_frac``  — fraction of non-empty lines that repeat an
      earlier line (1 - distinct/total).
    * ``dup_word_frac``  — same over whitespace word tokens.
    * ``top_bigram_frac`` — share of all word-bigram occurrences taken
      by the single most frequent bigram.

    Scale shape: every metric is in-row Column algebra over split
    arrays — no explode, no shuffle, no Python.  The bigram mode is
    found by sorting the in-row bigram array and scanning for the
    longest equal run with ``aggregate`` (O(n log n) per document,
    not the O(n^2) per-element recount).  Fractions are rounded to 6
    places so they compare exactly across engines.
    """
    # NB: the lambda must be explicit — a bare F.trim would receive the
    # element INDEX as trim's optional second (trim-characters) argument
    lines = F.filter(
        F.transform(F.split(F.col("text"), "\n"), lambda x: F.trim(x)),
        lambda x: x != "")
    words = _word_tokens(F.col("text"))
    bigrams = F.filter(
        F.zip_with(words, F.slice(words, 2, F.size(words)),
                   lambda a, b: F.concat_ws(" ", a, b)),
        # zip_with pads the shifted copy with NULL; concat_ws drops
        # NULLs, so the padded tail collapses to the bare first word —
        # strip it by requiring a space
        lambda x: x.contains(" "))

    def dup_frac(arr):
        n = F.size(arr)
        return F.when(n == 0, F.lit(0.0)).otherwise(
            1.0 - F.size(F.array_distinct(arr)) / n)

    run = F.aggregate(
        F.array_sort(bigrams),
        F.struct(F.lit("").alias("prev"),
                 F.lit(0).cast("long").alias("run"),
                 F.lit(0).cast("long").alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
            .cast("long").alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
                .cast("long")).alias("best")))
    nb = F.size(bigrams)
    top_bigram = F.when(nb == 0, F.lit(0.0)) \
        .otherwise(run.best / nb)

    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.round(dup_frac(lines), 6).alias("dup_line_frac"),
        F.round(dup_frac(words), 6).alias("dup_word_frac"),
        F.round(top_bigram, 6).alias("top_bigram_frac"))


def weighted_sample(docs: DataFrame, weight_col: str, n: int = 50,
                    id_col: str = "doc_id") -> DataFrame:
    """Weighted sampling WITHOUT replacement, n items with inclusion
    probability proportional to ``weight_col`` — the
    Efraimidis-Spirakis (2006) exponential-key scheme: each item
    draws u in (0,1] and ranks by u^(1/w); the top n are the sample.
    Ranking here uses the monotone log form ``ln(u)/w``.

    Deterministic twin of the usual RNG formulation (same discipline
    as ``stratified_sample``): u derives from md5(id) — 15 hex chars
    = a 60-bit uniform — so the sample is reproducible run-to-run,
    engine-independent (``ln`` rounds at 9 dp before the division;
    ties break on id), and auditable.  Items with non-positive
    weight are excluded (their inclusion probability is 0).

    Scale shape: the global top-n is the two-phase partition-local
    pattern of ``similarity._topk_per_query`` — partial top-n inside
    each scan partition, then one merge of the <= partitions*n
    survivors; no global ranking window, no full sort.
    """
    u_num = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")),
                                1, 15), 16, 10)
             .cast("double") + 1.0)
    u = u_num / float(2 ** 60 + 1)
    score = F.round(F.log(u), 9) / F.col(weight_col).cast("double")
    base = (docs.filter(F.col(weight_col) > 0)
            .select(F.col(id_col).cast("bigint").alias("doc_id"),
                    F.round(score, 9).alias("score")))
    item = F.struct((-F.col("score")).alias("neg"),
                    F.col("doc_id").alias("doc_id"))
    partial = (base
               .groupBy(F.spark_partition_id().alias("p"))
               .agg(F.slice(F.array_sort(F.collect_list(item)), 1, n)
                    .alias("top")))
    merged = (partial.select(F.explode("top").alias("r"))
              .groupBy()
              .agg(F.slice(F.array_sort(F.collect_list("r")), 1, n)
                   .alias("top")))
    return (merged.select(F.explode("top").alias("r"))
            .select(F.col("r.doc_id").alias("doc_id"),
                    (-F.col("r.neg")).alias("score")))

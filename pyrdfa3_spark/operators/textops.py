"""Text-analysis operators for large-scale training-data pipelines.

All pure Column algebra (JVM-side, whole-stage codegen) — no Python in
the hot path.  Each operator has a matching ANSI-SQL oracle in
``__spark_entry__.oracle_sql`` so DuckDB cross-checks it at sf=0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deliberately small, deterministic stop-word marker sets per language:
# the oracle must reproduce them in SQL, so counts use simple
# space-delimited markers rather than tokenizer-grade lists.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "los", "que", "es", "las"],
}


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace token counting (bigint for oracle parity)."""
    toks = F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+")))
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        toks.cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Cheap quality heuristics: length, alpha ratio, punctuation ratio,
    mean token length, stop-word ratio — the usual pre-training filters.
    The stop-word ratio uses the deterministic English marker set
    (``_LANG_MARKERS['en']``) so the SQL oracle reproduces it exactly."""
    text = F.col("text")
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(text, "[^.,;:!?]", ""))
    toks = F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+")))
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    stop_hits = F.lit(0)
    for w in _LANG_MARKERS["en"]:
        token = f" {w} "
        stop_hits = stop_hits + (
            F.length(padded)
            - F.length(F.replace(padded, F.lit(token), F.lit("")))
        ) / len(token)
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.round(alpha / F.greatest(n, F.lit(1)), 4).alias("alpha_ratio"),
        F.round(punct / F.greatest(n, F.lit(1)), 4).alias("punct_ratio"),
        F.round(n / F.greatest(toks, F.lit(1)), 2).alias("mean_tok_len"),
        F.round(stop_hits / F.greatest(toks, F.lit(1)), 4)
        .alias("stop_ratio"),
        (n >= 100).alias("len_ok"),
    )


# GPT-2-style pre-tokenizer, lookahead-free so Java regex (Spark) and
# RE2 (DuckDB) agree: contractions, letter runs, digit runs,
# punctuation runs, whitespace runs.  Whitespace is an explicit class —
# \s differs between the two dialects.
BPE_TOKEN_PATTERN = ("'(?:[sdmt]|ll|ve|re)"
                     "| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\f]+"
                     "|[ \t\n\r\f]+")


def bpe_token_count(docs: DataFrame) -> DataFrame:
    """BPE-ish token counting: the number of pre-tokenizer segments is
    the standard cheap proxy for LLM token counts (real BPE merges only
    subdivide within segments)."""
    toks = F.size(F.regexp_extract_all(
        F.col("text"), F.lit(BPE_TOKEN_PATTERN), F.lit(0)))
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        toks.cast("bigint").alias("n_bpe_tokens"),
    )


def rolling_fingerprint(docs: DataFrame, k: int = 8, base: int = 131,
                        mod: int = 1_000_000_007) -> DataFrame:
    """Rolling-hash document fingerprint (winnowing-lite): polynomial
    hash of every ``k``-char window of the normalized text, fingerprint
    = the minimum window hash.  Robust to local edits away from the
    minimizing window — the content-defined sampling trick winnowing
    builds on — where the md5 :func:`fingerprint` changes on any edit.
    Pure Column algebra: one in-row ``transform`` + ``array_min``;
    factors fit int64 without interleaved mod (255 * 131^7 * 8 < 2^63).
    """
    base_norm = F.trim(F.regexp_replace(F.lower(F.col("text")),
                                        r"\s+", " "))
    # pad ONLY when short — rpad alone would TRUNCATE longer text to k
    # chars (fingerprinting just the first window)
    normalized = F.when(F.length(base_norm) < k,
                        F.rpad(base_norm, k, " ")).otherwise(base_norm)
    # char codes materialized ONCE as an int array: substr(i, 1) per
    # window char would re-scan the UTF8 string for the byte offset
    # (O(i) each -> O(n^2 k) per long document); element_at is O(1)
    codes = F.transform(F.split(F.col("norm"), ""),
                        lambda c: F.ascii(c).cast("bigint"))

    def window_hash(i):
        h = F.lit(0).cast("bigint")
        for j in range(k):
            h = h + F.element_at(F.col("codes"), (i + F.lit(j)).cast("int")) \
                * F.lit(base ** (k - 1 - j)).cast("bigint")
        return h % mod

    idx = F.sequence(
        F.lit(1), F.greatest(F.size("codes") - (k - 1), F.lit(1)))
    return (docs
            .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                    normalized.alias("norm"))
            .select("doc_id", codes.alias("codes"))
            .select("doc_id",
                    F.array_min(F.transform(idx, window_hash))
                    .alias("rolling_fp")))


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID: count per-language stop-word hits in the
    lowercased, space-padded text; highest count wins, ties broken by
    language code order; no hits -> 'und'."""
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))

    def hits(words):
        c = F.lit(0)
        for w in words:
            token = f" {w} "
            c = c + (F.length(padded)
                     - F.length(F.replace(padded, F.lit(token), F.lit("")))
                     ) / len(token)
        return c.cast("bigint")

    scored = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        *[hits(ws).alias(f"hits_{lang}") for lang, ws in
          sorted(_LANG_MARKERS.items())],
    )
    langs = sorted(_LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier language wins ties
        pred = F.when((F.col(f"hits_{lg}") == best) & (best > 0),
                      F.lit(lg)).otherwise(pred)
    return scored.select("doc_id", pred.alias("lang_pred"),
                         best.alias("marker_hits"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of lowercased, whitespace-collapsed
    text — the exact-dedup key."""
    normalized = F.trim(F.regexp_replace(F.lower(F.col("text")),
                                         r"\s+", " "))
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.md5(normalized).alias("fp"),
    )


def bm25_score(docs: DataFrame, query_terms: list[str],
               k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed query —
    the retrieval scorer curation pipelines use to mine topical
    training data at corpus scale.

    Tokenization is the deterministic lowercase-alnum split (matching
    the SQL oracle).  Per query term everything is in-row Column
    algebra (``size(filter(tokens, = term))`` — no explode, no
    per-token rows); the only non-map stages are two dimension-sized
    aggregates — average document length and per-term document
    frequency — broadcast back onto the corpus as a single-row
    cross join.  IDF uses the Lucene/BM25+ form
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` so scores stay positive.

    Returns (doc_id, score) with score rounded at 6 dp for
    cross-engine float determinism.
    """
    if not query_terms:
        raise ValueError("bm25_score needs at least one query term")
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                    lambda x: x != "")
    base = docs.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                       toks.alias("toks"))
    def tf_of(term):
        # nb: a two-arg lambda would make F.filter pass the element
        # INDEX as the second argument — bind the term via closure
        return F.size(F.filter(F.col("toks"), lambda x: x == F.lit(term)))

    tf_cols = [tf_of(t).cast("double").alias(f"_tf{i}")
               for i, t in enumerate(query_terms)]
    wide = base.select("doc_id",
                       F.size("toks").cast("double").alias("_dl"),
                       *tf_cols)
    # corpus statistics: one 1-row aggregate, broadcast onto every doc
    stats = wide.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[F.sum((F.col(f"_tf{i}") > 0).cast("double")).alias(f"_df{i}")
          for i in range(len(query_terms))])
    scored = wide.join(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        tf, df = F.col(f"_tf{i}"), F.col(f"_df{i}")
        idf = F.log(F.lit(1.0)
                    + (F.col("_n") - df + 0.5) / (df + 0.5))
        norm = tf + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
        score = score + idf * (tf * (k1 + 1)) / norm
    return scored.select(
        "doc_id", F.round(score, 6).alias("score"))


def chunk_documents(docs: DataFrame, chunk_chars: int = 512,
                    overlap: int = 64) -> DataFrame:
    """Overlapping fixed-window chunking — the context-window prep
    step every training/RAG pipeline runs before embedding or packing
    long documents.  Windows of ``chunk_chars`` characters advance by
    ``chunk_chars - overlap``; the final window is the remainder (never
    a duplicate full window).  Output: ``(doc_id, chunk_idx, start,
    chunk_text)`` with 1-based index and character offset, so a chunk
    maps back to its source span exactly.

    Scale shape: chunk starts are an in-row ``sequence`` and the text
    slices are ``substring`` over the same row — posexplode is the
    only fan-out, there is no shuffle and no Python; deterministic
    under any partitioning.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    stride = chunk_chars - overlap
    n = F.length("text")
    n_chunks = F.when(n <= chunk_chars, F.lit(1)).otherwise(
        F.floor((n - chunk_chars + stride - 1) / stride) + 1)
    starts = F.sequence(F.lit(1).cast("long"),
                        ((n_chunks - 1) * stride + 1).cast("long"),
                        F.lit(stride).cast("long"))
    return (docs
            .filter(n > 0)
            .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                    F.col("text"), starts.alias("starts"))
            .select("doc_id", "text",
                    F.posexplode("starts").alias("p", "start"))
            .select("doc_id",
                    (F.col("p") + 1).cast("bigint").alias("chunk_idx"),
                    F.col("start").cast("bigint").alias("start"),
                    F.expr(f"substring(text, start, {chunk_chars})")
                    .alias("chunk_text")))


# PII patterns: deliberately conservative, deterministic, and written
# in the Java-regex/RE2 COMMON SUBSET (no lookaround, no backrefs) so
# the DuckDB oracle runs them character-for-character.  They are
# screening patterns (the standard pre-training PII scrub), not
# validators.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\+[0-9]{1,3}[ \-][0-9]{2,4}[ \-][0-9]{3,4}[ \-][0-9]{3,4}\b",
}


def pii_scan(docs: DataFrame) -> DataFrame:
    """Per-document PII screening counts (the audit half of the
    standard pre-training PII scrub): non-overlapping match counts
    per :data:`PII_PATTERNS` class plus the ``has_pii`` triage bit.

    Scale shape: one corpus scan, all counts scan-side
    ``regexp_count`` column algebra inside whole-stage codegen — no
    shuffle, no Python, no UDF."""
    cols = [F.regexp_count(F.col("text"), F.lit(p)).cast("bigint")
            .alias(f"n_{name}") for name, p in PII_PATTERNS.items()]
    out = docs.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                      *cols)
    any_pii = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}") > 0
        any_pii = c if any_pii is None else (any_pii | c)
    return out.withColumn("has_pii", any_pii)


def pii_redact(docs: DataFrame) -> DataFrame:
    """Redaction half of the PII scrub: every :data:`PII_PATTERNS`
    match replaced with its ``[CLASS]`` tag, longest-specificity
    first (SSN before phone so a hyphenated SSN never half-matches
    the phone pattern).  Same zero-shuffle scan shape as
    :func:`pii_scan`; redaction order is fixed and documented, so the
    output is deterministic and the oracle replays it exactly."""
    text = F.col("text")
    for name in ("email", "ipv4", "ssn", "phone"):
        text = F.regexp_replace(text, PII_PATTERNS[name],
                                f"[{name.upper()}]")
    return docs.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                       text.alias("text"))


def repetition_stats(docs: DataFrame,
                     ngram_window: int = 256) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 "Scaling
    Language Models", quality heuristics): per document the duplicate
    LINE and duplicate PARAGRAPH fractions plus the most-repeated
    word-bigram's share — the signals that kill boilerplate and
    template spam before pre-training.

    ``ngram_window`` is a MODEL parameter, not a silent cap: the
    bigram share is estimated over the document's first
    ``ngram_window`` bigrams (the in-row frequency count is O(w²) per
    document, so the window bounds per-row work at 100 TB; oracles
    mirror the same window).  Line/paragraph fractions are exact.

    All in-row column algebra (split / array_distinct / aggregate
    lambdas) — one corpus scan, no shuffle, no Python."""
    text = F.col("text")
    lines = F.filter(F.split(text, r"\n"),
                     lambda s: F.length(F.trim(s)) > 0)
    paras = F.filter(F.split(text, r"\n\n+"),
                     lambda s: F.length(F.trim(s)) > 0)

    def dup_frac(arr):
        n = F.size(arr)
        return F.when(n <= 0, F.lit(0.0)).otherwise(
            F.round((n - F.size(F.array_distinct(arr)))
                    / n.cast("double"), 4))

    toks = F.split(F.trim(text), r"\s+")
    # zip_with pads the shorter side with NULLs, so the raw zip's last
    # element is a lone token — slice to n-1 REAL bigrams before the
    # estimation window applies
    grams = F.when(F.size(toks) < 2, F.array().cast("array<string>")) \
        .otherwise(F.slice(
            F.zip_with(toks, F.slice(toks, 2, F.size(toks)),
                       lambda a, b: F.concat_ws("\x1f", a, b)),
            F.lit(1),
            F.least(F.size(toks) - 1, F.lit(ngram_window))))
    top_share = F.when(F.size(grams) <= 0, F.lit(0.0)).otherwise(
        F.round(
            F.array_max(F.transform(
                grams,
                lambda g: F.size(F.filter(grams,
                                          lambda x: x == g))))
            / F.size(grams).cast("double"), 4))
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.size(lines).cast("bigint").alias("n_lines"),
        dup_frac(lines).alias("dup_line_frac"),
        dup_frac(paras).alias("dup_para_frac"),
        top_share.alias("top_bigram_share"))


def domain_mix(docs: DataFrame) -> DataFrame:
    """Per-source corpus composition audit (the training-mix
    accounting every dataset card reports, and the input
    :func:`~pyrdfa3_spark.operators.curation.quota_mix` decisions are
    made against): document count, whitespace-token count, and each
    source's share of both.  Output: (source, n_docs, n_tokens,
    doc_share, token_share).

    Scale shape: one map-side-partial groupBy(source) plus a 1-row
    broadcast total — shares divide exact bigint sums, so values are
    order-independent and cross-engine stable."""
    toks = F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0)) \
        .otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+")))
    base = docs.select(F.col("source"),
                       toks.cast("bigint").alias("n_toks"))
    per = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("n_tokens"))
    tot = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("_d"),
        F.sum("n_toks").cast("bigint").alias("_t"))
    return (per.crossJoin(F.broadcast(tot))
            .select("source", "n_docs", "n_tokens",
                    F.round(F.col("n_docs") / F.col("_d").cast("double"),
                            6).alias("doc_share"),
                    F.when(F.col("_t") > 0,
                           F.round(F.col("n_tokens")
                                   / F.col("_t").cast("double"), 6))
                    .otherwise(F.lit(0.0)).alias("token_share")))

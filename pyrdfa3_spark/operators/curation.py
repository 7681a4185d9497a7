"""Corpus-curation operators: the filter/scrub/stats surface a
large-scale training-data pipeline runs between extraction and export.

All pure Column algebra (JVM-side, codegen) with DuckDB-checkable
oracles; regex patterns are lookahead-free and use explicit character
classes so Java regex (Spark) and RE2 (DuckDB) parse them identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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

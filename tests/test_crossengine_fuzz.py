"""Cross-engine fuzz: the text/dedup oracles must hold on adversarial
text, not just the driver's synthetic corpus.

A seeded random corpus (quotes, backslashes, repeated/empty/whitespace
docs, punctuation runs, long tokens) is registered as the ``documents``
view in DuckDB and run through the SAME SQL strings the driver gate
uses, compared value-for-value against the Spark operators.  The
alphabet stays ASCII + a couple of stable accented letters — engine
collation differences on exotic Unicode are out of the oracle contract.
"""

from __future__ import annotations

import random
import string

import duckdb
import pandas as pd
import pytest

ALPHABET = string.ascii_letters + string.digits + "  \t.,;:!?'\"\\-_éü"


def _fuzz_docs(n: int = 300, seed: int = 20260817):
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        kind = i % 6
        if kind == 0:
            text = ""
        elif kind == 1:
            text = " \t " * rng.randint(1, 5)
        elif kind == 2:  # repeated boilerplate (dedup clusters)
            text = "common footer text appears here " * rng.randint(2, 4)
        elif kind == 3:  # one giant token
            text = "x" * rng.randint(1, 200)
        else:
            text = "".join(rng.choice(ALPHABET)
                           for _ in range(rng.randint(1, 300)))
        docs.append((i, text))
    return docs


@pytest.fixture(scope="module")
def fuzz_env(spark):
    docs = _fuzz_docs()
    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    con = duckdb.connect()
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    con.register("documents", pdf)
    return sdf, con


def _compare(sdf, con, sql, key_cols):
    srows = {tuple(r[c] for c in key_cols): r.asDict() for r in sdf.collect()}
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    orows = {}
    for row in cur.fetchall():
        d = dict(zip(cols, row))
        orows[tuple(d[c] for c in key_cols)] = d
    assert srows.keys() == orows.keys(), (
        len(srows), len(orows),
        list(srows.keys() - orows.keys())[:3],
        list(orows.keys() - srows.keys())[:3])
    for k, srow in srows.items():
        orow = orows[k]
        for c in srow:
            sv, ov = srow[c], orow[c]
            if isinstance(sv, float):
                assert ov == pytest.approx(sv, abs=1e-9), (k, c, sv, ov)
            else:
                assert sv == ov, (k, c, sv, ov)


def test_fuzz_token_and_fingerprint_oracles(fuzz_env):
    from pyrdfa3_spark.operators import textops as T
    from pyrdfa3_spark.plans import queries as Q

    sdf, con = fuzz_env
    _compare(T.token_count(sdf), con, Q.SQL_TOKEN_COUNT, ["doc_id"])
    _compare(T.bpe_token_count(sdf), con, Q._sql_bpe_token_count(),
             ["doc_id"])
    _compare(T.fingerprint(sdf), con, Q.SQL_FINGERPRINT, ["doc_id"])
    _compare(T.rolling_fingerprint(sdf), con, Q._sql_rolling_fingerprint(),
             ["doc_id"])
    _compare(T.quality_score(sdf), con, Q._sql_quality_score(), ["doc_id"])


def test_fuzz_dedup_oracles(fuzz_env):
    from pyrdfa3_spark.operators import dedup as D
    from pyrdfa3_spark.plans import queries as Q

    sdf, con = fuzz_env
    _compare(D.minhash_signatures(sdf), con, Q.SQL_MINHASH_SIGNATURES,
             ["doc_id"])
    _compare(D.simhash(sdf), con, Q._sql_simhash(), ["doc_id"])
    _compare(D.minhash_lsh_candidates(sdf), con, Q.SQL_MINHASH_LSH,
             ["doc_a", "doc_b"])
    _compare(D.exact_duplicates(sdf), con, Q.SQL_DEDUP_EXACT, ["fp"])


def test_fuzz_paragraph_dedup_oracle(fuzz_env):
    from pyrdfa3_spark.operators import curation as C
    from pyrdfa3_spark.plans import queries as Q

    sdf, con = fuzz_env
    _compare(C.paragraph_dedup(sdf, delim=" the ", min_docs=2,
                               joiner=" | "),
             con, Q.SQL_PARAGRAPH_DEDUP, ["doc_id"])


def test_fuzz_training_mix_oracles(fuzz_env):
    from pyrdfa3_spark.operators import curation as C
    from pyrdfa3_spark.plans import queries as Q

    sdf, con = fuzz_env
    _compare(C.pack_sequences(sdf, seq_len=512, n_shards=8), con,
             Q.SQL_PACK_SEQUENCES, ["doc_id"])
    _compare(C.decontaminate(sdf, sdf.filter("doc_id % 7 = 0"), n=5),
             con, Q.SQL_DECONTAMINATE, ["doc_id"])
    _compare(C.stratified_sample(
        sdf, {"short": 1.0, "medium": 0.5, "long": 0.1},
        bounds=(200, 400)), con, Q.SQL_STRATIFIED_SAMPLE, ["doc_id"])
    _compare(C.quota_mix(sdf, quota=50, bounds=(200, 400)), con,
             Q.SQL_QUOTA_MIX, ["doc_id"])


def test_fuzz_similarity_join_oracles(fuzz_env):
    """The exact prefix-filter Jaccard join and the tf-idf cosine
    join hold against their driver SQL on adversarial text (empty /
    whitespace-only docs, boilerplate clusters, giant tokens)."""
    from pyspark.sql import functions as F

    from pyrdfa3_spark.operators import dedup as D
    from pyrdfa3_spark.plans import queries as Q

    sdf, con = fuzz_env
    sl = sdf.filter(F.col("doc_id") % 10 == 0)
    _compare(D.prefix_similarity_join(sl, threshold=0.5),
             con, Q.SQL_PREFIX_SIMILARITY, ["doc_a", "doc_b"])
    _compare(D.tfidf_similarity_join(sl, threshold=0.3,
                                     max_df_frac=0.8),
             con, Q.SQL_TFIDF_SIMILARITY, ["doc_a", "doc_b"])

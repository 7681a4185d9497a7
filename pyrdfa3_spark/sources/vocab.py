"""Vocabulary dimension tables + snapshot cache (S7/S8).

The reference fetches @vocab documents over HTTP and pickles them with
Expires-driven invalidation (/root/reference/pyRdfa/rdfs/process.py:53-129,
rdfs/cache.py:226-394).  The lake-native equivalent: vocabularies are
*prefetched* into parquet snapshots by an offline job (no network in
executors, ever); the snapshot directory is the cache, keyed by vocab
IRI digest — in production this is an Iceberg table and its snapshot
log.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from pyrdfa3_spark.operators.rdfa_engine import Literal


def vocab_triples_from_turtle(spark: SparkSession, turtle_text: str,
                              base: str = "") -> DataFrame:
    """Parse a vocabulary document (turtle) into a triple DataFrame with
    the standard 6-column shape."""
    from pyrdfa3_spark.functions.turtle import parse_turtle

    rows = []
    for s, p, o in parse_turtle(turtle_text, base=base):
        if isinstance(o, Literal):
            rows.append((s, p, o.value, False, o.lang, o.datatype))
        else:
            rows.append((s, p, o, True, None, None))
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_iri boolean, "
              "obj_lang string, obj_datatype string")


def cached_vocab(spark: SparkSession, cache_dir: str, vocab_iri: str,
                 loader) -> DataFrame:
    """Snapshot cache: ``loader(vocab_iri) -> DataFrame`` runs only on a
    cache miss; afterwards the parquet snapshot serves every reader.
    Refresh = delete the snapshot (or, on Iceberg, overwrite the
    partition) and re-run."""
    key = hashlib.sha256(vocab_iri.encode()).hexdigest()[:24]
    path = os.path.join(cache_dir, f"vocab-{key}")
    if os.path.isdir(path):
        return spark.read.parquet(path)
    df = loader(vocab_iri)
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)

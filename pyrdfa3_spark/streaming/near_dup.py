"""Streaming near-duplicate detection over a document stream.

The batch dedup stack (operators/dedup.py: in-row MinHash signatures,
banded LSH buckets, capped pair generation, Jaccard verify) assumes a
closed corpus.  A live ingestion feed needs the same screening with
BOUNDED state: this module keeps the signature/banding algebra
identical (narrow in-row Column expressions — stateless, so they run
unchanged in a micro-batch plan) and replaces the all-pairs stage with
two streaming-native forms:

* :func:`near_dup_drop_stream` — signature-level dedup: one surviving
  row per full-MinHash-signature family within the event-time
  watermark, via ``dropDuplicatesWithinWatermark`` (state = one key
  per distinct signature inside the duplicate horizon, exactly like
  ``dedup_stream``'s exact-text form; catches Jaccard~1 families).
* :func:`near_dup_candidates_stream` — the LSH form: a custom
  ``applyInPandasWithState`` operator keyed by (band, bucket) whose
  state is the bucket's REPRESENTATIVE (first-seen doc).  Every later
  arrival in the bucket emits a ``(band, bucket, rep_id, doc_id)``
  candidate for downstream verification — the streaming analogue of
  the batch star-link: per-bucket output is O(arrivals), never
  O(bucket²), and state is one row per non-empty bucket, evicted by
  event-time timeout once the watermark passes it.

Per-document cost and the candidate-quality/recall trade-offs are the
batch operators' (see minhash_signatures' chunked-sha256 rationale);
a verify stage (stream-static join against the kept corpus, or a
periodic batch ``ngram_jaccard`` over the emitted pairs) confirms
candidates exactly as in ``near_dup_pipeline``.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

from pyrdfa3_spark.operators.dedup import _normalized

CANDIDATE_SCHEMA = StructType([
    StructField("band", IntegerType()),
    StructField("bucket", StringType()),
    StructField("rep_id", StringType()),
    StructField("doc_id", StringType()),
])

_STATE_SCHEMA = StructType([
    StructField("rep_id", StringType()),
    StructField("rep_ms", LongType()),
])


def stream_minhash_signatures(docs: DataFrame, k: int = 5,
                              n_hashes: int = 8,
                              keep: tuple = ("doc_id", "ts")) -> DataFrame:
    """(keep..., h0..h{n-1}): the SAME in-row signature algebra as the
    batch ``minhash_signatures`` (one sha256 per distinct shingle,
    n 32-bit chunks, one running-minimum ``aggregate``; see
    operators/dedup.py:47-82 for the independence rationale), without
    the two batch-only touches: ``_scale_out``'s ``df.rdd`` probe
    (illegal on a streaming frame — a stream's parallelism comes from
    its source splits) and the bigint doc_id cast (stream ids are
    opaque strings).  Parity with the batch function is pinned by
    tests/test_streaming.py."""
    if n_hashes > 8:
        raise ValueError("sha256 yields at most 8 independent 32-bit "
                         "chunks")

    def chunk(d, j):
        return F.conv(F.substring(d, 1 + 8 * j, 8), 16, 10).cast("bigint")

    n = F.length(F.col("norm"))
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    sharr = F.array_distinct(
        F.transform(idx, lambda i: F.col("norm").substr(i, F.lit(k))))
    init = F.array(*[F.lit(1 << 33).cast("bigint")] * n_hashes)
    digs = F.transform(F.col("sharr"), lambda s: F.sha2(s, 256))
    sig = F.aggregate(
        F.col("dig"), init,
        lambda acc, d: F.zip_with(
            acc, F.array(*[chunk(d, j) for j in range(n_hashes)]),
            lambda a, b: F.least(a, b)))
    return (docs
            .select(*keep, _normalized().alias("norm"))
            .select(*keep, sharr.alias("sharr"))
            .select(*keep, digs.alias("dig"))
            .select(*keep, sig.alias("sig"))
            .select(*keep, *[F.element_at("sig", j + 1).alias(f"h{j}")
                             for j in range(n_hashes)]))


def stream_band_members(docs: DataFrame, k: int = 5, n_hashes: int = 8,
                        bands: int = 4) -> DataFrame:
    """(doc_id, ts, band, bucket) band-membership rows — the streaming
    twin of the batch ``_band_buckets`` (same md5-over-chunk bucketing,
    so a stream-vs-corpus join on (band, bucket) is well-defined)."""
    rows_per_band = n_hashes // bands
    sig = stream_minhash_signatures(docs, k, n_hashes)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"h{b * rows_per_band + r}")
                 for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"),
                     F.md5(F.concat_ws("|", *parts)).alias("bucket")))
    return (sig.select("doc_id", "ts",
                       F.explode(F.array(*band_cols)).alias("bb"))
            .select("doc_id", "ts", "bb.band", "bb.bucket"))


def near_dup_drop_stream(docs: DataFrame,
                         watermark: str = "30 minutes",
                         k: int = 5, n_hashes: int = 8) -> DataFrame:
    """Signature-level streaming dedup: the first document per full
    MinHash signature inside the watermark horizon survives, identical
    and near-identical (Jaccard~1) later arrivals drop.  State is one
    entry per distinct signature within the horizon —
    ``dropDuplicatesWithinWatermark`` evicts the rest, so state tracks
    the duplicate horizon, not stream lifetime."""
    sig = stream_minhash_signatures(docs, k, n_hashes)
    fp = F.md5(F.concat_ws("|", *[f"h{j}" for j in range(n_hashes)]))
    return (sig
            .withColumn("sig_fp", fp)
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["sig_fp"]))


def _make_bucket_fn(horizon_ms: int):
    def fn(key: Tuple[Any, ...], batches: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        band, bucket = key
        if state.hasTimedOut:
            state.remove()
            return
        rows = []
        for pdf in batches:
            rows.extend(zip((str(v) for v in pdf["doc_id"]),
                            (int(v) for v in pdf["ms"])))
        rows.sort(key=lambda r: (r[1], r[0]))  # event-time order
        if state.exists:
            rep_id, rep_ms = state.get
        else:
            (rep_id, rep_ms), rows = rows[0], rows[1:]
        out = [(int(band), str(bucket), rep_id, doc_id)
               for doc_id, _ms in rows if doc_id != rep_id]
        last_ms = max([rep_ms] + [ms for _d, ms in rows])
        state.update((rep_id, rep_ms))
        # evict the representative once the watermark passes the
        # horizon beyond the bucket's last activity
        state.setTimeoutTimestamp(last_ms + horizon_ms)
        if out:
            yield pd.DataFrame(
                out, columns=["band", "bucket", "rep_id", "doc_id"])

    return fn


def near_dup_candidates_stream(docs: DataFrame,
                               watermark: str = "30 minutes",
                               horizon_ms: int = 30 * 60 * 1000,
                               k: int = 5, n_hashes: int = 8,
                               bands: int = 4) -> DataFrame:
    """docs stream (doc_id, text, ts) -> LSH candidate stream
    ``(band, bucket, rep_id, doc_id)``: each non-empty (band, bucket)
    keeps its first-seen document as the representative in the state
    store and emits one candidate row per later arrival — downstream
    verification (exact Jaccard against ``rep_id``) confirms, exactly
    like the batch ``near_dup_pipeline``'s verify stage.  State is one
    row per active bucket, evicted by event-time timeout ``horizon_ms``
    after the bucket's last arrival."""
    # ts stays in the grouped frame: the event-time watermark that
    # drives EventTimeTimeout tracks the watermark column itself
    members = (stream_band_members(docs, k, n_hashes, bands)
               .withWatermark("ts", watermark)
               .select("band", "bucket", "doc_id", "ts",
                       F.unix_millis(F.col("ts").cast("timestamp_ltz"))
                       .alias("ms")))
    return (members.groupBy("band", "bucket")
            .applyInPandasWithState(
                _make_bucket_fn(horizon_ms),
                outputStructType=CANDIDATE_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))

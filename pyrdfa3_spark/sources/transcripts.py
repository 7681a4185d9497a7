"""Synthetic ``transcripts`` sources (input_hint schema).

Two generators, both deterministic and fully columnar (no per-row
Python, no RNG — everything is arithmetic on ``spark.range`` ids, so the
same logical row set is produced at any parallelism):

* :func:`synth_transcripts` — FIXTURES.md §1 corpus with the conv-000000
  skew fixture; scales from pytest (~2k turns) to bench (~400k turns).
* :func:`transcripts_from_documents` — derives a transcript table from
  the driver's ``documents.parquet`` so ``__spark_entry__.entry`` runs on
  driver-provided data.

Schema: conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyrdfa3_spark.sources.fragments import (
    FRAGMENT_TEMPLATES,
    N_TEMPLATES,
    PROSE_AFTER,
    PROSE_BEFORE,
)

_EPOCH_2026 = 1767225600  # 2026-01-01T00:00:00Z


def _fragment_col(tpl_key_col, k_col):
    """Columnar fragment rendering: template chosen by ``tpl_key_col``
    (must enumerate carriers densely so every template appears),
    parameterized by ``k_col``, wrapped in prose noise."""
    tpl = F.element_at(
        F.array(*[F.lit(t) for _, t in FRAGMENT_TEMPLATES]),
        (tpl_key_col % N_TEMPLATES).cast("int") + 1,
    )
    k_str = k_col.cast("string")
    body = F.regexp_replace(
        F.regexp_replace(tpl, "\\{K\\}", k_str),
        "\\{X\\}", (k_col % 10).cast("string"),
    )
    before = F.element_at(
        F.array(*[F.lit(p) for p in PROSE_BEFORE]),
        (tpl_key_col % len(PROSE_BEFORE)).cast("int") + 1)
    after = F.element_at(
        F.array(*[F.lit(p) for p in PROSE_AFTER]),
        ((tpl_key_col + 1) % len(PROSE_AFTER)).cast("int") + 1)
    return F.concat(before, body, after)


def synth_transcripts(spark: SparkSession, n_conv: int = 200,
                      turns_per_conv: int = 10,
                      skew_factor: int = 100,
                      partitions: int | None = None) -> DataFrame:
    """Deterministic transcript corpus (FIXTURES.md §1).

    conv-000000 receives ``skew_factor``× the normal turn count — the
    skew fixture for AQE skew-join / salting checks.  ~30% of turns
    carry exactly one markup fragment ("browser" tool turns).
    """
    n_base = n_conv * turns_per_conv
    n_extra = (skew_factor - 1) * turns_per_conv
    df = spark.range(0, n_base + n_extra,
                     numPartitions=partitions or spark.sparkContext.defaultParallelism)
    is_extra = F.col("id") >= n_base
    conv_num = F.when(is_extra, F.lit(0)).otherwise(
        (F.col("id") / turns_per_conv).cast("long"))
    turn_idx = F.when(
        is_extra, (F.col("id") - n_base + turns_per_conv).cast("int")
    ).otherwise((F.col("id") % turns_per_conv).cast("int"))
    carrier = (F.col("id") % 10) < 3
    # dense ordinal over carrier turns so the template round-robin covers
    # the whole corpus (carriers are ids with id%10 in {0,1,2})
    carrier_seq = (F.col("id") / 10).cast("long") * 3 + (F.col("id") % 10)
    text = F.when(
        carrier, _fragment_col(carrier_seq, F.col("id"))
    ).otherwise(
        F.concat(F.lit("Plain prose turn number "),
                 F.col("id").cast("string"),
                 F.lit(" with no markup, 1 < 2 and a&b."))
    )
    return df.select(
        F.format_string("conv-%06d", conv_num).alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.element_at(F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
                     (F.col("id") % 3).cast("int") + 1).alias("role"),
        text.alias("text"),
        F.when(carrier, F.lit("browser")).otherwise(F.lit("")).alias("tool"),
        F.timestamp_seconds(F.lit(_EPOCH_2026) + F.col("id") * 7).alias("ts"),
    )


def transcripts_from_documents(spark: SparkSession, sf_dir: str,
                               convs: int = 50) -> DataFrame:
    """Derive a transcripts table from the driver-generated ``documents``
    parquet: document text becomes prose turns; every third document is
    a "browser" turn carrying a deterministic RDFa fragment keyed by
    doc_id.  Angle brackets in the source prose are stripped so the
    fragment is the only markup in the turn."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    doc_id = F.col("doc_id").cast("long")
    prose = F.regexp_replace(F.substring(F.col("text"), 1, 160), "[<>]", " ")
    carrier = (doc_id % 3) == 0
    text = F.when(carrier,
                  F.concat(prose, F.lit(" "),
                           _fragment_col((doc_id / 3).cast("long"), doc_id))
                  ).otherwise(prose)
    return docs.select(
        F.format_string("conv-%06d", doc_id % convs).alias("conv_id"),
        (doc_id / convs).cast("int").alias("turn_idx"),
        F.element_at(F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
                     (doc_id % 3).cast("int") + 1).alias("role"),
        text.alias("text"),
        F.when(carrier, F.lit("browser")).otherwise(F.lit("")).alias("tool"),
        F.timestamp_seconds(F.lit(_EPOCH_2026) + doc_id * 7).alias("ts"),
    )

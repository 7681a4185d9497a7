"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship KG-construction pipeline (transcripts ->
RDFa triples) on sf0.001; ``queries``/``oracle_sql`` expose every
implemented operator from SURVEY.md §2 plus the training-data operators,
with DuckDB-checkable ANSI-SQL oracles for all SQL-expressible ones.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: extract (subj, pred, obj) triples from RDFa
    fragments embedded in transcript turns derived from the sf0.001
    documents table."""
    from pyrdfa3_spark.plans.extract import extract_triples
    from pyrdfa3_spark.sources.transcripts import transcripts_from_documents

    transcripts = transcripts_from_documents(spark, "/root/testdata/sf0.001")
    return extract_triples(transcripts)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pyrdfa3_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pyrdfa3_spark.plans.queries import oracles

    return oracles()

"""SparkSession factory with the scale-posture defaults.

Every knob here is chosen for the 1000-executor / 100 TB target and
merely *tested* on local[N]:

* AQE on (runtime re-planning, skew-join splitting) — required by the
  north rule;
* Arrow transfer for pandas UDFs with a bounded batch size so a batch
  of fat transcript turns cannot blow executor memory;
* shuffle partitions sized for the local harness; production submits
  override via ``spark-submit --conf`` (documented in bench.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(master: str | None = None, app_name: str = "pyrdfa3_spark",
                  shuffle_partitions: int | None = None,
                  max_partition_bytes: int | None = None) -> SparkSession:
    """``max_partition_bytes`` sets ``spark.sql.files.maxPartitionBytes``
    explicitly.  The LIBRARY default is Spark's own (128 MB — right for
    real many-file lake tables); the local test/bench harnesses pass
    8 MB because their corpora are single parquet FILES (TESTDATA.md
    layout) where a sub-128 MB table would otherwise scan as ONE task
    regardless of core count (measured: sf0.1 suite 9.14 -> 8.48 s).
    ``SPARK_GRAFT_MAX_PARTITION_BYTES`` overrides either choice."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 20k beats the 10k default by ~9% on the extraction UDF
        # (fewer Python worker round-trips per task) and 60k+ loses it
        # again (batch skew + per-batch list growth) — swept at 400k
        # turns on a quiet 32-core host, best-of-5 per size
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    mpb = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES",
                         max_partition_bytes)
    if mpb is not None:
        builder = builder.config("spark.sql.files.maxPartitionBytes",
                                 str(mpb))
    return builder.getOrCreate()

"""Join strategies for canonicalization at scale (north-star items).

The engine resolves CURIEs in-UDF against the initial-context map; this
module is the *table-driven* path for corpus-level canonicalization
against external prefix/vocab dimension tables:

* :func:`resolve_curies` — broadcast-hash lookup of CURIE prefixes
  (the dim is KBs; Catalyst plans a BroadcastHashJoin, no shuffle);
* :func:`salted_join` — explicit key-salting for the shuffle-join case
  (dim too big to broadcast, hot keys like the 80%%-``schema:`` fixture):
  the big side gets a deterministic salt, the small side is replicated
  across all salts, so one hot key spreads over ``n_salt`` reducers.
  AQE skew-join handles this adaptively too (enabled session-wide);
  explicit salting is for engines/paths where AQE cannot see the skew
  (e.g. writes bucketed by the join key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_curies(df: DataFrame, curie_col: str,
                   prefix_dim: DataFrame,
                   out_col: str = "iri") -> DataFrame:
    """Resolve a CURIE column against a ``prefixes(prefix, iri)`` dim.

    Unknown prefixes / non-CURIEs yield NULL (callers route them to the
    absolute-IRI fallback, mirroring R3->R7 resolution order).
    """
    c = F.col(curie_col)
    has_colon = F.instr(c, ":") > 0
    prefix = F.when(has_colon, F.lower(F.substring_index(c, ":", 1)))
    reference = F.when(has_colon,
                       F.expr(f"substr({curie_col}, "
                              f"instr({curie_col}, ':') + 1)"))
    with_parts = df.withColumn("_prefix", prefix) \
                   .withColumn("_reference", reference)
    dim = F.broadcast(prefix_dim.select(
        F.lower(F.col("prefix")).alias("_prefix"),
        F.col("iri").alias("_ns")))
    return (with_parts.join(dim, "_prefix", "left")
            .withColumn(out_col,
                        F.when(F.col("_ns").isNotNull(),
                               F.concat(F.col("_ns"), F.col("_reference"))))
            .drop("_prefix", "_reference", "_ns"))


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salt: int = 8, how: str = "inner") -> DataFrame:
    """Shuffle join with explicit hot-key salting.

    The big side salts deterministically on a hash of the whole row (so
    the same logical row always lands on the same salt — reruns are
    stable); the small side is exploded across all ``n_salt`` values.
    Shuffle key becomes (key, salt): a key carrying N% of rows spreads
    over n_salt reducers instead of one.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]),
                  F.lit(n_salt)).alias("_salt")
    big_s = big.select("*", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    return big_s.join(small_s, [key, "_salt"], how).drop("_salt")


def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list[str] | None = None,
              prefix: str = "asof_",
              tolerance_ms: int | None = None) -> DataFrame:
    """Point-in-time (as-of) join: for every left row, the latest right
    row with ``right_ts <= left_ts`` on the same key — the standard
    enrichment for event streams (attach the last known state/price/
    error to each observation) that Spark has no native operator for.

    Implemented with the union+window technique, NOT a range join: both
    sides are tagged and unioned, one window per key orders by
    (ts, side) with right rows sorting first at equal timestamps
    (at-or-before semantics), and ``last(..., ignorenulls)`` carries the
    most recent right payload forward onto each left row.  Cost is ONE
    shuffle on the key — identical to the equi-join — with no
    quadratic per-key pair generation and no range-join interval
    explosion; AQE handles moderate key skew.  (A key so hot its whole
    history exceeds one task's memory needs time-bucketed pre-ordering;
    at that point the right side is usually pre-aggregated anyway.)

    ``right_cols`` (default: every right column that is neither key nor
    timestamp) come back prefixed with ``prefix``; ``prefix +
    "staleness_ms"`` carries left_ts - matched right_ts in ms (NULL
    when no match).  With ``tolerance_ms``, matches older than the
    tolerance are nulled out.

    Exact (key, right_ts) duplicates are tie-broken arbitrarily —
    pre-aggregate the right side to one row per (key, ts) when that
    matters (the oracle-checked query does).
    """
    from pyspark.sql import Window

    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in keys and c != right_ts]
    out_cols = [prefix + c for c in right_cols]

    ms = ("_asof_ms", "_asof_side", "_asof_rts")
    left_pay = [c for c in left.columns if c not in keys]
    r = right.select(
        *keys,
        F.unix_millis(F.col(right_ts).cast("timestamp_ltz")).alias(ms[0]),
        F.lit(0).alias(ms[1]),
        F.unix_millis(F.col(right_ts).cast("timestamp_ltz")).alias(ms[2]),
        *[F.col(c).alias(p) for c, p in zip(right_cols, out_cols)],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_pay])
    l = left.select(
        *keys,
        F.unix_millis(F.col(left_ts).cast("timestamp_ltz")).alias(ms[0]),
        F.lit(1).alias(ms[1]),
        F.lit(None).cast("bigint").alias(ms[2]),
        *[F.lit(None).cast(r.schema[p].dataType).alias(p)
          for p in out_cols],
        *left_pay)
    u = r.unionByName(l)

    w = (Window.partitionBy(*keys).orderBy(ms[0], ms[1])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = u.select(
        *keys, ms[0], ms[1],
        F.last(ms[2], ignorenulls=True).over(w).alias(ms[2]),
        *[F.last(p, ignorenulls=True).over(w).alias(p) for p in out_cols],
        *left_pay)
    out = filled.filter(F.col(ms[1]) == 1)
    stale = (F.col(ms[0]) - F.col(ms[2]))
    if tolerance_ms is not None:
        in_tol = stale <= F.lit(tolerance_ms)
        out = out.select(
            *keys, ms[0], ms[2],
            *[F.when(in_tol, F.col(p)).alias(p) for p in out_cols],
            *left_pay,
            F.when(in_tol, stale).alias(prefix + "staleness_ms"))
    else:
        out = out.withColumn(prefix + "staleness_ms", stale)
    return out.drop(ms[0], ms[1], ms[2])


def interval_join(points: DataFrame, intervals: DataFrame,
                  point_ts: str = "ts",
                  start_col: str = "start", end_col: str = "end",
                  on: str | list[str] | None = None,
                  bucket_ms: int = 3_600_000,
                  max_buckets_per_interval: int = 10_000) -> DataFrame:
    """Point-in-interval join: every (point, interval) pair with
    ``start <= ts < end`` (optionally also matching key columns
    ``on``) — the range-join shape Spark compiles to a broadcast
    nested loop (or a cartesian product) if written as a theta join,
    which is exactly the plan that dies at corpus scale.

    Scale shape: time is tiled into ``bucket_ms`` buckets; every
    interval EXPLODES to the buckets it covers (bounded fan-out — an
    interval covering more than ``max_buckets_per_interval`` buckets
    raises: pick a coarser ``bucket_ms`` rather than silently
    materializing unbounded rows), every point maps to its single
    bucket, and the match becomes one EQUI-join on (bucket[, keys])
    followed by the exact boundary filter.  One shuffle, hash-
    partitioned, AQE-skew-splittable — no nested loop anywhere.
    The per-interval fan-out trades |interval|/bucket_ms duplicate
    interval rows for join locality; size ``bucket_ms`` near the
    TYPICAL interval length so the fan-out stays O(1) per interval.

    Returns the point columns + the interval columns (whose names
    must not collide — rename upstream).
    """
    keys = ([on] if isinstance(on, str) else list(on or []))
    pms = F.unix_millis(F.col(point_ts).cast("timestamp_ltz"))
    sms = F.unix_millis(F.col(start_col).cast("timestamp_ltz"))
    ems = F.unix_millis(F.col(end_col).cast("timestamp_ltz"))

    p = points.withColumn("_ij_ms", pms) \
              .withColumn("_ij_bucket", F.floor(F.col("_ij_ms")
                                                / bucket_ms))
    start_b = F.floor(F.col("_ij_s") / bucket_ms)
    end_b = F.floor((F.col("_ij_e") - 1) / bucket_ms)
    # the guard rides INSIDE the evaluated sequence bound — a separate
    # audit column would be pruned unevaluated by Catalyst
    guarded_end = F.when(
        end_b - start_b + 1 > max_buckets_per_interval,
        F.raise_error(F.lit(
            "interval_join: an interval spans more than "
            f"{max_buckets_per_interval} buckets of {bucket_ms} ms — "
            "raise bucket_ms (silently exploding it would be the "
            "scale bug)"))).otherwise(end_b)
    iv = (intervals
          .withColumn("_ij_s", sms).withColumn("_ij_e", ems)
          .filter(F.col("_ij_e") > F.col("_ij_s"))
          .withColumn("_ij_bucket",
                      F.explode(F.sequence(start_b, guarded_end))))
    out = (p.join(iv, ["_ij_bucket", *keys])
           .filter((F.col("_ij_ms") >= F.col("_ij_s"))
                   & (F.col("_ij_ms") < F.col("_ij_e")))
           .drop("_ij_bucket", "_ij_ms", "_ij_s", "_ij_e"))
    return out

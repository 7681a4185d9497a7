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

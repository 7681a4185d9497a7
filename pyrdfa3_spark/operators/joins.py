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

"""Mergeable frequency/cardinality sketches in pure column algebra.

The reference materializes exact rdflib Graphs, so it never needs
sketches; at 100 TB the telemetry questions a lake pipeline asks
("how many distinct tokens per source?", "roughly how often does
this n-gram occur?") are answered with bounded-memory sketches whose
partial aggregates merge map-side.  Both sketches here are
DETERMINISTIC — bucket assignment and register updates derive from
md5, no RNG — so results are reproducible run-to-run and a DuckDB
oracle can replay them bit-for-bit (the module's cross-engine
discipline: every accumulation is integer-exact; ``ln`` rounds at
9 dp).

* :func:`cms_build` / :func:`cms_estimate` — count-min sketch
  (Cormode & Muthukrishnan 2005): d hash rows x w buckets of
  integer counters; point estimate = min over rows.  Always an
  UPPER bound on the true count; collisions only inflate.
* :func:`hll_distinct` — HyperLogLog (Flajolet et al. 2007) with
  the standard small-range linear-counting correction.  Registers
  are hex-aligned (precision p a multiple of 4) so the
  leading-zero rank is computed with string operations both
  engines share.

Scale shape: both sketches are one partially-aggregated groupBy over
an in-row explode of d (CMS) or 1 (HLL) rows per item — counters
collapse map-side, the reduced state is d*w (CMS) resp. m=2^p (HLL)
rows per group, and estimates are column expressions over that tiny
frame.  No windows, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _chunk_mod(h, j: int, w: int):
    """Row-j bucket: md5 hex chunk j (8 chars = 32 bits) mod w."""
    return (F.conv(F.substring(h, 1 + 8 * j, 8), 16, 10)
            .cast("bigint") % w)


def cms_build(items: DataFrame, key_col: str = "key",
              weight_col: str | None = None,
              d: int = 4, w: int = 1024) -> DataFrame:
    """Build a count-min sketch over ``items[key_col]`` (optionally
    weighted): returns the (r, bucket, c) counter table, at most
    ``d * w`` rows regardless of input size.  ``d <= 4`` — the four
    independent 32-bit chunks of one md5 per key (same
    one-digest-many-hashes trick as ``minhash_signatures``)."""
    if d > 4:
        raise ValueError("md5 yields at most 4 independent 32-bit chunks")
    h = F.md5(F.col(key_col))
    rows = F.array(*[
        F.struct(F.lit(j).alias("r"), _chunk_mod(h, j, w).alias("bucket"))
        for j in range(d)])
    wt = (F.col(weight_col) if weight_col else F.lit(1)).cast("bigint")
    return (items
            .select(F.explode(rows).alias("rb"), wt.alias("wt"))
            .groupBy(F.col("rb.r").alias("r"),
                     F.col("rb.bucket").alias("bucket"))
            .agg(F.sum("wt").alias("c")))


def cms_estimate(sketch: DataFrame, probes: DataFrame,
                 key_col: str = "key",
                 d: int = 4, w: int = 1024) -> DataFrame:
    """Point-query the sketch for every probe key: (key, est) where
    ``est = min over rows r of counter[r, bucket_r(key)]`` — the
    count-min upper bound (0 when some row never saw the bucket).
    ``d``/``w`` must match the build.  The sketch side is at most
    ``d*w`` rows -> broadcast; probes stream."""
    if d > 4:
        raise ValueError("md5 yields at most 4 independent 32-bit chunks")
    h = F.md5(F.col(key_col))
    rows = F.array(*[
        F.struct(F.lit(j).alias("r"), _chunk_mod(h, j, w).alias("bucket"))
        for j in range(d)])
    pb = (probes.select(F.col(key_col).alias("key"))
          .dropDuplicates()
          .select("key", F.explode(rows).alias("rb"))
          .select("key", F.col("rb.r").alias("r"),
                  F.col("rb.bucket").alias("bucket")))
    return (pb.join(F.broadcast(sketch), ["r", "bucket"], "left")
            .groupBy("key")
            .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est")))


# alpha_m bias constants (Flajolet et al. 2007, Fig. 3)
def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_distinct(items: DataFrame, group_cols: list[str],
                 key_col: str = "key", p: int = 4) -> DataFrame:
    """Approximate per-group distinct count of ``key_col`` via
    HyperLogLog with ``m = 2**p`` registers (standard error
    ~1.04/sqrt(m)); the exact-count trade-in is one bounded-size
    state row per (group, register) instead of one per distinct key.

    ``p`` must be a multiple of 4: the 60-bit hash (15 md5 hex
    chars) splits hex-aligned into a p-bit register index and a
    (60-p)-bit rank field, so the leading-zero rank is pure string
    arithmetic — identical in Spark and DuckDB, no float log2.
    Estimates are reproducible bit-for-bit: register harmonic sums
    run over exact INTEGERS (terms scaled by 2^(60-p)), the
    small-range linear-counting branch rounds its ``ln`` at 9 dp,
    and the final estimate rounds at 4.
    """
    return hll_estimate(hll_registers(items, group_cols, key_col, p),
                        group_cols, p)


def _check_p(p: int) -> None:
    if p % 4 != 0 or not 4 <= p <= 12:
        raise ValueError("p must be 4, 8, or 12 (hex-aligned registers)")


def hll_registers(items: DataFrame, group_cols: list[str],
                  key_col: str = "key", p: int = 4) -> DataFrame:
    """The HLL register state (group, bucket, reg) — the MERGEABLE
    half of :func:`hll_distinct`: persist this per ingest batch /
    partition and :func:`hll_union` folds states together without
    revisiting the data (register-wise max is associative,
    commutative, idempotent — exactly-once not required)."""
    _check_p(p)
    bucket_chars = p // 4
    field_chars = 15 - bucket_chars
    field_bits = 4 * field_chars
    h = F.md5(F.col(key_col))
    bucket = F.conv(F.substring(h, 1, bucket_chars), 16, 10).cast("bigint")
    field = F.substring(h, 1 + bucket_chars, field_chars)
    # leading-zero rank: 4 bits per leading '0' hex char, plus the
    # first non-zero digit's own leading zeros (8-f: 0, 4-7: 1,
    # 2-3: 2, 1: 3); all-zero field -> rank = field_bits + 1
    stripped = F.expr("trim(LEADING '0' FROM field)")
    zchars = field_chars - F.length(stripped)
    first = F.substring(stripped, 1, 1)
    extra = (F.when(first.isin("8", "9", "a", "b", "c", "d", "e", "f"), 0)
             .when(first.isin("4", "5", "6", "7"), 1)
             .when(first.isin("2", "3"), 2)
             .otherwise(3))
    rho = (F.when(F.length(stripped) == 0, F.lit(field_bits + 1))
           .otherwise(4 * zchars + extra + 1)).cast("int")
    return (items
            .select(*group_cols, bucket.alias("bucket"),
                    field.alias("field"))
            .select(*group_cols, "bucket", rho.alias("rho"))
            .groupBy(*group_cols, "bucket")
            .agg(F.max("rho").alias("reg")))


def hll_union(*register_frames: DataFrame) -> DataFrame:
    """Merge HLL register states (same p): register-wise max.  The
    union of sketches estimates the union of the underlying key sets
    EXACTLY as if built in one pass — the property that makes HLL the
    right distinct-count state for incremental ingest."""
    if not register_frames:
        raise ValueError("hll_union needs at least one register frame")
    merged = register_frames[0]
    for rf in register_frames[1:]:
        merged = merged.unionByName(rf)
    keys = [c for c in merged.columns if c not in ("reg",)]
    return merged.groupBy(*keys).agg(F.max("reg").alias("reg"))


def hll_estimate(regs: DataFrame, group_cols: list[str],
                 p: int = 4) -> DataFrame:
    """Estimate per-group cardinality from register state (the
    read-side half of :func:`hll_distinct`)."""
    _check_p(p)
    m = 2 ** p
    field_bits = 4 * (15 - p // 4)
    # harmonic sum over exact integers: sum(2^-reg) scaled by
    # 2^(field_bits+1) — the +1 makes the SATURATED register
    # (reg = field_bits + 1, the all-zero rank field hll_registers
    # legitimately emits) an exact integer term of 1 instead of a
    # negative shift (JVM shiftleft masks the count, which would
    # poison the sum); unseen registers contribute 2^0 = full scale
    term = F.expr(
        f"shiftleft(cast(1 as bigint), {field_bits + 1} - reg)")
    per_group = (regs.groupBy(*group_cols)
                 .agg(F.sum(term).alias("seen_sum"),
                      F.count(F.lit(1)).alias("n_regs")))
    scale = float(2 ** (field_bits + 1))
    zeros = F.lit(m) - F.col("n_regs")
    # coalesce: a group with zero observed registers (empty input
    # slice) must estimate 0.0, not NULL
    denom = (F.coalesce(F.col("seen_sum"), F.lit(0)).cast("double")
             + zeros * scale)
    raw = F.lit(_alpha(m) * m * m * scale) / denom
    lin = F.lit(float(m)) * F.round(F.log(F.lit(float(m)) /
                                          zeros.cast("double")), 9)
    est = F.when((raw <= 2.5 * m) & (zeros > 0), lin).otherwise(raw)
    return per_group.select(*group_cols, F.round(est, 4).alias("est"))

"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk` — brute-force baseline, pure Column algebra
  (``zip_with`` + ``aggregate``), exact.
* :func:`lsh_cosine_candidates` — random-hyperplane LSH scale path: the
  all-pairs join is replaced by a bucket join; planes are deterministic
  (seeded arithmetic, no RNG) so results are reproducible and the SQL
  oracle can mirror them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(embeddings: DataFrame, query_ids: list[int],
                top_k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbours for the given query vec_ids.

    Scale shape: the query side is tiny -> broadcast; the corpus side
    streams once; ranking is a per-query window top-k (partial top-k
    happens map-side via the rank filter under AQE).
    """
    from pyspark.sql import Window

    embeddings = embeddings.withColumn(
        "embedding", F.col("embedding").cast("array<double>"))
    q = (embeddings
         .filter(F.col("vec_id").isin([int(i) for i in query_ids]))
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("q_emb")))
    pairs = (embeddings.crossJoin(F.broadcast(q))
             .filter(F.col("vec_id") != F.col("query_id")))
    scored = pairs.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.round(_dot(F.col("q_emb"), F.col("embedding"))
                / (_norm(F.col("q_emb")) * _norm(F.col("embedding"))),
                4).alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("query_id", "vec_id", "cos_sim",
                    F.col("rank").cast("bigint").alias("rank")))


def plane_values(dim: int, p: int) -> list[float]:
    """Deterministic pseudo-random hyperplane p: component i is
    sin(1 + i + dim * p), precomputed in Python and inlined as literals
    so Spark and the SQL oracle use bit-identical constants."""
    import math

    return [math.sin(1 + i + dim * p) for i in range(dim)]


def _plane(dim: int, p: int):
    return F.array(*[F.lit(v) for v in plane_values(dim, p)])


def lsh_bucket(embeddings: DataFrame, dim: int = 64,
               n_planes: int = 8) -> DataFrame:
    """Random-hyperplane signature: bit p = (v . plane_p) >= 0.
    Output: vec_id, bucket (bigint 0..2^n_planes-1)."""
    embeddings = embeddings.withColumn(
        "embedding", F.col("embedding").cast("array<double>"))
    sig = F.lit(0).cast("bigint")
    for p in range(n_planes):
        bit = (_dot(F.col("embedding"), _plane(dim, p)) >= 0)
        sig = sig + F.when(bit, F.lit(2 ** p).cast("bigint")).otherwise(0)
    return embeddings.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        sig.alias("bucket"))


def lsh_cosine_candidates(embeddings: DataFrame, dim: int = 64,
                          n_planes: int = 8) -> DataFrame:
    """ANN candidate pairs: vectors sharing an LSH bucket
    (doc_a < doc_b).  The join key is the bucket — shuffle is O(corpus),
    never O(corpus^2)."""
    b = lsh_bucket(embeddings, dim, n_planes)
    left = b.alias("l")
    right = b.alias("r")
    return (left.join(right, (F.col("l.bucket") == F.col("r.bucket"))
                      & (F.col("l.vec_id") < F.col("r.vec_id")))
            .select(F.col("l.vec_id").alias("vec_a"),
                    F.col("r.vec_id").alias("vec_b"),
                    F.col("l.bucket").alias("bucket")))

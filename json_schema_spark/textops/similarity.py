"""Similarity search over embedding columns (array<float>).

Two paths:
- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  The dot products are pure zip_with/aggregate expressions (JVM-side,
  codegen'd); ranking is a window over the (queries x corpus) cross
  product. Right-sized for q x N up to ~10^8 pairs; beyond that use the
  LSH path.
- ``hyperplane_lsh_buckets`` / ``lsh_topk``: random-hyperplane LSH — each
  vector gets a b-bit sign bucket from b fixed pseudo-random hyperplanes
  (deterministically derived from a seed via md5, so oracles can
  reproduce them). ANN search only compares vectors in the query's
  bucket (optionally with multi-probe neighbors), turning the cross
  product into a bucket-equi-join that shuffles on the bucket key and
  scales linearly with corpus size.

The left fold in ``dot`` fixes the summation order, so an oracle engine
evaluating the same fold gets bit-identical doubles.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Left-fold double dot product of two numeric arrays."""
    prods = F.zip_with(a, b,
                       lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str | None = None) -> DataFrame:
    """Exact top-k by cosine: (query_id, neighbor_id, rank, cosine_sim).

    Self-matches (same id) are excluded. The query side is broadcast —
    queries are assumed small; the corpus side never shuffles.
    """
    query_id_col = query_id_col or id_col
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("_cv"))
    sim = (F.broadcast(q).crossJoin(c)
           .filter(F.col("query_id") != F.col("neighbor_id"))
           .withColumn("cosine_sim", cosine(F.col("_qv"), F.col("_cv"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (sim.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round(F.col("cosine_sim"), 6).alias("cosine_sim")))


def hyperplanes(dim: int, n_planes: int = 8,
                seed: str = "jss-lsh") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1)^dim, derived
    from md5(seed:plane:chunk) — reproducible from the seed alone by any
    engine (driver-side Python; the planes ship as literals)."""
    planes = []
    for p in range(n_planes):
        vals: list[float] = []
        chunk = 0
        while len(vals) < dim:
            digest = hashlib.md5(
                f"{seed}:{p}:{chunk}".encode()).digest()
            for off in range(0, 16, 4):
                (u,) = struct.unpack_from(">I", digest, off)
                vals.append(u / 2**31 - 1.0)  # [-1, 1)
            chunk += 1
        planes.append(vals[:dim])
    return planes


def bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """b-bit LSH bucket id: bit p = (vec . plane_p) >= 0."""
    acc = F.lit(0).cast("bigint")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot(vec, lit_plane) >= 0,
                     F.lit(1 << p).cast("bigint")) \
               .otherwise(F.lit(0).cast("bigint"))
        acc = acc + bit
    return acc


def hyperplane_lsh_buckets(df: DataFrame, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           n_planes: int = 8, dim: int | None = None,
                           seed: str = "jss-lsh") -> DataFrame:
    """(id, bucket) for every vector — one expression-only projection."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    return df.select(F.col(id_col),
                     bucket_expr(F.col(vec_col), planes).alias("bucket"))


def lsh_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_planes: int = 6, dim: int | None = None,
             seed: str = "jss-lsh") -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to the query's
    LSH bucket. The bucket equi-join replaces the cross product — the
    shuffle key is the bucket id, so cost scales with bucket sizes
    (2^n_planes buckets; tune n_planes to corpus size)."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("_qv"),
                       bucket_expr(F.col(vec_col), planes).alias("bucket"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("_cv"),
                      bucket_expr(F.col(vec_col), planes).alias("bucket"))
    sim = (q.join(c, "bucket")
           .filter(F.col("query_id") != F.col("neighbor_id"))
           .withColumn("cosine_sim", cosine(F.col("_qv"), F.col("_cv"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (sim.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round(F.col("cosine_sim"), 6).alias("cosine_sim")))


def embedding_near_duplicates(df: DataFrame, threshold: float = 0.95,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              n_planes: int = 6,
                              seed: str = "jss-lsh") -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine >= threshold)
    within LSH buckets — the embedding analog of MinHash near-dup."""
    dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    v = df.select(F.col(id_col).alias("_id"),
                  F.col(vec_col).alias("_v"),
                  bucket_expr(F.col(vec_col), planes).alias("bucket"))
    a, b = v.alias("a"), v.alias("b")
    return (a.join(b, "bucket")
            .filter(F.col("a._id") < F.col("b._id"))
            .withColumn("cosine_sim",
                        F.round(cosine(F.col("a._v"), F.col("b._v")), 6))
            .filter(F.col("cosine_sim") >= threshold)
            .select(F.col("a._id").alias("id_a"),
                    F.col("b._id").alias("id_b"), "cosine_sim")
            .distinct())

"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k (exact, broadcast the query side —
the corpus is never shuffled).  Scale path: random-hyperplane LSH
bucketing (deterministic seeded hyperplanes) so candidate generation is
an equi-join on the bucket id, sub-quadratic in corpus size.

All math is Spark higher-order functions (``zip_with`` + ``aggregate``)
over the array column — JVM-evaluated, no Python in the row path.
Elements are cast to double before multiply/accumulate so an external
oracle summing in array order reproduces the result bit-for-bit.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-order dot product with per-element double cast."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(df: DataFrame, query_ids: list, k: int = 5,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact brute-force cosine top-``k`` for each query id —
    ``(query_id, neighbor_id, cosine, rank)``.

    The query side (|query_ids| rows) is broadcast; the corpus streams
    through map-side — zero shuffle of the big table; the only shuffle
    is the per-query top-k window over |queries|·|corpus| scored rows,
    partitioned by query id.  Ties break on neighbor id (deterministic).
    """
    q = df.filter(F.col(id_col).isin(query_ids)) \
          .select(F.col(id_col).alias("query_id"),
                  F.col(vec_col).alias("_qv"))
    c = df.select(F.col(id_col).alias("neighbor_id"),
                  F.col(vec_col).alias("_cv"))
    scored = (F.broadcast(q).crossJoin(c)
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cosine", cosine_expr(F.col("_qv"), F.col("_cv"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "neighbor_id",
                          F.round("cosine", 6).alias("cosine"), "rank"))


def _hyperplanes(n_bits: int, dim: int,
                 seed: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) is an
    md5-derived uniform in [-1, 1] — stable across runs/machines with
    no RNG state (Box-Muller etc. unnecessary for sign buckets).
    ``seed`` keys independent tables for OR-amplification."""
    planes = []
    for p in range(n_bits):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"joi_rp:{seed}:{p}:{d}".encode()).hexdigest()
            u = int(h[:13], 16) / float(1 << 52)   # [0, 1)
            row.append(2.0 * u - 1.0)
        planes.append(row)
    return planes


def rp_buckets(df: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding", n_bits: int = 8,
               dim: int | None = None, seed: int = 0) -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) bucket id per row —
    ``(id, bucket)``; bucket = sign bits of ``n_bits`` projections.

    Hyperplanes are literal arrays broadcast in the plan (no join);
    the whole thing is a map-only projection.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(n_bits, dim, seed)
    vec = F.col(vec_col)
    bucket = F.lit(0)
    for p in range(n_bits):
        plane = F.array(*[F.lit(v) for v in planes[p]])
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return df.select(F.col(id_col), bucket.cast("int").alias("bucket"))


def rp_bucket_table(df: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding", n_bits: int = 4,
                    n_tables: int = 8,
                    dim: int | None = None) -> DataFrame:
    """OR-amplified bucket assignments over ``n_tables`` independent
    hyperplane tables — ``(id, table, bucket)``, one row per (row,
    table).  All tables are computed in ONE map-only projection + one
    explode (no union of n_tables scans); candidate generation then
    equi-joins on (table, bucket).  Shared by :func:`lsh_topk` and
    embedding near-dup blocking (joi_spark.operators.dedup)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    vec = F.col(vec_col)
    per_table = []
    for t in range(n_tables):
        planes = _hyperplanes(n_bits, dim, seed=t)
        bucket = F.lit(0)
        for p in range(n_bits):
            plane = F.array(*[F.lit(v) for v in planes[p]])
            proj = F.aggregate(
                F.zip_with(vec, plane, lambda x, y: x.cast("double") * y),
                F.lit(0.0), lambda acc, x: acc + x)
            bucket = bucket + F.when(proj > 0, F.lit(1 << p)) \
                               .otherwise(F.lit(0))
        per_table.append(F.struct(F.lit(t).alias("table"),
                                  bucket.cast("int").alias("bucket")))
    return (df.select(F.col(id_col),
                      F.explode(F.array(*per_table)).alias("_tb"))
              .select(id_col, F.col("_tb.table").alias("table"),
                      F.col("_tb.bucket").alias("bucket")))


def lsh_topk(df: DataFrame, query_ids: list, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_bits: int = 4, n_tables: int = 4) -> DataFrame:
    """Approximate top-``k``: candidates share an LSH bucket in ≥1 of
    ``n_tables`` independent hyperplane tables, then exact cosine +
    per-query top-k over candidates only.

    Candidate generation is an equi-join on (table, bucket) — the
    corpus shuffles once on a fine key instead of cross-joining;
    recall rises with ``n_tables`` (union of tables = OR-amplification).
    """
    dim = len(df.select(vec_col).first()[0])
    buckets = rp_bucket_table(df, id_col, vec_col, n_bits=n_bits,
                              n_tables=n_tables, dim=dim)
    qb = buckets.filter(F.col(id_col).isin(query_ids)) \
                .select(F.col(id_col).alias("query_id"), "table", "bucket")
    cb = buckets.select(F.col(id_col).alias("neighbor_id"), "table", "bucket")
    cands = (F.broadcast(qb).join(cb, ["table", "bucket"])
             .filter(F.col("query_id") != F.col("neighbor_id"))
             .select("query_id", "neighbor_id").distinct())
    q = df.select(F.col(id_col).alias("query_id"),
                  F.col(vec_col).alias("_qv"))
    c = df.select(F.col(id_col).alias("neighbor_id"),
                  F.col(vec_col).alias("_cv"))
    scored = (cands.join(F.broadcast(q), "query_id").join(c, "neighbor_id")
              .withColumn("cosine", cosine_expr(F.col("_qv"), F.col("_cv"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "neighbor_id",
                          F.round("cosine", 6).alias("cosine"), "rank"))

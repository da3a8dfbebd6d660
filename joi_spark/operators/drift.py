"""Distribution-drift checks between partition epochs (north_rule):
PSI in pure Column algebra; KS from bucketed CDFs (approximate, pure
SQL) with an exact ``applyInPandas`` variant for bounded cardinality.

Epoch-over-epoch drift stands in for temporal semantics — the reference
has no streaming (SURVEY.md §2 end); the engine is batch,
epoch-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPS = 1e-6  # smoothing for empty cells, standard PSI practice


def _fractions(df: DataFrame, column: str, epoch_col: str,
               n_buckets: int, dtype: str) -> DataFrame:
    """(epoch, bucket, frac) — bucket is the value for categoricals,
    a fixed-width bin index for numerics/timestamps."""
    col = F.col(column)
    if dtype in ("string", "boolean"):
        bucket = col.cast("string")
    else:
        base = F.unix_micros(col).cast("double") if dtype.startswith("timestamp") \
            else col.cast("double")
        bounds = df.agg(F.min(base).alias("lo"), F.max(base).alias("hi")).first()
        lo, hi = bounds["lo"], bounds["hi"]
        if lo is None or hi is None or hi == lo:
            bucket = F.lit("0")
        else:
            width = (hi - lo) / n_buckets
            bucket = F.least(F.floor((base - F.lit(lo)) / F.lit(width)),
                             F.lit(n_buckets - 1)).cast("string")
    counts = (df.filter(col.isNotNull())
                .groupBy(F.col(epoch_col).alias("epoch"),
                         bucket.alias("bucket"))
                .agg(F.count(F.lit(1)).alias("cnt")))
    totals = counts.groupBy("epoch").agg(F.sum("cnt").alias("total"))
    return (counts.join(totals, "epoch")
                  .select("epoch", "bucket",
                          (F.col("cnt") / F.col("total")).alias("frac")))


def psi(df: DataFrame, column: str, *, epoch_col: str = "epoch",
        baseline_epoch=None, n_buckets: int = 20) -> DataFrame:
    """Population Stability Index of ``column`` for every epoch vs the
    baseline epoch (default: the smallest epoch value).

    PSI = Σ_b (p_b - q_b) · ln(p_b / q_b), smoothed with EPS.
    Pure Column algebra: two grouped aggs + one small self-join —
    bucket cardinality is tiny, so the join broadcasts.

    Rule of thumb: <0.1 stable, 0.1-0.25 moderate shift, >0.25 drifted.
    """
    dtype = dict(df.dtypes)[column]
    frac = _fractions(df, column, epoch_col, n_buckets, dtype)
    if baseline_epoch is None:
        baseline_epoch = df.agg(F.min(epoch_col)).first()[0]
    base = (frac.filter(F.col("epoch") == F.lit(baseline_epoch))
                .select("bucket", F.col("frac").alias("q")))
    # epoch × bucket grid so buckets MISSING from one side still
    # contribute their (p−q)·ln(p/q) term (a vanished category is the
    # strongest drift signal); the grid is tiny — bucket cardinality ×
    # epoch count — so these joins broadcast
    epochs = (frac.select("epoch").distinct()
                  .filter(F.col("epoch") != F.lit(baseline_epoch)))
    buckets = frac.select("bucket").distinct()
    grid = epochs.crossJoin(F.broadcast(buckets))
    joined = (grid.join(frac, ["epoch", "bucket"], "left")
                  .join(F.broadcast(base), "bucket", "left"))
    p = F.coalesce(F.col("frac"), F.lit(0.0)) + EPS
    q = F.coalesce(F.col("q"), F.lit(0.0)) + EPS
    term = (p - q) * F.log(p / q)
    return (joined.groupBy("epoch")
                  .agg(F.sum(term).alias("psi"))
                  .withColumn("column", F.lit(column))
                  .withColumn("baseline_epoch",
                              F.lit(baseline_epoch).cast("string"))
                  .select("column", "epoch", "baseline_epoch", "psi")
                  .orderBy("epoch"))


def js_divergence(df: DataFrame, column: str, *, epoch_col: str = "epoch",
                  baseline_epoch=None, n_buckets: int = 20) -> DataFrame:
    """Jensen–Shannon divergence of ``column`` per epoch vs baseline —
    the bounded, symmetric companion to :func:`psi` (JSD ∈ [0, ln 2];
    PSI is unbounded and explodes on vanished categories, so
    dashboards typically track both).

    JSD(p, q) = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m), m = (p+q)/2, on the
    same smoothed bucket fractions and broadcast epoch×bucket grid as
    PSI — two grouped aggs + tiny-dimension joins, nothing new at
    scale."""
    dtype = dict(df.dtypes)[column]
    frac = _fractions(df, column, epoch_col, n_buckets, dtype)
    if baseline_epoch is None:
        baseline_epoch = df.agg(F.min(epoch_col)).first()[0]
    base = (frac.filter(F.col("epoch") == F.lit(baseline_epoch))
                .select("bucket", F.col("frac").alias("q")))
    epochs = (frac.select("epoch").distinct()
                  .filter(F.col("epoch") != F.lit(baseline_epoch)))
    buckets = frac.select("bucket").distinct()
    grid = epochs.crossJoin(F.broadcast(buckets))
    joined = (grid.join(frac, ["epoch", "bucket"], "left")
                  .join(F.broadcast(base), "bucket", "left"))
    p = F.coalesce(F.col("frac"), F.lit(0.0)) + EPS
    q = F.coalesce(F.col("q"), F.lit(0.0)) + EPS
    m = (p + q) / 2
    term = (p * F.log(p / m) + q * F.log(q / m)) / 2
    return (joined.groupBy("epoch")
                  .agg(F.sum(term).alias("jsd"))
                  .withColumn("column", F.lit(column))
                  .withColumn("baseline_epoch",
                              F.lit(baseline_epoch).cast("string"))
                  .select("column", "epoch", "baseline_epoch", "jsd")
                  .orderBy("epoch"))


def ks_statistic(df: DataFrame, column: str, *, epoch_col: str = "epoch",
                 baseline_epoch=None, n_buckets: int = 200) -> DataFrame:
    """Approximate two-sample Kolmogorov–Smirnov statistic per epoch vs
    baseline: D = max_b |CDF_p(b) - CDF_q(b)| over ``n_buckets`` bins.

    Bucketed-CDF approximation error ≤ 1/n_buckets; pure SQL (window
    cumulative sums over the tiny bucket table), no Python in the path.
    """
    from pyspark.sql import Window
    dtype = dict(df.dtypes)[column]
    if dtype in ("string", "boolean"):
        raise ValueError("KS requires an ordered column; use psi() for "
                         "categoricals")
    frac = _fractions(df, column, epoch_col, n_buckets, dtype) \
        .withColumn("bucket", F.col("bucket").cast("int"))
    if baseline_epoch is None:
        baseline_epoch = df.agg(F.min(epoch_col)).first()[0]
    epochs = frac.select("epoch").distinct()
    buckets = frac.select("bucket").distinct()
    grid = epochs.crossJoin(F.broadcast(buckets))
    dense = grid.join(frac, ["epoch", "bucket"], "left") \
                .fillna(0.0, ["frac"])
    w = (Window.partitionBy("epoch").orderBy("bucket")
               .rowsBetween(Window.unboundedPreceding, 0))
    cdf = dense.withColumn("cdf", F.sum("frac").over(w))
    base = (cdf.filter(F.col("epoch") == F.lit(baseline_epoch))
               .select("bucket", F.col("cdf").alias("cdf_q")))
    cur = cdf.filter(F.col("epoch") != F.lit(baseline_epoch))
    return (cur.join(F.broadcast(base), "bucket")
               .groupBy("epoch")
               .agg(F.max(F.abs(F.col("cdf") - F.col("cdf_q"))).alias("ks"))
               .withColumn("column", F.lit(column))
               .withColumn("baseline_epoch", F.lit(baseline_epoch).cast("string"))
               .select("column", "epoch", "baseline_epoch", "ks")
               .orderBy("epoch"))


def drift_report(df: DataFrame, columns: list[str], *,
                 epoch_col: str = "epoch", baseline_epoch=None,
                 psi_threshold: float = 0.25) -> DataFrame:
    """PSI for each column vs baseline epoch + pass/fail verdict —
    feeds the per-partition metrics manifest."""
    out = None
    for c in columns:
        p = psi(df, c, epoch_col=epoch_col, baseline_epoch=baseline_epoch)
        out = p if out is None else out.unionAll(p)
    return out.withColumn("pass", F.col("psi") < psi_threshold) \
              .orderBy("column", "epoch")


def baseline_fractions(df: DataFrame, column: str, *,
                       bins: tuple[float, float, int] | None = None,
                       top_k: int = 1000) -> DataFrame:
    """Static baseline distribution ``(bucket, q)`` of ``column`` for
    :func:`joi_spark.streaming.validate.stream_drift` — categorical
    values verbatim (top ``top_k`` by mass), numeric via FIXED-edge
    bins ``(lo, hi, n)`` supplied by the caller: a stream cannot
    derive data-dependent edges from unbounded input, so the edges
    must come from the baseline era and be reused verbatim on the
    stream side."""
    b = _bucketize(F.col(column), bins)
    counts = (df.filter(F.col(column).isNotNull())
                .groupBy(b.alias("bucket"))
                .agg(F.count(F.lit(1)).alias("cnt"))
                .orderBy(F.desc("cnt"), "bucket").limit(top_k))
    total = counts.agg(F.sum("cnt")).first()[0]
    return counts.select("bucket",
                         (F.col("cnt") / F.lit(float(total))).alias("q"))


def _bucketize(col, bins: tuple[float, float, int] | None):
    """Shared bucket labeling: value verbatim, or fixed-edge bin index
    — identical on the baseline and stream sides by construction."""
    if bins is None:
        return col.cast("string")
    lo, hi, n = bins
    width = (hi - lo) / n
    idx = F.least(F.greatest(
        F.floor((col.cast("double") - F.lit(lo)) / F.lit(width)),
        F.lit(0)), F.lit(n - 1))
    return idx.cast("string")

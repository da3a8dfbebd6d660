"""Per-column statistics — the profiling half of the north_rule output:
null fraction, distinct/HLL cardinality, min/max, value histograms.

One single-pass aggregation for all scalar stats (every accumulator is a
partial-aggregating built-in → map-side combine, one shuffle of tiny
partial states).  Histograms are a second pass grouped on the bucketed
value — also partial-aggregating.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def column_stats(df: DataFrame, columns: Sequence[str] | None = None,
                 rsd: float = 0.05) -> DataFrame:
    """Long-form stats: one row per column —
    ``(column, n_rows, null_frac, approx_distinct, min, max)``.

    ``approx_count_distinct`` is HyperLogLog++ (constant memory per
    column at any scale); min/max cast to string for the long form.
    """
    columns = list(columns or df.columns)
    n = F.count(F.lit(1))
    aggs = [n.alias("n_rows")]
    for c in columns:
        col = F.col(c)
        aggs += [
            F.avg(col.isNull().cast("double")).alias(f"{c}__null_frac"),
            F.approx_count_distinct(col, rsd).alias(f"{c}__approx_distinct"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    # unpivot driver-side over column NAMES only (no data movement):
    # build a stack() expression — stays one Spark job
    stacks = []
    for c in columns:
        stacks.append(
            F.struct(F.lit(c).alias("column"),
                     F.col("n_rows"),
                     F.col(f"{c}__null_frac").alias("null_frac"),
                     F.col(f"{c}__approx_distinct").alias("approx_distinct"),
                     F.col(f"{c}__min").alias("min"),
                     F.col(f"{c}__max").alias("max")))
    return (wide.select(F.explode(F.array(*stacks)).alias("s"))
                .select("s.*"))


def column_stats_exact(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Exact-count variant of :func:`column_stats` for numeric columns —
    ``(column, n_rows, n_null, n_distinct, min_d, max_d)``.

    Used where an external oracle must reproduce the numbers bit-exactly
    (the HLL sketch of ``approx_count_distinct`` is engine-specific).
    At 100 TB prefer :func:`column_stats`: exact distinct costs a
    per-column shuffle (Spark expands one row per distinct aggregate),
    HLL is a constant-size partial aggregate.
    """
    columns = list(columns)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"{c}__n_null"),
            F.countDistinct(col).alias(f"{c}__n_distinct"),
            F.min(col).cast("double").alias(f"{c}__min"),
            F.max(col).cast("double").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stacks = []
    for c in columns:
        stacks.append(
            F.struct(F.lit(c).alias("column"),
                     F.col("n_rows"),
                     F.col(f"{c}__n_null").alias("n_null"),
                     F.col(f"{c}__n_distinct").alias("n_distinct"),
                     F.col(f"{c}__min").alias("min_d"),
                     F.col(f"{c}__max").alias("max_d")))
    return (wide.select(F.explode(F.array(*stacks)).alias("s"))
                .select("s.*"))


def value_histogram(df: DataFrame, column: str, *, n_buckets: int = 20,
                    top_k: int | None = None) -> DataFrame:
    """Histogram rows ``(bucket, count)``.

    - categorical (string/bool): group by value, optional top-k by count;
    - numeric/timestamp: fixed-width buckets over the observed min/max
      (two passes: bounds, then bucketed count — both partial aggs).
    """
    dtype = dict(df.dtypes)[column]
    col = F.col(column)
    if dtype in ("string", "boolean"):
        out = (df.filter(col.isNotNull()).groupBy(col.alias("bucket"))
                 .agg(F.count(F.lit(1)).alias("count")))
        if top_k:
            out = out.orderBy(F.desc("count"), "bucket").limit(top_k)
        return out.orderBy("bucket")
    base = col.cast("double") if not dtype.startswith("timestamp") \
        else F.unix_micros(col).cast("double")
    bounds = df.agg(F.min(base).alias("lo"), F.max(base).alias("hi")).first()
    lo, hi = bounds["lo"], bounds["hi"]
    if lo is None or hi is None or hi == lo:
        return (df.filter(col.isNotNull())
                  .groupBy(F.lit(0).alias("bucket"))
                  .agg(F.count(F.lit(1)).alias("count")))
    width = (hi - lo) / n_buckets
    bucket = F.least(F.floor((base - F.lit(lo)) / F.lit(width)),
                     F.lit(n_buckets - 1)).cast("int")
    return (df.filter(col.isNotNull())
              .groupBy(bucket.alias("bucket"))
              .agg(F.count(F.lit(1)).alias("count"))
              .orderBy("bucket"))


def stats_manifest(df: DataFrame, partition_col: str,
                   columns: Sequence[str] | None = None) -> DataFrame:
    """Per-partition per-column stats — the metrics half of the
    per-partition lineage manifest (north_rule: metrics manifests).
    Single grouped aggregation; long-form output."""
    columns = list(columns or [c for c in df.columns if c != partition_col])
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        col = F.col(c)
        aggs += [
            F.avg(col.isNull().cast("double")).alias(f"{c}__null_frac"),
            F.approx_count_distinct(col).alias(f"{c}__approx_distinct"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
        ]
    wide = df.groupBy(partition_col).agg(*aggs)
    stacks = []
    for c in columns:
        stacks.append(
            F.struct(F.lit(c).alias("column"),
                     F.col("n_rows"),
                     F.col(f"{c}__null_frac").alias("null_frac"),
                     F.col(f"{c}__approx_distinct").alias("approx_distinct"),
                     F.col(f"{c}__min").alias("min"),
                     F.col(f"{c}__max").alias("max")))
    return (wide.select(F.col(partition_col),
                        F.explode(F.array(*stacks)).alias("s"))
                .select(partition_col, "s.*")
                .orderBy(partition_col, "column"))


def _z_screen(long: DataFrame, key: str,
              z_threshold: float) -> DataFrame:
    """z-score every (column, metric, key) row against the distribution
    of that metric across keys; constant metrics (stddev 0) never flag.
    Input: ``(key, column, metric, value)``."""
    from pyspark.sql import Window
    w = Window.partitionBy("column", "metric")
    z = F.when(F.stddev_samp("value").over(w) > 0,
               (F.col("value") - F.avg("value").over(w))
               / F.stddev_samp("value").over(w)).otherwise(F.lit(0.0))
    return (long.withColumn("z", z)
                .withColumn("flagged", F.abs(F.col("z")) > z_threshold)
                .select("column", key, "metric", "value", "z", "flagged")
                .orderBy("column", "metric", key))


def epoch_anomalies(df: DataFrame, columns: Sequence[str], *,
                    epoch_col: str = "epoch", z_threshold: float = 3.0) -> DataFrame:
    """Cross-epoch anomaly screen over the raw data: per-column
    per-epoch mean and null fraction, z-scored against the distribution
    of that metric ACROSS epochs — flags the epoch whose profile jumps
    (ingestion bug, schema drift upstream, silent unit change).

    One partial-aggregating pass over the data produces the tiny
    (epoch × column × metric) table; the z-scores are windows over
    that table, so cost is independent of row count.
    Output: ``(column, epoch, metric, value, z, flagged)``.
    See :func:`manifest_anomalies` for the scale path that screens an
    already-persisted stats manifest without touching the data.
    """
    columns = list(columns)
    aggs = []
    for c in columns:
        col = F.col(c)
        aggs += [
            F.avg(col.cast("double")).alias(f"{c}__mean"),
            F.avg(col.isNull().cast("double")).alias(f"{c}__null_frac"),
        ]
    wide = df.groupBy(F.col(epoch_col).alias("epoch")).agg(*aggs)
    stacks = []
    for c in columns:
        for metric in ("mean", "null_frac"):
            stacks.append(F.struct(
                F.lit(c).alias("column"), F.lit(metric).alias("metric"),
                F.col(f"{c}__{metric}").cast("double").alias("value")))
    long = (wide.select("epoch", F.explode(F.array(*stacks)).alias("s"))
                .select("epoch", "s.*"))
    return _z_screen(long, "epoch", z_threshold)


def manifest_anomalies(manifest: DataFrame, *, partition_col: str,
                       metrics: Sequence[str] = ("null_frac",
                                                 "approx_distinct"),
                       z_threshold: float = 3.0) -> DataFrame:
    """Anomaly screen over an already-persisted :func:`stats_manifest`
    (e.g. the one a :class:`~joi_spark.checkpoint.CheckpointedRun`
    writes) — the 10^12-row path: each validation run leaves one tiny
    manifest row per partition×column, and this screen z-scores those
    rows WITHOUT ever rescanning the data.  A null-fraction spike or a
    cardinality collapse in one epoch flags immediately.
    Output: ``(column, <partition_col>, metric, value, z, flagged)``.
    """
    stacks = [F.struct(F.lit(m).alias("metric"),
                       F.col(m).cast("double").alias("value"))
              for m in metrics]
    long = (manifest.select(F.col(partition_col), F.col("column"),
                            F.explode(F.array(*stacks)).alias("s"))
                    .select(partition_col, "column", "s.*"))
    return _z_screen(long, partition_col, z_threshold)

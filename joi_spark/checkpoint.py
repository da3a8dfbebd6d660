"""Checkpoint/resume with per-partition lineage + metrics manifests
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics").

A validation run over an epoch-partitioned table writes, per partition:
one manifest row ``(partition value, constraint_hash, n_rows,
n_violations, n_warnings, pass, engine_version)`` — the lineage record —
plus the violation rows, both as parquet appends keyed by the partition
value.  On restart, partitions whose manifest row exists under the SAME
constraint hash are anti-joined out of the input before any validation
work runs, so a resumed job re-reads only incomplete partitions.

Scale notes:
- the manifest is tiny (one row per partition) — it broadcasts;
- completed-partition pruning happens BEFORE the scan filter, so
  Spark's partition pruning (`epoch IN (...)`) skips whole files:
  resume cost is proportional to the remaining work, not table size;
- a constraint-spec change (different manifest_hash) invalidates all
  completions automatically — lineage ties results to the exact
  schema that produced them (reference analogue: describe()/build()
  round-trip as the persisted spec, lib/manifest.js:16-155).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from joi_spark.dsl.base import Schema
from joi_spark.dsl.manifest import manifest_hash
from joi_spark.engine import validate

ENGINE_VERSION = "0.1.0"


class CheckpointedRun:
    """Orchestrates validate → write-per-partition → resume."""

    def __init__(self, root: str, schema: Schema, partition_col: str):
        self.root = root
        self.schema = schema
        self.partition_col = partition_col
        self.hash = manifest_hash(schema)
        self.manifest_path = os.path.join(root, "manifest")
        self.violations_path = os.path.join(root, "violations")
        self.stats_path = os.path.join(root, "stats")
        self.sketches_path = os.path.join(root, "sketches")

    # -- resume bookkeeping -------------------------------------------
    def completed_partitions(self, spark: SparkSession) -> DataFrame | None:
        """Manifest rows for THIS constraint hash, or None if fresh."""
        try:
            m = spark.read.parquet(self.manifest_path)
        except Exception:
            return None
        return m.filter(F.col("constraint_hash") == self.hash)

    def pending(self, df: DataFrame) -> DataFrame:
        """Input minus completed partitions (broadcast anti-join on the
        partition value → Catalyst turns it into partition pruning)."""
        done = self.completed_partitions(df.sparkSession)
        if done is None:
            return df
        keys = done.select(F.col(self.partition_col)).distinct()
        return df.join(F.broadcast(keys), [self.partition_col], "left_anti")

    # -- one run ------------------------------------------------------
    def run(self, df: DataFrame, *, stats_columns=None,
            sketch_columns=None, **validate_kw) -> dict:
        """Validate all pending partitions; write violations (and any
        metrics manifests), THEN the manifest.  Returns a summary dict
        (partitions completed this run).

        ``stats_columns`` additionally writes a per-partition
        :func:`~joi_spark.operators.stats.stats_manifest` (null frac,
        HLL distinct, min/max) and ``sketch_columns`` a
        :func:`~joi_spark.operators.sketches.cardinality_manifest`
        (mergeable HLL binaries) under the same lineage layout —
        downstream drift/anomaly screens
        (:func:`~joi_spark.operators.stats.manifest_anomalies`,
        :func:`~joi_spark.operators.sketches.cardinality_merge`) then
        run on manifests alone, never rescanning validated data.

        Crash-safety: violation/stats/sketch rows are written via
        DYNAMIC partition overwrite — a crash before the manifest
        write leaves the partition un-manifested, so resume
        re-validates it and the overwrite REPLACES (not appends) the
        partial rows; no duplicates.  The constraint hash is part of
        the PHYSICAL layout (``partitionBy(constraint_hash,
        partition_col)``), so a run under a new hash only ever rewrites
        its own hash's directories — prior-hash rows (and their
        lineage) survive schema changes, and concurrent runs under
        different hashes never clobber each other."""
        pending = self.pending(df)
        if pending.isEmpty():
            return {"completed_now": 0, "resumed": True}
        res = validate(pending, self.schema, **validate_kw)
        viol = (res.violations(extra_cols=[self.partition_col])
                .withColumn("constraint_hash", F.lit(self.hash)))
        spark = df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                              "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            viol.write.mode("overwrite") \
                .partitionBy("constraint_hash", self.partition_col) \
                .parquet(self.violations_path)
            if stats_columns:
                from joi_spark.operators.stats import stats_manifest
                st = (stats_manifest(pending, self.partition_col,
                                     list(stats_columns))
                      .withColumn("constraint_hash", F.lit(self.hash)))
                st.write.mode("overwrite") \
                  .partitionBy("constraint_hash", self.partition_col) \
                  .parquet(self.stats_path)
            if sketch_columns:
                from joi_spark.operators.sketches import cardinality_manifest
                sk = (cardinality_manifest(pending, list(sketch_columns),
                                           partition_col=self.partition_col)
                      .withColumnRenamed("partition", self.partition_col)
                      .withColumn("constraint_hash", F.lit(self.hash)))
                sk.write.mode("overwrite") \
                  .partitionBy("constraint_hash", self.partition_col) \
                  .parquet(self.sketches_path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        verd = (res.verdicts([self.partition_col])
                .withColumn("engine_version", F.lit(ENGINE_VERSION)))
        verd.write.mode("append").parquet(self.manifest_path)
        n = verd.count()
        return {"completed_now": n, "resumed": False}

    # -- outputs ------------------------------------------------------
    def manifest(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.manifest_path) \
            .filter(F.col("constraint_hash") == self.hash)

    def violations(self, spark: SparkSession) -> DataFrame:
        """Violation rows under THIS constraint hash — the lineage
        guarantee holds for violations, not just the manifest."""
        return spark.read.parquet(self.violations_path) \
            .filter(F.col("constraint_hash") == self.hash)

    def stats(self, spark: SparkSession) -> DataFrame:
        """Per-partition column-stats manifest rows under THIS hash
        (written when ``run(stats_columns=...)``); feed to
        :func:`~joi_spark.operators.stats.manifest_anomalies`."""
        return spark.read.parquet(self.stats_path) \
            .filter(F.col("constraint_hash") == self.hash)

    def sketches(self, spark: SparkSession) -> DataFrame:
        """Per-partition HLL sketch manifest rows under THIS hash
        (written when ``run(sketch_columns=...)``)."""
        return spark.read.parquet(self.sketches_path) \
            .filter(F.col("constraint_hash") == self.hash)

    def global_cardinality(self, spark: SparkSession) -> DataFrame:
        """Whole-table distinct estimates folded from the persisted
        sketches — no data rescan (the mergeable-manifest payoff)."""
        from joi_spark.operators.sketches import cardinality_merge
        return cardinality_merge(self.sketches(spark))

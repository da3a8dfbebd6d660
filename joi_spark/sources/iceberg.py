"""Iceberg (and generic catalog/path) source + sink helpers.

The north-rule deployment reads transcripts from Iceberg tables and
writes violation rows + per-partition manifests back as tables.  The
engine itself is storage-agnostic — everything operates on DataFrames —
so this module is a thin edge:

- ``read_table``: catalog table name (``spark.table`` — the idiomatic
  Iceberg path, which gives snapshot isolation, partition pruning and
  metadata-only planning for free), ``iceberg``-format path, or plain
  parquet path fallback for environments (like this sandbox) without
  the Iceberg runtime jar;
- ``write_table``: mirrored writer (``writeTo().append()`` for catalog
  tables → Iceberg fan-out writers; parquet append fallback).

Epoch/partition pruning: pass ``partition_filter`` so the scan prunes
at the manifest level — at 10^12 turns, reading only the pending
epochs is the difference between a resume costing minutes vs days.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession


def _is_path(ref: str) -> bool:
    return "/" in ref or ref.endswith(".parquet")


def _missing_format(e: Exception) -> bool:
    """True only for "the iceberg data source isn't on the classpath"
    errors — the ONE condition the parquet fallback exists for.  A
    genuine Iceberg failure (corrupt metadata, missing snapshot, bad
    credentials) must propagate, not get silently retried as a parquet
    directory scan that would misread the table layout."""
    s = str(e)
    return ("DATA_SOURCE_NOT_FOUND" in s
            or "Failed to find data source" in s
            or "Failed to find the data source" in s
            or "ClassNotFoundException" in s)


def read_table(spark: SparkSession, ref: str,
               partition_filter: Column | None = None) -> DataFrame:
    """Load a transcript table from a catalog name or a path."""
    if _is_path(ref):
        try:
            df = spark.read.format("iceberg").load(ref)
        except Exception as e:
            if not _missing_format(e):
                raise
            df = spark.read.parquet(ref)
    else:
        df = spark.table(ref)
    if partition_filter is not None:
        df = df.filter(partition_filter)   # pushed to partition pruning
    return df


def write_table(df: DataFrame, ref: str, *, mode: str = "append",
                partition_by: list[str] | None = None) -> None:
    """Write results (violations / manifests) to a catalog table or path."""
    if _is_path(ref):
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        try:
            w.format("iceberg").save(ref)
        except Exception as e:
            if not _missing_format(e):
                raise
            w.parquet(ref)
    else:
        if mode == "overwrite":
            df.writeTo(ref).createOrReplace()
        else:
            df.writeTo(ref).append()

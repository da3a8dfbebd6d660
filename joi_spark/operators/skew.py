"""Skew handling for group-level rules (north_rule: salted repartition
for skewed conversations — few conv_ids with millions of turns).

Group rules (counts, min/max heads, monotonicity) naively shuffle on
``conv_id``; one hot conversation then lands in one reducer task.  The
fix is the classic two-phase salted aggregation:

  phase 1: groupBy(conv_id, salt)  — salt = turn_idx % S spreads a hot
           conversation over S tasks; partial aggregates combine
           map-side, so phase-1 output is S rows per conversation;
  phase 2: groupBy(conv_id) over the S partials — tiny input.

Plain column rules never need this (embarrassingly parallel); windows
over hot groups should be re-keyed to the fine-grained
``(conv_id, turn_idx)`` join form (see operators.dataset.monotone).
AQE's skew-join splitting handles the join-side remainder
(``spark.sql.adaptive.skewJoin.enabled`` is on in joi_spark.session).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from joi_spark import errors as E

DEFAULT_SALT = 64


def salted_group_counts(df: DataFrame, conv_col: str = "conv_id",
                        idx_col: str = "turn_idx",
                        salt: int = DEFAULT_SALT) -> DataFrame:
    """Per-conversation row counts that stay parallel under skew —
    ``(conv_id, n_turns)`` via the two-phase salted aggregation."""
    s = (F.crc32(F.col(idx_col).cast("string")) % salt).alias("_salt")
    partial = (df.groupBy(F.col(conv_col), s)
                 .agg(F.count(F.lit(1)).alias("_n")))
    return (partial.groupBy(conv_col)
                   .agg(F.sum("_n").alias("n_turns")))


def salted_group_minmax(df: DataFrame, value_col: str,
                        conv_col: str = "conv_id",
                        idx_col: str = "turn_idx",
                        salt: int = DEFAULT_SALT) -> DataFrame:
    """Per-conversation min/max of ``value_col`` under skew —
    ``(conv_id, min_v, max_v)``."""
    s = (F.crc32(F.col(idx_col).cast("string")) % salt).alias("_salt")
    partial = (df.groupBy(F.col(conv_col), s)
                 .agg(F.min(value_col).alias("_mn"),
                      F.max(value_col).alias("_mx")))
    return (partial.groupBy(conv_col)
                   .agg(F.min("_mn").alias("min_v"),
                        F.max("_mx").alias("max_v")))


def salted_conversation_sizes(df: DataFrame, *, conv_col: str = "conv_id",
                              idx_col: str = "turn_idx",
                              min_turns: int | None = None,
                              max_turns: int | None = None,
                              salt: int = DEFAULT_SALT,
                              seq: int = 1006) -> DataFrame:
    """Skew-proof variant of operators.dataset.conversation_sizes:
    turn-count bounds per conversation (≙ Joi ``array().min/max()``,
    reference: lib/types/array.js:354-388) computed via the salted
    two-phase aggregation.  Same violation-row shape."""
    if min_turns is None and max_turns is None:
        raise ValueError("min_turns or max_turns required")
    counts = salted_group_counts(df, conv_col, idx_col, salt)
    parts = []
    if min_turns is not None:
        msg = E.render_static("array.min", {"label": conv_col,
                                            "limit": min_turns})
        parts.append(counts.filter(F.col("n_turns") < min_turns).select(
            F.col(conv_col), F.col("n_turns"),
            F.lit(seq).alias("seq"), F.lit("array.min").alias("code"),
            F.lit(conv_col).alias("path"), F.lit(msg).alias("message"),
            F.lit("error").alias("severity")))
    if max_turns is not None:
        msg = E.render_static("array.max", {"label": conv_col,
                                            "limit": max_turns})
        parts.append(counts.filter(F.col("n_turns") > max_turns).select(
            F.col(conv_col), F.col("n_turns"),
            F.lit(seq + 1).alias("seq"), F.lit("array.max").alias("code"),
            F.lit(conv_col).alias("path"), F.lit(msg).alias("message"),
            F.lit("error").alias("severity")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def salted_repartition(df: DataFrame, keys: Sequence[str],
                       salt_col: str, salt: int = DEFAULT_SALT,
                       num_partitions: int | None = None) -> DataFrame:
    """Repartition on (keys..., salt) so hot key groups split across
    ``salt`` partitions — the pre-pass for any downstream per-group
    imperative stage (e.g. applyInPandas over conversations)."""
    s = (F.crc32(F.col(salt_col).cast("string")) % salt)
    cols: list[Column] = [F.col(k) for k in keys] + [s]
    if num_partitions:
        return df.repartition(num_partitions, *cols)
    return df.repartition(*cols)

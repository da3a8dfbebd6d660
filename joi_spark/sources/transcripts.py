"""Deterministic synthetic transcript tables (BASELINE.json input_hint).

Schema: ``conv_id:string, turn_idx:int, role:string, text:string,
tool:string, ts:timestamp`` partitioned by ``epoch:int`` — synthesized
at small scale for tests/bench per FIXTURES.md §1, seeded defects
included so every constraint has known violation rows.

Generation is pure Column algebra over ``spark.range`` — scales to any
row count without driver-side materialization, and partitions evenly
(range → narrow projections).  Seed fixed; no wall-clock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLES = ["system", "user", "assistant", "tool"]
TOOLS = [f"tool_{i}" for i in range(8)]
EPOCH0 = "2025-01-01 00:00:00"


def clean_transcripts(spark: SparkSession, n_convs: int = 100,
                      turns_per_conv: int = 10, n_epochs: int = 2,
                      partitions: int | None = None) -> DataFrame:
    """Defect-free transcript table: conv c%06d with monotone turn_idx,
    role cycling system→user→assistant→tool, ts strictly increasing."""
    n = n_convs * turns_per_conv
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    conv = (F.col("id") / turns_per_conv).cast("long")
    turn = (F.col("id") % turns_per_conv).cast("int")
    role = (F.when(turn == 0, "system")
             .when(turn % 3 == 1, "user")
             .when(turn % 3 == 2, "assistant")
             .otherwise("tool"))
    tool = F.when(role == "tool",
                  F.concat(F.lit("tool_"), (conv % 8).cast("string")))
    # deterministic pseudo-text: varies by id, never empty / never padded
    text = F.concat(F.lit("turn "), F.col("id").cast("string"), F.lit(" says "),
                    F.sha2(F.col("id").cast("string"), 256))
    ts = F.to_timestamp(F.lit(EPOCH0)) + F.make_interval(secs=F.col("id") * 60)
    epoch = (conv % n_epochs).cast("int")
    return df.select(
        F.format_string("c%06d", conv).alias("conv_id"),
        turn.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
        epoch.alias("epoch"),
    )


def seeded_transcripts(spark: SparkSession, n_convs: int = 100,
                       turns_per_conv: int = 10, n_epochs: int = 2,
                       partitions: int | None = None) -> DataFrame:
    """Clean table + the FIXTURES.md §1 seeded defects, injected at fixed
    (conv_id, turn_idx) coordinates so goldens are stable:

    - conv 1 / turn 1: role='moderator'        → any.only
    - conv 2 / turn 1: role=NULL               → any.required
    - conv 3 / turn 1: text=''                 → string.empty
    - conv 4 / turn 1: text=' padded'          → string.trim (strict runs)
    - conv 5 / turn 1: text longer than 8192   → string.max
    - conv 6 / turn 1: duplicate (conv, turn)  → dataset.unique
    - conv 7: turn_idx gap (turn 5 removed)    → dataset.sparse
    - conv 8 / turn 1: tool='ghost_tool'       → dataset.link
    - conv 9: ts regression at turn 1          → dataset.sort(ts)
    - conv 10 / turn 1: role='user', tool set  → object.without
    """
    df = clean_transcripts(spark, n_convs, turns_per_conv, n_epochs, partitions)
    tp = turns_per_conv
    is_defect = lambda c, t: (F.col("conv_id") == f"c{c:06d}") & (F.col("turn_idx") == t)

    df = (df
          .withColumn("role", F.when(is_defect(1, 1), "moderator")
                      .otherwise(F.col("role")))
          .withColumn("role", F.when(is_defect(2, 1), F.lit(None))
                      .otherwise(F.col("role")))
          .withColumn("text", F.when(is_defect(3, 1), "")
                      .otherwise(F.col("text")))
          .withColumn("text", F.when(is_defect(4, 1), " padded text")
                      .otherwise(F.col("text")))
          .withColumn("text", F.when(is_defect(5, 1), F.repeat(F.lit("x"), 8193))
                      .otherwise(F.col("text")))
          .withColumn("tool", F.when(is_defect(8, 1), "ghost_tool")
                      .otherwise(F.col("tool")))
          .withColumn("ts", F.when(is_defect(9, 1),
                                   F.col("ts") - F.make_interval(hours=F.lit(1)))
                      .otherwise(F.col("ts")))
          .withColumn("tool", F.when(is_defect(10, 1), "tool_0")
                      .otherwise(F.col("tool")))
          .withColumn("role", F.when(is_defect(10, 1), "user")
                      .otherwise(F.col("role"))))
    # duplicate (conv 6, turn 1)
    dup = df.filter(is_defect(6, 1))
    df = df.unionAll(dup)
    # gap: remove conv 7 turn 5 (needs tp > 5 to matter)
    if tp > 5:
        df = df.filter(~is_defect(7, 5))
    return df


def skewed_transcripts(spark: SparkSession, hot_turns: int = 1_000_000,
                       n_small_convs: int = 1000,
                       turns_per_small: int = 10) -> DataFrame:
    """Skew fixture: one conversation with ``hot_turns`` turns plus many
    small ones (FIXTURES.md 'skewed' scale) — exercises the salted
    two-phase group path in joi_spark.operators.dataset."""
    hot = clean_transcripts(spark, 1, hot_turns) \
        .withColumn("conv_id", F.lit("c_hot"))
    small = clean_transcripts(spark, n_small_convs, turns_per_small)
    return hot.unionAll(small)


def tools_dimension(spark: SparkSession) -> DataFrame:
    """The registered-tool dimension (FIXTURES.md §2)."""
    cats = ["search", "code", "io", "other"]
    rows = [(t, cats[i % 4]) for i, t in enumerate(TOOLS)]
    return spark.createDataFrame(rows, "tool_name string, category string")

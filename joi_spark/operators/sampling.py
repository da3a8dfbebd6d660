"""Deterministic corpus sampling: uniform hash sampling, per-stratum
rate sampling, and weighted priority (A-Res) top-k sampling.

Training-data pipelines need *reproducible* subsampling — the same
corpus, seed, and rates must select the same documents regardless of
partition layout, executor count, or engine.  ``df.sample()`` gives
none of that (its output depends on partition splits), so every
sampler here keys on ``md5(seed || ':' || id)`` exactly like
:func:`joi_spark.operators.corpus.hash_split`:

* threshold samplers compare the first 8 md5 hex chars
  LEXICOGRAPHICALLY against a precomputed hex threshold — no
  hex→int cast, so the comparison is portable to any SQL engine;
* the weighted sampler needs a numeric uniform, built as a base-16
  positional sum over ``instr('0123456789abcdef', digit)`` — again
  plain SQL in both Spark and DuckDB dialects (:func:`hex_uniform_sql`
  is the single source of truth for that expression).

All samplers are map-only projections/filters (no shuffle, no UDF,
whole-stage-codegen) except the top-k tail of
:func:`weighted_sample_topk`, which is a ``TakeOrderedAndProject``
(per-partition heap + driver merge of k rows — no global sort even at
100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def _md5_key(id_col: str, seed: str) -> Column:
    return F.md5(F.concat(F.lit(seed), F.lit(":"),
                          F.col(id_col).cast("string")))


def rate_threshold(rate: float) -> str:
    """8-hex-char lexicographic threshold selecting ``rate`` of the
    md5 keyspace."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return format(min(int(rate * 16 ** 8), 16 ** 8 - 1), "08x")


def hash_sample(df: DataFrame, rate: float,
                id_col: str = "doc_id", seed: str = "") -> DataFrame:
    """Keep ~``rate`` of rows, selected purely by id hash — stable
    under resharding, re-runs, and engine changes.  Map-only filter."""
    if rate >= 1.0:
        return df
    return df.filter(
        F.substring(_md5_key(id_col, seed), 1, 8) < rate_threshold(rate))


def stratified_sample(df: DataFrame, strata_col: str,
                      rates: dict[str, float],
                      id_col: str = "doc_id", seed: str = "",
                      default_rate: float = 0.0) -> DataFrame:
    """Per-stratum hash sampling — e.g. language-balanced or
    quality-tiered downsampling: keep ``rates[stratum]`` of each
    stratum, ``default_rate`` of unlisted strata.

    One CASE ladder over the stratum column against per-stratum hex
    thresholds; no shuffle, no per-stratum pass — a single map-only
    filter regardless of how many strata are listed."""
    h = F.substring(_md5_key(id_col, seed), 1, 8)
    thr: Column = F.lit(rate_threshold(default_rate))
    expr = None
    for stratum, rate in rates.items():
        branch = F.col(strata_col) == F.lit(stratum)
        t = F.lit(rate_threshold(rate))
        expr = (F.when(branch, t) if expr is None
                else expr.when(branch, t))
    thr = expr.otherwise(thr) if expr is not None else thr
    return df.filter(h < thr)


def hex_uniform_sql(key_sql: str, dialect: str = "spark") -> str:
    """SQL (shared Spark/DuckDB surface) turning the first 8 hex chars
    of ``key_sql`` (an md5 expression string) into a uniform double in
    [0, 1): a base-16 positional sum of ``instr(alphabet, digit) - 1``.
    32 bits → exactly representable in a double; both engines produce
    the identical value, so downstream ordering agrees bit-for-bit."""
    assert dialect in ("spark", "duckdb")
    terms = " + ".join(
        f"(instr('{_HEX}', substring({key_sql}, {i + 1}, 1)) - 1) "
        f"* {16 ** (7 - i)}.0"
        for i in range(8))
    return f"(({terms}) / {16 ** 8}.0)"


def weighted_sample_topk(df: DataFrame, weight_col: str, k: int,
                         id_col: str = "doc_id",
                         seed: str = "") -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-Res): each row draws priority ``u ** (1 / w)`` from its hash
    uniform ``u`` and weight ``w``; the k largest priorities are the
    sample.  Inclusion probability is proportional to weight, and the
    whole draw is reproducible from (seed, ids, weights) alone.

    Rows with non-positive or null weight are excluded (their
    priority would be 0).  The sort is ``orderBy(...).limit(k)`` —
    Spark executes TakeOrderedAndProject, a per-partition top-k heap
    merged on the driver, so no global shuffle materializes.

    Returns ``(id, weight, priority, rank)`` with priority rounded
    for display; the rank is computed on full precision."""
    key = f"md5(concat('{seed}', ':', cast(`{id_col}` as string)))"
    u = F.expr(hex_uniform_sql(key))
    w = F.col(weight_col).cast("double")
    pri = F.pow(u, F.lit(1.0) / w)
    ranked = (df.filter(w.isNotNull() & (w > 0))
                .select(F.col(id_col), w.alias("weight"),
                        pri.alias("_pri"))
                .orderBy(F.desc("_pri"), F.asc(id_col))
                .limit(k))
    # row_number AFTER the limit: the window sees only k rows
    from pyspark.sql import Window
    rw = Window.orderBy(F.desc("_pri"), F.asc(id_col))
    return (ranked.withColumn("rank", F.row_number().over(rw))
                  .select(id_col, "weight",
                          F.col("_pri").alias("priority"), "rank"))


def mix_to_target(df: DataFrame, strata_col: str,
                  targets: dict[str, float],
                  id_col: str = "doc_id", seed: str = "",
                  strict: bool = True) -> DataFrame:
    """Resample a corpus to TARGET mixture proportions (domain /
    language reweighting, the data-mixing step of a training
    pipeline): the output's per-stratum composition approximates
    ``targets`` (fractions over the listed strata), sampling WITHOUT
    replacement, keeping the largest total the targets admit.

    The achievable total is ``N* = min over strata of (count_s /
    target_s)`` — the stratum that would need oversampling pins the
    scale; every stratum then keeps ``target_s · N* / count_s`` of its
    rows via the same lexicographic md5-hex threshold as
    :func:`hash_sample`, so the draw is reproducible from (ids, seed,
    targets) alone.  Strata absent from ``targets`` are dropped (the
    targets define the output universe).  A TARGET stratum absent
    from the corpus makes the request infeasible; ``strict=True``
    (the DEFAULT — round-4 advice: a silently-empty batch output is
    easy to miss downstream) raises naming the missing strata.
    ``strict=False`` opts into the best-effort contract instead: N* =
    0 and the result is EMPTY rather than a mixture that quietly
    misses the target.

    Plan: the per-stratum counts are one partial-aggregated groupBy
    (a scan that reads ONLY the stratum column after pruning), the
    rate table is a few rows broadcast back onto the corpus, and the
    final filter is map-side — one column scan + one full scan at
    100 TB either way (under strict the tiny counts table is
    collected for the check and re-enters the plan as literals, so
    nothing is scanned twice).  The hex threshold quantizes rates
    exactly like :func:`rate_threshold` (floor to 32-bit hex) so an
    external SQL oracle reproduces the selected id set bit-for-bit.
    """
    spark = df.sparkSession
    bad = {k: v for k, v in targets.items() if v <= 0}
    if bad:
        raise ValueError(f"target fractions must be positive: {bad}")
    tgt = spark.createDataFrame(
        [(k, float(v)) for k, v in targets.items()],
        f"`{strata_col}` string, _tf double")
    # LEFT join from the targets side: a target stratum ABSENT from
    # the corpus must reach the N* reduction as count 0 (N* = 0 → an
    # empty result), not silently drop out of the min — an inner join
    # here made the output mixture quietly ignore infeasible targets
    counts = (tgt.join(df.groupBy(strata_col)
                         .agg(F.count(F.lit(1)).cast("double")
                               .alias("_n")),
                       strata_col, "left")
                 .withColumn("_n", F.coalesce("_n", F.lit(0.0))))
    if strict:
        got = counts.collect()
        missing = [r[strata_col] for r in got if r["_n"] == 0]
        if missing:
            raise ValueError(
                f"mix_to_target: target strata absent from the corpus "
                f"(no rows to sample): {sorted(missing)}; pass "
                f"strict=False for the best-effort (empty-result) "
                f"contract")
        # feed the checked counts back as LITERALS — the downstream
        # rate arithmetic runs the identical Column expressions over
        # the identical doubles, and the stratum column isn't scanned
        # a second time for the check
        counts = spark.createDataFrame(got, counts.schema)
    nstar = counts.agg(F.min(F.col("_n") / F.col("_tf")).alias("_nstar"))
    # rate = (target · N*) / count, in THIS multiply-then-divide order
    # (both engines run the identical IEEE sequence)
    rate = F.least(F.col("_tf") * F.col("_nstar") / F.col("_n"),
                   F.lit(1.0))
    thr = F.lpad(F.lower(F.hex(
        F.least(F.floor(rate * F.lit(float(16 ** 8))).cast("long"),
                F.lit(16 ** 8 - 1)))), 8, "0")
    rates = counts.crossJoin(F.broadcast(nstar)) \
                  .select(strata_col, thr.alias("_thr"))
    h = F.substring(_md5_key(id_col, seed), 1, 8)
    return (df.join(F.broadcast(rates), strata_col)
              .filter(h < F.col("_thr"))
              .drop("_thr"))

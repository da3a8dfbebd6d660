"""Mergeable sketches — the 10^12-row statistics layer of the engine.

Three families, all partition-mergeable (build per partition, merge
without rescanning — the property that makes a 100 TB metrics manifest
updatable instead of recomputed):

- **Bloom filter** in pure Column algebra (``bloom_filter_agg`` is not
  in PySpark's public function registry): k = ``n_hashes`` bit
  positions per key from ``xxhash64(key, i)``, folded into 64-bit
  bitmap words with ``bit_or`` (a partial aggregate — map-side
  combined, tiny shuffle of ≤ ``n_bits/64`` rows).  The finalized
  filter is ONE row holding a dense ``array<long>`` of words
  (~130 KB at 2^20 bits), broadcastable at any corpus size.  Used by
  :func:`referential_bloom`: membership of a 10^12-row fact column in
  a dimension too large to broadcast, with ZERO shuffle of the fact
  table — the classic anti-join shuffles every fact row on the key.
  One-sided error: a reported orphan is definitely an orphan (no
  false violations); a true orphan is missed with probability
  ≈ (n_keys·n_hashes/n_bits)^n_hashes (choose ``n_bits`` ≈ 10 bits
  per key for ~1e-5 at k=5).

- **HLL cardinality manifests** over Spark's Apache-DataSketches
  functions (``hll_sketch_agg`` / ``hll_union_agg``): per-partition
  distinct-count sketches stored as binary columns; epoch manifests
  union into a global estimate without touching the data again.
  This is the scale path for the north-rule "distinct/HLL
  cardinality" stat (joi ``array().unique()`` cardinality semantics,
  reference lib/types/array.js:468-558, relaxed to an estimate).

- **Quantile-grid drift** (Wasserstein-1): per-epoch quantile vectors
  compared against a baseline epoch — W1 ≈ mean |q_e(u) − q_b(u)|
  over a midpoint grid.  ``exact=True`` uses ``percentile`` (exact
  sort-based, oracle-reproducible); the default uses
  ``approx_percentile`` (KLL sketch — a partial aggregate whose
  state is bounded, the only viable form at 10^12 rows).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from joi_spark.operators.dataset import _violation_cols

__all__ = [
    "bloom_build", "bloom_finalize", "bloom_merge", "bloom_probe",
    "referential_bloom", "cardinality_manifest", "cardinality_merge",
    "quantile_drift",
]


# ---------------------------------------------------------------------------
# Bloom filter (pure Column algebra, partition-mergeable bitmap words)
# ---------------------------------------------------------------------------

def _positions(col: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """k independent bit positions per key: xxhash64 of (value, i).

    The key canonicalizes through a string cast first — xxhash64 hashes
    the binary representation, so an int32 fact column probed against a
    filter built from an int64 dimension would otherwise silently never
    match."""
    s = col.cast("string")
    return [F.pmod(F.xxhash64(s, F.lit(i)), F.lit(n_bits)).cast("long")
            for i in range(n_hashes)]


def bloom_build(df: DataFrame, col: str, *, n_bits: int = 1 << 20,
                n_hashes: int = 5,
                partition_col: str | None = None) -> DataFrame:
    """Word-table form of the filter: ``(word_idx, bits)`` — the
    MERGEABLE representation.  ``bit_or`` is a partial aggregate, so
    the shuffle moves at most ``n_bits/64`` partial rows per map task,
    never the keys themselves.

    With ``partition_col`` the output carries one filter per partition
    (``(partition, word_idx, bits)``) — build incrementally per epoch,
    merge with :func:`bloom_merge`.
    """
    keys = [partition_col] if partition_col else []
    pos = (df.filter(F.col(col).isNotNull())
             .select(*keys, F.explode(F.array(
                 *_positions(F.col(col), n_bits, n_hashes))).alias("p")))
    word = F.shiftright(F.col("p"), 6).alias("word_idx")
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT))")
    return (pos.groupBy(*keys, word)
               .agg(F.bit_or(bit).alias("bits")))


def bloom_merge(words: DataFrame,
                partition_col: str | None = None) -> DataFrame:
    """OR word tables together — union of the underlying key sets.
    Pass the per-partition build to fold epochs into one filter."""
    drop = [partition_col] if partition_col else []
    return (words.drop(*drop)
                 .groupBy("word_idx")
                 .agg(F.bit_or("bits").alias("bits")))


def bloom_finalize(words: DataFrame, *, n_bits: int) -> DataFrame:
    """One-row broadcastable form: a DENSE ``array<long>`` of
    ``n_bits/64`` words (≈130 KB for a 1M-bit filter).

    Dense, not a map, deliberately: Spark's ``element_at`` on MapType
    LINEAR-SCANS the entries, so a sparse-map filter would cost
    O(words) per probe per hash — measured 6.5 s vs 0.6 s on a 600k-row
    probe at 2^20 bits, and growing with ``n_bits``.  Array indexing
    is O(1) regardless of filter size.

    Densification unions an all-zero word per index BEFORE the fold
    (so every slot exists) and sorts once — an O(n log n) shuffle of
    ≤ ``n_bits/64`` tiny rows.  The obvious alternative
    (``transform(sequence(n_words), i -> element_at(map, i))``) is
    O(n_words²) map scans on a single row — measured 9.7 s vs 3.1 s
    for the same sf0.1 query at 2^20 bits."""
    n_words = (n_bits + 63) // 64
    zeros = words.sparkSession.range(n_words).select(
        F.col("id").alias("word_idx"),
        F.lit(0).cast("long").alias("bits"))
    full = (words.select("word_idx", "bits").unionByName(zeros)
                 .groupBy("word_idx").agg(F.bit_or("bits").alias("bits")))
    dense = F.transform(
        F.array_sort(F.collect_list(F.struct("word_idx", "bits"))),
        lambda s: s["bits"])
    return full.agg(dense.alias("__bm"))


def bloom_probe(df: DataFrame, col: str, bloom: DataFrame, *,
                n_bits: int, n_hashes: int,
                result_col: str = "bloom_maybe") -> DataFrame:
    """Append ``result_col``: true iff ``col`` MAY be in the filter's
    key set (false ⇒ definitely absent).  NULL keys probe to NULL.

    The finalized filter joins in as a broadcast single row — the
    probed table is never shuffled (plan-pinned in tests).
    """
    probed = df.join(F.broadcast(bloom), F.lit(True), "left")
    conds = []
    for i, p in enumerate(_positions(F.col(col), n_bits, n_hashes)):
        probed = probed.withColumn(f"__p{i}", p)
        # O(1) dense-array index (1-based element_at on ArrayType)
        conds.append(
            f"(element_at(__bm, CAST(shiftright(__p{i}, 6) AS INT) + 1) "
            f"& shiftleft(CAST(1 AS BIGINT), "
            f"CAST(pmod(__p{i}, 64) AS INT))) <> 0")
    maybe = F.when(F.col(col).isNull(), F.lit(None).cast("boolean")) \
             .otherwise(F.expr(" AND ".join(conds)))
    drops = ["__bm"] + [f"__p{i}" for i in range(n_hashes)]
    return probed.withColumn(result_col, maybe).drop(*drops)


def referential_bloom(df: DataFrame, col: str, dim: DataFrame,
                      dim_col: str, *,
                      order_by: Sequence[str] = ("conv_id", "turn_idx"),
                      n_bits: int = 1 << 20, n_hashes: int = 5,
                      seq: int = 1011) -> DataFrame:
    """FK resolution against a dimension too large to broadcast —
    joi ``link()`` semantics (reference: lib/types/link.js:35-59) at
    the scale where :func:`~joi_spark.operators.dataset.referential`'s
    anti-join would shuffle the whole fact table.

    The dimension folds into a ``n_bits``-bit Bloom filter (a few
    hundred KB broadcast regardless of dimension size); fact rows
    failing the probe are DEFINITE orphans (the filter has no false
    negatives for its key set), emitted with zero fact-table shuffle.
    One-sided: an orphan slips through with probability ≈
    ``(k·n_keys/n_bits)^k`` — size ``n_bits`` ≥ 10·n_keys to make
    that ~1e-5, or follow with the exact anti-join on a sampled audit
    partition.  NULLs pass (absence ≠ broken link), as in
    ``referential``.
    """
    from joi_spark import errors as E
    bloom = bloom_finalize(bloom_build(dim, dim_col, n_bits=n_bits,
                                       n_hashes=n_hashes), n_bits=n_bits)
    probed = bloom_probe(df.filter(F.col(col).isNotNull()), col, bloom,
                         n_bits=n_bits, n_hashes=n_hashes,
                         result_col="__maybe")
    msg = E.render_static("dataset.link", {"label": col})
    bad = probed.filter(~F.col("__maybe"))
    return bad.select(*_violation_cols(list(order_by), seq, "dataset.link",
                                       col, msg))


# ---------------------------------------------------------------------------
# HLL cardinality manifests (Apache DataSketches — mergeable binaries)
# ---------------------------------------------------------------------------

def cardinality_manifest(df: DataFrame, columns: Sequence[str], *,
                         partition_col: str, lgk: int = 12) -> DataFrame:
    """Per-partition distinct-cardinality manifest:
    ``(partition, column, n_rows, sketch, estimate)`` — ``sketch`` is
    the serialized HLL (relative error ≈ 1.04/√2^lgk ≈ 1.6% at the
    default lgk=12; constant ~2.5 KB state per column regardless of
    scale).  Persist the sketch column with the manifest: new epochs
    append their own rows and the global estimate re-merges from the
    manifest alone (:func:`cardinality_merge`) — the data is never
    rescanned.
    """
    columns = list(columns)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs.append(F.hll_sketch_agg(F.col(c).cast("string"), lgk)
                     .alias(f"{c}__sk"))
    wide = df.groupBy(F.col(partition_col).alias("partition")).agg(*aggs)
    stacks = [F.struct(F.lit(c).alias("column"),
                       F.col("n_rows"),
                       F.col(f"{c}__sk").alias("sketch"),
                       F.hll_sketch_estimate(f"{c}__sk").alias("estimate"))
              for c in columns]
    return (wide.select("partition",
                        F.explode(F.array(*stacks)).alias("s"))
                .select("partition", "s.*"))


def cardinality_merge(manifest: DataFrame) -> DataFrame:
    """Fold a manifest's sketches to global per-column estimates:
    ``(column, n_rows, estimate)``.  Runs on the manifest (one tiny
    row per partition×column), not the data."""
    return (manifest.groupBy("column")
                    .agg(F.sum("n_rows").alias("n_rows"),
                         F.hll_sketch_estimate(
                             F.hll_union_agg("sketch", True))
                          .alias("estimate")))


# ---------------------------------------------------------------------------
# Quantile-grid drift (Wasserstein-1 between epochs)
# ---------------------------------------------------------------------------

def quantile_drift(df: DataFrame, column: str, *, epoch_col: str = "epoch",
                   baseline_epoch=None, n_quantiles: int = 20,
                   exact: bool = False) -> DataFrame:
    """Wasserstein-1 distance of ``column`` between every epoch and the
    baseline epoch, via the quantile-function integral
    W1 = ∫₀¹ |Q_e(u) − Q_b(u)| du ≈ mean over a midpoint grid of
    ``n_quantiles`` points.  Complements PSI/KS (bucket-fraction
    based): W1 is in the UNITS of the column, so "prices drifted by
    ~$12" instead of a unitless index.

    Default path: ``approx_percentile`` — a KLL sketch, partial
    aggregate, bounded state — the only viable form at 10^12 rows.
    ``exact=True`` switches to sort-based ``percentile`` for
    external-oracle reproducibility at test scale.  Everything after
    the per-epoch aggregate is a tiny epoch×grid table (broadcast
    joins).
    """
    grid = [(i + 0.5) / n_quantiles for i in range(n_quantiles)]
    pcts = F.array(*[F.lit(p) for p in grid])
    col = F.col(column).cast("double")
    agg = (F.percentile(col, pcts) if exact
           else F.expr(f"approx_percentile(CAST({column} AS DOUBLE), "
                       f"array({','.join(str(p) for p in grid)}), 10000)"))
    per = (df.filter(col.isNotNull())
             .groupBy(F.col(epoch_col).alias("epoch"))
             .agg(agg.alias("qs")))
    if baseline_epoch is None:
        baseline_epoch = df.agg(F.min(epoch_col)).first()[0]
    long = per.select("epoch", F.posexplode("qs").alias("qi", "q"))
    base = (long.filter(F.col("epoch") == F.lit(baseline_epoch))
                .select("qi", F.col("q").alias("qb")))
    cur = long.filter(F.col("epoch") != F.lit(baseline_epoch))
    return (cur.join(F.broadcast(base), "qi")
               .groupBy("epoch")
               .agg(F.avg(F.abs(F.col("q") - F.col("qb")))
                     .alias("w1"))
               .withColumn("column", F.lit(column))
               .withColumn("baseline_epoch",
                           F.lit(baseline_epoch).cast("string"))
               .select("column", "epoch", "baseline_epoch", "w1")
               .orderBy("epoch"))

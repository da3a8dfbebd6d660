"""Corpus-pipeline utilities: PII scrubbing and deterministic
train/val/test splitting.

These are the two remaining steps a training-data pipeline runs after
profiling/dedup (reference's string format family, lib/types/string/
index.js:211-366, supplies the per-value *validators*; scrubbing is
the corpus-level redaction counterpart).  Both are map-only
projections — no shuffle, no UDF, whole-stage-codegen eligible —
so they hold trivially at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Embedded (un-anchored) PII patterns.  Deliberately RE2-safe — no
# lookaround, no backreferences — so the DuckDB oracle runs these
# LITERAL pattern strings; this module is the single source of truth.
# The validation-grade anchored grammars live in functions/regexes.py;
# redaction wants embedded practical patterns, and `card_like` is the
# conservative digit-run form (no per-match Luhn — documented
# over-match is the standard scrubbing tradeoff).
#
# Order matters and is part of the contract: counts are measured on
# the PROGRESSIVELY-redacted text (count, replace, next pattern), so
# an SSN consumed by the ssn pattern can no longer match phone/card
# forms.  Both engines apply the same sequence → identical outputs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("guid", r"\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
             r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\b", "[GUID]"),
    ("ip", r"\b(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
           r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b", "[IP]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\+\d{7,15}\b|\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("card_like", r"\b\d{13,19}\b", "[CARD]"),
]


def pii_scrub(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id",
              categories: list[str] | None = None) -> DataFrame:
    """Redact PII from ``text_col`` and count what was removed:
    ``(id, text, n_<category>..., n_pii)`` where ``text`` is the
    redacted document.

    One chained ``regexp_count`` + ``regexp_replace`` projection per
    category, evaluated in :data:`PII_PATTERNS` order on the
    progressively-redacted text.  Map-only; JVM regex engine; no UDF.
    """
    pats = [(c, p, r) for c, p, r in PII_PATTERNS
            if categories is None or c in categories]
    cur: Column = F.col(text_col)
    counts: list[Column] = []
    for cat, pat, repl in pats:
        counts.append(F.regexp_count(cur, F.lit(pat))
                       .cast("bigint").alias(f"n_{cat}"))
        cur = F.regexp_replace(cur, pat, repl)
    total = None
    for c in counts:
        total = c if total is None else total + c
    return df.select(F.col(id_col), cur.alias(text_col), *counts,
                     total.cast("bigint").alias("n_pii"))


def hash_split(df: DataFrame, id_col: str = "doc_id",
               weights: dict[str, float] | None = None,
               seed: str = "") -> DataFrame:
    """Deterministic train/val/test assignment: adds a ``split``
    column keyed ONLY on ``md5(seed || ':' || id)`` — stable under
    repartitioning, resharding, re-runs, and engine changes (the
    property `df.sample()` does NOT have; sample's output depends on
    partition layout, which is exactly what you cannot rely on at
    100 TB).

    The first 8 md5 hex chars are compared lexicographically against
    cumulative-weight thresholds (hex strings compare like the
    underlying uniform integer, and the comparison is
    engine-portable — no hex→int cast needed).  The last split is the
    CASE ladder's ELSE, so weights that sum to 1.0 cover the space
    exactly.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError("split weights must sum to 1.0")
    h = F.substring(
        F.md5(F.concat(F.lit(seed), F.lit(":"),
                       F.col(id_col).cast("string"))), 1, 8)
    names = list(weights)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += weights[name]
        thr = format(int(cum * 16 ** 8), "08x")
        branch = h < F.lit(thr)
        expr = (F.when(branch, F.lit(name)) if expr is None
                else expr.when(branch, F.lit(name)))
    expr = (expr.otherwise(F.lit(names[-1])) if expr is not None
            else F.lit(names[-1]))
    return df.withColumn("split", expr)


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", *,
                    chunk_tokens: int = 128,
                    overlap: int = 0) -> DataFrame:
    """Split documents into fixed-size whitespace-token windows with
    optional overlap — the standard pre-training/embedding prep step:
    ``(id, chunk_idx, n_chunk_tokens, chunk)``.

    Stride is ``chunk_tokens - overlap``; the last window may be
    short; a document shorter than one window yields exactly one
    chunk; empty / whitespace-only / NULL documents yield ZERO chunks
    (posexplode of an empty or null array emits no rows).  Map-only
    ``transform`` over a start-index sequence + ``posexplode`` — the
    50×-ish row amplification happens AFTER the scan inside the same
    stage, so input splits parallelize it and nothing shuffles.
    """
    from joi_spark.operators.text import tokens

    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    # shared whitespace tokenizer (text.py), minus the split('')→['']
    # artifact so empty docs produce an empty token array
    toks = F.filter(tokens(F.col(text_col)),
                    lambda x: x != F.lit(""))
    n = F.size(toks)
    # windows: 0 for empty docs, else 1 + ceil(max(0, n - chunk)/stride)
    # (the when-guard also avoids sequence(0, -1)'s descending surprise)
    n_win = (F.lit(1) + F.ceil(
        F.greatest(n - chunk_tokens, F.lit(0)) / stride)).cast("int")
    starts = F.when(n > 0, F.sequence(F.lit(0), n_win - 1))
    window = lambda i: F.slice(toks, i * stride + 1, chunk_tokens)  # noqa: E731
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            F.array_join(window(i), " ").alias("chunk"),
            # token count comes from the slice itself — no second
            # regex pass over the amplified output text
            F.size(window(i)).cast("bigint").alias("n")))
    out = df.select(F.col(id_col), F.posexplode(chunks)
                    .alias("chunk_idx", "_c"))
    return out.select(
        id_col, "chunk_idx",
        F.col("_c.n").alias("n_chunk_tokens"),
        F.col("_c.chunk").alias("chunk"))


def pack_sequences(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", *,
                   capacity: int = 512,
                   n_shards: int = 8,
                   shard_expr: Column | None = None) -> DataFrame:
    """Contiguous concat-then-split packing of documents into
    fixed-capacity context windows — the standard pre-training batch
    layout: documents are laid end-to-end in a deterministic order and
    the token stream is cut every ``capacity`` tokens.  Output is one
    row per document: ``(id, shard, n_tokens, start_offset, pack_id,
    straddles)`` where ``start_offset`` is the document's position in
    its shard's concatenated token stream, ``pack_id =
    floor(start_offset / capacity)`` is the window its FIRST token
    lands in, and ``straddles`` marks documents cut by a window
    boundary.

    Sharding bounds the sequential portion: the running sum is a
    window over ``shard`` ordered by ``id`` — one hash shuffle on the
    shard key, then an in-partition sort + prefix sum.  At cluster
    scale ``n_shards`` is sized to executor count (each shard is an
    independent token stream, as in any sharded training corpus);
    assignment defaults to ``id % n_shards`` so it is reshard-stable
    and engine-portable, like :func:`hash_split`.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                    lambda x: x != F.lit(""))
    # size(NULL) is -1 under legacy sizeOfNull; null docs carry 0 tokens
    n = F.greatest(F.size(toks), F.lit(0)).cast("bigint")
    shard = (shard_expr if shard_expr is not None
             else F.pmod(F.col(id_col).cast("bigint"), F.lit(n_shards)))
    base = df.select(F.col(id_col), shard.alias("shard"),
                     n.alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (base.withColumn("start_offset", start.cast("bigint"))
                .withColumn("pack_id",
                            F.floor(F.col("start_offset") / capacity)
                             .cast("bigint"))
                .withColumn("straddles",
                            (F.col("start_offset") % capacity
                             + F.col("n_tokens")) > capacity))


def split_thresholds(weights: dict[str, float], seed: str = "") -> str:
    """The DuckDB CASE expression equivalent of :func:`hash_split`'s
    assignment for oracle generation — same thresholds, same md5 key.
    ``{id}`` is left as a placeholder for the id column expression."""
    names = list(weights)
    cum = 0.0
    whens = []
    for name in names[:-1]:
        cum += weights[name]
        thr = format(int(cum * 16 ** 8), "08x")
        whens.append(
            f"WHEN substr(md5('{seed}' || ':' || CAST({{id}} AS VARCHAR)),"
            f" 1, 8) < '{thr}' THEN '{name}'")
    return "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"


def corpus_report(df: DataFrame, *, group_col: str = "source",
                  text_col: str = "text", id_col: str = "doc_id",
                  lang_col: str = "lang") -> DataFrame:
    """Per-group corpus "data card": the one-table summary a training
    pipeline publishes next to a dataset — ``(group, n_docs,
    n_tokens, avg_tokens, min_tokens, max_tokens, dup_docs,
    dup_frac, n_langs, top_lang)``.

    ``dup_docs`` counts docs whose EXACT text occurs in ≥2 documents
    corpus-wide (cross-group duplicates count in every group holding
    a copy); ``top_lang`` is the group's modal language, ties to the
    lexicographically smaller code.

    Shuffle shape: one (md5-of-text) aggregate for the global dup
    set (16-byte keys, partial-agg'd), an equi-join back, then ONE
    grouped aggregate per output table + a tiny (group, lang) modal
    aggregate — all map-side combined; no window over raw docs, no
    driver loop.  Null texts count as docs with 0 tokens and never
    as duplicates.
    """
    from joi_spark.operators.text import token_count
    h = F.md5(F.col(text_col))
    base = df.select(
        F.col(id_col), F.col(group_col).alias("grp"),
        F.col(lang_col).alias("_lang"),
        # NOT coalesce: with ANSI off, size(NULL) is -1 (legacy
        # sizeOfNull), so a null doc would contribute -1 tokens
        F.when(F.col(text_col).isNull(), F.lit(0))
         .otherwise(token_count(F.col(text_col))).alias("_ntok"),
        h.alias("_h"))
    dups = (base.filter(F.col("_h").isNotNull())
                .groupBy("_h").agg(F.count(F.lit(1)).alias("_copies"))
                .filter(F.col("_copies") >= 2)
                .select("_h", F.lit(1).alias("_dup")))
    marked = base.join(dups, "_h", "left")
    stats = (marked.groupBy("grp")
                   .agg(F.count(F.lit(1)).alias("n_docs"),
                        F.sum("_ntok").alias("n_tokens"),
                        F.avg("_ntok").alias("avg_tokens"),
                        F.min("_ntok").alias("min_tokens"),
                        F.max("_ntok").alias("max_tokens"),
                        F.count("_dup").alias("dup_docs"),
                        F.countDistinct("_lang").alias("n_langs")))
    # raw doubles, no presentation rounding: callers that need a
    # cross-engine hash-stable value derive it from the EXACT integer
    # counters (n_tokens/n_docs/dup_docs) — rounding here would bake
    # one engine's decimal-rounding dialect into the result
    stats = stats.withColumn(
        "dup_frac", F.col("dup_docs") / F.col("n_docs"))
    lang_counts = (base.filter(F.col("_lang").isNotNull())
                       .groupBy("grp", "_lang")
                       .agg(F.count(F.lit(1)).alias("_lc")))
    w = Window.partitionBy("grp").orderBy(F.desc("_lc"), F.asc("_lang"))
    top = (lang_counts.withColumn("_rk", F.row_number().over(w))
                      .filter(F.col("_rk") == 1)
                      .select("grp", F.col("_lang").alias("top_lang")))
    return (stats.join(top, "grp", "left")
                 .select(F.col("grp").alias(group_col),
                         "n_docs", "n_tokens", "avg_tokens",
                         "min_tokens", "max_tokens", "dup_docs",
                         "dup_frac", "n_langs", "top_lang"))

"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID, and document fingerprinting.

These extend the reference's string rule family (reference:
lib/types/string/index.js — per-value regex/length predicates) to
corpus-level document profiling.  Everything is built-in Spark SQL
expressions / higher-order functions — JVM-side, whole-stage-codegen
eligible, embarrassingly parallel (no shuffle at all for per-document
metrics; one narrow projection per document).

Scale: per-doc metrics are map-only — they hold trivially at 100 TB.
Language-ID uses fixed broadcast-literal stopword arrays (no dimension
join needed at this list size).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOKEN_RE = r"\s+"

# function-word lists per language — the classic n-gram/stopword
# heuristic; deterministic, JVM-evaluated.  ~20 highest-frequency
# function words per language (public frequency lists); the lang_id
# ORACLE SQL is generated from this same dict
# (__spark_entry__._lang_id_oracle) so the two can never drift.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "you",
           "that", "he", "was", "for", "on", "are", "as", "with",
           "his", "they", "at"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit",
           "den", "von", "nicht", "sie", "sich", "des", "auf",
           "für", "im", "dem", "ich", "es"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se",
           "no", "por", "con", "para", "una", "su", "al", "lo",
           "como", "más", "pero"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est",
           "en", "du", "que", "pour", "dans", "ce", "il", "qui",
           "ne", "sur", "se", "pas"],
    "zh": ["的", "了", "是", "我", "不", "在", "有", "人", "他",
           "这", "中", "大", "来", "上", "国", "个", "到", "说",
           "们", "为"],
}
LANG_ORDER = ["en", "de", "es", "fr", "zh"]  # deterministic tie-break


def tokens(col: Column) -> Column:
    """Whitespace tokenization as an array column."""
    return F.split(F.trim(col), TOKEN_RE)


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def text_metrics(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document quality metrics — one narrow projection:
    ``(id, n_chars, n_tokens, avg_token_len, punct_frac,
    uniq_token_frac)``.  Map-only; no shuffle."""
    col = F.col(text_col)
    toks = tokens(col)
    n_chars = F.length(col)
    n_tokens = F.size(toks)
    alnum = F.regexp_replace(col, "[^a-zA-Z0-9 ]", "")
    return df.select(
        F.col(id_col),
        n_chars.cast("bigint").alias("n_chars"),
        n_tokens.cast("bigint").alias("n_tokens"),
        ((n_chars - (n_tokens - 1)) / n_tokens)
         .alias("avg_token_len"),
        ((n_chars - F.length(alnum)) / n_chars).alias("punct_frac"),
        (F.size(F.array_distinct(toks)) / n_tokens)
         .alias("uniq_token_frac"),
    )


def stopword_fraction(col: Column, words: list[str]) -> Column:
    """Fraction of tokens that appear in ``words`` (broadcast literal
    set — a higher-order filter, no join)."""
    toks = tokens(F.lower(col))
    hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    return hits / F.size(toks)


def language_id(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Stopword-scoring language identification:
    score(lang) = fraction of tokens in lang's function-word list;
    prediction = argmax with fixed priority-order tie-break.

    Returns ``(id, lang_pred, lang_score)``.  Map-only projection —
    one pass, all languages scored in the same row expression.
    """
    col = F.col(text_col)
    scores = {lang: stopword_fraction(col, STOPWORDS[lang])
              for lang in LANG_ORDER}
    pred = None
    for lang in LANG_ORDER:
        s = scores[lang]
        cond = F.lit(True)
        for other in LANG_ORDER:
            if other != lang:
                cond = cond & (s >= scores[other])
        pred = F.when(cond, F.lit(lang)) if pred is None \
            else pred.when(cond, F.lit(lang))
    best = F.greatest(*scores.values())
    return df.select(F.col(id_col), pred.alias("lang_pred"),
                     best.alias("lang_score"))


BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_stats(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Token counting two ways (north-rule text-analysis family):
    whitespace tokens and a BPE-ish regex segmentation (letter runs /
    digit runs / single punctuation — the classic pre-tokenizer
    shape), plus chars-per-token.  Map-only projection — one
    ``regexp_extract_all`` per row, no shuffle."""
    col = F.col(text_col)
    ws = F.size(tokens(col))
    pieces = F.regexp_extract_all(col, F.lit(BPE_ISH_RE), 0)
    n_pieces = F.size(pieces)
    return df.select(
        F.col(id_col),
        ws.cast("bigint").alias("ws_tokens"),
        n_pieces.cast("bigint").alias("bpe_ish_tokens"),
        (F.length(col) / F.nullif(n_pieces, F.lit(0)))
         .alias("chars_per_token"))


def quality_filter(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", *,
                   min_chars: int = 20, max_punct_frac: float = 0.3,
                   min_uniq_token_frac: float = 0.3,
                   langs: list[str] | None = None) -> DataFrame:
    """Composite training-data quality gate — the keep/drop step a
    corpus pipeline runs after profiling: ``(id, keep, reasons)``
    where ``reasons`` lists every failed criterion (empty when kept).

    Thresholds follow the common published heuristics (length floor,
    punctuation ceiling, repetition via unique-token ratio, optional
    language allow-list).  One map-only projection — the metrics and
    language scores compute inline; no join with the profiling
    outputs needed."""
    col = F.col(text_col)
    toks = tokens(col)
    n_chars = F.length(col)
    n_tokens = F.size(toks)
    alnum = F.regexp_replace(col, "[^a-zA-Z0-9 ]", "")
    punct_frac = (n_chars - F.length(alnum)) / n_chars
    uniq_frac = F.size(F.array_distinct(toks)) / n_tokens
    checks = [
        (n_chars >= min_chars, f"too_short:<{min_chars}"),
        (punct_frac <= max_punct_frac, f"punct:>{max_punct_frac}"),
        (uniq_frac >= min_uniq_token_frac,
         f"repetitive:<{min_uniq_token_frac}"),
    ]
    if langs:
        scores = [stopword_fraction(col, STOPWORDS[lang])
                  for lang in langs]
        best_allowed = F.greatest(*scores) if len(scores) > 1 else scores[0]
        all_scores = [stopword_fraction(col, STOPWORDS[lang])
                      for lang in LANG_ORDER]
        best_any = F.greatest(*all_scores)
        checks.append((best_allowed >= best_any,
                       "lang:" + ",".join(langs)))
    reasons = F.filter(
        F.array(*[F.when(~F.coalesce(ok, F.lit(False)), F.lit(tag))
                  for ok, tag in checks]),
        lambda x: x.isNotNull())
    return df.select(F.col(id_col), (F.size(reasons) == 0).alias("keep"),
                     reasons.alias("reasons"))


def _run_stats(sorted_arr: Column) -> Column:
    """Single-pass duplicate/run statistics over an already-sorted
    string array — one ``F.aggregate`` fold, O(len) after the O(n log n)
    sort, entirely JVM-side.

    Equal elements are adjacent after the sort, so duplicate accounting
    is run-length accounting: when a run reaches length 2 both
    occurrences become duplicates (+2), every further repeat adds one.
    Tracks ``(dup_occ, dup_chars, best_run, best)`` where ``best`` is
    the most frequent element — ties broken toward the lexicographically
    smallest, because the fold scans in sorted order and only a strictly
    longer run replaces the incumbent."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("dup_occ"),
        F.lit(0).cast("bigint").alias("dup_chars"),
        F.lit(0).cast("bigint").alias("best_run"),
        F.lit(None).cast("string").alias("best"),
    )

    def merge(acc, x):
        new_run = (F.when(acc["prev"].eqNullSafe(x), acc["run"] + 1)
                    .otherwise(F.lit(1)).cast("bigint"))
        occ_add = (F.when(new_run == 2, F.lit(2))
                    .when(new_run > 2, F.lit(1))
                    .otherwise(F.lit(0)).cast("bigint"))
        better = new_run > acc["best_run"]
        return F.struct(
            x.alias("prev"), new_run.alias("run"),
            (acc["dup_occ"] + occ_add).alias("dup_occ"),
            (acc["dup_chars"] + occ_add * F.length(x)).alias("dup_chars"),
            F.when(better, new_run).otherwise(acc["best_run"])
             .alias("best_run"),
            F.when(better, x).otherwise(acc["best"]).alias("best"),
        )

    return F.aggregate(
        sorted_arr, init, merge,
        lambda acc: F.struct(acc["dup_occ"].alias("dup_occ"),
                             acc["dup_chars"].alias("dup_chars"),
                             acc["best_run"].alias("best_run"),
                             acc["best"].alias("best")))


def word_ngrams(col: Column, n: int) -> Column:
    """Word n-grams of ``col`` as a space-joined string array (empty
    when the document has fewer than ``n`` tokens — the guard also
    avoids Spark's descending ``sequence(1, 0)`` surprise)."""
    toks = tokens(col)
    t = F.size(toks)
    grams = F.transform(F.sequence(F.lit(1), t - n + 1),
                        lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(t >= n, grams).otherwise(
        F.array().cast("array<string>"))


def repetition_signals(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", *,
                       ngram_n: int = 2) -> DataFrame:
    """Repetition-based quality signals in the style of the published
    web-corpus filtering heuristics (duplicate-line fraction and
    most-frequent-n-gram character coverage — the Gopher/C4-family
    rules): ``(id, n_lines, dup_line_frac, dup_line_char_frac,
    top_ngram, top_ngram_frac, dup_ngram_frac)``.

    - ``dup_line_frac`` — fraction of non-empty line *occurrences*
      whose line text appears more than once in the document.
    - ``dup_line_char_frac`` — same, weighted by line length in chars.
    - ``top_ngram`` / ``top_ngram_frac`` — the most frequent word
      ``ngram_n``-gram (count ties → lexicographically smallest) and
      the fraction of document characters its occurrences cover
      (``count * length(gram) / n_chars``; overlapping occurrences make
      >1.0 possible for pathological inputs — it is a signal, not a
      probability).
    - ``dup_ngram_frac`` — fraction of n-gram occurrences that are
      duplicates.

    Scale: map-only projection — per-document ``array_sort`` +
    single-pass ``aggregate`` folds (O(T log T) per doc), no shuffle,
    no UDF; holds trivially at 100 TB.  This is deliberately NOT the
    explode → groupBy(doc, gram) formulation: that shuffles every
    token of the corpus, while per-row higher-order functions keep the
    whole computation inside one codegen'd stage."""
    col = F.col(text_col)
    lines = F.filter(F.split(col, "\n"), lambda x: x != F.lit(""))
    n_lines = F.size(lines)
    line_chars = F.aggregate(lines, F.lit(0).cast("bigint"),
                             lambda acc, x: acc + F.length(x))
    ls = _run_stats(F.array_sort(lines))

    grams = word_ngrams(col, ngram_n)
    n_grams = F.size(grams)
    gs = _run_stats(F.array_sort(grams))
    top = F.when(n_grams > 0, gs["best"])

    return df.select(
        F.col(id_col),
        n_lines.cast("bigint").alias("n_lines"),
        (ls["dup_occ"] / F.nullif(n_lines.cast("bigint"), F.lit(0)))
         .alias("dup_line_frac"),
        (ls["dup_chars"] / F.nullif(line_chars, F.lit(0)))
         .alias("dup_line_char_frac"),
        top.alias("top_ngram"),
        (gs["best_run"] * F.length(top)
         / F.nullif(F.length(col).cast("bigint"), F.lit(0)))
         .alias("top_ngram_frac"),
        (gs["dup_occ"] / F.nullif(n_grams.cast("bigint"), F.lit(0)))
         .alias("dup_ngram_frac"),
    )


def fingerprint(col: Column, k: int = 8) -> Column:
    """Deterministic document fingerprint: md5 of the first ``k``
    lowercased tokens — the cheap prefix-dup detector (md5 chosen for
    external-oracle parity; any stable hash works)."""
    head = F.array_join(F.slice(tokens(F.lower(col)), 1, k), " ")
    return F.md5(head)


def fingerprints(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 8) -> DataFrame:
    return df.select(F.col(id_col),
                     fingerprint(F.col(text_col), k).alias("fingerprint"))


def vocab_topk(df: DataFrame, text_col: str = "text", k: int = 1000,
               *, lowercase: bool = True,
               min_count: int = 1) -> DataFrame:
    """Corpus vocabulary: the ``k`` most frequent whitespace tokens
    with counts and frequency ranks — the tokenizer-training /
    coverage-analysis prep step: ``(token, n, rank)``, rank 1 =
    most frequent, count-desc then token-asc so ties are
    deterministic.

    Explode-then-count with map-side partial aggregation (token
    counts combine before the shuffle, so the exchanged rows are
    bounded by DISTINCT tokens per partition, not corpus tokens);
    the top-k tail is ``orderBy().limit(k)`` —
    TakeOrderedAndProject, per-partition heaps, no global sort.
    At 100 TB the only state that matters is distinct-token
    cardinality, which Zipf keeps manageable; ``min_count`` prunes
    the hapax tail before the heap."""
    col = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = F.filter(tokens(col), lambda x: x != F.lit(""))
    counts = (df.select(F.explode(toks).alias("token"))
                .groupBy("token")
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") >= min_count))
    ranked = counts.orderBy(F.desc("n"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return (ranked.withColumn("rank", F.row_number().over(w))
                  .select("token", "n", "rank"))


def bigram_lm_scores(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", *,
                     k_smooth: float = 0.5) -> DataFrame:
    """Corpus-statistical fluency score (the CCNet-style LM-quality
    signal, expressed as pure aggregates): train add-k-smoothed
    bigram statistics ON the corpus itself, then score every document
    by its mean bigram log-probability.  Returns ``(id, n_bigrams,
    avg_logp, ppl)`` — low ``avg_logp`` / high ``ppl`` marks
    improbable token sequences (boilerplate soup, shuffled text,
    wrong-language fragments).  Docs with fewer than 2 tokens report
    ``(0, NULL, NULL)``.

        P(w_i | w_{i-1}) = (C(w_{i-1} w_i) + k) / (C(w_{i-1}) + k·V)

    Shuffle shape: unigram and bigram counts are partial-aggregated
    groupBys (exchange bounded by distinct-n-gram cardinality, which
    Zipf keeps manageable); V is a one-row aggregate broadcast back;
    scoring joins each doc's bigram positions to the two count tables
    on the n-gram key — the inverted-index shape every dedup tier
    here uses, no UDF anywhere.  The final mean is per-doc.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = df.repartition(par, id_col).select(
        F.col(id_col).alias("id"), toks.alias("_t"))
    # (id, prev, cur) positions — arrays_zip of the shifted slices
    pairs = base.select(
        "id",
        F.explode(F.when(
            F.size("_t") >= 2,
            F.arrays_zip(F.slice("_t", 1, F.size("_t") - 1),
                         F.slice("_t", 2, F.size("_t") - 1)))
            .otherwise(F.array().cast(
                "array<struct<`0`:string,`1`:string>>"))).alias("_p")) \
        .select("id", F.col("_p.`0`").alias("prev"),
                F.col("_p.`1`").alias("cur"))
    uni = (base.select(F.explode("_t").alias("w"))
               .groupBy("w").agg(F.count(F.lit(1)).alias("cu")))
    bi = (pairs.groupBy("prev", "cur")
               .agg(F.count(F.lit(1)).alias("cb")))
    vocab = uni.agg(F.count(F.lit(1)).cast("double").alias("v"))
    logp = F.log((F.col("cb") + F.lit(k_smooth))
                 / (F.col("cu") + F.lit(k_smooth) * F.col("v")))
    scored = (pairs.join(bi, ["prev", "cur"])
                   .join(uni, pairs["prev"] == uni["w"])
                   .crossJoin(F.broadcast(vocab))
                   .groupBy("id")
                   .agg(F.count(F.lit(1)).alias("n_bigrams"),
                        F.avg(logp).alias("_alp")))
    out = (df.select(F.col(id_col).alias("id")).distinct()
             .join(scored, "id", "left"))
    return out.select(
        F.col("id").alias(id_col),
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.col("_alp").alias("avg_logp"),
        F.exp(-F.col("_alp")).alias("ppl"))


def tfidf_topk_terms(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", *, k: int = 5) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms — the keyword/topic signal
    for corpus exploration and domain tagging: ``(id, token, tf, idf,
    tfidf, rank)``, rank 1 = highest, ties to the lexicographically
    smaller token so the cut is deterministic.

        tf  = count(token in doc) / len(doc)
        idf = ln(N / df_token)          (corpus-trained, no sublinear
                                         damping — kept oracle-simple)

    Shuffle shape: (doc, token) counts partial-aggregate; document
    frequency reduces the DISTINCT (doc, token) pairs per token; N is
    a one-row broadcast; ranking is a window over each document's own
    vocabulary (bounded by doc length, never corpus-wide).  Tokens in
    every document get idf 0 and drop out of the ranking naturally.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = (df.filter(F.col(text_col).isNotNull())
              .repartition(par, id_col)
              .select(F.col(id_col).alias("id"), toks.alias("_t")))
    pos = base.select("id", F.size("_t").alias("_len"),
                      F.explode("_t").alias("token"))
    tf = (pos.groupBy("id", "token")
             .agg(F.count(F.lit(1)).alias("_c"),
                  F.first("_len").alias("_len")))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    ndocs = base.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    scored = (tf.join(dfreq, "token")
                .crossJoin(F.broadcast(ndocs))
                .withColumn("tf", F.col("_c") / F.col("_len"))
                .withColumn("idf", F.log(F.col("_n") / F.col("_df")))
                .withColumn("_s", F.col("tf") * F.col("idf")))
    w = Window.partitionBy("id").orderBy(F.desc("_s"), F.asc("token"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(F.col("id").alias(id_col), "token",
                          "tf", "idf",
                          F.col("_s").alias("tfidf"), "rank"))

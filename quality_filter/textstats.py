"""Text-analysis operators: token counting, quality heuristics,
document fingerprinting, and a SQL-only language guess — all pure
Catalyst expressions over the text column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quality_filter.dedup import normalized_text

# BPE-ish token regex: word pieces, numbers, or single non-space symbols —
# a deterministic stand-in for a real tokenizer's token count.
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "was", "for",
    "on", "with", "that", "this", "it", "as", "at", "by", "be",
]


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace words, BPE-ish tokens, chars, distinct-word ratio."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    words = F.split(text, r"\s+")
    return (
        df.withColumn("n_chars", F.length(text))
        .withColumn("n_words", F.size(words))
        .withColumn("n_tokens", F.regexp_count(text, F.lit(BPE_ISH)))
        .withColumn(
            "distinct_word_ratio",
            F.size(F.array_distinct(words)).cast("double")
            / F.greatest(F.lit(1), F.size(words)),
        )
    )


def quality_score_expr(text: Column, words: Column | None = None) -> Column:
    """Heuristic [0,1] doc-quality score: length saturation, stopword
    presence, alpha density, repetition penalty — the doc-level analog of
    the reference's upstream ``doc_scores`` signal.

    ``words`` — optionally a materialized ``split(lower(text), '\\s+')``
    column: the expression references the word array five times, and an
    inline split is re-evaluated at every reference (r9 — see
    ``with_quality_score``)."""
    n_chars = F.length(text)
    if words is None:
        words = F.split(F.lower(text), r"\s+")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    stop_ratio = n_stop.cast("double") / F.greatest(F.lit(1), F.size(words))
    alpha_ratio = (
        n_chars - F.length(F.regexp_replace(text, r"\p{L}", ""))
    ).cast("double") / F.greatest(F.lit(1), n_chars)
    rep_ratio = F.size(F.array_distinct(words)).cast("double") / F.greatest(
        F.lit(1), F.size(words)
    )
    len_sat = F.least(n_chars, F.lit(500)).cast("double") / 500.0
    return F.bround(
        0.3 * len_sat + 0.25 * alpha_ratio + 0.25 * rep_ratio
        + 0.2 * F.least(stop_ratio * 4.0, F.lit(1.0)),
        3,
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``quality_score``; the word array is materialized in its
    own column first so the five references inside the score share one
    split (CollapseProject keeps a non-cheap multiply-referenced alias
    materialized), then dropped."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    return (
        df.withColumn("_qs_words", F.split(F.lower(text), r"\s+"))
        .withColumn(
            "quality_score", quality_score_expr(text, F.col("_qs_words"))
        )
        .drop("_qs_words")
    )


def fingerprint_expr(text: Column) -> Column:
    """Deterministic document fingerprint: rolling polynomial hash over
    normalized words (aggregate HOF fold — order-sensitive, so
    'a b' ≠ 'b a', unlike a bag-of-words md5).  Every step is reduced mod
    2^52 so the fold never overflows a long under ANSI arithmetic
    (acc < 2^52 → acc*31 + |reduced hash| < 2^58)."""
    words = F.split(normalized_text(text), " ")
    m = F.lit(1 << 52).cast("long")
    return F.aggregate(
        words,
        F.lit(1125899906842597 % (1 << 52)).cast("long"),  # prime seed, reduced
        lambda acc, w: F.pmod(acc * F.lit(31).cast("long") + F.pmod(F.xxhash64(w), m), m),
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn(
        "fingerprint", fingerprint_expr(F.coalesce(F.col(text_col), F.lit("")))
    )


# SQL-only language guess: stopword-lexicon hit counting per language —
# the Catalyst-native fallback when the ngram UDF is unavailable (and an
# oracle-SQL-expressible langid variant).
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "los", "es"],
}


_LANG_WORD_CLASS = "a-zçéàüöäñ"


def _lang_hit_structs(text: Column) -> list[Column]:
    """Per-language marker-word hit counts as (n, lang) structs.

    Counted with one alternation regex per language (``regexp_count``
    with boundary classes — equivalent to splitting on the non-letter
    class and counting exact word matches, but whole-stage-codegen'd):
    the earlier formulation, ``F.filter`` over a split array per
    language, ran as interpreted higher-order functions and measured
    ~4× slower than the langid pandas UDF at 10M turns — the regex form
    is what makes a JVM-side langid competitive (same lesson as the
    simhash grouped-vs-HOF layout)."""
    lowered = F.lower(text)
    counts = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        alt = "|".join(markers)
        pat = (
            f"(?:^|[^{_LANG_WORD_CLASS}])({alt})(?=$|[^{_LANG_WORD_CLASS}])"
        )
        counts.append(
            F.struct(
                F.regexp_count(lowered, F.lit(pat)).alias("n"),
                F.lit(lang).alias("lang"),
            )
        )
    return counts


def langid_sql_expr(text: Column) -> Column:
    """argmax over per-language marker-word hit counts; 'und' when no
    marker hits."""
    best = F.array_max(F.array(*_lang_hit_structs(text)))
    return F.when(best["n"] > 0, best["lang"]).otherwise(F.lit("und"))


def langid_sql_struct_expr(text: Column) -> Column:
    """struct<lang, lang_prob> variant: lang as above, lang_prob = the
    winning language's share of all marker hits (0.0 for 'und') — the
    JVM-side confidence analog used when the hot path runs langid without
    a Python worker (scoring.with_scores(langid_impl='sql'))."""
    counts = _lang_hit_structs(text)
    arr = F.array(*counts)
    best = F.array_max(arr)
    total = F.aggregate(arr, F.lit(0), lambda acc, s: acc + s["n"])
    return F.struct(
        F.when(best["n"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang"),
        F.when(
            best["n"] > 0,
            F.bround(best["n"].cast("double") / total, 3),
        )
        .otherwise(F.lit(0.0))
        .alias("lang_prob"),
    )


FP_MOD = 1 << 52
FP_SEED = 1125899906842597 % FP_MOD


def fingerprint_md5_expr(text: Column) -> Column:
    """Order-sensitive rolling document fingerprint in an oracle-portable
    form: per-word base hash = first 12 hex chars of md5 (48 bits, exact
    in both engines), folded as ``acc*31 + h (mod 2^52)`` — same
    polynomial as ``fingerprint_expr`` but md5-based instead of xxhash64
    (which DuckDB lacks).  All intermediates < 2^58, no overflow under
    ANSI arithmetic."""
    words = F.split(normalized_text(F.coalesce(text, F.lit(""))), " ")
    m = F.lit(FP_MOD).cast("long")
    h = lambda w: F.conv(F.substring(F.md5(F.encode(w, "UTF-8")), 1, 12), 16, 10).cast("long")  # noqa: E731
    return F.aggregate(
        words,
        F.lit(FP_SEED).cast("long"),
        lambda acc, w: F.pmod(acc * F.lit(31).cast("long") + h(w), m),
    )


def fingerprint_md5_sql(t: str) -> str:
    """DuckDB mirror of ``fingerprint_md5_expr``: hex parsed positionally
    with BIGINT power-of-16 literals, fold via list_reduce with the seed
    prepended (DuckDB reduce uses element 1 as the initial accumulator)."""
    norm = f"trim(regexp_replace(lower({t}), '[ \\t\\r\\n]+', ' ', 'g'))"
    hexpos = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(w), {i}, 1)) - 1) * {16 ** (12 - i)}"
        for i in range(1, 13)
    )
    hs = f"list_transform(string_split({norm}, ' '), w -> CAST({hexpos} AS BIGINT))"
    return (
        f"list_reduce(list_prepend(CAST({FP_SEED} AS BIGINT), {hs}), "
        f"(acc, h) -> (acc * 31 + h) % {FP_MOD})"
    )


def select_top_quality(
    df: DataFrame, frac: float = 0.25, text_col: str = "text",
    exact: bool = True, materialize: bool = True,
) -> DataFrame:
    """Quality-threshold selection (FineWeb-style): keep the documents
    whose heuristic quality score sits in the top ``frac`` of the corpus
    distribution.  The cutoff is ONE scalar — computed in a single
    aggregate pass and folded into a filter, so selection costs no sort
    and no shuffle of the corpus (vs a global rank/ntile, which would).

    ``exact=True`` uses the sort-based ``percentile`` aggregate —
    deterministic, used by the oracle-bound driver query; at 10^12 rows
    swap ``exact=False`` for ``approx_percentile`` (KLL sketch, bounded
    memory, rank error ~1e-4) — the threshold then drifts within sketch
    tolerance but the plan shape is identical.

    A percentile cutoff inherently needs two passes over the scored rows
    (one to find the threshold, one to filter).  ``materialize=True``
    (default) caches the scored table between them via ``localCheckpoint``
    — executor-storage-backed (MEMORY_AND_DISK), lineage-cut, and freed
    by the ContextCleaner when the returned DataFrame is garbage
    collected (no manual unpersist contract) — so the upstream scan and
    the score expression run ONCE.  Pass ``materialize=False`` when the
    input is a cheap re-scannable source and executor storage is tighter
    than a second scan (the score recomputes on the filter pass).

    Returns the kept rows with a ``quality_score`` column."""
    q = 1.0 - frac
    scored = df.withColumn(
        "quality_score", quality_score_expr(F.coalesce(F.col(text_col), F.lit("")))
    )
    if materialize:
        scored = scored.localCheckpoint(eager=True)
    fn = F.percentile if exact else F.approx_percentile
    args = (F.col("quality_score"), F.lit(q)) if exact else (
        F.col("quality_score"), F.lit(q), F.lit(10000)
    )
    thr = scored.agg(fn(*args).alias("t")).collect()[0]["t"]
    return scored.filter(F.col("quality_score") >= F.lit(thr))


# ---------------------------------------------------------------------------
# Gopher document-quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", appendix A1.1) — the
# standard pre-training corpus gate.  Frozen thresholds; the DuckDB oracle
# is generated from these same constants so the two sides cannot drift.
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_STOPWORD_HITS = 2

_BULLET_RE = r"^[-*•]"
_ELLIPSIS_RE = r"(\.\.\.|…)$"
_SYMBOL_RE = r"#|\.\.\.|…"
_TERMINAL_RE = r"[.!?\"]$"


def _nonempty_words(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda w: w != F.lit(""))


def with_gopher_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher quality-rule metrics + keep decision per document.

    Adds ``word_count``, ``mean_word_len``, ``symbol_ratio`` (# / ellipsis
    per word), ``bullet_frac`` / ``ellipsis_frac`` (of lines),
    ``alpha_word_frac`` (words containing a letter), ``stopword_hits``
    (distinct hits from the 8-word Gopher list) and boolean
    ``gopher_keep`` (every rule passes).

    Scale shape: one narrow per-row projection — no shuffle, no join, no
    Python; predicate/column pruning reach the scan unchanged.  The array
    HOFs run interpreted (not codegen), which is fine for an audit/gate
    pass; a hot-path variant would fuse into the existing scorer Arrow
    UDF the way langid does.  All ratios are exact-int divisions cast to
    double, so results are bit-stable across engines and partitionings.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    words = _nonempty_words(text)
    wc = F.size(words)
    wc1 = F.greatest(F.lit(1), wc).cast("double")
    # long accumulator: summed word lengths of a near-2GB document exceed
    # int32; DuckDB's list_sum is already BIGINT, so the engines agree
    mean_wl = (
        F.aggregate(
            words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
        ).cast("double")
        / wc1
    )
    symbol_ratio = F.regexp_count(text, F.lit(_SYMBOL_RE)).cast("double") / wc1
    lines = F.split(text, r"\n")
    nl1 = F.greatest(F.lit(1), F.size(lines)).cast("double")
    bullet_frac = (
        F.size(F.filter(lines, lambda ln: F.ltrim(ln).rlike(_BULLET_RE))).cast("double")
        / nl1
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda ln: F.rtrim(ln).rlike(_ELLIPSIS_RE))).cast(
            "double"
        )
        / nl1
    )
    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike(r"\p{L}"))).cast("double") / wc1
    )
    words_low = F.transform(words, F.lower)
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    stop_hits = F.size(
        F.filter(stop_arr, lambda s: F.array_contains(words_low, s))
    )
    out = (
        df.withColumn("word_count", wc)
        .withColumn("mean_word_len", mean_wl)
        .withColumn("symbol_ratio", symbol_ratio)
        .withColumn("bullet_frac", bullet_frac)
        .withColumn("ellipsis_frac", ellipsis_frac)
        .withColumn("alpha_word_frac", alpha_frac)
        .withColumn("stopword_hits", stop_hits)
    )
    keep = (
        F.col("word_count").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & F.col("mean_word_len").between(
            GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN
        )
        & (F.col("symbol_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("bullet_frac") <= GOPHER_MAX_BULLET_FRAC)
        & (F.col("ellipsis_frac") <= GOPHER_MAX_ELLIPSIS_FRAC)
        & (F.col("alpha_word_frac") >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (F.col("stopword_hits") >= GOPHER_MIN_STOPWORD_HITS)
    )
    return out.withColumn("gopher_keep", keep)


# ---------------------------------------------------------------------------
# C4 line/page cleaning (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning with a Unified Text-to-Text Transformer", §2.2) —
# keep lines ending in terminal punctuation with >= 5 words; drop pages
# with fewer than C4_MIN_LINES surviving lines, containing "lorem ipsum",
# or containing a curly brace.
# ---------------------------------------------------------------------------

C4_MIN_WORDS_PER_LINE = 5
C4_MIN_LINES = 3


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = C4_MIN_WORDS_PER_LINE,
    min_lines: int = C4_MIN_LINES,
) -> DataFrame:
    """C4 cleaning as one narrow projection + filter: per-line keep rule
    evaluated inside array HOFs (no explode → no shuffle, doc order and
    partitioning preserved), then the page-level gates.  Returns kept
    pages with ``clean_text`` (surviving lines re-joined), ``n_lines_kept``
    and ``n_lines_total``.

    At 100 TB this is scan-shaped: the whole operator is a single
    WholeStageCodegen-adjacent map over the text column with zero
    exchanges; the line explode/reassemble alternative would shuffle
    every byte of the corpus twice for identical output.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(text, r"\n")
    kept = F.filter(
        lines,
        lambda ln: F.rtrim(ln).rlike(_TERMINAL_RE)
        & (F.size(_nonempty_words(ln)) >= min_words_per_line),
    )
    out = (
        df.withColumn("n_lines_total", F.size(lines))
        .withColumn("n_lines_kept", F.size(kept))
        .withColumn("clean_text", F.array_join(kept, "\n"))
    )
    return out.filter(
        (F.col("n_lines_kept") >= min_lines)
        & ~F.contains(F.lower(text), F.lit("lorem ipsum"))
        & ~F.contains(text, F.lit("{"))
    )


# Gopher repetition sub-rules (Rae et al. 2021 A1.1, "repetitious text"):
# duplicate line / paragraph fractions by count and by character mass.
# The top-n-gram char-fraction rules from the same table are covered by
# the registered `repetition_stats` operator (entry_queries).
GOPHER_MAX_DUP_LINE_FRAC = 0.30
GOPHER_MAX_DUP_PARA_FRAC = 0.30
GOPHER_MAX_DUP_LINE_CHAR_FRAC = 0.20
GOPHER_MAX_DUP_PARA_CHAR_FRAC = 0.20

_PARA_SPLIT_RE = r"\n{2,}"


def _dup_fracs(units: Column) -> tuple[Column, Column]:
    """(duplicate-count fraction, duplicate-character fraction) of an
    array of text units: occurrences beyond the first are duplicates.
    array_distinct + two integer sums — O(n) per row, no sort, no pair
    scan, so a 10^5-line document costs one pass."""
    distinct = F.array_distinct(units)
    n = F.size(units)
    zero = F.lit(0).cast("long")
    chars = F.aggregate(units, zero, lambda a, u: a + F.length(u))
    chars_d = F.aggregate(distinct, zero, lambda a, u: a + F.length(u))
    dup_frac = (n - F.size(distinct)).cast("double") / F.greatest(F.lit(1), n)
    dup_char_frac = (chars - chars_d).cast("double") / F.greatest(
        F.lit(1).cast("long"), chars
    )
    return dup_frac, dup_char_frac


def with_gopher_repetition(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher duplicate-line/paragraph metrics + keep decision.

    Lines are newline-separated non-empty strings; paragraphs are
    blank-line-separated non-empty blocks.  Adds ``dup_line_frac``,
    ``dup_line_char_frac``, ``dup_para_frac``, ``dup_para_char_frac``
    and ``repetition_keep`` (all four under the frozen GOPHER_MAX_*
    thresholds).  Same scale shape as the other gates: one narrow
    projection, exact-int divisions, zero exchanges."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(F.split(text, r"\n"), lambda ln: ln != F.lit(""))
    paras = F.filter(F.split(text, _PARA_SPLIT_RE), lambda p: p != F.lit(""))
    dl, dlc = _dup_fracs(lines)
    dp, dpc = _dup_fracs(paras)
    out = (
        df.withColumn("dup_line_frac", dl)
        .withColumn("dup_line_char_frac", dlc)
        .withColumn("dup_para_frac", dp)
        .withColumn("dup_para_char_frac", dpc)
    )
    keep = (
        (F.col("dup_line_frac") <= GOPHER_MAX_DUP_LINE_FRAC)
        & (F.col("dup_line_char_frac") <= GOPHER_MAX_DUP_LINE_CHAR_FRAC)
        & (F.col("dup_para_frac") <= GOPHER_MAX_DUP_PARA_FRAC)
        & (F.col("dup_para_char_frac") <= GOPHER_MAX_DUP_PARA_CHAR_FRAC)
    )
    return out.withColumn("repetition_keep", keep)


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    with_repetition: bool = True,
    keep_metrics: bool = False,
) -> DataFrame:
    """The composed Gopher corpus gate: keep documents passing ALL quality
    rules (with_gopher_flags) and — by default — all repetition rules
    (with_gopher_repetition).  One scan-shaped pass; both metric sets
    evaluate inside the same projection.  ``keep_metrics=True`` retains
    the per-rule metric columns for auditing, otherwise the output schema
    equals the input schema."""
    in_cols = df.columns
    out = with_gopher_flags(df, text_col)
    keep = F.col("gopher_keep")
    if with_repetition:
        out = with_gopher_repetition(out, text_col)
        keep = keep & F.col("repetition_keep")
    out = out.filter(keep)
    return out if keep_metrics else out.select(*in_cols)


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    group_col: str = "source",
    id_col: str = "doc_id",
    log_idf: bool = True,
) -> DataFrame:
    """Top-k TF-IDF terms per group (e.g. per source): corpus keyword
    extraction / domain profiling.

    Scale shape: the doc-term count is a map-side-combinable hash
    aggregate over exploded words; document frequency is a second
    combinable aggregate over the SAME doc-term table (already distinct
    per doc, so no extra distinct pass); the corpus size joins in as a
    broadcast one-row aggregate; the final top-k is a window on the
    group key — report-shaped output (|groups|·k rows), so the window's
    per-group sort touches |vocab-per-group| rows, not the corpus.

    ``log_idf=True`` uses the standard smoothed ``ln((N+1)/(df+1)) + 1``;
    ``log_idf=False`` uses the rational ``(N+1)/(df+1)`` — same ranking
    for any fixed df ordering and bit-identical across engines (exact-int
    division, no libm), which is what the oracle-checked driver query
    pins.  Returns (group, term, rnk, sum_tf, df, score)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != F.lit(""))
    dt = (
        docs.select(id_col, group_col, F.explode(words).alias("term"))
        .groupBy(id_col, group_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    grouped = dt.groupBy(group_col, "term").agg(F.sum("tf").alias("sum_tf"))
    ratio = (F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
    idf = (F.log(ratio) + F.lit(1.0)) if log_idf else ratio
    scored = (
        grouped.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score", F.col("sum_tf").cast("double") * idf)
    )
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(group_col, "term", "rnk", "sum_tf", "df", "score")
    )


# ---------------------------------------------------------------------------
# Fused Arrow gate: C4 line cleaning + Gopher quality + repetition rules in
# ONE Arrow-batched pass (r7).  The HOF gates above are the oracle-checked
# reference; this is the 100-TB hot path for the composed corpus build —
# the r7 A/B (BENCH/r7_gates_ab.json) measured the interpreted HOF chain
# at 5.4× the fused gate's wall time at identical survivors on a 200k-doc
# corpus at local[32], consistent with the r4 finding that Catalyst array
# HOFs run interpreted.  Survivor sets and cleaned text are pinned
# identical to the HOF path (tests/test_round7.py) on ASCII + the
# adversarial-alphabet fixtures; Java-vs-Python regex semantics are
# aligned by construction (explicit ASCII \s class, space-only trims,
# str.isalpha == \p{L} on the letter categories the gates see).
#
# r8 adds a second kernel behind the same plan node: _fused_gate_batch,
# built on pyarrow.compute C++ kernels (no per-element Python on the fast
# lane).  _fused_gate_row stays as the parity oracle; tests/test_round8.py
# pins the two column-exact on adversarial corpora, and
# BENCH/r8_gates_ab.json carries the measured A/B.
# ---------------------------------------------------------------------------

import re as _re
from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_PY_WS = _re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s is ASCII-only
_PY_TERM = _re.compile(r'[.!?"]$')
_PY_SYM = _re.compile(r"#|\.\.\.|…")
_PY_ELL = _re.compile(r"(\.\.\.|…)$")
_PY_PARA = _re.compile(r"\n{2,}")
_PY_ASCII_ALPHA = _re.compile(r"[A-Za-z]")


def _has_alpha(w: str) -> bool:
    """Exact equivalent of any(c.isalpha() for c in w), two-tiered: one
    C-level ASCII-letter regex probe first (hits for the vast majority
    of words), the per-character unicode-category fallback only when no
    ASCII letter is found.  The alpha-word check was 36% of the fused
    gate's profile as a bare generator."""
    return _PY_ASCII_ALPHA.search(w) is not None or any(
        c.isalpha() for c in w
    )


def _fused_gate_row(t: str, min_words_per_line: int, min_lines: int,
                    with_repetition: bool) -> tuple[str, bool, bool]:
    """(clean_text, c4_keep, gopher_keep) for one document — the exact
    composition build_pretrain_corpus runs: C4 line keep → page gates →
    Gopher quality + repetition rules over the C4-cleaned text."""
    t = t or ""
    if "{" in t or "lorem ipsum" in t.lower():
        return "", False, False
    kept = [
        ln
        for ln in t.split("\n")
        if _PY_TERM.search(ln.rstrip(" "))
        and sum(1 for w in _PY_WS.split(ln) if w) >= min_words_per_line
    ]
    if len(kept) < min_lines:
        return "", False, False
    clean = "\n".join(kept)
    words = [w for w in _PY_WS.split(clean) if w]
    wc = len(words)
    wc1 = float(max(1, wc))
    if not (GOPHER_MIN_WORDS <= wc <= GOPHER_MAX_WORDS):
        return clean, True, False
    mean_wl = sum(len(w) for w in words) / wc1
    if not (GOPHER_MIN_MEAN_WORD_LEN <= mean_wl <= GOPHER_MAX_MEAN_WORD_LEN):
        return clean, True, False
    if len(_PY_SYM.findall(clean)) / wc1 > GOPHER_MAX_SYMBOL_RATIO:
        return clean, True, False
    lines = clean.split("\n")
    nl1 = float(max(1, len(lines)))
    if sum(ln.lstrip(" ").startswith(("-", "*", "•")) for ln in lines) / nl1 \
            > GOPHER_MAX_BULLET_FRAC:
        return clean, True, False
    if sum(bool(_PY_ELL.search(ln.rstrip(" "))) for ln in lines) / nl1 \
            > GOPHER_MAX_ELLIPSIS_FRAC:
        return clean, True, False
    if sum(_has_alpha(w) for w in words) / wc1 \
            < GOPHER_MIN_ALPHA_WORD_FRAC:
        return clean, True, False
    lowered = {w.lower() for w in words}
    if sum(s in lowered for s in GOPHER_STOPWORDS) < GOPHER_MIN_STOPWORD_HITS:
        return clean, True, False
    if with_repetition:
        nz_lines = [ln for ln in lines if ln]
        paras = [p for p in _PY_PARA.split(clean) if p]
        for units, fmax, cmax in (
            (nz_lines, GOPHER_MAX_DUP_LINE_FRAC, GOPHER_MAX_DUP_LINE_CHAR_FRAC),
            (paras, GOPHER_MAX_DUP_PARA_FRAC, GOPHER_MAX_DUP_PARA_CHAR_FRAC),
        ):
            distinct = set(units)
            if (len(units) - len(distinct)) / max(1, len(units)) > fmax:
                return clean, True, False
            chars = sum(len(u) for u in units)
            if (chars - sum(len(u) for u in distinct)) / max(1, chars) > cmax:
                return clean, True, False
    return clean, True, True


# --- r8 Arrow-compute batch kernel ------------------------------------------
# Per-kernel measurements that shaped it (BENCH/ROUND8_NOTES.md): RE2
# class-star token patterns pay ~0.5 µs per MATCH, so counting every
# token-with-a-letter is ~10× slower than scanning for the rare class
# (letterless tokens); utf8_split_whitespace (non-regex C++) beats the
# [\s]+ run-count regex ~3×; plain substring kernels (memchr) beat
# single-char regex classes ~10×.  Docs containing non-ASCII Unicode
# whitespace take the exact row-kernel lane — utf8_split_whitespace
# splits on Unicode White_Space, the row kernel's \s is ASCII-only.

_FG_WSC = " \t\n\x0b\f\r"  # the row kernel's ASCII \s
# Unicode White_Space beyond ASCII (utf8proc set, = the divergence set)
_FG_EXOTIC_WS_RE = (
    "[\\x{0085}\\x{00a0}\\x{1680}\\x{2000}-\\x{200a}"
    "\\x{2028}\\x{2029}\\x{202f}\\x{205f}\\x{3000}]"
)
_FG_RE_TERM = '[.!?"]$'
_FG_RE_SYM = "#|\\.\\.\\.|…"
_FG_RE_BULLET = "(?m)^ *[-*•]"
_FG_RE_ELL = "(?m)(?:\\.\\.\\.|…) *$"
_FG_RE_NON_ASCII = "[^\\x00-\\x7f]"
# one match per ws-delimited token that contains an ASCII letter (used
# only on the small unicode-residue subset)
_FG_RE_TOK_ASCII_ALPHA = f"[^{_FG_WSC}]*[A-Za-z][^{_FG_WSC}]*"


def _fg_np(a) -> np.ndarray:
    return a.to_numpy(zero_copy_only=False)


def _fg_token_count(arr: pa.Array) -> np.ndarray:
    """ASCII-ws token count: trim, then utf8_split_whitespace (which keeps
    leading/trailing empty tokens — hence the trim) with an empty guard."""
    t = pc.utf8_trim(arr, _FG_WSC)
    lens = _fg_np(pc.list_value_length(pc.utf8_split_whitespace(t)))
    return np.where(_fg_np(pc.equal(t, "")), 0, lens).astype(np.int64)


def _fg_space_norm(arr: pa.Array) -> pa.Array:
    """Every ASCII-ws char → ' ' (plain replaces, memchr-fast)."""
    for ch in "\t\n\x0b\f\r":
        arr = pc.replace_substring(arr, ch, " ")
    return arr


def _fused_gate_batch(
    texts: pd.Series,
    min_words_per_line: int,
    min_lines: int,
    with_repetition: bool,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(clean_text, c4_keep, gopher_keep) arrays for one Arrow batch —
    column-exact vs ``_fused_gate_row`` (tests/test_round8.py)."""
    n = len(texts)
    clean_out = np.full(n, "", dtype=object)
    c4_out = np.zeros(n, dtype=bool)
    gk_out = np.zeros(n, dtype=bool)
    if n == 0:
        return clean_out, c4_out, gk_out
    arr0 = pc.coalesce(pa.array(texts, type=pa.string()), "")

    # exact lane for docs whose whitespace the fast lane would mis-split
    exotic = _fg_np(pc.match_substring_regex(arr0, _FG_EXOTIC_WS_RE))
    slow_idx = np.flatnonzero(exotic)
    for i in slow_idx:
        c, k4, kg = _fused_gate_row(
            arr0[int(i)].as_py(), min_words_per_line, min_lines,
            with_repetition,
        )
        clean_out[i], c4_out[i], gk_out[i] = c, k4, kg
    fast_idx = np.flatnonzero(~exotic)
    if len(fast_idx) == 0:
        return clean_out, c4_out, gk_out
    arr = arr0.take(pa.array(fast_idx)) if len(slow_idx) else arr0
    m = len(fast_idx)

    page_bad = _fg_np(pc.or_(
        pc.match_substring(arr, "{"),
        pc.match_substring(arr, "lorem ipsum", ignore_case=True),
    ))

    # ---- C4 line keep over the exploded lines ---------------------------
    lines = pc.split_pattern(arr, "\n")
    counts = _fg_np(pc.list_value_length(lines)).astype(np.int64)
    flat = pc.list_flatten(lines)
    doc_idx = np.repeat(np.arange(m), counts)
    term = _fg_np(
        pc.match_substring_regex(pc.utf8_rtrim(flat, " "), _FG_RE_TERM)
    )
    wc_line = _fg_token_count(flat)
    keep_line = term & (wc_line >= min_words_per_line)
    n_kept = np.bincount(doc_idx[keep_line], minlength=m)
    c4_keep = (~page_bad) & (n_kept >= min_lines)

    # '\n'-join of kept lines as ONE C++ kernel (binary_join over a
    # rebuilt ListArray), no per-doc Python
    kept_flat = flat.filter(pa.array(keep_line))
    offsets = np.zeros(m + 1, dtype=np.int32)
    np.cumsum(n_kept, out=offsets[1:])
    joined = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets), kept_flat), "\n"
    )
    clean_all = pc.if_else(pa.array(c4_keep), joined, "")
    clean_out[fast_idx] = np.asarray(_fg_np(clean_all), dtype=object)
    c4_out[fast_idx] = c4_keep

    surv = np.flatnonzero(c4_keep)
    if len(surv) == 0:
        return clean_out, c4_out, gk_out
    cs = clean_all.take(pa.array(surv))

    # ---- Gopher quality rules over the cleaned survivors ----------------
    # ws-normalized view (every ASCII-ws char → ' '): the remaining counts
    # use PLAIN substring kernels and space-only token patterns
    norm = _fg_space_norm(cs)
    wc = _fg_token_count(norm)
    wc1 = np.maximum(1, wc).astype(np.float64)
    # sum of token lengths: leading/trailing ws cancels between the terms
    sum_wl = (
        _fg_np(pc.utf8_length(norm)) - _fg_np(pc.count_substring(norm, " "))
    )
    mean_wl = sum_wl / wc1
    sym_ratio = _fg_np(pc.count_substring_regex(cs, _FG_RE_SYM)) / wc1
    nl1 = np.maximum(
        1, _fg_np(pc.count_substring(cs, "\n")) + 1
    ).astype(np.float64)
    bullet_frac = _fg_np(pc.count_substring_regex(cs, _FG_RE_BULLET)) / nl1
    ell_frac = _fg_np(pc.count_substring_regex(cs, _FG_RE_ELL)) / nl1

    # alpha-word fraction, two-tiered like the row kernel, counting the
    # RARE class.  On the space-DOUBLED padded text every token is flanked
    # by ≥ 2 spaces, so adjacent letterless tokens cannot consume each
    # other's delimiter — the count is exact.  Only docs that BOTH carry a
    # non-ASCII byte AND have letterless-ASCII tokens can owe extra alpha
    # words to the unicode fallback (str.isalpha over the tiny residue).
    lowpad = pc.binary_join_element_wise(" ", pc.utf8_lower(norm), " ", "")
    doubled = pc.replace_substring(
        pc.binary_join_element_wise(" ", norm, " ", ""), " ", "  "
    )
    non_alpha = _fg_np(pc.count_substring_regex(doubled, " [^ A-Za-z]+ "))
    unicode_alpha = np.zeros(len(surv), dtype=np.int64)
    has_nonascii = _fg_np(pc.match_substring_regex(cs, _FG_RE_NON_ASCII))
    maybe = np.flatnonzero(has_nonascii & (non_alpha > 0))
    if len(maybe) > 0:
        residue = pc.replace_substring_regex(
            cs.take(pa.array(maybe)), _FG_RE_TOK_ASCII_ALPHA, ""
        )
        ws_split = _re.compile(f"[{_FG_WSC}]+").split
        for j, txt in zip(maybe, residue.to_pylist()):
            unicode_alpha[j] = sum(
                1 for w in ws_split(txt) if w and any(c.isalpha() for c in w)
            )
    alpha_frac = (wc - non_alpha + unicode_alpha) / wc1

    # distinct stopword hits: one PLAIN substring probe per stopword on
    # the padded lowercased view (token equality ⇔ ' word ' in it)
    stop_hits = np.zeros(len(surv), dtype=np.int64)
    for s in GOPHER_STOPWORDS:
        stop_hits += _fg_np(pc.match_substring(lowpad, f" {s} "))

    ok = (
        (wc >= GOPHER_MIN_WORDS)
        & (wc <= GOPHER_MAX_WORDS)
        & (mean_wl >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_wl <= GOPHER_MAX_MEAN_WORD_LEN)
        & (sym_ratio <= GOPHER_MAX_SYMBOL_RATIO)
        & (bullet_frac <= GOPHER_MAX_BULLET_FRAC)
        & (ell_frac <= GOPHER_MAX_ELLIPSIS_FRAC)
        & (alpha_frac >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (stop_hits >= GOPHER_MIN_STOPWORD_HITS)
    )

    if with_repetition:
        # duplicate-line rules on the cleaned text; C4-kept lines are
        # never empty (an empty line has no terminal punctuation), so the
        # nonempty-line unit set == kept lines and the paragraph split
        # (\n{2,}) can never fire — paragraph fracs are identically 0 and
        # always pass, exactly as in the row kernel.
        in_surv = c4_keep[doc_idx[keep_line]]
        pos = np.searchsorted(surv, doc_idx[keep_line][in_surv])
        ru = kept_flat.filter(pa.array(in_surv))
        lens = _fg_np(pc.utf8_length(ru)).astype(np.int64)
        k = len(surv)
        n_units = np.bincount(pos, minlength=k)
        chars = np.bincount(pos, weights=lens, minlength=k)
        codes = pd.factorize(np.asarray(_fg_np(ru), dtype=object))[0]
        pair = pd.DataFrame(
            {"p": pos, "c": codes, "l": lens}
        ).drop_duplicates(subset=["p", "c"])
        n_dist = np.bincount(pair["p"].to_numpy(), minlength=k)
        chars_d = np.bincount(
            pair["p"].to_numpy(), weights=pair["l"].to_numpy(), minlength=k
        )
        dup_frac = (n_units - n_dist) / np.maximum(1, n_units)
        dup_char = (chars - chars_d) / np.maximum(1, chars)
        ok &= (dup_frac <= GOPHER_MAX_DUP_LINE_FRAC) & (
            dup_char <= GOPHER_MAX_DUP_LINE_CHAR_FRAC
        )

    gk = np.zeros(m, dtype=bool)
    gk[surv] = ok
    gk_out[fast_idx] = gk
    return clean_out, c4_out, gk_out


def fused_gate_arrow(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = C4_MIN_WORDS_PER_LINE,
    min_lines: int = C4_MIN_LINES,
    with_repetition: bool = True,
    impl: str = "batch",
) -> DataFrame:
    """Append ``clean_text`` (C4-surviving lines re-joined), ``c4_keep``
    and ``gopher_keep`` via one Arrow-batched pass — a non-filtering
    projection, so callers place their own observed filters per stage
    (exact stage accounting survives the fusion).  Partition-preserving,
    zero exchanges, one Python worker stage instead of the interpreted
    HOF expression chain.

    Implemented as a ``mapInPandas`` plan NODE rather than a pandas-UDF
    column expression: predicate pushdown substitutes UDF-column filters
    through projections, and over complex expression inputs Catalyst can
    land the PythonUDF inside an interpreted Filter ([INTERNAL_ERROR]
    Cannot evaluate expression) — a plan node cannot be collapsed into.

    ``impl``: 'batch' (default — the r8 Arrow-compute kernel,
    BENCH/r8_gates_ab.json) or 'row' (the r7 per-doc kernel, kept as the
    parity oracle).  Outputs are column-exact between the two
    (tests/test_round8.py)."""
    from quality_filter.shipping import ensure_shipped

    if impl not in ("batch", "row"):
        raise ValueError(f"impl must be 'batch' or 'row', got {impl!r}")
    ensure_shipped(df.sparkSession)
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
        + ", clean_text string, c4_keep boolean, gopher_keep boolean"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if impl == "batch":
                clean, c4, gk = _fused_gate_batch(
                    pdf[text_col], min_words_per_line, min_lines,
                    with_repetition,
                )
                g = pd.DataFrame(
                    {"clean_text": clean, "c4_keep": c4, "gopher_keep": gk},
                    index=pdf.index,
                )
            else:
                rows = [
                    _fused_gate_row(
                        t, min_words_per_line, min_lines, with_repetition
                    )
                    for t in pdf[text_col].tolist()
                ]
                g = pd.DataFrame(
                    rows, columns=["clean_text", "c4_keep", "gopher_keep"],
                    index=pdf.index,
                )
            yield pd.concat([pdf, g], axis=1)

    return df.mapInPandas(run, out_schema)

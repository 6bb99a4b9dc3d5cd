"""Heuristic line/turn rules as pure Catalyst expressions.

This is the native re-expression of what the reference delegates to an
XLM-R sequence classifier (``src/classifier_inference_pipeline.py:37-124``):
each turn gets a ``label`` from the fixed 9-label taxonomy plus a
``clean_score`` = rule-based P(Clean) rounded to 3 decimals with banker's
rounding, matching ``round(score, 3)`` at
``src/classifier_inference_pipeline.py:88`` (Spark ``bround`` == Python
``round`` == HALF_EVEN).

Everything here is a single Catalyst projection — no UDFs, fully
whole-stage-codegen'd, and trivially parallel at any scale (no shuffle).
Rule precedence is frozen (first match wins); the same order is implemented
by the Python golden oracle and the generated DuckDB oracle SQL, so the
three implementations are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quality_filter import patterns as P
from quality_filter.labels import LABELS

# (label, regex) in frozen precedence order; regex rules first, then the
# ratio-based "Formatting, Style & Errors" fallback, then Clean.
REGEX_RULES: list[tuple[str, str]] = [
    ("Contact & Identification Information",
     P.ci(f"({P.EMAIL}|{P.PHONE}|{P.CONTACT_MARKER})")),
    ("Technical Specifications & Metadata",
     P.ci(f"({P.HTML_TAG}|{P.TECH_MARKER})")),
    ("Legal & Administrative Content", P.ci(P.LEGAL)),
    ("Bibliographical & Citation References", P.ci(P.CITATION)),
    ("Navigation & Interface Elements",
     P.ci(f"({P.NAVIGATION}|{P.URL})")),
    ("Promotional & Spam Content", P.ci(P.SPAM)),
    ("Offensive or Inappropriate Content", P.ci(P.TOXIC)),
]

FORMATTING_LABEL = "Formatting, Style & Errors"

# Ratio thresholds for the formatting fallback rule.
SYMBOL_RATIO_MAX = 0.3
ALPHA_RATIO_MIN = 0.2
MIN_CHARS_FOR_ALPHA_RULE = 4

# clean_score formula weights (frozen; mirrored in oracle + DuckDB SQL).
W_ALPHA, W_LEN, W_SYM = 0.6, 0.3, 0.1
LEN_NORM = 120


def feature_columns(text: Column) -> dict[str, Column]:
    """Character-class counts/ratios used by the formatting rule and score.

    Counts use Unicode-aware ``\\p{L}`` and an explicit ASCII whitespace
    class so Java/RE2/Python agree (see patterns.py docstring).
    """
    n_chars = F.length(text)
    n_letter = F.regexp_count(text, F.lit(r"\p{L}"))
    n_digit = F.regexp_count(text, F.lit("[0-9]"))
    n_space = F.regexp_count(text, F.lit(P.WS_CLASS))
    n_nonspace = n_chars - n_space
    n_symbol = n_chars - n_letter - n_digit - n_space
    alpha_ratio = n_letter.cast("double") / F.greatest(F.lit(1), n_nonspace)
    symbol_ratio = n_symbol.cast("double") / F.greatest(F.lit(1), n_chars)
    return {
        "n_chars": n_chars,
        "n_nonspace": n_nonspace,
        "alpha_ratio": alpha_ratio,
        "symbol_ratio": symbol_ratio,
    }


def label_expr(text: Column) -> Column:
    """Per-turn label: frozen-precedence regex rules, then the ratio-based
    formatting rule, else Clean."""
    feats = feature_columns(text)
    expr = F.lit(LABELS[0])  # Clean (built innermost-out, so reversed below)
    formatting = (
        (feats["n_nonspace"] == 0)
        | text.rlike(P.SYMBOL_RUN)
        | (feats["symbol_ratio"] > F.lit(SYMBOL_RATIO_MAX))
        | (
            (feats["n_chars"] >= F.lit(MIN_CHARS_FOR_ALPHA_RULE))
            & (feats["alpha_ratio"] < F.lit(ALPHA_RATIO_MIN))
        )
    )
    expr = F.when(formatting, F.lit(FORMATTING_LABEL)).otherwise(expr)
    for label, pattern in reversed(REGEX_RULES):
        expr = F.when(text.rlike(pattern), F.lit(label)).otherwise(expr)
    return expr


def clean_score_expr(text: Column, label: Column) -> Column:
    """Rule-based P(Clean) in [0,1], banker's-rounded to 3 decimals.

    Non-Clean labels are damped by 0.4 so they land far below the salvage
    threshold ``clean_score > 0.9`` (``src/salvage_low_quality_data.py:185``).
    The expression tree (operand order included) is frozen for IEEE-754
    bit-parity with the oracle and DuckDB SQL.
    """
    feats = feature_columns(text)
    score_raw = (
        F.lit(W_ALPHA) * feats["alpha_ratio"]
        + F.lit(W_LEN)
        * (F.least(feats["n_chars"], F.lit(LEN_NORM)).cast("double") / F.lit(float(LEN_NORM)))
        + F.lit(W_SYM) * (F.lit(1.0) - feats["symbol_ratio"])
    )
    damped = F.when(label == F.lit(LABELS[0]), score_raw).otherwise(F.lit(0.4) * score_raw)
    return F.bround(damped, 3)


def score_turns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``label`` and ``clean_score`` to a transcript DataFrame.

    One narrow projection — the Spark analog of the reference's
    classify-then-annotate step (``src/classifier_inference_pipeline.py:103-123``)
    with the model replaced by deterministic rules.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    labeled = df.withColumn("label", label_expr(text))
    return labeled.withColumn(
        "clean_score", clean_score_expr(F.coalesce(F.col(text_col), F.lit("")), F.col("label"))
    )

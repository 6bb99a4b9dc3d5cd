"""Pure-Python golden oracle for the quality_filter engine.

Independently reimplements the frozen semantics (reference:
``src/filter_by_quality_label.py:61-93``, ``src/filter_by_quality_score.py:17-59``,
``src/salvage_low_quality_data.py:140-219``, scoring analog of
``src/classifier_inference_pipeline.py:37-124``) in plain Python over
ordered turn lists.  Spark output must match this oracle exactly:
keep/drop decisions with F1 ≥ 0.99 (in practice 1.0) and scrubbed text
byte-for-byte (BASELINE.json).

Letter counting uses ``str.isalpha`` — the Python mirror of the Unicode
``\\p{L}`` class used by the Java/RE2 sides.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from quality_filter import patterns as P
from quality_filter.labels import LABELS, parse_labels
from quality_filter.rules import (
    ALPHA_RATIO_MIN,
    FORMATTING_LABEL,
    LEN_NORM,
    MIN_CHARS_FOR_ALPHA_RULE,
    REGEX_RULES,
    SYMBOL_RATIO_MAX,
    W_ALPHA,
    W_LEN,
    W_SYM,
)

_WS = set(" \t\r\n\x0b\f")
_DIGITS = set("0123456789")

_COMPILED_RULES = [(label, re.compile(pat)) for label, pat in REGEX_RULES]
_SYMBOL_RUN_RE = re.compile(P.SYMBOL_RUN)
_SCRUB_RES = [(re.compile(pat), rep) for pat, rep in P.SCRUB_CHAIN]


def features(text: str) -> dict[str, float]:
    n_chars = len(text)
    n_letter = sum(1 for ch in text if ch.isalpha())
    n_digit = sum(1 for ch in text if ch in _DIGITS)
    n_space = sum(1 for ch in text if ch in _WS)
    n_nonspace = n_chars - n_space
    n_symbol = n_chars - n_letter - n_digit - n_space
    return {
        "n_chars": n_chars,
        "n_nonspace": n_nonspace,
        "alpha_ratio": float(n_letter) / max(1, n_nonspace),
        "symbol_ratio": float(n_symbol) / max(1, n_chars),
    }


def label_of(text: str) -> str:
    for label, rx in _COMPILED_RULES:
        if rx.search(text):
            return label
    f = features(text)
    if (
        f["n_nonspace"] == 0
        or _SYMBOL_RUN_RE.search(text)
        or f["symbol_ratio"] > SYMBOL_RATIO_MAX
        or (f["n_chars"] >= MIN_CHARS_FOR_ALPHA_RULE and f["alpha_ratio"] < ALPHA_RATIO_MIN)
    ):
        return FORMATTING_LABEL
    return LABELS[0]


def clean_score_of(text: str, label: str) -> float:
    f = features(text)
    score_raw = (
        W_ALPHA * f["alpha_ratio"]
        + W_LEN * (float(min(f["n_chars"], LEN_NORM)) / float(LEN_NORM))
        + W_SYM * (1.0 - f["symbol_ratio"])
    )
    damped = score_raw if label == LABELS[0] else 0.4 * score_raw
    return _bround3(damped)


def _bround3(x: float) -> float:
    """Spark ``bround(x, 3)`` semantics: HALF_EVEN on the shortest decimal
    repr of the double (Java ``BigDecimal.valueOf`` goes through
    ``Double.toString``; Python ``repr`` produces the same shortest
    round-trip digits).  NOT the same as Python ``round``, which rounds the
    exact binary value — e.g. 0.7675 (binary ≈ …74999…96) rounds to 0.767
    in Python but 0.768 in Spark and DuckDB."""
    from decimal import ROUND_HALF_EVEN, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.001"), ROUND_HALF_EVEN))


def scrub_of(text: str) -> str:
    out = text
    for rx, rep in _SCRUB_RES:
        out = rx.sub(rep, out)
    return out


@dataclass
class Turn:
    conv_id: str
    turn_idx: int
    text: str
    label: str = ""
    clean_score: float = 0.0
    lang: str | None = None
    lang_prob: float | None = None


def score(turns: list[Turn]) -> list[Turn]:
    for t in turns:
        text = t.text if t.text is not None else ""
        t.label = label_of(text)
        t.clean_score = clean_score_of(text, t.label)
    return turns


# --- per-conversation modes (turns must be one conversation, sorted) -------

def keep_flags(
    turns: list[Turn],
    labels_to_remove: list[str] | None = None,
    score_threshold: float | None = None,
    salvage_doc_lang: str | None = None,
) -> list[bool]:
    if score_threshold is not None:
        return [t.clean_score >= score_threshold for t in turns]
    if salvage_doc_lang is not None:
        return [
            t.label == "Clean" and t.clean_score > 0.9 and t.lang == salvage_doc_lang
            for t in turns
        ]
    labels = parse_labels(labels_to_remove)
    return [t.label not in labels for t in turns]


def filter_mode(turns: list[Turn], keep: list[bool]) -> list[Turn]:
    return [t for t, k in zip(turns, keep) if k]


def trim_mode(turns: list[Turn], keep: list[bool]) -> list[Turn]:
    start = 0
    while start < len(keep) and not keep[start]:
        start += 1
    end = len(keep) - 1
    while end >= 0 and not keep[end]:
        end -= 1
    if start <= end:
        return turns[start : end + 1]
    return []


def doc_text(turns: list[Turn]) -> str:
    return "\n".join((t.text if t.text is not None else "") for t in turns)


def min_doc_length_filter(turns: list[Turn], min_len: int) -> list[Turn]:
    return turns if len(doc_text(turns)) >= min_len else []


def drop_empty(turns: list[Turn]) -> list[Turn]:
    return turns if doc_text(turns) else []


def document_lang(turns: list[Turn]) -> str | None:
    mass: dict[str, float] = {}
    for t in turns:
        if t.lang is not None:
            mass[t.lang] = mass.get(t.lang, 0.0) + (t.lang_prob or 0.0)
    if not mass:
        return None
    # highest mass, tie → lexicographically largest lang (matches Spark
    # max_by(lang, struct(lang_mass, lang)))
    return max(mass.items(), key=lambda kv: (kv[1], kv[0]))[0]


def clean_pipeline(
    convs: dict[str, list[Turn]],
    mode: str = "filter",
    labels_to_remove: list[str] | str | None = "all",
    score_threshold: float | None = None,
    min_doc_length: int = 1,
    scrub: bool = True,
) -> dict[str, list[Turn]]:
    """Oracle mirror of quality_filter.pipeline.clean_pipeline (turn-grained
    output, per conversation)."""
    out: dict[str, list[Turn]] = {}
    for conv_id, turns in convs.items():
        turns = sorted(turns, key=lambda t: t.turn_idx)
        score(turns)
        if score_threshold is not None:
            keep = keep_flags(turns, score_threshold=score_threshold)
        else:
            keep = keep_flags(turns, labels_to_remove=parse_labels(labels_to_remove))
        survivors = filter_mode(turns, keep) if mode == "filter" else trim_mode(turns, keep)
        if min_doc_length > 1:
            survivors = min_doc_length_filter(survivors, min_doc_length)
        else:
            survivors = drop_empty(survivors)
        if survivors:
            out[conv_id] = survivors
    if scrub:
        for turns in out.values():
            for t in turns:
                t.scrubbed_text = scrub_of(t.text if t.text is not None else "")  # type: ignore[attr-defined]
    return out

"""A4 resegmentation parity vs a verbatim Python port of the reference
packing loop (src/label_lines_with_LLM.py:144-168), plus A9 language-map
lookups."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from quality_filter.langmap import LANGUAGE_NAMES, lang_name_expr
from quality_filter.reseg import resegment, segments_expr


def _reference_segments(text: str) -> list[str]:
    """Line-for-line port of the reference's split_long_line_into_segments
    (lookbehind split; the engine's sentinel split is equivalent)."""
    sentences = re.split(r"(?<=[.!?])\s+", text)
    segments = []
    current_segment = ""
    for sentence in sentences:
        if len(current_segment) + len(sentence) + 1 > 200:
            segments.append(current_segment.strip())
            current_segment = sentence
        else:
            current_segment += " " + sentence
    if current_segment:
        segments.append(current_segment.strip())
    return segments


LONG_SENT = "word " * 50 + "end."          # ~254 chars, no interior boundary
CASES = [
    "",                                     # empty text
    "short line with no boundary at all",   # no [.!?]
    "One. Two! Three? Four.",               # many tiny sentences
    LONG_SENT.strip(),                      # single over-long sentence
    (LONG_SENT + "Tail sentence here. And another one follows!").strip(),
    ("Lead in. " + LONG_SENT).strip(),      # over-long in the middle
    " \t leading whitespace. then more text after the boundary.",
    ("S. " * 120).strip(),                  # packs many sentences per segment
    "Ends exactly at boundary" + "x" * 175 + ". next one.",
]


def test_segments_match_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["segs"]
        for r in df.select(
            "doc_id", segments_expr(F.col("text")).alias("segs")
        ).collect()
    }
    for i, t in enumerate(CASES):
        assert got[i] == _reference_segments(t), (i, t[:60], got[i])


def test_resegment_rows(spark):
    df = spark.createDataFrame([(7, CASES[4])], "doc_id long, text string")
    rows = resegment(df).orderBy("seg_idx").collect()
    expect = _reference_segments(CASES[4])
    assert [r["segment"] for r in rows] == expect
    assert [r["seg_idx"] for r in rows] == list(range(len(expect)))


def test_lang_name_lookup(spark):
    df = spark.createDataFrame(
        [("eng_Latn",), ("zho_Hans",), ("xxx_Latn",), (None,)], "code string"
    )
    out = {r["code"]: r["name"] for r in df.select(
        "code", lang_name_expr(F.col("code")).alias("name")
    ).collect()}
    assert out["eng_Latn"] == "English"
    assert out["zho_Hans"] == "Simplified Chinese"
    assert out["xxx_Latn"] == "Unknown"
    assert out[None] == "Unknown"
    # every reference code resolves
    codes = list(LANGUAGE_NAMES)
    df2 = spark.createDataFrame([(c,) for c in codes], "code string")
    n = df2.select(lang_name_expr(F.col("code")).alias("n")).filter(
        "n = 'Unknown'"
    ).count()
    assert n == 0

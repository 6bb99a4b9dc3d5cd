"""Doc-shaped operator tests against hand-computed reference semantics
(FIXTURES.md F3: trailing-newline doc, all-bad doc, both-edge trim,
splitlines-divergence case, salvage lang slicing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quality_filter.docmodel import (
    alignment_ok,
    doc_gates,
    doc_lang_expr,
    explode_document,
    filter_doc_lines,
    salvage_doc_filter,
    trim_doc_lines,
)

CLEAN = "Clean"
NAV = "Navigation & Interface Elements"
SPAM = "Promotional & Spam Content"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # (id, text, seg_langs, lang, prob, doc_scores, robotstxt, labels, scores)
        ("d1", "good line\nnav bar\nanother good", ["en", "en", "en"],
         ["en", "de"], [0.9, 0.1], [3.0], "allowed",
         [CLEAN, NAV, CLEAN], [0.95, 0.2, 0.92]),
        ("d2", "nav\ngood\nspam", ["en", "en", "de"],
         ["de", "en"], [0.2, 0.8], [6.0], "allowed",
         [NAV, CLEAN, SPAM], [0.1, 0.97, 0.05]),
        ("d3", "nav\nspam", ["en", "en"], ["en"], [1.0], [2.0], "disallowed",
         [NAV, SPAM], [0.1, 0.2]),                      # all-bad
        ("d4", "trailing\n", ["en", "en"], ["en"], [1.0], [1.0], "allowed",
         [CLEAN, NAV], [0.95, 0.1]),                     # trailing newline
        ("d5", "a\x85b\ngood", ["en", "en"], ["en"], [1.0], [1.0], "allowed",
         [NAV, CLEAN], [0.1, 0.95]),                     # splitlines() would give 3 lines
    ]
    schema = ("id string, text string, seg_langs array<string>, lang array<string>, "
              "prob array<double>, doc_scores array<double>, robotstxt string, "
              "line_quality_labels array<string>, quality_scores array<double>")
    return spark.createDataFrame(rows, schema)


def test_alignment_invariant_holds(spark, docs):
    # canonical splitter is split('\n') — d4's trailing newline yields 2
    # lines, d5's \x85 does NOT split (split("\n") semantics, the scorer's
    # splitter at src/classifier_inference_pipeline.py:41)
    assert docs.filter(~alignment_ok(docs)).count() == 0


def test_doc_lang_argmax_first_max(spark, docs):
    got = {r["id"]: r["dl"] for r in docs.select("id", doc_lang_expr(F.col("lang"), F.col("prob")).alias("dl")).collect()}
    assert got == {"d1": "en", "d2": "en", "d3": "en", "d4": "en", "d5": "en"}


def test_explode_document(spark, docs):
    rows = explode_document(docs).filter("id = 'd1'").orderBy("line_idx").collect()
    assert [(r["line"], r["label"], r["clean_score"]) for r in rows] == [
        ("good line", CLEAN, 0.95),
        ("nav bar", NAV, 0.2),
        ("another good", CLEAN, 0.92),
    ]


def test_filter_doc_lines(spark, docs):
    out = {r["id"]: r for r in filter_doc_lines(docs, "all").collect()}
    assert out["d1"]["text"] == "good line\nanother good"
    assert out["d1"]["line_quality_labels"] == [CLEAN, CLEAN]
    assert out["d1"]["quality_scores"] == [0.95, 0.92]
    assert out["d3"]["text"] == ""
    assert out["d3"]["line_quality_labels"] == []
    assert out["d4"]["text"] == "trailing"


def test_trim_doc_lines_edges_only(spark, docs):
    out = {r["id"]: r for r in trim_doc_lines(docs, "all").collect()}
    # d2: nav|good|spam → trim both edges → "good"
    assert out["d2"]["text"] == "good"
    assert out["d2"]["line_quality_labels"] == [CLEAN]
    # d1: clean|nav|clean → interior nav survives
    assert out["d1"]["text"] == "good line\nnav bar\nanother good"
    # d3 all-bad → empty
    assert out["d3"]["text"] == ""
    assert out["d3"]["quality_scores"] == []


def test_salvage_doc_filter_slices_langs(spark, docs):
    out = {r["id"]: r for r in salvage_doc_filter(docs).collect()}
    # d2: only 'good' is Clean & >0.9; seg_langs[1]='en' == doc lang 'en'
    assert out["d2"]["text"] == "good"
    assert out["d2"]["seg_langs"] == ["en"]
    # d1: two clean >0.9 lines, both en
    assert out["d1"]["text"] == "good line\nanother good"
    assert out["d1"]["seg_langs"] == ["en", "en"]


def test_doc_gates(spark, docs):
    # robots + doc_scores[0] < 5 (P1/P3/S7)
    kept = doc_gates(docs, require_robots_allowed=True, doc_score_max=5.0)
    assert sorted(r["id"] for r in kept.select("id").collect()) == ["d1", "d4", "d5"]
    # empty-doc drop after all-filter (P4)
    filtered = filter_doc_lines(docs, "all")
    assert sorted(r["id"] for r in doc_gates(filtered).select("id").collect()) == [
        "d1", "d2", "d4", "d5",
    ]

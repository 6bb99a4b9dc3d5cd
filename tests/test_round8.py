"""Round-8 additions: the Arrow-compute batch kernel of the fused corpus
gate must be COLUMN-EXACT against the r7 row kernel (which stays in the
tree as the parity oracle), including the exact-fallback lanes — exotic
Unicode whitespace, unicode-letter tokens without ASCII letters, adjacent
letterless tokens, empty/None/ws-only docs."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _adversarial_docs():
    rng = random.Random(20260818)
    vocab = [
        "the", "of", "and", "données", "中文", "naïve", "x9", "####",
        "word", "…", "...", "-lead", "•dot", "mix#ed", "a", "be", "to",
        "that", "have", "with", "{", "lorem", "IPSUM", "9.9", "9!9",
    ]
    docs = []
    for d in range(400):
        lines = []
        for _ in range(rng.randint(0, 14)):
            ws = [rng.choice(vocab) for _ in range(rng.randint(0, 11))]
            ln = " ".join(ws)
            if rng.random() < 0.2:
                ln = "- " + ln
            if rng.random() < 0.1:
                ln = "  " + ln + "   "
            if rng.random() < 0.6:
                ln += rng.choice(["...", "…", ".", "!", '?"', ". ", "… "])
            lines.append(ln)
        if lines and rng.random() < 0.4:
            lines.append(rng.choice(lines))
        if lines and rng.random() < 0.3:
            lines = lines + lines[:3]  # planted duplicate lines
        txt = "\n".join(lines)
        if rng.random() < 0.3:
            txt = txt.replace("\n", "\n\n", 1)
        docs.append((d, txt))
    good = "the be to of and that have with plenty of words here fine."
    docs += [
        (900, None), (901, ""), (902, "   \n  \n "),
        (903, "\n".join(f"line {i} has {good}" for i in range(8))),
        (904, "Lorem IPSUM hides in the page of the and be that have words."),
        (905, "json = { of the and be that have words here too. }"),
        (906, "\n".join(["- the be of and that with have bullet line."] * 8)),
        # adjacent letterless tokens (the rare-class count must not let
        # them consume each other's delimiter)
        (907, "\n".join(["9 9 9 ## the of and be that have 42 fine."] * 5)),
        # unicode-letter tokens with no ASCII letter → isalpha fallback
        (908, "\n".join(["中文 中文 the of and be that have naïve fine."] * 5)),
        # punctuation-only unicode tokens (must stay NON-alpha)
        (909, "\n".join(["… « » the of and be that have words fine."] * 5)),
        # exotic Unicode whitespace → exact row-kernel lane
        (910, "\n".join(
            f"word{i} the be\u00a0to of and that have with plenty words fine."
            for i in range(6))),
        (911, "\n".join(
            f"word{i} \u3000the be to of and that have with plenty words fine."
            for i in range(6))),
        (912, "\n".join(
            f"word{i} the\u2028be to of and that have with plenty words fine."
            for i in range(6))),
        # tabs/vertical ws inside lines (ASCII ws set, fast lane)
        (913, "\n".join(
            f"word{i} the\tbe to\x0bof and\fthat have with plenty words fine."
            for i in range(6))),
    ]
    return docs


def test_fused_gate_batch_equals_row_kernel(spark):
    from quality_filter.textstats import fused_gate_arrow

    df = spark.createDataFrame(_adversarial_docs(), "doc_id long, text string")
    cols = ["doc_id", "clean_text", "c4_keep", "gopher_keep"]
    row = {r["doc_id"]: r for r in
           fused_gate_arrow(df, impl="row").select(cols).collect()}
    batch = {r["doc_id"]: r for r in
             fused_gate_arrow(df, impl="batch").select(cols).collect()}
    assert row.keys() == batch.keys()
    diffs = [i for i in row if tuple(row[i]) != tuple(batch[i])]
    assert not diffs, f"batch kernel diverges from row kernel on: {diffs[:10]}"
    # sanity: the fixture exercises both verdicts and both lanes
    assert any(r["gopher_keep"] for r in row.values())
    assert any(not r["c4_keep"] for r in row.values())
    assert row[910]["gopher_keep"] and row[913]["gopher_keep"]


def test_fused_gate_batch_equals_row_on_synth(spark):
    from quality_filter.synth import synth_documents
    from quality_filter.textstats import fused_gate_arrow

    docs = synth_documents(spark, 1500, seed=11).select("doc_id", "text")
    cols = ["doc_id", "clean_text", "c4_keep", "gopher_keep"]
    a = {tuple(r) for r in fused_gate_arrow(docs, impl="row").select(cols).collect()}
    b = {tuple(r) for r in fused_gate_arrow(docs, impl="batch").select(cols).collect()}
    assert a == b and len(a) == 1500


def test_fused_gate_bad_impl_raises(spark):
    import pytest

    from quality_filter.textstats import fused_gate_arrow

    df = spark.createDataFrame([(1, "x.")], "doc_id long, text string")
    with pytest.raises(ValueError, match="impl"):
        fused_gate_arrow(df, impl="numpy")

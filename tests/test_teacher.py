"""M2 teacher-labeling loop (quality_filter.teacher): the reference's
classification_pipeline shape with a pluggable generator — batching,
prompt rendering, A7 strip/repair/parse, line-number alignment with the
Clean default, invalid-label coercion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _lines(spark, n_docs=12, max_lines=47):
    """Multi-batch docs (up to 3 batches at lines_per_batch=20) with
    sparse line indexes and planted empty / coercion-length lines."""
    rows = []
    for d in range(n_docs):
        n = 3 + (d * 11) % max_lines
        for i in range(n):
            text = " ".join(f"w{d}x{j}" for j in range((d + 3 * i) % 9))
            rows.append((d, i * 10 + (d % 3), text))  # sparse, shifted idx
    return spark.createDataFrame(rows, "doc_id long, line_idx long, text string")


def test_loop_reproduces_teacher_rule_exactly(spark):
    from quality_filter.teacher import (
        fake_structured_teacher,
        fake_teacher_label_expr,
        label_lines_with_teacher,
    )

    lines = _lines(spark)
    out = label_lines_with_teacher(
        lines, fake_structured_teacher, idx_col="line_idx"
    )
    expected = lines.select(
        "doc_id", "line_idx", "text",
        fake_teacher_label_expr(F.col("text")).alias("label"),
    )
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, expected.collect()))
    assert a == b and len(a) == lines.count()
    # the fixture exercises both the invalid->Clean coercion and several
    # distinct taxonomy labels
    labs = {r["label"] for r in out.collect()}
    assert "Clean" in labs and len(labs) >= 4


def test_loop_verbatim_prompt_runs_and_stays_in_taxonomy(spark):
    """The byte-compatible reference template path: the scraping fake
    cannot be exact there (the template's own instruction examples look
    like payload blocks), but every emitted label must still be in the
    fixed taxonomy and every input line must come back exactly once."""
    from quality_filter.labels import LABELS
    from quality_filter.teacher import (
        fake_structured_teacher,
        label_lines_with_teacher,
    )

    lines = _lines(spark, n_docs=4)
    out = label_lines_with_teacher(
        lines, fake_structured_teacher, idx_col="line_idx", prompt="verbatim"
    ).collect()
    assert len(out) == lines.count()
    assert all(r["label"] in LABELS for r in out)


def test_unparseable_output_defaults_all_lines_clean(spark):
    from quality_filter.teacher import label_lines_with_teacher

    lines = _lines(spark, n_docs=2)
    out = label_lines_with_teacher(
        lines, lambda ps: ["total garbage %% not json" for _ in ps],
        idx_col="line_idx",
    ).collect()
    assert len(out) == lines.count()
    assert all(r["label"] == "Clean" for r in out)


def test_generate_count_mismatch_raises(spark):
    from quality_filter.teacher import label_lines_with_teacher

    lines = _lines(spark, n_docs=2)
    bad = label_lines_with_teacher(
        lines, lambda ps: ["{}"] * (len(ps) + 1), idx_col="line_idx"
    )
    with pytest.raises(Exception, match="generate_fn returned"):
        bad.collect()


def test_bad_args_raise(spark):
    from quality_filter.teacher import label_lines_with_teacher

    lines = _lines(spark, n_docs=1)
    with pytest.raises(ValueError, match="prompt"):
        label_lines_with_teacher(lines, lambda p: p, prompt="vllm")
    with pytest.raises(ValueError, match="lines_per_batch"):
        label_lines_with_teacher(lines, lambda p: p, lines_per_batch=0)


def test_even_batching_matches_array_split(spark):
    """_even_batch_index == np.array_split group sizes for every (n, B)
    in a dense grid — the reference's `batched` semantics exactly."""
    import numpy as np

    rows = [(n, p) for n in range(1, 61) for p in range(n)]
    df = spark.createDataFrame(rows, "n long, pos long")
    from quality_filter.teacher import _even_batch_index

    for B in (1, 3, 7, 20):
        got = {}
        for r in df.select(
            "n", "pos", _even_batch_index(F.col("pos"), F.col("n"), B).alias("b")
        ).collect():
            got.setdefault(r["n"], {}).setdefault(r["b"], 0)
            got[r["n"]][r["b"]] += 1
        for n in range(1, 61):
            import math

            want = [len(c) for c in np.array_split(range(n), math.ceil(n / B))]
            have = [got[n][i] for i in sorted(got[n])]
            assert have == want, (n, B, have, want)


def test_synonym_review_seam(spark):
    """M3 review step: accepting reviewer keeps medoid groups; a
    renaming/splitting reviewer re-keys labels; unparseable review output
    falls back to identity for that group only."""
    from quality_filter.llmprep import load_verbatim_template
    from quality_filter.taxonomy import (
        fake_accepting_reviewer,
        review_synonym_groups,
    )

    groups = {
        "spam": ["spam", "advertising", "promotional"],
        "contact": ["contact", "contact info"],
        "legal": ["legal"],  # single-member: must skip review entirely
    }
    calls = []

    def spying_reviewer(prompts):
        calls.extend(prompts)
        return fake_accepting_reviewer(prompts)

    out = review_synonym_groups(groups, spying_reviewer)
    assert out == {
        "spam": ["spam", "advertising", "promotional"],
        "contact": ["contact", "contact info"],
        "legal": ["legal"],
    }
    assert len(calls) == 2  # single-member group never hit the reviewer
    tmpl = load_verbatim_template("synonyms")
    assert calls[0].startswith(tmpl.split("__GROUP_NAME__")[0])

    def renaming_reviewer(prompts):
        # split the spam group, rename contact — the LLM's prerogative
        outs = []
        for p in prompts:
            if "'advertising'" in p:
                outs.append(
                    '{"Promotional & Spam Content": ["spam", "advertising"],'
                    ' "Ads": ["promotional"],}'  # trailing comma → repair path
                )
            else:
                outs.append("not even json {{{")
        return outs

    out2 = review_synonym_groups(groups, renaming_reviewer)
    assert out2["Promotional & Spam Content"] == ["spam", "advertising"]
    assert out2["Ads"] == ["promotional"]
    assert "contact" not in out2  # unparseable → group dropped (identity)
    assert out2["legal"] == ["legal"]


def test_consolidate_labels_with_review(spark):
    from quality_filter.taxonomy import consolidate_labels, fake_accepting_reviewer

    labels = ["spam", "spam content", "contact", "contact info", "legal"]
    base = consolidate_labels(spark, labels, n_clusters=3)
    reviewed = consolidate_labels(
        spark, labels, n_clusters=3, review_fn=fake_accepting_reviewer
    )
    # the accepting reviewer must reproduce the medoid mapping exactly
    assert reviewed == base
    assert set(reviewed) == set(labels)


def test_review_count_mismatch_raises(spark):
    import pytest

    from quality_filter.taxonomy import review_synonym_groups

    with pytest.raises(ValueError, match="review_fn returned"):
        review_synonym_groups({"a": ["a", "b"]}, lambda ps: [])


def test_cli_label_subcommand(spark, tmp_path):
    """End-to-end CLI surface: parquet lines in → labeled parquet +
    vocab TSV out, with the default deterministic teacher."""
    from quality_filter.cli import main
    from quality_filter.teacher import fake_teacher_label_expr

    lines = _lines(spark, n_docs=4)
    inp = str(tmp_path / "lines.parquet")
    outp = str(tmp_path / "labeled.parquet")
    vocab = str(tmp_path / "vocab.tsv")
    lines.write.parquet(inp)
    main([
        "label", "--data-path", inp, "--save-path", outp,
        "--prompt", "condensed", "--vocab-path", vocab,
    ])
    got = spark.read.parquet(outp)
    expected = lines.select(
        "doc_id", "line_idx", "text",
        fake_teacher_label_expr(F.col("text")).alias("label"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )
    tsv = spark.read.option("sep", "\t").csv(vocab).collect()
    assert sum(int(r["_c1"]) for r in tsv) == lines.count()

"""Salvage pipeline parity: Clean ∧ score>0.9 ∧ lang==document_lang with
doc pre/post length gates (``src/salvage_low_quality_data.py:176-259``)."""

from __future__ import annotations

from collections import defaultdict

import pytest

from quality_filter.langid import with_langid
from quality_filter.pipeline import salvage_pipeline
from tests import oracle


@pytest.fixture(scope="module")
def langid_transcripts(spark, transcripts):
    df = with_langid(transcripts).cache()
    df.count()
    return df


def _oracle_salvage(rows, mode, min_doc_length):
    convs = defaultdict(list)
    for r in rows:
        convs[r["conv_id"]].append(
            oracle.Turn(
                conv_id=r["conv_id"],
                turn_idx=r["turn_idx"],
                text=r["text"],
                lang=r["lang"],
                lang_prob=r["lang_prob"],
            )
        )
    expect = {}
    for conv_id, turns in convs.items():
        turns = sorted(turns, key=lambda t: t.turn_idx)
        # doc pre-gate on ORIGINAL text length
        if len(oracle.doc_text(turns)) < min_doc_length:
            continue
        oracle.score(turns)
        doc_lang = oracle.document_lang(turns)
        if mode == "filter":
            keep = oracle.keep_flags(turns, salvage_doc_lang=doc_lang)
            survivors = oracle.filter_mode(turns, keep)
        else:
            # reference salvage trim bounds on the label alone
            # (src/salvage_low_quality_data.py:191-203)
            keep = [t.label == "Clean" for t in turns]
            survivors = oracle.trim_mode(turns, keep)
        survivors = oracle.min_doc_length_filter(survivors, min_doc_length)
        for t in survivors:
            expect[(conv_id, t.turn_idx)] = t
    return expect


@pytest.mark.parametrize("mode", ["filter", "trim"])
@pytest.mark.parametrize("min_len", [1, 250])
def test_salvage_matches_oracle(spark, langid_transcripts, mode, min_len):
    rows = langid_transcripts.collect()
    expect = _oracle_salvage(rows, mode, min_len)
    got = {
        (r["conv_id"], r["turn_idx"]): r
        for r in salvage_pipeline(
            langid_transcripts, mode=mode, min_doc_length=min_len
        ).collect()
    }
    assert set(got) == set(expect), (
        len(got),
        len(expect),
        list(set(got) ^ set(expect))[:6],
    )
    for key, row in got.items():
        assert row["label"] == expect[key].label
        assert row["clean_score"] == expect[key].clean_score


def test_document_lang_skew_safe_plan_and_result(spark):
    """One 20k-turn conversation (heavy skew): the agg_join document-lang
    strategy must stay window-free (two map-side-combinable groupBys) and
    the tiny per-conv aggregate must come back via a broadcast join; the
    single-pass window strategy must produce identical assignments."""
    from quality_filter.pipeline import with_document_lang

    rows = [("big", i, "en" if i % 3 else "de", 0.9 if i % 3 else 0.8)
            for i in range(20_000)]
    rows += [("small", 0, "fr", 1.0), ("small", 1, "fr", 0.9)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, lang string, lang_prob double"
    )
    out = with_document_lang(df, strategy="agg_join")
    langs = {(r["conv_id"], r["document_lang"]) for r in out.collect()}
    # big: en mass = 13333*0.9 ≈ 12000 > de mass ≈ 5333*0.8
    assert langs == {("big", "en"), ("small", "fr")}
    # AQE finalizes the physical plan only after execution of THIS frame
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "agg_join must not use a window"
    assert "BroadcastHashJoin" in plan, plan
    # window strategy: same assignments, single evaluation of the input
    win = with_document_lang(df, strategy="window")
    got = {(r["conv_id"], r["turn_idx"], r["document_lang"]) for r in win.collect()}
    expect = {(r["conv_id"], r["turn_idx"],
               "en" if r["conv_id"] == "big" else "fr")
              for r in df.collect()}
    assert got == expect


def test_salvage_keeps_only_clean_high_conf_lang_matched(spark, langid_transcripts):
    out = salvage_pipeline(langid_transcripts, mode="filter", min_doc_length=1)
    bad = out.filter("label != 'Clean' OR clean_score <= 0.9").count()
    assert bad == 0


def test_document_lang_null_conv_id_strategy_parity(spark):
    """NULL conv_id rows form one group in BOTH strategies (the agg_join
    join-back is null-safe, like _attach_per_conv's)."""
    from quality_filter.pipeline import with_document_lang

    rows = [(None, 0, "en", 0.9), (None, 1, "de", 0.5), ("x", 0, "fr", 1.0)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, lang string, lang_prob double"
    )
    outs = {
        strat: sorted(
            ((r["conv_id"], r["turn_idx"], r["document_lang"])
             for r in with_document_lang(df, strat).collect()),
            key=str,
        )
        for strat in ("window", "agg_join")
    }
    assert outs["window"] == outs["agg_join"]
    assert ("x", 0, "fr") in outs["window"]
    assert (None, 0, "en") in outs["window"]  # en mass 0.9 > de 0.5

"""Language-ID and perplexity scorer tests: accuracy on labeled synthetic
turns, determinism across partitionings/batch compositions, and gate
semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from quality_filter import ngram
from quality_filter.langid import build_artifact, score_batch, with_langid
from quality_filter.perplexity import keep_by_perplexity, with_perplexity
from quality_filter.synth import synth_transcripts


# --- ngram machinery -------------------------------------------------------

def test_trigram_hash_counts_and_offsets():
    h, off = ngram.batch_trigram_hashes(["abc", "", "é", "xy"])
    # per-row trigram count == utf-8 byte count (NUL-pad scheme)
    assert list(off) == [0, 3, 3, 5, 7]
    assert h.shape[0] == 7


def test_row_hashes_independent_of_batch_composition():
    h1, off1 = ngram.batch_trigram_hashes(["hello world", "zzz"])
    h2, off2 = ngram.batch_trigram_hashes(["completely different prefix", "hello world"])
    row_a = h1[off1[0]:off1[1]]
    row_b = h2[off2[1]:off2[2]]
    assert np.array_equal(row_a, row_b)


def test_segment_sums_empty_spans():
    vals = np.array([1.0, 2.0, 3.0, 4.0])
    off = np.array([0, 2, 2, 4, 4])
    got = ngram.segment_sums(vals, off)
    assert list(got) == [3.0, 0.0, 7.0, 0.0]
    # 2-D variant
    got2 = ngram.segment_sums(np.stack([vals, 2 * vals]), off)
    assert got2.shape == (2, 4)
    assert list(got2[1]) == [6.0, 0.0, 14.0, 0.0]


# --- language ID -----------------------------------------------------------

SAMPLES = [
    ("en", "The meeting went well and everyone agreed on the schedule for next week."),
    ("de", "Das Treffen verlief gut und alle waren mit dem Zeitplan einverstanden."),
    ("fr", "La réunion s'est bien passée et tout le monde a accepté le calendrier."),
    ("es", "La reunión salió bien y todos estuvieron de acuerdo con el calendario."),
    ("zh", "会议进行得很顺利大家都同意下周的时间安排"),
    ("ru", "Встреча прошла хорошо и все согласились с расписанием на следующую неделю."),
    ("fi", "Kokous sujui hyvin ja kaikki hyväksyivät ensi viikon aikataulun."),
]


def test_langid_batch_accuracy():
    langs, profiles = build_artifact()
    out = score_batch(pd.Series([t for _, t in SAMPLES]), langs, profiles)
    got = list(out["lang"])
    want = [l for l, _ in SAMPLES]
    assert got == want, list(zip(want, got))
    assert (out["lang_prob"] > 0.2).all()


def test_langid_short_text_is_unknown():
    langs, profiles = build_artifact()
    out = score_batch(pd.Series(["", "ab", None]), langs, profiles)
    assert list(out["lang"]) == ["und", "und", "und"]
    assert list(out["lang_prob"]) == [0.0, 0.0, 0.0]


def test_langid_spark_matches_local_and_is_partition_invariant(spark):
    df = spark.createDataFrame(
        [(l, i, t) for i, (l, t) in enumerate(SAMPLES)],
        "want string, turn_idx int, text string",
    )
    one = {
        r["turn_idx"]: (r["lang"], r["lang_prob"])
        for r in with_langid(df.coalesce(1)).collect()
    }
    many = {
        r["turn_idx"]: (r["lang"], r["lang_prob"])
        for r in with_langid(df.repartition(7)).collect()
    }
    assert one == many
    langs, profiles = build_artifact()
    local = score_batch(pd.Series([t for _, t in SAMPLES]), langs, profiles)
    for i in range(len(SAMPLES)):
        assert one[i][0] == local["lang"][i]
        assert one[i][1] == pytest.approx(local["lang_prob"][i], abs=0)


def test_langid_on_synth_truth(spark):
    df = synth_transcripts(spark, n_convs=40, seed=11, with_truth=True)
    # language ID is only meaningful on linguistic text — evaluate on the
    # clean-bank turns (defect templates are nav bars / HTML / garble)
    scored = with_langid(df).filter("length(text) >= 40 AND true_kind = 'clean'")
    rows = scored.select("true_lang", "lang").collect()
    acc = sum(1 for r in rows if r["lang"] == r["true_lang"]) / len(rows)
    assert acc >= 0.95, acc


# --- perplexity ------------------------------------------------------------

def test_perplexity_orders_text_quality(spark):
    rows = [
        ("c", 0, "we reviewed the results together and agreed on the next steps"),
        ("c", 1, "qzx vkj wpf bgh mzn dtl rkv xqs jwm"),
        ("c", 2, "$$$ %%% ### @@@ *** ^^^"),
        ("c", 3, ""),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {r["turn_idx"]: r["logppl"] for r in with_perplexity(df).collect()}
    # natural text sits far below both garble kinds (which saturate near
    # the smoothing floor of 8 bits/byte)
    assert got[0] < 5.0 < got[1] and got[0] < 5.0 < got[2], got
    assert got[3] == 8.0
    # natural text should sit clearly below garble — gate splits them
    kept = (
        with_perplexity(df)
        .filter(keep_by_perplexity((got[0] + got[1]) / 2))
        .select("turn_idx")
        .collect()
    )
    assert sorted(r["turn_idx"] for r in kept) == [0]


def test_perplexity_partition_invariant(spark):
    df = synth_transcripts(spark, n_convs=20, seed=5)
    a = {
        (r["conv_id"], r["turn_idx"]): r["logppl"]
        for r in with_perplexity(df.coalesce(1)).collect()
    }
    b = {
        (r["conv_id"], r["turn_idx"]): r["logppl"]
        for r in with_perplexity(df.repartition(8)).collect()
    }
    assert a == b

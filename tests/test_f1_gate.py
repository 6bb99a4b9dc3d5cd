"""The BASELINE.json quality gate, reported explicitly: per-turn keep/drop
F1 vs the golden oracle across filter/trim/score modes on a larger synth
table, plus byte-parity of scrubbed text.  (Parity is exact by design —
F1 = 1.0 — but this test computes and asserts the metric the gate names.)"""

from __future__ import annotations

from collections import defaultdict

import pytest

from quality_filter.pipeline import clean_pipeline
from quality_filter.synth import synth_transcripts
from tests import oracle


def _f1(tp: int, fp: int, fn: int) -> float:
    if tp == 0:
        return 0.0 if (fp or fn) else 1.0
    p = tp / (tp + fp)
    r = tp / (tp + fn)
    return 2 * p * r / (p + r)


@pytest.fixture(scope="module")
def big(spark):
    df = synth_transcripts(spark, n_convs=500, seed=77, max_turns=30,
                           skew_convs=2, skew_turns=1500).cache()
    rows = df.collect()
    return df, rows


@pytest.mark.parametrize(
    "kw",
    [
        dict(mode="filter", labels_to_remove="all"),
        dict(mode="filter", labels_to_remove="toxic,spam"),
        dict(mode="trim", labels_to_remove="all"),
        dict(mode="filter", score_threshold=0.9, labels_to_remove=None),
    ],
    ids=["filter-all", "filter-partial", "trim-all", "score-0.9"],
)
def test_keep_drop_f1_at_least_0_99(spark, big, kw):
    df, rows = big
    convs = defaultdict(list)
    for r in rows:
        convs[r["conv_id"]].append(
            oracle.Turn(conv_id=r["conv_id"], turn_idx=r["turn_idx"], text=r["text"])
        )
    expect = oracle.clean_pipeline(dict(convs), **kw)
    want_kept = {
        (cid, t.turn_idx) for cid, turns in expect.items() for t in turns
    }
    got_kept = {
        (r["conv_id"], r["turn_idx"])
        for r in clean_pipeline(df, **kw).select("conv_id", "turn_idx").collect()
    }
    all_keys = {(r["conv_id"], r["turn_idx"]) for r in rows}
    tp = len(got_kept & want_kept)
    fp = len(got_kept - want_kept)
    fn = len(want_kept - got_kept)
    f1 = _f1(tp, fp, fn)
    print(f"\nkeep/drop F1 [{kw}]: {f1:.6f} (tp={tp} fp={fp} fn={fn} n={len(all_keys)})")
    assert f1 >= 0.99
    assert f1 == 1.0  # exact by design


def test_scrubbed_bytes_exact(spark, big):
    df, rows = big
    out = clean_pipeline(df, mode="filter", labels_to_remove="all", scrub=True)
    got = {
        (r["conv_id"], r["turn_idx"]): r["scrubbed_text"]
        for r in out.select("conv_id", "turn_idx", "scrubbed_text").collect()
    }
    mismatch = 0
    for r in rows:
        key = (r["conv_id"], r["turn_idx"])
        if key in got and got[key] != oracle.scrub_of(r["text"] or ""):
            mismatch += 1
    assert mismatch == 0


def test_freq_merge(spark):
    from quality_filter.io import merge_freq_tables

    a = spark.createDataFrame([("Clean", 10), ("Spam", 2)], "label string, count long")
    b = spark.createDataFrame([("Clean", 5), ("Nav", 1)], "label string, count long")
    got = {r["label"]: r["count"] for r in merge_freq_tables(a, b).collect()}
    assert got == {"Clean": 15, "Spam": 2, "Nav": 1}

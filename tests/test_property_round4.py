"""Property-based parity for the round-4 operators: eval report vs a
Python confusion-matrix implementation, Cohen's kappa vs its closed
form, mixture resample vs exact integer arithmetic, quality-weighted
sampling vs its spec.

Pattern as in test_property_parity.py: hypothesis generates all examples
up front (deterministic), then ONE Spark job checks the whole batch."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings, strategies as st

from quality_filter.sampling import _MIX


def _gather(strategy, n_batches=12):
    out = []

    @settings(max_examples=n_batches, deadline=None, database=None, derandomize=True)
    @given(strategy)
    def g(x):
        out.append(x)

    g()
    return out


CLASSES = ["A", "B", "C", "D"]
PAIRS = st.lists(
    st.tuples(st.sampled_from(CLASSES), st.sampled_from(CLASSES)),
    min_size=1,
    max_size=60,
)


def _py_report(pairs):
    cm = Counter(pairs)
    classes = {c for p in pairs for c in p}
    rep = {}
    for c in classes:
        support = sum(n for (l, _), n in cm.items() if l == c)
        predicted = sum(n for (_, p), n in cm.items() if p == c)
        tp = cm.get((c, c), 0)
        prec = tp / predicted if predicted else 0.0
        rec = tp / support if support else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
        rep[c] = (support, predicted, tp, prec, rec, f1)
    return rep


def _py_kappa(pairs):
    rep = _py_report(pairs)
    n = len(pairs)
    po = sum(v[2] for v in rep.values()) / n
    pe = sum(v[0] * v[1] for v in rep.values()) / (n * n)
    return (po - pe) / (1 - pe) if pe < 1.0 else 0.0


def test_eval_report_and_kappa_match_python(spark):
    from quality_filter.evalreport import cohen_kappa, eval_report

    examples = _gather(PAIRS)
    rows = [
        (ex_id, l, p)
        for ex_id, pairs in enumerate(examples)
        for l, p in pairs
    ]
    df = spark.createDataFrame(rows, "ex long, label string, prediction string")
    for ex_id, pairs in enumerate(examples):
        sub = df.filter(df.ex == ex_id)
        got = {
            r["class"]: (r["support"], r["predicted"], r["tp"],
                         r["precision"], r["recall"], r["f1"])
            for r in eval_report(sub).collect()
        }
        want = _py_report(pairs)
        assert set(got) == set(want), ex_id
        for c in want:
            assert got[c][:3] == want[c][:3], (ex_id, c)
            for g, w in zip(got[c][3:], want[c][3:]):
                assert g == pytest.approx(w), (ex_id, c)
        k = cohen_kappa(sub).collect()[0]["kappa"]
        assert k == pytest.approx(_py_kappa(pairs))
        assert -1.0 - 1e-9 <= k <= 1.0 + 1e-9


MIX_CASES = st.tuples(
    st.lists(st.integers(0, 3), min_size=4, max_size=80),  # domain per row
    st.integers(1, 1000),                                  # budget_pm
)


def test_mixture_resample_matches_exact_arithmetic(spark):
    from quality_filter.sampling import mixture_resample

    examples = _gather(MIX_CASES)
    for ex_id, (domains, budget_pm) in enumerate(examples):
        rows = [(i, f"d{d}") for i, d in enumerate(domains)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        weights = {"d0": 400, "d1": 300, "d2": 200, "d3": 100}
        out = {r["doc_id"] for r in
               mixture_resample(df, weights, budget_pm=budget_pm).collect()}
        counts = Counter(f"d{d}" for d in domains)
        total = len(domains)
        expect = set()
        for i, d in enumerate(domains):
            dom = f"d{d}"
            thr = min(1000, (total * budget_pm * weights[dom]) // (1000 * counts[dom]))
            if (i * _MIX) % 1000 < thr:
                expect.add(i)
        assert out == expect, (ex_id, budget_pm)


def test_quality_weighted_sample_spec(spark):
    from quality_filter.sampling import quality_weighted_sample

    scores = _gather(
        st.lists(st.floats(0.0, 1.0, allow_nan=False), min_size=1, max_size=50),
        n_batches=8,
    )
    import math

    rows = [
        (ex_id * 1000 + i, ex_id, float(s))
        for ex_id, sl in enumerate(scores)
        for i, s in enumerate(sl)
    ]
    df = spark.createDataFrame(rows, "doc_id long, ex long, score double")
    got = {r["doc_id"] for r in quality_weighted_sample(df, "score").collect()}
    expect = {
        did for did, _, s in rows
        if (did * _MIX) % 1000 < math.floor(s * 1000)
    }
    assert got == expect

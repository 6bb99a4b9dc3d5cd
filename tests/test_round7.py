"""Round-7 pins: trainer label-column handling, cardinality guard,
hash-keyed paragraph dedup parity, single-pass corpus accounting."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_train_profiles_nondefault_lang_col(spark):
    """ADVICE r6 (medium): train_profiles used to crash for any
    lang_col != 'lang' (hardcoded pandas column name vs schema string).
    Any label column name must produce the identical artifact."""
    from quality_filter.langid import SEED_CORPORA, train_profiles

    rows = [(lang, s) for lang, ss in SEED_CORPORA.items() for s in ss]
    base = spark.createDataFrame(rows, "lang string, text string").repartition(4)
    langs_a, prof_a = train_profiles(base)
    renamed = base.withColumnRenamed("lang", "language")
    langs_b, prof_b = train_profiles(renamed, lang_col="language")
    assert langs_a == langs_b
    assert np.array_equal(prof_a, prof_b)


def test_train_profiles_label_cardinality_guard(spark):
    """ADVICE r6: a garbage high-cardinality label column must fail loudly
    BEFORE the model-sized collect, via the shared driver-pull guard."""
    from quality_filter.guards import MAX_DRIVER_CARDINALITY
    from quality_filter.langid import train_profiles

    junk = spark.range(MAX_DRIVER_CARDINALITY + 1).select(
        F.concat(F.lit("l"), F.col("id")).alias("lang"),
        F.lit("some text").alias("text"),
    )
    with pytest.raises(ValueError, match="label vocabulary"):
        train_profiles(junk)


def test_paragraph_dedup_hash_key_parity(spark):
    """The hash-keyed (production) paragraph dedup removes EXACTLY the
    same paragraph occurrences as the text-keyed (oracle) variant on a
    planted corpus with heavy cross-doc boilerplate."""
    from quality_filter.dedup import paragraph_dedup

    boiler = "subscribe to our newsletter\nfollow us on social media"
    docs = []
    for i in range(40):
        uniq = f"unique paragraph {i} body text with id {i * 7919}"
        second = boiler if i % 3 else f"another unique {i}"
        docs.append((i, f"{uniq}\n\n{second}\n\n{boiler}"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = {tuple(r) for r in paragraph_dedup(df, key="text").collect()}
    b = {tuple(r) for r in paragraph_dedup(df, key="hash").collect()}
    assert a == b
    with pytest.raises(ValueError, match="key must be"):
        paragraph_dedup(df, key="bogus")


def _acc_instrumented_corpus(spark, acc):
    """The planted corpus world wrapped in a pass-through mapInPandas that
    bumps an accumulator once per input row scanned — counts how many
    times the pipeline traverses the input."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_corpus import _corpus

    raw = _corpus(spark)

    def bump(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    return raw.mapInPandas(bump, raw.schema)


def test_corpus_with_counts_is_single_pass(spark):
    """VERDICT r6 #2: with_counts used to run one full-lineage .count()
    per stage (~5× work).  Stage accounting is now observe-based: the
    with_counts build must traverse the input EXACTLY as many times as
    the plain build, and resolving the counts must launch no new scan."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_corpus import _benchmark

    from quality_filter.corpus import build_pretrain_corpus

    acc_a = spark.sparkContext.accumulator(0)
    plain = build_pretrain_corpus(
        _acc_instrumented_corpus(spark, acc_a),
        benchmark=_benchmark(spark),
        jaccard_threshold=0.5,
    )
    plain.collect()
    baseline_scans = acc_a.value

    acc_b = spark.sparkContext.accumulator(0)
    kept, resolve_counts = build_pretrain_corpus(
        _acc_instrumented_corpus(spark, acc_b),
        benchmark=_benchmark(spark),
        jaccard_threshold=0.5,
        with_counts=True,
    )
    kept.collect()
    counts = {r["stage"]: r["n_docs"] for r in resolve_counts().collect()}
    assert acc_b.value == baseline_scans, (
        f"with_counts traversed the input {acc_b.value} rows vs "
        f"{baseline_scans} for the plain build"
    )
    assert counts == {
        "input": 6, "after_c4": 5, "after_gopher": 4,
        "after_dedup": 2, "after_decontaminate": 1,
    }

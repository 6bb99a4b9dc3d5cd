"""Trainable quality classifier: distributed train → persist → reload →
score loop over the Gopher metric features (quality_filter.qmodel)."""

import pytest
from pyspark.sql import functions as F


def _labeled_world(spark, n=3000, seed=17):
    """synth_documents with the composed gate verdict as the label —
    the distillation setup (learn to mimic the rule gate)."""
    from quality_filter.synth import synth_documents
    from quality_filter.textstats import fused_gate_arrow

    docs = synth_documents(spark, n, seed=seed).select("doc_id", "text")
    g = fused_gate_arrow(docs)
    return g.select(
        "doc_id", "text",
        (F.col("c4_keep") & F.col("gopher_keep")).cast("int").alias("keep"),
    )


def test_train_score_separates_gate_classes(spark):
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    from quality_filter.qmodel import score_quality, train_quality_classifier

    world = _labeled_world(spark)
    train = world.filter(F.col("doc_id") % 5 != 0)
    test = world.filter(F.col("doc_id") % 5 == 0)
    n_pos = test.filter(F.col("keep") == 1).count()
    n_neg = test.filter(F.col("keep") == 0).count()
    assert n_pos > 50 and n_neg > 20  # both classes present in holdout

    model = train_quality_classifier(train, "keep")
    scored = score_quality(model, test).withColumn(
        "_label", F.col("keep").cast("double")
    )
    # schema passthrough + probability bounds
    assert set(scored.columns) == {"doc_id", "text", "keep", "quality_prob"} | {"_label"}
    bad = scored.filter(
        (F.col("quality_prob") < 0) | (F.col("quality_prob") > 1)
    ).count()
    assert bad == 0
    auc = BinaryClassificationEvaluator(
        rawPredictionCol="quality_prob", labelCol="_label",
        metricName="areaUnderROC",
    ).evaluate(scored.withColumn("quality_prob", F.col("quality_prob")))
    assert auc > 0.85, f"classifier failed to separate gate classes: AUC={auc}"


def test_model_persistence_roundtrip(spark, tmp_path):
    from quality_filter.qmodel import (
        load_quality_classifier,
        score_quality,
        train_quality_classifier,
    )

    world = _labeled_world(spark, n=1200, seed=5)
    model = train_quality_classifier(world, "keep", max_iter=20)
    path = str(tmp_path / "qmodel")
    model.write().overwrite().save(path)
    back = load_quality_classifier(path)

    a = {r["doc_id"]: r["quality_prob"] for r in score_quality(model, world).collect()}
    b = {r["doc_id"]: r["quality_prob"] for r in score_quality(back, world).collect()}
    assert a.keys() == b.keys()
    assert all(abs(a[k] - b[k]) < 1e-12 for k in a)


def test_feature_columns_complete(spark):
    from quality_filter.qmodel import FEATURE_COLS, doc_quality_features

    df = spark.createDataFrame(
        [(0, "the be to of and that have with words here fine.\n" * 6)],
        "doc_id long, text string",
    )
    out = doc_quality_features(df)
    assert set(FEATURE_COLS) <= set(out.columns)
    row = out.collect()[0]
    assert all(row[c] is not None for c in FEATURE_COLS)


def test_model_survives_observe_poisoned_session(spark):
    """Regression: scoring must work in a session where DataFrame.observe
    has materialized the (non-serializable) ObservationManager — Spark's
    prediction lambda serializes the whole LR model, and an un-stripped
    training summary drags the session into the task closure.  The
    corpus tests' observe-based stage accounting made every subsequent
    qmodel transform die with 'Task not serializable' until
    train_quality_classifier stripped the summary."""
    from pyspark.sql import Observation

    from quality_filter.qmodel import score_quality, train_quality_classifier

    world = _labeled_world(spark, n=800, seed=3)
    obs = Observation("qmodel_regression_probe")
    world.observe(obs, F.count(F.lit(1)).alias("n")).count()
    assert obs.get["n"] == 800  # manager is now materialized

    model = train_quality_classifier(world, "keep", max_iter=10)
    assert not model.stages[-1].hasSummary  # summary stripped at train time
    assert score_quality(model, world).count() == 800

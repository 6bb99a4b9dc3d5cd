"""Label-consolidation (M3 analog), replacement map (J3), class weights
(G5), cleanliness buckets (G7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quality_filter.taxonomy import (
    apply_label_map,
    class_weights,
    consolidate_labels,
    doc_cleanliness_bucket,
)

SYNONYMS = [
    "Advertisement", "Advertisements", "Advertising content",
    "Navigation menu", "Navigation bar", "Site navigation",
    "Legal disclaimer", "Legal notice text",
]


def test_consolidate_labels_groups_synonyms(spark):
    mapping = consolidate_labels(spark, SYNONYMS, n_clusters=3)
    assert set(mapping) == set(SYNONYMS)
    # synonyms land on a shared medoid per family
    assert mapping["Advertisement"] == mapping["Advertisements"]
    assert mapping["Navigation menu"] == mapping["Navigation bar"]
    # medoid is a member of its own cluster and maps to itself
    for lab, med in mapping.items():
        assert mapping[med] == med
    # deterministic
    again = consolidate_labels(spark, SYNONYMS, n_clusters=3)
    assert again == mapping


def test_apply_label_map(spark):
    df = spark.createDataFrame(
        [(1, "Ads"), (2, "Nav"), (3, "Unmapped")], "id long, label string"
    )
    out = {r["id"]: r["label"] for r in
           apply_label_map(df, {"Ads": "Advertisement", "Nav": "Navigation"}).collect()}
    assert out == {1: "Advertisement", 2: "Navigation", 3: "Unmapped"}


def test_class_weights(spark):
    df = spark.createDataFrame(
        [("a",)] * 8 + [("b",)] * 2, "label string"
    )
    w = class_weights(df)
    assert w["a"] == pytest.approx(10 / (2 * 8))
    assert w["b"] == pytest.approx(10 / (2 * 2))


def test_doc_bucket(spark):
    df = spark.createDataFrame(
        [(0.9,), (0.5,), (0.2,), (2.0 / 3.0,), (1.0 / 3.0,)], "pct double"
    )
    got = [r["b"] for r in df.select(doc_cleanliness_bucket(F.col("pct")).alias("b")).collect()]
    assert got == ["mostly_clean", "mixed", "mostly_junk", "mostly_clean", "mostly_junk"]

"""Open-vocabulary label consolidation and label-table utilities.

The reference's teacher-labeling path generates free-form labels and
consolidates synonyms by embedding → agglomerative clustering → medoid →
LLM review → replacement map (``src/label_lines_with_LLM.py:197-339``,
embedder ``src/embed.py:6-46``).  Hot-path labels here are the frozen
9-label taxonomy, but the consolidation machinery itself is reimplemented
Spark-native for users running open-vocab labeling:

- ``consolidate_labels`` — hashed char-trigram embeddings (the same
  deterministic machinery as the langid scorer), MLlib BisectingKMeans,
  medoid per cluster (the label closest to its center), replacement map.
  The reference's LLM-review step (``:234-271``) is intentionally out of
  scope — the map is returned for human/LLM review instead of mutating
  past results (its retroactive-rewrite pattern, ``:326-339``, does not
  exist here).
- ``apply_label_map`` — J3 broadcast lookup replacement
  (``src/label_lines_with_LLM.py:311-324``).
- ``class_weights`` — G5 balanced weights
  (``src/train_classifier.py:98-106``).
- ``doc_cleanliness_bucket`` — G7 majority-cleanliness bucketing
  (quality_label_correlation notebook cell 3).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from quality_filter import ngram


def _label_vectors(labels: list[str]) -> np.ndarray:
    """L2-normalized hashed char-trigram count vector per label string."""
    vecs = []
    for lab in labels:
        counts = ngram.train_counts([lab.lower()])
        n = np.linalg.norm(counts)
        vecs.append(counts / n if n else counts)
    return np.stack(vecs)


def consolidate_labels(
    spark: SparkSession, labels: list[str], n_clusters: int, seed: int = 42
) -> dict[str, str]:
    """Cluster synonym-ish labels; return {label: medoid_label}."""
    from pyspark.ml.clustering import BisectingKMeans
    from pyspark.ml.linalg import Vectors

    vecs = _label_vectors(labels)
    # project to a dense low-dim space for MLlib (hash dim is 32k-sparse)
    rng = np.random.RandomState(seed)
    proj = rng.randn(vecs.shape[1], 32)
    dense = vecs @ proj
    df = spark.createDataFrame(
        [(lab, Vectors.dense(dense[i])) for i, lab in enumerate(labels)],
        ["label", "features"],
    )
    km = BisectingKMeans(k=n_clusters, seed=seed, featuresCol="features")
    model = km.fit(df)
    pred = model.transform(df).select("label", "prediction").collect()
    centers = model.clusterCenters()
    by_cluster: dict[int, list[str]] = {}
    for r in pred:
        by_cluster.setdefault(r["prediction"], []).append(r["label"])
    idx = {lab: i for i, lab in enumerate(labels)}
    mapping: dict[str, str] = {}
    for c, members in by_cluster.items():
        center = np.asarray(centers[c])
        # medoid = member closest to the center; ties → lexicographic
        medoid = min(
            members,
            key=lambda lab: (float(np.linalg.norm(dense[idx[lab]] - center)), lab),
        )
        for lab in members:
            mapping[lab] = medoid
    return mapping


def apply_label_map(
    df: DataFrame, mapping: dict[str, str], label_col: str = "label"
) -> DataFrame:
    """J3: broadcast replacement-map lookup with identity fallback.
    None keys are skipped (same class of defect as the mixture NULL-
    domain crash: None breaks the deterministic sort, and
    ``element_at(map, NULL)`` could never match them anyway — NULL
    labels fall through to the identity fallback)."""
    pairs = []
    for k, v in sorted((k, v) for k, v in mapping.items() if k is not None):
        pairs += [F.lit(k), F.lit(v)]
    m = F.create_map(*pairs) if pairs else F.create_map()
    return df.withColumn(
        label_col,
        F.coalesce(F.element_at(m, F.col(label_col)), F.col(label_col)),
    )


def class_weights(df: DataFrame, label_col: str = "label") -> dict[str, float]:
    """G5: n_samples / (n_classes * count_per_class)
    (``src/train_classifier.py:98-106``).  The per-class counts are a
    vocabulary-style driver pull — bounded by the label taxonomy — so the
    collect goes through the shared cardinality guard."""
    from quality_filter.guards import bounded_collect

    counts = {r[label_col]: r["n"] for r in bounded_collect(
        df.groupBy(label_col).agg(F.count(F.lit(1)).alias("n")),
        f"label column {label_col!r}",
    )}
    n_samples = sum(counts.values())
    n_classes = len(counts)
    return {lab: n_samples / (n_classes * c) for lab, c in counts.items()}


def doc_cleanliness_bucket(pct_clean: Column) -> Column:
    """G7: ≥2/3 clean → 'mostly_clean', >1/3 → 'mixed', else 'mostly_junk'."""
    return (
        F.when(pct_clean >= 2.0 / 3.0, F.lit("mostly_clean"))
        .when(pct_clean > 1.0 / 3.0, F.lit("mixed"))
        .otherwise(F.lit("mostly_junk"))
    )

"""Sampling / splitting / sharding operators (SURVEY.md §2.7).

Two families:

- *Seeded random* (`sample`, `sampleBy`, `rand(seed)`) — statistically
  faithful to the reference's numpy/sklearn sampling
  (``src/sample_data.py:6``, ``src/prep_data_for_training.py:62-128``),
  reproducible per Spark seed but partitioning-sensitive.
- *Deterministic arithmetic* (integer mixing on a key) — bit-stable across
  engines, partitionings and reruns; the scale-safe default used by the
  driver-contract queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MIX = 2654435761  # Knuth multiplicative hash constant


def deterministic_bucket(key, buckets: int = 1000):
    """Arithmetic mixing → [0, buckets); key must be integral."""
    return (F.col(key) if isinstance(key, str) else key) * _MIX % buckets


def deterministic_split(
    df: DataFrame, key: str, weights: tuple[float, ...] = (0.7, 0.15, 0.15),
    names: tuple[str, ...] = ("train", "val", "test"),
) -> DataFrame:
    """R2: reproducible train/val/test split via integer mixing (replaces
    ``train_test_split(stratify=...)``, ``src/prep_data_for_training.py:62-120``
    — at 10^12 rows stratification converges to the weights by LLN)."""
    assert len(weights) == len(names) and abs(sum(weights) - 1) < 1e-9
    b = deterministic_bucket(key)
    cases = []
    acc = 0.0
    for w, name in zip(weights[:-1], names[:-1]):
        acc += w * 1000
        cases.append((acc, name))
    expr = F.lit(names[-1])
    for threshold, name in reversed(cases):  # innermost-out ⇒ first-match-wins
        expr = F.when(b < threshold, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def sample_uniform(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """R1: uniform n-row sample (``src/sample_data.py:6``)."""
    return df.orderBy(F.rand(seed)).limit(n)


def downsample_label(
    df: DataFrame, label_col: str, label: str, fraction: float, seed: int = 42
) -> DataFrame:
    """R3: keep ``fraction`` of rows with ``label``, all others
    (``src/prep_data_for_training.py:123-128``)."""
    labels = [r[label_col] for r in df.select(label_col).distinct().collect()]
    fractions = {l: (fraction if l == label else 1.0) for l in labels}
    return df.sampleBy(label_col, fractions, seed)


def stratified_split_sampled(
    df: DataFrame, label_col: str, train: float = 0.7, val: float = 0.15, seed: int = 42
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """R2 sampled variant: per-label fractions via sampleBy, remainder by
    anti-join on a row fingerprint."""
    labels = [r[label_col] for r in df.select(label_col).distinct().collect()]
    key = F.xxhash64(*[F.col(c) for c in df.columns])
    with_key = df.withColumn("_k", key)
    tr = with_key.sampleBy(label_col, {l: train for l in labels}, seed)
    rest = with_key.join(tr.select("_k"), "_k", "left_anti")
    va = rest.sampleBy(label_col, {l: val / (1 - train) for l in labels}, seed + 1)
    te = rest.join(va.select("_k"), "_k", "left_anti")
    return tr.drop("_k"), va.drop("_k"), te.drop("_k")


def shard(df: DataFrame, key: str, n_shards: int, shard_idx: int) -> DataFrame:
    """R5: 1-of-k shard by hashed key (``src/train_classifier.py:214-215``)."""
    return df.filter(F.pmod(F.xxhash64(F.col(key)), F.lit(n_shards)) == shard_idx)


def seeded_shuffle(df: DataFrame, seed: int = 42) -> DataFrame:
    """R4: deterministic global shuffle order (``src/train_classifier.py:175``)."""
    return df.orderBy(F.rand(seed))


def mixture_resample(
    df: DataFrame,
    weights: dict[str, int],
    key: str = "doc_id",
    domain_col: str = "source",
    budget_pm: int = 500,
) -> DataFrame:
    """Domain-mixture resampling (The Pile / DoReMi-static style): keep a
    deterministic subset sized ``budget_pm``/1000 of the corpus whose
    domain proportions approach ``weights`` (per-mille integers summing
    to 1000; domains absent from the map are dropped).

    Per-domain keep threshold (0-1000, integer arithmetic so the same
    rows are chosen by any engine):

        thr_d = min(1000, (N_total * budget_pm * w_pm_d) // (1000 * N_d))
        (= 1000 * target_rows_d / N_d, target_rows_d = N_total * budget_pm/1000 * w_pm_d/1000)
        keep  <=> (key * 2654435761) % 1000 < thr_d

    A domain with fewer rows than its target saturates at thr=1000 (keep
    all — deterministic selection cannot oversample; upsampling is a
    repeat-explode concern, not a filter).

    Scale: one map-side-combinable count aggregate over the corpus, the
    per-domain thresholds come back via a BROADCAST join (|domains| rows),
    then a narrow filter — no corpus shuffle."""
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_n"))
    total = df.count()
    wmap = F.create_map(
        *[x for k, v in sorted(weights.items()) for x in (F.lit(k), F.lit(int(v)))]
    )
    # integer division via decimal (exact at any corpus size; float floor
    # would drift past 2^53).  Unmapped domains must drop BEFORE the
    # least(): Spark's least() skips NULL arguments, so a NULL weight
    # would otherwise saturate to threshold 1000 (keep-all).
    mapped = counts.filter(wmap[F.col(domain_col)].isNotNull())
    num = (F.lit(total) * F.lit(budget_pm) * wmap[F.col(domain_col)]).cast(
        "decimal(38,0)"
    )
    den = (F.lit(1000) * F.col("_n")).cast("decimal(38,0)")
    thr = F.least(
        F.lit(1000).cast("bigint"),
        F.floor(num / den).cast("bigint"),
    )
    rates = mapped.select(domain_col, thr.alias("_thr"))
    return (
        df.join(F.broadcast(rates), domain_col)
        .filter(deterministic_bucket(key) < F.col("_thr"))
        .drop("_thr")
    )


def mixture_upsample(
    df: DataFrame,
    weights: dict[str, int],
    key: str = "doc_id",
    domain_col: str = "source",
    budget_pm: int = 1000,
) -> DataFrame:
    """Upsampling counterpart of ``mixture_resample``: domains whose
    target exceeds their row count are REPEATED (multi-epoch mixing for
    small high-value domains).  Each kept row gains a ``copy_idx``
    column (0-based); target_d = N_total * budget_pm/1000 * w_pm_d/1000:

        base_copies_d = target_d // N_d
        one more copy where (key * 2654435761) % 1000 <
        (1000 * (target_d % N_d)) // N_d   (fractional remainder)

    Rows in domains with target < N_d get copies 0 or 1 by the same rule
    (base 0 + fractional) — i.e. downsampling falls out as base_copies=0.
    Scale: count aggregate + broadcast join + one explode of
    ``sequence(1, copies)``; output volume = requested budget, shuffles
    nowhere."""
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_n"))
    total = df.count()
    wmap = F.create_map(
        *[x for k, v in sorted(weights.items()) for x in (F.lit(k), F.lit(int(v)))]
    )
    mapped = counts.filter(wmap[F.col(domain_col)].isNotNull())
    target = F.floor(
        (F.lit(total) * F.lit(budget_pm) * wmap[F.col(domain_col)]).cast(
            "decimal(38,0)"
        )
        / F.lit(1000000).cast("decimal(38,0)")
    ).cast("bigint")
    base = F.floor(target.cast("decimal(38,0)") / F.col("_n").cast("decimal(38,0)"))
    rem = target - base * F.col("_n")
    frac_thr = F.floor(
        (F.lit(1000) * rem).cast("decimal(38,0)") / F.col("_n").cast("decimal(38,0)")
    )
    rates = mapped.select(
        domain_col,
        base.cast("bigint").alias("_base"),
        frac_thr.cast("bigint").alias("_fthr"),
    )
    copies = F.col("_base") + F.when(
        deterministic_bucket(key) < F.col("_fthr"), 1
    ).otherwise(0)
    return (
        df.join(F.broadcast(rates), domain_col)
        .withColumn("_copies", copies)
        .filter(F.col("_copies") > 0)
        .withColumn(
            "copy_idx", F.explode(F.sequence(F.lit(0), F.col("_copies") - 1))
        )
        .drop("_base", "_fthr", "_copies")
    )

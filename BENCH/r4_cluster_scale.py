"""Round-4 scale-evidence pass on the clustering stack (VERDICT r3 #5):

- ``dedup_pipeline`` (exact → LSH → connected components → keeper) and
  ``substring_dedup`` at N and 4N documents on local[32]: wall time,
  rounds-to-convergence, and shuffle write volume (from the local Spark
  UI REST API) — does 4× input cost ~4× work, with constant rounds?
- star-vs-propagation crossover on a planted path graph: propagation's
  rounds grow with chain length (diameter), large-star/small-star's stay
  logarithmic.

The corpus is generated arithmetically in Catalyst (80-word docs over a
5k vocabulary) with CONSTANT-RATE planted duplicates so N and 4N share
the same dup structure: doc_id % 13 == 12 → exact copy of doc_id-5;
doc_id % 7 == 6 → near-copy of doc_id-3 (last 2 words differ).

Writes BENCH/r4_cluster_scale.json.  Run on a QUIET machine.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from quality_filter.session import get_spark  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
N_BASE = 100_000
VOCAB = 5_000
DOC_WORDS = 80


def synth_docs(spark, n: int):
    """Arithmetic doc corpus with constant-rate planted dups (pure
    Catalyst — no driver loop, generates at any scale)."""
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    seed = (
        F.when(F.col("doc_id") % 13 == 12, F.col("doc_id") - 5)
        .when(F.col("doc_id") % 7 == 6, F.col("doc_id") - 3)
        .otherwise(F.col("doc_id"))
    )
    near = (F.col("doc_id") % 7 == 6) & (F.col("doc_id") % 13 != 12)
    # hash-mix (seed, i) → word: an arithmetic progression with a shared
    # step would make every doc a rotation of one global cyclic sequence
    # (the whole corpus becomes one near-dup chain); xxhash64 mixing makes
    # cross-doc overlaps pointwise-random, so only the PLANTED dups link
    words = F.transform(
        F.sequence(F.lit(0), F.lit(DOC_WORDS - 1)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("_seed"), i), F.lit(VOCAB)).cast("string"),
        ),
    )
    # near-dups: overwrite the last 2 words with doc-specific ones
    tweak = F.transform(
        words,
        lambda w, i: F.when(
            F.col("_near") & (i >= DOC_WORDS - 2),
            F.concat(F.lit("x"), (F.col("doc_id") % VOCAB).cast("string")),
        ).otherwise(w),
    )
    return (
        base.withColumn("_seed", seed)
        .withColumn("_near", near)
        .select("doc_id", F.array_join(tweak, " ").alias("text"))
    )


def shuffle_totals(spark) -> tuple[int, int]:
    """(shuffle_write_bytes, shuffle_read_bytes) summed over all stages,
    from the local Spark UI REST API (session started with
    spark.ui.enabled=true; returns zeros if the UI is unavailable)."""
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return 0, 0
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.loads(r.read())
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleReadBytes", 0) for s in stages),
    )


def measure(spark, fn, label: str) -> dict:
    w0, r0 = shuffle_totals(spark)
    t0 = time.time()
    out = fn()
    wall = time.time() - t0
    w1, r1 = shuffle_totals(spark)
    res = {
        "wall_s": round(wall, 2),
        "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
        "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
        **out,
    }
    print(label, json.dumps(res), flush=True)
    return res


def run_dedup(spark, n: int) -> dict:
    from quality_filter import cluster as C
    from quality_filter.dedup import exact_dedup, lsh_candidates, minhash_jaccard, minhash_signatures

    docs = synth_docs(spark, n).localCheckpoint()  # exclude gen cost

    def job():
        uniq = exact_dedup(docs)
        sig = minhash_signatures(uniq)
        pairs = minhash_jaccard(sig, lsh_candidates(sig)).filter(
            F.col("est_jaccard") >= 0.8
        )
        stats: dict = {}
        comp = C.connected_components(
            uniq.select("doc_id"), pairs, stats=stats
        )
        keep = comp.filter(F.col("doc_id") == F.col("cluster_rep"))
        survivors = uniq.join(keep.select("doc_id"), "doc_id", "left_semi")
        return {"survivors": survivors.count(), "cc_rounds": stats.get("iterations")}

    return measure(spark, job, f"near_dup n={n}")


def run_substring(spark, n: int) -> dict:
    from quality_filter.dedup import substring_dedup

    docs = synth_docs(spark, n).localCheckpoint()

    def job():
        out = substring_dedup(docs, k=5)
        row = out.agg(
            F.count(F.lit(1)).alias("docs"), F.sum("n_removed").alias("removed")
        ).collect()[0]
        return {"docs": row["docs"], "words_removed": int(row["removed"])}

    return measure(spark, job, f"substring n={n}")


def run_chain(spark, v: int, algorithm: str, max_iter: int) -> dict:
    from quality_filter import cluster as C

    nodes = spark.range(v).select(F.col("id").alias("doc_id"))
    edges = spark.range(v - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )

    def job():
        stats: dict = {}
        comp = C.connected_components(
            nodes, edges, algorithm=algorithm, max_iter=max_iter, stats=stats
        )
        n_comp = comp.select("cluster_rep").distinct().count()
        return {"components": n_comp, "rounds": stats.get("iterations")}

    return measure(spark, job, f"chain v={v} algo={algorithm}")


def main() -> None:
    spark = get_spark(
        "r4_cluster_scale", cores=32,
        extra_conf={"spark.ui.enabled": "true"},
    )
    out: dict = {"n_base": N_BASE}
    for n in (N_BASE, 4 * N_BASE):
        out[f"near_dup_{n}"] = run_dedup(spark, n)
    for n in (N_BASE, 4 * N_BASE):
        out[f"substring_{n}"] = run_substring(spark, n)
    for v in (32, 128):
        out[f"chain_{v}_propagation"] = run_chain(spark, v, "propagation", v + 8)
    for v in (32, 128, 4096):
        out[f"chain_{v}_star"] = run_chain(spark, v, "star", 64)
    spark.stop()
    (REPO / "BENCH" / "r4_cluster_scale.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()

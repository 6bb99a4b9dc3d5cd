"""Benchmark harness (driver contract): runs the headline transcript
cleaning pipeline plus every registry query and prints ONE JSON line.

  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] cores (default: all)
  BENCH_N_CONVS        synthetic transcript conversations (default 20000)
  BENCH_SKIP_QUERIES   "1" → headline pipeline only

Headline metric: turns/sec through the full hot path — synth transcripts
(cached parquet) → langid UDF → perplexity UDF → rule scoring → filter
'all' → scrub → parquet sink.  The scaling harness (BENCH/run_scaling.py)
reruns this headline at two parallelism levels for the N→4N efficiency
evidence.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from quality_filter.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
N_CONVS = int(os.environ.get("BENCH_N_CONVS", "160000"))  # ≈3.36M turns
CACHE_DIR = Path(__file__).resolve().parent / ".bench_data"


def ensure_transcripts(spark, n_convs: int) -> str:
    """Materialize the deterministic synthetic transcript table once
    (64 files so any core count has enough input splits)."""
    path = str(CACHE_DIR / f"transcripts_{n_convs}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from quality_filter.synth import synth_transcripts

        df = synth_transcripts(
            spark, n_convs=n_convs, seed=42, max_turns=40,
            skew_convs=4, skew_turns=20000,
        )
        df.repartition(64).write.mode("overwrite").parquet(path)
    return path


def run_headline(
    spark, transcripts_path: str, stage: str = "full"
) -> tuple[float, int]:
    """Hot path → parquet sink; returns (seconds, n_turns_in).

    ``stage`` decomposes the job for the scaling analysis (BENCH/
    run_scaling.py): 'full' = the whole pipeline; 'catalyst' = the pure-
    JVM part only (rule scoring, filter, scrub, window gates — no pandas
    UDFs); 'udf' = the fused langid+perplexity Arrow UDF alone over the
    raw turns."""
    from quality_filter.pipeline import clean_pipeline
    from quality_filter.scoring import with_scores

    langid_impl = os.environ.get("BENCH_LANGID_IMPL", "udf")
    df = spark.read.parquet(transcripts_path)
    n_turns = df.count()
    sink_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out_dir = tempfile.mkdtemp(prefix="qf_bench_out_", dir=sink_root)
    t0 = time.time()
    # UDF scorers run on gate survivors (smaller Arrow volume); the
    # empty-conv gate uses the single-pass window strategy (measured faster
    # than agg_join here even with a cheap aggregate side).
    if stage == "catalyst":
        result = clean_pipeline(
            df, mode="filter", labels_to_remove="all", scrub=True,
            strategy="window",
        )
    elif stage == "udf":
        result = with_scores(df, langid_impl=langid_impl).select(
            "conv_id", "turn_idx", "lang", "lang_prob", "logppl"
        )
    else:
        result = with_scores(
            clean_pipeline(
                df,
                mode="filter",
                labels_to_remove="all",
                scrub=True,
                strategy="window",
            ),
            langid_impl=langid_impl,
        )
    result.write.mode("overwrite").parquet(out_dir)
    dt = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    return dt, n_turns


def ensure_documents(spark, n_docs: int) -> str:
    """Materialize the deterministic synthetic pre-training document
    corpus once (64 files, planted dup/soup/brace/boilerplate fractions)."""
    path = str(CACHE_DIR / f"documents_{n_docs}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from quality_filter.synth import synth_documents

        synth_documents(spark, n_docs, seed=42).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def run_corpus_build(spark, docs_path: str) -> tuple[float, int]:
    """Composed pretrain-corpus build (fused Arrow C4+Gopher gates →
    exact dedup → MinHash-LSH → connected components → canonical keep) →
    parquet sink; the artifact-of-record row for the one-command corpus
    path so regressions in the composition are mechanical to spot
    (VERDICT r6 #8)."""
    from quality_filter.corpus import build_pretrain_corpus

    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()
    sink_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out_dir = tempfile.mkdtemp(prefix="qf_bench_corpus_", dir=sink_root)
    t0 = time.time()
    build_pretrain_corpus(docs).write.mode("overwrite").parquet(out_dir)
    dt = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    return dt, n_docs


def run_queries(spark, sf_dir: str) -> tuple[dict[str, float], dict[str, float]]:
    """Per-query regression instrument: one warm-up run (JIT, Arrow worker
    spin-up, shuffle-file cache), then median of QUERY_REPS measured runs —
    capped to a single measured run for queries whose warm-up exceeds
    SLOW_CAP_S so total harness time stays sane.  Returns (median, spread)
    where spread = max-min of the measured runs (0 when only one)."""
    from quality_filter.entry_queries import QUERIES

    reps_target = int(os.environ.get("BENCH_QUERY_REPS", "3"))
    slow_cap_s = float(os.environ.get("BENCH_SLOW_CAP_S", "5.0"))
    med: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name, fn in QUERIES.items():
        def once() -> float:
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.time() - t0

        warm = once()
        reps = 1 if warm > slow_cap_s else reps_target
        samples = sorted(once() for _ in range(reps))
        med[name] = round(samples[len(samples) // 2], 3)
        spread[name] = round(samples[-1] - samples[0], 3)
    return med, spread


def main() -> None:
    extra_conf = json.loads(os.environ.get("BENCH_EXTRA_CONF", "{}")) or None
    spark = get_spark("qf_bench", cores=CPUS, extra_conf=extra_conf)
    tpath = ensure_transcripts(spark, N_CONVS)
    stage = os.environ.get("BENCH_STAGE", "full")
    # warm-up run: JIT-compile the generated code, spawn the Python UDF
    # workers; then best-of-N measured runs (production jobs run for hours —
    # cold-start and GC jitter are noise at this scale)
    run_headline(spark, tpath, stage)
    reps = int(os.environ.get("BENCH_REPS", "2"))
    results = [run_headline(spark, tpath, stage) for _ in range(reps)]
    headline_s, n_turns = min(results)
    qtimes: dict[str, float] = {}
    qspread: dict[str, float] = {}
    if os.environ.get("BENCH_SKIP_QUERIES", "0") != "1":
        qtimes, qspread = run_queries(spark, SF_DIR)
    corpus: dict[str, float | int] = {}
    if stage == "full" and os.environ.get("BENCH_SKIP_CORPUS", "0") != "1":
        dpath = ensure_documents(spark, int(os.environ.get("BENCH_N_DOCS", "100000")))
        run_corpus_build(spark, dpath)  # warm-up
        cruns = [run_corpus_build(spark, dpath) for _ in range(2)]
        corpus_s, n_docs = min(cruns)
        corpus = {
            "sec": round(corpus_s, 3),
            "n_docs": n_docs,
            "docs_per_sec": round(n_docs / corpus_s, 1),
        }
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "full clean-pipeline wall time (langid+ppl UDFs, rule scoring, filter-all, scrub, parquet sink)",
        "value": round(headline_s, 3),
        "unit": "sec",
        "queries": qtimes,
        "query_spread": qspread,
        "sf": sf,
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / headline_s, 1),
        "cpus": CPUS,
    }
    if corpus:
        out["corpus_build"] = corpus
    if stage != "full":
        out["stage"] = stage
    spark.stop()
    # full artifact alongside the one-line driver contract: the driver's
    # BENCH_r0N.json keeps only a stdout tail, so round-over-round
    # per-query regression diffs need the complete medians table as a
    # committed file (VERDICT r4 #4)
    full = dict(out)
    full["config"] = {
        "sf_dir": SF_DIR,
        "n_convs": N_CONVS,
        "reps_headline": reps,
        "query_reps": int(os.environ.get("BENCH_QUERY_REPS", "3")),
        "slow_cap_s": float(os.environ.get("BENCH_SLOW_CAP_S", "5.0")),
        "langid_impl": os.environ.get("BENCH_LANGID_IMPL", "udf"),
        "headline_runs": [round(s, 3) for s, _ in results],
    }
    # Headline-only invocations (the scaling harness's pinned legs, probe
    # runs) must not clobber the full-registry artifact of record — only a
    # run that actually measured the per-query table writes it.
    if os.environ.get("BENCH_SKIP_QUERIES", "0") != "1":
        artifact = Path(__file__).resolve().parent / "BENCH" / "last_run_full.json"
        try:
            artifact.write_text(json.dumps(full, indent=1, sort_keys=True) + "\n")
        except OSError:
            pass  # read-only checkout must not break the driver contract
    print(json.dumps(out))


if __name__ == "__main__":
    main()

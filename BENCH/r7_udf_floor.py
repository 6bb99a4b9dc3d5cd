"""Round-7 decomposition of the UDF-stage scaling floor (VERDICT r6 #7).

BENCH/BASELINE.md measured the fused langid+perplexity Arrow UDF stage
scaling 0.551 at 8→32 in isolation, below even the host's measured
memory-bandwidth ceiling (burn_test.json: 0.699 for bandwidth-bound
work).  This harness separates the two remaining suspects:

  A. the Python-side scorer MATH alone — `ngram._batch_hashes` +
     `langid.score_batch` + `perplexity.score_batch` over pre-built
     pandas batches, run in K taskset-pinned worker PROCESSES with no
     Spark, no Arrow, no sockets.  Per-unit slowdown at 8-way vs 32-way
     concurrency = the host's contribution for THIS working set.
  B. the Arrow/worker INFRA alone — the identical Spark UDF-stage job
     shape with the scorer replaced by a near-zero-cost passthrough
     (constant struct per row), taskset-pinned local[8] vs local[32].
     Scaling here is scan + Arrow IPC + Python-worker scheduling with
     (almost) no Python math.

Interpretation: if A's 8→32 efficiency ≈ the 0.55 stage number, the
floor is the host memory subsystem under the scorer's access pattern
and no Spark-side tuning can move it; if A is high and B is low, the
Arrow/worker layer is the lever.  Writes BENCH/r7_udf_floor.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_TEXTS = 20_000          # one batch ≈ 2 Arrow batches of the session default
BATCHES_PER_WORKER = 24   # enough work to dominate process startup
CONCURRENCY = (1, 8, 32)


def _make_texts(n: int) -> list[str]:
    """Deterministic text batch shaped like the bench transcripts
    (mixed-language short turns)."""
    seeds = [
        "the committee reviewed the quarterly report and agreed on next steps",
        "la red de distribución presenta una latencia inesperada en el nodo",
        "das projekt wurde nach der überprüfung der daten verschoben",
        "le système de fichiers distribué réplique chaque segment trois fois",
        "pipeline throughput improved after the partition strategy changed",
    ]
    return [
        f"{seeds[i % len(seeds)]} case {i} value {(i * 7919) % 1000}"
        for i in range(n)
    ]


def _math_worker(args) -> float:
    """One pinned process: score BATCHES_PER_WORKER batches, return the
    wall seconds of the scoring loop (excludes artifact build)."""
    cpu, payload = args
    os.sched_setaffinity(0, {cpu})
    import pandas as pd

    from quality_filter import langid as L
    from quality_filter import ngram
    from quality_filter import perplexity as X

    langs, profiles = L.build_artifact()
    lp3, lp2 = X.build_artifact()
    texts = pd.Series(payload)
    # warm-up (touch every table once)
    h3, h2, offsets = ngram._batch_hashes(texts.tolist())
    L.score_batch(texts, langs, profiles, hashed=(h3, offsets))
    X.score_batch(texts, lp3, lp2, hashed=(h3, h2, offsets))
    t0 = time.time()
    for _ in range(BATCHES_PER_WORKER):
        h3, h2, offsets = ngram._batch_hashes(texts.tolist())
        out = L.score_batch(texts, langs, profiles, hashed=(h3, offsets))
        out["logppl"] = X.score_batch(texts, lp3, lp2, hashed=(h3, h2, offsets))
    return time.time() - t0


def math_at(k: int) -> float:
    """Median per-worker seconds with k concurrent pinned processes."""
    payload = _make_texts(N_TEXTS)
    with mp.get_context("spawn").Pool(k) as pool:
        walls = pool.map(_math_worker, [(cpu, payload) for cpu in range(k)])
    walls.sort()
    return walls[len(walls) // 2]


def infra_at(cores: int) -> dict:
    """taskset-pinned Spark run: identical UDF-stage job shape with a
    passthrough scorer (BENCH_STAGE=udf + BENCH_UDF_PASSTHROUGH)."""
    script = f"""
import os, sys, time, tempfile, shutil
sys.path.insert(0, {str(REPO)!r})
from typing import Iterator
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from quality_filter.session import get_spark

spark = get_spark("udf_floor", cores={cores})
df = spark.read.parquet({str(REPO / '.bench_data' / 'transcripts_1920000')!r})
n = df.count()

@pandas_udf("struct<lang:string, lang_prob:double, logppl:double>")
def _passthrough(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    for texts in batches:
        m = len(texts)
        yield pd.DataFrame(
            {{"lang": ["xx"] * m, "lang_prob": [0.5] * m, "logppl": [1.0] * m}}
        )

out = df.withColumn("_sc", _passthrough(F.col("text"))).select(
    "conv_id", "turn_idx", F.col("_sc.lang"), F.col("_sc.lang_prob"),
    F.col("_sc.logppl"),
)
sink = tempfile.mkdtemp(prefix="udf_floor_", dir="/dev/shm")
out.write.mode("overwrite").parquet(sink)  # warm-up
times = []
for _ in range(3):
    t0 = time.time()
    out.write.mode("overwrite").parquet(sink)
    times.append(time.time() - t0)
shutil.rmtree(sink, ignore_errors=True)
print("RESULT", min(times), n)
"""
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", script]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    line = [l for l in res.stdout.splitlines() if l.startswith("RESULT")][-1]
    _, secs, n = line.split()
    return {"sec": float(secs), "n_turns": int(n)}


def main() -> None:
    out: dict = {"n_texts": N_TEXTS, "batches_per_worker": BATCHES_PER_WORKER}

    math = {}
    for k in CONCURRENCY:
        math[str(k)] = round(math_at(k), 3)
        print(f"math @{k}: {math[str(k)]} s/worker", flush=True)
    out["math_per_worker_s"] = math
    out["math_slowdown_8"] = round(math["8"] / math["1"], 3)
    out["math_slowdown_32"] = round(math["32"] / math["1"], 3)
    out["math_eff_8_32"] = round(math["8"] / math["32"], 3)

    infra = {}
    for cores in (8, 32):
        infra[str(cores)] = infra_at(cores)
        print(f"infra @{cores}: {infra[str(cores)]}", flush=True)
    t8 = infra["8"]["n_turns"] / infra["8"]["sec"]
    t32 = infra["32"]["n_turns"] / infra["32"]["sec"]
    out["infra"] = infra
    out["infra_turns_per_s_8"] = round(t8, 1)
    out["infra_turns_per_s_32"] = round(t32, 1)
    out["infra_eff_8_32"] = round((t32 / t8) / 4, 3)

    path = REPO / "BENCH" / "r7_udf_floor.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()

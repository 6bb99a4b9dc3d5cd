"""Quantify the bucket-occupancy guard's overhead on CLEAN corpora (no
oversized bucket → the guard's only cost is its one map-side-combinable
size pass + 1-row collect; the join plan is untouched).

Runs the two guarded candidate generators over /root/testdata/sf0.1 with
the default cap vs cap=None, 1 warm-up + median of 3, and writes
BENCH/r5_guard_overhead.json.  Run on a quiet machine.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.1"


def timed(fn, reps: int = 3) -> float:
    fn()  # warm-up
    samples = sorted(
        (lambda t0: (fn(), time.time() - t0)[1])(time.time()) for _ in range(reps)
    )
    return round(samples[len(samples) // 2], 3)


def main() -> None:
    from quality_filter.dedup import lsh_candidates, minhash_signatures
    from quality_filter.session import get_spark
    from quality_filter.similarity import embedding_near_dups

    spark = get_spark("guard_overhead", cores=32)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    out: dict[str, dict[str, float]] = {}

    def minhash_run(cap):
        sig = minhash_signatures(docs)
        lsh_candidates(sig, max_bucket_size=cap).write.format("noop").mode(
            "overwrite"
        ).save()

    out["minhash_lsh_candidates"] = {
        "guard_on_s": timed(lambda: minhash_run(1000)),
        "guard_off_s": timed(lambda: minhash_run(None)),
    }

    def emb_run(cap):
        embedding_near_dups(emb, threshold=0.95, max_bucket_size=cap).write.format(
            "noop"
        ).mode("overwrite").save()

    out["embedding_near_dups"] = {
        "guard_on_s": timed(lambda: emb_run(1000)),
        "guard_off_s": timed(lambda: emb_run(None)),
    }

    for k, v in out.items():
        v["overhead_pct"] = round(
            100.0 * (v["guard_on_s"] - v["guard_off_s"]) / v["guard_off_s"], 1
        )
    (REPO / "BENCH" / "r5_guard_overhead.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

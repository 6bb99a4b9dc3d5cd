"""Quantify the bucket-occupancy guard's overhead on CLEAN corpora.

Round-6 design (`dedup.bucket_pairs`): with a cap, candidate pairs come
from one (key)-shuffled window cap + per-bucket combination explode —
single pass over the banded lineage; uncapped falls back to the banded
self-join.  This script A/B-times the two at sf0.1.

Protocol: INTERLEAVED on/off reps (medians of alternating runs) so
machine-state drift — measured at ±15% across a day on this host —
cancels instead of landing on one arm.  Writes BENCH/r6_guard_overhead.json.
Run on a quiet machine.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.1"
REPS = 5


def interleaved(fn_on, fn_off) -> dict[str, float]:
    fn_on()
    fn_off()  # warm-up both arms
    on, off = [], []
    for _ in range(REPS):
        t0 = time.time(); fn_on(); on.append(time.time() - t0)
        t0 = time.time(); fn_off(); off.append(time.time() - t0)
    med = lambda xs: sorted(xs)[len(xs) // 2]
    return {
        "guard_on_s": round(med(on), 3),
        "guard_off_s": round(med(off), 3),
        "on_runs": [round(x, 3) for x in on],
        "off_runs": [round(x, 3) for x in off],
    }


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

    out["minhash_lsh_candidates"] = interleaved(
        lambda: minhash_run(1000), lambda: minhash_run(None)
    )

    def emb_run(cap):
        embedding_near_dups(emb, threshold=0.95, max_bucket_size=cap).write.format(
            "noop"
        ).mode("overwrite").save()

    out["embedding_near_dups"] = interleaved(
        lambda: emb_run(1000), lambda: emb_run(None)
    )

    for k, v in out.items():
        v["overhead_pct"] = round(
            100.0 * (v["guard_on_s"] - v["guard_off_s"]) / v["guard_off_s"], 1
        )
    (REPO / "BENCH" / "r6_guard_overhead.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if not kk.endswith("_runs")}
                      for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()

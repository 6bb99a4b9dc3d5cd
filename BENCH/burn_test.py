"""Host-saturation burn test: the committed artifact behind the scaling
ceiling claim in BENCH/BASELINE.md.

A fixed work unit (numpy gather + segmented reduction over a 16M-element
float32 table — the same memory-access shape as the langid/perplexity
UDF inner loop) runs N copies concurrently via multiprocessing, each
process pinned-free (the OS spreads them).  If per-unit wall time at
32-way concurrency is k× the single-process time, a PERFECTLY parallel
job cannot exceed (8·k8)/(32·k32)·4 … i.e. its 8→32 scaling efficiency
is capped at k8/k32 regardless of engine quality — that cap is a host
property (turbo-frequency and memory-bandwidth saturation), not a Spark
or pipeline property.

Writes BENCH/burn_test.json.  Run on a QUIET machine.
"""

from __future__ import annotations

import json
import time
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
TABLE = 1 << 24  # 16M float32 = 64 MB: larger than L3 share → bandwidth-bound
UNIT_LOOKUPS = 4_000_000
REPS_PER_PROC = 6


def work_unit(seed: int) -> float:
    """One fixed unit: seeded gather + reduction, REPS_PER_PROC times;
    returns mean seconds per rep."""
    rng = np.random.RandomState(seed)
    table = rng.randn(TABLE).astype(np.float32)
    idx = rng.randint(0, TABLE, size=UNIT_LOOKUPS).astype(np.int64)
    offsets = np.arange(0, UNIT_LOOKUPS + 1, 100, dtype=np.int64)
    times = []
    for _ in range(REPS_PER_PROC):
        t0 = time.perf_counter()
        gathered = table[idx]
        np.add.reduceat(gathered, offsets[:-1])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def run_concurrent(n: int) -> float:
    """Median per-unit seconds with n units running concurrently."""
    with ProcessPoolExecutor(max_workers=n) as ex:
        vals = list(ex.map(work_unit, range(n)))
    return float(np.median(vals))


def main() -> None:
    out = {"table_mb": TABLE * 4 // 2**20, "lookups": UNIT_LOOKUPS}
    for n in (1, 8, 32):
        t = run_concurrent(n)
        out[f"per_unit_s_at_{n}"] = round(t, 4)
        print(f"{n:>2} concurrent: {t:.4f} s/unit", flush=True)
    k8 = out["per_unit_s_at_8"] / out["per_unit_s_at_1"]
    k32 = out["per_unit_s_at_32"] / out["per_unit_s_at_1"]
    out["slowdown_8"] = round(k8, 3)
    out["slowdown_32"] = round(k32, 3)
    # ceiling on 8->32 efficiency for a perfectly parallel bandwidth-
    # bound job on this host: (throughput32/throughput8)/4 = k8/k32
    out["eff_ceiling_8_32"] = round(k8 / k32, 3)
    (REPO / "BENCH" / "burn_test.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Host-capacity stamp: a ~90 s probe pair recorded alongside every
scaling artifact (VERDICT r7 #1 — the r7 host-state analysis had to be
reconstructed after the fact; from r8 every efficiency number carries
the host capacity measured the same hour).

Two probes, both engine-free:

* **ALU** — a pure-Python LCG loop per pinned core (zero memory
  traffic).  Per-core slowdown at 32-way vs 8-way isolates frequency /
  scheduler contraction: on a healthy host the ratio is ~1.0-1.1; the
  r7 measurement day showed 1.33 on byte-identical code.
* **BW** — the committed burn-test work unit (64 MB gather + segmented
  reduce, BENCH/burn_test.py) at 8- and 32-way.  Its 8→32 ratio is the
  bandwidth-bound efficiency ceiling for this host; the committed
  reference artifact (BENCH/burn_test.json) says ~0.70-0.73 on a quiet
  day.

``probe()`` returns a flat dict; run as a script it prints one JSON
line.  Runtime target < 2 min so it can bracket a scaling run.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

ALU_ITERS = 10_000_000


def _alu_unit(cpu: int) -> float:
    os.sched_setaffinity(0, {cpu})
    t0 = time.perf_counter()
    x = 0
    for _ in range(ALU_ITERS):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return time.perf_counter() - t0


def _alu_at(k: int) -> float:
    with mp.get_context("spawn").Pool(k) as pool:
        walls = sorted(pool.map(_alu_unit, range(k)))
    return walls[len(walls) // 2]


def probe() -> dict:
    out: dict = {
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "alu_iters": ALU_ITERS,
    }
    for k in (1, 8, 32):
        out[f"alu_s_at_{k}"] = round(_alu_at(k), 3)
    out["alu_ratio_8_vs_1"] = round(out["alu_s_at_8"] / out["alu_s_at_1"], 3)
    out["alu_ratio_32_vs_8"] = round(out["alu_s_at_32"] / out["alu_s_at_8"], 3)

    from burn_test import run_concurrent  # noqa: PLC0415 — sibling script

    for k in (8, 32):
        out[f"bw_s_at_{k}"] = round(run_concurrent(k), 4)
    # bandwidth-bound 8->32 efficiency ceiling implied by this probe:
    # (throughput_32/throughput_8)/4 = t8/t32 (per-unit times)
    out["bw_eff_ceiling_8_32"] = round(out["bw_s_at_8"] / out["bw_s_at_32"], 3)
    return out


if __name__ == "__main__":
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    print(json.dumps(probe()))

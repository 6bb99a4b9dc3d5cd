"""Round-4 UDF-stage scaling A/B: fused langid+ppl UDF vs SQL-langid +
ppl-only UDF, each pinned at 8 and 32 cores, plus an Arrow
useLargeVarTypes probe — the measurement behind the headline's
langid_impl choice (VERDICT r3 next-round #3).

Writes BENCH/r4_udf_ab.json.  Run on a QUIET machine.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from run_scaling import run_pinned  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
N_CONVS = 480_000  # ~10M turns: stage wall time dominates fixed overheads


def main() -> None:
    out: dict = {"n_convs": N_CONVS, "stage": "udf", "configs": {}}
    for impl in ("udf", "sql"):
        for cores in (8, 32):
            r = run_pinned(
                cores, N_CONVS, reps=3 if cores == 8 else 5, stage="udf",
                extra_env={"BENCH_LANGID_IMPL": impl},
            )
            out["configs"][f"{impl}@{cores}"] = r["turns_per_sec"]
            print(f"{impl}@{cores}: {r['turns_per_sec']:,.0f} turns/s", flush=True)
    for impl in ("udf", "sql"):
        lo = out["configs"][f"{impl}@8"]
        hi = out["configs"][f"{impl}@32"]
        out[f"eff_8_32_{impl}"] = round((hi / lo) / 4.0, 3)

    # Arrow large-var-types / batch interaction probe on the fused UDF
    probes = {}
    for label, conf in {
        "largevar": {"spark.sql.execution.arrow.useLargeVarTypes": "true"},
        "largevar+batch40k": {
            "spark.sql.execution.arrow.useLargeVarTypes": "true",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "40000",
        },
    }.items():
        r = run_pinned(
            32, N_CONVS, reps=3, stage="udf",
            extra_env={
                "BENCH_LANGID_IMPL": "udf",
                "BENCH_EXTRA_CONF": json.dumps(conf),
            },
        )
        probes[label] = r["turns_per_sec"]
        print(f"probe {label}: {r['turns_per_sec']:,.0f} turns/s", flush=True)
    out["udf32_probes"] = probes

    (REPO / "BENCH" / "r4_udf_ab.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()

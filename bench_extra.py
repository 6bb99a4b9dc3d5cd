"""Round-9 optimization instrument (guide §1): per-query noop-sink timing
plus .explain("formatted") capture, SEPARATE from the frozen driver
contract in bench.py.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 --reps 2 \
      --queries qmodel_train_score,decontaminate_bloom_docs \
      [--plans plans/r09 --suffix before]

Prints one JSON line {"sf": ..., "queries": {name: [sec, ...]}} and, with
--plans, writes plans/<name>_<suffix>.txt with the formatted physical plan.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from quality_filter.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--queries", default="")
    ap.add_argument("--plans", default="")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from quality_filter.entry_queries import QUERIES

    names = [n for n in args.queries.split(",") if n] or list(QUERIES)
    spark = get_spark("qf_bench_extra")
    out: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"r9:{name}")
        if args.plans:
            plan = fn(spark, args.sf)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            pdir = Path(args.plans)
            pdir.mkdir(parents=True, exist_ok=True)
            (pdir / f"{name}_{args.suffix}.txt").write_text(plan)
        samples = []
        for i in range(args.warmup + args.reps):
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if i >= args.warmup:
                samples.append(round(dt, 3))
        out[name] = samples
        print(f"# {name}: {samples}", file=sys.stderr, flush=True)
    spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(json.dumps({"sf": args.sf, "queries": out}))


if __name__ == "__main__":
    main()

"""Round-8 A/B (VERDICT r7 #5): the fused Arrow corpus gate's per-doc
Python row kernel (r7 shipped path, textstats._fused_gate_row) vs the
r8 Arrow-compute batch kernel (textstats._fused_gate_batch — pyarrow.compute
C++ kernels: split/flatten + binary_join for C4, utf8_split_whitespace
token counts, plain-substring ws sums and stopword probes, rare-class
letterless-token counting on space-doubled text).

Both run through the SAME fused_gate_arrow mapInPandas plan node
(impl='row' / impl='batch'), gates + survivor parquet sink, so the
comparison includes scan + gate + write.  Survivor sets must be
identical.  Run on a quiet machine:

    python BENCH/r8_gates_ab.py [n_docs]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from quality_filter.session import get_spark
from quality_filter.textstats import fused_gate_arrow

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
CACHE = Path(__file__).resolve().parent / ".bench_data" / f"docs_{N_DOCS}"


def gate(df, impl):
    return (
        fused_gate_arrow(df, impl=impl)
        .filter(F.col("c4_keep") & F.col("gopher_keep"))
        .select("doc_id", "source", F.col("clean_text").alias("text"))
    )


def timed_sink(df) -> tuple[float, int]:
    sink_root = "/dev/shm" if Path("/dev/shm").is_dir() else None
    out = tempfile.mkdtemp(prefix="qf_gates_ab_", dir=sink_root)
    t0 = time.time()
    df.write.mode("overwrite").parquet(out)
    dt = time.time() - t0
    n = df.sparkSession.read.parquet(out).count()
    shutil.rmtree(out, ignore_errors=True)
    return dt, n


def main():
    spark = get_spark("r8_gates_ab")
    if not (CACHE / "_SUCCESS").exists():
        from quality_filter.synth import synth_documents

        synth_documents(spark, N_DOCS, seed=7).write.mode("overwrite").parquet(
            str(CACHE)
        )
    docs = spark.read.parquet(str(CACHE))
    docs.count()  # warm page cache

    res = {"n_docs": N_DOCS}
    for impl in ("row", "batch"):
        runs, n_out = [], None
        for _ in range(3):
            dt, n = timed_sink(gate(docs, impl))
            runs.append(round(dt, 3))
            n_out = n
        res[impl] = {"runs": runs, "median": sorted(runs)[1], "survivors": n_out}
    assert res["row"]["survivors"] == res["batch"]["survivors"], res
    res["speedup_row_over_batch"] = round(
        res["row"]["median"] / res["batch"]["median"], 3
    )
    print(json.dumps(res))
    Path(__file__).with_name("r8_gates_ab.json").write_text(
        json.dumps(res, indent=1)
    )


if __name__ == "__main__":
    main()

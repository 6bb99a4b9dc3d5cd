#!/usr/bin/env bash
# Evidence for the spark-submit --py-files deployment path (BASELINE.json):
# zips the package, launches the pipeline via spark-submit so executors
# import quality_filter ONLY from --py-files, and prints the row count.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d /tmp/qf_submit_XXXX)"
python - "$REPO" "$WORK" <<'PY'
import sys, zipfile, pathlib
repo, work = sys.argv[1], sys.argv[2]
pkg = pathlib.Path(repo) / "quality_filter"
with zipfile.ZipFile(f"{work}/qf.zip", "w") as zf:
    for py in sorted(pkg.glob("*.py")):
        zf.write(py, arcname=f"quality_filter/{py.name}")
    # package data (prompt templates) — same contents as shipping.ensure_shipped
    for dat in sorted(pkg.glob("data/**/*.txt")):
        zf.write(dat, arcname=f"quality_filter/{dat.relative_to(pkg)}")
PY
cat > "$WORK/job.py" <<'PY'
from pyspark.sql import SparkSession

spark = SparkSession.builder.appName("qf_submit_smoke").getOrCreate()
# imports resolve from --py-files only — the job file adds no sys.path
from quality_filter.synth import synth_transcripts
from quality_filter.pipeline import clean_pipeline
from quality_filter.scoring import with_scores
import sys

out_dir = sys.argv[1]
df = synth_transcripts(spark, n_convs=200, seed=5)
out = with_scores(clean_pipeline(df, mode="filter", labels_to_remove="all"))
out.write.mode("overwrite").parquet(out_dir)
print("SUBMIT_MARKER rows:", spark.read.parquet(out_dir).count())
spark.stop()
PY
spark-submit --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --py-files "$WORK/qf.zip" "$WORK/job.py" "$WORK/out.parquet" 2>/dev/null \
  | grep SUBMIT_MARKER
rm -rf "$WORK"

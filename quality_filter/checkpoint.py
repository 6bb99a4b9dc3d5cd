"""Checkpointed, idempotently-resumable batch runs over hashed
conversation buckets.

The reference resumes by counting lines already in the output file and
skipping that many input rows (``file_exists_and_line_count`` +
``if idx < start_index: continue`` — ``src/classifier_inference_pipeline.py:133-139,156-169``
and three twins).  That is exactly-once only if every line append was
atomic; a task killed mid-write corrupts the resume point.

Here the unit of work is a *bucket*: ``bucket = pmod(xxhash64(conv_id), B)``
— conversations never straddle buckets, so per-conversation operators
(trim windows, doc gates, reassembly) are complete within one.  A manifest
table records finished buckets; a restart anti-joins the bucket list
against the manifest (the P5 resume skip as a relational operation) and
each bucket's output is written with dynamic partition overwrite, so
re-running a partially-written bucket REPLACES it instead of duplicating.

Storage here is parquet + ``partitionOverwriteMode=dynamic`` (this sandbox
has no Iceberg runtime); on an Iceberg catalog the writer maps 1:1 to
``writeTo(tbl).overwritePartitions()`` with snapshot isolation and the
manifest to an Iceberg audit table.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "bucket"


def with_bucket(df: DataFrame, n_buckets: int, conv_col: str = "conv_id") -> DataFrame:
    """Stable work-partitioning key: pmod(xxhash64(conv_id), B)."""
    return df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(F.col(conv_col)), F.lit(n_buckets)).cast("int")
    )


def completed_buckets(spark: SparkSession, manifest_path: str, run_id: str) -> set[int]:
    if not os.path.exists(manifest_path):
        return set()
    rows = (
        spark.read.parquet(manifest_path)
        .filter(F.col("run_id") == run_id)
        .select(BUCKET_COL)
        .collect()
    )
    return {r[BUCKET_COL] for r in rows}


def _append_manifest(
    spark: SparkSession, manifest_path: str, run_id: str, buckets: list[int]
) -> None:
    rows = [(run_id, b, float(time.time())) for b in buckets]
    spark.createDataFrame(
        rows, f"run_id string, {BUCKET_COL} int, completed_unix double"
    ).coalesce(1).write.mode("append").parquet(manifest_path)


def run_checkpointed(
    spark: SparkSession,
    source: DataFrame,
    pipeline_fn: Callable[[DataFrame], DataFrame],
    output_path: str,
    manifest_path: str,
    run_id: str,
    n_buckets: int = 16,
    buckets_per_batch: int = 4,
) -> list[int]:
    """Run ``pipeline_fn`` over the source bucket-batch by bucket-batch,
    checkpointing after each batch.  Returns the buckets processed in THIS
    invocation (already-completed ones are skipped via the manifest).

    Output layout: parquet partitioned by bucket; a re-run of a bucket
    dynamically overwrites exactly that partition directory.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    done = completed_buckets(spark, manifest_path, run_id)
    todo = [b for b in range(n_buckets) if b not in done]
    bucketed = with_bucket(source, n_buckets)
    processed: list[int] = []
    for i in range(0, len(todo), buckets_per_batch):
        chunk = todo[i : i + buckets_per_batch]
        part = bucketed.filter(F.col(BUCKET_COL).isin(chunk))
        result = pipeline_fn(part)
        if BUCKET_COL not in result.columns:
            result = with_bucket(result, n_buckets)
        # dynamic overwrite only replaces partitions PRESENT in the new
        # result: if a crashed attempt left partial data for a bucket whose
        # re-run output is now empty (everything filtered out), the stale
        # partition would survive and then be marked complete.  Clear the
        # chunk's partition dirs up front so empty results also erase
        # stale data.  (Iceberg mapping: ``overwrite(bucket IN chunk)``,
        # an explicit-predicate overwrite, has the same semantics.)
        _clear_partitions(spark, output_path, chunk)
        result.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(output_path)
        _append_manifest(spark, manifest_path, run_id, chunk)
        processed.extend(chunk)
    return processed


def _clear_partitions(
    spark: SparkSession, output_path: str, buckets: list[int]
) -> None:
    """Delete the partition dirs for ``buckets`` via the Hadoop FileSystem
    API, so the stale-empty-partition guarantee holds on ANY supported
    scheme (file://, hdfs://, s3a://) — not just local paths."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for b in buckets:
        part = f"{output_path.rstrip('/')}/{BUCKET_COL}={b}"
        jpath = jvm.org.apache.hadoop.fs.Path(part)
        fs = jpath.getFileSystem(hconf)
        if fs.exists(jpath):
            fs.delete(jpath, True)

"""Incremental ingest via Structured Streaming.

The reference is batch-with-resume (SURVEY.md §2.9: no streaming
operators), but its operational pattern — "new files keep appearing,
process each exactly once" (SLURM arrays over growing file sets) — is
exactly Structured Streaming's file source + checkpoint.  Two shapes:

- ``stream_score``   — stateless per-turn path (score → scrub →
  keep-flag) as a direct streaming query: no aggregation, so any output
  mode/trigger works and rows flow through Arrow-batched scorers
  incrementally.
- ``stream_clean``   — the full pipeline (incl. per-conversation gates,
  which are unsupported as streaming windows) via ``foreachBatch``: each
  micro-batch is a bounded DataFrame, so the batch pipeline applies
  verbatim.  Correct when a conversation's turns arrive within one
  micro-batch (e.g. file-per-conversation-shard layouts); exactly-once
  per input file via the checkpoint.

``trigger(availableNow=True)`` drains the backlog and stops — the
streaming analog of the reference's resumable batch jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quality_filter.schema import TRANSCRIPT_SCHEMA


def _source(spark: SparkSession, input_dir: str, fmt: str) -> DataFrame:
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if fmt == "json":
        return reader.json(input_dir)
    return reader.parquet(input_dir)


def stream_score(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    labels_to_remove: str = "all",
    fmt: str = "parquet",
    await_termination: bool = True,
):
    """Stateless streaming scorer: label + clean_score + keep + scrubbed
    text, appended to parquet."""
    from quality_filter.pipeline import keep_by_label
    from quality_filter.rules import score_turns
    from quality_filter.scrub import scrub_turns

    src = _source(spark, input_dir, fmt)
    out = scrub_turns(score_turns(src)).withColumn(
        "keep", keep_by_label(labels_to_remove)
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def stream_clean(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    await_termination: bool = True,
    **pipeline_kw,
):
    """Full pipeline per micro-batch via foreachBatch (see module doc for
    the conversation-boundary caveat)."""
    from quality_filter.pipeline import clean_pipeline

    src = _source(spark, input_dir, fmt)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        clean_pipeline(batch_df, **pipeline_kw).write.mode("append").parquet(
            output_dir
        )

    q = (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q

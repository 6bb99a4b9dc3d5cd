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
- ``stream_trim_stateful`` — conversation-boundary-SAFE trim via
  ``applyInPandasWithState``: per-conversation state buffers turns across
  micro-batches AND query restarts, finalizing on an end-marker row or
  idle timeout — removes ``stream_clean``'s one-batch caveat.

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


# ---------------------------------------------------------------------------
# stateful streaming: conversation-boundary-safe trim
# ---------------------------------------------------------------------------

TRIM_OUT_SCHEMA = (
    "conv_id string, turn_idx int, text string, label string, clean_score double"
)
_TRIM_STATE_SCHEMA = (
    "turn_idx array<int>, text array<string>, "
    "label array<string>, clean_score array<double>, closed boolean"
)
END_MARKER_ROLE = "__end__"


def stream_trim_stateful(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    idle_timeout_ms: int = 60_000,
    fmt: str = "parquet",
    await_termination: bool = True,
    max_files_per_trigger: int | None = None,
    drain_idle_batches: int = 3,
    drain_timeout_s: float = 600.0,
    max_turns_per_conv: int = 100_000,
):
    """Conversation-boundary-SAFE streaming trim: closes ``stream_clean``'s
    caveat (turns of one conversation straddling micro-batches) with
    ``applyInPandasWithState`` — per-conversation state buffers scored
    turns across micro-batches and finalizes either on an explicit
    end-of-conversation marker row (``role == '__end__'``, the
    deterministic path) or after ``idle_timeout_ms`` of inactivity (the
    late-straggler fallback).

    Scoring stays vectorized/stateless BEFORE the stateful operator (the
    Catalyst rule cascade runs per micro-batch); the stateful function
    only buffers and applies the O(n) trim-bounds scan per finished
    conversation, so no heavy work happens row-at-a-time in Python.
    State size is bounded by conversation length — the same bound the
    batch window gate has.

    Ordering contract: the marker must arrive in the SAME or a LATER
    micro-batch than every turn it closes (file sources process files by
    modification time — emit the marker file last, or rely on the idle
    timeout, which tolerates any order at the cost of latency).

    State-size bound: buffered state is O(turns per open conversation) —
    the same bound the batch window gate has, but here it lives in the
    state store until the conversation closes.  ``max_turns_per_conv``
    caps it: a conversation that exceeds the cap keeps only its
    ``max_turns_per_conv`` LOWEST turn_idx turns (deterministic given
    the data, independent of arrival order) and the overflow is dropped
    — mirroring the batch path's salting story
    (``pipeline.reassemble_salted``), where pathological million-turn
    "conversations" are treated as bounded segments rather than allowed
    to take down a task.  A 10^7-turn conversation therefore costs at
    most cap-sized state, not an OOM.
    """
    import pandas as pd

    from quality_filter.rules import score_turns
    from quality_filter.shipping import ensure_shipped

    ensure_shipped(spark)
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.json(input_dir) if fmt == "json" else reader.parquet(input_dir)
    scored = score_turns(src).select(
        "conv_id", "turn_idx", "text", "role", "label", "clean_score"
    )

    out_cols = ["conv_id", "turn_idx", "text", "label", "clean_score"]

    def trim_conversation(key, pdfs, state):
        conv_id = key[0]
        if state.exists:
            ti, tx, lb, sc, closed = state.get
            ti, tx, lb, sc = list(ti), list(tx), list(lb), list(sc)
            closed = bool(closed)
        else:
            ti, tx, lb, sc, closed = [], [], [], [], False
        if state.hasTimedOut:
            # idle timeout: finalize an open conversation (late-straggler
            # fallback) or expire a closed tombstone
            state.remove()
            if closed:
                yield pd.DataFrame(columns=out_cols)
                return
            finished = True
        else:
            finished = False
        if closed:
            # turns arriving AFTER this conversation finalized: the state
            # tombstone absorbs them (dropped, never re-opened) so a late
            # straggler cannot be emitted as a second, independently-trimmed
            # fragment of the same conv_id.  Refresh the tombstone's clock.
            state.update(([], [], [], [], True))
            state.setTimeoutDuration(idle_timeout_ms)
            yield pd.DataFrame(columns=out_cols)
            return
        for pdf in pdfs:
            # column-wise ingest (no per-row Python): drop marker rows,
            # flag completion, extend the buffers with whole columns.
            # Append order matches the old row loop, and the later
            # turn_idx sort is stable, so tie behavior is unchanged.
            marker = pdf["role"].to_numpy() == END_MARKER_ROLE
            if marker.any():
                finished = True
                pdf = pdf[~marker]
            ti.extend(pdf["turn_idx"].tolist())
            tx.extend(pdf["text"].tolist())
            lb.extend(pdf["label"].tolist())
            sc.extend(pdf["clean_score"].tolist())
        if len(ti) > max_turns_per_conv:
            # state-size guard: keep the lowest-turn_idx window (sorted
            # once at overflow, deterministic regardless of arrival order)
            order = sorted(range(len(ti)), key=lambda i: ti[i])
            keep_idx = order[:max_turns_per_conv]
            ti = [ti[i] for i in keep_idx]
            tx = [tx[i] for i in keep_idx]
            lb = [lb[i] for i in keep_idx]
            sc = [sc[i] for i in keep_idx]
        if finished:
            order = sorted(range(len(ti)), key=lambda i: ti[i])
            labels = [lb[i] for i in order]
            start = 0
            while start < len(labels) and labels[start] != "Clean":
                start += 1
            end = len(labels) - 1
            while end >= 0 and labels[end] != "Clean":
                end -= 1
            keep = order[start : end + 1] if start <= end else []
            # leave a 'closed' tombstone (retained one idle window) so
            # post-marker stragglers are detected and dropped, not emitted
            state.update(([], [], [], [], True))
            state.setTimeoutDuration(idle_timeout_ms)
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id] * len(keep),
                    "turn_idx": [ti[i] for i in keep],
                    "text": [tx[i] for i in keep],
                    "label": [lb[i] for i in keep],
                    "clean_score": [sc[i] for i in keep],
                }
            )
        else:
            state.update((ti, tx, lb, sc, False))
            state.setTimeoutDuration(idle_timeout_ms)
            yield pd.DataFrame(columns=out_cols)

    out = scored.groupBy("conv_id").applyInPandasWithState(
        trim_conversation,
        outputStructType=TRIM_OUT_SCHEMA,
        stateStructType=_TRIM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="ProcessingTimeTimeout",
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        # a stateful query with processing-time timeouts schedules extra
        # timeout-check batches even under availableNow, so the query never
        # self-terminates (and processAllAvailable never returns).  Drain
        # it event-driven: a StreamingQueryListener counts consecutive
        # drained batches (zero input rows AND zero state-store row
        # updates) and signals stop — no sleep-polling.  Buffered-but-
        # unfinished conversations stay in the checkpointed state store and
        # resume on the next run.  Continuous deployments pass
        # await_termination=False and leave the query running.
        _drain_and_stop(spark, q, idle_batches=drain_idle_batches,
                        timeout_s=drain_timeout_s)
    return q


def _drain_and_stop(spark, query, idle_batches: int = 3,
                    timeout_s: float = 600.0) -> None:
    """Stop ``query`` once ``idle_batches`` consecutive micro-batches made
    no progress (no input rows, no state rows updated or removed), as
    observed through a ``StreamingQueryListener`` — deterministic on the
    query's own progress events rather than wall-clock polls.
    ``timeout_s`` is a hard safety deadline."""
    import threading

    from pyspark.sql.streaming import StreamingQueryListener

    qid = str(query.id)

    class _DrainListener(StreamingQueryListener):
        def __init__(self):
            self.idle = 0
            self.drained = threading.Event()

        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            if str(p.id) != qid:
                return
            state_rows = sum(
                op.numRowsUpdated + op.numRowsRemoved
                for op in (p.stateOperators or [])
            )
            if p.numInputRows == 0 and state_rows == 0:
                self.idle += 1
            else:
                self.idle = 0
            if self.idle >= idle_batches:
                self.drained.set()

        def onQueryIdle(self, event):
            # the engine reports the query idle: nothing left to drain
            if str(event.id) == qid:
                self.drained.set()

        def onQueryTerminated(self, event):
            if str(event.id) == qid:
                self.drained.set()

    listener = _DrainListener()
    spark.streams.addListener(listener)
    try:
        listener.drained.wait(timeout=timeout_s)
    finally:
        spark.streams.removeListener(listener)
        query.stop()
        query.awaitTermination()


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    watermark: str = "10 minutes",
    await_termination: bool = True,
):
    """Streaming exact dedup: drop turns whose normalized text fingerprint
    was already seen within the event-time watermark
    (``dropDuplicatesWithinWatermark`` — state is pruned once the
    watermark passes, so memory is bounded by the dup horizon, not the
    stream length; the batch-side analog is ``dedup.exact_dedup``).

    Keyed on (conv_id, turn_idx, fingerprint): a REPLAY re-delivers the
    same record — same turn_idx, same text — and is dropped; a genuinely
    repeated turn inside one conversation (the user saying "yes" twice)
    carries a NEW turn_idx and survives, as does legitimately repeated
    text across conversations.  (Keying on (conv_id, fingerprint) alone
    would silently swallow in-conversation repeats as "replays".)
    Exactly-once per input file via the checkpoint, like the other
    streaming entry points."""
    from quality_filter.dedup import normalized_text

    src = _source(spark, input_dir, fmt)
    fp = F.md5(
        F.encode(normalized_text(F.coalesce(F.col("text"), F.lit(""))), "UTF-8")
    )
    out = (
        src.withColumn("_fp", fp)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["conv_id", "turn_idx", "_fp"])
        .drop("_fp")
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

"""Sequence packing for training-batch preparation: concatenate
documents in a stable global order and cut the token stream into
fixed-budget chunks (GPT-style packing — documents may straddle chunk
boundaries; every chunk except the last is exactly ``budget`` tokens).

Reference scope note: beyond-reference training-data-pipeline surface
(the reference repo stops at per-line filtering); the operation every
pretraining data loader needs between "filtered corpus" and "token
batches".

Scale design — the global prefix sum
------------------------------------
A naive ``Window.orderBy(order_col)`` with no partition key funnels the
whole corpus through ONE task.  Instead we do the classic two-phase
scan:

1. shard the corpus by a *range* function of the order key (so shard id
   is order-preserving), compute per-shard prefix sums with a window
   partitioned BY SHARD — every task bounded;
2. aggregate one row per shard (its token total), prefix-sum those few
   rows (a window over the tiny shard table), and broadcast-join the
   shard base offsets back.

start_offset(doc) = shard_base + intra-shard exclusive prefix sum.  The
only unbounded-order window runs over #shards rows, not #docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_offsets(
    df: DataFrame,
    id_col: str = "doc_id",
    ntok_col: str = "n_tokens",
    budget: int = 2048,
    docs_per_shard: int = 1_000_000,
) -> DataFrame:
    """Assign each document its token-stream offset and chunk span under
    GPT-style packing in ascending ``id_col`` order.

    Requires ``id_col`` to define the global order (any orderable unique
    key).  ``docs_per_shard`` controls the range-shard granularity: ids
    are assumed roughly dense so ``id div docs_per_shard`` is an
    order-preserving shard function (for sparse keys, substitute a
    range-partitioner histogram; semantics are unchanged).

    Returns (id, n_tokens, start_off, first_chunk, last_chunk) where the
    doc's tokens occupy [start_off, start_off + n_tokens) of the global
    stream and chunks are ``budget``-token slices of that stream.
    """
    shard = (F.col(id_col) / F.lit(docs_per_shard)).cast("bigint")
    t = df.select(
        F.col(id_col), F.col(ntok_col).cast("bigint").alias("_n")
    ).withColumn("_shard", shard)
    intra = F.sum("_n").over(
        Window.partitionBy("_shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = t.withColumn("_intra", F.coalesce(intra, F.lit(0)))
    shard_totals = t.groupBy("_shard").agg(F.sum("_n").alias("_tot"))
    base = F.sum("_tot").over(
        Window.orderBy("_shard").rowsBetween(Window.unboundedPreceding, -1)
    )
    shard_base = shard_totals.select(
        "_shard", F.coalesce(base, F.lit(0)).alias("_base")
    )
    out = local.join(F.broadcast(shard_base), "_shard")
    start = F.col("_base") + F.col("_intra")
    return out.select(
        F.col(id_col),
        F.col("_n").alias(ntok_col),
        start.alias("start_off"),
        F.floor(start / F.lit(budget)).alias("first_chunk"),
        F.floor((start + F.col("_n") - 1) / F.lit(budget)).alias("last_chunk"),
    )


def pack_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    ntok_col: str = "n_tokens",
    budget: int = 2048,
    docs_per_shard: int = 1_000_000,
) -> DataFrame:
    """Chunk-grain view of the packing: one row per (chunk_id, doc) with
    the token sub-range of the doc that lands in the chunk — what a data
    loader materializes.  Explodes each doc into its (usually 1-2)
    chunks; no extra shuffle beyond ``pack_offsets``."""
    offs = pack_offsets(df, id_col, ntok_col, budget, docs_per_shard)
    chunks = F.sequence(F.col("first_chunk"), F.col("last_chunk"))
    e = offs.select(
        id_col, ntok_col, "start_off", F.explode(chunks).alias("chunk_id")
    )
    c0 = F.col("chunk_id") * F.lit(budget)
    tok_from = F.greatest(c0 - F.col("start_off"), F.lit(0))
    tok_to = F.least(
        c0 + F.lit(budget) - F.col("start_off"), F.col(ntok_col).cast("bigint")
    )
    return e.select(
        "chunk_id",
        F.col(id_col),
        tok_from.alias("tok_from"),
        tok_to.alias("tok_to"),
    )

"""Combined one-pass UDF scoring: language ID + perplexity in a single
Arrow transfer.

Two chained pandas UDFs each serialize the ``text`` column to the Python
worker; at 10^12-turn scale that doubles the Arrow IPC volume of the hot
path.  This module fuses both scorers into one SCALAR_ITER UDF emitting
``struct<lang, lang_prob, logppl>`` — one serialize, one worker pass,
both broadcast artifacts resident together (the UDF analog of the
reference's single classify pass per batch,
``src/classifier_inference_pipeline.py:37-124``).
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import arrow_udf

from quality_filter import langid as L
from quality_filter import perplexity as X


def with_scores(
    df: DataFrame, text_col: str = "text", langid_impl: str = "udf"
) -> DataFrame:
    """Append ``lang``, ``lang_prob``, ``logppl`` in a single UDF stage.

    ``langid_impl``:

    - ``'udf'`` (default) — the fused full n-gram langid + perplexity
      Arrow pass (one serialize, both artifacts resident).
    - ``'sql'`` — langid computed JVM-side (``textstats.
      langid_sql_struct_expr``, marker-lexicon argmax inside whole-stage
      codegen) and only perplexity crosses the Arrow boundary.  Halves
      the Python-worker compute of the hot path, which is the measured
      scaling bottleneck at high core counts (the Arrow *volume* is the
      same — one text column either way — but per-batch numpy work
      drops to the trigram-perplexity lookup alone).  The SQL langid is
      a coarser classifier (marker lexicons vs hashed-trigram profiles);
      use it when the downstream gate needs language only at
      major-language granularity, the common case for web-scale
      filtering."""
    if langid_impl == "sql":
        from quality_filter.perplexity import with_perplexity
        from quality_filter.textstats import langid_sql_struct_expr

        out = df.withColumn(
            "_lid", langid_sql_struct_expr(F.coalesce(F.col(text_col), F.lit("")))
        )
        out = (
            out.withColumn("lang", F.col("_lid.lang"))
            .withColumn("lang_prob", F.col("_lid.lang_prob"))
            .drop("_lid")
        )
        return with_perplexity(out, text_col)
    if langid_impl != "udf":
        raise ValueError(f"unknown langid_impl: {langid_impl!r}")
    spark = df.sparkSession
    from quality_filter.shipping import ensure_shipped

    ensure_shipped(spark)
    bc = spark.sparkContext.broadcast((L.build_artifact(), X.build_artifact()))

    @arrow_udf("struct<lang:string, lang_prob:double, logppl:double>")
    def _score(arr: pa.Array) -> pa.Array:
        from quality_filter import ngram

        (langs, profiles), (lp3, lp2) = bc.value
        # r9: hash straight off the Arrow string buffers — the batch's
        # UTF-8 bytes already sit concatenated in the data buffer, so
        # the former pandas path's str-materialize → re-encode → join
        # round trip (three text copies + one Python object per row)
        # disappears; outputs are bit-identical
        # (ngram._batch_hashes_from_arrow contract, pinned by test).
        # Both scorers consume the same hash arrays.
        h3, h2, offsets = ngram._batch_hashes_from_arrow(arr)
        lang_out, prob_out = L._score_hashed(h3, offsets, len(arr), langs, profiles)
        logppl = X._ppl_hashed(h3, h2, offsets, lp3, lp2)
        return pa.StructArray.from_arrays(
            [
                pa.array(lang_out, type=pa.string()),
                pa.array(prob_out, type=pa.float64()),
                pa.array(logppl, type=pa.float64()),
            ],
            ["lang", "lang_prob", "logppl"],
        )

    out = df.withColumn("_sc", _score(F.col(text_col)))
    return (
        out.withColumn("lang", F.col("_sc.lang"))
        .withColumn("lang_prob", F.col("_sc.lang_prob"))
        .withColumn("logppl", F.col("_sc.logppl"))
        .drop("_sc")
    )

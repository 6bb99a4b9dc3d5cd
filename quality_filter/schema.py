"""Fixed StructType schemas for every table shape in the engine.

The reference has no schema layer (JSON parsed per line,
``src/classifier_inference_pipeline.py:24,33``); schemas here are inferred
from its field accesses (see SURVEY.md §1.2) and from BASELINE.json's
``input_hint`` for the canonical transcript table.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Canonical input: one row per conversation turn (the reference's "line").
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Post-scoring shape: transcript + per-turn label/score/lang columns
# (the exploded analog of the labeled document built at
# ``src/classifier_inference_pipeline.py:108-119``).
SCORED_SCHEMA = T.StructType(
    list(TRANSCRIPT_SCHEMA.fields)
    + [
        T.StructField("label", T.StringType(), False),
        T.StructField("clean_score", T.DoubleType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("lang_prob", T.DoubleType(), True),
    ]
)

# Doc-shaped HPLT-style record with positionally aligned parallel arrays
# (field reads at ``src/classifier_inference_pipeline.py:109-119`` and
# ``src/salvage_low_quality_data.py:107-117``).
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("seg_langs", T.ArrayType(T.StringType()), True),
        T.StructField("lang", T.ArrayType(T.StringType()), True),
        T.StructField("prob", T.ArrayType(T.DoubleType()), True),
        T.StructField("doc_scores", T.ArrayType(T.DoubleType()), True),
        T.StructField("robotstxt", T.StringType(), True),
        T.StructField("collection", T.StringType(), True),
        T.StructField("u", T.StringType(), True),
        T.StructField("line_quality_labels", T.ArrayType(T.StringType()), True),
        T.StructField("quality_scores", T.ArrayType(T.DoubleType()), True),
    ]
)

# Audit/metrics table: per-partition lineage + keep/drop/scrub counts
# (G6-shaped, see SURVEY.md §2.5 / §4.3).
AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("n_kept", T.LongType(), False),
        T.StructField("n_dropped", T.LongType(), False),
        T.StructField("n_scrubbed", T.LongType(), False),
        T.StructField("n_convs", T.LongType(), False),
        T.StructField("mean_clean_score", T.DoubleType(), True),
        T.StructField("completed_ts", T.TimestampType(), False),
    ]
)

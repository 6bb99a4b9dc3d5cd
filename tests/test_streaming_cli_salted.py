"""Streaming ingest (exactly-once incremental), CLI entry points, and the
skew-safe salted reassembly."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from quality_filter.pipeline import clean_pipeline, reassemble, reassemble_salted
from quality_filter.synth import synth_transcripts


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="qf_scs_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_salted_reassembly_matches_plain(spark, transcripts):
    out = clean_pipeline(transcripts, mode="filter", labels_to_remove="all")
    plain = {r["conv_id"]: (r["text"], r["n_turns"]) for r in reassemble(out).collect()}
    salted = {
        r["conv_id"]: (r["text"], r["n_turns"])
        for r in reassemble_salted(out, segment_turns=37).collect()
    }
    assert plain == salted
    # strategy dispatch on the public reassemble() entry point
    dispatched = {
        r["conv_id"]: (r["text"], r["n_turns"])
        for r in reassemble(out, strategy="salted").collect()
    }
    assert dispatched == plain
    with pytest.raises(ValueError):
        reassemble(out, strategy="nope")


def test_stream_score_incremental_exactly_once(spark, tmpdir):
    inp, outp, ckpt = f"{tmpdir}/in", f"{tmpdir}/out", f"{tmpdir}/ckpt"
    from quality_filter.streaming import stream_score

    batch1 = synth_transcripts(spark, n_convs=20, seed=1)
    batch1.write.mode("append").parquet(inp)
    stream_score(spark, inp, outp, ckpt)
    n1 = spark.read.parquet(outp).count()
    assert n1 == batch1.count()

    batch2 = synth_transcripts(spark, n_convs=10, seed=2).withColumn(
        "conv_id", F.concat(F.lit("b2_"), F.col("conv_id"))
    )
    batch2.write.mode("append").parquet(inp)
    stream_score(spark, inp, outp, ckpt)
    n2 = spark.read.parquet(outp).count()
    # only the new files were processed (checkpointed file source)
    assert n2 == n1 + batch2.count()
    cols = set(spark.read.parquet(outp).columns)
    assert {"label", "clean_score", "keep", "scrubbed_text"} <= cols


def test_stream_clean_matches_batch(spark, tmpdir):
    inp, outp, ckpt = f"{tmpdir}/in", f"{tmpdir}/out", f"{tmpdir}/ckpt"
    from quality_filter.streaming import stream_clean

    df = synth_transcripts(spark, n_convs=30, seed=3)
    df.write.mode("append").parquet(inp)
    stream_clean(spark, inp, outp, ckpt, mode="filter", labels_to_remove="all")
    got = sorted(
        (r["conv_id"], r["turn_idx"])
        for r in spark.read.parquet(outp).select("conv_id", "turn_idx").collect()
    )
    want = sorted(
        (r["conv_id"], r["turn_idx"])
        for r in clean_pipeline(df, mode="filter", labels_to_remove="all")
        .select("conv_id", "turn_idx")
        .collect()
    )
    assert got == want


def test_cli_filter_roundtrip(spark, tmpdir):
    from quality_filter.cli import main

    df = synth_transcripts(spark, n_convs=25, seed=4)
    df.write.mode("overwrite").parquet(f"{tmpdir}/in")
    main([
        "filter", "--data-path", f"{tmpdir}/in", "--save-path", f"{tmpdir}/out",
        "--quality-labels", "all", "--filter", "--cores", "4",
    ])
    # the CLI reuses (and must NOT stop) the active test session
    out = spark.read.parquet(f"{tmpdir}/out")
    assert out.count() > 0
    assert out.filter("label != 'Clean'").count() == 0


def test_cli_mutual_exclusion(tmpdir):
    from quality_filter.cli import main

    with pytest.raises(ValueError):
        main([
            "filter", "--data-path", "x", "--save-path", "y",
            "--quality-labels", "all", "--filter", "--trim",
        ])

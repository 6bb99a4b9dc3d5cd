"""Text stats, sampling/splits, IO round-trips, and multimodal plumbing."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from quality_filter.io import (
    read_jsonl,
    read_jsonl_repair,
    repair_stringified_array,
    write_jsonl,
    write_tsv_freq,
)
from quality_filter.sampling import (
    deterministic_split,
    downsample_label,
    sample_uniform,
    seeded_shuffle,
    shard,
    stratified_split_sampled,
)
from quality_filter.textstats import (
    langid_sql_expr,
    with_fingerprint,
    with_quality_score,
    with_token_stats,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="qf_io_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_token_stats(spark):
    df = spark.createDataFrame(
        [(1, "Hello world, 42 times!"), (2, ""), (3, "a a a a")],
        "id long, text string",
    )
    got = {r["id"]: r for r in with_token_stats(df).collect()}
    assert got[1]["n_words"] == 4
    # Hello|world|,|42|times|! → 6 BPE-ish tokens
    assert got[1]["n_tokens"] == 6
    assert got[3]["distinct_word_ratio"] == 0.25


def test_quality_score_orders(spark):
    df = spark.createDataFrame(
        [
            (1, "The committee reviewed the proposal and agreed on the next "
                "steps for the project with a clear timeline in mind."),
            (2, "$$$ ### !!!"),
            (3, "word word word word word word"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["quality_score"] for r in with_quality_score(df).collect()}
    assert got[1] > got[3] > got[2]


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta alpha"), (3, "  Alpha   BETA ")],
        "id long, text string",
    )
    got = {r["id"]: r["fingerprint"] for r in with_fingerprint(df).collect()}
    assert got[1] != got[2]       # order matters (rolling hash)
    assert got[1] == got[3]       # normalization: case + whitespace


def test_langid_sql(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is here"),
            (2, "der hund und die katze ist nicht da"),
            (3, "zzz qqq"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["lg"] for r in df.select("id", langid_sql_expr(F.col("text")).alias("lg")).collect()}
    assert got == {1: "en", 2: "de", 3: "und"}


# --- sampling --------------------------------------------------------------

def test_deterministic_split_weights_and_stability(spark):
    df = spark.range(10000).withColumnRenamed("id", "key")
    s1 = deterministic_split(df, "key")
    s2 = deterministic_split(df.repartition(7), "key")
    c = {r["split"]: r["n"] for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(c["train"] / 10000 - 0.7) < 0.02
    assert abs(c["val"] / 10000 - 0.15) < 0.02
    m1 = {r["key"]: r["split"] for r in s1.collect()}
    m2 = {r["key"]: r["split"] for r in s2.collect()}
    assert m1 == m2  # partition-invariant


def test_sampled_family_runs(spark):
    df = spark.createDataFrame(
        [(i, "Clean" if i % 5 else "Junk") for i in range(1000)], "id long, label string"
    )
    assert sample_uniform(df, 10, seed=1).count() == 10
    down = downsample_label(df, "label", "Clean", 0.1, seed=1)
    counts = {r["label"]: r["n"] for r in down.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert counts["Junk"] == 200 and counts["Clean"] < 200
    tr, va, te = stratified_split_sampled(df, "label", seed=3)
    assert tr.count() + va.count() + te.count() == 1000
    assert shard(df, "id", 5, 0).count() + sum(shard(df, "id", 5, i).count() for i in range(1, 5)) == 1000
    assert seeded_shuffle(df, 1).first() is not None


# --- io --------------------------------------------------------------------

def test_jsonl_roundtrip_unicode(spark, tmpdir):
    df = spark.createDataFrame(
        [(1, "héllo wörld 中文"), (2, 'quotes "and" backslash \\')],
        "id long, text string",
    )
    write_jsonl(df, f"{tmpdir}/out", single_file=True)
    back = read_jsonl(spark, f"{tmpdir}/out", T.StructType([
        T.StructField("id", T.LongType()), T.StructField("text", T.StringType())]))
    got = {r["id"]: r["text"] for r in back.collect()}
    assert got == {1: "héllo wörld 中文", 2: 'quotes "and" backslash \\'}
    # ensure_ascii=False equivalence: raw bytes contain the unicode chars
    import glob
    raw = open(glob.glob(f"{tmpdir}/out/part-*")[0], "rb").read()
    assert "héllo".encode() in raw and "中文".encode() in raw


def test_compressed_roundtrip(spark, tmpdir):
    """S2/S12 at runtime.  Text-file zstd needs the native hadoop codec
    (absent in this sandbox: only bzip2/deflate/snappy/lz4/gzip), so the
    compressed-JSONL path is exercised with gzip and zstd is attempted
    first; the parquet writer's zstd (bundled zstd-jni, the S12 recompress
    analog for table storage) is asserted unconditionally."""
    import glob

    df = spark.createDataFrame(
        [(i, f"zeile {i} mit ünïcode 中文") for i in range(100)],
        "id long, text string",
    )
    schema = T.StructType([
        T.StructField("id", T.LongType()), T.StructField("text", T.StringType())])

    codec, ext, magic = "zstd", ".zst", b"\x28\xb5\x2f\xfd"
    try:
        write_jsonl(df, f"{tmpdir}/z", compression=codec, single_file=True)
    except Exception:
        codec, ext, magic = "gzip", ".gz", b"\x1f\x8b"
        write_jsonl(df, f"{tmpdir}/z", compression=codec, single_file=True)
    files = glob.glob(f"{tmpdir}/z/part-*")
    assert files and files[0].endswith(ext), files
    assert open(files[0], "rb").read(len(magic)) == magic
    back = read_jsonl(spark, f"{tmpdir}/z", schema)
    got = {r["id"]: r["text"] for r in back.collect()}
    assert len(got) == 100 and got[7] == "zeile 7 mit ünïcode 中文"

    # parquet zstd: works everywhere (zstd-jni ships with Spark)
    df.write.mode("overwrite").option("compression", "zstd").parquet(f"{tmpdir}/pz")
    pfiles = glob.glob(f"{tmpdir}/pz/part-*.parquet")
    assert pfiles and ".zstd." in pfiles[0]
    assert spark.read.parquet(f"{tmpdir}/pz").count() == 100


def test_jsonl_repair(spark, tmpdir):
    import os
    os.makedirs(f"{tmpdir}/in")
    with open(f"{tmpdir}/in/data.jsonl", "w") as f:
        f.write('{"id": 1, "text": "ok"}\n')
        f.write("this is not json\n")
        f.write('{"id": 2, "text": "also ok"}\n')
        f.write("\n")  # blank line skipped (S1 semantics)
    schema = T.StructType([
        T.StructField("id", T.LongType()), T.StructField("text", T.StringType())])
    good, bad = read_jsonl_repair(spark, f"{tmpdir}/in", schema)
    assert sorted(r["id"] for r in good.collect()) == [1, 2]
    assert bad.count() == 1


def test_repair_stringified_array(spark):
    df = spark.createDataFrame(
        [(1, "[0.1, 0.2]"), (2, "[1.0]")], "id long, line_quality string"
    )
    out = {r["id"]: r["line_quality"] for r in
           repair_stringified_array(df, "line_quality").collect()}
    assert out[1] == [0.1, 0.2] and out[2] == [1.0]


def test_tsv_freq_sink(spark, tmpdir):
    df = spark.createDataFrame(
        [(x,) for x in ["a", "b", "a", "c", "a", "b"]], "label string"
    )
    write_tsv_freq(df, f"{tmpdir}/freq")
    import glob
    lines = open(glob.glob(f"{tmpdir}/freq/part-*")[0]).read().strip().split("\n")
    assert lines == ["a\t3", "b\t2", "c\t1"]


# --- multimodal ------------------------------------------------------------

def test_multimodal_plumbing(spark):
    from quality_filter.multimodal import (
        extract_features,
        resize_meta,
        sample_frames,
        synth_media,
    )

    media = synth_media(spark, n=24)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 24
    for r in rows:
        assert len(r["feature"]) == 32
    # deterministic: same payload → same feature
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    first = {r["media_id"]: r["feature"] for r in rows}
    assert again == first

    # 16×12 PPMs are under max_side → scale clamps at 1.0 (no upscaling);
    # a big fake-meta row exercises the downscale arithmetic
    rz = {r["media_id"]: r["resize_to"] for r in resize_meta(media).collect()
          if r["modality"] == "image"}
    for v in rz.values():
        assert v["width"] == 16 and v["height"] == 12
    big = spark.createDataFrame(
        [(99, "image", None,
          {"width": 640, "height": 480, "sample_rate": None,
           "n_frames": None, "mime": "image/x-portable-pixmap"})],
        media.schema,
    )
    bigrz = resize_meta(big).collect()[0]["resize_to"]
    assert bigrz["width"] == 224 and bigrz["height"] == 168

    fp = {r["media_id"]: r["frame_plan"] for r in sample_frames(media).collect()}
    video_ids = [r["media_id"] for r in media.filter("modality='video'").collect()]
    assert all(list(fp[i]) == list(range(0, 300, 30)) for i in video_ids)
    assert all(fp[i] == [] for i in fp if i not in video_ids)


def test_real_codec_decodes_stdlib_formats(spark):
    """P6 PPM, zlib PNG (RGB + RGBA) and PCM WAV decode for REAL (numpy /
    stdlib zlib / wave); the content-derived features flow through the
    Spark path and differ from the digest-seeded fallback; formats stdlib
    genuinely can't parse (JPEG/MP4) still raise."""
    import numpy as np

    from quality_filter.multimodal import (
        _synth_png,
        _synth_ppm,
        _synth_wav,
        extract_features,
        real_decode,
        synth_media,
    )

    img = real_decode("image", _synth_ppm(3))
    assert img.shape == (12, 16, 3) and img.dtype == np.uint8
    png = real_decode("image", _synth_png(4))
    assert png.shape == (12, 16, 3) and png.dtype == np.uint8
    # byte-exact filter reversal: decode recovers the encoder's raster
    expect = np.random.RandomState(2004).randint(
        0, 256, size=(12, 16, 3), dtype=np.uint8
    )
    assert (png == expect).all()
    rgba = real_decode("image", _synth_png(5, rgba=True))
    assert rgba.shape == (12, 16, 4)
    samples, rate = real_decode("audio", _synth_wav(3))
    assert rate == 8000 and samples.shape == (400, 1)

    with pytest.raises(NotImplementedError):
        real_decode("image", b"\xff\xd8\xff\xe0JFIF...")  # JPEG: codec seam
    with pytest.raises(NotImplementedError):
        real_decode("video", b"\x00\x01")

    media = synth_media(spark, n=12)
    real = {r["media_id"]: r["feature"]
            for r in extract_features(media, use_real_codec=True).collect()}
    fake = {r["media_id"]: r["feature"]
            for r in extract_features(media, use_real_codec=False).collect()}
    img_ids = [r["media_id"] for r in media.filter("modality='image'").collect()]
    aud_ids = [r["media_id"] for r in media.filter("modality='audio'").collect()]
    vid_ids = [r["media_id"] for r in media.filter("modality='video'").collect()]
    for i in img_ids + aud_ids:
        assert real[i] != fake[i]          # content features, not digest
    for i in vid_ids:
        assert real[i] == fake[i]          # undecodable → fallback
    # image features carry the actual dimensions
    for i in img_ids:
        assert abs(real[i][0] - 12 / 4096.0) < 1e-6
        assert abs(real[i][1] - 16 / 4096.0) < 1e-6
    # audio features carry the actual duration
    for i in aud_ids:
        assert abs(real[i][0] - 400 / 8000.0) < 1e-6


def test_extract_features_total_on_corrupt_media(spark):
    """A payload that LOOKS decodable (P6/RIFF/PNG magic) but is truncated
    or corrupt must fall back to the digest featurizer — one bad media
    file must never kill the job (ADVICE r2)."""
    from quality_filter.multimodal import (
        MEDIA_SCHEMA,
        _fake_features,
        _synth_png,
        extract_features,
    )

    truncated_png = _synth_png(7)[:40]  # cut inside IHDR/IDAT
    rows = [
        (0, "image", bytearray(b"P6\n"), None),             # truncated PPM header
        (1, "image", bytearray(b"P6\n2 2\n255\nab"), None),  # short raster
        (2, "audio", bytearray(b"RIFFxxxxWAVE"), None),     # bogus WAV
        (3, "image", bytearray(truncated_png), None),       # truncated PNG
        (4, "image", None, None),                           # NULL payload
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r["feature"]
           for r in extract_features(df, use_real_codec=True).collect()}
    assert len(got) == 5
    for mid, _, payload, _ in rows:
        expect = _fake_features(bytes(payload) if payload is not None else b"")
        assert got[mid] == [float(x) for x in expect]


def test_bucketed_table_join_has_no_exchange(spark, tmpdir):
    from quality_filter.io import write_bucketed_table
    from quality_filter.synth import synth_transcripts

    # (warehouse dir is a static conf — tables land in ./spark-warehouse
    # and are dropped below)
    df = synth_transcripts(spark, n_convs=50, seed=6)
    write_bucketed_table(df, "qf_bucketed_a", n_buckets=4)
    write_bucketed_table(df.selectExpr("conv_id", "count(1) over (partition by conv_id) n"), "qf_bucketed_b", n_buckets=4, sort_col="conv_id")
    a = spark.table("qf_bucketed_a")
    b = spark.table("qf_bucketed_b").dropDuplicates(["conv_id"])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = a.join(b, "conv_id")._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    # bucketed-on-conv_id scan on the big side: no shuffle of table a
    a_scan_side = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
    assert "qf_bucketed_a" in plan
    # count Exchanges: the pre-bucketed side must not reshuffle
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange <= 1, plan[:2000]
    spark.sql("DROP TABLE IF EXISTS qf_bucketed_a")
    spark.sql("DROP TABLE IF EXISTS qf_bucketed_b")


def test_resize_images_real_pixels(spark):
    from quality_filter.multimodal import (
        _decode_ppm,
        real_decode,
        resize_images,
        synth_media,
    )

    media = synth_media(spark, n=12)
    out = {r["media_id"]: r for r in resize_images(media, max_side=8).collect()}
    for i, r in out.items():
        if r["modality"] != "image":
            # non-image rows pass through untouched
            assert r["was_resized"] is False
            assert bytes(r["resized"]) == bytes(r["payload"])
            continue
        assert r["was_resized"] is True
        assert (r["resized_w"], r["resized_h"]) == (8, 6)  # 16x12 -> 8x6
        small = _decode_ppm(bytes(r["resized"]))
        assert small.shape == (6, 8, 3)
        # nearest-neighbor: every output pixel exists at the sampled
        # source coordinate of the original
        orig = real_decode("image", bytes(r["payload"]))
        assert (small == orig[::2, ::2, :3]).all()
    # corrupt image payload: total fallback, no resize
    corrupt = spark.createDataFrame(
        [(99, "image", bytearray(b"P6\n16 12\n255\n tiny"), None)],
        media.schema,
    )
    r = resize_images(corrupt, max_side=8).collect()[0]
    assert r["was_resized"] is False and bytes(r["resized"]) == bytes(r["payload"])


def test_downsample_audio_real_samples(spark):
    from quality_filter.multimodal import (
        _decode_wav,
        downsample_audio,
        real_decode,
        synth_media,
    )

    media = synth_media(spark, n=12)
    out = {r["media_id"]: r for r in downsample_audio(media, every_n=4).collect()}
    for i, r in out.items():
        if r["modality"] != "audio":
            assert r["was_resampled"] is False
            assert bytes(r["resampled"]) == bytes(r["payload"])
            continue
        assert r["was_resampled"] is True
        assert r["resampled_rate"] == 2000  # 8000 // 4
        small, rate = _decode_wav(bytes(r["resampled"]))
        orig, _ = real_decode("audio", bytes(r["payload"]))
        assert rate == 2000
        assert (small == orig[::4]).all()

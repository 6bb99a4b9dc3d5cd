"""Multimodal columns: images/audio/video as opaque ``binary`` payloads
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, batch shapes, partition-preserving
transforms, deterministic fake featurizers — is real and tested; the
actual codec calls are stubbed behind ``DECODERS`` because this container
has no image/audio libraries.  Swapping in PIL/torchaudio/decord is a
one-function change per modality (the ``NotImplementedError`` marks the
spot).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 32


def real_decode(modality: str, payload: bytes):
    """The codec seam.  Formats the standard library can parse are decoded
    for real — binary PPM (P6) images via numpy, PCM WAV audio via
    ``wave`` — so the decode path is exercised end-to-end without media
    libs.  Compressed formats (JPEG/PNG/MP3/MP4) raise: swap in
    PIL.Image.open / torchaudio.load / decord.VideoReader in production."""
    data = bytes(payload or b"")
    if modality == "image" and data[:2] == b"P6":
        return _decode_ppm(data)
    if modality == "image" and data[:8] == _PNG_SIG:
        return _decode_png(data)
    if modality == "audio" and data[:4] == b"RIFF":
        return _decode_wav(data)
    raise NotImplementedError(
        f"no {modality} codec for this payload in this environment; "
        "install one and extend real_decode"
    )


def _decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) → uint8 array (h, w, 3).  Header: 'P6', whitespace/
    comment-separated width height maxval, single whitespace, raw RGB."""
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    raster = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png(data: bytes) -> np.ndarray:
    """Non-interlaced 8-bit RGB/RGBA PNG → uint8 array (h, w, c).  IDAT is
    plain zlib (stdlib); scanline filters (none/sub/up/average/paeth) are
    reversed per the PNG spec.  Other bit depths / color types / interlacing
    raise NotImplementedError (the remaining codec seam)."""
    import struct
    import zlib

    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or color not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            "only non-interlaced 8-bit RGB/RGBA PNG supported here"
        )
    bpp = 3 if color == 2 else 4
    raw = zlib.decompress(b"".join(idat))
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # sub / average / paeth: sequential in x
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (line[x] + (a + b) // 2) & 0xFF
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, bpp)


def _decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (int16 samples [n, channels], sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        frames = wf.readframes(wf.getnframes())
        samples = np.frombuffer(frames, dtype=np.int16).reshape(
            -1, wf.getnchannels()
        )
        return samples, wf.getframerate()


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in featurizer: seed a PRNG from the payload
    digest → stable unit vector.  Exercises the full Spark path (binary →
    Arrow → numpy → array<float>) without a codec."""
    digest = hashlib.sha256(payload or b"").digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
    v = rng.randn(dim).astype(np.float32)
    return v / (np.linalg.norm(v) or 1.0)


def _real_features(modality: str, decoded, dim: int = FEATURE_DIM) -> np.ndarray:
    """Content-derived feature vector from a decoded payload: image →
    shape + per-channel stats + luminance histogram; audio → duration,
    RMS, zero-crossings + amplitude histogram.  Deterministic."""
    out = np.zeros(dim, dtype=np.float32)
    if modality == "image":
        img = decoded.astype(np.float64)
        h, w, c = img.shape[0], img.shape[1], img.shape[2]
        rgb = img[..., :3]  # drop alpha for stats (RGBA PNGs decode to c=4)
        lum = rgb.mean(axis=2)
        hist, _ = np.histogram(lum, bins=dim - 8, range=(0.0, 255.0))
        out[0], out[1] = h / 4096.0, w / 4096.0
        out[2:5] = rgb.reshape(-1, 3).mean(axis=0) / 255.0
        out[5:8] = rgb.reshape(-1, 3).std(axis=0) / 255.0
        out[8:] = hist / max(1, lum.size)
    else:  # audio
        samples, rate = decoded
        x = samples.astype(np.float64) / 32768.0
        mono = x.mean(axis=1)
        hist, _ = np.histogram(np.abs(mono), bins=dim - 3, range=(0.0, 1.0))
        out[0] = len(mono) / float(rate)
        out[1] = float(np.sqrt((mono**2).mean())) if len(mono) else 0.0
        out[2] = float((np.diff(np.signbit(mono)) != 0).mean()) if len(mono) > 1 else 0.0
        out[3:] = hist / max(1, len(mono))
    return out


def extract_features(df: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """binary payload → ``feature`` (array<float>) via mapInPandas.
    Partition-preserving, Arrow-batched.  With ``use_real_codec`` the
    stdlib-decodable formats (P6 PPM, PCM WAV) yield content-derived
    features; undecodable payloads fall back to the digest-seeded
    stand-in so the operator stays total.

    Codecs are not vectorizable, so the decode loop is per DISTINCT
    payload per batch (r9): the feature vector is a pure deterministic
    function of (modality, payload bytes), and real media corpora repeat
    payloads heavily (site logos, shared thumbnails, re-uploads — the
    same observation exact-dedup exploits), so each batch decodes every
    distinct payload once and fans the vector back out.  The memo lives
    and dies with the batch — per-task memory stays bounded by the
    batch's distinct payload set, and nothing persists across batches,
    tasks, or runs."""
    from quality_filter.shipping import ensure_shipped

    # the mapInPandas closure pickles by reference to this module — ship
    # the package so executor workers can import it regardless of the
    # driver's cwd (same contract as the langid/perplexity UDFs)
    ensure_shipped(df.sparkSession)
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != "payload"]
        + [T.StructField("feature", T.ArrayType(T.FloatType()), True)]
    )
    cols = [f.name for f in out_schema.fields if f.name != "feature"]

    def decode_one(modality: str, raw: bytes) -> list:
        if use_real_codec:
            # catch-all: a payload that *looks* decodable (P6/RIFF
            # magic) but is truncated or corrupt raises ValueError /
            # EOFError / wave.Error from the decoders — fall back to
            # the digest featurizer so one bad media file can never
            # kill the job (the operator is total by contract)
            try:
                return _real_features(modality, real_decode(modality, raw)).tolist()
            except Exception:
                pass
        return _fake_features(raw).tolist()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            memo: dict[tuple[str, bytes], list] = {}
            feats = []
            for modality, payload in zip(pdf["modality"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                key = (modality, raw)
                f = memo.get(key)
                if f is None:
                    f = memo[key] = decode_one(modality, raw)
                feats.append(f)
            res = pdf[cols].copy()
            res["feature"] = feats
            yield res

    return df.mapInPandas(run, out_schema)


def resize_meta(df: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize planning as metadata arithmetic (the actual pixel resize
    happens inside the codec seam): clamp the longer side to ``max_side``
    preserving aspect ratio."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(
        F.lit(1.0), F.lit(float(max_side)) / F.greatest(w, h).cast("double")
    )
    return df.withColumn(
        "resize_to",
        F.struct(
            F.round(w * scale).cast("int").alias("width"),
            F.round(h * scale).cast("int").alias("height"),
        ),
    )


def sample_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for video rows: the frame indices a decoder
    should extract (array<int> from metadata — pure Catalyst)."""
    n = F.coalesce(F.col("meta.n_frames"), F.lit(0))
    return df.withColumn(
        "frame_plan",
        F.when(
            F.col("modality") == "video",
            F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n)),
        ).otherwise(F.array().cast("array<int>")),
    )


def _synth_ppm(i: int, w: int = 16, h: int = 12) -> bytes:
    """Tiny deterministic binary PPM (real, decodable)."""
    rng = np.random.RandomState(1000 + i)
    raster = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    return b"P6\n# synth\n%d %d\n255\n" % (w, h) + raster.tobytes()


def _synth_png(i: int, w: int = 16, h: int = 12, rgba: bool = False) -> bytes:
    """Tiny deterministic PNG (real, zlib-compressed, decodable).  Mixes
    filter types 0/1/2 across scanlines so the decoder's filter reversal
    is actually exercised."""
    import struct
    import zlib

    rng = np.random.RandomState(2000 + i)
    bpp = 4 if rgba else 3
    raster = rng.randint(0, 256, size=(h, w, bpp), dtype=np.uint8)
    lines = []
    prev = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        row = raster[y].reshape(-1).astype(np.int32)
        ftype = y % 3  # none, sub, up
        if ftype == 0:
            enc = row
        elif ftype == 1:
            shifted = np.concatenate([np.zeros(bpp, dtype=np.int32), row[:-bpp]])
            enc = (row - shifted) & 0xFF
        else:
            enc = (row - prev) & 0xFF
        lines.append(bytes([ftype]) + enc.astype(np.uint8).tobytes())
        prev = row
    idat = zlib.compress(b"".join(lines))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6 if rgba else 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _synth_wav(i: int, rate: int = 8000, n: int = 400) -> bytes:
    """Tiny deterministic 16-bit PCM WAV (real, decodable)."""
    import io
    import wave

    t = np.arange(n, dtype=np.float64)
    tone = np.sin(2 * np.pi * (100 + 13 * i) * t / rate) * 0.4
    samples = (tone * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests: REAL decodable payloads for
    image (binary PPM / zlib PNG, cycling RGB and RGBA) and audio (PCM
    WAV); video stays opaque seeded bytes (no stdlib video codec —
    exercises the fallback path)."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        mime = {"image": "image/x-portable-pixmap",
                "audio": "audio/wav", "video": "video/fake"}[modality]
        if modality == "image":
            variant = (i // 3) % 3  # cycle ppm, png-rgb, png-rgba
            if variant == 0:
                payload = _synth_ppm(i)
            else:
                payload = _synth_png(i, rgba=(variant == 2))
                mime = "image/png"
        elif modality == "audio":
            payload = _synth_wav(i)
        else:
            payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 8
        meta = {
            "width": 16 if modality == "image" else None,
            "height": 12 if modality == "image" else None,
            "sample_rate": 8000 if modality == "audio" else None,
            "n_frames": 300 if modality == "video" else None,
            "mime": mime,
        }
        rows.append((i, modality, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)

def resize_images(df: DataFrame, max_side: int = 224) -> DataFrame:
    """REAL pixel resize for stdlib-decodable image rows: decode (P6 PPM /
    PNG), nearest-neighbor downscale so the longer side is ≤ ``max_side``
    (aspect preserved, never upscales), re-encode as P6 PPM.  Adds

        resized   binary  — PPM bytes (or the original payload untouched)
        resized_w/resized_h int — output dims (original dims on fallback)
        was_resized boolean — False for non-image rows, undecodable
                              payloads (JPEG/corrupt — the codec seam),
                              and images already within bounds

    Same mapInPandas shape as extract_features: partition-preserving,
    Arrow-batched, total (a corrupt payload can never kill the job)."""
    from quality_filter.shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("resized", T.BinaryType(), True),
            T.StructField("resized_w", T.IntegerType(), True),
            T.StructField("resized_h", T.IntegerType(), True),
            T.StructField("was_resized", T.BooleanType(), True),
        ]
    )
    cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rs, ws, hs, flags = [], [], [], []
            for modality, payload in zip(pdf["modality"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                img = None
                if modality == "image":
                    try:
                        img = real_decode("image", raw)
                    except Exception:
                        img = None  # compressed/corrupt: pass through
                if img is None or max(img.shape[0], img.shape[1]) <= max_side:
                    rs.append(raw)
                    hs.append(None if img is None else int(img.shape[0]))
                    ws.append(None if img is None else int(img.shape[1]))
                    flags.append(False)
                    continue
                h, w = img.shape[0], img.shape[1]
                scale = max_side / float(max(h, w))
                nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
                yi = (np.arange(nh) * (h / nh)).astype(np.int64)
                xi = (np.arange(nw) * (w / nw)).astype(np.int64)
                small = img[yi][:, xi, :3].astype(np.uint8)  # alpha dropped
                rs.append(
                    b"P6\n%d %d\n255\n" % (nw, nh) + small.tobytes()
                )
                hs.append(nh)
                ws.append(nw)
                flags.append(True)
            res = pdf[cols].copy()
            res["resized"] = rs
            res["resized_w"] = pd.array(ws, dtype="Int32")
            res["resized_h"] = pd.array(hs, dtype="Int32")
            res["was_resized"] = flags
            yield res

    return df.mapInPandas(run, out_schema)

def downsample_audio(df: DataFrame, every_n: int = 4) -> DataFrame:
    """REAL audio decimation for stdlib-decodable (PCM WAV) rows: decode,
    keep every ``every_n``-th sample, re-encode WAV at rate/every_n
    (naive decimation — no anti-alias filter; the point is the total
    Spark plumbing, the DSP itself is a model-side concern).  Adds

        resampled binary, resampled_rate int, was_resampled boolean

    Non-audio rows and undecodable payloads (MP3/corrupt — the codec
    seam) pass through flagged False.  Same mapInPandas contract as
    extract_features/resize_images."""
    import io
    import wave as wave_mod

    from quality_filter.shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("resampled", T.BinaryType(), True),
            T.StructField("resampled_rate", T.IntegerType(), True),
            T.StructField("was_resampled", T.BooleanType(), True),
        ]
    )
    cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, rates, flags = [], [], []
            for modality, payload in zip(pdf["modality"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                dec = None
                if modality == "audio":
                    try:
                        dec = real_decode("audio", raw)
                    except Exception:
                        dec = None
                if dec is None:
                    outs.append(raw)
                    rates.append(None)
                    flags.append(False)
                    continue
                samples, rate = dec
                small = samples[::every_n]
                buf = io.BytesIO()
                with wave_mod.open(buf, "wb") as wf:
                    wf.setnchannels(samples.shape[1])
                    wf.setsampwidth(2)
                    wf.setframerate(max(1, rate // every_n))
                    wf.writeframes(small.astype(np.int16).tobytes())
                outs.append(buf.getvalue())
                rates.append(max(1, rate // every_n))
                flags.append(True)
            res = pdf[cols].copy()
            res["resampled"] = outs
            res["resampled_rate"] = pd.array(rates, dtype="Int32")
            res["was_resampled"] = flags
            yield res

    return df.mapInPandas(run, out_schema)

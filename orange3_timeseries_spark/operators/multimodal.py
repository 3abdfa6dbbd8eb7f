"""Multimodal (image / audio / video) column operators.

Media is carried as an opaque ``binary`` payload column plus typed metadata
— the standard large-scale training-data layout (one row per asset, bytes
inline for small assets).  Every modality decodes at least one REAL
container with no external library:

- image: PNG (:mod:`._png` — zlib + all five scanline filters) and
  baseline JPEG (:mod:`._jpeg` — Huffman + dequant + IDCT, chroma
  subsampling, restart markers), dispatched by :func:`decode_image`;
- audio: RIFF/WAVE PCM 8/16-bit (:func:`decode_wav`), dispatched by
  :func:`decode_audio`;
- video: animated GIF (:mod:`._gif` — LZW, color tables, transparency
  compositing), dispatched by :func:`decode_video`.

Alongside these, a deterministic FAKE container per modality
(FIMG/FAUD/FVID below) remains as the oracle fixture: its rasters are
pure integer formulas, so DuckDB replays decoded-pixel math exactly —
and because the PNG/GIF/WAV synthesizers reuse the same formulas on
lossless containers, the driver's SQL oracles hash-verify the REAL
codecs' byte paths too.  Exotic formats fall through to a PIL-gated
hook (:func:`_decode_image_real`).

Fake container formats (little-endian):

- image: ``FIMG | u8 version | u16 width | u16 height | u8 channels`` +
  ``width*height*channels`` pixel bytes;
- audio: ``FAUD | u8 version | u16 sample_rate | u32 n_samples`` + u8
  samples;
- video: ``FVID | u8 version | u16 width | u16 height | u16 n_frames`` +
  grayscale frames.

Scale notes (100 TB): payload rows are large and skewed — operators here
never shuffle payloads except through :func:`partition_by_bytes` (explicit
byte-budget repartition), and every transform is a narrow ``mapInPandas``
over Arrow batches with ``spark.sql.execution.arrow.maxRecordsPerBatch``
sized so a batch of payloads stays within executor memory.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMG_MAGIC = b"FIMG"
AUD_MAGIC = b"FAUD"
VID_MAGIC = b"FVID"

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
])


# --------------------------------------------------------------------- codec
def _pixel_bytes(seed: int, n: int) -> np.ndarray:
    """Deterministic pseudo-raster: byte i = (seed*2654435761 + i*97) % 256
    (Knuth multiplicative hash — reproducible on any platform)."""
    i = np.arange(n, dtype=np.uint64)
    return ((np.uint64(seed % (1 << 31)) * np.uint64(2654435761)
             + i * np.uint64(97)) % np.uint64(256)).astype(np.uint8)


def encode_fake_image(seed: int, width: int, height: int,
                      channels: int = 3) -> bytes:
    header = IMG_MAGIC + struct.pack("<BHHB", 1, width, height, channels)
    return header + _pixel_bytes(seed, width * height * channels).tobytes()


def decode_fake_image(payload: bytes) -> Tuple[dict, np.ndarray]:
    """(metadata, HxWxC uint8 array). Raises ValueError on bad magic."""
    if payload[:4] != IMG_MAGIC:
        raise ValueError("not a FIMG payload")
    _, w, h, c = struct.unpack("<BHHB", payload[4:10])
    px = np.frombuffer(payload[10:10 + w * h * c], dtype=np.uint8)
    return ({"format": "FIMG", "width": w, "height": h, "channels": c,
             "n_bytes": len(payload)}, px.reshape(h, w, c))


def encode_fake_audio(seed: int, sample_rate: int, n_samples: int) -> bytes:
    header = AUD_MAGIC + struct.pack("<BHI", 1, sample_rate, n_samples)
    return header + _pixel_bytes(seed, n_samples).tobytes()


def decode_fake_audio(payload: bytes) -> Tuple[dict, np.ndarray]:
    if payload[:4] != AUD_MAGIC:
        raise ValueError("not a FAUD payload")
    _, sr, n = struct.unpack("<BHI", payload[4:11])
    samples = np.frombuffer(payload[11:11 + n], dtype=np.uint8)
    return ({"format": "FAUD", "sample_rate": sr, "n_samples": n,
             "duration_ms": int(n * 1000 / sr) if sr else 0}, samples)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """RIFF/WAVE PCM encode (pure stdlib): mono or (frames, channels)
    int16 — the real-world counterpart of the FAUD fixture container.
    8-bit input is widened to int16."""
    s = np.asarray(samples)
    if s.dtype == np.uint8:
        s = (s.astype(np.int16) - 128) << 8
    s = s.astype("<i2")
    if s.ndim == 1:
        s = s[:, None]
    frames, channels = s.shape
    data = s.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> Tuple[dict, np.ndarray]:
    """(metadata, float64 array of frames [x channels]) from RIFF/WAVE
    PCM bytes.  Supports PCM (format 1) 8-bit unsigned and 16-bit
    signed, any channel count; anything else raises ``ValueError``
    (per-row failure, callers catch)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt or data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"WAV: unsupported format code {audio_fmt}")
    if bits == 16:
        s = np.frombuffer(data, dtype="<i2").astype(np.float64)
    elif bits == 8:
        s = np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        raise ValueError(f"WAV: unsupported bit depth {bits}")
    if channels > 1:
        s = s[: (len(s) // channels) * channels].reshape(-1, channels)
    n_frames = len(s)
    meta = {"format": "WAV", "sample_rate": int(rate),
            "n_samples": int(n_frames), "channels": int(channels),
            "duration_ms": int(n_frames * 1000 / rate) if rate else 0}
    return meta, s


def decode_audio(payload: bytes) -> Tuple[dict, np.ndarray]:
    """(metadata, samples) for any supported audio payload, dispatching
    on magic bytes: real RIFF/WAVE PCM via the stdlib codec, or the
    deterministic FAUD fixture (uint8 samples, returned raw as before
    — consumers center at 128)."""
    if payload[:4] == AUD_MAGIC:
        return decode_fake_audio(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    raise ValueError("unsupported audio container")


def encode_fake_video(seed: int, width: int, height: int,
                      n_frames: int) -> bytes:
    header = VID_MAGIC + struct.pack("<BHHH", 1, width, height, n_frames)
    return header + _pixel_bytes(seed, width * height * n_frames).tobytes()


def decode_fake_video(payload: bytes) -> Tuple[dict, np.ndarray]:
    if payload[:4] != VID_MAGIC:
        raise ValueError("not a FVID payload")
    _, w, h, nf = struct.unpack("<BHHH", payload[4:11])
    px = np.frombuffer(payload[11:11 + w * h * nf], dtype=np.uint8)
    return ({"format": "FVID", "width": w, "height": h, "n_frames": nf},
            px.reshape(nf, h, w))


def decode_video(payload: bytes) -> Tuple[dict, np.ndarray]:
    """(metadata, (n_frames, H, W, C) uint8) for any supported video
    payload, dispatching on magic bytes: real animated GIF via the
    pure-stdlib LZW codec (:mod:`._gif` — lossless palette frames, so
    decoded pixels stay formula-replayable by a SQL oracle) or the
    FVID fixture (grayscale, C=1).  Frame-sampling and perceptual
    signatures route through this, so the video tier runs on a real
    container."""
    if payload[:4] == VID_MAGIC:
        meta, frames = decode_fake_video(payload)
        return meta, frames[..., None]
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from orange3_timeseries_spark.operators._gif import decode_gif

        return decode_gif(payload)
    raise ValueError("unsupported video container")


def _decode_image_real(payload: bytes):  # pragma: no cover - gated path
    """Fallback real-codec decode (PIL) for formats beyond PNG (JPEG,
    WebP, ...). PNG itself needs no external library — see
    :func:`decode_image`."""
    try:
        import io

        from PIL import Image  # noqa: WPS433
    except ImportError as exc:
        raise NotImplementedError(
            "non-PNG image decode needs pillow; this environment ships "
            "none — PNG and the FIMG fixture codec decode natively") from exc
    img = Image.open(io.BytesIO(payload))
    return np.asarray(img)


def decode_image(payload: bytes) -> Tuple[dict, np.ndarray]:
    """(metadata, HxWxC uint8 array) for any supported image payload,
    dispatching on the magic bytes: real PNG via the pure-stdlib codec
    (:mod:`._png` — zlib inflate + Sub/Up/Average/Paeth unfilter), real
    baseline JPEG via the pure-NumPy codec (:mod:`._jpeg` — Huffman +
    dequant + IDCT, 4:4:4/4:2:2/4:2:0, restart markers), the
    deterministic FIMG fixture container, and a PIL-gated fallback for
    other real formats.  Every consumer in this module (metadata,
    features, resize, dHash, near-dup pairs) goes through this function,
    so the perceptual-dedup path runs unchanged on actual PNGs/JPEGs."""
    from orange3_timeseries_spark.operators._jpeg import decode_jpeg
    from orange3_timeseries_spark.operators._png import PNG_SIG, decode_png

    if payload[:4] == IMG_MAGIC:
        return decode_fake_image(payload)
    if payload[:8] == PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xFF\xD8":
        return decode_jpeg(payload)
    px = _decode_image_real(payload)
    if px.ndim == 2:
        px = px[:, :, None]
    return ({"format": "OTHER", "width": px.shape[1],
             "height": px.shape[0], "channels": px.shape[2],
             "n_bytes": len(payload)}, px)


# ------------------------------------------------------- synthesis (fixture)

def _spread(df: DataFrame) -> DataFrame:
    """Fixture-synthesis / codec stages are Python-CPU-per-ROW; a small
    input scanned as one or two byte-sized partitions would serialize
    them, so spread to the cluster width (no-op when the scan is
    already wide — at real scale parquet splits provide the width)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        df = df.repartition(n)
    return df


def synthesize_image_column(df: DataFrame, id_col: str, size_col: str,
                            out: str = "image") -> DataFrame:
    """Attach a deterministic FIMG payload per row: width = 16 + size%64,
    height = 16 + (size*7)%64, channels = 3, pixels seeded by the id.
    This is the fixture generator for environments without real media."""
    id_f = df.schema[id_col].dataType
    df = _spread(df)
    fields = df.schema.fields

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_fake_image(int(i), 16 + int(s) % 64,
                                  16 + (int(s) * 7) % 64, 3)
                for i, s in zip(pdf[id_col], pdf[size_col])]
            pdf = pdf.copy()
            pdf[out] = payloads
            yield pdf

    schema = T.StructType(list(fields) + [T.StructField(out, T.BinaryType())])
    return df.mapInPandas(gen, schema=schema)


def synthesize_png_column(df: DataFrame, id_col: str, size_col: str,
                          out: str = "image") -> DataFrame:
    """Attach a REAL PNG payload per row — the same deterministic raster
    as :func:`synthesize_image_column` (identical dims/pixel formulas),
    but run through the stdlib PNG encoder.  Downstream perceptual ops
    therefore produce byte-identical fingerprints for the FIMG and PNG
    encodings of a row, which is exactly what lets the driver's SQL
    oracle (which replays the raster formula) also hash-verify the real
    PNG decode path end to end."""
    from orange3_timeseries_spark.operators._png import encode_png

    df = _spread(df)
    fields = df.schema.fields

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i, s in zip(pdf[id_col], pdf[size_col]):
                w, h = 16 + int(s) % 64, 16 + (int(s) * 7) % 64
                px = _pixel_bytes(int(i), w * h * 3).reshape(h, w, 3)
                payloads.append(encode_png(px))
            pdf = pdf.copy()
            pdf[out] = payloads
            yield pdf

    schema = T.StructType(list(fields) + [T.StructField(out, T.BinaryType())])
    return df.mapInPandas(gen, schema=schema)


def synthesize_gif_column(df: DataFrame, id_col: str, size_col: str,
                          out: str = "video") -> DataFrame:
    """Attach a REAL animated-GIF payload per row: 16x16 frames,
    ``n_frames = 10 + size % 20``, 256-entry grayscale palette, frame
    pixels from the same formula as :func:`synthesize_video_column` —
    GIF is lossless, so a SQL oracle replays decoded-frame math (e.g.
    the dHash video signature) exactly on the real container."""
    from orange3_timeseries_spark.operators._gif import encode_gif

    df = _spread(df)
    fields = df.schema.fields
    palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i, s in zip(pdf[id_col], pdf[size_col]):
                nf = 10 + int(s) % 20
                frames = _pixel_bytes(int(i), 16 * 16 * nf) \
                    .reshape(nf, 16, 16)
                payloads.append(encode_gif(frames, palette))
            pdf = pdf.copy()
            pdf[out] = payloads
            yield pdf

    schema = T.StructType(list(fields) + [T.StructField(out, T.BinaryType())])
    return df.mapInPandas(gen, schema=schema)


def synthesize_jpeg_column(df: DataFrame, id_col: str, size_col: str,
                           out: str = "image",
                           quality: int = 90) -> DataFrame:
    """Attach a REAL baseline JPEG payload per row — the same
    deterministic raster/dims as :func:`synthesize_image_column`, run
    through the pure-NumPy JPEG encoder.  JPEG is lossy, so pixel
    values are NOT formula-replayable (unlike PNG); the header fields
    (dims/channels) are, which is what the metadata oracle checks —
    decoded-pixel fidelity is golden-tested (round-trip RMSE, cross-
    format near-dup) in tests/test_multimodal.py."""
    from orange3_timeseries_spark.operators._jpeg import encode_jpeg

    df = _spread(df)
    fields = df.schema.fields

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i, s in zip(pdf[id_col], pdf[size_col]):
                w, h = 16 + int(s) % 64, 16 + (int(s) * 7) % 64
                px = _pixel_bytes(int(i), w * h * 3).reshape(h, w, 3)
                payloads.append(encode_jpeg(px, quality=quality))
            pdf = pdf.copy()
            pdf[out] = payloads
            yield pdf

    schema = T.StructType(list(fields) + [T.StructField(out, T.BinaryType())])
    return df.mapInPandas(gen, schema=schema)


def synthesize_wav_column(df: DataFrame, id_col: str, size_col: str,
                          out: str = "audio") -> DataFrame:
    """Attach a REAL RIFF/WAVE PCM payload per row: 8 kHz mono int16,
    ``n = 500 + 11*size`` samples, sample i =
    ``((id*2654435761 + i*97) % 65536) - 32768`` — integer-exact on
    both engines, so a SQL oracle can replay the decoded feature math
    bit for bit (sums of < 2^47 stay exact in doubles)."""
    df = _spread(df)
    fields = df.schema.fields

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i, s in zip(pdf[id_col], pdf[size_col]):
                n = 500 + 11 * int(s)
                idx = np.arange(n, dtype=np.uint64)
                vals = ((np.uint64(int(i)) * np.uint64(2654435761)
                         + idx * np.uint64(97)) % np.uint64(65536)
                        ).astype(np.int64) - 32768
                payloads.append(encode_wav(vals.astype(np.int16), 8000))
            pdf = pdf.copy()
            pdf[out] = payloads
            yield pdf

    schema = T.StructType(list(fields) + [T.StructField(out, T.BinaryType())])
    return df.mapInPandas(gen, schema=schema)


def synthesize_video_column(df: DataFrame, id_col: str, size_col: str,
                            out: str = "video") -> DataFrame:
    """Attach a deterministic FVID payload per row: 16x16 grayscale,
    n_frames = 10 + size % 20, pixels seeded by the id."""
    df = _spread(df)
    fields = df.schema.fields

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_fake_video(int(i), 16, 16, 10 + int(s) % 20)
                for i, s in zip(pdf[id_col], pdf[size_col])]
            pdf = pdf.copy()
            pdf[out] = payloads
            yield pdf

    schema = T.StructType(list(fields) + [T.StructField(out, T.BinaryType())])
    return df.mapInPandas(gen, schema=schema)


def synthesize_audio_column(df: DataFrame, id_col: str, size_col: str,
                            out: str = "audio") -> DataFrame:
    """Attach a deterministic FAUD payload per row: 8 kHz, n_samples =
    1000 + 37*size, samples seeded by the id."""
    df = _spread(df)
    fields = df.schema.fields

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_fake_audio(int(i), 8000, 1000 + 37 * int(s))
                for i, s in zip(pdf[id_col], pdf[size_col])]
            pdf = pdf.copy()
            pdf[out] = payloads
            yield pdf

    schema = T.StructType(list(fields) + [T.StructField(out, T.BinaryType())])
    return df.mapInPandas(gen, schema=schema)


# ------------------------------------------------------------------ metadata
def image_metadata(df: DataFrame, col: str, out: str = "meta") -> DataFrame:
    """Parse the payload header into a typed struct column. Narrow map —
    no shuffle; corrupt payloads yield a null struct instead of failing
    the job (at 100 TB some assets are always corrupt)."""
    fields = df.schema.fields
    schema = T.StructType(list(fields) + [T.StructField(out, IMAGE_META_SCHEMA)])

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for payload in pdf[col]:
                try:
                    meta, _ = decode_image(bytes(payload))
                    metas.append({k: meta.get(k) for k in
                                  ("format", "width", "height",
                                   "channels", "n_bytes")})
                except Exception:
                    metas.append(None)
            pdf = pdf.copy()
            pdf[out] = metas
            yield pdf

    return df.mapInPandas(parse, schema=schema)


# ------------------------------------------------------------------ features
def image_features(df: DataFrame, col: str) -> DataFrame:
    """Per-image per-channel statistics → a flat feature vector
    ``array<float>`` ([mean_c..., std_c..., min_c..., max_c...]) ready for
    the similarity tier. Keeps only the key columns + features (payload is
    dropped — never carry bytes through later shuffles)."""
    keep = [f for f in df.schema.fields if f.dataType != T.BinaryType()]
    schema = T.StructType(keep + [
        T.StructField("features", T.ArrayType(T.FloatType()))])
    names = [f.name for f in keep]

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf[col]:
                try:
                    _, px = decode_image(bytes(payload))
                    ch = px.reshape(-1, px.shape[2]).astype(np.float64)
                    vec = np.concatenate([ch.mean(0), ch.std(0),
                                          ch.min(0), ch.max(0)])
                    out.append([float(v) for v in vec])
                except Exception:
                    out.append(None)
            res = pdf[names].copy()
            res["features"] = out
            yield res

    return df.mapInPandas(feat, schema=schema)


def resize_image(df: DataFrame, col: str, size: Tuple[int, int],
                 out: Optional[str] = None) -> DataFrame:
    """Nearest-neighbor resize to (width, height), re-encoded in the
    source container (PNG stays PNG via the stdlib codec, FIMG stays
    FIMG).  Real raster math either way."""
    out = out or col
    w_new, h_new = size
    fields = [f for f in df.schema.fields if f.name != out]
    schema = T.StructType(fields + [T.StructField(out, T.BinaryType())])

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from orange3_timeseries_spark.operators._png import encode_png

        for pdf in batches:
            res = []
            for payload in pdf[col]:
                try:
                    meta, px = decode_image(bytes(payload))
                    h, w, c = px.shape
                    yi = (np.arange(h_new) * h // h_new)
                    xi = (np.arange(w_new) * w // w_new)
                    small = px[yi][:, xi]
                    if meta["format"] == "FIMG":
                        header = IMG_MAGIC + struct.pack(
                            "<BHHB", 1, w_new, h_new, c)
                        res.append(header + small.tobytes())
                    else:
                        res.append(encode_png(small))
                except Exception:
                    res.append(None)
            keep = pdf[[f.name for f in fields]].copy()
            keep[out] = res
            yield keep

    return df.mapInPandas(rs, schema=schema)


def sample_frames(df: DataFrame, col: str, id_col: str,
                  every: int = 10) -> DataFrame:
    """Explode a video payload (FVID or real animated GIF) into one row
    per sampled frame ``(id, frame_idx, frame)`` — frame re-encoded as
    a C-channel FIMG so downstream image ops apply unchanged. Row
    explosion happens inside the Arrow batch (no collect, no join)."""
    id_field = df.schema[id_col]
    schema = T.StructType([
        id_field,
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[col]):
                try:
                    meta, px = decode_video(bytes(payload))
                except Exception:
                    continue
                for k in range(0, meta["n_frames"], every):
                    header = IMG_MAGIC + struct.pack(
                        "<BHHB", 1, meta["width"], meta["height"],
                        px.shape[3])
                    ids.append(rid)
                    idxs.append(k)
                    frames.append(header + px[k].tobytes())
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs,
                                "frame": frames})

    return df.mapInPandas(sample, schema=schema)


def audio_features(df: DataFrame, col: str) -> DataFrame:
    """Per-clip features: [rms, mean, zero-crossing-rate, duration_ms]
    as array<float>.  Decodes real RIFF/WAVE PCM and the FAUD fixture
    via :func:`decode_audio`; FAUD's unsigned samples center at 128,
    WAV samples are already signed.  Multichannel clips average to mono
    before the feature math (the standard mixdown)."""
    keep = [f for f in df.schema.fields if f.dataType != T.BinaryType()]
    schema = T.StructType(keep + [
        T.StructField("features", T.ArrayType(T.FloatType()))])
    names = [f.name for f in keep]

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf[col]:
                try:
                    meta, s = decode_audio(bytes(payload))
                    x = s.astype(np.float64)
                    if meta["format"] == "FAUD":
                        x = x - 128.0
                    if x.ndim > 1:
                        x = x.mean(axis=1)
                    zc = float(np.mean(np.abs(np.diff(np.sign(x))) > 0)) \
                        if len(x) > 1 else 0.0
                    out.append([float(np.sqrt(np.mean(x ** 2))),
                                float(np.mean(x)), zc,
                                float(meta["duration_ms"])])
                except Exception:
                    out.append(None)
            res = pdf[names].copy()
            res["features"] = out
            yield res

    return df.mapInPandas(feat, schema=schema)


# ----------------------------------------------------------------- partition
def partition_by_bytes(df: DataFrame, col: str,
                       target_mb: int = 128) -> DataFrame:
    """Repartition a payload table so each partition carries ~target_mb of
    payload bytes. One cheap aggregate decides the partition count; a
    round-robin repartition spreads the (skewed) payloads — the explicit
    alternative to letting a later shuffle move multi-GB partitions."""
    row = df.select(
        F.sum(F.octet_length(F.col(col))).alias("total"),
        F.count(F.lit(1)).alias("n")).first()
    total, n = (row["total"] or 0), row["n"]
    if not n:
        return df
    parts = max(1, int(total / (target_mb * 1024 * 1024)) + 1)
    return df.repartition(parts)


# ------------------------------------------------------- perceptual hashing
def dhash_from_pixels(px: np.ndarray) -> int:
    """56-bit difference hash of an HxWxC uint8 raster: grayscale by
    integer mean ((R+G+B)//3), nearest-neighbor downsample to an 8x8
    grid (row r samples pixel row (r*H)//8, likewise columns), bit
    (r*7 + c) set iff grid[r][c] > grid[r][c+1] — 7 comparisons per row
    so the packed value stays positive in signed 64-bit (and therefore
    identical in Spark LongType and DuckDB BIGINT).

    Integer-only arithmetic end to end: a SQL oracle replays it exactly.
    Invariant to any monotone brightness shift that preserves pixel
    ordering — the property that makes dHash a perceptual (not exact)
    fingerprint."""
    h, w = px.shape[0], px.shape[1]
    gray = px.astype(np.int64).sum(axis=2) // px.shape[2]
    rows = (np.arange(8) * h) // 8
    cols = (np.arange(8) * w) // 8
    g = gray[np.ix_(rows, cols)]
    val = 0
    for r in range(8):
        for c in range(7):
            if g[r, c] > g[r, c + 1]:
                val |= 1 << (r * 7 + c)
    return val


def image_dhash(df: DataFrame, image_col: str, id_col: str,
                out_col: str = "dhash") -> DataFrame:
    """Per-image perceptual hash (``dhash_from_pixels``) — payload bytes
    stay inside one narrow ``mapInPandas`` stage; only (id, 8-byte hash)
    rows continue, so near-dup banding downstream shuffles fingerprints,
    never images."""
    id_f = df.schema[id_col].dataType

    schema = T.StructType([T.StructField(id_col, id_f),
                           T.StructField(out_col, T.LongType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[image_col]):
                try:
                    _, px = decode_image(bytes(payload))
                except Exception:
                    continue  # corrupt/exotic asset: skip the ROW
                rows.append((rid, dhash_from_pixels(px)))
            yield pd.DataFrame(rows, columns=[id_col, out_col])

    return df.select(id_col, image_col).mapInPandas(run, schema=schema)


def image_neardup_pairs(df: DataFrame, image_col: str, id_col: str,
                        max_hamming: int = 3) -> DataFrame:
    """Image near-duplicate pairs by banded dHash: the 56-bit hash
    splits into ``max_hamming + 1`` bands (pigeonhole: a pair within
    Hamming distance d differs in at most d bands, so with d+1 bands at
    least one band matches exactly — candidate recall is guaranteed, not
    probabilistic), candidates equi-join on (band, key), and the exact
    Hamming distance verifies — the SimHash plan shape applied to the
    image modality.  Only (id, hash) rows shuffle; payloads never leave
    the fingerprint stage.  Larger ``max_hamming`` → narrower bands →
    more candidate collisions: the verify stage stays exact, only its
    input grows."""
    if not 0 <= max_hamming < 28:
        raise ValueError(
            f"max_hamming must be in [0, 28) — {max_hamming + 1} bands "
            "over a 56-bit hash would leave sub-2-bit bands where every "
            "hash collides")
    n_bands = max_hamming + 1
    base, extra = divmod(56, n_bands)
    widths = [base + (1 if b < extra else 0) for b in range(n_bands)]
    offsets = [sum(widths[:b]) for b in range(n_bands)]
    hashed = image_dhash(df, image_col, id_col)
    entries = hashed.select(
        id_col, "dhash",
        F.posexplode(F.array(*[
            F.call_function("shiftright", F.col("dhash"),
                            F.lit(offsets[b]))
            .bitwiseAND(F.lit((1 << widths[b]) - 1))
            for b in range(n_bands)])).alias("band", "key"))
    a, b = entries.alias("a"), entries.alias("b")
    cand = (a.join(b, [F.col("a.band") == F.col("b.band"),
                       F.col("a.key") == F.col("b.key"),
                       F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    F.col("a.dhash").alias("__ha__"),
                    F.col("b.dhash").alias("__hb__"))
            .dropDuplicates(["id_a", "id_b"]))
    ham = F.bit_count(F.col("__ha__").bitwiseXOR(F.col("__hb__")))
    return (cand.select("id_a", "id_b", ham.cast("int").alias("hamming"))
            .where(F.col("hamming") <= max_hamming))


def video_signature(df: DataFrame, video_col: str, id_col: str,
                    n_sample: int = 4) -> DataFrame:
    """Per-video perceptual signature: dHash of ``n_sample`` frames
    sampled at positions (j·n_frames)//n_sample — the video analog of
    :func:`image_dhash`, running on FVID fixtures or REAL animated
    GIFs via :func:`decode_video`.  Two videos are near-duplicates
    when their signatures share enough frame hashes (set overlap via a
    postings join, same plan as n-gram Jaccard) — trims/re-encodes
    shift or perturb a few frames but rarely all.  Payload bytes stay
    in this one narrow stage; the signature is n_sample longs."""
    id_f = df.schema[id_col].dataType
    schema = T.StructType(
        [T.StructField(id_col, id_f)]
        + [T.StructField(f"f{j}", T.LongType()) for j in range(n_sample)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[video_col]):
                try:
                    _, frames = decode_video(bytes(payload))
                except Exception:
                    continue  # corrupt/exotic asset: skip the ROW
                nf = frames.shape[0]
                sig = [dhash_from_pixels(frames[(j * nf) // n_sample])
                       for j in range(n_sample)]
                rows.append((rid, *sig))
            yield pd.DataFrame(rows, columns=[id_col]
                               + [f"f{j}" for j in range(n_sample)])

    return df.select(id_col, video_col).mapInPandas(run, schema=schema)


# ------------------------------------------------------------ scene cuts
def encode_fake_video_scenes(seed: int, width: int, height: int,
                             n_frames: int, scene_len: int = 5) -> bytes:
    """FVID payload with SCENE structure: frames within a scene of
    ``scene_len`` are identical, each scene draws a fresh pseudo-raster
    (frame f uses seed ``seed + f // scene_len``) — the fixture for
    shot-boundary detection, replayable by a SQL oracle from the same
    formula."""
    header = VID_MAGIC + struct.pack("<BHHH", 1, width, height, n_frames)
    per = width * height
    body = b"".join(
        _pixel_bytes(seed + (f // scene_len), per).tobytes()
        for f in range(n_frames))
    return header + body


def synthesize_scene_video_column(df: DataFrame, id_col: str,
                                  size_col: str, out: str = "video",
                                  scene_len: int = 5) -> DataFrame:
    """Attach a scene-structured FVID payload per row (16x16 grayscale,
    n_frames = 10 + size % 20, scenes of ``scene_len`` frames)."""
    df = _spread(df)
    fields = df.schema.fields

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_fake_video_scenes(int(i), 16, 16,
                                         10 + int(s) % 20, scene_len)
                for i, s in zip(pdf[id_col], pdf[size_col])]
            pdf = pdf.copy()
            pdf[out] = payloads
            yield pdf

    schema = T.StructType(list(fields)
                          + [T.StructField(out, T.BinaryType())])
    return df.mapInPandas(gen, schema=schema)


def video_scene_cuts(df: DataFrame, video_col: str, id_col: str,
                     threshold: int = 10,
                     stride: int = 1) -> DataFrame:
    """Shot-boundary (scene cut) detection: dHash every ``stride``-th
    frame, Hamming distance between consecutive sampled hashes, a cut
    where the distance exceeds ``threshold`` — the standard cheap
    shot detector that feeds clip segmentation for video training
    data (one keyframe per shot, dedup per shot, caption per shot).

    One Arrow stage per video row (payload bytes never shuffle); the
    output is skinny (id, frame_idx, hamming, is_cut) rows.  For long
    real videos set ``stride`` > 1 — detection granularity trades
    against decode cost, the usual dial."""
    id_f = df.schema[id_col].dataType
    schema = T.StructType([
        T.StructField(id_col, id_f),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("hamming", T.IntegerType()),
        T.StructField("is_cut", T.BooleanType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[video_col]):
                try:
                    _, frames = decode_video(bytes(payload))
                except Exception:
                    continue  # corrupt asset: skip the row
                idxs = list(range(0, frames.shape[0], stride))
                hashes = [dhash_from_pixels(frames[i]) for i in idxs]
                for k in range(1, len(hashes)):
                    ham = int(bin(hashes[k] ^ hashes[k - 1]).count("1"))
                    rows.append((rid, idxs[k], ham, ham > threshold))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              schema.fields])

    return df.select(id_col, video_col).mapInPandas(run, schema)


# ------------------------------------------------------ silence spans
def encode_fake_audio_segments(seed: int, sample_rate: int,
                               n_samples: int,
                               seg_len: int = 500) -> bytes:
    """FAUD payload with SILENCE structure: alternating ``seg_len``
    segments — even segments hover at the 128 midline (amplitude <= 2),
    odd segments span the full range — the fixture for voice-activity /
    silence segmentation, replayable by a SQL oracle from the formula
    ``v(i) = 128 + (h(i) % 5) - 2`` (quiet) / ``h(i) % 256`` (loud)
    with ``h(i) = seed*2654435761 + i*97``."""
    header = AUD_MAGIC + struct.pack("<BHI", 1, sample_rate, n_samples)
    i = np.arange(n_samples, dtype=np.uint64)
    h = (np.uint64(seed % (1 << 31)) * np.uint64(2654435761)
         + i * np.uint64(97))
    quiet = ((i // np.uint64(seg_len)) % np.uint64(2)) == 0
    v = np.where(quiet,
                 np.uint64(128) + h % np.uint64(5) - np.uint64(2),
                 h % np.uint64(256)).astype(np.uint8)
    return header + v.tobytes()


def synthesize_segment_audio_column(df: DataFrame, id_col: str,
                                    size_col: str, out: str = "audio",
                                    seg_len: int = 500) -> DataFrame:
    """Attach a silence-structured FAUD payload per row
    (n_samples = 1000 + size % 500 — bounded so per-sample SQL replay
    stays cheap)."""
    df = _spread(df)
    fields = df.schema.fields

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_fake_audio_segments(int(i), 8000,
                                           1000 + int(s) % 500, seg_len)
                for i, s in zip(pdf[id_col], pdf[size_col])]
            pdf = pdf.copy()
            pdf[out] = payloads
            yield pdf

    schema = T.StructType(list(fields)
                          + [T.StructField(out, T.BinaryType())])
    return df.mapInPandas(gen, schema=schema)


def audio_silence_spans(df: DataFrame, audio_col: str, id_col: str,
                        frame: int = 250,
                        rms_threshold: float = 20.0) -> DataFrame:
    """Silence-span segmentation (cheap voice-activity detection): RMS
    per non-overlapping ``frame``-sample window around the 128 midline,
    consecutive sub-threshold frames merge into spans — the step that
    trims dead air / splits long recordings before ASR or audio-corpus
    dedup.  One Arrow stage per clip row; output is skinny
    ``(id, span_start_frame, span_end_frame, n_frames)`` rows (end
    exclusive).  Trailing partial frames are ignored (standard VAD
    framing)."""
    id_f = df.schema[id_col].dataType
    schema = T.StructType([
        T.StructField(id_col, id_f),
        T.StructField("span_start_frame", T.IntegerType()),
        T.StructField("span_end_frame", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[audio_col]):
                try:
                    meta, samples = decode_audio(bytes(payload))
                except Exception:
                    continue
                s = np.asarray(samples, dtype=np.float64)
                if meta.get("format") == "FAUD":
                    s = s - 128.0  # unsigned fixture centers at 128
                n_frames = len(s) // frame
                if not n_frames:
                    continue
                fr = s[:n_frames * frame].reshape(n_frames, frame)
                rms = np.sqrt((fr * fr).mean(axis=1))
                silent = rms < rms_threshold
                start = None
                for k in range(n_frames + 1):
                    on = k < n_frames and silent[k]
                    if on and start is None:
                        start = k
                    elif not on and start is not None:
                        rows.append((rid, start, k, k - start))
                        start = None
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              schema.fields])

    return df.select(id_col, audio_col).mapInPandas(run, schema)

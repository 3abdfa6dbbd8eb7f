"""Driver-contract queries for the multimodal tier.

The fake container codec (operators/multimodal.py) is deterministic from
``(doc_id, n_chars)``, which makes the whole binary pipeline *value-hash
oracle-able*: DuckDB recomputes the expected header fields from the
synthesis formulas and even the per-channel pixel means via
``generate_series`` over the pseudo-raster formula
``(doc_id*2654435761 + i*97) % 256``.  The oracle therefore verifies the
end-to-end byte path — encode → binary column → header parse / raster
decode → aggregate — not just the arithmetic.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from orange3_timeseries_spark.queries import query, r6
from orange3_timeseries_spark.sources import read_table


def _docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")


@query("multimodal_image_meta", """
SELECT doc_id,
       CAST(16 + n_chars % 64 AS INT) AS width,
       CAST(16 + (n_chars * 7) % 64 AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CAST(10 + (16 + n_chars % 64) * (16 + (n_chars * 7) % 64) * 3
            AS BIGINT) AS n_bytes
FROM documents
""")
def q_multimodal_image_meta(spark, sf_dir):
    """Synthesize a binary FIMG payload per document, then parse its header
    back out of the bytes — oracle recomputes the fields from the synthesis
    formulas, so a mismatch anywhere in the byte path fails the hash."""
    from orange3_timeseries_spark.operators.multimodal import (
        image_metadata,
        synthesize_image_column,
    )

    df = synthesize_image_column(_docs(spark, sf_dir), "doc_id", "n_chars")
    out = image_metadata(df, "image")
    return out.select("doc_id", "meta.width", "meta.height",
                      "meta.channels", "meta.n_bytes")


@query("multimodal_frame_counts", """
SELECT doc_id,
       CAST(ceil((10 + n_chars % 20) / 5.0) AS BIGINT) AS n_sampled
FROM documents
""")
def q_multimodal_frame_counts(spark, sf_dir):
    """Synthesize FVID payloads, explode every-5th frame inside the Arrow
    batch, count sampled frames per document — oracle = ceil(n_frames/5)."""
    from orange3_timeseries_spark.operators.multimodal import (
        sample_frames,
        synthesize_video_column,
    )

    df = synthesize_video_column(_docs(spark, sf_dir), "doc_id", "n_chars")
    frames = sample_frames(df, "video", "doc_id", every=5)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sampled"))


@query("multimodal_channel_means", """
WITH d AS (
  SELECT doc_id,
         16 + n_chars % 64 AS w,
         16 + (n_chars * 7) % 64 AS h
  FROM documents),
px AS (
  SELECT d.doc_id, t.i % 3 AS ch,
         (d.doc_id * 2654435761 + t.i * 97) % 256 AS v
  FROM d, LATERAL (SELECT unnest(generate_series(0, w * h * 3 - 1)) AS i) t)
SELECT doc_id,
       round(avg(v) FILTER (ch = 0), 6) AS mean_r,
       round(avg(v) FILTER (ch = 1), 6) AS mean_g,
       round(avg(v) FILTER (ch = 2), 6) AS mean_b
FROM px GROUP BY doc_id
""")
def q_multimodal_channel_means(spark, sf_dir):
    """Decode the synthesized raster and average each channel — oracle
    regenerates every pixel in SQL from the hash formula. Exercises the
    full decode path with exact double arithmetic on both sides."""
    from orange3_timeseries_spark.operators.multimodal import (
        decode_fake_image,
        synthesize_image_column,
    )

    df = synthesize_image_column(_docs(spark, sf_dir), "doc_id", "n_chars")
    schema = T.StructType([
        df.schema["doc_id"],
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ])

    def means(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["doc_id"], pdf["image"]):
                _, px = decode_fake_image(bytes(payload))
                m = px.reshape(-1, 3).astype(np.float64).mean(0)
                rows.append((rid, m[0], m[1], m[2]))
            yield pd.DataFrame(rows, columns=["doc_id", "mean_r",
                                              "mean_g", "mean_b"])

    out = df.mapInPandas(means, schema=schema)
    return out.select("doc_id", r6(F.col("mean_r"), "mean_r"),
                      r6(F.col("mean_g"), "mean_g"),
                      r6(F.col("mean_b"), "mean_b"))


@query("multimodal_image_dhash", """
WITH d AS (
  SELECT doc_id,
         16 + n_chars % 64 AS w,
         16 + (n_chars * 7) % 64 AS h
  FROM documents),
grid AS (
  SELECT d.doc_id, gr.r, gc.c,
         ((((gr.r * d.h) // 8) * d.w + ((gc.c * d.w) // 8)) * 3) AS b,
         d.doc_id * 2654435761 AS seed
  FROM d,
       LATERAL (SELECT unnest(generate_series(0, 7)) AS r) gr,
       LATERAL (SELECT unnest(generate_series(0, 7)) AS c) gc),
g AS (
  SELECT doc_id, r, c,
         (((seed + (b + 0) * 97) % 256)
          + ((seed + (b + 1) * 97) % 256)
          + ((seed + (b + 2) * 97) % 256)) // 3 AS gv
  FROM grid)
SELECT a.doc_id,
       sum(CASE WHEN a.gv > b.gv
                THEN (1::BIGINT << (a.r * 7 + a.c)) ELSE 0 END)::BIGINT
           AS dhash
FROM g a JOIN g b
  ON b.doc_id = a.doc_id AND b.r = a.r AND b.c = a.c + 1
WHERE a.c < 7
GROUP BY 1
""")
def q_multimodal_image_dhash(spark, sf_dir):
    """Perceptual difference-hash per image: grayscale, 8x8
    nearest-neighbor grid, 56 row-adjacent comparisons packed into a
    long — the image-modality near-dup fingerprint (band it like
    SimHash for pair generation).  The oracle regenerates every sampled
    pixel from the codec formula and replays the integer-only hash
    exactly."""
    from orange3_timeseries_spark.operators.multimodal import (
        image_dhash,
        synthesize_image_column,
    )

    d = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    imgs = synthesize_image_column(d, "doc_id", "n_chars")
    return image_dhash(imgs, "image", "doc_id")


@query("multimodal_png_dhash", """
WITH d AS (
  SELECT doc_id,
         16 + n_chars % 64 AS w,
         16 + (n_chars * 7) % 64 AS h
  FROM documents),
grid AS (
  SELECT d.doc_id, gr.r, gc.c,
         ((((gr.r * d.h) // 8) * d.w + ((gc.c * d.w) // 8)) * 3) AS b,
         d.doc_id * 2654435761 AS seed
  FROM d,
       LATERAL (SELECT unnest(generate_series(0, 7)) AS r) gr,
       LATERAL (SELECT unnest(generate_series(0, 7)) AS c) gc),
g AS (
  SELECT doc_id, r, c,
         (((seed + (b + 0) * 97) % 256)
          + ((seed + (b + 1) * 97) % 256)
          + ((seed + (b + 2) * 97) % 256)) // 3 AS gv
  FROM grid)
SELECT a.doc_id,
       sum(CASE WHEN a.gv > b.gv
                THEN (1::BIGINT << (a.r * 7 + a.c)) ELSE 0 END)::BIGINT
           AS dhash
FROM g a JOIN g b
  ON b.doc_id = a.doc_id AND b.r = a.r AND b.c = a.c + 1
WHERE a.c < 7
GROUP BY 1
""")
def q_multimodal_png_dhash(spark, sf_dir):
    """Perceptual dHash computed from REAL PNG payloads: each document's
    raster is PNG-encoded (pure-stdlib codec — zlib deflate, filter-0
    scanlines) and decoded back through the magic-dispatching
    :func:`decode_image` before hashing.  The raster formulas match the
    FIMG fixture, so the SAME pixel-replay SQL oracle hash-verifies the
    full real-codec byte path: encode PNG → binary column → chunk parse →
    inflate → unfilter → grayscale/grid/hash."""
    from orange3_timeseries_spark.operators.multimodal import (
        image_dhash,
        synthesize_png_column,
    )

    d = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    imgs = synthesize_png_column(d, "doc_id", "n_chars")
    return image_dhash(imgs, "image", "doc_id")


@query("multimodal_jpeg_meta", """
SELECT doc_id,
       'JPEG' AS format,
       CAST(16 + n_chars % 64 AS INT) AS width,
       CAST(16 + (n_chars * 7) % 64 AS INT) AS height,
       CAST(3 AS INT) AS channels
FROM documents
WHERE doc_id % 10 = 3
""")
def q_multimodal_jpeg_meta(spark, sf_dir):
    """Real baseline-JPEG byte path: each document's raster is
    JPEG-encoded (pure-NumPy encoder — FDCT, quantization, Huffman)
    and its header parsed back through the magic-dispatching
    :func:`decode_image` (marker walk, SOF0).  JPEG is lossy so the
    oracle checks the formula-replayable header fields; decoded-pixel
    fidelity (round-trip RMSE, 4:2:0, restart markers, cross-format
    near-dup) is golden-tested in tests/test_multimodal.py.

    Runs on a deterministic 10% id-slice: the query verifies the codec
    BYTE PATH (the pure-Python encoder is a fixture generator, not a
    throughput claim — real pipelines decode; encode throughput would
    need a vectorized entropy coder)."""
    from orange3_timeseries_spark.operators.multimodal import (
        image_metadata,
        synthesize_jpeg_column,
    )

    docs = _docs(spark, sf_dir).where(F.col("doc_id") % 10 == 3)
    df = synthesize_jpeg_column(docs, "doc_id", "n_chars")
    out = image_metadata(df, "image")
    return out.select("doc_id", "meta.format", "meta.width",
                      "meta.height", "meta.channels")


@query("multimodal_wav_features", """
WITH d AS (SELECT doc_id, 500 + 11 * n_chars AS ns FROM documents),
sm AS (
  SELECT d.doc_id, t.i,
         (((d.doc_id * 2654435761 + t.i * 97) % 65536) - 32768)::DOUBLE
             AS v
  FROM d,
       LATERAL (SELECT unnest(generate_series(0, ns - 1)) AS i) t),
f AS (SELECT doc_id, sqrt(avg(v * v)) AS rms, avg(v) AS meanv
      FROM sm GROUP BY 1),
z AS (SELECT a.doc_id,
             avg(CASE WHEN abs(sign(b.v) - sign(a.v)) > 0
                      THEN 1.0 ELSE 0.0 END) AS zcr
      FROM sm a JOIN sm b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      GROUP BY 1)
SELECT d.doc_id,
       round(f.rms::FLOAT::DOUBLE, 6) AS rms,
       round(f.meanv::FLOAT::DOUBLE, 6) AS mean_v,
       round(z.zcr::FLOAT::DOUBLE, 6) AS zcr,
       round((d.ns // 8)::FLOAT::DOUBLE, 6) AS duration_ms
FROM d JOIN f USING (doc_id) JOIN z USING (doc_id)
""")
def q_multimodal_wav_features(spark, sf_dir):
    """Audio features computed from REAL RIFF/WAVE PCM payloads: each
    document's deterministic int16 clip is WAV-encoded, decoded back
    through the magic-dispatching :func:`decode_audio` (stdlib RIFF
    parse), and run through the production ``audio_features`` operator
    (rms / mean / zero-crossing rate / duration).  Integer-valued
    samples keep every aggregate exact in float64, so the oracle
    replays the decoded math bit-for-bit from the synthesis formula —
    verifying the full WAV byte path, not just the arithmetic."""
    from orange3_timeseries_spark.operators.multimodal import (
        audio_features,
        synthesize_wav_column,
    )

    wavs = synthesize_wav_column(_docs(spark, sf_dir), "doc_id", "n_chars")
    out = audio_features(wavs, "audio")
    return out.select(
        "doc_id",
        r6(F.element_at("features", 1).cast("double"), "rms"),
        r6(F.element_at("features", 2).cast("double"), "mean_v"),
        r6(F.element_at("features", 3).cast("double"), "zcr"),
        r6(F.element_at("features", 4).cast("double"), "duration_ms"))


_VIDEO_SIG_SQL = """
WITH d AS (SELECT doc_id, 10 + n_chars % 20 AS nf FROM documents),
g AS (
  SELECT d.doc_id, sj.j, gr.r, gc.c,
         (d.doc_id * 2654435761
          + (((sj.j * d.nf) // 4) * 256 + (2 * gr.r) * 16 + (2 * gc.c))
            * 97) % 256 AS gv
  FROM d,
       LATERAL (SELECT unnest(generate_series(0, 3)) AS j) sj,
       LATERAL (SELECT unnest(generate_series(0, 7)) AS r) gr,
       LATERAL (SELECT unnest(generate_series(0, 7)) AS c) gc),
b AS (
  SELECT a.doc_id, a.j,
         sum(CASE WHEN a.gv > b2.gv
                  THEN (1::BIGINT << (a.r * 7 + a.c)) ELSE 0 END)::BIGINT
             AS hv
  FROM g a JOIN g b2
    ON b2.doc_id = a.doc_id AND b2.j = a.j AND b2.r = a.r
   AND b2.c = a.c + 1
  WHERE a.c < 7
  GROUP BY 1, 2)
SELECT doc_id,
       max(CASE WHEN j = 0 THEN hv END) AS f0,
       max(CASE WHEN j = 1 THEN hv END) AS f1,
       max(CASE WHEN j = 2 THEN hv END) AS f2,
       max(CASE WHEN j = 3 THEN hv END) AS f3
FROM b GROUP BY 1
"""


@query("multimodal_gif_signature", _VIDEO_SIG_SQL.replace(
    "FROM documents", "FROM documents WHERE doc_id % 10 = 3", 1))
def q_multimodal_gif_signature(spark, sf_dir):
    """Perceptual video signatures computed from REAL animated GIFs:
    each document's frame stack is GIF-encoded (pure-stdlib LZW,
    grayscale palette) and decoded back through the magic-dispatching
    :func:`decode_video` before frame sampling + dHash.  GIF is
    lossless and the raster formula matches the FVID fixture, so the
    SAME pixel-replay SQL oracle hash-verifies the real container's
    byte path end to end: palette + LZW encode -> binary column ->
    block walk -> LZW decode -> composite -> sample -> hash.

    Runs on a deterministic 10% id-slice — byte-path verification, not
    an encode-throughput claim (the pure-Python LZW encoder is a
    fixture generator)."""
    from orange3_timeseries_spark.operators.multimodal import (
        synthesize_gif_column,
        video_signature,
    )

    d = (read_table(spark, sf_dir, "documents")
         .select("doc_id", "n_chars")
         .where(F.col("doc_id") % 10 == 3))
    vids = synthesize_gif_column(d, "doc_id", "n_chars")
    return video_signature(vids, "video", "doc_id")


@query("multimodal_video_signature", _VIDEO_SIG_SQL)
def q_multimodal_video_signature(spark, sf_dir):
    """Perceptual video signatures: dHash of 4 evenly sampled frames per
    FVID payload (16x16 grayscale) — near-dup videos share frame hashes
    (postings-join overlap, cf. ``video_signature``).  The oracle
    regenerates each sampled frame's 8x8 grid from the codec formula and
    replays all four hashes exactly.

    Fixture artifact, noted honestly: the FVID pseudo-raster is periodic
    mod 256, so a fixture video's frames are identical and f0..f3
    coincide — the oracle still value-checks the full sample-position +
    hash pipeline; cross-frame discrimination is covered by crafted
    payloads in tests/test_multimodal.py."""
    from orange3_timeseries_spark.operators.multimodal import (
        synthesize_video_column,
        video_signature,
    )

    d = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    vids = synthesize_video_column(d, "doc_id", "n_chars")
    return video_signature(vids, "video", "doc_id")


@query("multimodal_scene_cuts", """
WITH d AS (SELECT doc_id, 10 + n_chars % 20 AS nf FROM documents),
fr AS (SELECT doc_id, unnest(generate_series(0, nf - 1)) AS f FROM d),
g AS (
  SELECT fr.doc_id, fr.f, r.r, c.c,
         ((fr.doc_id + fr.f // 5) * 2654435761
          + ((2 * r.r) * 16 + 2 * c.c) * 97) % 256 AS gv
  FROM fr,
       LATERAL (SELECT unnest(generate_series(0, 7)) AS r) r,
       LATERAL (SELECT unnest(generate_series(0, 7)) AS c) c),
h AS (
  SELECT a.doc_id, a.f,
         sum(CASE WHEN a.gv > b.gv
                  THEN (1::BIGINT << (a.r * 7 + a.c)) ELSE 0 END)::BIGINT
             AS hv
  FROM g a JOIN g b
    ON b.doc_id = a.doc_id AND b.f = a.f AND b.r = a.r
   AND b.c = a.c + 1
  WHERE a.c < 7 GROUP BY 1, 2),
x AS (
  SELECT doc_id, f,
         bit_count(xor(hv, lag(hv) OVER (PARTITION BY doc_id
                                         ORDER BY f))) AS hamming
  FROM h)
SELECT doc_id, f::INT AS frame_idx, hamming::INT AS hamming,
       hamming > 10 AS is_cut
FROM x WHERE hamming IS NOT NULL
""")
def q_multimodal_scene_cuts(spark, sf_dir):
    """Shot-boundary detection over scene-structured video fixtures:
    per-frame dHash, consecutive Hamming distance, cut where > 10 —
    the clip-segmentation step of a video training pipeline (keyframe
    per shot, dedup per shot).  Frames repeat within 5-frame scenes
    and change across them, so true cuts sit at frame_idx % 5 == 0;
    the oracle replays every frame hash from the raster formula, the
    XOR popcount, and the verdict."""
    from orange3_timeseries_spark.operators.multimodal import (
        synthesize_scene_video_column,
        video_scene_cuts,
    )

    d = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    vids = synthesize_scene_video_column(d, "doc_id", "n_chars")
    return video_scene_cuts(vids, "video", "doc_id", threshold=10)


@query("multimodal_silence_spans", """
WITH d AS (SELECT doc_id, 1000 + n_chars % 500 AS n FROM documents),
fr AS (SELECT doc_id, n, unnest(generate_series(0, n // 250 - 1)) AS k
       FROM d),
s AS (
  SELECT fr.doc_id, fr.k,
         sqrt(avg(pow(CASE WHEN (i.i // 500) % 2 = 0
                  THEN ((fr.doc_id * 2654435761 + i.i * 97) % 5) - 2
                  ELSE ((fr.doc_id * 2654435761 + i.i * 97) % 256) - 128
                  END, 2))) AS rms
  FROM fr, LATERAL (SELECT unnest(generate_series(fr.k * 250,
                                  fr.k * 250 + 249)) AS i) i
  GROUP BY 1, 2),
sf AS (SELECT doc_id, k FROM s WHERE rms < 20.0),
sp AS (SELECT doc_id, k,
              k - row_number() OVER (PARTITION BY doc_id ORDER BY k)
                  AS grp
       FROM sf)
SELECT doc_id, min(k)::INT AS span_start_frame,
       (max(k) + 1)::INT AS span_end_frame, count(*)::INT AS n_frames
FROM sp GROUP BY doc_id, grp
""")
def q_multimodal_silence_spans(spark, sf_dir):
    """Silence-span segmentation (cheap VAD) over silence-structured
    audio fixtures: 250-sample frame RMS around the midline,
    sub-threshold frames merged into spans — the dead-air trimming /
    recording-splitting step before ASR or audio dedup.  The oracle
    replays every sample from the fixture formula, the frame RMS, the
    threshold verdict, and the gaps-and-islands span merge."""
    from orange3_timeseries_spark.operators.multimodal import (
        audio_silence_spans,
        synthesize_segment_audio_column,
    )

    d = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    auds = synthesize_segment_audio_column(d, "doc_id", "n_chars")
    return audio_silence_spans(auds, "audio", "doc_id", frame=250,
                               rms_threshold=20.0)

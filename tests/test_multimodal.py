"""Multimodal column operators: codec round-trips (pure NumPy) and the
Spark plumbing (mapInPandas schemas, batch explode, byte partitioning)."""

import numpy as np
import pytest

from orange3_timeseries_spark.operators.multimodal import (
    _pixel_bytes,
    audio_features,
    decode_fake_audio,
    decode_fake_image,
    decode_fake_video,
    encode_fake_audio,
    encode_fake_image,
    encode_fake_video,
    image_features,
    image_metadata,
    partition_by_bytes,
    resize_image,
    sample_frames,
    synthesize_audio_column,
    synthesize_image_column,
    synthesize_video_column,
)


class TestCodec:
    def test_image_roundtrip(self):
        p = encode_fake_image(42, 20, 12, 3)
        meta, px = decode_fake_image(p)
        assert meta == {"format": "FIMG", "width": 20, "height": 12,
                        "channels": 3, "n_bytes": 10 + 20 * 12 * 3}
        assert px.shape == (12, 20, 3)
        # deterministic: same seed -> same bytes
        assert p == encode_fake_image(42, 20, 12, 3)
        assert p != encode_fake_image(43, 20, 12, 3)

    def test_pixel_formula(self):
        px = _pixel_bytes(7, 5)
        expect = [(7 * 2654435761 + i * 97) % 256 for i in range(5)]
        assert list(px) == expect

    def test_audio_roundtrip(self):
        p = encode_fake_audio(5, 8000, 4000)
        meta, s = decode_fake_audio(p)
        assert meta["sample_rate"] == 8000
        assert meta["n_samples"] == 4000
        assert meta["duration_ms"] == 500
        assert len(s) == 4000

    def test_video_roundtrip(self):
        p = encode_fake_video(9, 16, 16, 12)
        meta, px = decode_fake_video(p)
        assert meta["n_frames"] == 12
        assert px.shape == (12, 16, 16)

    def test_bad_magic_raises(self):
        with pytest.raises(ValueError):
            decode_fake_image(b"JUNKxxxxxxxxxx")


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [(i, 10 + i * 3) for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, n_chars long")


class TestSparkPlumbing:
    def test_synthesize_and_metadata(self, spark, docs_df):
        df = synthesize_image_column(docs_df, "doc_id", "n_chars")
        out = image_metadata(df, "image").select("doc_id", "meta.*").toPandas()
        assert len(out) == 20
        row = out[out.doc_id == 4].iloc[0]  # n_chars=22
        assert row.width == 16 + 22 % 64
        assert row.height == 16 + (22 * 7) % 64
        assert row.channels == 3
        assert row.n_bytes == 10 + row.width * row.height * 3

    def test_image_features_match_numpy(self, spark, docs_df):
        df = synthesize_image_column(docs_df, "doc_id", "n_chars")
        out = image_features(df, "image").toPandas().set_index("doc_id")
        _, px = decode_fake_image(encode_fake_image(0, 16 + 10 % 64,
                                                    16 + 70 % 64, 3))
        ch = px.reshape(-1, 3).astype(float)
        got = np.array(out.loc[0, "features"])
        assert got[:3] == pytest.approx(ch.mean(0), abs=1e-4)
        assert got[3:6] == pytest.approx(ch.std(0), abs=1e-4)
        # payload column dropped from the feature table
        assert "image" not in out.columns

    def test_resize(self, spark, docs_df):
        df = synthesize_image_column(docs_df, "doc_id", "n_chars")
        small = resize_image(df, "image", (8, 8))
        metas = image_metadata(small, "image").select(
            "meta.width", "meta.height").distinct().collect()
        assert [(r.width, r.height) for r in metas] == [(8, 8)]

    def test_frame_sample_counts(self, spark, docs_df):
        df = synthesize_video_column(docs_df, "doc_id", "n_chars")
        frames = sample_frames(df, "video", "doc_id", every=5)
        counts = frames.groupBy("doc_id").count().toPandas() \
            .set_index("doc_id")["count"]
        for i in range(20):
            n_frames = 10 + (10 + i * 3) % 20
            assert counts[i] == -(-n_frames // 5)
        # sampled frames decode as 1-channel images
        one = frames.filter("doc_id = 0 and frame_idx = 0").first()
        meta, px = decode_fake_image(bytes(one.frame))
        assert meta["channels"] == 1 and px.shape == (16, 16, 1)

    def test_audio_features(self, spark, docs_df):
        df = synthesize_audio_column(docs_df, "doc_id", "n_chars")
        out = audio_features(df, "audio").toPandas()
        assert len(out) == 20
        f = np.array(out.loc[0, "features"])
        assert len(f) == 4 and np.isfinite(f).all()
        # duration: n_samples = 1000+37*10 = 1370 @ 8kHz -> 171 ms
        row = out[out.doc_id == 0].iloc[0]
        assert row.features[3] == pytest.approx(1370 * 1000 // 8000, abs=1)

    def test_corrupt_payload_yields_null(self, spark):
        df = spark.createDataFrame([(1, bytearray(b"JUNK" * 5))],
                                   "id long, image binary")
        out = image_metadata(df, "image").first()
        assert out.meta is None

    def test_partition_by_bytes(self, spark, docs_df):
        df = synthesize_image_column(docs_df, "doc_id", "n_chars")
        # tiny target forces multiple partitions
        parts = partition_by_bytes(df, "image", target_mb=1)
        assert parts.count() == 20
        assert parts.rdd.getNumPartitions() >= 1


# ------------------------------------------------------ perceptual dhash
def test_dhash_perceptual_properties():
    import numpy as np

    from orange3_timeseries_spark.operators.multimodal import (
        dhash_from_pixels,
    )

    rng = np.random.RandomState(0)
    px = rng.randint(20, 200, size=(40, 60, 3)).astype(np.uint8)
    h0 = dhash_from_pixels(px)
    assert 0 <= h0 < (1 << 56)
    # uniform brightness shift preserves orderings -> identical hash
    assert dhash_from_pixels(np.clip(px.astype(int) + 30, 0,
                                     255).astype(np.uint8)) == h0
    # tiny local noise flips at most a few of the 56 bits
    noisy = np.clip(px.astype(int)
                    + rng.randint(-2, 3, size=px.shape), 0,
                    255).astype(np.uint8)
    flips = bin(h0 ^ dhash_from_pixels(noisy)).count("1")
    assert flips <= 10
    # an unrelated image lands far away
    other = rng.randint(0, 256, size=(40, 60, 3)).astype(np.uint8)
    assert bin(h0 ^ dhash_from_pixels(other)).count("1") > 10


def test_image_dhash_spark_matches_local(spark):
    import numpy as np

    from orange3_timeseries_spark.operators.multimodal import (
        decode_fake_image,
        dhash_from_pixels,
        encode_fake_image,
        image_dhash,
    )

    rows = [(i, bytearray(encode_fake_image(i, 20 + i, 24 + i, 3)))
            for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, image binary")
    got = {r.doc_id: r.dhash for r in
           image_dhash(df, "image", "doc_id").collect()}
    for i, payload in rows:
        _, px = decode_fake_image(bytes(payload))
        assert got[i] == dhash_from_pixels(px)


def test_image_neardup_pairs_finds_perturbed_copies(spark):
    import numpy as np

    from orange3_timeseries_spark.operators.multimodal import (
        image_neardup_pairs,
    )
    import struct

    from orange3_timeseries_spark.operators.multimodal import IMG_MAGIC

    def payload(px):
        h, w, c = px.shape
        return bytearray(IMG_MAGIC + struct.pack("<BHHB", 1, w, h, c)
                         + px.tobytes())

    rng = np.random.RandomState(1)
    rows = []
    for i in range(8):
        px = rng.randint(30, 220, size=(32, 32, 3)).astype(np.uint8)
        rows.append((i, payload(px)))
        if i < 3:  # ids 100+i: slightly perturbed copies
            noisy = np.clip(px.astype(int)
                            + rng.randint(-1, 2, size=px.shape),
                            0, 255).astype(np.uint8)
            rows.append((100 + i, payload(noisy)))
    df = spark.createDataFrame(rows, "doc_id long, image binary")
    pairs = {(r.id_a, r.id_b): r.hamming for r in
             image_neardup_pairs(df, "image", "doc_id",
                                 max_hamming=6).collect()}
    for i in range(3):
        assert (i, 100 + i) in pairs     # every planted copy found
    # no spurious pair between unrelated originals
    assert not any(a < 100 and b < 100 for a, b in pairs)


def test_video_signature_matches_local(spark):
    import numpy as np

    from orange3_timeseries_spark.operators.multimodal import (
        decode_fake_video,
        dhash_from_pixels,
        encode_fake_video,
        video_signature,
    )

    import struct

    from orange3_timeseries_spark.operators.multimodal import VID_MAGIC

    def craft(seed, nf):
        rng = np.random.RandomState(seed)
        frames = rng.randint(0, 256, size=(nf, 16, 16)).astype(np.uint8)
        return bytearray(VID_MAGIC + struct.pack("<BHHH", 1, 16, 16, nf)
                         + frames.tobytes())

    # crafted payloads with DISTINCT random frames (the FVID fixture
    # formula is periodic mod 256, so its frames are all identical —
    # fine for the oracle, useless for discrimination tests)
    rows = [(i, craft(i, 10 + i)) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, video binary")
    got = {r.doc_id: (r.f0, r.f1, r.f2, r.f3) for r in
           video_signature(df, "video", "doc_id").collect()}
    for i, payload in rows:
        _, frames = decode_fake_video(bytes(payload))
        nf = frames.shape[0]
        want = tuple(dhash_from_pixels(frames[(j * nf) // 4][..., None])
                     for j in range(4))
        assert got[i] == want
    # distinct random frames -> (almost) all 20 hashes distinct
    sigs = list(got.values())
    assert len({s for sig in sigs for s in sig}) > 15
    # the fixture codec's identical-frame artifact: all 4 hashes equal
    fx = [(0, bytearray(encode_fake_video(7, 16, 16, 12)))]
    fdf = spark.createDataFrame(fx, "doc_id long, video binary")
    [r] = video_signature(fdf, "video", "doc_id").collect()
    assert r.f0 == r.f1 == r.f2 == r.f3


class TestPng:
    """Pure-stdlib PNG codec + its integration with the perceptual tier."""

    @staticmethod
    def _craft(px, ftypes):
        """PNG-encode with an explicit filter type per scanline (the
        encoder proper always emits filter 0; this exercises the
        Sub/Up/Average/Paeth decode paths on reference-filtered data)."""
        import struct
        import zlib

        import numpy as np

        from orange3_timeseries_spark.operators._png import PNG_SIG, _chunk
        h, w, c = px.shape
        stride = w * c
        px64 = px.astype(np.int64).reshape(h, stride)
        raw = bytearray()
        prev = np.zeros(stride, dtype=np.int64)
        zc = np.zeros(c, dtype=np.int64)
        for y, f in enumerate(ftypes):
            rec = px64[y]
            left = np.concatenate([zc, rec[:-c]])
            upleft = np.concatenate([zc, prev[:-c]])
            if f == 0:
                filt = rec
            elif f == 1:
                filt = (rec - left) & 0xFF
            elif f == 2:
                filt = (rec - prev) & 0xFF
            elif f == 3:
                filt = (rec - ((left + prev) >> 1)) & 0xFF
            else:
                p = left + prev - upleft
                pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                              np.abs(p - upleft))
                pred = np.where((pa <= pb) & (pa <= pc), left,
                                np.where(pb <= pc, prev, upleft))
                filt = (rec - pred) & 0xFF
            raw.append(f)
            raw.extend(filt.astype(np.uint8).tobytes())
            prev = rec
        ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2,
                                                 4: 6}[c], 0, 0, 0)
        return (PNG_SIG + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", zlib.compress(bytes(raw)))
                + _chunk(b"IEND", b""))

    def test_roundtrip_all_channel_counts(self):
        import numpy as np

        from orange3_timeseries_spark.operators._png import (
            decode_png,
            encode_png,
        )
        rng = np.random.RandomState(0)
        for shape in [(12, 20, 3), (7, 5, 1), (9, 9, 4), (8, 3, 2)]:
            px = rng.randint(0, 256, size=shape, dtype=np.uint8)
            meta, back = decode_png(encode_png(px))
            assert np.array_equal(back, px)
            assert (meta["width"], meta["height"], meta["channels"]) == \
                (shape[1], shape[0], shape[2])
            assert meta["format"] == "PNG"

    def test_decode_every_filter_type(self):
        import numpy as np

        from orange3_timeseries_spark.operators._png import decode_png
        rng = np.random.RandomState(3)
        px = rng.randint(0, 256, size=(10, 6, 3), dtype=np.uint8)
        _, back = decode_png(self._craft(px, [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]))
        assert np.array_equal(back, px)
        gray = rng.randint(0, 256, size=(5, 9, 1), dtype=np.uint8)
        _, back = decode_png(self._craft(gray, [4, 3, 2, 1, 0]))
        assert np.array_equal(back, gray)

    def test_palette_decode(self):
        import struct
        import zlib

        import numpy as np

        from orange3_timeseries_spark.operators._png import (
            PNG_SIG,
            _chunk,
            decode_png,
        )
        pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]],
                       dtype=np.uint8)
        idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
        raw = b"".join(b"\x00" + row.tobytes() for row in idx)
        payload = (PNG_SIG
                   + _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3,
                                                 0, 0, 0))
                   + _chunk(b"PLTE", pal.tobytes())
                   + _chunk(b"IDAT", zlib.compress(raw))
                   + _chunk(b"IEND", b""))
        meta, px = decode_png(payload)
        assert meta["channels"] == 3
        assert np.array_equal(px, pal[idx])

    def test_unsupported_fields_raise(self):
        import struct
        import zlib

        import numpy as np
        import pytest

        from orange3_timeseries_spark.operators._png import (
            PNG_SIG,
            _chunk,
            decode_png,
            encode_png,
        )
        px = np.zeros((2, 2, 3), dtype=np.uint8)
        ok = encode_png(px)

        def mutate(depth=8, color=2, interlace=0):
            ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0,
                               interlace)
            raw = b"".join(b"\x00" + b"\x00" * 6 for _ in range(2))
            return (PNG_SIG + _chunk(b"IHDR", ihdr)
                    + _chunk(b"IDAT", zlib.compress(raw))
                    + _chunk(b"IEND", b""))

        decode_png(ok)
        with pytest.raises(ValueError, match="bit depth"):
            decode_png(mutate(depth=16))
        with pytest.raises(ValueError, match="interlacing"):
            decode_png(mutate(interlace=1))
        with pytest.raises(ValueError, match="not a PNG"):
            decode_png(b"JUNK" * 4)
        with pytest.raises(ValueError, match="truncated"):
            import zlib as _z

            from orange3_timeseries_spark.operators._png import _chunk as c
            bad = (PNG_SIG
                   + c(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
                   + c(b"IDAT", _z.compress(b"\x00" * 5))
                   + c(b"IEND", b""))
            decode_png(bad)

    def test_decode_image_dispatch_and_cross_container_dhash(self):
        import numpy as np

        from orange3_timeseries_spark.operators._png import encode_png
        from orange3_timeseries_spark.operators.multimodal import (
            _pixel_bytes,
            decode_image,
            dhash_from_pixels,
            encode_fake_image,
        )
        seed, w, h = 42, 20, 12
        raster = _pixel_bytes(seed, w * h * 3).reshape(h, w, 3)
        m1, p1 = decode_image(encode_fake_image(seed, w, h, 3))
        m2, p2 = decode_image(encode_png(raster))
        assert m1["format"] == "FIMG" and m2["format"] == "PNG"
        assert np.array_equal(p1, p2)
        assert dhash_from_pixels(p1) == dhash_from_pixels(p2)

    def test_spark_dhash_on_png_payloads_matches_fimg(self, spark):
        from orange3_timeseries_spark.operators.multimodal import (
            image_dhash,
            synthesize_image_column,
            synthesize_png_column,
        )
        base = spark.createDataFrame(
            [(i, 10 + 7 * i) for i in range(6)], "doc_id long, n_chars long")
        fimg = image_dhash(
            synthesize_image_column(base, "doc_id", "n_chars"),
            "image", "doc_id")
        png = image_dhash(
            synthesize_png_column(base, "doc_id", "n_chars"),
            "image", "doc_id")
        a = {r.doc_id: r.dhash for r in fimg.collect()}
        b = {r.doc_id: r.dhash for r in png.collect()}
        assert a == b and len(a) == 6

    def test_neardup_finds_planted_png_reencode(self, spark):
        import numpy as np

        from orange3_timeseries_spark.operators._png import encode_png
        from orange3_timeseries_spark.operators.multimodal import (
            encode_fake_image,
            decode_image,
            image_neardup_pairs,
        )
        rng = np.random.RandomState(5)
        rows = []
        for i in range(6):
            fimg = encode_fake_image(1000 + 37 * i, 24 + i, 24 + i, 3)
            rows.append((i, bytearray(fimg)))
        # id 100: PNG re-encode of image 0 (exact pixel dup, hamming 0)
        _, px0 = decode_image(bytes(rows[0][1]))
        rows.append((100, bytearray(encode_png(px0))))
        # id 101: PNG re-encode of image 1 with mild noise
        _, px1 = decode_image(bytes(rows[1][1]))
        noisy = np.clip(px1.astype(int)
                        + rng.randint(-1, 2, size=px1.shape),
                        0, 255).astype(np.uint8)
        rows.append((101, bytearray(encode_png(noisy))))
        df = spark.createDataFrame(rows, "doc_id long, image binary")
        pairs = {(r.id_a, r.id_b): r.hamming for r in
                 image_neardup_pairs(df, "image", "doc_id",
                                     max_hamming=6).collect()}
        assert pairs[(0, 100)] == 0
        assert (1, 101) in pairs and pairs[(1, 101)] <= 6

    def test_neardup_band_derivation_and_validation(self, spark):
        import pytest

        from orange3_timeseries_spark.operators.multimodal import (
            image_neardup_pairs,
        )
        df = spark.createDataFrame([(1, bytearray(b"x"))],
                                   "doc_id long, image binary")
        with pytest.raises(ValueError, match="max_hamming"):
            image_neardup_pairs(df, "image", "doc_id", max_hamming=28)
        with pytest.raises(ValueError, match="max_hamming"):
            image_neardup_pairs(df, "image", "doc_id", max_hamming=-1)

    def test_metadata_and_resize_on_png(self, spark):
        import numpy as np

        from orange3_timeseries_spark.operators._png import (
            PNG_SIG,
            decode_png,
            encode_png,
        )
        from orange3_timeseries_spark.operators.multimodal import (
            image_metadata,
            resize_image,
        )
        rng = np.random.RandomState(9)
        rows = [(i, bytearray(encode_png(
            rng.randint(0, 256, size=(20 + i, 30 + i, 3), dtype=np.uint8))))
            for i in range(3)]
        df = spark.createDataFrame(rows, "doc_id long, image binary")
        metas = {r.doc_id: r.meta for r in
                 image_metadata(df, "image").collect()}
        assert metas[0].format == "PNG"
        assert (metas[1].width, metas[1].height) == (31, 21)
        small = resize_image(df, "image", (8, 8)).collect()
        for r in small:
            assert bytes(r.image[:8]) == PNG_SIG
            meta, px = decode_png(bytes(r.image))
            assert px.shape == (8, 8, 3)


class TestWav:
    def test_roundtrip_mono_and_stereo(self):
        import numpy as np

        from orange3_timeseries_spark.operators.multimodal import (
            decode_wav,
            encode_wav,
        )
        rng = np.random.RandomState(0)
        mono = rng.randint(-32768, 32768, size=500).astype(np.int16)
        meta, back = decode_wav(encode_wav(mono, 8000))
        assert meta == {"format": "WAV", "sample_rate": 8000,
                        "n_samples": 500, "channels": 1,
                        "duration_ms": 62}
        assert np.array_equal(back.astype(np.int16), mono)
        stereo = rng.randint(-32768, 32768, size=(300, 2)).astype(np.int16)
        meta2, back2 = decode_wav(encode_wav(stereo, 44100))
        assert meta2["channels"] == 2 and meta2["n_samples"] == 300
        assert np.array_equal(back2.astype(np.int16), stereo)

    def test_8bit_widening_and_errors(self):
        import numpy as np
        import pytest

        from orange3_timeseries_spark.operators.multimodal import (
            decode_audio,
            decode_wav,
            encode_fake_audio,
            encode_wav,
        )
        u8 = np.array([0, 128, 255], dtype=np.uint8)
        _, back = decode_wav(encode_wav(u8, 8000))
        assert list(back.astype(int)) == [-32768, 0, 32512]
        with pytest.raises(ValueError, match="not a RIFF"):
            decode_wav(b"JUNK" * 10)
        with pytest.raises(ValueError, match="unsupported audio"):
            decode_audio(b"OGGS" + b"\x00" * 40)
        # dispatch: FAUD still decodes through decode_audio
        meta, _ = decode_audio(encode_fake_audio(5, 8000, 100))
        assert meta["format"] == "FAUD"

    def test_audio_features_on_wav_matches_local(self, spark):
        import numpy as np

        from orange3_timeseries_spark.operators.multimodal import (
            audio_features,
            encode_wav,
        )
        rng = np.random.RandomState(4)
        clips = [rng.randint(-2000, 2000, size=400 + 50 * i)
                 .astype(np.int16) for i in range(4)]
        rows = [(i, bytearray(encode_wav(c, 8000)))
                for i, c in enumerate(clips)]
        df = spark.createDataFrame(rows, "doc_id long, audio binary")
        got = {r.doc_id: r.features for r in
               audio_features(df, "audio").collect()}
        for i, c in enumerate(clips):
            x = c.astype(np.float64)
            want = [float(np.sqrt(np.mean(x ** 2))), float(np.mean(x)),
                    float(np.mean(np.abs(np.diff(np.sign(x))) > 0)),
                    float(int(len(x) * 1000 / 8000))]
            assert np.allclose(got[i], want, rtol=1e-6)


class TestJpeg:
    """Pure-NumPy baseline JPEG codec + perceptual-tier integration."""

    @staticmethod
    def _smooth(h, w):
        import numpy as np
        yy, xx = np.mgrid[0:h, 0:w]
        return np.stack([
            (xx * 2 + yy) % 256,
            128 + 100 * np.sin(xx / 10.0),
            255 - ((xx + 2 * yy) % 256)], axis=-1).astype(np.uint8)

    def test_roundtrip_444_420_dri(self):
        import numpy as np

        from orange3_timeseries_spark.operators._jpeg import (
            decode_jpeg,
            encode_jpeg,
        )
        img = self._smooth(50, 70)
        for sub in ("444", "420"):
            for dri in (0, 3):
                meta, back = decode_jpeg(encode_jpeg(
                    img, quality=90, subsampling=sub,
                    restart_interval=dri))
                assert (meta["width"], meta["height"],
                        meta["channels"]) == (70, 50, 3)
                rmse = np.sqrt(((back.astype(float)
                                 - img.astype(float)) ** 2).mean())
                assert rmse < (1.5 if sub == "444" else 4.0), (sub, dri,
                                                               rmse)

    def test_grayscale_and_odd_dims(self):
        import numpy as np

        from orange3_timeseries_spark.operators._jpeg import (
            decode_jpeg,
            encode_jpeg,
        )
        yy, xx = np.mgrid[0:17, 0:23]
        g = ((xx + yy) % 256).astype(np.uint8)
        meta, back = decode_jpeg(encode_jpeg(g, quality=95))
        assert meta["channels"] == 1 and back.shape == (17, 23, 1)
        img = self._smooth(19, 21)
        meta2, back2 = decode_jpeg(encode_jpeg(img, quality=90,
                                               subsampling="420"))
        assert back2.shape == (19, 21, 3)

    def test_unsupported_progressive_raises(self):
        import pytest

        from orange3_timeseries_spark.operators._jpeg import (
            decode_jpeg,
            encode_jpeg,
        )
        p = bytearray(encode_jpeg(self._smooth(16, 16)))
        i = p.find(b"\xFF\xC0")
        p[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
        with pytest.raises(ValueError, match="non-baseline"):
            decode_jpeg(bytes(p))
        with pytest.raises(ValueError, match="not a JPEG"):
            decode_jpeg(b"JUNKJUNKJUNK")

    def test_premature_eoi_and_truncation_raise_valueerror(self):
        """The per-row failure contract is ValueError for EVERY corrupt
        stream — a premature EOI (lengthless marker) or a cut mid-header
        must never leak struct.error to callers that catch ValueError."""
        import pytest

        from orange3_timeseries_spark.operators._jpeg import (
            decode_jpeg,
            encode_jpeg,
        )
        good = encode_jpeg(self._smooth(16, 16))
        # premature EOI right after SOI: lengthless marker, then nothing
        with pytest.raises(ValueError):
            decode_jpeg(b"\xFF\xD8\xFF\xD9")
        # EOI spliced in before SOS: walk ends, fail-loud "no SOS"
        i = good.find(b"\xFF\xDA")
        with pytest.raises(ValueError, match="no SOS"):
            decode_jpeg(good[:i] + b"\xFF\xD9")
        # truncated mid-marker-header (marker byte present, no length)
        with pytest.raises(ValueError):
            decode_jpeg(good[:i + 2])
        # truncated inside a segment body (short DQT)
        j = good.find(b"\xFF\xDB")
        with pytest.raises(ValueError):
            decode_jpeg(good[:j + 6])

    def test_dispatch_and_metadata(self, spark):
        from orange3_timeseries_spark.operators._jpeg import encode_jpeg
        from orange3_timeseries_spark.operators.multimodal import (
            decode_image,
            image_metadata,
        )
        img = self._smooth(24, 32)
        meta, px = decode_image(encode_jpeg(img))
        assert meta["format"] == "JPEG" and px.shape == (24, 32, 3)
        df = spark.createDataFrame(
            [(1, bytearray(encode_jpeg(img)))],
            "doc_id long, image binary")
        [r] = image_metadata(df, "image").collect()
        assert r.meta.format == "JPEG"
        assert (r.meta.width, r.meta.height) == (32, 24)

    def test_neardup_finds_jpeg_reencode_across_formats(self, spark):
        """A JPEG re-encode of a PNG/FIMG image is the canonical
        near-duplicate (same picture, different container + lossy
        round) — dHash must land within a small Hamming distance."""
        import numpy as np

        from orange3_timeseries_spark.operators._jpeg import encode_jpeg
        from orange3_timeseries_spark.operators._png import encode_png
        from orange3_timeseries_spark.operators.multimodal import (
            image_neardup_pairs,
        )
        rng = np.random.RandomState(11)
        rows = []
        # low-frequency images: dHash is stable under JPEG loss
        for i in range(5):
            base = rng.randint(0, 9, size=(6, 6, 3))
            img = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8) * 28
            rows.append((i, bytearray(encode_png(img))))
            if i < 2:
                rows.append((100 + i,
                             bytearray(encode_jpeg(img, quality=90))))
        df = spark.createDataFrame(rows, "doc_id long, image binary")
        pairs = {(r.id_a, r.id_b): r.hamming for r in
                 image_neardup_pairs(df, "image", "doc_id",
                                     max_hamming=6).collect()}
        assert (0, 100) in pairs and pairs[(0, 100)] <= 6
        assert (1, 101) in pairs and pairs[(1, 101)] <= 6
        assert not any(a < 100 and b < 100 for a, b in pairs)


class TestGif:
    """Pure-stdlib GIF codec (LZW) + the real-container video tier."""

    def test_roundtrip_gray_palette_and_width_growth(self):
        import numpy as np

        from orange3_timeseries_spark.operators._gif import (
            decode_gif,
            encode_gif,
        )
        rng = np.random.RandomState(0)
        pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
        frames = rng.randint(0, 256, size=(5, 16, 16), dtype=np.uint8)
        meta, back = decode_gif(encode_gif(frames, pal))
        assert meta["n_frames"] == 5 and back.shape == (5, 16, 16, 3)
        assert np.array_equal(back[..., 0], frames)
        # large random frames force LZW code-width growth + clear codes
        big = rng.randint(0, 256, size=(2, 64, 128), dtype=np.uint8)
        _, b2 = decode_gif(encode_gif(big, pal))
        assert np.array_equal(b2[..., 0], big)
        # small palette maps through the color table
        pal4 = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0],
                         [0, 0, 255]], dtype=np.uint8)
        fr = rng.randint(0, 4, size=(3, 24, 17), dtype=np.uint8)
        _, b3 = decode_gif(encode_gif(fr, pal4))
        assert np.array_equal(b3, pal4[fr])

    def test_errors(self):
        import numpy as np
        import pytest

        from orange3_timeseries_spark.operators._gif import (
            decode_gif,
            encode_gif,
        )
        with pytest.raises(ValueError, match="not a GIF"):
            decode_gif(b"JUNKJUNKJUNK")
        with pytest.raises(ValueError, match="palette size"):
            encode_gif(np.zeros((1, 4, 4), np.uint8),
                       np.zeros((3, 3), np.uint8))
        p = bytearray(encode_gif(
            np.zeros((1, 8, 8), np.uint8),
            np.stack([np.arange(256)] * 3, 1).astype(np.uint8)))
        # the image descriptor follows the 8-byte graphic-control ext
        # (a bare 0x2C byte also occurs inside the grayscale palette,
        # so search for the GCE, not the descriptor byte)
        i = p.index(b"\x21\xF9") + 8
        assert p[i] == 0x2C
        p[i + 9] |= 0x40  # set interlace flag in the image descriptor
        with pytest.raises(ValueError, match="interlaced"):
            decode_gif(bytes(p))

    def test_video_signature_gif_equals_fvid(self, spark):
        """The GIF synthesis uses the FVID raster formula with a
        grayscale palette — signatures must be identical across the
        fake and real containers."""
        from orange3_timeseries_spark.operators.multimodal import (
            synthesize_gif_column,
            synthesize_video_column,
            video_signature,
        )
        base = spark.createDataFrame(
            [(i, 10 + 7 * i) for i in range(5)],
            "doc_id long, n_chars long")
        fvid = video_signature(
            synthesize_video_column(base, "doc_id", "n_chars"),
            "video", "doc_id")
        gif = video_signature(
            synthesize_gif_column(base, "doc_id", "n_chars"),
            "video", "doc_id")
        a = {r.doc_id: (r.f0, r.f1, r.f2, r.f3) for r in fvid.collect()}
        b = {r.doc_id: (r.f0, r.f1, r.f2, r.f3) for r in gif.collect()}
        assert a == b and len(a) == 5

    def test_sample_frames_on_gif(self, spark):
        import numpy as np

        from orange3_timeseries_spark.operators._gif import encode_gif
        from orange3_timeseries_spark.operators.multimodal import (
            decode_image,
            sample_frames,
        )
        rng = np.random.RandomState(2)
        pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
        frames = rng.randint(0, 256, size=(12, 10, 14), dtype=np.uint8)
        df = spark.createDataFrame(
            [(7, bytearray(encode_gif(frames, pal)))],
            "doc_id long, video binary")
        out = sample_frames(df, "video", "doc_id", every=5).collect()
        assert [r.frame_idx for r in out] == [0, 5, 10]
        for r in out:
            meta, px = decode_image(bytes(r.frame))
            assert (meta["width"], meta["height"],
                    meta["channels"]) == (14, 10, 3)
            assert np.array_equal(px[..., 0], frames[r.frame_idx])

    def test_transparency_composites_over_previous(self):
        import numpy as np

        from orange3_timeseries_spark.operators._gif import decode_gif
        # hand-assemble: frame 1 full red; frame 2 all-transparent
        # (index 1 marked transparent) -> second frame shows frame 1
        import struct

        from orange3_timeseries_spark.operators._gif import _lzw_encode
        pal = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
        out = bytearray(b"GIF89a")
        out += struct.pack("<HHBBB", 4, 4, 0x80 | 0, 0, 0)
        out += pal.tobytes()
        for idxval, transparent in ((0, None), (1, 1)):
            if transparent is not None:
                out += b"\x21\xF9\x04" + bytes([0x01, 0, 0,
                                                transparent]) + b"\x00"
            out += b"\x2C" + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
            out.append(2)
            data = _lzw_encode(np.full(16, idxval, np.uint8), 2)
            out.append(len(data))
            out += data
            out.append(0)
        out.append(0x3B)
        meta, frames = decode_gif(bytes(out))
        assert meta["n_frames"] == 2
        assert (frames[0] == [255, 0, 0]).all()
        assert (frames[1] == [255, 0, 0]).all()  # transparent -> prior


class TestSceneCuts:
    def test_cuts_at_scene_boundaries_only(self, spark):
        from orange3_timeseries_spark.operators.multimodal import (
            synthesize_scene_video_column,
            video_scene_cuts,
        )
        d = spark.createDataFrame([(1, 10), (2, 3)],
                                  "doc_id long, n_chars long")
        # nf = 10 + n_chars % 20 -> doc 1: 20 frames, doc 2: 13 frames
        vids = synthesize_scene_video_column(d, "doc_id", "n_chars")
        out = video_scene_cuts(vids, "video", "doc_id",
                               threshold=10).collect()
        for r in out:
            # scene structure: identical frames inside 5-frame scenes
            if r.frame_idx % 5 == 0:
                assert r.is_cut and r.hamming > 10, r
            else:
                assert not r.is_cut and r.hamming == 0, r
        # doc 1: frames 1..19 scored; cuts at 5, 10, 15
        d1 = [r for r in out if r.doc_id == 1]
        assert len(d1) == 19
        assert sorted(r.frame_idx for r in d1 if r.is_cut) == [5, 10, 15]

    def test_stride_and_corrupt_rows(self, spark):
        from orange3_timeseries_spark.operators.multimodal import (
            synthesize_scene_video_column,
            video_scene_cuts,
        )
        d = spark.createDataFrame([(1, 10)], "doc_id long, n_chars long")
        vids = synthesize_scene_video_column(d, "doc_id", "n_chars")
        strided = video_scene_cuts(vids, "video", "doc_id",
                                   threshold=10, stride=5).collect()
        # sampled frames 0,5,10,15: every consecutive pair crosses a
        # scene boundary -> every row is a cut
        assert [r.frame_idx for r in strided] == [5, 10, 15]
        assert all(r.is_cut for r in strided)
        # corrupt payload: row skipped, no job failure
        import pyspark.sql.functions as F
        bad = vids.withColumn(
            "video", F.when(F.col("doc_id") == 1,
                            F.lit(b"JUNK")).otherwise(F.col("video")))
        assert video_scene_cuts(bad, "video", "doc_id").count() == 0


class TestSilenceSpans:
    def test_known_segment_structure(self, spark):
        from orange3_timeseries_spark.operators.multimodal import (
            audio_silence_spans,
            synthesize_segment_audio_column,
        )
        # n_chars=250 -> n=1250 samples -> 5 frames of 250; segments of
        # 500 alternate quiet/loud: frames 0,1 quiet; 2,3 loud; 4 quiet
        d = spark.createDataFrame([(1, 250)], "doc_id long, n_chars long")
        auds = synthesize_segment_audio_column(d, "doc_id", "n_chars")
        out = sorted(audio_silence_spans(auds, "audio", "doc_id")
                     .collect(), key=lambda r: r.span_start_frame)
        assert [(r.span_start_frame, r.span_end_frame, r.n_frames)
                for r in out] == [(0, 2, 2), (4, 5, 1)]

    def test_wav_path_and_corrupt_rows(self, spark):
        import numpy as np

        from orange3_timeseries_spark.operators.multimodal import (
            audio_silence_spans,
            encode_wav,
        )
        # real WAV: 500 near-zero samples then 500 loud ones
        quiet = np.zeros(500, dtype=np.int16)
        rng = np.random.RandomState(0)
        loud = (rng.randint(-20000, 20000, 500)).astype(np.int16)
        wav = encode_wav(np.concatenate([quiet, loud]), 8000)
        df = spark.createDataFrame(
            [(1, bytearray(wav)), (2, bytearray(b"JUNK"))],
            "doc_id long, audio binary")
        out = audio_silence_spans(df, "audio", "doc_id", frame=250,
                                  rms_threshold=100.0).collect()
        assert [(r.doc_id, r.span_start_frame, r.span_end_frame)
                for r in out] == [(1, 0, 2)]  # corrupt row skipped

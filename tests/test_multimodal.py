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

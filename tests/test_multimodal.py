"""Multimodal plumbing tests: codec round-trips, mapInPandas schemas and
row fan-out, resize law, the real-decoder NotImplementedError seam, and
behavior across multiple input partitions (Arrow batch boundaries must not
change results)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_db_spark.operators.multimodal import (
    attach_audio,
    attach_images,
    attach_videos,
    audio_features,
    decode_audio_payload,
    decode_image_payload,
    decode_real_image,
    decode_video_payload,
    encode_audio,
    encode_image,
    encode_video,
    image_features,
    resize_images,
    sample_frames,
)


def test_codec_round_trips():
    img = decode_image_payload(encode_image(7, 4, 3, 3))
    assert img.shape == (3, 4, 3) and img.dtype == np.uint8
    vid = decode_video_payload(encode_video(7, 4, 3, 3, 5))
    assert vid.shape == (5, 3, 4, 3)
    rate, pcm = decode_audio_payload(encode_audio(7, 8000, 64))
    assert rate == 8000 and pcm.shape == (64,) and pcm.dtype == np.int16


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_pil_available(), reason="PIL present: seam is live")
def test_real_decoder_is_marked_unimplemented():
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_real_image(b"\x89PNG")


@pytest.mark.skipif(not _pil_available(), reason="PIL absent in this container")
def test_real_decoder_handles_png_bytes():
    """When PIL exists the seam is live: PNG bytes decode to the same
    (h, w, c) uint8 channel-last layout as the SYNTH codec."""
    import io

    from PIL import Image

    from vector_db_spark.operators.multimodal import decode_image

    arr = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    buf = io.BytesIO()
    Image.fromarray(arr, mode="RGB").save(buf, format="PNG")
    out = decode_image(buf.getvalue(), format="png")
    assert out.shape == (4, 6, 3) and out.dtype == np.uint8
    assert np.array_equal(out, arr)


def test_decode_image_dispatch_synth():
    from vector_db_spark.operators.multimodal import decode_image, encode_image

    data = encode_image(7, 5, 4, 3)
    out = decode_image(data, format="synth")
    assert out.shape == (4, 5, 3)


def test_image_features_schema_and_partition_invariance(spark):
    base = spark.range(20).select(F.col("id").alias("doc_id"))
    one = image_features(attach_images(base.coalesce(1))).collect()
    many = image_features(attach_images(base.repartition(7))).collect()
    assert {r.media_id: r.mean_px for r in one} == {
        r.media_id: r.mean_px for r in many
    }
    r0 = one[0]
    assert 0 <= r0.min_px <= r0.max_px <= 255
    assert r0.width == 16 and r0.height == 16


def test_resize_matches_numpy_reference(spark):
    base = spark.range(3).select(F.col("id").alias("doc_id"))
    media = attach_images(base, width=16, height=16, channels=3)
    resized = {r.media_id: bytes(r.data) for r in resize_images(media, 5, 5).collect()}
    for r in media.collect():
        src = decode_image_payload(bytes(r.data))
        ys = (np.arange(5, dtype=np.int64) * 16) // 5
        xs = (np.arange(5, dtype=np.int64) * 16) // 5
        want = src[np.ix_(ys, xs)]
        got = decode_image_payload(resized[r.media_id])
        assert np.array_equal(got, want)


def test_frame_sampling_fan_out(spark):
    base = spark.range(4).select(F.col("id").alias("doc_id"))
    vids = attach_videos(base, n_frames=12)
    rows = sample_frames(vids, every=4).collect()
    assert len(rows) == 4 * 3  # frames 0, 4, 8 per video
    assert sorted({r.frame for r in rows}) == [0, 4, 8]


def test_audio_features_values(spark):
    base = spark.range(2).select(F.col("id").alias("doc_id"))
    feats = {r.media_id: r for r in audio_features(attach_audio(base)).collect()}
    for mid, r in feats.items():
        _, pcm = decode_audio_payload(encode_audio(mid, 16000, 2048))
        x = pcm.astype(np.int64)
        assert r.rms == pytest.approx(float(np.sqrt((x * x).sum() / 2048)))
        nonneg = x >= 0
        assert r.zero_crossings == int((nonneg[1:] != nonneg[:-1]).sum())


def test_phash_identity_and_determinism(spark):
    """Same seed -> identical pHash; two computations agree."""
    from vector_db_spark.operators.multimodal import attach_noise_images, phash_images

    df = spark.createDataFrame([(1,), (2,), (1001,)], "doc_id long")
    seeded = df.withColumn("seed", F.col("doc_id") % 1000)  # 1 and 1001 collide
    media = attach_noise_images(seeded, seed_col="seed")
    h = {r.media_id: r.phash for r in phash_images(media).collect()}
    assert h[1] == h[1001]
    assert h[1] != h[2]
    h2 = {r.media_id: r.phash for r in phash_images(media).collect()}
    assert h == h2


def test_phash_brightness_invariance_and_structure(spark):
    """pHash ignores global brightness (median-threshold on AC-weighted
    coeffs) but tracks structure: a gradient and the same gradient
    brightened are ~0 bits apart; noise is ~32 bits from both."""
    import struct as _s

    import numpy as np

    from vector_db_spark.operators.multimodal import phash64

    # full-rank smooth image (every DCT coefficient well away from zero
    # — a 1-D gradient leaves most coeffs exactly 0, where float noise
    # flips sign bits and measures nothing)
    y, x = np.mgrid[0:32, 0:32].astype(np.float64)
    smooth = (
        96
        + 50 * np.sin(2 * np.pi * x / 17) * np.cos(2 * np.pi * y / 11)
        + 30 * np.sin(2 * np.pi * (x + y) / 23)
    )
    img_a = np.clip(smooth, 0, 255).astype(np.uint8)[:, :, None]
    img_b = np.clip(smooth + 40, 0, 255).astype(np.uint8)[:, :, None]
    rng = np.random.default_rng(5)
    img_n = rng.integers(0, 256, (32, 32, 1), dtype=np.uint8)

    def ham(x, y):
        return bin((x ^ y) & (2**64 - 1)).count("1")

    a, b, n = phash64(img_a), phash64(img_b), phash64(img_n)
    assert ham(a, b) <= 2
    assert ham(a, n) >= 20
    _ = _s  # imported for parity with payload-packing tests


def test_phash_blocking_equals_bruteforce(spark):
    """Pigeonhole chunk blocking finds EXACTLY the pairs a brute-force
    popcount over all pairs finds (completeness is the pigeonhole
    theorem; soundness is the verify filter)."""
    from vector_db_spark.operators.multimodal import (
        attach_noise_images,
        image_neardup,
        phash_images,
    )

    df = spark.range(40).selectExpr("id AS doc_id", "id % 25 AS seed")
    media = attach_noise_images(df, seed_col="seed")
    got = sorted(
        (r.a_id, r.b_id, r.hamming)
        for r in image_neardup(media, max_hamming=3, chunks=4).collect()
    )
    hashes = {r.media_id: r.phash for r in phash_images(media).collect()}
    brute = sorted(
        (a, b, bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1"))
        for a in hashes
        for b in hashes
        if a < b and bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1") <= 3
    )
    assert got == brute
    assert len(got) >= 15  # the %25 seed fold plants 15 exact-dup pairs


def test_phash_validation(spark):
    from vector_db_spark.operators.multimodal import phash_images

    df = spark.createDataFrame([(1,)], "doc_id long")
    from vector_db_spark.operators.multimodal import attach_noise_images

    media = attach_noise_images(df)
    with pytest.raises(ValueError, match="hash_size"):
        phash_images(media, hash_size=4).collect()


def test_audio_fingerprint_volume_invariance(spark):
    """Scaling amplitude rescales every DCT coefficient and the median
    together — the fingerprint is volume-invariant; independent noise is
    far away."""
    import numpy as np

    from vector_db_spark.operators.multimodal import afp64

    rng = np.random.default_rng(11)
    base = rng.integers(-8000, 8000, 2048).astype(np.int64)
    loud = np.clip(base * 3, -32768, 32767)
    other = rng.integers(-8000, 8000, 2048).astype(np.int64)

    def ham(x, y):
        return bin((x ^ y) & (2**64 - 1)).count("1")

    a, b, n = afp64(base), afp64(loud), afp64(other)
    assert ham(a, b) <= 4
    assert ham(a, n) >= 20


def test_video_neardup_frame_alignment(spark):
    """Identical videos match on every sampled frame; a video whose
    frames are someone else's SHIFTED by one frame index must NOT match
    (candidates are frame-aligned)."""
    import struct as _s

    import numpy as np

    from vector_db_spark.operators.multimodal import (
        attach_noise_videos,
        video_neardup,
    )

    df = spark.createDataFrame([(1, 7), (2, 7), (3, 8)], "doc_id long, seed long")
    media = attach_noise_videos(df, seed_col="seed", width=32, height=32)
    got = video_neardup(media, every=4).collect()
    assert [(r.a_id, r.b_id, r.matched_frames) for r in got] == [(1, 2, 3)]
    _ = (_s, np)

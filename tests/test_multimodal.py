"""Multimodal: header decode real; PNG pixel path REAL (from-scratch
codec); JPEG/GIF pixel work stays gated."""

import pytest

from jarvis_ocr_service_spark.functions.multimodal import (
    resize_images,
    sample_frames,
    with_image_meta,
)
from jarvis_ocr_service_spark.sources.pages import synthesize_pages


@pytest.fixture(scope="module")
def pages(spark):
    return synthesize_pages(spark, 50, num_partitions=2).cache()


def test_image_meta_decode(pages):
    out = with_image_meta(pages).collect()
    assert len(out) == 50
    pngs = [r for r in out if r.image_meta.format == "png"]
    assert pngs  # class 3 rows
    for r in pngs:
        assert r.image_meta.width == 1 and r.image_meta.height == 1
        assert r.image_meta.bit_depth == 8 and r.image_meta.color_type == 2
    non_images = [r for r in out if r.image_meta.format is None]
    assert all(r.image_meta.width is None for r in non_images)
    assert all(r.image_meta.n_bytes == (len(r.html) if r.html else 0) for r in out)


def test_resize_real_for_png_null_for_undecodable(pages):
    """PNG rows get a REAL nearest-neighbor resize (decode -> resample ->
    re-encode, all from-scratch); non-PNG rows yield null without a
    backend — never a task failure."""
    from jarvis_ocr_service_spark.operators.png_codec import decode_png_pixels

    out = resize_images(pages, width=32, height=32, fake=False).collect()
    assert len(out) == 50
    png_rows = [r for r in out if r.html and bytes(r.html).startswith(b"\x89PNG")]
    assert png_rows
    for r in png_rows:
        arr = decode_png_pixels(bytes(r.resized))
        assert arr.shape == (32, 32, 3)
        assert (arr == 255).all()  # the 1x1 white fixture upsampled
    for r in out:
        if r not in png_rows and not (
            r.html and bytes(r.html).startswith(b"\x89PNG")
        ):
            assert r.resized is None


def test_resize_real_gradient_content(spark):
    """Resize a real multi-pixel image and check actual pixel content."""
    import numpy as np

    from jarvis_ocr_service_spark.operators.png_codec import (
        decode_png_pixels,
        encode_png_pixels,
    )

    grad = np.stack(
        [np.tile(np.arange(0, 256, 32, dtype=np.uint8), (8, 1))] * 3, axis=-1
    )  # 8x8 horizontal gradient
    df = spark.createDataFrame([(encode_png_pixels(grad),)], "html binary")
    r = resize_images(df, width=4, height=4).collect()[0]
    arr = decode_png_pixels(bytes(r.resized))
    # nearest-neighbor with center mapping picks columns 1,3,5,7
    assert arr.shape == (4, 4, 3)
    assert [int(v) for v in arr[0, :, 0]] == [32, 96, 160, 224]


def test_pixel_stats_real(pages):
    from jarvis_ocr_service_spark.functions.multimodal import with_pixel_stats

    out = with_pixel_stats(pages).collect()
    png = [r for r in out if r.pixel_stats.px_width is not None]
    assert png  # class-3 rows decoded
    for r in png:
        assert (r.pixel_stats.px_width, r.pixel_stats.px_height,
                r.pixel_stats.channels) == (1, 1, 3)
        assert r.pixel_stats.mean_intensity == 255.0  # white pixel
    assert any(r.pixel_stats.px_width is None for r in out)  # non-PNG rows


def test_resize_fake_plumbing(pages):
    """fake=True keeps the deterministic fake for NON-PNG payloads (PNG
    rows now take the real path even in fake mode)."""
    base = pages.filter(
        "html IS NULL OR substring(hex(html), 1, 8) != '89504E47'"
    )
    out = resize_images(base, width=32, height=32, fake=True).collect()
    assert out
    for r in out:
        assert r.out_width == 32 and r.out_height == 32
        assert len(r.resized) == 64  # md5*4
        assert r.url  # passthrough preserved


def test_sample_frames_fake_expands_rows(pages):
    base = pages.limit(10)
    out = sample_frames(base, fake=True).collect()
    assert len(out) >= 10  # row-expanding
    for r in out:
        assert r.frame_idx >= 0 and len(r.frame) == 16


def test_audio_features_real_wav_decode(spark):
    """Real WAV decode (stdlib wave): header metadata + RMS; non-audio
    payloads yield a null struct, never a task failure."""
    from jarvis_ocr_service_spark.functions.multimodal import (
        decode_wav_features,
        make_test_wav,
        with_audio_features,
    )

    w1 = make_test_wav(440.0, 8000)                 # 1s A4 tone
    w2 = make_test_wav(220.0, 4000, amplitude=0.1)  # 0.5s quiet tone
    df = spark.createDataFrame(
        [(0, bytearray(w1)), (1, bytearray(w2)), (2, b"<html>nope</html>"),
         (3, None)],
        "i long, html binary",
    )
    got = {r.i: r.audio_features for r in with_audio_features(df).collect()}
    assert (got[0].sample_rate, got[0].channels, got[0].bits,
            got[0].n_frames, got[0].duration_s) == (8000, 1, 16, 8000, 1.0)
    assert got[1].duration_s == 0.5
    assert got[0].rms > got[1].rms > 0  # louder tone has higher RMS
    assert got[2].sample_rate is None and got[3].sample_rate is None
    # Spark-side values match the scalar decode exactly
    exp = decode_wav_features(w1)
    assert got[0].rms == exp["rms"]

"""Multimodal plumbing: header decode real, pixel stubs gated."""

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


def test_resize_stub_raises_without_backend(pages):
    with pytest.raises(Exception) as exc:
        resize_images(pages, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or "backend" in str(exc.value)


def test_resize_fake_plumbing(pages):
    out = resize_images(pages.limit(10), width=32, height=32, fake=True).collect()
    assert len(out) == 10
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

"""From-scratch PNG pixel codec: roundtrip, all five scanline filters,
resampling, and explicit unsupported-layout rejection."""

import struct
import zlib

import numpy as np
import pytest

from jarvis_ocr_service_spark.operators.png_codec import (
    decode_png_pixels,
    encode_png_pixels,
    png_pixel_stats,
    resize_nearest,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    cd = ctype + data
    return (
        struct.pack(">I", len(data)) + cd
        + struct.pack(">I", zlib.crc32(cd) & 0xFFFFFFFF)
    )


def _encode_with_filter(arr: np.ndarray, ftype: int) -> bytes:
    """Reference encoder applying one scanline filter everywhere — used to
    prove the decoder reverses each filter type exactly."""
    h, w, ch = arr.shape
    stride = w * ch
    rows = []
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        row = arr[y].reshape(-1).astype(np.int16)
        f = row.copy()
        for x in range(stride):
            a = int(row[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if ftype == 1:
                f[x] = (row[x] - a) & 0xFF
            elif ftype == 2:
                f[x] = (row[x] - b) & 0xFF
            elif ftype == 3:
                f[x] = (row[x] - ((a + b) >> 1)) & 0xFF
            elif ftype == 4:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                f[x] = (row[x] - pred) & 0xFF
        rows.append(bytes([ftype]) + bytes(f.astype(np.uint8)))
        prev = row
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )


def test_roundtrip_all_channel_counts():
    rng = np.random.default_rng(7)
    for shape in [(1, 1, 3), (5, 7, 3), (8, 8, 1), (4, 3, 4), (6, 2, 2)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert (decode_png_pixels(encode_png_pixels(arr)) == arr).all(), shape


def test_all_five_scanline_filters_decode_exactly():
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(9, 6, 3), dtype=np.uint8)
    for ftype in range(5):
        got = decode_png_pixels(_encode_with_filter(arr, ftype))
        assert (got == arr).all(), f"filter {ftype}"


def test_fixture_png_decodes_white_pixel():
    from jarvis_ocr_service_spark.sources.pages import _PNG_BYTES

    arr = decode_png_pixels(_PNG_BYTES)
    assert arr.shape == (1, 1, 3) and (arr == 255).all()
    assert png_pixel_stats(_PNG_BYTES) == (1, 1, 3, 255.0)


def test_resize_nearest_center_mapping():
    grad = np.stack(
        [np.tile(np.arange(0, 256, 32, dtype=np.uint8), (8, 1))] * 3, axis=-1
    )
    small = resize_nearest(grad, 4, 4)
    assert [int(v) for v in small[0, :, 0]] == [32, 96, 160, 224]
    big = resize_nearest(grad, 16, 2)
    assert big.shape == (2, 16, 3)


def test_unsupported_layouts_rejected():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png_pixels(b"\xff\xd8\xffjpeg")
    # 16-bit depth rejected, never misdecoded
    hdr16 = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00\xff\xff\xff\xff\xff\xff"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png_pixels(hdr16)
    with pytest.raises(ValueError):
        encode_png_pixels(np.zeros((2, 2, 5), dtype=np.uint8))


def test_roundtrip_property_random_arrays():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        ch=st.sampled_from([1, 2, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
    )
    def inner(h, w, ch, seed):
        arr = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, ch), dtype=np.uint8
        )
        assert (decode_png_pixels(encode_png_pixels(arr)) == arr).all()

    inner()

"""From-scratch PNG pixel codec (stdlib zlib + numpy — no imaging libs).

The sandbox has no PIL/imageio, but PNG itself is only zlib over
per-scanline filtered bytes, so the *pixel* path can be fully real for PNG
payloads: decode -> (H, W, C) uint8 array, encode back, and resample with
plain numpy indexing. This upgrades the multimodal resize/feature path
from a declared stub to a working implementation for the format the page
fixtures actually use; JPEG/GIF pixel decode stays import-gated (a DCT
decoder is out of scope).

Scope (rejected with ValueError, never wrong pixels):
  * bit depth 8 only;
  * color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA);
  * no interlacing (Adam7), no palette (type 3).

Decode handles all five scanline filters (None/Sub/Up/Average/Paeth) per
the PNG spec; encode writes filter 0 rows (valid, simple, deterministic).
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Tuple

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunks(payload: bytes):
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[
            pos + 4 : pos + 8
        ]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def decode_png_pixels(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array. ValueError on unsupported
    layouts or malformed data — callers treat that as 'not decodable',
    never as pixels."""
    if not payload.startswith(_MAGIC):
        raise ValueError("not a PNG payload")
    width = height = None
    bit_depth = color_type = interlace = None
    idat: List[bytes] = []
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat.append(data)
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    if bit_depth != 8:
        raise ValueError(f"unsupported bit depth {bit_depth}")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    if interlace:
        raise ValueError("interlaced PNG unsupported")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += stride + 1
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub — sequentially dependent in x
            for x in range(ch, stride):
                row[x] = (int(row[x]) + int(row[x - ch])) & 0xFF
        elif ftype == 2:  # Up
            row = (row.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - ch]) if x >= ch else 0
                row[x] = (row[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - ch]) if x >= ch else 0
                c = int(prev[x - ch]) if x >= ch else 0
                b = int(prev[x])
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown scanline filter {ftype}")
        out[y] = row
        prev = row
    return out.reshape(height, width, ch)


def encode_png_pixels(arr: np.ndarray) -> bytes:
    """(H, W, C) uint8 array -> PNG bytes (bit depth 8, filter-0 rows)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype != np.uint8 or arr.ndim != 3:
        raise ValueError("need (H, W, C) uint8")
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        cd = ctype + data
        return (
            struct.pack(">I", len(data))
            + cd
            + struct.pack(">I", zlib.crc32(cd) & 0xFFFFFFFF)
        )

    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
    rows = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    idat = chunk(b"IDAT", zlib.compress(rows))
    return _MAGIC + ihdr + idat + chunk(b"IEND", b"")


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample (center-of-pixel mapping)."""
    h, w = arr.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return arr[ys][:, xs]


def png_pixel_stats(payload: bytes) -> Tuple[int, int, int, float]:
    """(width, height, channels, mean_intensity) — a real pixel feature."""
    arr = decode_png_pixels(payload)
    h, w, ch = arr.shape
    return w, h, ch, float(arr.mean())

"""Dependency-free PNG codec (8-bit gray/gray+alpha/RGB/RGBA).

The multimodal operators (operators/multimodal.py) need a real image
decode in CI, but no imaging library ships in this container. PNG is
a public spec (RFC 2083) whose baseline is just zlib — stdlib — plus
per-scanline byte filters, so the codec is implemented directly:

- :func:`encode_png` — any of the five filter types per line (the
  encoder is what lets tests exercise every decode branch);
- :func:`decode_png` — CRC-checked chunk walk, all five filters.

Not supported (raises): bit depths other than 8, palette images,
interlacing. Executors call these per row inside mapInPandas; both
are pure functions of their inputs, so task retries re-produce
identical bytes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_COLOR_TO_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_CHANNELS_TO_COLOR = {1: 0, 2: 4, 3: 2, 4: 6}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_line(ftype: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    if ftype == 0:
        return line
    out = bytearray(len(line))
    for x in range(len(line)):
        a = line[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            pred = _paeth(a, b, c)
        out[x] = (line[x] - pred) & 0xFF
    return bytes(out)


def _unfilter_line(
    ftype: int, line: bytearray, prev: bytes, bpp: int
) -> bytearray:
    if ftype == 0:
        return line
    for x in range(len(line)):
        a = line[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        line[x] = (line[x] + pred) & 0xFF
    return line


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 array (H,W) or (H,W,C) with C∈{1,2,3,4} → PNG bytes."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color = _CHANNELS_TO_COLOR[c]
    stride = w * c
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = a[y].tobytes()
        raw += bytes([filter_type]) + _filter_line(
            filter_type, line, prev, c
        )
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (H,W,C). CRC-checked; all 5 filters.
    Malformed input raises ValueError (never zlib.error/struct.error/
    IndexError), so the mapInPandas per-row fallback catches it."""
    if not data or not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG byte stream")
    try:
        return _decode_png_inner(data)
    except (struct.error, zlib.error, IndexError) as exc:
        raise ValueError(f"corrupt PNG stream: {exc}") from exc


# decode-bomb guard for untrusted bytes: a corrupt IHDR can claim
# 4Gx4G pixels; cap before allocating (2^26 px ≈ 200 MB RGB).
_MAX_PIXELS = 1 << 26


def _decode_png_inner(data: bytes) -> np.ndarray:
    pos = len(PNG_MAGIC)
    idat = bytearray()
    w = h = depth = color = interlace = None
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    if w * h > _MAX_PIXELS:
        raise ValueError(f"PNG canvas too large ({w}x{h})")
    if depth != 8 or color not in _COLOR_TO_CHANNELS or interlace:
        raise NotImplementedError(
            f"unsupported PNG (depth={depth}, color={color}, "
            f"interlace={interlace}); baseline 8-bit only"
        )
    c = _COLOR_TO_CHANNELS[color]
    stride = w * c
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytes(stride)
    for y in range(h):
        off = y * (stride + 1)
        line = _unfilter_line(
            raw[off], bytearray(raw[off + 1 : off + 1 + stride]), prev, c
        )
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = bytes(line)
    return out.reshape(h, w, c)


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an (H,W,C) array — index math
    only, exact and deterministic."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys][:, xs]

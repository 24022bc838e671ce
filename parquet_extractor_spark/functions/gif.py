"""Dependency-free GIF codec (87a/89a, real LZW).

Palette-indexed raster with genuine LZW compression — the fourth real
image decode path in the multimodal pipeline (after PNG, baseline
JPEG, and BMP) and the only one exercising a dictionary coder. Pure
Python/numpy; no PIL (absent from this container).

Decoder: header + logical screen descriptor, global/local color
tables, extension-block skipping (GCE/comment/application), full LZW
with code-width growth and table reset, interlace de-pass. Animated
streams decode to their FIRST frame (frame iteration is the video
sampling path's job). Encoder: non-interlaced single frame with a
real compressing LZW (dictionary build, 12-bit cap, clear-code
reset) — decode(encode(x)) round-trips bit-exactly, and the decode
side's table-growth path is exercised by actual compressed input.

Scope boundary: pixels must fit a 256-color palette to ENCODE (GIF is
palette-indexed by definition — callers quantize first); DECODE
handles any conformant non-animated frame.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")
_MAX_CODE_WIDTH = 12


def is_gif(data: bytes | None) -> bool:
    return bool(data) and data[:6] in GIF_MAGICS


# ---------------------------------------------------------------- LZW


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    buf = b""
    for idx in indices.tolist():
        cand = buf + bytes([idx])
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        elif next_code > (1 << _MAX_CODE_WIDTH) - 1:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        buf = bytes([idx])
    if buf:
        emit(table[buf])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW code {code}")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


# ------------------------------------------------------------- codec


def encode_gif(arr: np.ndarray) -> bytes:
    """(H,W,3) uint8 RGB (≤256 distinct colors) -> GIF89a bytes."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_gif expects (H,W,3) uint8")
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"GIF needs ≤256 distinct colors, got {len(palette)} — "
            "quantize before encoding"
        )
    depth = max(1, int(len(palette) - 1).bit_length())
    table_size = 1 << depth
    gct = np.zeros((table_size, 3), dtype=np.uint8)
    gct[: len(palette)] = palette
    out = bytearray()
    out += b"GIF89a"
    # logical screen descriptor: GCT present, depth bits
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0)
    out += gct.tobytes()
    # image descriptor (no local table, no interlace)
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code_size = max(2, depth)
    out.append(min_code_size)
    compressed = _lzw_encode(indices.astype(np.uint8), min_code_size)
    for i in range(0, len(compressed), 255):
        block = compressed[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00"  # block terminator
    out += b"\x3B"  # trailer
    return bytes(out)


def _deinterlace(img: np.ndarray) -> np.ndarray:
    h = img.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(img)
    out[order] = img
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> (H,W,3) uint8 RGB of the first frame. Malformed
    or truncated input raises ValueError (never struct.error /
    IndexError), so the mapInPandas feature path's per-row fallback
    catches it."""
    if not is_gif(data):
        raise ValueError("not a GIF stream")
    try:
        return _decode_gif_inner(data)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt GIF stream: {exc}") from exc


def _decode_gif_inner(data: bytes) -> np.ndarray:
    pos = 6
    _sw, _sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, pos)
    pos += 7
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            break
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        _x, _y, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if table is None:
            raise ValueError("GIF image has no color table")
        min_code_size = data[pos]
        pos += 1
        chunks = bytearray()
        while data[pos]:
            ln = data[pos]
            chunks += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        indices = _lzw_decode(bytes(chunks), min_code_size, w * h)
        img = table[indices.reshape(h, w)]
        if iflags & 0x40:
            img = _deinterlace(img)
        return np.ascontiguousarray(img)
    raise ValueError("GIF stream contains no image data")

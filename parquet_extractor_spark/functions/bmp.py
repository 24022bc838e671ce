"""Dependency-free BMP codec (24-bit uncompressed BI_RGB).

The simplest real raster container: BITMAPFILEHEADER (14 bytes) +
BITMAPINFOHEADER (40 bytes) + bottom-up BGR rows padded to 4-byte
boundaries. Gives the multimodal pipeline a third real image decode
path (after PNG/JPEG) with zero compression machinery — useful as the
"known-trivial" control format when debugging the mapInPandas decode
stage. Pure numpy + struct; no external libraries (the container has
no PIL).

Scope: 24 bpp BI_RGB only — the overwhelming majority of real .bmp
files. Other depths/compressions raise ValueError with the reason.
"""

from __future__ import annotations

import struct

import numpy as np

BMP_MAGIC = b"BM"

_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, size, res1, res2, offset
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")


def is_bmp(data: bytes | None) -> bool:
    return bool(data) and data[:2] == BMP_MAGIC


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H,W,3) uint8 RGB -> 24-bit BMP bytes."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp expects (H,W,3) uint8")
    h, w = arr.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # bottom-up rows, BGR channel order, padded
    bgr = arr[::-1, :, ::-1]
    body = bytearray()
    for row in bgr:
        body += row.tobytes()
        body += b"\x00" * pad
    offset = _FILE_HEADER.size + _INFO_HEADER.size
    info = _INFO_HEADER.pack(
        _INFO_HEADER.size, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    head = _FILE_HEADER.pack(BMP_MAGIC, offset + len(body), 0, 0, offset)
    return head + info + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (H,W,3) uint8 RGB. Malformed or
    truncated input raises ValueError (never struct.error/IndexError),
    so the mapInPandas feature path's per-row fallback catches it."""
    if not is_bmp(data):
        raise ValueError("not a BMP stream")
    try:
        return _decode_bmp_inner(data)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt BMP stream: {exc}") from exc


def _decode_bmp_inner(data: bytes) -> np.ndarray:
    magic, _size, _r1, _r2, offset = _FILE_HEADER.unpack_from(data, 0)
    (
        hdr_size,
        w,
        h,
        _planes,
        bpp,
        compression,
        _img_size,
        _xppm,
        _yppm,
        _clr_used,
        _clr_imp,
    ) = _INFO_HEADER.unpack_from(data, _FILE_HEADER.size)
    if hdr_size < _INFO_HEADER.size:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24bpp BI_RGB supported (got bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    if len(data) < offset + stride * h:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=offset
    ).reshape(h, stride)[:, :row_bytes]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)

"""Dependency-free APNG (animated PNG) codec.

The second REAL animated format through the r06 frame-sampling path
(after GIF): acTL/fcTL/fdAT chunk semantics per the public APNG
specification, composited with both blend operations
(SOURCE replaces the region, OVER alpha-composites non-premultiplied
RGBA) and all three dispose operations (NONE, BACKGROUND — clear the
region to fully-transparent black, PREVIOUS — roll the canvas back).
Frame regions are themselves zlib/filtered PNG image data, so decode
reuses ``functions/png.py`` wholesale: each frame's fdAT payload is
re-wrapped as a standalone one-frame PNG and fed to ``decode_png``;
the encoder runs ``encode_png`` per region and lifts out its IDAT.

Encoder: acTL + per-frame fcTL delays, frame 0 full-canvas, later
frames as diff-bounding-box sub-rects (the same optimizer shape the
GIF animation encoder uses), sequence numbers shared across
fcTL/fdAT per spec. Pure stdlib/numpy.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from parquet_extractor_spark.functions.png import (
    PNG_MAGIC,
    _chunk,
    decode_png,
    encode_png,
)

_MAX_CANVAS_PIXELS = 1 << 26  # decode-bomb guard, as in png/gif/vp8l

# fcTL dispose / blend operations (APNG spec).
APNG_DISPOSE_NONE = 0
APNG_DISPOSE_BACKGROUND = 1
APNG_DISPOSE_PREVIOUS = 2
APNG_BLEND_SOURCE = 0
APNG_BLEND_OVER = 1


def _iter_chunks(data: bytes):
    pos = len(PNG_MAGIC)
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError("truncated PNG chunk")
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        yield tag, payload
        pos += 12 + length
        if tag == b"IEND":
            break


def is_apng(data: bytes | None) -> bool:
    """PNG magic plus an acTL chunk before the first IDAT."""
    if not data or not data.startswith(PNG_MAGIC):
        return False
    try:
        for tag, _payload in _iter_chunks(data):
            if tag == b"acTL":
                return True
            if tag == b"IDAT":
                return False
    except (ValueError, struct.error):
        return False
    return False


def _to_rgba(region: np.ndarray) -> np.ndarray:
    if region.ndim == 2:
        region = region[:, :, None]
    c = region.shape[2]
    h, w = region.shape[:2]
    out = np.empty((h, w, 4), dtype=np.uint8)
    if c == 1:
        out[:, :, :3] = region
        out[:, :, 3] = 255
    elif c == 2:
        out[:, :, :3] = region[:, :, :1]
        out[:, :, 3] = region[:, :, 1]
    elif c == 3:
        out[:, :, :3] = region
        out[:, :, 3] = 255
    else:
        out[:] = region
    return out


def _blend_over(dst: np.ndarray, src: np.ndarray) -> np.ndarray:
    """Non-premultiplied OVER with float math and round-half-up — the
    spec's compositing formula on 8-bit channels."""
    sa = src[:, :, 3:4].astype(np.float64) / 255.0
    da = dst[:, :, 3:4].astype(np.float64) / 255.0
    oa = sa + da * (1.0 - sa)
    sc = src[:, :, :3].astype(np.float64)
    dc = dst[:, :, :3].astype(np.float64)
    num = sc * sa + dc * da * (1.0 - sa)
    with np.errstate(invalid="ignore", divide="ignore"):
        oc = np.where(oa > 0, num / np.where(oa > 0, oa, 1.0), 0.0)
    out = np.empty_like(dst)
    out[:, :, :3] = np.floor(oc + 0.5).astype(np.uint8)
    out[:, :, 3:4] = np.floor(oa * 255.0 + 0.5).astype(np.uint8)
    return out


def decode_apng_frames(data: bytes) -> list[tuple[int, np.ndarray]]:
    """APNG bytes -> [(delay_ms, (H,W,4) RGBA canvas), ...] with full
    fcTL semantics. Raises ValueError on malformed input — never
    struct.error/zlib.error/IndexError (the decode_png wrapper
    contract; the r12 bit-flip fuzz caught a truncated-CRC slice
    reaching struct.unpack here)."""
    if not data or not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG byte stream")
    try:
        return _decode_apng_frames_inner(data)
    except (struct.error, zlib.error, IndexError) as exc:
        raise ValueError(f"corrupt APNG stream: {exc}") from exc


def _decode_apng_frames_inner(data: bytes) -> list[tuple[int, np.ndarray]]:
    ihdr = None
    frames: list[dict] = []
    cur: dict | None = None
    seen_idat = False
    default_is_frame = False
    expected_seq = 0
    for tag, payload in _iter_chunks(data):
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"fcTL":
            if len(payload) != 26:
                raise ValueError("bad fcTL length")
            (seq, fw, fh, x0, y0, dnum, dden, dispose, blend) = struct.unpack(
                ">IIIIIHHBB", payload
            )
            if seq != expected_seq:
                raise ValueError("APNG sequence numbers out of order")
            expected_seq += 1
            cur = {
                "w": fw, "h": fh, "x": x0, "y": y0,
                "delay_num": dnum, "delay_den": dden,
                "dispose": dispose, "blend": blend, "data": bytearray(),
            }
            frames.append(cur)
            if not seen_idat:
                default_is_frame = True
        elif tag == b"IDAT":
            seen_idat = True
            if default_is_frame:
                frames[0]["data"] += payload
        elif tag == b"fdAT":
            if len(payload) < 4:
                raise ValueError("bad fdAT length")
            (seq,) = struct.unpack(">I", payload[:4])
            if seq != expected_seq:
                raise ValueError("APNG sequence numbers out of order")
            expected_seq += 1
            if cur is None:
                raise ValueError("fdAT before any fcTL")
            cur["data"] += payload[4:]
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    if not frames:
        raise ValueError("APNG has no fcTL frames")
    w, h, depth, color, comp, filt, interlace = ihdr
    if w * h > _MAX_CANVAS_PIXELS:
        raise ValueError(f"APNG canvas too large ({w}x{h})")
    canvas = np.zeros((h, w, 4), dtype=np.uint8)
    out: list[tuple[int, np.ndarray]] = []
    for k, f in enumerate(frames):
        fw, fh, x0, y0 = f["w"], f["h"], f["x"], f["y"]
        if x0 + fw > w or y0 + fh > h:
            raise ValueError("APNG frame rect exceeds canvas")
        if not f["data"]:
            raise ValueError("APNG frame has no image data")
        mini = (
            PNG_MAGIC
            + _chunk(
                b"IHDR",
                struct.pack(">IIBBBBB", fw, fh, depth, color, comp, filt, interlace),
            )
            + _chunk(b"IDAT", bytes(f["data"]))
            + _chunk(b"IEND", b"")
        )
        region = _to_rgba(decode_png(mini))
        dispose = f["dispose"]
        if k == 0 and dispose == APNG_DISPOSE_PREVIOUS:
            dispose = APNG_DISPOSE_BACKGROUND  # spec: first-frame rule
        prev = canvas.copy() if dispose == APNG_DISPOSE_PREVIOUS else None
        rect = canvas[y0 : y0 + fh, x0 : x0 + fw]
        if f["blend"] == APNG_BLEND_SOURCE:
            rect[:] = region
        elif f["blend"] == APNG_BLEND_OVER:
            rect[:] = _blend_over(rect, region)
        else:
            raise ValueError(f"unknown APNG blend op {f['blend']}")
        dnum, dden = f["delay_num"], f["delay_den"] or 100
        out.append((round(1000 * dnum / dden), canvas.copy()))
        if dispose == APNG_DISPOSE_BACKGROUND:
            canvas[y0 : y0 + fh, x0 : x0 + fw] = 0
        elif dispose == APNG_DISPOSE_PREVIOUS:
            canvas = prev
    return out


def _idat_payload(png_bytes: bytes) -> bytes:
    body = bytearray()
    for tag, payload in _iter_chunks(png_bytes):
        if tag == b"IDAT":
            body += payload
    return bytes(body)


def encode_apng(
    frames: list[np.ndarray],
    delays_ms: list[int] | int = 100,
    num_plays: int = 0,
    optimize_subrects: bool = True,
) -> bytes:
    """Same-shape (H,W,3|4) uint8 frames -> APNG bytes: acTL, fcTL
    per frame (delay as n/1000), frame 0 full canvas as the default
    image, later frames as diff-bounding-box fdAT sub-rects with
    blend SOURCE / dispose NONE."""
    if not frames:
        raise ValueError("need at least one frame")
    base = frames[0]
    for f in frames:
        if f.shape != base.shape or f.dtype != np.uint8:
            raise ValueError("all frames must be same-shape uint8")
    if isinstance(delays_ms, int):
        delays_ms = [delays_ms] * len(frames)
    if len(delays_ms) != len(frames):
        raise ValueError("one delay per frame required")
    h, w = base.shape[:2]
    color = 2 if base.shape[2] == 3 else 6
    seq = 0

    def fctl(fw, fh, x0, y0, delay):
        nonlocal seq
        payload = struct.pack(
            ">IIIIIHHBB", seq, fw, fh, x0, y0, delay, 1000,
            APNG_DISPOSE_NONE, APNG_BLEND_SOURCE,
        )
        seq += 1
        return _chunk(b"fcTL", payload)

    out = bytearray()
    out += PNG_MAGIC
    out += _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    )
    out += _chunk(b"acTL", struct.pack(">II", len(frames), num_plays))
    out += fctl(w, h, 0, 0, delays_ms[0])
    out += _chunk(b"IDAT", _idat_payload(encode_png(base)))
    for k in range(1, len(frames)):
        f = frames[k]
        if optimize_subrects:
            changed = (f != frames[k - 1]).any(axis=2)
            ys, xs = np.nonzero(changed)
            if ys.size == 0:
                x0 = y0 = 0
                rect = f[:1, :1]
            else:
                y0, y1 = int(ys.min()), int(ys.max()) + 1
                x0, x1 = int(xs.min()), int(xs.max()) + 1
                rect = f[y0:y1, x0:x1]
        else:
            x0 = y0 = 0
            rect = f
        out += fctl(rect.shape[1], rect.shape[0], x0, y0, delays_ms[k])
        body = _idat_payload(encode_png(np.ascontiguousarray(rect)))
        out += _chunk(b"fdAT", struct.pack(">I", seq) + body)
        seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)

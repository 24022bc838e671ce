"""Dependency-free GIF codec (87a/89a, real LZW, real animation).

Palette-indexed raster with genuine LZW compression — the fourth real
image decode path in the multimodal pipeline (after PNG, baseline
JPEG, and BMP) and the only one exercising a dictionary coder. Pure
Python/numpy; no PIL (absent from this container).

Decoder: header + logical screen descriptor, global/local color
tables, full LZW with code-width growth and table reset, interlace
de-pass. Since r06 ANIMATED streams decode for real too
(``decode_gif_frames``): Graphic Control Extension state (delay,
transparent index, disposal method), sub-rectangle frames composited
onto the logical screen, and all three disposal methods (keep /
restore-background / restore-previous) per the GIF89a spec.
``decode_gif`` stays the cheap first-frame path. Encoder:
non-interlaced frames with a real compressing LZW (dictionary build,
12-bit cap, clear-code reset) — decode(encode(x)) round-trips
bit-exactly — plus ``encode_gif_animation``: NETSCAPE looping
extension, per-frame delays, diff-bounding-box sub-rect frames with
transparent unchanged pixels (the classic GIF optimizer), which is
exactly the stream shape that exercises the compositing decoder.

Scope boundary: pixels must fit a 256-color palette to ENCODE (GIF is
palette-indexed by definition — callers quantize first); DECODE
handles any conformant frame sequence.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")
_MAX_CODE_WIDTH = 12
# decode-bomb guard for untrusted bytes inside mapInPandas tasks: a
# flipped header byte must not allocate a 65535x65535 canvas (12 GB)
# before the bitstream parse has a chance to fail. 2^26 px ≈ 200 MB
# RGB — far above any real GIF, far below an executor OOM.
_MAX_CANVAS_PIXELS = 1 << 26


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


def encode_gif_animation(
    frames: list[np.ndarray],
    delays_ms: list[int] | int = 100,
    loop: int = 0,
    optimize_subrects: bool = True,
) -> bytes:
    """Same-size (H,W,3) uint8 frames -> animated GIF89a bytes.

    Real animation encode: NETSCAPE2.0 looping extension, per-frame
    Graphic Control Extensions carrying the delays, and — the classic
    GIF optimizer, which is also exactly what exercises the
    compositing decoder — every frame after the first is emitted as
    the diff bounding box against the previous canvas with unchanged
    pixels inside the box marked transparent (disposal method 1).
    One global color table over all frames; one palette slot is
    reserved for the transparency index."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != frames[0].shape or f.dtype != np.uint8:
            raise ValueError("all frames must be same-shape uint8")
    if isinstance(delays_ms, int):
        delays_ms = [delays_ms] * len(frames)
    if len(delays_ms) != len(frames):
        raise ValueError("one delay per frame required")
    all_px = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(all_px, axis=0, return_inverse=True)
    if len(palette) > 255:
        raise ValueError(
            f"animated GIF needs ≤255 distinct colors (one slot is "
            f"reserved for transparency), got {len(palette)}"
        )
    transparent_idx = len(palette)
    depth = max(1, int(transparent_idx).bit_length())
    table_size = 1 << depth
    gct = np.zeros((table_size, 3), dtype=np.uint8)
    gct[: len(palette)] = palette
    frame_idx = inverse.reshape(len(frames), h, w).astype(np.uint8)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack(
        "<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0
    )
    out += gct.tobytes()
    # NETSCAPE2.0 application extension: loop count (0 = forever)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    min_code_size = max(2, depth)
    for k, idx in enumerate(frame_idx):
        use_transparency = False
        if k == 0 or not optimize_subrects:
            x0, y0, rect = 0, 0, idx
        else:
            changed = idx != frame_idx[k - 1]
            ys, xs = np.nonzero(changed)
            if ys.size == 0:
                # identical frame: 1x1 fully-transparent rect keeps
                # the stream conformant and the delay visible
                x0, y0 = 0, 0
                rect = np.full((1, 1), transparent_idx, dtype=np.uint8)
                use_transparency = True
            else:
                y0, y1 = int(ys.min()), int(ys.max()) + 1
                x0, x1 = int(xs.min()), int(xs.max()) + 1
                rect = idx[y0:y1, x0:x1].copy()
                box_changed = changed[y0:y1, x0:x1]
                if not box_changed.all():
                    rect[~box_changed] = transparent_idx
                    use_transparency = True
        delay_cs = max(0, delays_ms[k]) // 10
        packed = (1 << 2) | (1 if use_transparency else 0)  # disposal 1
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB",
            packed,
            delay_cs,
            transparent_idx if use_transparency else 0,
        ) + b"\x00"
        rh, rw = rect.shape
        out += b"\x2c" + struct.pack("<HHHHB", x0, y0, rw, rh, 0)
        out.append(min_code_size)
        compressed = _lzw_encode(rect.reshape(-1), min_code_size)
        for i in range(0, len(compressed), 255):
            block = compressed[i : i + 255]
            out.append(len(block))
            out += block
        out += b"\x00"
    out += b"\x3b"
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
    """GIF bytes -> (H,W,3) uint8 RGB of the first frame (the cheap
    path the feature/resize pipeline uses — the frame walk is lazy,
    so animated inputs don't pay for their tail). Malformed or
    truncated input raises ValueError (never struct.error /
    IndexError), so the mapInPandas feature path's per-row fallback
    catches it."""
    for _delay, frame in _iter_frames_checked(data):
        return frame
    raise ValueError("GIF stream contains no image data")


def decode_gif_frames(data: bytes) -> list[tuple[int, np.ndarray]]:
    """Full animation decode: [(delay_ms, (H,W,3) canvas), ...] with
    GIF89a compositing semantics — sub-rectangle frames drawn onto
    the logical screen, transparent pixels leaving the canvas
    untouched, and disposal methods 1 (keep), 2 (restore background)
    and 3 (restore previous) applied between frames."""
    frames = list(_iter_frames_checked(data))
    if not frames:
        raise ValueError("GIF stream contains no image data")
    return frames


def _iter_frames_checked(data: bytes):
    if not is_gif(data):
        raise ValueError("not a GIF stream")
    try:
        yield from _iter_frames(data)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt GIF stream: {exc}") from exc


def _iter_frames(data: bytes):
    pos = 6
    sw, sh, flags, bg, _ar = struct.unpack_from("<HHBBB", data, pos)
    pos += 7
    if sw * sh > _MAX_CANVAS_PIXELS:
        raise ValueError(f"GIF logical screen too large ({sw}x{sh})")
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    if gct is not None and bg < len(gct):
        bg_color = gct[bg]
    else:
        bg_color = np.zeros(3, dtype=np.uint8)
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bg_color
    # pending Graphic Control Extension state (applies to the next
    # image only, then resets)
    delay_ms = 0
    transparent_idx: int | None = None
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9 and data[pos] == 4:  # Graphic Control
                packed, delay_cs, tidx = struct.unpack_from(
                    "<BHB", data, pos + 1
                )
                disposal = (packed >> 2) & 0x7
                transparent_idx = tidx if packed & 0x1 else None
                delay_ms = delay_cs * 10
            while data[pos]:  # skip sub-blocks (incl. the GCE body)
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        x, y, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if x + w > sw or y + h > sh:
            raise ValueError("GIF frame rect exceeds logical screen")
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
        indices = _lzw_decode(bytes(chunks), min_code_size, w * h).reshape(h, w)
        if iflags & 0x40:
            indices = _deinterlace(indices)
        if int(indices.max(initial=0)) >= len(table):
            raise ValueError("GIF index outside color table")
        prev_canvas = canvas.copy() if disposal == 3 else None
        rect = canvas[y : y + h, x : x + w]
        if transparent_idx is None:
            rect[:] = table[indices]
        else:
            mask = indices != transparent_idx
            rect[mask] = table[indices[mask]]
        yield (delay_ms, canvas.copy())
        if disposal == 2:
            canvas[y : y + h, x : x + w] = bg_color
        elif disposal == 3:
            canvas = prev_canvas
        delay_ms = 0
        transparent_idx = None
        disposal = 0

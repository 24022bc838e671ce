"""Dependency-free TIFF header parsing (metadata level).

Same treatment the r06 header pass gives WebP/MP4/WebM: the IFD walk
(both byte orders, 42 magic, chained IFDs for multi-page files) is
parsed for real from the public TIFF 6.0 specification, yielding the
fields a curation pipeline filters on — dimensions, samples/alpha,
page count — without touching strip data. Pixel DECODE stays a
declared boundary (TIFF's compression zoo — LZW, PackBits, JPEG-in-
TIFF, Deflate — plus planar configs is Pillow's job in production;
the header pass is what a 100 TB pre-filter actually runs).

Layout facts used (all from the spec): ``II``/``MM`` byte-order mark,
u16 magic 42, u32 first-IFD offset; each IFD is u16 entry-count,
12-byte entries (tag u16, type u16, count u32, 4 value/offset bytes —
value inline when its byte size fits in 4), u32 next-IFD offset.
Tags: 256 ImageWidth, 257 ImageLength, 258 BitsPerSample,
277 SamplesPerPixel, 338 ExtraSamples (alpha).
"""

from __future__ import annotations

import struct

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 8: 2, 9: 4}
_MAX_PAGES = 4096  # cycle guard on the next-IFD chain


def is_tiff(data: bytes | None) -> bool:
    return (
        data is not None
        and len(data) >= 8
        and (
            (data[:2] == b"II" and data[2:4] == b"\x2a\x00")
            or (data[:2] == b"MM" and data[2:4] == b"\x00\x2a")
        )
    )


def _read_entry_value(data: bytes, off: int, endian: str) -> int | None:
    """First value of one IFD entry for integer types (inline or via
    offset)."""
    typ, count = struct.unpack_from(endian + "HI", data, off + 2)
    size = _TYPE_SIZES.get(typ)
    if size is None or count < 1:
        return None
    total = size * count
    if total <= 4:
        voff = off + 8
    else:
        (voff,) = struct.unpack_from(endian + "I", data, off + 8)
    if voff + size > len(data):
        return None
    fmt = {1: "B", 2: "B", 3: "H", 4: "I", 6: "b", 7: "B", 8: "h", 9: "i"}[typ]
    return struct.unpack_from(endian + fmt, data, voff)[0]


def tiff_metadata(data: bytes) -> tuple[str, int, int, bool, int]:
    """Parse (variant, width, height, has_alpha, n_pages) from the
    IFD chain. ``variant`` is ``le``/``be``. Raises ValueError on
    malformed input — callers map that to NULL metadata columns."""
    if not is_tiff(data):
        raise ValueError("not a TIFF stream")
    endian = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(endian + "I", data, 4)
    width = height = None
    has_alpha = False
    n_pages = 0
    seen = set()
    while ifd_off:
        if ifd_off in seen or n_pages >= _MAX_PAGES:
            raise ValueError("TIFF IFD chain cycles")
        seen.add(ifd_off)
        if ifd_off + 2 > len(data):
            raise ValueError("truncated TIFF IFD")
        (n_entries,) = struct.unpack_from(endian + "H", data, ifd_off)
        end = ifd_off + 2 + 12 * n_entries
        if end + 4 > len(data):
            raise ValueError("truncated TIFF IFD entries")
        samples = None
        for i in range(n_entries):
            off = ifd_off + 2 + 12 * i
            (tag,) = struct.unpack_from(endian + "H", data, off)
            if n_pages == 0 and tag == 256:
                width = _read_entry_value(data, off, endian)
            elif n_pages == 0 and tag == 257:
                height = _read_entry_value(data, off, endian)
            elif n_pages == 0 and tag == 277:
                samples = _read_entry_value(data, off, endian)
            elif n_pages == 0 and tag == 338:
                has_alpha = True
        if n_pages == 0 and samples == 4:
            has_alpha = True
        n_pages += 1
        (ifd_off,) = struct.unpack_from(endian + "I", data, end)
    if width is None or height is None:
        raise ValueError("TIFF missing dimension tags")
    return ("le" if endian == "<" else "be", width, height, has_alpha, n_pages)


def _read_entry_values(
    data: bytes, off: int, endian: str
) -> list[int] | None:
    """All values of one integer-typed IFD entry."""
    typ, count = struct.unpack_from(endian + "HI", data, off + 2)
    size = _TYPE_SIZES.get(typ)
    if size is None or count < 1:
        return None
    total = size * count
    voff = off + 8 if total <= 4 else struct.unpack_from(endian + "I", data, off + 8)[0]
    if voff + total > len(data):
        return None
    fmt = {1: "B", 2: "B", 3: "H", 4: "I", 6: "b", 7: "B", 8: "h", 9: "i"}[typ]
    return list(struct.unpack_from(endian + fmt * count, data, voff))


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits RLE (TIFF compression 32773)."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(data):
                raise ValueError("truncated PackBits run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("PackBits stream too short")
    return bytes(out[:expected])


TIFF_COMPRESSION_NONE = 1
TIFF_COMPRESSION_PACKBITS = 32773


def decode_tiff(data: bytes):
    """Decode the FIRST page of an 8-bit chunky TIFF to an (H, W, C)
    uint8 array. Real pixels for uncompressed (1) and PackBits
    (32773) strips — the baseline encodings the spec requires every
    reader to support; LZW/Deflate/JPEG-in-TIFF remain the declared
    Pillow boundary (NotImplementedError). Malformed input raises
    ValueError."""
    import numpy as np

    if not is_tiff(data):
        raise ValueError("not a TIFF stream")
    endian = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(endian + "I", data, 4)
    if ifd_off + 2 > len(data):
        raise ValueError("truncated TIFF IFD")
    (n_entries,) = struct.unpack_from(endian + "H", data, ifd_off)
    if ifd_off + 2 + 12 * n_entries + 4 > len(data):
        raise ValueError("truncated TIFF IFD entries")
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        (tag,) = struct.unpack_from(endian + "H", data, off)
        if tag in (256, 257, 258, 259, 273, 277, 278, 279, 284):
            vals = _read_entry_values(data, off, endian)
            if vals is None:
                raise ValueError(f"bad TIFF entry for tag {tag}")
            tags[tag] = vals
    try:
        w, h = tags[256][0], tags[257][0]
        offsets, counts = tags[273], tags[279]
    except KeyError as exc:
        raise ValueError(f"TIFF missing required tag {exc}") from exc
    samples = tags.get(277, [1])[0]
    bits = tags.get(258, [8])
    compression = tags.get(259, [1])[0]
    planar = tags.get(284, [1])[0]
    rows_per_strip = tags.get(278, [h])[0] or h
    if any(b != 8 for b in bits) or samples not in (1, 3, 4):
        raise NotImplementedError(
            "only 8-bit grayscale/RGB/RGBA TIFF decodes here"
        )
    if planar != 1:
        raise NotImplementedError("planar TIFF needs Pillow")
    if compression not in (TIFF_COMPRESSION_NONE, TIFF_COMPRESSION_PACKBITS):
        raise NotImplementedError(
            f"TIFF compression {compression} (LZW/Deflate/JPEG) needs Pillow"
        )
    if w * h > (1 << 26):  # decode-bomb guard, as in png/gif/vp8l
        raise ValueError(f"TIFF image too large ({w}x{h})")
    if len(offsets) != len(counts):
        raise ValueError("TIFF strip offset/count mismatch")
    rows = bytearray()
    remaining = h
    for s, (o, c) in enumerate(zip(offsets, counts)):
        if o + c > len(data):
            raise ValueError("TIFF strip out of bounds")
        strip_rows = min(rows_per_strip, remaining)
        expected = strip_rows * w * samples
        raw = data[o : o + c]
        if compression == TIFF_COMPRESSION_PACKBITS:
            raw = _packbits_decode(raw, expected)
        if len(raw) < expected:
            raise ValueError("TIFF strip shorter than its rows")
        rows += raw[:expected]
        remaining -= strip_rows
    if remaining > 0:
        raise ValueError("TIFF strips do not cover the image")
    arr = np.frombuffer(bytes(rows), dtype=np.uint8).reshape(h, w, samples)
    return arr[:, :, 0:1].repeat(3, axis=2) if samples == 1 else arr


def build_tiff_image(
    arr,
    endian: str = "le",
    compression: int = TIFF_COMPRESSION_NONE,
    rows_per_strip: int = 8,
) -> bytes:
    """(H, W, 1|3|4) uint8 array -> real striped 8-bit chunky TIFF
    (uncompressed or PackBits)."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    e = "<" if endian == "le" else ">"
    bom = b"II\x2a\x00" if endian == "le" else b"MM\x00\x2a"
    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = a[y0 : y0 + rows_per_strip].tobytes()
        if compression == TIFF_COMPRESSION_PACKBITS:
            raw = _packbits_encode(raw)
        strips.append(raw)
    n_strips = len(strips)
    tags = [
        (256, 4, 1, [w]),
        (257, 4, 1, [h]),
        (258, 3, c, [8] * c),
        (259, 3, 1, [compression]),
        (262, 3, 1, [1 if c == 1 else 2]),  # photometric
        (273, 4, n_strips, None),  # patched below
        (277, 3, 1, [c]),
        (278, 4, 1, [rows_per_strip]),
        (279, 4, n_strips, [len(s) for s in strips]),
    ]
    header = bytearray(bom + struct.pack(e + "I", 8))
    ifd = bytearray(struct.pack(e + "H", len(tags)))
    # layout: header(8) + IFD + next-ptr + overflow area + strips
    ifd_size = 2 + 12 * len(tags) + 4
    overflow = bytearray()
    overflow_base = 8 + ifd_size

    def value_bytes(typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        return b"".join(struct.pack(e + fmt, v) for v in vals)

    entries = []
    for tag, typ, count, vals in tags:
        entries.append([tag, typ, count, vals])
    # strip offsets need the final layout; compute after overflow of
    # other tags is known — do two passes
    for pass_no in range(2):
        ifd = bytearray(struct.pack(e + "H", len(tags)))
        overflow = bytearray()
        data_base = None
        if pass_no == 1:
            data_base = overflow_base + len(prev_overflow)
            offs = []
            pos = data_base
            for s in strips:
                offs.append(pos)
                pos += len(s)
        for tag, typ, count, vals in entries:
            if tag == 273:
                vals = offs if pass_no == 1 else [0] * count
            vb = value_bytes(typ, vals)
            if len(vb) <= 4:
                packed = vb + b"\x00" * (4 - len(vb))
            else:
                packed = struct.pack(e + "I", overflow_base + len(overflow))
                overflow += vb
            ifd += struct.pack(e + "HHI", tag, typ, count) + packed
        ifd += struct.pack(e + "I", 0)  # no next IFD
        prev_overflow = overflow
    return bytes(header + ifd + overflow + b"".join(strips))


def _packbits_encode(raw: bytes) -> bytes:
    """Simple PackBits encoder: runs >= 3 become replicate packets,
    everything else literal packets (max 128 each)."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        run = 1
        while i + run < n and raw[i + run] == raw[i] and run < 128:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(raw[i])
            i += run
        else:
            lit_start = i
            i += run
            while i < n and run < 128:
                nxt = 1
                while i + nxt < n and raw[i + nxt] == raw[i] and nxt < 128:
                    nxt += 1
                if nxt >= 3:
                    break
                i += nxt
                run += nxt
            chunk = raw[lit_start : lit_start + min(run, 128)]
            i = lit_start + len(chunk)
            out.append(len(chunk) - 1)
            out += chunk
    return bytes(out)


def build_tiff(
    width: int,
    height: int,
    endian: str = "le",
    pages: int = 1,
    samples: int = 3,
    extra_alpha: bool = False,
    payload_bytes: int = 32,
) -> bytes:
    """Spec-valid header-only TIFF for the metadata fixture: one IFD
    per page carrying the dimension/sample tags and a filler strip
    body the parser must never read."""
    e = "<" if endian == "le" else ">"
    bom = b"II\x2a\x00" if endian == "le" else b"MM\x00\x2a"
    out = bytearray(bom)
    out += struct.pack(e + "I", 8)  # first IFD right after header
    filler = bytes((11 * i + 5) % 256 for i in range(payload_bytes))
    for p in range(pages):
        tags = [
            (256, 4, 1, width),
            (257, 4, 1, height),
            (258, 3, 1, 8),
            (277, 3, 1, samples),
        ]
        if extra_alpha:
            tags.append((338, 3, 1, 1))
        tags.sort()
        ifd_off = len(out)
        out += struct.pack(e + "H", len(tags))
        for tag, typ, count, value in tags:
            if typ == 3:
                packed = struct.pack(e + "H", value) + b"\x00\x00"
            else:
                packed = struct.pack(e + "I", value)
            out += struct.pack(e + "HHI", tag, typ, count) + packed
        # next-IFD pointer: patched after we know where the filler ends
        next_ptr_at = len(out)
        out += struct.pack(e + "I", 0)
        out += filler
        if p < pages - 1:
            struct.pack_into(e + "I", out, next_ptr_at, len(out))
    return bytes(out)

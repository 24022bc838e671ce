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

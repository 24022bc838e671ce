"""Dependency-free TIFF header parsing (metadata level).

Same treatment the r06 header pass gives WebP/MP4/WebM: the IFD walk
(both byte orders, 42 magic, chained IFDs for multi-page files) is
parsed for real from the public TIFF 6.0 specification, yielding the
fields a curation pipeline filters on — dimensions, samples/alpha,
page count — without touching strip data. Pixel DECODE is real for
8-bit chunky strips in every mainstream encoding — uncompressed,
PackBits, LZW (TIFF 6.0 §13 early-change flavor), Deflate (8 and
legacy 32946), with Predictor 2 undone — and new-style JPEG-in-TIFF
(compression 7, shared JPEGTables spliced per strip) since late r06,
plus PlanarConfiguration-2 per-plane strip groups, plus BOTH
old-style JPEG (6) layouts: the interchange form (tags 513/514 point
at one complete stream) and the deprecated §22 strip form (raw
zigzag/BITS+values tables behind tags 519/520/521, bare entropy data
in strips, headers rebuilt per strip). TILED layout (tags 322-325 —
the GeoTIFF/pyramid shape) decodes and encodes for every lossless
compression plus TTN2 JPEG tiles, with spec-mandated padded edge
tiles cropped on assembly. BigTIFF (magic 43, u64 offsets, 20-byte
IFD entries, LONG8 types) reads through the same walks and writes
via ``build_tiff_image(bigtiff=True)`` — both the pixel decoder and
the header-only metadata pass. The CCITT fax family stays
the declared Pillow boundary (its MH run-length code tables cannot
be safely reproduced from memory — the JPEG-arithmetic QM-coder
decision applied to fax); the header pass remains what a 100 TB
pre-filter actually runs before spending any decode CPU.

Layout facts used (all from the spec): ``II``/``MM`` byte-order mark,
u16 magic 42, u32 first-IFD offset; each IFD is u16 entry-count,
12-byte entries (tag u16, type u16, count u32, 4 value/offset bytes —
value inline when its byte size fits in 4), u32 next-IFD offset.
Tags: 256 ImageWidth, 257 ImageLength, 258 BitsPerSample,
277 SamplesPerPixel, 338 ExtraSamples (alpha).
"""

from __future__ import annotations

import struct

_TYPE_SIZES = {
    1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 8: 2, 9: 4,
    16: 8, 17: 8, 18: 8,  # BigTIFF LONG8 / SLONG8 / IFD8
}
_MAX_PAGES = 4096  # cycle guard on the next-IFD chain


def is_tiff(data: bytes | None) -> bool:
    """Classic TIFF (magic 42) or BigTIFF (magic 43), either order."""
    return (
        data is not None
        and len(data) >= 8
        and (
            (data[:2] == b"II" and data[2:4] in (b"\x2a\x00", b"\x2b\x00"))
            or (data[:2] == b"MM" and data[2:4] in (b"\x00\x2a", b"\x00\x2b"))
        )
    )


def _header_geometry(data: bytes, endian: str) -> tuple[bool, int]:
    """(is_bigtiff, first_ifd_offset). BigTIFF (magic 43) carries a
    u16 offset size (must be 8) + u16 reserved zero, then a u64
    first-IFD pointer; classic carries a u32 pointer at byte 4."""
    (magic,) = struct.unpack_from(endian + "H", data, 2)
    if magic == 42:
        return False, struct.unpack_from(endian + "I", data, 4)[0]
    if magic != 43:
        raise ValueError(f"bad TIFF magic {magic}")
    if len(data) < 16:
        raise ValueError("truncated BigTIFF header")
    osz, zero = struct.unpack_from(endian + "HH", data, 4)
    if osz != 8 or zero != 0:
        raise ValueError("bad BigTIFF offset geometry")
    return True, struct.unpack_from(endian + "Q", data, 8)[0]


def _read_entry_value(
    data: bytes, off: int, endian: str, big: bool = False
) -> int | None:
    """First value of one IFD entry for integer types (inline or via
    offset; BigTIFF entries carry u64 counts and 8-byte value slots)."""
    cfmt, inline, vfmt = ("HQ", 8, "Q") if big else ("HI", 4, "I")
    typ, count = struct.unpack_from(endian + cfmt, data, off + 2)
    size = _TYPE_SIZES.get(typ)
    if size is None or count < 1:
        return None
    total = size * count
    if total <= inline:
        voff = off + (12 if big else 8)
    else:
        (voff,) = struct.unpack_from(
            endian + vfmt, data, off + (12 if big else 8)
        )
    if voff + size > len(data):
        return None
    fmt = {
        1: "B", 2: "B", 3: "H", 4: "I", 6: "b", 7: "B", 8: "h", 9: "i",
        16: "Q", 17: "q", 18: "Q",
    }[typ]
    return struct.unpack_from(endian + fmt, data, voff)[0]


def tiff_metadata(data: bytes) -> tuple[str, int, int, bool, int]:
    """Parse (variant, width, height, has_alpha, n_pages) from the
    IFD chain. ``variant`` is ``le``/``be``. Raises ValueError on
    malformed input — callers map that to NULL metadata columns."""
    if not is_tiff(data):
        raise ValueError("not a TIFF stream")
    endian = "<" if data[:2] == b"II" else ">"
    big, ifd_off = _header_geometry(data, endian)
    hsz, esz, nfmt, pfmt = (8, 20, "Q", "Q") if big else (2, 12, "H", "I")
    width = height = None
    has_alpha = False
    n_pages = 0
    seen = set()
    while ifd_off:
        if ifd_off in seen or n_pages >= _MAX_PAGES:
            raise ValueError("TIFF IFD chain cycles")
        seen.add(ifd_off)
        if ifd_off + hsz > len(data):
            raise ValueError("truncated TIFF IFD")
        (n_entries,) = struct.unpack_from(endian + nfmt, data, ifd_off)
        if n_entries > 65535:
            raise ValueError("implausible TIFF IFD entry count")
        end = ifd_off + hsz + esz * n_entries
        if end + struct.calcsize(pfmt) > len(data):
            raise ValueError("truncated TIFF IFD entries")
        samples = None
        for i in range(n_entries):
            off = ifd_off + hsz + esz * i
            (tag,) = struct.unpack_from(endian + "H", data, off)
            if n_pages == 0 and tag == 256:
                width = _read_entry_value(data, off, endian, big)
            elif n_pages == 0 and tag == 257:
                height = _read_entry_value(data, off, endian, big)
            elif n_pages == 0 and tag == 277:
                samples = _read_entry_value(data, off, endian, big)
            elif n_pages == 0 and tag == 338:
                has_alpha = True
        if n_pages == 0 and samples == 4:
            has_alpha = True
        n_pages += 1
        (ifd_off,) = struct.unpack_from(endian + pfmt, data, end)
    if width is None or height is None:
        raise ValueError("TIFF missing dimension tags")
    return ("le" if endian == "<" else "be", width, height, has_alpha, n_pages)


def _read_entry_values(
    data: bytes, off: int, endian: str, big: bool = False
) -> list[int] | None:
    """All values of one integer-typed IFD entry (classic 12-byte or
    BigTIFF 20-byte layout)."""
    cfmt, inline, vfmt = ("HQ", 8, "Q") if big else ("HI", 4, "I")
    typ, count = struct.unpack_from(endian + cfmt, data, off + 2)
    size = _TYPE_SIZES.get(typ)
    if size is None or count < 1 or count > 1_000_000:
        return None
    total = size * count
    base = off + (12 if big else 8)
    voff = (
        base
        if total <= inline
        else struct.unpack_from(endian + vfmt, data, base)[0]
    )
    if voff + total > len(data):
        return None
    fmt = {
        1: "B", 2: "B", 3: "H", 4: "I", 6: "b", 7: "B", 8: "h", 9: "i",
        16: "Q", 17: "q", 18: "Q",
    }[typ]
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


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-flavor LZW (compression 5), TIFF 6.0 §13: MSB-first bit
    packing, ClearCode 256, EOI 257, first dynamic code 258, and the
    spec's "early change" — code width grows one code EARLIER than
    classic LZW. The decoder lags the encoder's table by one entry,
    so its width bump fires when the table reaches 2^n - 2 entries
    past the fixed 258 (i.e. len(table) == 510/1022/2046), which
    pairs exactly with an encoder bumping at NextCode == 511/1023/
    2047 (2^n - 1). Round-trip property-tested against _lzw_encode.
    """
    out = bytearray()
    table: list[bytes] = []
    nbits = 9
    prev: bytes | None = None
    acc = nacc = i = 0
    CLEAR, EOI = 256, 257

    def reset() -> None:
        nonlocal table, nbits, prev
        table = [bytes([j]) for j in range(256)] + [b"", b""]
        nbits = 9
        prev = None

    reset()
    while len(out) < expected:
        while nacc < nbits:
            if i >= len(data):
                raise ValueError("truncated LZW stream")
            acc = (acc << 8) | data[i]
            i += 1
            nacc += 8
        code = (acc >> (nacc - nbits)) & ((1 << nbits) - 1)
        nacc -= nbits
        acc &= (1 << nacc) - 1  # keep the int small (O(1) bit ops)
        if code == CLEAR:
            reset()
            continue
        if code == EOI:
            break
        if prev is None:
            if code > 255:
                raise ValueError("first LZW code after clear not a literal")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW code beyond table")
            if len(table) >= (1 << nbits) - 2 and nbits < 12:
                nbits += 1
        out += entry
        prev = entry
    if len(out) < expected:
        raise ValueError("LZW stream too short")
    return bytes(out[:expected])


def _lzw_encode(raw: bytes) -> bytes:
    """Matching TIFF LZW encoder: starts with ClearCode, re-clears
    when NextCode hits 4094 (spec mandate), ends with EOI; width
    bumps at NextCode == 2^n - 1 (early change)."""
    out = bytearray()
    acc = nacc = 0

    def put(code: int, nbits: int) -> None:
        nonlocal acc, nacc
        acc = (acc << nbits) | code
        nacc += nbits
        while nacc >= 8:
            out.append((acc >> (nacc - 8)) & 0xFF)
            nacc -= 8
            acc &= (1 << nacc) - 1

    CLEAR, EOI = 256, 257
    table: dict[bytes, int] = {}
    next_code = 258
    nbits = 9

    def reset() -> None:
        nonlocal table, next_code, nbits
        table = {bytes([j]): j for j in range(256)}
        next_code = 258
        nbits = 9

    put(CLEAR, 9)
    reset()
    omega = b""
    for b in raw:
        cand = omega + bytes([b])
        if cand in table:
            omega = cand
            continue
        put(table[omega], nbits)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << nbits) - 1 and nbits < 12:
            nbits += 1
        omega = bytes([b])
        if next_code >= 4094:
            put(CLEAR, nbits)
            reset()
    if omega:
        put(table[omega], nbits)
    put(EOI, nbits)
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def _undo_predictor2(strip: bytes, w: int, samples: int):
    """TIFF Predictor 2 (tag 317, horizontal differencing): each
    sample stores the delta to its left neighbour; undo is a modular
    cumulative sum along the row, per channel."""
    import numpy as np

    a = np.frombuffer(strip, dtype=np.uint8).reshape(-1, w, samples)
    return np.cumsum(a, axis=1, dtype=np.uint8).tobytes()


def _apply_predictor2(strip: bytes, w: int, samples: int) -> bytes:
    import numpy as np

    a = np.frombuffer(strip, dtype=np.uint8).reshape(-1, w, samples)
    d = a.copy()
    d[:, 1:, :] -= a[:, :-1, :]
    return d.tobytes()


TIFF_COMPRESSION_NONE = 1
TIFF_COMPRESSION_LZW = 5
TIFF_COMPRESSION_JPEG_OLD = 6  # deprecated TIFF 6.0 §22 JPEG
TIFF_COMPRESSION_JPEG = 7  # "new-style" JPEG-in-TIFF (TTN2)
TIFF_COMPRESSION_DEFLATE = 8  # "Adobe" deflate; 32946 is the old tag
TIFF_COMPRESSION_DEFLATE_OLD = 32946
TIFF_COMPRESSION_PACKBITS = 32773


def _decompress_lossless(raw: bytes, expected: int, compression: int) -> bytes:
    """The lossless strip/tile payload decoders, shared by the strip
    and tile assembly paths."""
    if compression == TIFF_COMPRESSION_PACKBITS:
        return _packbits_decode(raw, expected)
    if compression == TIFF_COMPRESSION_LZW:
        return _lzw_decode(raw, expected)
    if compression in (
        TIFF_COMPRESSION_DEFLATE,
        TIFF_COMPRESSION_DEFLATE_OLD,
    ):
        import zlib

        try:
            return zlib.decompress(raw)
        except zlib.error as exc:
            raise ValueError(f"bad TIFF deflate block: {exc}") from exc
    return raw


def _decode_tiled(data: bytes, tags: dict, w: int, h: int):
    """Tiled TIFF (tags 322-325): the image is a grid of fixed-size
    tiles, EVERY tile padded to full (tile_h, tile_w) — edge tiles
    carry padding the assembly crops away. Pure layout on top of the
    same per-block decoders as strips: uncompressed, PackBits, LZW,
    Deflate (with Predictor 2 undone per tile row), and new-style
    JPEG tiles (TTN2, shared JPEGTables spliced per tile).
    PlanarConfiguration 2 stores all plane-0 tiles, then plane-1, …
    with one sample per tile."""
    import numpy as np

    samples = tags.get(277, [1])[0]
    compression = tags.get(259, [1])[0]
    planar = tags.get(284, [1])[0]
    predictor = tags.get(317, [1])[0]
    tw = tags.get(322, [0])[0]
    th = tags.get(323, [0])[0]
    offsets = tags.get(324, [])
    counts = tags.get(325, [])
    if tw <= 0 or th <= 0:
        raise ValueError("bad TIFF tile dimensions")
    if compression == TIFF_COMPRESSION_JPEG_OLD:
        raise NotImplementedError("old-style JPEG tiles need Pillow")
    if compression not in (
        TIFF_COMPRESSION_NONE,
        TIFF_COMPRESSION_PACKBITS,
        TIFF_COMPRESSION_LZW,
        TIFF_COMPRESSION_DEFLATE,
        TIFF_COMPRESSION_DEFLATE_OLD,
        TIFF_COMPRESSION_JPEG,
    ):
        raise NotImplementedError(
            f"TIFF compression {compression} (CCITT fax family) "
            "needs Pillow"
        )
    jpeg_tables_body = b""
    if compression == TIFF_COMPRESSION_JPEG:
        if samples != 3:
            raise NotImplementedError(
                "JPEG-in-TIFF decodes as 3-sample YCbCr/RGB here"
            )
        if predictor == 2:
            raise ValueError("predictor 2 is invalid for JPEG tiles")
        if planar == 2:
            raise NotImplementedError("planar JPEG tiles need Pillow")
        tbl = bytes(tags.get(347, []))
        if tbl:
            if tbl[:2] != b"\xff\xd8" or tbl[-2:] != b"\xff\xd9":
                raise ValueError("bad JPEGTables stream")
            jpeg_tables_body = tbl[2:-2]
    across = (w + tw - 1) // tw
    down = (h + th - 1) // th
    n_grid = across * down
    n_expected = n_grid * (samples if planar == 2 else 1)
    if len(offsets) != len(counts) or len(offsets) != n_expected:
        raise ValueError("TIFF tile offset/count mismatch")

    def tile_pixels(o: int, c: int, spp: int):
        if o + c > len(data):
            raise ValueError("TIFF tile out of bounds")
        raw = bytes(data[o : o + c])
        expected = th * tw * spp
        if compression == TIFF_COMPRESSION_JPEG:
            from parquet_extractor_spark.functions.jpeg import decode_jpeg

            if raw[:2] != b"\xff\xd8":
                raise ValueError("JPEG tile missing SOI")
            stream = b"\xff\xd8" + jpeg_tables_body + raw[2:]
            t = decode_jpeg(stream)
            if t.shape[0] < th or t.shape[1] < tw:
                raise ValueError(
                    "JPEG tile dimensions disagree with the IFD"
                )
            return t[:th, :tw]
        raw = _decompress_lossless(raw, expected, compression)
        if len(raw) < expected:
            raise ValueError("TIFF tile shorter than its grid cell")
        raw = bytes(raw[:expected])
        if predictor == 2:
            raw = _undo_predictor2(raw, tw, spp)
        return np.frombuffer(raw, dtype=np.uint8).reshape(th, tw, spp)

    def assemble(plane_offsets, plane_counts, spp: int):
        canvas = np.zeros((down * th, across * tw, spp), dtype=np.uint8)
        for idx, (o, c) in enumerate(zip(plane_offsets, plane_counts)):
            ty, tx = divmod(idx, across)
            canvas[
                ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw
            ] = tile_pixels(o, c, spp)
        return canvas[:h, :w]

    if planar == 2:
        planes = [
            assemble(
                offsets[p * n_grid : (p + 1) * n_grid],
                counts[p * n_grid : (p + 1) * n_grid],
                1,
            )[:, :, 0]
            for p in range(samples)
        ]
        arr = np.stack(planes, axis=2)
    else:
        arr = assemble(offsets, counts, samples)
    arr = _apply_orientation(arr, tags.get(274, [1])[0])
    return arr[:, :, 0:1].repeat(3, axis=2) if samples == 1 else arr


def decode_tiff(data: bytes):
    """Decode the FIRST page of an 8- or 16-bit TIFF to an (H, W, C)
    uint8 array (16-bit samples fold to their high byte after
    predictor undo, the Pillow I;16→L convention). Real pixels for
    uncompressed (1), PackBits (32773),
    LZW (5, with the spec's early-change width schedule), Deflate
    (8 and legacy 32946) strips — with Predictor 2 (horizontal
    differencing) undone when tagged, in 16-bit sample space for
    16-bit strips — and, since late r06, new-style
    JPEG-in-TIFF (7, TTN2): each strip is a JPEG stream decoded by
    functions/jpeg.py, with a shared JPEGTables tag (347) spliced
    after each strip's SOI when present. Old-style JPEG (6) decodes
    in its common interchange layout (tags 513/514 point at one
    complete stream); its deprecated strip-based variants and the
    CCITT fax family remain the declared Pillow boundary
    (NotImplementedError). Malformed input raises ValueError."""
    import numpy as np

    if not is_tiff(data):
        raise ValueError("not a TIFF stream")
    endian = "<" if data[:2] == b"II" else ">"
    big, ifd_off = _header_geometry(data, endian)
    hsz, esz, nfmt = (8, 20, "Q") if big else (2, 12, "H")
    if ifd_off + hsz > len(data):
        raise ValueError("truncated TIFF IFD")
    (n_entries,) = struct.unpack_from(endian + nfmt, data, ifd_off)
    if n_entries > 65535:
        raise ValueError("implausible TIFF IFD entry count")
    if ifd_off + hsz + esz * n_entries + 4 > len(data):
        raise ValueError("truncated TIFF IFD entries")
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_off + hsz + esz * i
        (tag,) = struct.unpack_from(endian + "H", data, off)
        if tag in (
            256, 257, 258, 259, 273, 274, 277, 278, 279, 284, 317, 347,
            322, 323, 324, 325,
            512, 513, 514, 515, 519, 520, 521, 530,
        ):
            vals = _read_entry_values(data, off, endian, big)
            if vals is None:
                raise ValueError(f"bad TIFF entry for tag {tag}")
            tags[tag] = vals
    if tags.get(259, [1])[0] == 6 and 513 in tags:
        # old-style JPEG (compression 6) in its one sane, common
        # layout: JPEGInterchangeFormat/-Length (513/514) point at a
        # COMPLETE interchange JPEG stream for the whole image —
        # decode it directly (such files often omit strip tags
        # entirely, so this runs before the strip-tag requirement).
        # The deprecated strip-based old-style variants (tags
        # 515-521) stay the NotImplementedError boundary below.
        from parquet_extractor_spark.functions.jpeg import decode_jpeg

        jo = tags[513][0]
        jl = tags.get(514, [len(data) - jo])[0]
        if jo + jl > len(data) or jl < 4:
            raise ValueError("old-style JPEG stream out of bounds")
        tile = decode_jpeg(bytes(data[jo : jo + jl]))
        try:
            jw, jh = tags[256][0], tags[257][0]
        except KeyError as exc:
            raise ValueError(f"TIFF missing required tag {exc}") from exc
        if tile.shape[0] != jh or tile.shape[1] != jw:
            raise ValueError(
                "old-style JPEG dimensions disagree with the IFD"
            )
        return _apply_orientation(tile, tags.get(274, [1])[0])
    try:
        w, h = tags[256][0], tags[257][0]
    except KeyError as exc:
        raise ValueError(f"TIFF missing required tag {exc}") from exc
    samples = tags.get(277, [1])[0]
    bits = tags.get(258, [8])
    compression = tags.get(259, [1])[0]
    planar = tags.get(284, [1])[0]
    rows_per_strip = tags.get(278, [h])[0] or h
    bit_depth = bits[0] if bits else 8
    if (
        any(b != bit_depth for b in bits)
        or bit_depth not in (8, 16)
        or samples not in (1, 3, 4)
    ):
        raise NotImplementedError(
            "only 8/16-bit grayscale/RGB/RGBA TIFF decodes here"
        )
    if planar not in (1, 2):
        raise ValueError(f"bad PlanarConfiguration {planar}")
    if w * h > (1 << 26):  # decode-bomb guard, as in png/gif/vp8l
        raise ValueError(f"TIFF image too large ({w}x{h})")
    if bit_depth == 16 and compression in (
        TIFF_COMPRESSION_JPEG, TIFF_COMPRESSION_JPEG_OLD,
    ):
        raise NotImplementedError("16-bit JPEG-in-TIFF needs Pillow")
    if 322 in tags or 324 in tags:
        if bit_depth != 8:
            raise NotImplementedError("16-bit tiled TIFF needs Pillow")
        return _decode_tiled(data, tags, w, h)
    try:
        offsets, counts = tags[273], tags[279]
    except KeyError as exc:
        raise ValueError(f"TIFF missing required tag {exc}") from exc
    oldstyle_prefix = None
    if compression == TIFF_COMPRESSION_JPEG_OLD:
        # old-style strip JPEG (TIFF 6.0 §22): strips hold RAW entropy
        # data; the tables live behind per-sample pointer tags
        # (JPEGQTables 519 / JPEGDCTables 520 / JPEGACTables 521) and
        # the interchange headers must be rebuilt per strip
        if samples != 3:
            raise NotImplementedError(
                "old-style JPEG strips decode as 3-sample YCbCr here"
            )
        if tags.get(317, [1])[0] == 2:
            raise ValueError("predictor 2 is invalid for JPEG strips")
        oldstyle_prefix = _oldstyle_jpeg_prefix(data, tags, w, samples)
    elif compression not in (
        TIFF_COMPRESSION_NONE,
        TIFF_COMPRESSION_PACKBITS,
        TIFF_COMPRESSION_LZW,
        TIFF_COMPRESSION_DEFLATE,
        TIFF_COMPRESSION_DEFLATE_OLD,
        TIFF_COMPRESSION_JPEG,
    ):
        raise NotImplementedError(
            f"TIFF compression {compression} (CCITT fax family) "
            "needs Pillow"
        )
    predictor = tags.get(317, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    # new-style JPEG (TTN2): each strip is a JPEG stream; a shared
    # JPEGTables tag (347) holds an abbreviated tables-only stream
    # whose segments are spliced after each strip's SOI
    jpeg_tables_body = b""
    if compression == TIFF_COMPRESSION_JPEG:
        if samples != 3:
            raise NotImplementedError(
                "JPEG-in-TIFF decodes as 3-sample YCbCr/RGB here"
            )
        if predictor == 2:
            raise ValueError("predictor 2 is invalid for JPEG strips")
        tbl = bytes(tags.get(347, []))
        if tbl:
            if tbl[:2] != b"\xff\xd8" or tbl[-2:] != b"\xff\xd9":
                raise ValueError("bad JPEGTables stream")
            jpeg_tables_body = tbl[2:-2]
    if len(offsets) != len(counts):
        raise ValueError("TIFF strip offset/count mismatch")
    def _strip_pixels(o: int, c: int, strip_rows: int, spp: int) -> bytes:
        """Decompress one strip to exactly strip_rows×w×spp OUTPUT
        bytes (spp = samples carried by the strip: all of them for
        chunky, one for planar). 16-bit strips are predictor-undone in
        16-bit sample space (TIFF 6.0 §14: differencing applies to
        sample VALUES, stored in file byte order) and folded to their
        high byte, so everything downstream stays 8-bit."""
        if o + c > len(data):
            raise ValueError("TIFF strip out of bounds")
        expected = strip_rows * w * spp * (2 if bit_depth == 16 else 1)
        raw = data[o : o + c]
        if compression == TIFF_COMPRESSION_PACKBITS:
            raw = _packbits_decode(raw, expected)
        elif compression == TIFF_COMPRESSION_LZW:
            raw = _lzw_decode(raw, expected)
        elif compression in (
            TIFF_COMPRESSION_DEFLATE,
            TIFF_COMPRESSION_DEFLATE_OLD,
        ):
            import zlib

            try:
                raw = zlib.decompress(raw)
            except zlib.error as exc:
                raise ValueError(f"bad TIFF deflate strip: {exc}") from exc
        elif compression == TIFF_COMPRESSION_JPEG:
            from parquet_extractor_spark.functions.jpeg import decode_jpeg

            if raw[:2] != b"\xff\xd8":
                raise ValueError("JPEG strip missing SOI")
            stream = b"\xff\xd8" + jpeg_tables_body + bytes(raw[2:])
            tile = decode_jpeg(stream)
            if tile.shape[1] != w or tile.shape[0] < strip_rows:
                raise ValueError(
                    "JPEG strip dimensions disagree with the IFD"
                )
            raw = tile[:strip_rows].tobytes()
        elif compression == TIFF_COMPRESSION_JPEG_OLD:
            from parquet_extractor_spark.functions.jpeg import decode_jpeg

            stream = oldstyle_prefix(strip_rows) + bytes(raw) + b"\xff\xd9"
            tile = decode_jpeg(stream)
            if tile.shape[1] != w or tile.shape[0] < strip_rows:
                raise ValueError(
                    "JPEG strip dimensions disagree with the IFD"
                )
            raw = tile[:strip_rows].tobytes()
        if len(raw) < expected:
            raise ValueError("TIFF strip shorter than its rows")
        raw = bytes(raw[:expected])
        if bit_depth == 16:
            a = np.frombuffer(raw, dtype=endian + "u2").reshape(
                -1, w, spp
            )
            if predictor == 2:
                a = np.cumsum(a, axis=1, dtype=np.uint16)
            return (a >> 8).astype(np.uint8).tobytes()
        if predictor == 2:
            raw = _undo_predictor2(raw, w, spp)
        return raw

    if planar == 2:
        # PlanarConfiguration 2: strips are grouped per sample plane
        # (all plane-0 strips, then plane-1, …), each carrying one
        # sample per pixel
        if compression in (TIFF_COMPRESSION_JPEG, TIFF_COMPRESSION_JPEG_OLD):
            raise NotImplementedError("planar JPEG strips need Pillow")
        spp_strips = (h + rows_per_strip - 1) // rows_per_strip
        if len(offsets) != samples * spp_strips:
            raise ValueError("planar TIFF strip count mismatch")
        planes = []
        for p in range(samples):
            rows = bytearray()
            remaining = h
            for s in range(spp_strips):
                idx = p * spp_strips + s
                strip_rows = min(rows_per_strip, remaining)
                rows += _strip_pixels(
                    offsets[idx], counts[idx], strip_rows, 1
                )
                remaining -= strip_rows
            planes.append(
                np.frombuffer(bytes(rows), dtype=np.uint8).reshape(h, w)
            )
        arr = np.stack(planes, axis=2)
    else:
        rows = bytearray()
        remaining = h
        for o, c in zip(offsets, counts):
            if remaining <= 0:
                break
            strip_rows = min(rows_per_strip, remaining)
            rows += _strip_pixels(o, c, strip_rows, samples)
            remaining -= strip_rows
        if remaining > 0:
            raise ValueError("TIFF strips do not cover the image")
        arr = np.frombuffer(bytes(rows), dtype=np.uint8).reshape(
            h, w, samples
        )
    arr = _apply_orientation(arr, tags.get(274, [1])[0])
    return arr[:, :, 0:1].repeat(3, axis=2) if samples == 1 else arr


def _apply_orientation(arr, orientation: int):
    """Undo TIFF/EXIF Orientation (tag 274): return the image as it
    should be VIEWED given how it is stored. The eight cases are the
    EXIF standard's; 5-8 swap output width/height."""
    import numpy as np

    if orientation in (0, 1):
        return arr
    if orientation == 2:  # mirror horizontal
        return np.ascontiguousarray(arr[:, ::-1])
    if orientation == 3:  # rotate 180
        return np.ascontiguousarray(arr[::-1, ::-1])
    if orientation == 4:  # mirror vertical
        return np.ascontiguousarray(arr[::-1])
    if orientation == 5:  # transpose (main diagonal)
        return np.ascontiguousarray(arr.transpose(1, 0, 2))
    if orientation == 6:  # rotate 90 CW to view
        return np.ascontiguousarray(np.rot90(arr, k=-1))
    if orientation == 7:  # transverse (anti-diagonal)
        return np.ascontiguousarray(arr.transpose(1, 0, 2)[::-1, ::-1])
    if orientation == 8:  # rotate 270 CW to view
        return np.ascontiguousarray(np.rot90(arr, k=1))
    raise ValueError(f"bad TIFF orientation {orientation}")


def _jpeg_strip_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split one JPEG stream into (tables_body, stream_without_tables):
    walk the segment markers, lift every DQT (FFDB) / DHT (FFC4)
    segment out. The lifted body goes into the shared JPEGTables tag;
    the remainder is the abbreviated per-strip stream TTN2 describes."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    tables = bytearray()
    kept = bytearray(b"\xff\xd8")
    pos = 2
    while pos + 4 <= len(stream):
        if stream[pos] != 0xFF:
            raise ValueError("bad JPEG segment marker")
        marker = stream[pos + 1]
        if marker == 0xDA:  # SOS: entropy data follows — keep the rest
            kept += stream[pos:]
            return bytes(tables), bytes(kept)
        (seg_len,) = struct.unpack_from(">H", stream, pos + 2)
        seg = stream[pos : pos + 2 + seg_len]
        if marker in (0xDB, 0xC4):
            tables += seg
        else:
            kept += seg
        pos += 2 + seg_len
    raise ValueError("JPEG stream without SOS")


def _jm(marker: int, payload: bytes) -> bytes:
    """One JPEG marker segment: FF xx + big-endian length + payload."""
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _oldstyle_jpeg_prefix(data: bytes, tags: dict, w: int, samples: int):
    """Rebuild the interchange headers the TIFF 6.0 §22 strip layout
    strips out. JPEGQTables (519) points at raw 64-byte zigzag
    quantization tables, JPEGDCTables (520) / JPEGACTables (521) at
    raw BITS(16)+values Huffman tables — one pointer per sample, with
    writers repeating one offset for components that share a table.
    Distinct offsets become distinct table ids in file order. Returns
    ``prefix(strip_rows) -> bytes``: SOI + DQT* + DHT* + (DRI) + SOF0
    + SOS, to be prepended to a strip's raw entropy data (the strip
    itself carries no markers; DC predictors reset per strip because
    each strip is an independent scan)."""
    if tags.get(512, [1])[0] != 1:
        raise NotImplementedError(
            f"old-style JPEGProc {tags[512][0]} (lossless) needs Pillow"
        )
    try:
        qoffs, dcoffs, acoffs = tags[519], tags[520], tags[521]
    except KeyError as exc:
        # no interchange pointer AND no table pointers: the nonstandard
        # tableless old-style variants (e.g. Wang annotation files)
        # stay unsupported
        raise NotImplementedError(
            f"old-style strip JPEG without table tag {exc} needs Pillow"
        ) from exc
    if not (len(qoffs) == len(dcoffs) == len(acoffs) == samples):
        raise ValueError("old-style JPEG table count != SamplesPerPixel")

    def read_q(off: int) -> bytes:
        if off + 64 > len(data):
            raise ValueError("JPEGQTables offset out of bounds")
        return bytes(data[off : off + 64])

    def read_h(off: int) -> bytes:
        if off + 16 > len(data):
            raise ValueError("JPEG Huffman table offset out of bounds")
        bits = bytes(data[off : off + 16])
        n = sum(bits)
        if n > 256 or off + 16 + n > len(data):
            raise ValueError("JPEG Huffman table out of bounds")
        return bits + bytes(data[off + 16 : off + 16 + n])

    def assign(offs, reader):
        """Map distinct table offsets to table ids in file order."""
        ids: dict[int, int] = {}
        tables: list[tuple[int, bytes]] = []
        comp_ids = []
        for off in offs:
            if off not in ids:
                ids[off] = len(ids)
                tables.append((ids[off], reader(off)))
            comp_ids.append(ids[off])
        if len(ids) > 4:
            raise ValueError("more than 4 distinct JPEG tables")
        return comp_ids, tables

    qids, qtabs = assign(qoffs, read_q)
    dcids, dctabs = assign(dcoffs, read_h)
    acids, actabs = assign(acoffs, read_h)
    # YCbCrSubSampling (530) gives the luma sampling factors; the TIFF
    # default is [2, 2] — our encoder always writes the tag explicitly
    sub = tags.get(530, [2, 2]) if samples == 3 else [1, 1]
    head = bytearray()
    for tid, q in qtabs:
        head += _jm(0xDB, bytes([tid]) + q)
    for tid, t in dctabs:
        head += _jm(0xC4, bytes([tid]) + t)
    for tid, t in actabs:
        head += _jm(0xC4, bytes([0x10 | tid]) + t)
    ri = tags.get(515, [0])[0]
    if ri:
        head += _jm(0xDD, struct.pack(">H", ri))
    sos = bytes([samples])
    for i in range(samples):
        sos += bytes([i + 1, (dcids[i] << 4) | acids[i]])
    sos += bytes([0, 63, 0])

    def prefix(strip_rows: int) -> bytes:
        sof = struct.pack(">BHHB", 8, strip_rows, w, samples)
        for i in range(samples):
            hv = (sub[0] << 4) | sub[1] if (i == 0 and samples == 3) else 0x11
            sof += bytes([i + 1, hv, qids[i]])
        return (
            b"\xff\xd8"
            + bytes(head)
            + _jm(0xC0, sof)
            + _jm(0xDA, sos)
        )

    return prefix


def _jpeg_interchange_parts(stream: bytes) -> tuple[dict, dict, dict, bytes]:
    """Split one baseline interchange JPEG into its raw table payloads
    and entropy data: ({tq: 64 zigzag bytes}, {th: dc bits+vals},
    {th: ac bits+vals}, entropy-without-EOI) — the pieces the
    old-style TIFF layout stores behind tags 519/520/521 and in the
    strips."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    q: dict[int, bytes] = {}
    dc: dict[int, bytes] = {}
    ac: dict[int, bytes] = {}
    pos = 2
    while pos + 4 <= len(stream):
        if stream[pos] != 0xFF:
            raise ValueError("bad JPEG segment marker")
        marker = stream[pos + 1]
        (seg_len,) = struct.unpack_from(">H", stream, pos + 2)
        body = stream[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDA:
            entropy = stream[pos + 2 + seg_len :]
            if entropy[-2:] == b"\xff\xd9":
                entropy = entropy[:-2]
            return q, dc, ac, bytes(entropy)
        if marker == 0xDB:
            b = bytes(body)
            while b:
                if b[0] >> 4:
                    raise ValueError("16-bit quant table")
                q[b[0] & 0x0F] = b[1:65]
                b = b[65:]
        elif marker == 0xC4:
            b = bytes(body)
            while b:
                n = sum(b[1:17])
                tbl = b[1 : 17 + n]
                if b[0] & 0x10:
                    ac[b[0] & 0x0F] = tbl
                else:
                    dc[b[0] & 0x0F] = tbl
                b = b[17 + n :]
        pos += 2 + seg_len
    raise ValueError("JPEG stream without SOS")


def build_tiff_oldstyle_jpeg(
    arr,
    endian: str = "le",
    rows_per_strip: int = 8,
    jpeg_quality: int = 95,
) -> bytes:
    """(H, W, 3) uint8 RGB -> old-style JPEG-in-TIFF (compression 6)
    in the deprecated TIFF 6.0 §22 STRIP layout: JPEGProc 1, raw
    zigzag quantization tables behind JPEGQTables (519), raw
    BITS+values Huffman tables behind JPEGDCTables/JPEGACTables
    (520/521, chroma components sharing one offset as real writers
    do), YCbCrSubSampling [1,1], and strips holding bare entropy data
    with no markers. Each strip is encoded independently (DC
    predictors reset), 4:4:4, via functions/jpeg.py."""
    import numpy as np

    from parquet_extractor_spark.functions.jpeg import encode_jpeg

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("old-style JPEG TIFF writes (H, W, 3) RGB")
    h, w, _ = a.shape
    e = "<" if endian == "le" else ">"
    bom = b"II\x2a\x00" if endian == "le" else b"MM\x00\x2a"

    strips: list[bytes] = []
    tables = None
    for y0 in range(0, h, rows_per_strip):
        stream = encode_jpeg(
            a[y0 : y0 + rows_per_strip], quality=jpeg_quality, subsample=False
        )
        q, dcs, acs, entropy = _jpeg_interchange_parts(stream)
        if tables is None:
            # baseline tables depend only on quality — identical for
            # every strip, so take them once (ids 0 = luma, 1 = chroma)
            tables = (q[0], q[1], dcs[0], dcs[1], acs[0], acs[1])
        strips.append(entropy)
    qy, qc, dc_y, dc_c, ac_y, ac_c = tables
    n_strips = len(strips)

    # fixed tag set, ascending: 256,257,258,259,262,273,277,278,279,
    # 512,519,520,521,530
    tag_list = [
        (256, 4, 1, [w]),
        (257, 4, 1, [h]),
        (258, 3, 3, [8, 8, 8]),
        (259, 3, 1, [TIFF_COMPRESSION_JPEG_OLD]),
        (262, 3, 1, [6]),  # photometric YCbCr
        (273, 4, n_strips, None),  # strip offsets, patched below
        (277, 3, 1, [3]),
        (278, 4, 1, [rows_per_strip]),
        (279, 4, n_strips, [len(s) for s in strips]),
        (512, 3, 1, [1]),  # JPEGProc baseline
        (519, 4, 3, None),  # Q-table offsets, patched below
        (520, 4, 3, None),  # DC-table offsets
        (521, 4, 3, None),  # AC-table offsets
        (530, 3, 2, [1, 1]),  # 4:4:4
    ]
    ifd_size = 2 + 12 * len(tag_list) + 4
    overflow_base = 8 + ifd_size

    def value_bytes(typ: int, vals: list[int]) -> bytes:
        fmt = {3: "H", 4: "I"}[typ]
        return b"".join(struct.pack(e + fmt, v) for v in vals)

    # two passes: first with placeholder offsets to size the overflow
    # area, then with the real table/strip positions
    blob_list = [qy, qc, dc_y, dc_c, ac_y, ac_c]
    strip_offs = [0] * n_strips
    q_offs = dc_offs = ac_offs = [0, 0, 0]
    for pass_no in range(2):
        overflow = bytearray()
        ifd = bytearray(struct.pack(e + "H", len(tag_list)))
        for tag, typ, count, vals in tag_list:
            if tag == 273:
                vals = strip_offs
            elif tag == 519:
                vals = q_offs
            elif tag == 520:
                vals = dc_offs
            elif tag == 521:
                vals = ac_offs
            vb = value_bytes(typ, vals)
            if len(vb) <= 4:
                packed = vb + b"\x00" * (4 - len(vb))
            else:
                packed = struct.pack(e + "I", overflow_base + len(overflow))
                overflow += vb
            ifd += struct.pack(e + "HHI", tag, typ, count) + packed
        ifd += struct.pack(e + "I", 0)  # no next IFD
        blob_base = overflow_base + len(overflow)
        pos = blob_base
        blob_offs = []
        for b in blob_list:
            blob_offs.append(pos)
            pos += len(b)
        q_offs = [blob_offs[0], blob_offs[1], blob_offs[1]]
        dc_offs = [blob_offs[2], blob_offs[3], blob_offs[3]]
        ac_offs = [blob_offs[4], blob_offs[5], blob_offs[5]]
        strip_offs = []
        for s in strips:
            strip_offs.append(pos)
            pos += len(s)
    return bytes(
        bom
        + struct.pack(e + "I", 8)
        + ifd
        + overflow
        + b"".join(blob_list)
        + b"".join(strips)
    )


def build_tiff_image(
    arr,
    endian: str = "le",
    compression: int = TIFF_COMPRESSION_NONE,
    rows_per_strip: int = 8,
    predictor: int = 1,
    jpeg_quality: int = 95,
    jpeg_shared_tables: bool = False,
    planar: int = 1,
    orientation: int = 1,
    tile_size: tuple | None = None,
    bigtiff: bool = False,
) -> bytes:
    """(H, W, 1|3|4) uint8 array -> real 8-bit TIFF, striped or —
    with ``tile_size=(tile_w, tile_h)`` — TILED (tags 322-325, every
    tile padded to full size as the spec requires). Uncompressed,
    PackBits, LZW, Deflate, or new-style JPEG-in-TIFF with optional
    shared JPEGTables; optional horizontal-differencing Predictor 2
    for the lossless encodings; planar=2 writes
    PlanarConfiguration-2 per-plane strip/tile groups.
    ``bigtiff=True`` writes the BigTIFF container (magic 43, u64
    offsets, 20-byte IFD entries) around the same payload."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    e = "<" if endian == "le" else ">"
    bom = b"II\x2a\x00" if endian == "le" else b"MM\x00\x2a"
    jpeg_tables = b""
    if compression == TIFF_COMPRESSION_JPEG and (
        c != 3 or predictor == 2 or planar == 2
    ):
        raise ValueError(
            "JPEG-in-TIFF writes 3-sample chunky strips, no predictor"
        )

    def _jpeg_block(block) -> bytes:
        nonlocal jpeg_tables
        from parquet_extractor_spark.functions.jpeg import encode_jpeg

        stream = encode_jpeg(block, quality=jpeg_quality, subsample=False)
        if jpeg_shared_tables:
            # baseline tables depend only on quality (Annex-K Huffman
            # + quality-scaled quant), so every block lifts the SAME
            # segments — take them once
            tbl, stream = _jpeg_strip_tables(stream)
            if not jpeg_tables:
                jpeg_tables = b"\xff\xd8" + tbl + b"\xff\xd9"
        return stream

    def _pack(raw: bytes, row_w: int, spp: int) -> bytes:
        if predictor == 2:
            raw = _apply_predictor2(raw, row_w, spp)
        if compression == TIFF_COMPRESSION_PACKBITS:
            return _packbits_encode(raw)
        if compression == TIFF_COMPRESSION_LZW:
            return _lzw_encode(raw)
        if compression in (
            TIFF_COMPRESSION_DEFLATE,
            TIFF_COMPRESSION_DEFLATE_OLD,
        ):
            import zlib

            return zlib.compress(raw, 6)
        return raw

    strips = []
    if tile_size is not None:
        tw, th = tile_size

        def tile_block(src, ty: int, tx: int, spp: int):
            block = np.zeros((th, tw, spp), dtype=np.uint8)
            part = src[ty * th : ty * th + th, tx * tw : tx * tw + tw]
            block[: part.shape[0], : part.shape[1]] = part
            return block

        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        if planar == 2:
            for p in range(c):
                plane = np.ascontiguousarray(a[:, :, p : p + 1])
                for ty in range(down):
                    for tx in range(across):
                        strips.append(
                            _pack(
                                tile_block(plane, ty, tx, 1).tobytes(),
                                tw,
                                1,
                            )
                        )
        else:
            for ty in range(down):
                for tx in range(across):
                    block = tile_block(a, ty, tx, c)
                    if compression == TIFF_COMPRESSION_JPEG:
                        strips.append(_jpeg_block(block))
                    else:
                        strips.append(_pack(block.tobytes(), tw, c))
    elif planar == 2:
        for p in range(c):
            plane = np.ascontiguousarray(a[:, :, p])
            for y0 in range(0, h, rows_per_strip):
                strips.append(
                    _pack(plane[y0 : y0 + rows_per_strip].tobytes(), w, 1)
                )
    else:
        for y0 in range(0, h, rows_per_strip):
            if compression == TIFF_COMPRESSION_JPEG:
                strips.append(_jpeg_block(a[y0 : y0 + rows_per_strip]))
                continue
            strips.append(
                _pack(a[y0 : y0 + rows_per_strip].tobytes(), w, c)
            )
    n_strips = len(strips)
    photometric = 1 if c == 1 else 2
    if compression == TIFF_COMPRESSION_JPEG:
        photometric = 6  # YCbCr, the JFIF strips' native space
    tags = [
        (256, 4, 1, [w]),
        (257, 4, 1, [h]),
        (258, 3, c, [8] * c),
        (259, 3, 1, [compression]),
        (262, 3, 1, [photometric]),
        (274, 3, 1, [orientation]),
        (277, 3, 1, [c]),
    ]
    if tile_size is not None:
        tags += [
            (322, 4, 1, [tile_size[0]]),
            (323, 4, 1, [tile_size[1]]),
            (324, 4, n_strips, None),  # patched below
            (325, 4, n_strips, [len(s) for s in strips]),
        ]
    else:
        tags += [
            (273, 4, n_strips, None),  # patched below
            (278, 4, 1, [rows_per_strip]),
            (279, 4, n_strips, [len(s) for s in strips]),
        ]
    if planar == 2:
        tags.append((284, 3, 1, [2]))
    if predictor == 2:
        tags.append((317, 3, 1, [2]))
    if jpeg_tables:
        tags.append((347, 7, len(jpeg_tables), list(jpeg_tables)))
    tags.sort()  # spec: IFD entries ascending by tag
    if bigtiff:
        # BigTIFF header: order + magic 43 + u16 offset size (8) +
        # u16 zero + u64 first-IFD pointer (16)
        bom = (b"II\x2b\x00" if endian == "le" else b"MM\x00\x2b")
        header = bytearray(
            bom + struct.pack(e + "HHQ", 8, 0, 16)
        )
        # nfmt: IFD entry-count field; efmt: per-entry value count
        hdr_len, nfmt, efmt, ptr_fmt, inline = 16, "Q", "Q", "Q", 8
    else:
        header = bytearray(bom + struct.pack(e + "I", 8))
        hdr_len, nfmt, efmt, ptr_fmt, inline = 8, "H", "I", "I", 4
    # layout: header + IFD + next-ptr + overflow area + strips
    ifd_size = (
        struct.calcsize(nfmt)
        + (12 if not bigtiff else 20) * len(tags)
        + struct.calcsize(ptr_fmt)
    )
    overflow = bytearray()
    overflow_base = hdr_len + ifd_size

    def value_bytes(typ, vals):
        if typ in (1, 7):  # BYTE / UNDEFINED
            return bytes(vals)
        fmt = {3: "H", 4: "I"}[typ]
        return b"".join(struct.pack(e + fmt, v) for v in vals)

    entries = []
    for tag, typ, count, vals in tags:
        entries.append([tag, typ, count, vals])
    # strip offsets need the final layout; compute after overflow of
    # other tags is known — do two passes
    for pass_no in range(2):
        ifd = bytearray(struct.pack(e + nfmt, len(tags)))
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
            if tag in (273, 324):
                vals = offs if pass_no == 1 else [0] * count
            vb = value_bytes(typ, vals)
            if len(vb) <= inline:
                packed = vb + b"\x00" * (inline - len(vb))
            else:
                packed = struct.pack(
                    e + ptr_fmt, overflow_base + len(overflow)
                )
                overflow += vb
            ifd += (
                struct.pack(e + "HH" + efmt, tag, typ, count) + packed
            )
        ifd += struct.pack(e + ptr_fmt, 0)  # no next IFD
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

"""Dependency-free baseline JPEG codec (ITU-T T.81 sequential DCT).

Closes the last declared multimodal stub: image rows in JPEG format
now decode to real pixels with no PIL/libjpeg, the same way
``functions/png.py`` handles PNG with no libpng. Pure numpy + stdlib.

Scope (mirrors what a training-data pipeline actually meets):
- decode: baseline sequential (SOF0/1), 8-bit, grayscale or YCbCr,
  arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0 ...), restart
  markers, multiple DQT/DHT segments; AND — since r06 — progressive
  (SOF2) with full T.81 Annex G semantics: spectral selection,
  successive approximation (DC and AC refinement scans, correction
  bits), EOB runs, interleaved DC / non-interleaved AC scans.
  Arithmetic coding and the hierarchical modes raise
  NotImplementedError — a declared boundary, not a silent wrong
  answer.
- encode: baseline sequential (quality-scaled Annex K quantization
  tables, Annex K Huffman tables, 4:4:4 or 4:2:0) and progressive
  (``progressive=True``): a 10-scan script exercising every decode
  path — DC first at Al=1 + DC refinement, split AC bands first at
  Al=1 + AC refinements — with per-scan optimal length-limited
  Huffman tables built by the Annex K.2 reference algorithm.
  Progressive encode→decode reconstructs the IDENTICAL pixels to
  baseline encode→decode at the same quality (same coefficients,
  different entropy layout), which is what the round-trip test pins.

Everything here is public-spec material: marker structure and Huffman
coding from ITU-T T.81, JFIF from ECMA TR/98, quality scaling as
popularized by the IJG's libjpeg.

Performance note: this is the executor-side decode path behind
``mapInPandas`` in operators/multimodal.py. It is a per-row Python
cost by design (media decode cannot be a Catalyst expression); the
Spark-side contract — Arrow-batched binary in, bounded features out,
decode parallelism = partition count — is what scales, and is
independent of the per-image constant factor here.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8"

# ---------------------------------------------------------------- tables

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int32,
)

# Annex K base quantization tables (luminance, chrominance)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K Huffman tables: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Orthonormal 8-point DCT basis: DCT = C @ block @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _a = np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
        _C[_k, _n] = _a * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def is_jpeg(data: bytes | None) -> bool:
    return bool(data) and data[:2] == JPEG_MAGIC


# ---------------------------------------------------------------- huffman


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical JPEG assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the decoder."""
    enc = _canonical_codes(bits, values)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    """Entropy-coded-segment reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("jpeg: truncated entropy stream")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = d[self.pos] if self.pos < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 1  # stuffed data byte 0xFF
            else:
                # A real marker terminates the segment. Don't consume
                # it (sync_restart/caller will); feed 1-bits so any
                # trailing partial-MCU padding reads decode as padding.
                self.pos -= 1
                self.marker = nxt
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")

    def sync_restart(self) -> None:
        """Align to byte boundary and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d) and not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        if p + 1 >= len(d):
            raise ValueError("jpeg: missing restart marker")
        self.pos = p + 2
        self.marker = None


def _extend(v: int, size: int) -> int:
    return v - ((1 << size) - 1) if v < (1 << (size - 1)) else v


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------- encode


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


def _rgb_to_ycbcr(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    f = arr.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _pad_to_block(plane: np.ndarray, block: int = 8) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % block
    pw = (-w) % block
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _encode_block(
    writer: _BitWriter,
    coefs: np.ndarray,
    dc_prev: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    zz = coefs.reshape(64)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - dc_prev
    size = _category(diff)
    code, ln = dc_codes[size]
    writer.write(code, ln)
    if size:
        amp = diff if diff > 0 else diff + (1 << size) - 1
        writer.write(amp, size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        size = _category(v)
        code, ln = ac_codes[(run << 4) | size]
        writer.write(code, ln)
        amp = v if v > 0 else v + (1 << size) - 1
        writer.write(amp, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
    return dc


def _plane_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """DCT + quantize every 8x8 block: (H/8, W/8, 8, 8) int array."""
    p = _pad_to_block(plane) - 128.0
    h, w = p.shape
    blocks = p.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    coefs = np.einsum("ka,ijab,lb->ijkl", _C, blocks, _C)
    return np.round(coefs / q).astype(np.int64)


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(payload) + 2) + payload


def _dht_payload(cls: int, ident: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([(cls << 4) | ident]) + bytes(bits) + bytes(vals)


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as JFIF JPEG.

    subsample=False writes 4:4:4; True writes 4:2:0 (2x2-averaged
    chroma) — the common web layout, and the decoder's upsampling
    path exercised in tests. restart_interval > 0 emits a DRI segment
    and RSTn markers every N MCUs (the decoder resync path).
    progressive=True writes an SOF2 stream via the 10-scan script in
    _encode_progressive (same quantized coefficients, so it decodes
    to pixels identical to the baseline stream at the same quality);
    restart markers are a baseline-only option here.
    """
    if progressive and restart_interval:
        raise ValueError("restart_interval is a baseline-only option")
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_jpeg expects (H, W, 3) RGB")
    h, w = pixels.shape[:2]
    qy = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    y, cb, cr = _rgb_to_ycbcr(pixels)
    if subsample:
        # pad to even dims then 2x2 mean-pool the chroma planes
        cbp = _pad_to_block(cb, 2)
        crp = _pad_to_block(cr, 2)
        cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
        hy, vy = 2, 2
    else:
        hy, vy = 1, 1

    yb = _plane_blocks(y, qy)
    cbb = _plane_blocks(cb, qc)
    crb = _plane_blocks(cr, qc)

    dc_y = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    # pad block grids so the luma grid is a multiple of the MCU size
    def _pad_grid(blocks: np.ndarray, mh: int, mv: int) -> np.ndarray:
        gh, gw = blocks.shape[:2]
        ph = (-gh) % mv
        pw = (-gw) % mh
        if ph or pw:
            blocks = np.pad(
                blocks, ((0, ph), (0, pw), (0, 0), (0, 0)), mode="edge"
            )
        return blocks

    yb = _pad_grid(yb, hy, vy)
    mcus_x = yb.shape[1] // hy
    mcus_y = yb.shape[0] // vy

    # chroma grids carry one block per MCU (sampling factors 1,1)
    def _fit(blocks: np.ndarray) -> np.ndarray:
        gh, gw = blocks.shape[:2]
        if gh < mcus_y or gw < mcus_x:
            blocks = np.pad(
                blocks,
                ((0, mcus_y - gh), (0, mcus_x - gw), (0, 0), (0, 0)),
                mode="edge",
            )
        return blocks

    cbb = _fit(cbb)
    crb = _fit(crb)

    if progressive:
        return _encode_progressive(
            h, w, qy, qc, [yb, cbb, crb], hy, vy, mcus_x, mcus_y
        )

    writer = _BitWriter()
    prev = [0, 0, 0]
    mcu_count = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) % 8
                prev = [0, 0, 0]
            mcu_count += 1
            for by in range(vy):
                for bx in range(hy):
                    prev[0] = _encode_block(
                        writer, yb[my * vy + by, mx * hy + bx], prev[0], dc_y, ac_y
                    )
            prev[1] = _encode_block(writer, cbb[my, mx], prev[1], dc_c, ac_c)
            prev[2] = _encode_block(writer, crb[my, mx], prev[2], dc_c, ac_c)
    writer.flush()

    out = bytearray()
    out += JPEG_MAGIC  # SOI
    out += _marker(
        0xE0, b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _marker(0xDB, bytes([0]) + bytes(int(v) for v in qy.reshape(64)[ZIGZAG]))
    out += _marker(0xDB, bytes([1]) + bytes(int(v) for v in qc.reshape(64)[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (hy << 4) | vy, 0])  # Y
    sof += bytes([2, 0x11, 1])  # Cb
    sof += bytes([3, 0x11, 1])  # Cr
    out += _marker(0xC0, sof)
    out += _marker(0xC4, _dht_payload(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    out += _marker(0xC4, _dht_payload(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    out += _marker(0xC4, _dht_payload(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
    out += _marker(0xC4, _dht_payload(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))
    if restart_interval:
        out += _marker(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += _marker(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decode


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline-sequential OR progressive JPEG to an
    (H, W, 3) uint8 RGB array (grayscale returns replicated
    channels). Raises NotImplementedError for arithmetic-coded and
    hierarchical streams; any other malformed input raises ValueError
    (never IndexError/KeyError/struct.error), so the mapInPandas
    per-row fallback catches it."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (missing SOI)")
    try:
        out = _decode_jpeg_inner(data)
        orientation = jpeg_exif_orientation(data)
        if orientation > 1:
            from parquet_extractor_spark.functions.tiff import (
                _apply_orientation,
            )

            out = _apply_orientation(out, orientation)
        return out
    except (
        struct.error,
        IndexError,
        KeyError,
        AttributeError,
        TypeError,
        OverflowError,
        ZeroDivisionError,
    ) as exc:
        raise ValueError(f"corrupt JPEG stream: {exc!r}") from exc


# decode-bomb guard for untrusted bytes: cap claimed dims before
# allocating plane buffers (2^26 px ≈ 200 MB RGB).
_MAX_PIXELS = 1 << 26


def jpeg_exif_orientation(data: bytes) -> int:
    """EXIF Orientation from a JPEG's APP1 segment (a TIFF IFD blob,
    tag 274 in IFD0), or 1 when absent/unparseable — camera files
    store rotation here rather than rotating pixels, so an image
    pipeline that ignores it trains on sideways photos."""
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return 1
        tag = data[pos + 1]
        if tag in (0xD8, 0x01) or 0xD0 <= tag <= 0xD7:
            pos += 2
            continue
        if tag in (0xDA, 0xD9):  # entropy data / EOI: no EXIF ahead
            return 1
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if tag == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
            blob = data[pos + 10 : pos + 2 + seglen]
            if len(blob) < 14 or blob[:2] not in (b"II", b"MM"):
                return 1
            e = "<" if blob[:2] == b"II" else ">"
            magic, ifd0 = struct.unpack_from(e + "HI", blob, 2)
            if magic != 42 or ifd0 + 2 > len(blob):
                return 1
            (n,) = struct.unpack_from(e + "H", blob, ifd0)
            for i in range(n):
                off = ifd0 + 2 + 12 * i
                if off + 12 > len(blob):
                    return 1
                t, typ, _cnt = struct.unpack_from(e + "HHI", blob, off)
                if t == 274 and typ == 3:
                    (o,) = struct.unpack_from(e + "H", blob, off + 8)
                    return o if 1 <= o <= 8 else 1
            return 1
        pos += 2 + seglen
    return 1


def _decode_jpeg_inner(data: bytes) -> np.ndarray:
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, comps) with comps = [(cid, hh, vv, tq)]
    restart_interval = 0
    progressive = False
    scans_decoded = 0
    coef: dict[int, np.ndarray] = {}  # cid -> (bh, bw, 64) zigzag coefs

    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        tag = data[pos + 1]
        pos += 2
        if tag == 0xFF:  # 0xFF fill byte before a marker (T.81 B.1.1.2)
            pos -= 1
            continue
        if tag in (0xD8, 0x01) or 0xD0 <= tag <= 0xD7:
            continue
        if tag == 0xD9:  # EOI
            break
        if pos + 2 > len(data):
            raise ValueError("jpeg: truncated marker")
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if tag == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    vals = np.frombuffer(seg[p:p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                else:
                    vals = np.frombuffer(
                        seg[p:p + 128], dtype=">u2"
                    ).astype(np.int64)
                    p += 128
                table = np.zeros(64, dtype=np.int64)
                table[ZIGZAG] = vals
                quant[tq] = table.reshape(8, 8)
        elif tag == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, ident = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                p += 17 + n
                (huff_ac if cls else huff_dc)[ident] = _decode_table(bits, vals)
        elif tag in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            _prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if fh * fw > _MAX_PIXELS:
                raise ValueError(f"JPEG frame too large ({fw}x{fh})")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
            if tag == 0xC2:
                progressive = True
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcx = -(-fw // (8 * hmax))
                mcy = -(-fh // (8 * vmax))
                coef = {
                    cid: np.zeros((mcy * vv, mcx * hh, 64), dtype=np.int64)
                    for cid, hh, vv, _ in comps
                }
        elif tag in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "jpeg: only baseline sequential and progressive supported "
                f"(SOF marker 0x{tag:02x})"
            )
        elif tag == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif tag == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tabs >> 4, tabs & 0x0F))
            if progressive:
                ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
                scans_decoded += 1
                pos = _decode_progressive_scan(
                    data,
                    pos + seglen,
                    frame,
                    scan,
                    (ss, se, ahal >> 4, ahal & 0x0F),
                    coef,
                    huff_dc,
                    huff_ac,
                    restart_interval,
                )
                continue
            if ns != len(frame[2]):
                # non-interleaved scans lay blocks out in raster order,
                # not MCU order — decoding them with the interleaved
                # walk below would return silently scrambled pixels
                raise NotImplementedError(
                    "jpeg: baseline decode needs a single interleaved "
                    f"scan (scan has {ns} of {len(frame[2])} components)"
                )
            return _decode_scan(
                data,
                pos + seglen,
                frame,
                scan,
                quant,
                huff_dc,
                huff_ac,
                restart_interval,
            )
        pos += seglen
    if progressive and scans_decoded:
        return _reconstruct_progressive(frame, coef, quant)
    raise ValueError("jpeg: no scan data found")


def _decode_scan(
    data: bytes,
    pos: int,
    frame: tuple,
    scan: list[tuple[int, int, int]],
    quant: dict[int, np.ndarray],
    huff_dc: dict,
    huff_ac: dict,
    restart_interval: int,
) -> np.ndarray:
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))

    by_id = {c[0]: c for c in comps}
    order = [by_id[cs] for cs, _, _ in scan]
    tables = {cs: (td, ta) for cs, td, ta in scan}

    planes = {
        cid: np.zeros((mcus_y * vv * 8, mcus_x * hh * 8)) for cid, hh, vv, _ in comps
    }
    reader = _BitReader(data, pos)
    prev = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                prev = {cid: 0 for cid in prev}
            for cid, hh, vv, tq in order:
                td, ta = tables[cid]
                for by in range(vv):
                    for bx in range(hh):
                        block = _decode_block(
                            reader, huff_dc[td], huff_ac[ta], prev, cid
                        )
                        pix = _C.T @ (block * quant[tq]) @ _C + 128.0
                        y0 = (my * vv + by) * 8
                        x0 = (mx * hh + bx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = pix
            mcu_count += 1

    return _planes_to_rgb(planes, comps, fh, fw, hmax, vmax)


def _planes_to_rgb(
    planes: dict, comps: list, fh: int, fw: int, hmax: int, vmax: int
) -> np.ndarray:
    """Shared decode tail: upsample each component plane to frame
    resolution (nearest), crop, and color-convert."""
    out_planes = []
    for cid, hh, vv, _ in comps:
        p = planes[cid]
        if hh != hmax or vv != vmax:
            p = np.repeat(np.repeat(p, vmax // vv, axis=0), hmax // hh, axis=1)
        out_planes.append(p[:fh, :fw])

    if len(out_planes) == 1:
        g = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(
    reader: _BitReader,
    dc_table: dict,
    ac_table: dict,
    prev: dict,
    cid: int,
) -> np.ndarray:
    zz = np.zeros(64, dtype=np.int64)
    size = reader.decode_symbol(dc_table)
    diff = _extend(reader.receive(size), size) if size else 0
    prev[cid] += diff
    zz[0] = prev[cid]
    i = 1
    while i < 64:
        sym = reader.decode_symbol(ac_table)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            i += 16
            continue
        run, size = sym >> 4, sym & 0x0F
        i += run
        if i >= 64:
            raise ValueError("jpeg: AC coefficient index out of range")
        zz[i] = _extend(reader.receive(size), size)
        i += 1
    block = np.zeros(64, dtype=np.int64)
    block[ZIGZAG] = zz
    return block.reshape(8, 8).astype(np.float64)


# ------------------------------------------------------- progressive decode
#
# T.81 Annex G semantics, mirroring the layout every real-world
# progressive decoder implements: DC scans (interleaved when the scan
# carries several components), single-component non-interleaved AC
# scans, EOB runs, and successive-approximation refinement with
# correction bits. Coefficients accumulate across scans in zigzag
# order per block; IDCT happens once at end-of-image.


def _comp_block_dims(frame: tuple, comp: tuple) -> tuple[int, int]:
    """True (non-MCU-padded) block-grid dims of one component — the
    walk order of non-interleaved scans."""
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    _cid, hh, vv, _tq = comp
    cw = -(-fw * hh // hmax)
    ch = -(-fh * vv // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_progressive_scan(
    data: bytes,
    pos: int,
    frame: tuple,
    scan: list[tuple[int, int, int]],
    band: tuple[int, int, int, int],
    coef: dict[int, np.ndarray],
    huff_dc: dict,
    huff_ac: dict,
    restart_interval: int,
) -> int:
    """Decode one progressive scan into the coefficient accumulator;
    returns the stream position after the entropy-coded segment."""
    fh, fw, comps = frame
    ss, se, ah, al = band
    by_id = {c[0]: c for c in comps}
    reader = _BitReader(data, pos)

    if ss == 0:
        if se != 0:
            raise ValueError("jpeg: DC scan must have Se == 0")
        prev = {cs: 0 for cs, _, _ in scan}
        if len(scan) > 1:  # interleaved MCU walk over padded grids
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcx = -(-fw // (8 * hmax))
            mcy = -(-fh // (8 * vmax))
            mcu = 0
            for my in range(mcy):
                for mx in range(mcx):
                    if (
                        restart_interval
                        and mcu
                        and mcu % restart_interval == 0
                    ):
                        reader.sync_restart()
                        prev = {cs: 0 for cs in prev}
                    mcu += 1
                    for cs, td, _ta in scan:
                        _cid, hh, vv, _tq = by_id[cs]
                        arr = coef[cs]
                        for by in range(vv):
                            for bx in range(hh):
                                _dc_unit(
                                    reader,
                                    arr[my * vv + by, mx * hh + bx],
                                    huff_dc.get(td),
                                    prev,
                                    cs,
                                    ah,
                                    al,
                                )
        else:  # single component: raster walk over true dims
            cs, td, _ta = scan[0]
            bh, bw = _comp_block_dims(frame, by_id[cs])
            arr = coef[cs]
            blk = 0
            for gy in range(bh):
                for gx in range(bw):
                    if (
                        restart_interval
                        and blk
                        and blk % restart_interval == 0
                    ):
                        reader.sync_restart()
                        prev = {cs: 0}
                    blk += 1
                    _dc_unit(
                        reader, arr[gy, gx], huff_dc.get(td), prev, cs, ah, al
                    )
        return reader.pos

    # AC scan: spec requires exactly one component
    if len(scan) != 1:
        raise ValueError("jpeg: progressive AC scan must be single-component")
    cs, _td, ta = scan[0]
    bh, bw = _comp_block_dims(frame, by_id[cs])
    arr = coef[cs]
    table = huff_ac[ta]
    p1 = 1 << al
    m1 = -p1
    eobrun = 0
    blk = 0
    for gy in range(bh):
        for gx in range(bw):
            if restart_interval and blk and blk % restart_interval == 0:
                reader.sync_restart()
                eobrun = 0
            blk += 1
            zz = arr[gy, gx]
            if ah == 0:  # first pass for this band
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    sym = reader.decode_symbol(table)
                    r, s = sym >> 4, sym & 0x0F
                    if s:
                        k += r
                        if k > se:
                            raise ValueError("jpeg: AC index beyond band")
                        zz[k] = _extend(reader.receive(s), s) << al
                        k += 1
                    elif r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.receive(r)
                        break
                    else:
                        k += 16  # ZRL
            else:  # refinement pass
                k = ss
                if eobrun == 0:
                    while k <= se:
                        sym = reader.decode_symbol(table)
                        r, s = sym >> 4, sym & 0x0F
                        if s == 0:
                            if r < 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += reader.receive(r)
                                break
                            val = 0  # ZRL: 16 zero-history positions
                        else:
                            if s != 1:
                                raise ValueError(
                                    "jpeg: refinement symbol size != 1"
                                )
                            val = p1 if reader.read_bit() else m1
                        while k <= se:
                            if zz[k] != 0:
                                if (
                                    reader.read_bit()
                                    and (int(zz[k]) & p1) == 0
                                ):
                                    zz[k] += p1 if zz[k] >= 0 else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= se:
                            zz[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if zz[k] != 0:
                            if reader.read_bit() and (int(zz[k]) & p1) == 0:
                                zz[k] += p1 if zz[k] >= 0 else m1
                        k += 1
                    eobrun -= 1
    return reader.pos


def _dc_unit(
    reader: _BitReader,
    zz: np.ndarray,
    dc_table: dict | None,
    prev: dict,
    cs: int,
    ah: int,
    al: int,
) -> None:
    if ah == 0:  # first DC pass: Huffman-coded diffs of (DC >> Al)
        size = reader.decode_symbol(dc_table)
        diff = _extend(reader.receive(size), size) if size else 0
        prev[cs] += diff
        zz[0] = prev[cs] << al
    else:  # refinement: one raw bit per block
        if reader.read_bit():
            zz[0] = int(zz[0]) | (1 << al)


def _reconstruct_progressive(
    frame: tuple, coef: dict[int, np.ndarray], quant: dict[int, np.ndarray]
) -> np.ndarray:
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = {}
    for cid, _hh, _vv, tq in comps:
        zz = coef[cid]
        gh, gw = zz.shape[:2]
        nat = np.zeros_like(zz)
        nat[:, :, ZIGZAG] = zz
        deq = nat.astype(np.float64) * quant[tq].reshape(64)[None, None, :]
        blocks = deq.reshape(gh, gw, 8, 8)
        pix = np.einsum("ka,ijkl,lb->ijab", _C, blocks, _C) + 128.0
        planes[cid] = pix.transpose(0, 2, 1, 3).reshape(gh * 8, gw * 8)
    return _planes_to_rgb(planes, comps, fh, fw, hmax, vmax)


# ------------------------------------------------------- progressive encode


def _build_huffman_table(freq: dict[int, int]) -> tuple[list[int], list[int]]:
    """Optimal length-limited Huffman table from symbol frequencies —
    the T.81 Annex K.2 reference procedure (code-size derivation with
    the reserved symbol 256, BITS counting, and the 16-bit length
    adjustment), so every progressive scan ships a table fitted to
    its own symbol mix."""
    f = [0] * 257
    for sym, c in freq.items():
        f[sym] = c
    f[256] = 1  # reserved: keeps the all-ones code unassigned
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        v1, least1 = -1, None
        v2, least2 = -1, None
        for i in range(257):
            fi = f[i]
            if fi <= 0:
                continue
            if least1 is None or fi < least1 or (fi == least1 and i > v1):
                v2, least2 = v1, least1
                v1, least1 = i, fi
            elif least2 is None or fi < least2 or (fi == least2 and i > v2):
                v2, least2 = i, fi
        if v2 == -1:
            break
        f[v1] += f[v2]
        f[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    i = 32  # limit code lengths to 16 (Annex K.2 Figure K.3)
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the reserved symbol's code
    pairs = sorted((codesize[s], s) for s in range(256) if codesize[s])
    return bits[1:17], [s for _, s in pairs]


class _FreqSink:
    """Pass-1 sink: count Huffman symbols, ignore raw bits."""

    def __init__(self) -> None:
        self.freq: dict[int, int] = {}

    def sym(self, s: int) -> None:
        self.freq[s] = self.freq.get(s, 0) + 1

    def bits(self, _v: int, _n: int) -> None:
        pass


class _WriteSink:
    """Pass-2 sink: emit through the shared entropy bit-writer."""

    def __init__(self, writer: _BitWriter, codes: dict) -> None:
        self.writer = writer
        self.codes = codes

    def sym(self, s: int) -> None:
        code, ln = self.codes[s]
        self.writer.write(code, ln)

    def bits(self, v: int, n: int) -> None:
        if n:
            self.writer.write(v, n)


def _emit_ac_first(sink, blocks_zz: np.ndarray, ss: int, se: int, al: int):
    """First AC pass over one component's true block grid: run/size
    coding of (coef -> point-transformed) values with EOB-run
    accumulation (capped at the spec's 0x7FFF)."""
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            sink.sym(n << 4)
            sink.bits(eobrun - (1 << n), n)
            eobrun = 0

    for zz in blocks_zz.reshape(-1, 64):
        r = 0
        for k in range(ss, se + 1):
            t = int(zz[k])
            t = (t >> al) if t >= 0 else -((-t) >> al)
            if t == 0:
                r += 1
                continue
            flush()
            while r > 15:
                sink.sym(0xF0)
                r -= 16
            s = _category(t)
            sink.sym((r << 4) | s)
            sink.bits(t if t > 0 else t + (1 << s) - 1, s)
            r = 0
        if r:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _emit_ac_refine(sink, blocks_zz: np.ndarray, ss: int, se: int, al: int):
    """AC refinement pass: correction bits for already-significant
    coefficients, ±1<<Al for newly-significant ones, EOB runs carrying
    buffered correction bits — the classic refinement layout."""
    eobrun = 0
    pending: list[int] = []

    def flush() -> None:
        nonlocal eobrun, pending
        if eobrun:
            n = eobrun.bit_length() - 1
            sink.sym(n << 4)
            sink.bits(eobrun - (1 << n), n)
            eobrun = 0
        for b in pending:
            sink.bits(b, 1)
        pending = []

    for zz in blocks_zz.reshape(-1, 64):
        absv = [0] * (se + 1)
        eob = ss - 1  # index of the last newly-significant coefficient
        for k in range(ss, se + 1):
            t = int(zz[k])
            t = (t if t >= 0 else -t) >> al
            absv[k] = t
            if t == 1:
                eob = k
        r = 0
        br: list[int] = []
        for k in range(ss, se + 1):
            t = absv[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                flush()
                sink.sym(0xF0)
                for b in br:
                    sink.bits(b, 1)
                br = []
                r -= 16
            if t > 1:  # already significant: buffer its correction bit
                br.append(t & 1)
                continue
            flush()  # newly significant at this level
            sink.sym((r << 4) | 1)
            sink.bits(1 if int(zz[k]) >= 0 else 0, 1)
            for b in br:
                sink.bits(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF:
                flush()
    flush()


def _encode_progressive(
    h: int,
    w: int,
    qy: np.ndarray,
    qc: np.ndarray,
    grids: list[np.ndarray],
    hy: int,
    vy: int,
    mcus_x: int,
    mcus_y: int,
) -> bytes:
    """Assemble the progressive (SOF2) stream from the quantized
    block grids the baseline path produced: a 10-scan script (DC
    first at Al=1; split-band AC firsts at Al=1; DC refinement; AC
    refinements to Al=0) with per-scan optimized Huffman tables.
    Decodes to pixels identical to the baseline stream at the same
    quality — same coefficients, different entropy layout."""
    zz_grids = [g.reshape(g.shape[0], g.shape[1], 64)[:, :, ZIGZAG]
                for g in grids]
    samp = [(hy, vy), (1, 1), (1, 1)]
    frame = (h, w, [(1, hy, vy, 0), (2, 1, 1, 1), (3, 1, 1, 1)])

    out = bytearray()
    out += JPEG_MAGIC
    out += _marker(
        0xE0,
        b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00",
    )
    out += _marker(0xDB, bytes([0]) + bytes(int(v) for v in qy.reshape(64)[ZIGZAG]))
    out += _marker(0xDB, bytes([1]) + bytes(int(v) for v in qc.reshape(64)[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (hy << 4) | vy, 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += _marker(0xC2, sof)
    out += _marker(0xC4, _dht_payload(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    out += _marker(0xC4, _dht_payload(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))

    def sos_header(comps: list[tuple[int, int, int]], ss, se, ah, al) -> bytes:
        body = bytes([len(comps)])
        for cs, td, ta in comps:
            body += bytes([cs, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return _marker(0xDA, body)

    # scan 1: DC first, all components interleaved, Al=1
    writer = _BitWriter()
    prev = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(3):
                hh, vv = samp[ci]
                codes = _canonical_codes(
                    *(DC_LUMA_BITS, DC_LUMA_VALS)
                    if ci == 0
                    else (DC_CHROMA_BITS, DC_CHROMA_VALS)
                )
                for by in range(vv):
                    for bx in range(hh):
                        dc = int(zz_grids[ci][my * vv + by, mx * hh + bx, 0])
                        t = dc >> 1
                        diff = t - prev[ci]
                        prev[ci] = t
                        s = _category(diff)
                        code, ln = codes[s]
                        writer.write(code, ln)
                        if s:
                            amp = diff if diff > 0 else diff + (1 << s) - 1
                            writer.write(amp, s)
    writer.flush()
    out += sos_header([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 0, 1)
    out += writer.out

    # true (non-padded) block dims per component for AC scans
    true_dims = [_comp_block_dims(frame, frame[2][ci]) for ci in range(3)]

    def ac_scan(ci: int, ss: int, se: int, ah: int, al: int) -> None:
        nonlocal out
        bh, bw = true_dims[ci]
        blocks = zz_grids[ci][:bh, :bw]
        emitter = _emit_ac_refine if ah else _emit_ac_first
        counter = _FreqSink()
        emitter(counter, blocks, ss, se, al)
        bits, vals = _build_huffman_table(counter.freq)
        out += _marker(0xC4, _dht_payload(1, 0, bits, vals))
        writer = _BitWriter()
        emitter(_WriteSink(writer, _canonical_codes(bits, vals)),
                blocks, ss, se, al)
        writer.flush()
        out += sos_header([(ci + 1, 0, 0)], ss, se, ah, al)
        out += writer.out

    # scans 2-5: AC first passes at Al=1 (split luma band)
    ac_scan(0, 1, 5, 0, 1)
    ac_scan(0, 6, 63, 0, 1)
    ac_scan(1, 1, 63, 0, 1)
    ac_scan(2, 1, 63, 0, 1)

    # scan 6: DC refinement (raw bits, no Huffman)
    writer = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(3):
                hh, vv = samp[ci]
                for by in range(vv):
                    for bx in range(hh):
                        dc = int(zz_grids[ci][my * vv + by, mx * hh + bx, 0])
                        writer.write(dc & 1, 1)
    writer.flush()
    out += sos_header([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 1, 0)
    out += writer.out

    # scans 7-10: AC refinement passes down to Al=0
    ac_scan(0, 1, 5, 1, 0)
    ac_scan(0, 6, 63, 1, 0)
    ac_scan(1, 1, 63, 1, 0)
    ac_scan(2, 1, 63, 1, 0)

    out += b"\xff\xd9"
    return bytes(out)


def jpeg_exif_gps(data: bytes) -> tuple[float, float] | None:
    """(latitude, longitude) in signed decimal degrees from a JPEG's
    EXIF GPS IFD (IFD0 tag 0x8825 → GPS tags 1-4: refs + deg/min/sec
    rationals), or None when absent/unparseable. Geotags are PII — a
    release pipeline audits and strips them (strip_jpeg_exif)."""
    blob = _exif_blob(data)
    if blob is None:
        return None
    e = "<" if blob[:2] == b"II" else ">"
    try:
        magic, ifd0 = struct.unpack_from(e + "HI", blob, 2)
        if magic != 42:
            return None
        gps_off = None
        (n,) = struct.unpack_from(e + "H", blob, ifd0)
        for i in range(n):
            off = ifd0 + 2 + 12 * i
            t, typ, _cnt, val = struct.unpack_from(e + "HHII", blob, off)
            if t == 0x8825:
                gps_off = val
        if gps_off is None or gps_off + 2 > len(blob):
            return None
        refs: dict[int, str] = {}
        rats: dict[int, tuple] = {}
        (n,) = struct.unpack_from(e + "H", blob, gps_off)
        for i in range(n):
            off = gps_off + 2 + 12 * i
            t, typ, cnt, val = struct.unpack_from(e + "HHII", blob, off)
            if t in (1, 3) and typ == 2:  # ASCII ref ('N'/'S'/'E'/'W')
                raw = (
                    struct.pack(e + "I", val)
                    if cnt <= 4
                    else blob[val : val + cnt]
                )
                refs[t] = raw[:1].decode("ascii", "replace")
            elif t in (2, 4) and typ == 5 and cnt == 3:  # 3 RATIONALs
                if val + 24 > len(blob):
                    return None
                parts = struct.unpack_from(e + "IIIIII", blob, val)
                rats[t] = parts
        if 2 not in rats or 4 not in rats:
            return None

        def to_deg(p: tuple) -> float:
            dn, dd, mn, md, sn, sd = p
            if not (dd and md and sd):
                return float("nan")
            return dn / dd + mn / (60.0 * md) + sn / (3600.0 * sd)

        lat = to_deg(rats[2])
        lon = to_deg(rats[4])
        if lat != lat or lon != lon:  # NaN guard
            return None
        if refs.get(1, "N") == "S":
            lat = -lat
        if refs.get(3, "E") == "W":
            lon = -lon
        return lat, lon
    except struct.error:
        return None


def _exif_blob(data: bytes) -> bytes | None:
    """The APP1 EXIF TIFF blob, or None."""
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        tag = data[pos + 1]
        if tag in (0xD8, 0x01) or 0xD0 <= tag <= 0xD7:
            pos += 2
            continue
        if tag in (0xDA, 0xD9):
            return None
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if tag == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
            blob = data[pos + 10 : pos + 2 + seglen]
            return blob if len(blob) >= 8 and blob[:2] in (b"II", b"MM") else None
        pos += 2 + seglen
    return None


def strip_jpeg_exif(data: bytes) -> bytes:
    """Remove every APP1 segment (EXIF + XMP) from a JPEG — the
    standard metadata scrub before publishing a dataset. Entropy data
    and all other segments pass through byte-identical; a caller that
    needs the orientation must bake it into pixels FIRST (decode_jpeg
    already applies it)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (missing SOI)")
    out = bytearray(b"\xff\xd8")
    pos = 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            out += data[pos:]
            break
        tag = data[pos + 1]
        if tag in (0x01,) or 0xD0 <= tag <= 0xD9:
            out += data[pos : pos + 2]
            pos += 2
            continue
        if tag == 0xDA:  # SOS: copy the rest verbatim
            out += data[pos:]
            break
        if pos + 4 > len(data):
            out += data[pos:]
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if tag != 0xE1:
            out += data[pos : pos + 2 + seglen]
        pos += 2 + seglen
    return bytes(out)


def build_jpeg_exif(
    jpeg: bytes,
    orientation: int = 1,
    gps: tuple[float, float] | None = None,
) -> bytes:
    """Insert a minimal APP1 EXIF segment (little-endian TIFF blob:
    IFD0 orientation + optional GPS IFD with deg/min/sec rationals)
    after the SOI — the encode side of jpeg_exif_orientation /
    jpeg_exif_gps, used by fixtures and tests."""
    if not is_jpeg(jpeg):
        raise ValueError("not a JPEG (missing SOI)")
    entries0 = [(274, 3, 1, orientation)]
    gps_entries = b""
    tail = b""
    if gps is not None:
        entries0.append((0x8825, 4, 1, 38))

    def ifd(entries: list[tuple], next_off: int = 0) -> bytes:
        out = struct.pack("<H", len(entries))
        for t, typ, cnt, val in entries:
            out += struct.pack("<HHII", t, typ, cnt, val)
        return out + struct.pack("<I", next_off)

    ifd0 = ifd(entries0)
    blob = b"II" + struct.pack("<HI", 42, 8) + ifd0
    if gps is not None:
        lat, lon = gps
        gps_off = 8 + len(ifd0)  # == 38 with two IFD0 entries
        assert gps_off == 38
        rat_base = gps_off + 2 + 4 * 12 + 4

        def rats(v: float) -> bytes:
            v = abs(v)
            d = int(v)
            m = int((v - d) * 60)
            s = round(((v - d) * 60 - m) * 60 * 1000)
            return struct.pack("<IIIIII", d, 1, m, 1, s, 1000)

        lat_ref = b"N\x00\x00\x00" if lat >= 0 else b"S\x00\x00\x00"
        lon_ref = b"E\x00\x00\x00" if lon >= 0 else b"W\x00\x00\x00"
        gps_entries = struct.pack("<H", 4)
        gps_entries += struct.pack("<HHI", 1, 2, 2) + lat_ref
        gps_entries += struct.pack("<HHII", 2, 5, 3, rat_base)
        gps_entries += struct.pack("<HHI", 3, 2, 2) + lon_ref
        gps_entries += struct.pack("<HHII", 4, 5, 3, rat_base + 24)
        gps_entries += struct.pack("<I", 0)
        tail = rats(lat) + rats(lon)
        blob += gps_entries + tail
    payload = b"Exif\x00\x00" + blob
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return jpeg[:2] + app1 + jpeg[2:]

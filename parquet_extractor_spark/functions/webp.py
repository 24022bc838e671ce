"""Dependency-free WebP container parsing (metadata level).

Same treatment the r06 MP4/WebM work gave video: the RIFF container
walk and the three bitstream headers (lossy VP8 frame header,
lossless VP8L header, extended VP8X canvas header) are parsed for
real from the public container spec (RFC 9649), yielding the fields
a training pipeline filters on — pixel dimensions, alpha, animation —
without decoding pixels. Pixel DECODE stays the declared boundary
(operators/multimodal.py:119): VP8 is a full video-intra codec and
VP8L a full entropy-coded format; both need libwebp.

Layout facts used (all from the spec):
- RIFF: ``RIFF`` + u32le riff_size + ``WEBP``, then chunks of
  fourcc + u32le size + payload (+1 pad byte when size is odd).
- ``VP8 `` (lossy): 3-byte frame tag, 3-byte start code
  ``9D 01 2A``, then u16le width / u16le height, each 14 bits of
  size + 2 bits of scale.
- ``VP8L`` (lossless): signature byte ``0x2F``, then a u32le packing
  width-1 (14 bits), height-1 (14 bits), alpha_is_used (1 bit),
  version (3 bits).
- ``VP8X`` (extended): flags byte (ICC 0x20, Alpha 0x10, EXIF 0x08,
  XMP 0x04, Animation 0x02), 3 reserved bytes, canvas width-1 u24le,
  canvas height-1 u24le; ANIM/ANMF/ALPH/… follow as sibling chunks.
"""

from __future__ import annotations

import struct

WEBP_FLAG_ICC = 0x20
WEBP_FLAG_ALPHA = 0x10
WEBP_FLAG_EXIF = 0x08
WEBP_FLAG_XMP = 0x04
WEBP_FLAG_ANIM = 0x02


def is_webp(data: bytes | None) -> bool:
    return (
        data is not None
        and len(data) >= 16
        and data[:4] == b"RIFF"
        and data[8:12] == b"WEBP"
    )


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def build_webp(
    width: int,
    height: int,
    variant: str = "vp8",
    alpha: bool = False,
    animated: bool = False,
    payload_bytes: int = 24,
) -> bytes:
    """Spec-valid WebP container with a real header and a filler
    bitstream body (pixel data is opaque to the metadata pass — the
    parser must not read past the header fields)."""
    filler = bytes((7 * i + 3) % 256 for i in range(payload_bytes))
    if variant == "vp8":
        if alpha or animated:
            raise ValueError("plain VP8 has no alpha/animation bits")
        frame_tag = b"\x50\x00\x00"  # keyframe, version 0, show_frame
        body = frame_tag + b"\x9d\x01\x2a"
        body += struct.pack("<HH", width & 0x3FFF, height & 0x3FFF)
        chunks = _chunk(b"VP8 ", body + filler)
    elif variant == "vp8l":
        if animated:
            raise ValueError("VP8L has no animation bit")
        packed = (
            ((width - 1) & 0x3FFF)
            | (((height - 1) & 0x3FFF) << 14)
            | ((1 if alpha else 0) << 28)
        )
        chunks = _chunk(b"VP8L", b"\x2f" + struct.pack("<I", packed) + filler)
    elif variant == "vp8x":
        flags = (WEBP_FLAG_ALPHA if alpha else 0) | (
            WEBP_FLAG_ANIM if animated else 0
        )
        head = (
            bytes([flags])
            + b"\x00\x00\x00"
            + (width - 1).to_bytes(3, "little")
            + (height - 1).to_bytes(3, "little")
        )
        chunks = _chunk(b"VP8X", head)
        if animated:
            # ANIM: u32 background color + u16le loop count
            chunks += _chunk(b"ANIM", struct.pack("<IH", 0xFF000000, 0))
        chunks += _chunk(b"VP8 ", b"\x50\x00\x00\x9d\x01\x2a" + filler)
    else:
        raise ValueError(f"unknown WebP variant {variant!r}")
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks


def build_webp_lossless(arr, mode: str = "auto") -> bytes:
    """RIFF-wrapped VP8L encode of an (H, W, 3) uint8 array — the
    WRITE side of the r06 lossless-WebP boundary closure (pixel codec
    in ``functions/vp8l.py``)."""
    from parquet_extractor_spark.functions.vp8l import encode_vp8l

    chunk = _chunk(b"VP8L", encode_vp8l(arr, mode=mode))
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def decode_webp(data: bytes):
    """Decode a WebP container to (H, W, 3) uint8 RGB. Lossless VP8L
    decodes for real (``functions/vp8l.py``); the chunk walk also
    reaches a VP8L chunk behind a VP8X extended header. Lossy ``VP8 ``
    frames are the remaining declared boundary."""
    if not is_webp(data):
        raise ValueError("not a WebP container")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if pos + 8 + size > len(data):
            raise ValueError("truncated WebP chunk payload")
        if fourcc == b"VP8L":
            from parquet_extractor_spark.functions.vp8l import decode_vp8l

            return decode_vp8l(data[pos + 8 : pos + 8 + size])
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 frame decode needs libwebp; only lossless "
                "VP8L pixels decode here"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("WebP container has no VP8/VP8L bitstream chunk")


def webp_metadata(data: bytes) -> tuple[str, int, int, bool, bool]:
    """Parse (variant, width, height, has_alpha, is_animated) from a
    WebP container's first bitstream chunk. Raises ValueError on
    malformed input — callers map that to NULL metadata columns."""
    if not is_webp(data):
        raise ValueError("not a WebP container")
    pos = 12
    if pos + 8 > len(data):
        raise ValueError("truncated WebP chunk header")
    fourcc = data[pos : pos + 4]
    size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
    if pos + 8 + size > len(data):
        raise ValueError("truncated WebP chunk payload")
    # slice only the header prefix — never copy the bitstream body, so
    # a 50 MB asset parses in the same ~2 µs as a 50 B one (SCALE.md)
    head = data[pos + 8 : pos + 8 + min(size, 16)]
    if fourcc == b"VP8 ":
        if size < 10 or head[3:6] != b"\x9d\x01\x2a":
            raise ValueError("bad VP8 start code")
        w_raw, h_raw = struct.unpack("<HH", head[6:10])
        return ("vp8", w_raw & 0x3FFF, h_raw & 0x3FFF, False, False)
    if fourcc == b"VP8L":
        if size < 5 or head[0] != 0x2F:
            raise ValueError("bad VP8L signature")
        packed = struct.unpack("<I", head[1:5])[0]
        return (
            "vp8l",
            (packed & 0x3FFF) + 1,
            ((packed >> 14) & 0x3FFF) + 1,
            bool((packed >> 28) & 1),
            False,
        )
    if fourcc == b"VP8X":
        if size < 10:
            raise ValueError("short VP8X header")
        flags = head[0]
        width = int.from_bytes(head[4:7], "little") + 1
        height = int.from_bytes(head[7:10], "little") + 1
        return (
            "vp8x",
            width,
            height,
            bool(flags & WEBP_FLAG_ALPHA),
            bool(flags & WEBP_FLAG_ANIM),
        )
    raise ValueError(f"unsupported first chunk {fourcc!r}")

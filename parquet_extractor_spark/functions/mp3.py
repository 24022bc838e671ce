"""MP2/MP3 frame-HEADER parser: metadata-level, no audio decode.

Closes the r03 codec-boundary item for MP3 the way the verdict
suggested: a training-data pipeline mostly needs *metadata* features
from compressed audio (duration, bitrate, sample rate, channel count,
CBR/VBR) — all of which live in the 4-byte frame headers, whose
layout is public spec (ISO/IEC 11172-3 §2.4.1.3 for MPEG-1,
ISO/IEC 13818-3 for MPEG-2, plus the de-facto MPEG-2.5 extension and
the ID3v2.3/2.4 tag header). Full PCM decode (hybrid filterbank,
Huffman) stays a declared ``NotImplementedError`` boundary — see
``decode_mp3_samples``.

Reference scope: the reference repo has no audio handling at all
(north-star extension, same status as functions/wav.py).

``build_mp3_stream`` synthesizes spec-valid frame sequences with
zeroed payloads — NOT decodable audio, but byte-exact framing — so
fixtures and the DuckDB literal oracle can pin the parser's output
without shipping real recordings.
"""

from __future__ import annotations

# bitrate tables, kbps, indexed 1..14 (0 = "free", 15 = forbidden) —
# ISO/IEC 11172-3 Table B.1 / 13818-3
_BITRATES = {
    # (version_family, layer): index 1..14
    ("1", 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    ("1", 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    ("1", 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    ("2", 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    ("2", 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    ("2", 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}

_SAMPLE_RATES = {
    # version bits -> (idx0, idx1, idx2); idx3 reserved
    3: (44100, 48000, 32000),  # MPEG-1
    2: (22050, 24000, 16000),  # MPEG-2
    0: (11025, 12000, 8000),  # MPEG-2.5
}

_VERSION_NAME = {3: "1", 2: "2", 0: "2.5"}


def _samples_per_frame(version_bits: int, layer: int) -> int:
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    # layer III: halved for MPEG-2/2.5 (lsf)
    return 1152 if version_bits == 3 else 576


def is_mp3(data: bytes | None) -> bool:
    """ID3v2 tag or a valid frame sync at offset 0."""
    if not data or len(data) < 4:
        return False
    if data[:3] == b"ID3":
        return True
    return _parse_frame_header(data, 0) is not None


def _id3v2_size(data: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if none)."""
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    # syncsafe int: 4 × 7 bits
    size = (
        ((data[6] & 0x7F) << 21)
        | ((data[7] & 0x7F) << 14)
        | ((data[8] & 0x7F) << 7)
        | (data[9] & 0x7F)
    )
    footer = 10 if data[5] & 0x10 else 0
    return 10 + size + footer


def _parse_frame_header(data: bytes, off: int) -> dict | None:
    """Parse one 32-bit frame header at ``off``; None if invalid."""
    if off + 4 > len(data):
        return None
    b0, b1, b2, b3 = data[off], data[off + 1], data[off + 2], data[off + 3]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version_bits = (b1 >> 3) & 0x3
    if version_bits == 1:  # reserved
        return None
    layer_bits = (b1 >> 1) & 0x3
    if layer_bits == 0:  # reserved
        return None
    layer = 4 - layer_bits  # 3->I, 2->II, 1->III
    bitrate_idx = (b2 >> 4) & 0xF
    if bitrate_idx in (0, 15):  # free-format / forbidden: not handled
        return None
    sr_idx = (b2 >> 2) & 0x3
    if sr_idx == 3:
        return None
    padding = (b2 >> 1) & 0x1
    channel_mode = (b3 >> 6) & 0x3
    family = "1" if version_bits == 3 else "2"
    bitrate_kbps = _BITRATES[(family, layer)][bitrate_idx - 1]
    sample_rate = _SAMPLE_RATES[version_bits][sr_idx]
    spf = _samples_per_frame(version_bits, layer)
    if layer == 1:
        frame_len = (12 * bitrate_kbps * 1000 // sample_rate + padding) * 4
    else:
        frame_len = spf // 8 * bitrate_kbps * 1000 // sample_rate + padding
    return {
        "version": _VERSION_NAME[version_bits],
        "layer": layer,
        "bitrate_kbps": bitrate_kbps,
        "sample_rate": sample_rate,
        "channels": 1 if channel_mode == 3 else 2,
        "frame_len": frame_len,
        "samples_per_frame": spf,
    }


def _parse_xing(data: bytes, off: int, hdr: dict, version_bits: int) -> dict:
    """Xing/Info VBR header inside the frame starting at ``off``.

    The de-facto Xing spec places the tag right after the side-info
    block of the first frame: side-info length is 32 (MPEG-1 stereo) /
    17 (MPEG-1 mono) / 17 (MPEG-2/2.5 stereo) / 9 (MPEG-2/2.5 mono),
    plus 2 bytes when the header's protection bit signals a CRC.
    Magic is ``Xing`` (VBR) or ``Info`` (CBR), then a 4-byte BE flag
    word: bit0 = frame count present, bit1 = byte count present
    (bit2 TOC and bit3 quality are skipped). Returns
    ``{xing_tag, xing_frames, xing_bytes}`` with Nones when absent.
    """
    out = {"xing_tag": None, "xing_frames": None, "xing_bytes": None}
    mono = hdr["channels"] == 1
    if version_bits == 3:  # MPEG-1
        side = 17 if mono else 32
    else:  # MPEG-2 / 2.5 (lsf)
        side = 9 if mono else 17
    crc = 0 if (data[off + 1] & 0x1) else 2  # protection bit 0 => CRC
    pos = off + 4 + crc + side
    if pos + 8 > len(data) or pos + 8 > off + hdr["frame_len"]:
        return out
    magic = data[pos:pos + 4]
    if magic not in (b"Xing", b"Info"):
        return out
    out["xing_tag"] = magic.decode("ascii")
    flags = int.from_bytes(data[pos + 4:pos + 8], "big")
    p = pos + 8
    if flags & 1 and p + 4 <= len(data):
        out["xing_frames"] = int.from_bytes(data[p:p + 4], "big")
        p += 4
    if flags & 2 and p + 4 <= len(data):
        out["xing_bytes"] = int.from_bytes(data[p:p + 4], "big")
    return out


def parse_mp3_metadata(data: bytes | None) -> dict | None:
    """Walk the frame chain and aggregate stream metadata.

    Returns ``{version, layer, sample_rate, channels, n_frames,
    bitrate_kbps, vbr, duration_ms, xing_tag, xing_frames,
    xing_bytes}`` or None when no valid frame chain starts at the
    head (after any ID3v2 tag). bitrate_kbps is the per-frame
    average (== the constant rate for CBR); duration is
    Σ samples_per_frame / sample_rate over parsed frames — the exact
    header-walk duration, not the header-count estimate. The xing_*
    keys report the first frame's Xing/Info tag verbatim (Nones when
    absent) — the walk's own counts stay authoritative, the tag is
    surfaced so a caller can cross-check a stream whose tail was
    truncated.
    """
    if not data:
        return None
    off = _id3v2_size(data)
    n_frames = 0
    bitrate_sum = 0
    duration_num = 0  # Σ samples_per_frame (sample_rate fixed per stream)
    first = None
    xing = {"xing_tag": None, "xing_frames": None, "xing_bytes": None}
    while off + 4 <= len(data):
        hdr = _parse_frame_header(data, off)
        if hdr is None:
            break
        if off + hdr["frame_len"] > len(data):
            break  # truncated final frame: count only complete frames
        if first is None:
            first = hdr
            xing = _parse_xing(
                data, off, hdr, (data[off + 1] >> 3) & 0x3
            )
        elif (
            hdr["sample_rate"] != first["sample_rate"]
            or hdr["layer"] != first["layer"]
        ):
            break  # mid-stream parameter change: stop at the clean prefix
        n_frames += 1
        bitrate_sum += hdr["bitrate_kbps"]
        duration_num += hdr["samples_per_frame"]
        off += hdr["frame_len"]
    if first is None or n_frames == 0:
        return None
    return {
        "version": first["version"],
        "layer": first["layer"],
        "sample_rate": first["sample_rate"],
        "channels": first["channels"],
        "n_frames": n_frames,
        "bitrate_kbps": bitrate_sum // n_frames,
        "vbr": bitrate_sum != first["bitrate_kbps"] * n_frames,
        "duration_ms": duration_num * 1000 // first["sample_rate"],
        **xing,
    }


def decode_mp3_samples(data: bytes) -> "object":
    """Full MP3 PCM decode — declared capability boundary. The hybrid
    polyphase/MDCT filterbank and Huffman tables are out of scope for
    a metadata pipeline; production would call ffmpeg/librosa here.
    Header-level metadata (duration/bitrate/layout) is fully supported
    via ``parse_mp3_metadata``."""
    raise NotImplementedError(
        "MP3 PCM decode requires ffmpeg/librosa (not in this container); "
        "frame-header metadata is available via parse_mp3_metadata"
    )


def _build_frame_header(
    version_bits: int,
    layer: int,
    bitrate_kbps: int,
    sample_rate: int,
    padding: int,
    channel_mode: int,
) -> bytes:
    family = "1" if version_bits == 3 else "2"
    bitrate_idx = _BITRATES[(family, layer)].index(bitrate_kbps) + 1
    sr_idx = _SAMPLE_RATES[version_bits].index(sample_rate)
    b1 = 0xE0 | (version_bits << 3) | ((4 - layer) << 1) | 0x1  # no CRC
    b2 = (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = channel_mode << 6
    return bytes((0xFF, b1, b2, b3))


def build_mp3_stream(
    n_frames: int,
    version: str = "1",
    layer: int = 3,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    mono: bool = False,
    id3_payload: bytes = b"",
) -> bytes:
    """Spec-valid CBR frame chain with zeroed payloads (framing only —
    see module doc). Optionally prefixed with a minimal ID3v2.4 tag
    carrying ``id3_payload`` so the tag-skip path is exercised."""
    version_bits = {"1": 3, "2": 2, "2.5": 0}[version]
    channel_mode = 3 if mono else 0
    out = bytearray()
    if id3_payload:
        size = len(id3_payload)
        assert size < (1 << 28)
        out += b"ID3\x04\x00\x00" + bytes(
            (size >> s) & 0x7F for s in (21, 14, 7, 0)
        )
        out += id3_payload
    hdr_probe = _parse_frame_header(
        _build_frame_header(
            version_bits, layer, bitrate_kbps, sample_rate, 0, channel_mode
        ),
        0,
    )
    assert hdr_probe is not None
    for _ in range(n_frames):
        hdr = _build_frame_header(
            version_bits, layer, bitrate_kbps, sample_rate, 0, channel_mode
        )
        out += hdr
        out += b"\x00" * (hdr_probe["frame_len"] - 4)
    return bytes(out)

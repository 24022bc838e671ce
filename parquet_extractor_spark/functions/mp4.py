"""MP4 (ISO BMFF) container-METADATA parser: box walk, no decode.

Promotes the COVERAGE.md video codec-boundary "metadata-parser
candidate" to real code, the same way functions/mp3.py closed the MP3
boundary: a training-data pipeline needs *container* features from
video assets — duration, track layout, display size, brand — and all
of those live in the boxed header structures, whose layout is public
spec (ISO/IEC 14496-12: box = 32-bit size + fourcc, ``ftyp`` brand,
``mvhd`` timescale/duration, ``tkhd`` 16.16 fixed-point
width/height, ``hdlr`` handler type). Frame DECODE (H.264/HEVC/AV1)
stays a declared boundary — see ``decode_video_frames``.

Reference scope: the reference repo has no video handling at all
(north-star extension, same status as functions/mp3.py).

``build_mp4`` synthesizes spec-valid box trees with an empty ``mdat``
— NOT playable video, but byte-exact container structure — so
fixtures and the DuckDB literal oracle can pin the parser's output
without shipping real recordings.
"""

from __future__ import annotations

import struct

# Cap the top-level walk: headers live at the front (or the tail for
# faststart-less files — we only promise front-of-file moov, which is
# what every streaming-friendly asset has); a bounded walk keeps the
# parser O(boxes), never O(bytes), on multi-GB mdat payloads.
MAX_BOXES = 64


def is_mp4(data: bytes | None) -> bool:
    return bool(data) and len(data) >= 12 and data[4:8] == b"ftyp"


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the boxes in
    [start, end); tolerant of truncation (stops at the first
    malformed header)."""
    off = start
    n = 0
    while off + 8 <= end and n < MAX_BOXES:
        size = struct.unpack(">I", data[off:off + 4])[0]
        fourcc = data[off + 4:off + 8]
        body = off + 8
        if size == 1:  # 64-bit largesize follows the fourcc
            if body + 8 > end:
                return
            size = struct.unpack(">Q", data[body:body + 8])[0]
            body += 8
            if size < 16:
                return
        elif size == 0:  # box extends to end of enclosing scope
            size = end - off
        elif size < 8:
            return
        box_end = off + size
        if box_end > end:
            box_end = end  # truncated upload: parse what's there
        yield fourcc, body, box_end
        off += size
        n += 1


def _parse_mvhd(data: bytes, start: int, end: int):
    """(timescale, duration) from a MovieHeaderBox, or None."""
    if start + 4 > end:
        return None
    version = data[start]
    if version == 1:
        # 8B ctime + 8B mtime, then 4B timescale + 8B duration
        if start + 4 + 16 + 12 > end:
            return None
        timescale = struct.unpack(">I", data[start + 20:start + 24])[0]
        duration = struct.unpack(">Q", data[start + 24:start + 32])[0]
    else:
        if start + 4 + 8 + 8 > end:
            return None
        timescale = struct.unpack(">I", data[start + 12:start + 16])[0]
        duration = struct.unpack(">I", data[start + 16:start + 20])[0]
    return (timescale, duration) if timescale else None


def _parse_tkhd(data: bytes, start: int, end: int):
    """(width, height) from a TrackHeaderBox's trailing 16.16 fixed
    fields, or None. Body after the 4 version/flags bytes: 80 (v0:
    20 times/ids + 8 reserved + 8 layer/group/volume + 36 matrix +
    8 size) / 92 (v1: 64-bit times add 12)."""
    if start + 4 > end:
        return None
    version = data[start]
    body_len = 92 if version == 1 else 80
    if start + 4 + body_len > end:
        return None
    wh_off = start + 4 + body_len - 8
    width = struct.unpack(">I", data[wh_off:wh_off + 4])[0] >> 16
    height = struct.unpack(">I", data[wh_off + 4:wh_off + 8])[0] >> 16
    return width, height


def _parse_hdlr(data: bytes, start: int, end: int):
    """handler fourcc ('vide'/'soun'/...) from a HandlerBox."""
    if start + 12 > end:
        return None
    return data[start + 8:start + 12]


def _parse_mdhd(data: bytes, start: int, end: int):
    """Media timescale from a MediaHeaderBox (v0 u32 fields / v1 u64
    times), or None."""
    if start + 4 > end:
        return None
    version = data[start]
    ts_off = start + 4 + (16 if version == 1 else 8)
    if ts_off + 4 > end:
        return None
    (timescale,) = struct.unpack(">I", data[ts_off:ts_off + 4])
    return timescale or None


def _parse_stts(data: bytes, start: int, end: int):
    """(n_samples, media_duration) from a TimeToSampleBox: the entry
    table is run-length (sample_count, sample_delta) pairs (ISO/IEC
    14496-12 §8.6.1.2) — multi-entry tables are the variable-frame-
    duration case single-entry fixtures never exercise."""
    if start + 8 > end:
        return None
    (n_entries,) = struct.unpack(">I", data[start + 4:start + 8])
    if n_entries > (end - start - 8) // 8:
        return None  # truncated table
    n_samples = 0
    duration = 0
    off = start + 8
    for _ in range(n_entries):
        count, delta = struct.unpack(">II", data[off:off + 8])
        n_samples += count
        duration += count * delta
        off += 8
    return n_samples, duration


def _parse_ctts(data: bytes, start: int, end: int):
    """(min_offset, max_offset) over a CompositionOffsetBox's
    run-length (sample_count, offset) table — offsets are unsigned in
    v0, SIGNED in v1 (§8.6.1.3); the signed form is how B-frame
    reorder leads earlier than the decode timeline."""
    if start + 8 > end:
        return None
    version = data[start]
    (n_entries,) = struct.unpack(">I", data[start + 4:start + 8])
    if n_entries == 0 or n_entries > (end - start - 8) // 8:
        return None
    fmt = ">Ii" if version == 1 else ">II"
    lo = hi = None
    off = start + 8
    for _ in range(n_entries):
        _count, coff = struct.unpack(fmt, data[off:off + 8])
        lo = coff if lo is None else min(lo, coff)
        hi = coff if hi is None else max(hi, coff)
        off += 8
    return lo, hi


def parse_mp4_metadata(data: bytes | None) -> dict | None:
    """Container metadata from the box tree, or None when the bytes
    are not ISO BMFF. Keys: brand, duration_ms, n_tracks, width,
    height (largest video track's display size), has_video,
    has_audio — plus, when the selected video track carries a sample
    table: n_frames / media_timescale / media_duration (stts run-
    length sums), fps_milli (frames·timescale·1000 div duration) and
    cts_offset_min/max (ctts composition-offset extremes, signed in
    v1 — the B-frame reorder signature)."""
    if not is_mp4(data):
        return None
    brand = None
    timescale_duration = None
    n_tracks = 0
    width = height = None
    has_video = has_audio = False
    video_timing = None
    for fourcc, body, box_end in _walk_boxes(data, 0, len(data)):
        if fourcc == b"ftyp":
            brand = data[body:body + 4].decode("latin-1")
        elif fourcc == b"moov":
            for cc2, b2, e2 in _walk_boxes(data, body, box_end):
                if cc2 == b"mvhd":
                    timescale_duration = _parse_mvhd(data, b2, e2)
                elif cc2 == b"trak":
                    n_tracks += 1
                    wh = None
                    handler = None
                    media_ts = None
                    stts = ctts = None
                    for cc3, b3, e3 in _walk_boxes(data, b2, e2):
                        if cc3 == b"tkhd":
                            wh = _parse_tkhd(data, b3, e3)
                        elif cc3 == b"mdia":
                            for cc4, b4, e4 in _walk_boxes(data, b3, e3):
                                if cc4 == b"hdlr":
                                    handler = _parse_hdlr(data, b4, e4)
                                elif cc4 == b"mdhd":
                                    media_ts = _parse_mdhd(data, b4, e4)
                                elif cc4 == b"minf":
                                    for cc5, b5, e5 in _walk_boxes(
                                        data, b4, e4
                                    ):
                                        if cc5 != b"stbl":
                                            continue
                                        for cc6, b6, e6 in _walk_boxes(
                                            data, b5, e5
                                        ):
                                            if cc6 == b"stts":
                                                stts = _parse_stts(
                                                    data, b6, e6
                                                )
                                            elif cc6 == b"ctts":
                                                ctts = _parse_ctts(
                                                    data, b6, e6
                                                )
                    if handler == b"vide":
                        has_video = True
                        timing = (media_ts, stts, ctts)
                        if wh and (width is None or wh[0] > width):
                            width, height = wh
                            # timing follows the display-size winner,
                            # but a wider track with no stbl/mdhd must
                            # not null out timing already parsed from
                            # an earlier track
                            if (
                                any(t is not None for t in timing)
                                or video_timing is None
                            ):
                                video_timing = timing
                        elif video_timing is None:
                            video_timing = timing
                    elif handler == b"soun":
                        has_audio = True
    duration_ms = None
    if timescale_duration:
        ts, dur = timescale_duration
        duration_ms = dur * 1000 // ts
    meta = {
        "container": "mp4",
        "brand": brand,
        "duration_ms": duration_ms,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
        "has_video": has_video,
        "has_audio": has_audio,
        "n_frames": None,
        "media_timescale": None,
        "media_duration": None,
        "fps_milli": None,
        "cts_offset_min": None,
        "cts_offset_max": None,
    }
    if video_timing:
        media_ts, stts, ctts = video_timing
        meta["media_timescale"] = media_ts
        if stts:
            n_frames, media_dur = stts
            meta["n_frames"] = n_frames
            meta["media_duration"] = media_dur
            if media_ts and media_dur:
                meta["fps_milli"] = (
                    n_frames * media_ts * 1000 // media_dur
                )
        if ctts:
            meta["cts_offset_min"], meta["cts_offset_max"] = ctts
    return meta


def decode_video_frames(data: bytes):  # pragma: no cover - boundary
    """PERMANENT codec boundary (COVERAGE.md): frame decode needs an
    H.264/HEVC/AV1 entropy decoder (ffmpeg territory). The container
    walk above supplies every metadata feature the pipeline uses;
    production swaps a PyAV/ffmpeg call into the same mapInPandas
    batch without touching the Spark plan."""
    raise NotImplementedError(
        "video frame decode requires an external codec (ffmpeg/PyAV); "
        "container metadata is available via parse_mp4_metadata"
    )


# ── fixture builder ─────────────────────────────────────────────────


def _box(fourcc: bytes, payload: bytes, large: bool = False) -> bytes:
    if large:
        return struct.pack(">I", 1) + fourcc + struct.pack(
            ">Q", 16 + len(payload)
        ) + payload
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(version: int, payload: bytes) -> bytes:
    return bytes([version, 0, 0, 0]) + payload


def _mvhd(timescale: int, duration: int, version: int = 0) -> bytes:
    if version == 1:
        body = _full(1, struct.pack(">QQIQ", 0, 0, timescale, duration))
    else:
        body = _full(0, struct.pack(">III", 0, 0, timescale) +
                     struct.pack(">I", duration))
    # rate, volume, reserved, matrix, predefined, next_track_id
    body += struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
    body += b"\x00" * 10 + b"\x00" * 36 + b"\x00" * 24 + struct.pack(">I", 2)
    return _box(b"mvhd", body)


def _tkhd(track_id: int, duration: int, width: int, height: int,
          version: int = 0) -> bytes:
    if version == 1:
        head = struct.pack(">QQI", 0, 0, track_id) + b"\x00" * 4
        head += struct.pack(">Q", duration)
    else:
        head = struct.pack(">III", 0, 0, track_id) + b"\x00" * 4
        head += struct.pack(">I", duration)
    body = _full(version, head)
    body += b"\x00" * 8  # reserved
    body += struct.pack(">hhhh", 0, 0, 0, 0)  # layer/group/volume/reserved
    body += b"\x00" * 36  # matrix
    body += struct.pack(">II", width << 16, height << 16)
    return _box(b"tkhd", body)


def _hdlr(handler: bytes) -> bytes:
    return _box(b"hdlr", _full(0, b"\x00" * 4 + handler + b"\x00" * 12 +
                               b"fixture\x00"))


def _mdhd(timescale: int) -> bytes:
    # v0: u32 ctime/mtime, u32 timescale, u32 duration, lang+predef
    return _box(b"mdhd", _full(0, struct.pack(">IIII", 0, 0, timescale, 0)
                               + struct.pack(">HH", 0x55C4, 0)))


def _stts(entries: list[tuple[int, int]]) -> bytes:
    body = struct.pack(">I", len(entries)) + b"".join(
        struct.pack(">II", c, d) for c, d in entries
    )
    return _box(b"stts", _full(0, body))


def _ctts(entries: list[tuple[int, int]], version: int = 1) -> bytes:
    fmt = ">Ii" if version == 1 else ">II"
    body = struct.pack(">I", len(entries)) + b"".join(
        struct.pack(fmt, c, o) for c, o in entries
    )
    return _box(b"ctts", _full(version, body))


def _trak(track_id: int, duration: int, handler: bytes,
          width: int = 0, height: int = 0, tkhd_version: int = 0,
          media_timescale: int | None = None,
          stts_entries: list[tuple[int, int]] | None = None,
          ctts_entries: list[tuple[int, int]] | None = None,
          ctts_version: int = 1) -> bytes:
    mdia_body = _hdlr(handler)
    if media_timescale is not None:
        mdia_body = _mdhd(media_timescale) + mdia_body
    if stts_entries is not None or ctts_entries is not None:
        stbl = b""
        if stts_entries is not None:
            stbl += _stts(stts_entries)
        if ctts_entries is not None:
            stbl += _ctts(ctts_entries, ctts_version)
        mdia_body += _box(b"minf", _box(b"stbl", stbl))
    mdia = _box(b"mdia", mdia_body)
    return _box(
        b"trak",
        _tkhd(track_id, duration, width, height, tkhd_version) + mdia,
    )


def build_mp4(
    brand: str = "isom",
    timescale: int = 1000,
    duration: int = 5000,
    video_size: tuple[int, int] | None = (640, 360),
    audio: bool = True,
    mvhd_version: int = 0,
    mdat_bytes: int = 64,
    large_mdat: bool = False,
    media_timescale: int | None = None,
    stts_entries: list[tuple[int, int]] | None = None,
    ctts_entries: list[tuple[int, int]] | None = None,
    ctts_version: int = 1,
) -> bytes:
    """Spec-valid minimal MP4: ftyp + moov(mvhd + traks) + mdat; the
    optional media_timescale/stts/ctts args attach a sample table to
    the video track (multi-entry run-length timing, signed v1
    composition offsets)."""
    ftyp = _box(b"ftyp", brand.encode("latin-1") + struct.pack(">I", 0) +
                b"isom" + b"mp42")
    traks = b""
    tid = 1
    if video_size is not None:
        traks += _trak(tid, duration, b"vide", video_size[0], video_size[1],
                       tkhd_version=mvhd_version,
                       media_timescale=media_timescale,
                       stts_entries=stts_entries,
                       ctts_entries=ctts_entries,
                       ctts_version=ctts_version)
        tid += 1
    if audio:
        traks += _trak(tid, duration, b"soun")
    moov = _box(b"moov", _mvhd(timescale, duration, mvhd_version) + traks)
    mdat = _box(b"mdat", b"\x00" * mdat_bytes, large=large_mdat)
    return ftyp + moov + mdat

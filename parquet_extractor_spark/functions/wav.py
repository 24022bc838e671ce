"""Dependency-free WAV (RIFF) codec — the audio twin of
``functions/png.py``.

The container ships no audio library (librosa/soundfile/pydub), so the
RIFF container and every common sample encoding are parsed by hand:
PCM 8/16/24/32-bit, IEEE float32/float64, and G.711 A-law/µ-law
(format tags 1, 3, 6, 7, 0x11 IMA ADPCM, 0x02 MS-ADPCM, plus WAVE_FORMAT_EXTENSIBLE 0xFFFE resolved
through its subformat GUID). That lets audio feature extraction in
``operators/multimodal.py`` run on REAL samples in CI instead of a
byte-hash fake, for every encoding a field corpus is likely to carry —
the former "PCM-16 only" boundary is closed as of r06. Executors only
ever see these functions inside Arrow-batched ``mapInPandas`` — each
call is a pure function of the bytes, safe under task retries.

G.711 companding follows the classic CCITT/Sun reference arithmetic
(16-bit linear scale: µ-law bias 0x84 / clip 32635, A-law seg table),
vectorized through 256-entry numpy decode tables; the encoders are
exact inverses of the decoders on all 256 code points (pinned by
tests/test_multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

# RIFF fmt-chunk audio format tags (public WAVE spec).
WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_MS_ADPCM = 0x0002
WAVE_FORMAT_IEEE_FLOAT = 0x0003
WAVE_FORMAT_ALAW = 0x0006
WAVE_FORMAT_MULAW = 0x0007
WAVE_FORMAT_IMA_ADPCM = 0x0011
WAVE_FORMAT_EXTENSIBLE = 0xFFFE

# IMA/DVI ADPCM tables (public IMA spec / RFC 3551 appendix).
_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
        449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
        1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
        3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
        9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
        22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)
_IMA_INDEX_DELTA = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32
)


def _ima_decode_nibbles(
    nibbles, predictor: int, index: int
) -> tuple[list[int], int, int]:
    """Decode a nibble run with running (predictor, step index) state;
    the standard IMA expansion with the step>>3 rounding terms."""
    out = []
    for n in nibbles:
        step = int(_IMA_STEPS[index])
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        predictor = predictor - diff if n & 8 else predictor + diff
        predictor = max(-32768, min(32767, predictor))
        out.append(predictor)
        index = max(0, min(88, index + int(_IMA_INDEX_DELTA[n & 7])))
    return out, predictor, index


def _ima_encode_nibble(sample: int, predictor: int, index: int):
    """Quantize one sample against the running state (the reference
    IMA encoder), returning (nibble, new_predictor, new_index)."""
    step = int(_IMA_STEPS[index])
    delta = sample - predictor
    nibble = 8 if delta < 0 else 0
    if delta < 0:
        delta = -delta
    diff = step >> 3
    if delta >= step:
        nibble |= 4
        delta -= step
        diff += step
    if delta >= step >> 1:
        nibble |= 2
        delta -= step >> 1
        diff += step >> 1
    if delta >= step >> 2:
        nibble |= 1
        diff += step >> 2
    predictor = predictor - diff if nibble & 8 else predictor + diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + int(_IMA_INDEX_DELTA[nibble & 7])))
    return nibble, predictor, index


# MS-ADPCM tables (public Microsoft WAVE spec): the 7 standard
# predictor coefficient pairs and the delta adaptation table.
_MS_COEFS = [
    (256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
    (460, -208), (392, -232),
]
_MS_ADAPT = [
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
]


def _ms_decode_block_channel(
    nibbles, predictor_idx: int, delta: int, sample1: int, sample2: int
) -> list[int]:
    """One channel of one MS-ADPCM block: the two header samples are
    the first two outputs, then each 4-bit code extends the 2-tap
    prediction."""
    c1, c2 = _MS_COEFS[predictor_idx]
    out = [sample2, sample1]
    for nib in nibbles:
        signed = nib - 16 if nib >= 8 else nib
        pred = (sample1 * c1 + sample2 * c2) >> 8
        sample = max(-32768, min(32767, pred + signed * delta))
        out.append(sample)
        sample2, sample1 = sample1, sample
        delta = max(16, (_MS_ADAPT[nib] * delta) >> 8)
    return out


def _ms_encode_nibble(
    sample: int, delta: int, sample1: int, sample2: int, c1: int, c2: int
):
    """Quantize one sample against the 2-tap prediction (reference
    encoder arithmetic), returning (nibble, new_delta, new_s1, new_s2)."""
    pred = (sample1 * c1 + sample2 * c2) >> 8
    err = sample - pred
    nib = err // delta if delta else 0
    nib = max(-8, min(7, nib))
    code = nib & 0xF
    recon = max(-32768, min(32767, pred + nib * delta))
    new_delta = max(16, (_MS_ADAPT[code] * delta) >> 8)
    return code, new_delta, recon, sample1


_MS_BLOCK_ALIGN = 256  # bytes per mono block


def ms_adpcm_samples_per_block(block_align: int, channels: int) -> int:
    return 2 + (block_align - 7 * channels) * 2 // channels


def ms_adpcm_encode(samples: np.ndarray, channels: int = 1) -> bytes:
    """int16 samples -> MS-ADPCM block stream (predictor 0, the
    {256, 0} pair) at _MS_BLOCK_ALIGN*channels bytes per block:
    per-channel 7-byte headers (predictor index, initial delta,
    sample1, sample2), then channel-interleaved nibbles, HIGH nibble
    first. Final partial blocks pad by repeating the last sample."""
    arr = np.asarray(samples, dtype=np.int16).reshape(-1, channels)
    block_align = _MS_BLOCK_ALIGN * channels
    spb = ms_adpcm_samples_per_block(block_align, channels)
    out = bytearray()
    for start in range(0, len(arr), spb):
        block = arr[start : start + spb]
        if len(block) < spb:
            pad = np.repeat(block[-1:], spb - len(block), axis=0)
            block = np.concatenate([block, pad])
        c1, c2 = _MS_COEFS[0]
        state = []
        for c in range(channels):
            out.append(0)  # predictor index
        deltas = [512] * channels
        for c in range(channels):
            out += int(deltas[c]).to_bytes(2, "little", signed=True)
        for c in range(channels):
            out += int(block[1, c]).to_bytes(2, "little", signed=True)
        for c in range(channels):
            out += int(block[0, c]).to_bytes(2, "little", signed=True)
        for c in range(channels):
            state.append(
                {"delta": deltas[c], "s1": int(block[1, c]), "s2": int(block[0, c])}
            )
        nib_count = (spb - 2) * channels
        codes = []
        for i in range(2, spb):
            for c in range(channels):
                st = state[c]
                code, st["delta"], st["s1"], st["s2"] = _ms_encode_nibble(
                    int(block[i, c]), st["delta"], st["s1"], st["s2"], c1, c2
                )
                codes.append(code)
        if len(codes) % 2:
            codes.append(0)
        for i in range(0, len(codes), 2):
            out.append((codes[i] << 4) | codes[i + 1])
        assert len(codes) == nib_count + (nib_count % 2)
    return bytes(out)


def ms_adpcm_decode(
    raw: bytes, channels: int, block_align: int, n_frames: int
) -> np.ndarray:
    """MS-ADPCM block stream -> int16 samples, truncated to the
    fact-chunk n_frames."""
    # per-channel header is 7 bytes (predictor + delta + s1 + s2); a
    # corrupt fmt chunk advertising less would index past the block
    if channels < 1 or block_align < 7 * channels:
        raise ValueError(
            f"MS-ADPCM block_align {block_align} cannot hold "
            f"{channels}-channel block headers"
        )
    spb = ms_adpcm_samples_per_block(block_align, channels)
    frames: list[np.ndarray] = []
    for off in range(0, len(raw) - block_align + 1, block_align):
        block = raw[off : off + block_align]
        preds = []
        for c in range(channels):
            p = block[c]
            if p >= len(_MS_COEFS):
                raise ValueError(f"MS-ADPCM predictor index {p} out of range")
            preds.append(p)
        pos = channels
        deltas = [
            int.from_bytes(block[pos + 2 * c : pos + 2 * c + 2], "little", signed=True)
            for c in range(channels)
        ]
        pos += 2 * channels
        s1 = [
            int.from_bytes(block[pos + 2 * c : pos + 2 * c + 2], "little", signed=True)
            for c in range(channels)
        ]
        pos += 2 * channels
        s2 = [
            int.from_bytes(block[pos + 2 * c : pos + 2 * c + 2], "little", signed=True)
            for c in range(channels)
        ]
        pos += 2 * channels
        nibs: list[list[int]] = [[] for _ in range(channels)]
        idx = 0
        for b in block[pos:]:
            for nib in (b >> 4, b & 0xF):
                nibs[idx % channels].append(nib)
                idx += 1
        chans = []
        for c in range(channels):
            dec = _ms_decode_block_channel(
                nibs[c][: spb - 2], preds[c], max(16, abs(deltas[c])), s1[c], s2[c]
            )
            chans.append(np.array(dec[:spb], dtype=np.int16))
        frames.append(np.stack(chans, axis=1))
    if not frames:
        return np.zeros((0,) if channels == 1 else (0, channels), np.int16)
    arr = np.concatenate(frames)[:n_frames]
    return arr[:, 0] if channels == 1 else arr


_IMA_BLOCK_ALIGN = 256  # bytes per mono block -> 505 samples/block


def ima_adpcm_samples_per_block(block_align: int, channels: int) -> int:
    return (block_align - 4 * channels) * 2 // channels + 1


def ima_adpcm_encode(samples: np.ndarray, channels: int = 1) -> bytes:
    """int16 samples (frame-major for stereo) -> IMA ADPCM block
    stream at _IMA_BLOCK_ALIGN*channels bytes per block: per-channel
    4-byte headers (predictor, step index), then 4-byte-per-channel
    interleaved nibble words, low nibble first. The final partial
    block is padded by repeating the last sample (standard
    practice)."""
    arr = np.asarray(samples, dtype=np.int16).reshape(-1, channels)
    block_align = _IMA_BLOCK_ALIGN * channels
    spb = ima_adpcm_samples_per_block(block_align, channels)
    out = bytearray()
    indices = [0] * channels
    for start in range(0, len(arr), spb):
        block = arr[start : start + spb]
        if len(block) < spb:
            pad = np.repeat(block[-1:], spb - len(block), axis=0)
            block = np.concatenate([block, pad])
        chan_nibbles = []
        for c in range(channels):
            pred = int(block[0, c])
            out += int(pred).to_bytes(2, "little", signed=True)
            out.append(indices[c])
            out.append(0)
            nibs = []
            for s in block[1:, c].tolist():
                nib, pred, indices[c] = _ima_encode_nibble(
                    s, pred, indices[c]
                )
                nibs.append(nib)
            chan_nibbles.append(nibs)
        # interleave: 8 nibbles (one 4-byte word) per channel in turn
        per_chan = len(chan_nibbles[0])
        for w in range(0, per_chan, 8):
            for c in range(channels):
                chunk = chan_nibbles[c][w : w + 8]
                chunk += [0] * (8 - len(chunk))
                for i in range(0, 8, 2):
                    out.append(chunk[i] | (chunk[i + 1] << 4))
    return bytes(out)


def ima_adpcm_decode(
    raw: bytes, channels: int, block_align: int, n_frames: int
) -> np.ndarray:
    """IMA ADPCM block stream -> int16 samples ((n,) mono or (n, ch));
    truncated to n_frames (the fact-chunk length, since the last
    block is padded)."""
    # a block must at least hold its per-channel 4-byte headers; a
    # corrupt fmt chunk advertising less used to die with IndexError
    # mid-block (outside the declared ValueError boundary — r12 fuzz)
    if channels < 1 or block_align < 4 * channels:
        raise ValueError(
            f"IMA ADPCM block_align {block_align} cannot hold "
            f"{channels}-channel block headers"
        )
    spb = ima_adpcm_samples_per_block(block_align, channels)
    frames: list[np.ndarray] = []
    for off in range(0, len(raw) - block_align + 1, block_align):
        block = raw[off : off + block_align]
        preds, idxs, nibs = [], [], []
        for c in range(channels):
            hdr = block[c * 4 : c * 4 + 4]
            preds.append(int.from_bytes(hdr[:2], "little", signed=True))
            idxs.append(min(88, hdr[2]))
            nibs.append([])
        body = block[4 * channels :]
        for word, woff in enumerate(range(0, len(body), 4)):
            c = word % channels
            for b in body[woff : woff + 4]:
                nibs[c].append(b & 0xF)
                nibs[c].append(b >> 4)
        chans = []
        for c in range(channels):
            dec, _, _ = _ima_decode_nibbles(nibs[c], preds[c], idxs[c])
            chans.append(
                np.array([preds[c]] + dec, dtype=np.int16)[:spb]
            )
        frames.append(np.stack(chans, axis=1))
    if not frames:
        return np.zeros((0,) if channels == 1 else (0, channels), np.int16)
    arr = np.concatenate(frames)[:n_frames]
    return arr[:, 0] if channels == 1 else arr


def is_wav(data: bytes | None) -> bool:
    return (
        data is not None
        and len(data) > 12
        and data[:4] == b"RIFF"
        and data[8:12] == b"WAVE"
    )


# ── G.711 companding (CCITT reference arithmetic, 16-bit scale) ──────


def _ulaw_decode_one(code: int) -> int:
    u = ~code & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return (0x84 - t) if u & 0x80 else (t - 0x84)


def _alaw_decode_one(code: int) -> int:
    a = code ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if a & 0x80 else -t


_ULAW_TABLE = np.array(
    [_ulaw_decode_one(c) for c in range(256)], dtype=np.int16
)
_ALAW_TABLE = np.array(
    [_alaw_decode_one(c) for c in range(256)], dtype=np.int16
)

_ULAW_SEG_END = np.array(
    [0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF], dtype=np.int32
)
_ALAW_SEG_END = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int32
)


def ulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear → µ-law bytes (vectorized Sun/CCITT arithmetic)."""
    pcm = np.asarray(samples, dtype=np.int32) >> 2  # 14-bit domain
    mask = np.where(pcm < 0, 0x7F, 0xFF)
    mag = np.minimum(np.abs(pcm), 8159) + 33
    seg = np.searchsorted(_ULAW_SEG_END, mag, side="left")
    seg7 = np.minimum(seg, 7)
    uval = np.where(
        seg >= 8, 0x7F, (seg7 << 4) | ((mag >> (seg7 + 1)) & 0x0F)
    )
    return ((uval ^ mask) & 0xFF).astype(np.uint8)


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    return _ULAW_TABLE[np.asarray(codes, dtype=np.uint8)]


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear → A-law bytes (vectorized Sun/CCITT arithmetic)."""
    pcm = np.asarray(samples, dtype=np.int32) >> 3  # 13-bit domain
    mask = np.where(pcm >= 0, 0xD5, 0x55)
    mag = np.where(pcm >= 0, pcm, -pcm - 1)
    seg = np.searchsorted(_ALAW_SEG_END, mag, side="left")
    seg7 = np.minimum(seg, 7)
    shift = np.where(seg7 < 2, 1, seg7)
    aval = np.where(seg >= 8, 0x7F, (seg7 << 4) | ((mag >> shift) & 0x0F))
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    return _ALAW_TABLE[np.asarray(codes, dtype=np.uint8)]


# ── RIFF container ───────────────────────────────────────────────────


def parse_wav_header(data: bytes) -> dict | None:
    """Walk the RIFF chunk list by hand and return the format facts:
    ``{format, channels, sample_rate, bits_per_sample, block_align,
    n_frames, data_offset, data_size}``. EXTENSIBLE (0xFFFE) is
    resolved to its subformat's first-two-GUID-bytes format code.
    Unknown chunks (LIST, fact, cue, …) are skipped per spec (word
    alignment honored). Returns None for non-WAV or corrupt headers
    rather than raising — callers in mapInPandas stages must not fail
    the task on one bad row."""
    if not is_wav(data):
        return None
    pos, end = 12, len(data)
    fmt = None
    data_off = data_size = None
    fact_frames = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if cid == b"fmt " and csize >= 16 and body + 16 <= end:
            tag, ch, sr, _br, ba, bits = struct.unpack_from(
                "<HHIIHH", data, body
            )
            if tag == WAVE_FORMAT_EXTENSIBLE and csize >= 40:
                if body + 26 <= end:
                    (tag,) = struct.unpack_from("<H", data, body + 24)
                else:
                    return None
            fmt = {
                "format": tag,
                "channels": ch,
                "sample_rate": sr,
                "bits_per_sample": bits,
                "block_align": ba,
            }
            if (
                tag in (WAVE_FORMAT_IMA_ADPCM, WAVE_FORMAT_MS_ADPCM)
                and csize >= 20
                and body + 20 <= end
            ):
                # extension starts with wSamplesPerBlock for both
                # ADPCM families (cbSize at 16, value at 18)
                (fmt["samples_per_block"],) = struct.unpack_from(
                    "<H", data, body + 18
                )
        elif cid == b"fact" and csize >= 4 and body + 4 <= end:
            (fact_frames,) = struct.unpack_from("<I", data, body)
        elif cid == b"data":
            data_off = body
            data_size = min(csize, end - body)
        pos = body + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data_off is None:
        return None
    if fmt["channels"] < 1 or fmt["sample_rate"] < 1:
        return None
    ba = fmt["block_align"] or fmt["channels"] * max(
        1, fmt["bits_per_sample"] // 8
    )
    fmt["block_align"] = ba
    if fmt["format"] in (WAVE_FORMAT_IMA_ADPCM, WAVE_FORMAT_MS_ADPCM):
        default_spb = (
            ima_adpcm_samples_per_block(ba, fmt["channels"])
            if fmt["format"] == WAVE_FORMAT_IMA_ADPCM
            else ms_adpcm_samples_per_block(ba, fmt["channels"])
        ) if ba else 0
        spb = fmt.get("samples_per_block") or default_spb
        fmt["samples_per_block"] = spb
        blocks = data_size // ba if ba else 0
        fmt["n_frames"] = (
            fact_frames
            if fact_frames is not None
            else blocks * spb
        )
    else:
        fmt["n_frames"] = data_size // ba if ba else 0
    fmt["data_offset"] = data_off
    fmt["data_size"] = data_size
    return fmt


_FMT_SPECS = {
    # fmt name → (format tag, bits per sample)
    "pcm8": (WAVE_FORMAT_PCM, 8),
    "pcm16": (WAVE_FORMAT_PCM, 16),
    "pcm24": (WAVE_FORMAT_PCM, 24),
    "pcm32": (WAVE_FORMAT_PCM, 32),
    "float32": (WAVE_FORMAT_IEEE_FLOAT, 32),
    "float64": (WAVE_FORMAT_IEEE_FLOAT, 64),
    "alaw": (WAVE_FORMAT_ALAW, 8),
    "ulaw": (WAVE_FORMAT_MULAW, 8),
    "ima_adpcm": (WAVE_FORMAT_IMA_ADPCM, 4),
    "ms_adpcm": (WAVE_FORMAT_MS_ADPCM, 4),
}


def encode_wav(
    samples: np.ndarray, sample_rate: int = 8000, fmt: str = "pcm16"
) -> bytes:
    """Encode int16-scale samples (shape (n,) mono or (n, ch)) to WAV
    bytes in any supported encoding. One fixture signal serves every
    format: float formats store ``samples/32768``; pcm24/pcm32 shift
    the 16-bit input into the wide word's top bits (standard studio
    practice); pcm8 keeps the top byte (unsigned, biased +128); G.711
    formats compand. Non-PCM fmt chunks carry the spec's cbSize=0
    extension plus a ``fact`` chunk, exercising the parser's
    chunk-walk on real layouts."""
    tag, bits = _FMT_SPECS[fmt]
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    i16 = np.clip(np.round(arr).astype(np.int64), -32768, 32767).astype(
        np.int16
    )
    if fmt == "pcm16":
        payload = i16.astype("<i2").tobytes()
    elif fmt == "pcm8":
        payload = ((i16.astype(np.int32) >> 8) + 128).astype(
            np.uint8
        ).tobytes()
    elif fmt == "pcm24":
        wide = (i16.astype(np.int32) << 8).astype("<i4")
        b4 = wide.tobytes()
        payload = b"".join(
            b4[i : i + 3] for i in range(0, len(b4), 4)
        )  # low 3 of each LE int32
    elif fmt == "pcm32":
        payload = (i16.astype(np.int32) << 16).astype("<i4").tobytes()
    elif fmt == "float32":
        payload = (
            np.asarray(arr, dtype=np.float64) / 32768.0
        ).astype("<f4").tobytes()
    elif fmt == "float64":
        payload = (
            np.asarray(arr, dtype=np.float64) / 32768.0
        ).astype("<f8").tobytes()
    elif fmt == "alaw":
        payload = alaw_encode(i16.ravel()).tobytes()
    elif fmt == "ima_adpcm":
        payload = ima_adpcm_encode(i16, ch)
    elif fmt == "ms_adpcm":
        payload = ms_adpcm_encode(i16, ch)
    else:  # ulaw
        payload = ulaw_encode(i16.ravel()).tobytes()

    if fmt == "ima_adpcm":
        block_align = _IMA_BLOCK_ALIGN * ch
        spb = ima_adpcm_samples_per_block(block_align, ch)
        byte_rate = sample_rate * block_align // spb
        # cbSize=2 extension carries wSamplesPerBlock (public spec)
        fmt_chunk = struct.pack(
            "<HHIIHHHH",
            tag, ch, sample_rate, byte_rate, block_align, bits, 2, spb,
        )
        chunks = [
            (b"fmt ", fmt_chunk),
            (b"fact", struct.pack("<I", n)),
            (b"data", payload),
        ]
    elif fmt == "ms_adpcm":
        block_align = _MS_BLOCK_ALIGN * ch
        spb = ms_adpcm_samples_per_block(block_align, ch)
        byte_rate = sample_rate * block_align // spb
        # extension: wSamplesPerBlock, wNumCoef, the 7 standard pairs
        ext = struct.pack("<HH", spb, len(_MS_COEFS))
        for c1, c2 in _MS_COEFS:
            ext += struct.pack("<hh", c1, c2)
        fmt_chunk = struct.pack(
            "<HHIIHHH",
            tag, ch, sample_rate, byte_rate, block_align, bits, len(ext),
        ) + ext
        chunks = [
            (b"fmt ", fmt_chunk),
            (b"fact", struct.pack("<I", n)),
            (b"data", payload),
        ]
    elif tag == WAVE_FORMAT_PCM:
        block_align = ch * (bits // 8)
        byte_rate = sample_rate * block_align
        fmt_chunk = struct.pack(
            "<HHIIHH", tag, ch, sample_rate, byte_rate, block_align, bits
        )
        chunks = [(b"fmt ", fmt_chunk), (b"data", payload)]
    else:
        block_align = ch * (bits // 8)
        byte_rate = sample_rate * block_align
        fmt_chunk = struct.pack(
            "<HHIIHHH", tag, ch, sample_rate, byte_rate, block_align, bits, 0
        )
        chunks = [
            (b"fmt ", fmt_chunk),
            (b"fact", struct.pack("<I", n)),
            (b"data", payload),
        ]
    body = b"".join(
        cid + struct.pack("<I", len(c)) + c + (b"\x00" if len(c) & 1 else b"")
        for cid, c in chunks
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV bytes of any supported encoding to (samples,
    sample_rate); shape (n,) mono / (n, ch) otherwise. Dtype reflects
    the stored precision: int16 for pcm8/pcm16/G.711, int32 for
    pcm24/pcm32, float32/float64 for IEEE float. Raises ValueError on
    corrupt containers and NotImplementedError only for genuinely
    exotic codecs (ADPCM, GSM, MPEG-in-WAV)."""
    h = parse_wav_header(data)
    if h is None:
        raise ValueError("not a parseable RIFF/WAVE container")
    tag, bits = h["format"], h["bits_per_sample"]
    raw = data[h["data_offset"] : h["data_offset"] + h["data_size"]]
    if tag == WAVE_FORMAT_PCM and bits == 16:
        arr = np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2")
    elif tag == WAVE_FORMAT_PCM and bits == 8:
        arr = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
        ).astype(np.int16) << 8
    elif tag == WAVE_FORMAT_PCM and bits == 24:
        trimmed = raw[: len(raw) // 3 * 3]
        b = np.frombuffer(trimmed, dtype=np.uint8).reshape(-1, 3)
        arr = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        arr = np.where(arr & 0x800000, arr - 0x1000000, arr).astype(np.int32)
    elif tag == WAVE_FORMAT_PCM and bits == 32:
        arr = np.frombuffer(raw[: len(raw) // 4 * 4], dtype="<i4")
    elif tag == WAVE_FORMAT_IEEE_FLOAT and bits == 32:
        arr = np.frombuffer(raw[: len(raw) // 4 * 4], dtype="<f4")
    elif tag == WAVE_FORMAT_IEEE_FLOAT and bits == 64:
        arr = np.frombuffer(raw[: len(raw) // 8 * 8], dtype="<f8")
    elif tag == WAVE_FORMAT_ALAW and bits == 8:
        arr = alaw_decode(np.frombuffer(raw, dtype=np.uint8))
    elif tag == WAVE_FORMAT_MULAW and bits == 8:
        arr = ulaw_decode(np.frombuffer(raw, dtype=np.uint8))
    elif tag == WAVE_FORMAT_IMA_ADPCM and bits == 4:
        arr = ima_adpcm_decode(
            raw, h["channels"], h["block_align"], h["n_frames"]
        )
        return arr, h["sample_rate"]  # already channel-shaped
    elif tag == WAVE_FORMAT_MS_ADPCM and bits == 4:
        arr = ms_adpcm_decode(
            raw, h["channels"], h["block_align"], h["n_frames"]
        )
        return arr, h["sample_rate"]  # already channel-shaped
    else:
        raise NotImplementedError(
            f"WAV format tag 0x{tag:04X} @ {bits}-bit is an exotic codec "
            "(GSM/MPEG-in-WAV/TrueSpeech) — outside the supported set "
            "pcm8/16/24/32, float32/64, A-law, µ-law, IMA/MS ADPCM"
        )
    ch = h["channels"]
    if ch > 1:
        arr = arr[: arr.size // ch * ch].reshape(-1, ch)
    return arr, h["sample_rate"]


def audio_feature(samples: np.ndarray, dim: int = 16) -> list[float]:
    """Real signal-space feature: a dim-window RMS energy envelope,
    peak-normalized to [0, 1] — the shape a tiny audio encoder would
    produce, computed from actual decoded samples."""
    mono = np.asarray(samples, dtype=np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    if mono.size == 0:
        return [0.0] * dim
    windows = np.array_split(mono, dim)
    rms = np.array([np.sqrt(np.mean(w * w)) if w.size else 0.0 for w in windows])
    peak = rms.max()
    if peak <= 0:
        return [0.0] * dim
    return [float(v) for v in rms / peak]


def spectral_feature(
    samples: np.ndarray, sample_rate: int, dim: int = 16
) -> list[float]:
    """Real frequency-space feature: power-spectrum energy in ``dim``
    equal-width bands up to Nyquist, peak-normalized — an actual FFT
    over the decoded PCM samples (numpy.fft, no external DSP libs).
    A pure tone lands its energy in the band containing its
    frequency, which is what the unit test pins."""
    mono = np.asarray(samples, dtype=np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    if mono.size == 0:
        return [0.0] * dim
    spec = np.abs(np.fft.rfft(mono)) ** 2
    freqs = np.fft.rfftfreq(mono.size, d=1.0 / sample_rate)
    nyquist = sample_rate / 2.0
    edges = np.linspace(0.0, nyquist, dim + 1)
    bands = np.zeros(dim)
    idx = np.clip(np.searchsorted(edges, freqs, side="right") - 1, 0, dim - 1)
    np.add.at(bands, idx, spec)
    peak = bands.max()
    if peak <= 0:
        return [0.0] * dim
    return [float(v) for v in bands / peak]

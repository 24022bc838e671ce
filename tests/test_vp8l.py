"""VP8L (WebP lossless) codec: encoder/decoder round-trips over every
transform and entropy path, handcrafted streams for the decode-only
paths (color cache, meta prefix images, repeat codes, long-distance
backrefs), and robustness on malformed input."""

import numpy as np
import pytest

from parquet_extractor_spark.functions.vp8l import (
    _BitWriter,
    _CACHE_MULT,
    _canonical_codes,
    _emit_prefix_code,
    _limited_lengths,
    _value_to_prefix,
    decode_vp8l,
    encode_vp8l,
)


def _rng():
    return np.random.default_rng(20260814)


def _roundtrip(arr, mode, **kw):
    out = decode_vp8l(encode_vp8l(arr, mode=mode, **kw))
    np.testing.assert_array_equal(out, arr[:, :, :3])


def test_literal_mode_roundtrip_with_runs():
    arr = _rng().integers(0, 256, (13, 17, 3), dtype=np.uint8)
    arr[3:7, 2:15] = [10, 200, 30]  # flat region -> LZ77 run path
    _roundtrip(arr, "literal")


@pytest.mark.parametrize("n_colors,shape", [(2, (9, 21)), (3, (8, 15)),
                                            (11, (10, 10)), (40, (12, 12))])
def test_palette_mode_roundtrip_all_bundlings(n_colors, shape):
    """2 colors -> 1-bit indices (8/byte), 3 -> 2-bit, 11 -> 4-bit,
    40 -> plain byte indices."""
    rng = _rng()
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    arr = pal[rng.integers(0, n_colors, shape)]
    _roundtrip(arr, "palette")


@pytest.mark.parametrize("mode", range(14))
def test_predictor_modes_roundtrip(mode):
    arr = _rng().integers(0, 256, (7, 9, 3), dtype=np.uint8)
    _roundtrip(arr, "predictor", predictor_mode=mode)


@pytest.mark.parametrize("mult", [(0, 0, 0), (3, -2, 7), (127, -128, 66)])
def test_color_transform_roundtrip(mult):
    arr = _rng().integers(0, 256, (8, 8, 3), dtype=np.uint8)
    _roundtrip(arr, "color", color_multipliers=mult)


def test_auto_mode_picks_palette_for_flat_images():
    arr = np.zeros((6, 6, 3), dtype=np.uint8)
    arr[:3] = [5, 6, 7]
    payload = encode_vp8l(arr, mode="auto")
    # first data bits: transform-present=1 then type=3 (color indexing)
    assert payload[5] & 0b111 == 0b111
    np.testing.assert_array_equal(decode_vp8l(payload), arr)


def test_property_random_images_roundtrip():
    rng = _rng()
    for _ in range(25):
        h, w = int(rng.integers(1, 20)), int(rng.integers(1, 20))
        ncol = int(rng.integers(1, 30))
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        arr = pal[rng.integers(0, ncol, (h, w))]
        for mode in ("literal", "palette", "auto"):
            _roundtrip(arr, mode)


# ── handcrafted streams for decode-only paths ───────────────────────

def _header(w, h):
    import struct

    packed = ((w - 1) & 0x3FFF) | (((h - 1) & 0x3FFF) << 14)
    return b"\x2f" + struct.pack("<I", packed)


def _emit_codes(bw, green_lens, cache_size=0):
    sizes = [256 + 24 + cache_size, 256, 256, 256, 40]
    tables = [_emit_prefix_code(bw, green_lens, sizes[0])]
    for t in range(1, 5):
        tables.append(_emit_prefix_code(bw, {0: 0}, sizes[t]))
    return tables


def test_color_cache_decode():
    """Literal pixel, then the same pixel via a cache hit — the cache
    path the encoder never emits. (All non-green trees are 0-bit
    single-symbol-0 codes, so the decoded ARGB is just green<<8.)"""
    cache_bits = 2
    g = 77
    px = g << 8
    slot = (_CACHE_MULT * px & 0xFFFFFFFF) >> (32 - cache_bits)
    cache_sym = 256 + 24 + slot
    bw = _BitWriter()
    bw.bits(0, 1)  # no transforms
    bw.bits(1, 1)  # color cache present
    bw.bits(cache_bits, 4)
    bw.bits(0, 1)  # no meta prefix image
    tables = _emit_codes(
        bw, {g: 1, cache_sym: 1}, cache_size=1 << cache_bits
    )
    for sym in (g, cache_sym):
        code, ln = tables[0][sym]
        bw.code(code, ln)  # r/b/a trees are 0-bit single-symbol codes
    out = decode_vp8l(_header(2, 1) + bw.tobytes())
    assert out.shape == (1, 2, 3)
    np.testing.assert_array_equal(out[0, 0], out[0, 1])
    assert out[0, 0, 1] == g


def test_meta_prefix_groups_decode():
    """Two code groups selected by a 2x1 meta prefix image — left and
    right tile halves decode through different green trees."""
    w, h, meta_bits = 8, 4, 2
    bw = _BitWriter()
    bw.bits(0, 1)  # no transforms
    bw.bits(0, 1)  # no color cache
    bw.bits(1, 1)  # meta prefix image present
    bw.bits(meta_bits - 2, 3)
    # 2x1 meta image (group ids 0 and 1 live in (red<<8)|green),
    # emitted inline as a sub-image stream: cache bit, codes, pixels
    bw.bits(0, 1)  # sub-image: no cache
    subt = _emit_prefix_code(bw, {0: 1, 1: 1}, 256 + 24)
    for t in range(1, 5):
        _emit_prefix_code(bw, {0: 0}, [0, 256, 256, 256, 40][t])
    for sym in (0, 1):  # the two meta pixels (r/b/a cost no bits)
        c, ln = subt[sym]
        bw.code(c, ln)
    # group 0: green always 50; group 1: green always 200
    _emit_codes_group(bw, {50: 1})
    _emit_codes_group(bw, {200: 1})
    # all codes are single-symbol 0-bit: the 32 pixels cost no bits
    out = decode_vp8l(_header(w, h) + bw.tobytes())
    assert out.shape == (h, w, 3)
    assert (out[:, :4, 1] == 50).all()
    assert (out[:, 4:, 1] == 200).all()


def _emit_codes_group(bw, green_lens):
    sizes = [256 + 24, 256, 256, 256, 40]
    tables = [_emit_prefix_code(bw, green_lens, sizes[0])]
    for t in range(1, 5):
        tables.append(_emit_prefix_code(bw, {0: 0}, sizes[t]))
    return tables


def test_repeat_code_lengths_decode():
    """Code-length transmission via 16 (repeat previous) and 17
    (zero runs) — the RLE path the package's encoder never emits."""
    bw = _BitWriter()
    bw.bits(0, 1)  # no transforms
    bw.bits(0, 1)  # no cache
    bw.bits(0, 1)  # no meta
    # green code: normal, clc over {2, 16, 17, 0}
    bw.bits(0, 1)  # not simple
    clc_lens = {2: 2, 16: 2, 17: 2, 0: 2}
    clc_codes = _canonical_codes(clc_lens)
    korder = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
    num_clc = max(i + 1 for i, s in enumerate(korder) if s in clc_codes)
    bw.bits(num_clc - 4, 4)
    for i in range(num_clc):
        bw.bits(clc_lens.get(korder[i], 0), 3)
    bw.bits(0, 1)  # no max-symbol shortcut
    # transmit: len 2 for symbol 0, then 16 (repeat 3 more: syms 1-3),
    # then 17 skipping to the end (the decoder stops at alphabet end)

    def clc_emit(sym):
        c, ln = clc_codes[sym]
        bw.code(c, ln)

    clc_emit(2)
    clc_emit(16)
    bw.bits(0, 2)  # repeat count 3
    # fill the rest with zeros via repeated 17s (each skips up to 10)
    remaining = 256 + 24 - 4
    while remaining > 0:
        clc_emit(17)
        skip = min(10, remaining)
        bw.bits(skip - 3, 3)
        remaining -= skip
    # four 2-bit green codes 0..3 -> emit pixels 0,1,2,3
    green_codes = _canonical_codes({0: 2, 1: 2, 2: 2, 3: 2})
    for t in range(1, 5):
        _emit_prefix_code(bw, {0: 0}, [0, 256, 256, 256, 40][t])
    for sym in (0, 1, 2, 3):
        c, ln = green_codes[sym]
        bw.code(c, ln)
    out = decode_vp8l(_header(4, 1) + bw.tobytes())
    np.testing.assert_array_equal(out[0, :, 1], [0, 1, 2, 3])


def test_long_distance_backref_decode():
    """Backward reference with plane code 1 (the pixel directly
    above) — copies the whole first row down the image."""
    w, h = 5, 4
    row = [10, 20, 30, 40, 50]
    length = w * (h - 1)
    len_code, len_extra, len_extra_n = _value_to_prefix(length)
    bw = _BitWriter()
    bw.bits(0, 1)
    bw.bits(0, 1)
    bw.bits(0, 1)
    # a complete (Kraft-exact) code over the 5 row values + length sym
    green_lens = _limited_lengths(
        {**{v: 1 for v in row}, 256 + len_code: 1}
    )
    g_codes = _canonical_codes(green_lens)
    tables = [_emit_prefix_code(bw, green_lens, 256 + 24)]
    for t in range(1, 4):
        _emit_prefix_code(bw, {0: 0}, 256)
    # distance tree: single symbol = prefix code of plane code 1
    d_code, d_extra, d_extra_n = _value_to_prefix(1)
    _emit_prefix_code(bw, {d_code: 0}, 40)
    for v in row:
        c, ln = g_codes[v]
        bw.code(c, ln)
    c, ln = g_codes[256 + len_code]
    bw.code(c, ln)
    if len_extra_n:
        bw.bits(len_extra, len_extra_n)
    if d_extra_n:
        bw.bits(d_extra, d_extra_n)
    out = decode_vp8l(_header(w, h) + bw.tobytes())
    for y in range(h):
        np.testing.assert_array_equal(out[y, :, 1], row)


# ── robustness & internals ──────────────────────────────────────────

def test_malformed_streams_raise():
    arr = _rng().integers(0, 256, (5, 5, 3), dtype=np.uint8)
    payload = encode_vp8l(arr, mode="literal")
    with pytest.raises(ValueError):
        decode_vp8l(b"\x30" + payload[1:])  # bad signature
    with pytest.raises(ValueError):
        decode_vp8l(payload[: len(payload) // 2])  # truncated
    rng = _rng()
    for _ in range(50):  # arbitrary bytes never crash non-ValueError
        junk = b"\x2f" + bytes(rng.integers(0, 256, 24, dtype=np.uint8))
        try:
            decode_vp8l(junk)
        except ValueError:
            pass


def test_package_merge_kraft_and_limit():
    rng = _rng()
    for _ in range(100):
        n = int(rng.integers(2, 300))
        freq = {s: int(rng.integers(1, 10_000)) for s in range(n)}
        lens = _limited_lengths(freq, 15)
        assert max(lens.values()) <= 15
        assert sum(2 ** (15 - ln) for ln in lens.values()) == 2**15


def test_prefix_value_mapping_is_inverse():
    from parquet_extractor_spark.functions.vp8l import _BitReader, _prefix_value

    for v in list(range(1, 70)) + [120, 1000, 4096]:
        code, extra_v, extra_n = _value_to_prefix(v)
        bw = _BitWriter()
        bw.bits(extra_v, extra_n)
        bw.bits(0, 8)  # padding so the reader never overruns
        br = _BitReader(bw.tobytes())
        assert _prefix_value(br, code) == v

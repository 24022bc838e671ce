"""Deep spec-derived known-answer probes (media_known_answers_deep):
VP8L subtract-green + color cache, progressive-JPEG AC refinement,
APNG OP_OVER compositing, BigTIFF geometry. Same contract as
test_media_known_answers: expectations are hand-derived literals and
the gate must have teeth against corruption."""

from __future__ import annotations

import numpy as np
import pytest

from parquet_extractor_spark.operators import media_known_answers_deep as D


@pytest.mark.parametrize(
    "pid,name,data,canon,shape",
    D.DEEP_PROBES,
    ids=[p[1] for p in D.DEEP_PROBES],
)
def test_deep_probe_decodes_to_hand_expectation(pid, name, data, canon, shape):
    got, gshape = D._decode_canonical_deep(name, data)
    assert tuple(gshape) == tuple(shape)
    assert got == canon


def test_vp8l_probe_exercises_cache_and_subtract_green():
    """The stream really contains a subtract-green transform and a
    color cache, and three of the four pixels arrive via cache hits
    (the stream is shorter than four literals could ever be)."""
    from parquet_extractor_spark.functions.vp8l import decode_vp8l

    data = D.build_vp8l_probe()
    arr = decode_vp8l(data)
    # inverse subtract-green applied: R = R' + G, B = B' + G mod 256
    assert np.all(arr == np.array([30, 20, 10], dtype=np.uint8))
    # 4 literal pixels would need 4x(8+8+8) channel bits alone; the
    # whole stream past the 5-byte header fits in far less
    assert len(data) - 5 < 16


def test_jpeg_progressive_refinement_bits_matter():
    """Dropping the final AC-refinement scan changes the decoded
    pixels (the refinement genuinely carries the +1 on the AC coef):
    without it AC = 2, so the horizontal ramp flattens by a third."""
    from parquet_extractor_spark.functions.jpeg import decode_jpeg

    full = D.build_jpeg_progressive_probe()
    # strip the last SOS (14 bytes: marker+len+payload=10, entropy 1,
    # then EOI) and re-terminate
    truncated = full[: full.rindex(b"\xff\xda")] + b"\xff\xd9"
    got_full = decode_jpeg(full)
    got_trunc = decode_jpeg(truncated)
    assert np.array_equal(got_full, D.JPEG_PROGRESSIVE_EXPECTED)
    assert not np.array_equal(got_trunc, got_full)


def test_apng_over_blend_arithmetic():
    """The composited pixel is the spec OVER formula on paper —
    (50, 100, 0, 255) — not the SOURCE replacement (0, 200, 0, 128)."""
    from parquet_extractor_spark.functions.apng import decode_apng_frames

    frames = decode_apng_frames(D.build_apng_over_probe())
    assert len(frames) == 2
    final = frames[1][1]
    assert tuple(final[1, 1]) == (50, 100, 0, 255)
    assert tuple(final[0, 0]) == (100, 0, 0, 255)


def test_corrupted_deep_stream_cannot_match_the_pinned_row():
    """Flip a pixel-carrying byte per probe: the decode digest changes
    or the decoder raises — never a silent hash match."""
    pixel_byte = {
        # last entropy byte (cache-hit bits live here)
        "vp8l_subtract_green_cache": -1,
        # the AC-refinement entropy byte (0xAF) sits 3 bytes before EOI
        "jpeg_progressive_ac_refine": -3,
        # inside frame 2's compressed fdAT payload (before IEND's 12+
        # 4-byte chunk trailer); CRC will reject, which also counts
        "apng_blend_over": -20,
        # last strip sample (11)
        "bigtiff_strip_raw": -1,
    }
    for pid, name, data, canon, _shape in D.DEEP_PROBES:
        mutated = bytearray(data)
        mutated[pixel_byte[name]] ^= 0xFF
        try:
            got, _ = D._decode_canonical_deep(name, bytes(mutated))
        except Exception:
            continue
        assert got != canon, f"{name}: corrupted stream still matched"


def test_oracle_values_derive_from_expected_literals_only():
    """The SQL literals equal md5(hand-expected bytes); they never go
    through _decode_canonical_deep, so a buggy decoder cannot
    regenerate them into agreement."""
    import duckdb

    rows = duckdb.sql(D.MEDIA_KNOWN_ANSWER_PROBES_DEEP_SQL).fetchall()
    by_id = {r[0]: r for r in rows}
    for pid, name, _data, canon, shape in D.DEEP_PROBES:
        assert by_id[pid][3] == D._md5_int(canon)
        assert by_id[pid][2] == len(canon)

"""Deep spec-derived known-answer probes (media_known_answers_deep):
VP8L subtract-green + color cache, progressive-JPEG AC refinement,
APNG OP_OVER compositing, BigTIFF geometry, 16-bit Predictor-2 TIFF,
MP4 stts/ctts sample timing, IMA/MS-ADPCM WAV block decodes, both
old-style JPEG-in-TIFF layouts (interchange 513/514 and §22 table
tags 519/520/521), the MP3 frame-header table walk (+ Xing tag), and
the WebM/EBML varint walk. Same contract as
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
        # inside the deflate-compressed 16-bit delta strip
        "tiff16_predictor2_deflate": -1,
        # last ctts offset byte (100 -> flipped)
        "mp4_stts_ctts_timing": -25,
        # block-2 nibble byte (samples 16-17; 17 survives fact cut)
        "wav_ima_adpcm_blocks": -1,
        # last nibble byte (samples 7-8)
        "wav_ms_adpcm_predictor": -1,
        # block-2 DC value bits of the embedded interchange stream
        # (entropy ...F5 FF 00 + FFD9 trailer)
        "tiff_oldjpeg_interchange_513": -5,
        # Cr DC value bits of the raw §22 entropy strip (0x62)
        "tiff_oldjpeg_tables_519": -2,
        # strip-2 Cr value bits (0xBD) — the DC-reset-dependent half
        "tiff_oldjpeg_multistrip_dc_reset": -2,
        # post-RST MCU's Cr value bits (0xBD)
        "tiff_oldjpeg_dri_restart": -2,
        # channel-1 nibble word byte (frames 2-3 of the right channel)
        "wav_ima_stereo_interleave": -3,
        # Xing frame-count low byte (tag at ID3 26 + header 4 +
        # side-info 32 + magic/flags 8 + count bytes 3)
        "mp3_vbr_xing_walk": 73,
        # third frame's bitrate/samplerate byte (2*72 + 2): the walk
        # must stop there, shrinking n_frames and duration
        "mp3_mpeg25_param_stop": 146,
        # second video track's PixelWidth high byte (1920 -> 63616):
        # the widest-video rule must report the flip
        "webm_ebml_walk": 71,
    }
    for pid, name, data, canon, _shape in D.DEEP_PROBES:
        mutated = bytearray(data)
        mutated[pixel_byte[name]] ^= 0xFF
        try:
            got, _ = D._decode_canonical_deep(name, bytes(mutated))
        except Exception:
            continue
        assert got != canon, f"{name}: corrupted stream still matched"


def test_tiff16_predictor_runs_in_sample_space():
    """Predictor 2 on 16-bit samples must cumsum u16 VALUES: the
    row-1 chain FFEE + 0023 wraps mod 2^16 to 0011 (high byte 0x00)
    and lands on 8000 (high byte 0x80) — a byte-wise or big-endian
    undo cannot produce this row."""
    from parquet_extractor_spark.functions.tiff import decode_tiff

    arr = decode_tiff(D.build_tiff16_predictor_probe())
    assert arr.shape == (2, 3, 3)
    assert list(arr[1, :, 0]) == [0xFF, 0x00, 0x80]


def test_mp4_multi_entry_stts_and_signed_ctts():
    """The fixture builder's stbl path and the parser agree with the
    hand-packed probe: run-length stts sums across BOTH entries and
    v1 ctts offsets stay signed."""
    from parquet_extractor_spark.functions.mp4 import (
        build_mp4,
        parse_mp4_metadata,
    )

    data = build_mp4(
        media_timescale=600,
        stts_entries=[(3, 100), (2, 250)],
        ctts_entries=[(2, 0), (1, -50), (2, 100)],
    )
    m = parse_mp4_metadata(data)
    assert m["n_frames"] == 5
    assert m["media_duration"] == 800
    assert m["media_timescale"] == 600
    assert m["fps_milli"] == 3750
    assert (m["cts_offset_min"], m["cts_offset_max"]) == (-50, 100)
    # v0 ctts: the same -50 pattern is out of spec; unsigned parse
    # must surface it as the huge positive value, proving the version
    # dispatch is real
    data0 = build_mp4(
        media_timescale=600,
        stts_entries=[(5, 160)],
        ctts_entries=[(5, 25)],
        ctts_version=0,
    )
    m0 = parse_mp4_metadata(data0)
    assert (m0["cts_offset_min"], m0["cts_offset_max"]) == (25, 25)
    assert m0["fps_milli"] == 3750


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


def test_ima_adpcm_fact_truncation_and_clamps():
    """The fact chunk (17) must cut the padded 18th sample, and both
    saturation clamps must engage (block 2 drives the predictor below
    -32768 twice)."""
    from parquet_extractor_spark.functions.wav import decode_wav

    data = bytearray(D.build_wav_ima_adpcm_probe())
    samples, rate = decode_wav(bytes(data))
    assert rate == 8000 and samples.shape == (17,)
    assert int(samples.min()) == -32768
    # raise fact to 18: the padded tail sample (-32763, derived in the
    # module comment) reappears
    fact_off = data.index(b"fact") + 8
    data[fact_off:fact_off + 4] = (18).to_bytes(4, "little")
    samples18, _ = decode_wav(bytes(data))
    assert samples18.shape == (18,) and int(samples18[-1]) == -32763
    assert samples18[:17].tolist() == samples.tolist()


def test_oldjpeg_tables_layout_requires_all_three_table_tags():
    """§22 decoding must fail loudly (NotImplementedError boundary),
    not guess, when a table pointer tag is missing."""
    from parquet_extractor_spark.functions.tiff import decode_tiff

    data = bytearray(D.build_tiff_oldjpeg_tables_probe())
    # retag JPEGACTables (521) to a tag the reader ignores
    idx = data.index((521).to_bytes(2, "little"), 8)
    data[idx:idx + 2] = (5210).to_bytes(2, "little")
    with pytest.raises((NotImplementedError, ValueError)):
        decode_tiff(bytes(data))


def test_oldjpeg_multistrip_dc_reset_equals_fresh_scan():
    """Strip 2 must decode exactly as a FRESH standalone scan of the
    same entropy block (DC predictors reset at the strip boundary) —
    and differently from strip 1, so the equality is not vacuous. A
    decoder carrying strip 1's predictors would give strip 2 a Y DC
    of 24 (pixel base 176), not 8 (base 144)."""
    from parquet_extractor_spark.functions.tiff import decode_tiff

    multi = decode_tiff(D.build_tiff_oldjpeg_multistrip_probe())
    fresh = decode_tiff(
        D._build_oldstyle_tables_tiff(8, 8, 8, [D._OLDJPEG_BLOCK_B])
    )
    assert multi.shape == (16, 8, 3) and fresh.shape == (8, 8, 3)
    assert (multi[8:] == fresh).all()
    assert (multi[:8] != fresh).any()


def test_malformed_probe_expectations_match_direct_classification():
    """media_malformed_probes' hand-written VALUES oracle must agree
    with direct (non-Spark) classification of every planted stream,
    and the probe ids/names must be unique and aligned."""
    from parquet_extractor_spark.operators import media_robustness as R

    probes = R._build_probes()
    expected = {(p, n): (o, d) for p, n, o, d in R._EXPECTED}
    assert len(probes) == len(expected)
    assert len({p for p, _, _ in probes}) == len(probes)
    for pid, name, data in probes:
        outcome, detail = R._classify(name, data)
        assert (outcome, detail) == expected[(pid, name)], name
    # classification teeth: an undeclared exception must propagate,
    # not be classified
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        R._classify("unknown_family", b"")

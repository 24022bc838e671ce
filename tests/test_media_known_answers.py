"""Spec-derived known-answer probes (operators/media_known_answers).

The EXPECTED arrays in the module are hand-derived from the format
specs; these tests assert the real decoders reproduce them and that
the derivation is not vacuous (a corrupted stream or a perturbed
expectation fails)."""

from __future__ import annotations

import numpy as np
import pytest

from parquet_extractor_spark.operators import media_known_answers as M


@pytest.mark.parametrize(
    "pid,name,data,canon,shape",
    M.PROBES,
    ids=[p[1] for p in M.PROBES],
)
def test_probe_decodes_to_hand_expectation(pid, name, data, canon, shape):
    got, gshape = M._decode_canonical(name, data)
    assert tuple(gshape) == tuple(shape)
    assert got == canon


def test_jpeg_dc_only_pixels_are_flat_spec_values():
    """The T.81 derivation in the module comment: block 1 = 160
    everywhere, block 2 = 144 everywhere (DC-only IDCT + level
    shift). Checked against the raw decode, not just the digest."""
    from parquet_extractor_spark.functions.jpeg import decode_jpeg

    arr = decode_jpeg(M.build_jpeg_probe())
    assert arr.shape == (8, 16, 3)
    assert np.all(arr[:, :8] == 160)
    assert np.all(arr[:, 8:] == 144)


def test_png_probe_exercises_all_five_filters():
    assert sorted(row[0] for row in M._PNG_FILTERED_ROWS) == [0, 1, 2, 3, 4]


def test_corrupted_stream_cannot_match_the_pinned_row():
    """Sanity that the gate has teeth: flipping a pixel-carrying byte
    either changes the decoded digest or raises — it can never still
    hash-match the hand-pinned oracle row."""
    # offset of a PIXEL-CARRYING byte per probe (BMP row padding or
    # container trailers would be legitimately pixel-neutral)
    pixel_byte = {
        "gif_lzw_appendix_f": -5,   # first LZW data byte (0x44)
        "gif_interlaced_appendix_e": -3,  # last LZW data byte (0x5A)
        "bmp_bottomup_bgr": -3,     # last green-channel byte
        "tiff_strip_raw": -1,       # last strip sample (11)
        "tiff_strip_packbits": -1,  # last literal sample (0x0B)
        "wav_pcm16_riff": -1,       # high byte of the last sample
        "wav_pcm8_riff": -1,        # last sample byte
        "wav_ulaw_g711": -1,        # last G.711 code
        "wav_alaw_g711": -1,        # last G.711 code
        "tiff_strip_lzw": -2,       # inside the 11 and EOI codes
        "tiff_predictor2": -1,      # last horizontal delta
    }
    for pid, name, data, canon, _shape in M.PROBES:
        if name.startswith(("png", "jpeg")):
            continue  # checksummed/entropy-coded containers may raise
        mutated = bytearray(data)
        mutated[pixel_byte[name]] ^= 0xFF
        try:
            got, _ = M._decode_canonical(name, bytes(mutated))
        except Exception:
            continue
        assert got != canon, f"{name}: corrupted stream still matched"


def test_oracle_values_derive_from_expected_literals_only():
    """The SQL literal for each probe equals md5(expected bytes) —
    i.e. regenerating from a buggy decoder CANNOT update these rows
    (they never call _decode_canonical)."""
    import duckdb

    rows = duckdb.sql(M.MEDIA_KNOWN_ANSWER_PROBES_SQL).fetchall()
    by_id = {r[0]: r for r in rows}
    for pid, name, _data, canon, shape in M.PROBES:
        assert by_id[pid][3] == M._md5_int(canon)
        assert by_id[pid][2] == len(canon)

"""JPEG codec tests (functions/jpeg.py): baseline round-trip fidelity
across layouts and quality, restart markers, marker-structure
validity, progressive (SOF2) identity with baseline, and the declared
arithmetic-coding boundary."""

import struct

import numpy as np
import pytest

from parquet_extractor_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
)


def _gradient(h: int = 48, w: int = 64) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // max(1, w - 1),
            yy * 255 // max(1, h - 1),
            (xx + yy) * 255 // max(1, w + h - 2),
        ],
        axis=2,
    ).astype(np.uint8)


def test_roundtrip_gradient_444_and_420():
    img = _gradient()
    for sub in (False, True):
        data = encode_jpeg(img, quality=90, subsample=sub)
        assert is_jpeg(data)
        assert data.endswith(b"\xff\xd9")
        dec = decode_jpeg(data)
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        # smooth content at q90: tight reconstruction
        assert err.max() <= 8
        assert err.mean() < 2.0


def test_flat_color_reconstructs_exactly():
    img = np.full((17, 23, 3), 200, dtype=np.uint8)  # odd dims
    dec = decode_jpeg(encode_jpeg(img, quality=75))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - 200).max() <= 1


def test_restart_markers_roundtrip():
    img = _gradient(40, 56)
    for sub in (False, True):
        data = encode_jpeg(img, quality=90, subsample=sub, restart_interval=2)
        assert b"\xff\xdd" in data  # DRI present
        dec = decode_jpeg(data)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8


def test_quality_trades_size_for_error():
    rng = np.random.default_rng(3)
    base = _gradient().astype(int)
    img = np.clip(base + rng.integers(-20, 21, size=base.shape), 0, 255).astype(
        np.uint8
    )
    hi = encode_jpeg(img, quality=95)
    lo = encode_jpeg(img, quality=30)
    assert len(lo) < len(hi)
    err_hi = np.abs(decode_jpeg(hi).astype(int) - img.astype(int)).mean()
    err_lo = np.abs(decode_jpeg(lo).astype(int) - img.astype(int)).mean()
    assert err_hi < err_lo


def test_deterministic_bytes():
    img = _gradient(24, 24)
    assert encode_jpeg(img, quality=80) == encode_jpeg(img, quality=80)


def test_progressive_roundtrip_identical_to_baseline():
    """Progressive encode→decode must reconstruct pixels IDENTICAL to
    baseline encode→decode at the same quality: the coefficients are
    the same, only the entropy layout differs — a strong equality
    check on every Annex G path (spectral selection, successive
    approximation, EOB runs, refinement correction bits)."""
    from parquet_extractor_spark.functions.jpeg import encode_jpeg

    rng = np.random.default_rng(11)
    for shape, sub, q in [
        ((16, 16, 3), False, 90),
        ((24, 17, 3), False, 75),  # odd width
        ((21, 13, 3), True, 60),  # odd dims + 4:2:0
        ((64, 48, 3), True, 85),
    ]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        prog = decode_jpeg(
            encode_jpeg(img, quality=q, subsample=sub, progressive=True)
        )
        assert np.array_equal(base, prog), (shape, sub, q)


def test_progressive_smooth_image_exercises_eob_runs():
    """A smooth gradient makes whole AC bands zero, forcing EOBn>0
    runs and buffered refinement correction bits through both encoder
    and decoder; identity with baseline pins them."""
    from parquet_extractor_spark.functions.jpeg import encode_jpeg

    yy, xx = np.mgrid[0:64, 0:96]
    img = np.stack(
        [
            (yy * 2).astype(np.uint8),
            xx.astype(np.uint8),
            ((yy + xx) // 2).astype(np.uint8),
        ],
        axis=2,
    )
    base = decode_jpeg(encode_jpeg(img, quality=70, subsample=True))
    prog = decode_jpeg(
        encode_jpeg(img, quality=70, subsample=True, progressive=True)
    )
    assert np.array_equal(base, prog)


def test_arithmetic_coding_declared_not_implemented():
    # SOI + SOF9 (extended sequential, arithmetic coding) header
    data = (
        b"\xff\xd8"
        + b"\xff\xc9"
        + struct.pack(">H", 11)
        + b"\x08\x00\x08\x00\x08\x01"
        + bytes([1, 0x11, 0])
    )
    with pytest.raises(NotImplementedError):
        decode_jpeg(data)


def test_garbage_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"definitely not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xda truncated")
    assert not is_jpeg(None)
    assert not is_jpeg(b"")


def test_fill_bytes_before_markers_are_skipped():
    """T.81 allows any number of 0xFF fill bytes before a marker."""
    img = _gradient(16, 16)
    data = bytearray(encode_jpeg(img, quality=85))
    # inject fill bytes before the DQT marker (first marker after APP0)
    i = data.index(b"\xff\xdb")
    padded = bytes(data[:i]) + b"\xff\xff\xff" + bytes(data[i:])
    dec = decode_jpeg(padded)
    assert dec.shape == img.shape


def test_non_interleaved_scan_declared_not_implemented():
    """A scan with fewer components than the frame must raise, never
    silently scramble blocks."""
    img = _gradient(16, 16)
    data = bytearray(encode_jpeg(img, quality=85))
    i = data.index(b"\xff\xda")
    # rewrite the SOS header to claim a single-component scan
    # original payload: len(2) ns=3 (1,0x00) (2,0x11) (3,0x11) 0 63 0
    new_sos = b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    end = i + 2 + struct.unpack(">H", bytes(data[i + 2:i + 4]))[0]
    hacked = bytes(data[:i]) + new_sos + bytes(data[end:])
    with pytest.raises(NotImplementedError):
        decode_jpeg(hacked)


def test_undecodable_jpeg_rows_fall_back_to_fake_feature(spark):
    """A corrupt/truncated JPEG row must not fail the mapInPandas
    job — it gets the declared byte-hash stand-in feature."""
    from parquet_extractor_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        fake_feature,
    )

    # SOI + truncated SOF2 header: passes is_jpeg, decode raises
    truncated = (
        b"\xff\xd8\xff\xc2" + struct.pack(">H", 8) + b"\x08\x00\x08\x00\x08\x01"
    )
    media = spark.createDataFrame(
        [(7, "image", "image/jpeg", 8, 8, None, truncated)], MEDIA_SCHEMA
    )
    [row] = extract_features(media).collect()
    assert row.feature == [
        __import__("numpy").float32(v) for v in fake_feature(truncated)
    ]


def test_jpeg_exif_orientation_applied():
    """A JPEG carrying an EXIF APP1 orientation decodes to the VIEW
    transform of its stored pixels (camera files store rotation as a
    tag, not rotated pixels)."""
    import struct as _struct

    import numpy as np

    from parquet_extractor_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        jpeg_exif_orientation,
    )

    y, x = np.mgrid[0:16, 0:24]
    px = np.clip(
        np.stack([128 + 80 * np.sin(x / 4.0)] * 3, axis=2), 0, 255
    ).astype(np.uint8)
    plain = encode_jpeg(px, quality=95)
    base = decode_jpeg(plain)

    def with_exif(jpeg: bytes, o: int) -> bytes:
        # minimal APP1: Exif\0\0 + little-endian TIFF blob with one
        # IFD0 entry (tag 274, SHORT, value o)
        blob = (
            b"II" + _struct.pack("<HI", 42, 8)
            + _struct.pack("<H", 1)
            + _struct.pack("<HHIHH", 274, 3, 1, o, 0)
            + _struct.pack("<I", 0)
        )
        payload = b"Exif\x00\x00" + blob
        app1 = b"\xff\xe1" + _struct.pack(">H", len(payload) + 2) + payload
        return jpeg[:2] + app1 + jpeg[2:]

    assert jpeg_exif_orientation(plain) == 1
    for o, want in (
        (1, base),
        (3, base[::-1, ::-1]),
        (6, np.rot90(base, k=-1)),
        (8, np.rot90(base, k=1)),
    ):
        tagged = with_exif(plain, o)
        assert jpeg_exif_orientation(tagged) == o
        assert np.array_equal(decode_jpeg(tagged), want), o
    # garbage APP1 never breaks the decode
    junk = plain[:2] + b"\xff\xe1\x00\x08Exif\x00\x00" + plain[2:]
    assert np.array_equal(decode_jpeg(junk), base)

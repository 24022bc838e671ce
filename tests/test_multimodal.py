import numpy as np
import pytest

from parquet_extractor_spark.functions.png import (
    PNG_MAGIC,
    decode_png,
    encode_png,
    resize_nearest,
)
from parquet_extractor_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    fake_feature,
    pixel_feature,
    sample_frames,
    synthetic_media,
)


def test_png_roundtrip_all_filters_and_channels():
    rng = np.random.default_rng(7)
    for channels in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(5, 4, channels), dtype=np.uint8)
        for ftype in range(5):  # None/Sub/Up/Average/Paeth
            data = encode_png(arr, filter_type=ftype)
            assert data.startswith(PNG_MAGIC)
            out = decode_png(data)
            assert out.shape == arr.shape
            assert np.array_equal(out, arr)


def test_png_rejects_garbage_and_bad_crc():
    with pytest.raises(ValueError):
        decode_png(b"not a png")
    good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    corrupted = bytearray(good)
    corrupted[40] ^= 0xFF  # flip a byte inside a chunk payload
    with pytest.raises(ValueError):
        decode_png(bytes(corrupted))


def test_decode_image_real_png_jpeg_and_stubbed_other_formats():
    from parquet_extractor_spark.functions.jpeg import encode_jpeg

    arr = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert np.array_equal(decode_image(encode_png(arr)), arr)
    # JPEG decodes for real now (lossy: flat block reconstructs close)
    flat = np.full((8, 8, 3), 120, dtype=np.uint8)
    dec = decode_image(encode_jpeg(flat, quality=90))
    assert dec.shape == flat.shape
    assert np.abs(dec.astype(int) - 120).max() <= 2
    # lossless WebP decodes for real (r06); lossy VP8 stays the
    # declared stub
    from parquet_extractor_spark.functions.webp import (
        build_webp,
        build_webp_lossless,
    )

    assert np.array_equal(decode_image(build_webp_lossless(arr)), arr)
    with pytest.raises(NotImplementedError):
        decode_image(build_webp(8, 8, variant="vp8"))
    # garbage wearing a JPEG magic is a parse error, not a stub
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")


def test_feature_extraction_on_real_4x4_png(spark):
    """VERDICT r01 item 7: mapInPandas features from a REAL decoded
    4x4 PNG — the histogram must reflect the actual pixel values."""
    arr = np.full((4, 4, 3), 200, dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, "image", "image/png", 4, 4, None, bytearray(encode_png(arr)))],
        schema=synthetic_media(spark, n=1).schema,
    )
    [row] = extract_features(df).collect()
    # all 16 pixels have intensity 200 -> bin 12 of 16 holds everything
    expected = [0.0] * FEATURE_DIM
    expected[200 * FEATURE_DIM // 256] = 1.0
    assert row.feature == expected
    assert pixel_feature(arr) == expected


def test_feature_extraction_plumbing(spark):
    media = synthetic_media(spark, n=30)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r.feature) == FEATURE_DIM
        assert r.n_bytes > 0
    # image rows went through the real pixel path: histogram sums to 1
    img_ids = {r.media_id for r in media.filter("kind = 'image'").collect()}
    for r in feats:
        if r.media_id in img_ids:
            assert abs(sum(r.feature) - 1.0) < 1e-6  # float32 column
    # deterministic across executions (pure function of bytes)
    again = {r.media_id: r.feature for r in extract_features(media).collect()}
    for r in feats:
        assert again[r.media_id] == r.feature


def test_fake_feature_deterministic_and_null_safe():
    assert fake_feature(b"abc") == fake_feature(b"abc")
    assert fake_feature(None) == [0.0] * FEATURE_DIM


def test_frame_sampling_fanout(spark):
    media = synthetic_media(spark, n=9)
    frames = sample_frames(media, every_ms=1000)
    rows = frames.collect()
    videos = media.filter("kind = 'video'").count()
    # duration 5000ms, grid 0..4999 step 1000 -> 5 frames per video
    assert len(rows) == videos * 5
    assert {r.frame_ts_ms for r in rows} == {0, 1000, 2000, 3000, 4000}


def test_resize_images_real_pixels(spark):
    from parquet_extractor_spark.operators.multimodal import resize_images

    from parquet_extractor_spark.functions.jpeg import is_jpeg

    media = synthetic_media(spark, n=30)
    out = resize_images(media, width=32, height=16).collect()
    # only image rows survive; each output is a real image at target
    # dims, re-encoded in the source row's own format
    assert len(out) == 10
    originals = {
        r.media_id: (bytes(r.data), decode_image(bytes(r.data)))
        for r in media.filter("kind = 'image'").collect()
    }
    from parquet_extractor_spark.functions.bmp import is_bmp
    from parquet_extractor_spark.functions.gif import is_gif
    from parquet_extractor_spark.functions.png import PNG_MAGIC

    from parquet_extractor_spark.functions.tiff import is_tiff
    from parquet_extractor_spark.functions.webp import is_webp

    fmt_counts = {
        "png": 0, "jpeg": 0, "gif": 0, "bmp": 0, "webp": 0, "tiff": 0,
    }
    for r in out:
        assert r.width == 32 and r.height == 16
        assert r.orig_width == 64
        src_bytes, src_pixels = originals[r.media_id]
        want = resize_nearest(src_pixels, 32, 16)
        resized = decode_image(bytes(r.data))
        assert resized.shape == (16, 32, 3)
        if is_jpeg(src_bytes):
            fmt_counts["jpeg"] += 1
            assert is_jpeg(bytes(r.data))
            # JPEG re-encode is lossy; require the pixels to track the
            # nearest-resampled original in aggregate
            err = np.abs(resized.astype(int) - want.astype(int)).mean()
            assert err < 48, err  # random-noise pixels: worst case
        else:
            # PNG / GIF / BMP are lossless: re-encoded in the source
            # row's own format, nearest-neighbor agrees exactly
            if src_bytes.startswith(PNG_MAGIC):
                fmt_counts["png"] += 1
                assert bytes(r.data).startswith(PNG_MAGIC)
            elif is_gif(src_bytes):
                fmt_counts["gif"] += 1
                assert is_gif(bytes(r.data))
            elif is_bmp(src_bytes):
                fmt_counts["bmp"] += 1
                assert is_bmp(bytes(r.data))
            elif is_webp(src_bytes):
                fmt_counts["webp"] += 1
                assert is_webp(bytes(r.data))
            else:
                fmt_counts["tiff"] += 1
                assert is_tiff(bytes(r.data))
            assert np.array_equal(resized, want)
    # 10 image rows, format cycle PNG/JPEG/GIF/BMP/WebP/TIFF over
    # i//3 = 0..9
    assert fmt_counts == {
        "png": 2, "jpeg": 2, "gif": 2, "bmp": 2, "webp": 1, "tiff": 1,
    }
    # deterministic across runs
    again = resize_images(media, width=32, height=16).collect()
    assert [bytes(r.data) for r in out] == [bytes(r.data) for r in again]


def test_wav_roundtrip_mono_and_stereo():
    from parquet_extractor_spark.functions.wav import (
        decode_wav,
        encode_wav,
        is_wav,
    )

    mono = (np.sin(np.arange(400) / 10.0) * 1000).astype(np.int16)
    data = encode_wav(mono, 8000)
    assert is_wav(data)
    out, sr = decode_wav(data)
    assert sr == 8000
    assert np.array_equal(out, mono)

    stereo = np.stack([mono, -mono], axis=1)
    out2, _ = decode_wav(encode_wav(stereo, 16000))
    assert out2.shape == (400, 2)
    assert np.array_equal(out2, stereo)
    assert not is_wav(b"RIFFxxxx")  # too short / not WAVE


def test_g711_codepoints_are_self_inverse():
    """encode(decode(c)) == c for every A-law code and every µ-law
    code except 0x7F (negative zero, which the CCITT reference
    encoder folds to positive zero 0xFF)."""
    from parquet_extractor_spark.functions.wav import (
        alaw_decode,
        alaw_encode,
        ulaw_decode,
        ulaw_encode,
    )

    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(alaw_encode(alaw_decode(codes)), codes)
    u = ulaw_encode(ulaw_decode(codes))
    assert np.array_equal(np.delete(u, 0x7F), np.delete(codes, 0x7F))
    assert u[0x7F] == 0xFF  # -0 folds to +0 per the reference code
    # magnitude extremes land where the spec says
    assert ulaw_decode(np.array([0x80], dtype=np.uint8))[0] == 32124
    assert alaw_decode(np.array([0xAA], dtype=np.uint8))[0] == 32256


def test_wav_all_eight_encodings_roundtrip():
    """Every RIFF encoding decodes back within its quantization step:
    exact for pcm16/24/32/float; one-LSB-of-8 (256) for pcm8; G.711's
    top-segment step (<=512) for A-law/µ-law. Covers the fmt-tag
    branches the former PCM-16-only boundary excluded."""
    from parquet_extractor_spark.functions.wav import (
        decode_wav,
        encode_wav,
        parse_wav_header,
    )

    rng = np.random.default_rng(7)
    sig = rng.normal(0, 8000, 500).astype(np.int16)
    tols = {
        "pcm16": 0, "pcm24": 0, "pcm32": 0, "float32": 0.05, "float64": 0,
        "pcm8": 256, "alaw": 512, "ulaw": 512,
    }
    for fmt, tol in tols.items():
        data = encode_wav(sig, 8000, fmt=fmt)
        out, sr = decode_wav(data)
        assert sr == 8000
        if fmt == "pcm24":
            got = (np.asarray(out) >> 8).astype(np.float64)
        elif fmt == "pcm32":
            got = (np.asarray(out) >> 16).astype(np.float64)
        elif fmt.startswith("float"):
            got = np.asarray(out, dtype=np.float64) * 32768.0
        else:
            got = np.asarray(out, dtype=np.float64)
        assert np.abs(got - sig).max() <= tol, fmt
        h = parse_wav_header(data)
        assert h["n_frames"] == 500 and h["channels"] == 1
        # stereo reshape holds for non-16-bit widths too
        st, _ = decode_wav(
            encode_wav(np.stack([sig, -sig], axis=1), 16000, fmt=fmt)
        )
        assert st.shape == (500, 2), fmt


def test_wav_extensible_and_exotic_and_corrupt():
    """WAVE_FORMAT_EXTENSIBLE resolves through the subformat GUID;
    a truly exotic tag (GSM) raises the declared
    NotImplementedError; corrupt containers raise ValueError from
    decode but yield all-NULL metadata from the row-safe path."""
    import struct

    import pytest as _pytest

    from parquet_extractor_spark.functions.wav import (
        decode_wav,
        encode_wav,
        parse_wav_header,
    )
    from parquet_extractor_spark.operators.multimodal import (
        audio_metadata_for_bytes,
    )

    sig = (np.sin(np.arange(200) / 4) * 9000).astype(np.int16)
    plain = encode_wav(sig, 8000)  # RIFF + 16-byte PCM fmt + data

    def swap_fmt(data: bytes, new_fmt: bytes) -> bytes:
        # replace the 16-byte fmt chunk body, fixing RIFF/chunk sizes
        head, rest = data[:12], data[20:]
        body = new_fmt + rest[16:]
        out = (
            head[:4]
            + struct.pack("<I", 4 + 8 + len(new_fmt) + len(rest) - 16)
            + head[8:]
            + b"fmt "
            + struct.pack("<I", len(new_fmt))
            + body
        )
        return out

    # EXTENSIBLE: 40-byte fmt, subformat GUID leading with 0x0001 (PCM)
    ext = struct.pack(
        "<HHIIHHHHI", 0xFFFE, 1, 8000, 16000, 2, 16, 22, 16, 1
    ) + b"\x01\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xAA\x00\x38\x9B\x71"
    ext_wav = swap_fmt(plain, ext)
    h = parse_wav_header(ext_wav)
    assert h["format"] == 1 and h["bits_per_sample"] == 16
    out, _ = decode_wav(ext_wav)
    assert np.array_equal(out, sig)
    # metadata path agrees with the plain-PCM container
    assert audio_metadata_for_bytes(ext_wav) == audio_metadata_for_bytes(
        plain
    )

    # GSM (tag 0x31) = exotic: parse succeeds, decode declares boundary
    adpcm = swap_fmt(plain, struct.pack("<HHIIHH", 0x31, 1, 8000, 1625, 65, 0))
    assert parse_wav_header(adpcm)["format"] == 0x31
    with _pytest.raises(NotImplementedError):
        decode_wav(adpcm)

    # corrupt: header truncated mid-fmt
    with _pytest.raises(ValueError):
        decode_wav(plain[:16])
    assert audio_metadata_for_bytes(plain[:16]) == (None,) * 7
    assert audio_metadata_for_bytes(adpcm)[0] == "wav"  # metadata-only ok


def test_audio_feature_tracks_real_energy():
    """The envelope must reflect actual signal energy: a burst in the
    first quarter and silence elsewhere."""
    from parquet_extractor_spark.functions.wav import audio_feature

    sig = np.zeros(1600, dtype=np.int16)
    sig[:400] = (np.sin(np.arange(400)) * 8000).astype(np.int16)
    feat = audio_feature(sig, 16)
    assert max(feat[:4]) == 1.0  # burst windows carry the peak
    assert all(v == 0.0 for v in feat[4:])
    assert audio_feature(np.zeros(0, dtype=np.int16), 16) == [0.0] * 16


def test_feature_extraction_on_real_wav(spark):
    """Audio rows in synthetic_media are REAL PCM-16 WAVs: the Spark
    mapInPandas path must produce the same envelope as decoding
    locally, and a pure sine's envelope is near-flat (all windows
    close to peak)."""
    from parquet_extractor_spark.functions.wav import (
        audio_feature,
        decode_wav,
    )

    media = synthetic_media(spark, n=9)
    audio = media.filter("kind = 'audio'")
    feats = {r.media_id: r.feature for r in extract_features(audio).collect()}
    local = {
        r.media_id: audio_feature(decode_wav(bytes(r.data))[0], FEATURE_DIM)
        for r in audio.collect()
    }
    assert set(feats) == set(local) and len(feats) == 3
    for mid, f in feats.items():
        assert np.allclose(f, local[mid], atol=1e-6)  # float32 column
        assert min(f) > 0.8  # steady sine: near-flat energy envelope


def test_audio_spectral_features_find_the_tone(spark):
    """A pure 1 kHz sine must put its peak energy in the FFT band
    containing 1 kHz (band = floor(f / (nyquist/dim)))."""
    import numpy as np

    from parquet_extractor_spark.functions.wav import encode_wav
    from parquet_extractor_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_spectral_features,
    )

    sr, freq, dur = 8000, 1000.0, 0.25
    t = np.arange(int(sr * dur)) / sr
    sig = (0.8 * 32767 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
    rows = [
        (1, "audio", "audio/wav", None, None, 250, bytes(encode_wav(sig, sr)))
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = audio_spectral_features(media).collect()
    assert len(out) == 1
    r = out[0]
    assert r.sample_rate == sr and r.n_samples == len(sig)
    band_width = (sr / 2) / FEATURE_DIM  # 250 Hz
    expect_band = int(freq // band_width)
    energies = list(r.band_energies)
    assert energies.index(max(energies)) == expect_band
    assert max(energies) == 1.0


def test_gif_roundtrip_and_lzw_reset():
    from parquet_extractor_spark.functions.gif import (
        decode_gif,
        encode_gif,
        is_gif,
    )

    rng = np.random.default_rng(7)
    for ncol in (2, 17, 256):
        pal = np.unique(
            rng.integers(0, 256, (ncol, 3), dtype=np.uint8), axis=0
        )
        arr = pal[rng.integers(0, len(pal), (48, 64))]
        data = encode_gif(arr)
        assert is_gif(data)
        assert np.array_equal(decode_gif(data), arr)
    # large frame drives the LZW dictionary past 4096 codes, forcing
    # the clear-code reset path in BOTH encoder and decoder
    pal = np.unique(rng.integers(0, 256, (256, 3), dtype=np.uint8), axis=0)
    big = pal[rng.integers(0, len(pal), (200, 300))]
    assert np.array_equal(decode_gif(encode_gif(big)), big)
    with pytest.raises(ValueError):  # >256 colors must refuse, not quantize
        encode_gif(rng.integers(0, 256, (30, 30, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_gif(b"not a gif")


def test_gif_interlaced_decode():
    """Hand-build an interlaced stream: permute an encoded frame's
    rows into pass order, set the interlace flag, and require the
    decoder to undo it."""
    import struct

    from parquet_extractor_spark.functions.gif import (
        _lzw_encode,
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(11)
    pal = np.unique(rng.integers(0, 256, (16, 3), dtype=np.uint8), axis=0)
    arr = pal[rng.integers(0, len(pal), (16, 8))]
    plain = encode_gif(arr)
    # recompute the palette indices the encoder used
    palette, indices = np.unique(
        arr.reshape(-1, 3), axis=0, return_inverse=True
    )
    h = arr.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    interlaced_rows = indices.reshape(h, -1)[order]
    depth = max(1, int(len(palette) - 1).bit_length())
    mcs = max(2, depth)
    compressed = _lzw_encode(
        interlaced_rows.reshape(-1).astype(np.uint8), mcs
    )
    # splice: header + LSD + GCT from the plain encoding, then an
    # image descriptor with the interlace bit set
    gct_len = 3 * (1 << depth)
    head = plain[: 13 + gct_len]
    out = bytearray(head)
    out += b"\x2C" + struct.pack(
        "<HHHHB", 0, 0, arr.shape[1], arr.shape[0], 0x40
    )
    out.append(mcs)
    for i in range(0, len(compressed), 255):
        block = compressed[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3B"
    assert np.array_equal(decode_gif(bytes(out)), arr)


def test_bmp_roundtrip_padding_and_guards():
    from parquet_extractor_spark.functions.bmp import (
        decode_bmp,
        encode_bmp,
        is_bmp,
    )

    rng = np.random.default_rng(13)
    for w, h in ((1, 1), (3, 2), (5, 7), (64, 48)):  # odd widths pad
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        data = encode_bmp(arr)
        assert is_bmp(data)
        assert np.array_equal(decode_bmp(data), arr)
    with pytest.raises(ValueError):
        decode_bmp(b"XX not a bmp")
    with pytest.raises(ValueError):  # truncated pixel array
        decode_bmp(encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))[:-8])


def test_decode_image_dispatches_gif_and_bmp():
    from parquet_extractor_spark.functions.bmp import encode_bmp
    from parquet_extractor_spark.functions.gif import encode_gif

    rng = np.random.default_rng(17)
    pal = np.unique(rng.integers(0, 256, (8, 3), dtype=np.uint8), axis=0)
    gif_arr = pal[rng.integers(0, len(pal), (6, 9))]
    assert np.array_equal(decode_image(encode_gif(gif_arr)), gif_arr)
    bmp_arr = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_bmp(bmp_arr)), bmp_arr)


def test_corrupt_media_rows_fall_back_not_crash():
    """Truncated/garbage bytes wearing a valid magic must raise
    ValueError from the codecs (never struct.error/IndexError), so the
    mapInPandas feature path's per-row fallback catches them."""
    from parquet_extractor_spark.functions.bmp import decode_bmp
    from parquet_extractor_spark.functions.gif import (
        decode_gif,
        encode_gif,
    )
    from parquet_extractor_spark.operators.multimodal import (
        fake_feature,
        feature_for_bytes,
    )

    with pytest.raises(ValueError):
        decode_bmp(b"BM\x00\x01bogus")
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    good = encode_gif(pal[np.zeros((8, 8), dtype=np.int64)])
    with pytest.raises(ValueError):
        decode_gif(good[: len(good) // 2])  # mid-stream truncation
    # the feature path degrades to the byte-hash stand-in, not a crash
    for bad in (b"BM\x00\x01bogus", good[: len(good) // 2]):
        assert feature_for_bytes(bad) == fake_feature(bad)


# ── MP3 frame-header parser (functions/mp3.py) ──────────────────────


def test_mp3_header_walk_cbr_and_tables():
    from parquet_extractor_spark.functions.mp3 import (
        build_mp3_stream,
        is_mp3,
        parse_mp3_metadata,
    )

    s = build_mp3_stream(
        38, version="1", layer=3, bitrate_kbps=128, sample_rate=44100
    )
    assert is_mp3(s)
    m = parse_mp3_metadata(s)
    assert m == {
        "version": "1",
        "layer": 3,
        "sample_rate": 44100,
        "channels": 2,
        "n_frames": 38,
        "bitrate_kbps": 128,
        "vbr": False,
        # 38 frames × 1152 samples / 44100 Hz = 992.6 ms (floor)
        "duration_ms": 992,
        # zero-payload frames carry no Xing/Info tag
        "xing_tag": None,
        "xing_frames": None,
        "xing_bytes": None,
    }
    # layer I uses 384 samples/frame and the ×4 slot size
    m1 = parse_mp3_metadata(
        build_mp3_stream(4, version="1", layer=1, bitrate_kbps=192,
                         sample_rate=48000)
    )
    assert (m1["layer"], m1["n_frames"], m1["duration_ms"]) == (1, 4, 32)
    # MPEG-2 LSF halves layer-III samples/frame; mono channel mode
    m2 = parse_mp3_metadata(
        build_mp3_stream(10, version="2", layer=3, bitrate_kbps=64,
                         sample_rate=22050, mono=True)
    )
    assert (m2["channels"], m2["duration_ms"]) == (1, 261)
    # MPEG-2.5 sample-rate table
    m25 = parse_mp3_metadata(
        build_mp3_stream(5, version="2.5", layer=2, bitrate_kbps=48,
                         sample_rate=8000)
    )
    assert (m25["version"], m25["sample_rate"]) == ("2.5", 8000)


def test_mp3_id3_skip_vbr_and_garbage():
    from parquet_extractor_spark.functions.mp3 import (
        build_mp3_stream,
        is_mp3,
        parse_mp3_metadata,
    )

    tagged = build_mp3_stream(
        6, version="1", layer=3, bitrate_kbps=160, sample_rate=44100,
        id3_payload=b"TAGDATA" * 12,
    )
    assert tagged[:3] == b"ID3"
    assert parse_mp3_metadata(tagged)["n_frames"] == 6
    vbr = build_mp3_stream(
        8, version="1", layer=3, bitrate_kbps=128, sample_rate=44100
    ) + build_mp3_stream(
        8, version="1", layer=3, bitrate_kbps=224, sample_rate=44100
    )
    mv = parse_mp3_metadata(vbr)
    assert mv["vbr"] is True
    assert mv["n_frames"] == 16
    assert mv["bitrate_kbps"] == (128 * 8 + 224 * 8) // 16
    assert not is_mp3(b"RIFF....WAVE")
    assert not is_mp3(None)
    assert parse_mp3_metadata(b"\xff\x00junk") is None
    # truncated stream parses the clean frame prefix
    trunc = parse_mp3_metadata(
        build_mp3_stream(3, version="1", layer=3, bitrate_kbps=128,
                         sample_rate=44100)[:-10]
    )
    assert trunc["n_frames"] == 2


def test_mp3_xing_tag_parse_offsets_and_flags():
    """Xing/Info tag surfaced from the first frame: side-info offset
    per (version, mode), flag-gated fields, Info magic, and absent-tag
    Nones."""
    from parquet_extractor_spark.functions.mp3 import (
        build_mp3_stream,
        parse_mp3_metadata,
    )

    def plant(stream: bytes, off: int, tag: bytes, flags: int,
              fields: tuple[int, ...]) -> bytes:
        body = tag + flags.to_bytes(4, "big") + b"".join(
            f.to_bytes(4, "big") for f in fields
        )
        out = bytearray(stream)
        out[off:off + len(body)] = body
        return bytes(out)

    # MPEG-1 stereo: side info 32 -> tag at 36
    s = build_mp3_stream(3, version="1", layer=3, bitrate_kbps=128,
                         sample_rate=44100)
    m = parse_mp3_metadata(plant(s, 36, b"Xing", 0x3, (3, 1254)))
    assert (m["xing_tag"], m["xing_frames"], m["xing_bytes"]) == (
        "Xing", 3, 1254
    )
    # frames-only flag word leaves bytes None; Info magic accepted
    m = parse_mp3_metadata(plant(s, 36, b"Info", 0x1, (3,)))
    assert (m["xing_tag"], m["xing_frames"], m["xing_bytes"]) == (
        "Info", 3, None
    )
    # MPEG-1 mono: side info 17 -> tag at 21 (the stereo offset must
    # NOT match)
    mono = build_mp3_stream(3, version="1", layer=3, bitrate_kbps=128,
                            sample_rate=44100, mono=True)
    m = parse_mp3_metadata(plant(mono, 21, b"Xing", 0x1, (3,)))
    assert (m["xing_tag"], m["xing_frames"]) == ("Xing", 3)
    assert parse_mp3_metadata(
        plant(mono, 36, b"Xing", 0x1, (3,))
    )["xing_tag"] is None
    # MPEG-2 mono (lsf): side info 9 -> tag at 13
    lsf = build_mp3_stream(3, version="2", layer=3, bitrate_kbps=64,
                           sample_rate=22050, mono=True)
    m = parse_mp3_metadata(plant(lsf, 13, b"Xing", 0x1, (3,)))
    assert (m["xing_tag"], m["xing_frames"]) == ("Xing", 3)


def test_mp3_pcm_decode_is_declared_boundary():
    import pytest as _pytest

    from parquet_extractor_spark.functions.mp3 import decode_mp3_samples

    with _pytest.raises(NotImplementedError):
        decode_mp3_samples(b"\xff\xfb\x90\x00")


def test_audio_stream_metadata_spark_path(spark):
    """The mapInPandas plumbing end-to-end: WAV rows parse via the
    RIFF header, MP3 rows via the frame walk, and the Spark output
    equals the pure-Python parser row-for-row."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    from parquet_extractor_spark.operators.multimodal import (
        audio_metadata_for_bytes,
        audio_stream_metadata,
        synthetic_audio_rows,
    )

    rows = synthetic_audio_rows(12)
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("data", BinaryType(), True),
        ]
    )
    got = {
        r.media_id: (
            r.container,
            r.sample_rate,
            r.channels,
            r.bitrate_kbps,
            r.n_frames,
            r.vbr,
            r.duration_ms,
        )
        for r in audio_stream_metadata(
            spark.createDataFrame(rows, schema)
        ).collect()
    }
    assert len(got) == 12
    for media_id, data in rows:
        assert got[media_id] == audio_metadata_for_bytes(data)
    # both containers present in the fixture
    assert {v[0] for v in got.values()} == {"wav", "mp3"}


# ── video container metadata (r06: MP4 box walk + WebM EBML walk) ──


def test_mp4_box_walk_parses_built_container():
    from parquet_extractor_spark.functions.mp4 import (
        build_mp4,
        is_mp4,
        parse_mp4_metadata,
    )

    data = build_mp4(
        brand="mp42", timescale=600, duration=1800,
        video_size=(1920, 1080), audio=True,
    )
    assert is_mp4(data)
    m = parse_mp4_metadata(data)
    assert m["brand"] == "mp42"
    assert m["duration_ms"] == 3000  # 1800 / 600 ticks
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["n_tracks"] == 2 and m["has_video"] and m["has_audio"]


def test_mp4_wider_stbl_less_track_keeps_parsed_timing():
    # r10 ADVICE (mp4.py:226): a later, WIDER video track with no
    # stbl/mdhd selects for display size but must not null out timing
    # already parsed from a narrower track.
    from parquet_extractor_spark.functions import mp4 as m4

    narrow = m4._trak(
        1, 1800, b"vide", 640, 360,
        media_timescale=600, stts_entries=[(30, 20)],
    )
    wide = m4._trak(2, 1800, b"vide", 1920, 1080)  # no mdhd/stbl
    moov = m4._box(b"moov", m4._mvhd(600, 1800, 0) + narrow + wide)
    ftyp = m4._box(
        b"ftyp", b"isom" + b"\x00\x00\x00\x00" + b"isom" + b"mp42"
    )
    meta = m4.parse_mp4_metadata(ftyp + moov + m4._box(b"mdat", b"\x00"))
    assert (meta["width"], meta["height"]) == (1920, 1080)
    assert meta["n_frames"] == 30 and meta["media_timescale"] == 600
    assert meta["media_duration"] == 600  # 30 samples x 20 ticks


def test_mp4_v1_and_largesize_paths():
    from parquet_extractor_spark.functions.mp4 import (
        build_mp4,
        parse_mp4_metadata,
    )

    v1 = parse_mp4_metadata(
        build_mp4(timescale=90000, duration=450000, mvhd_version=1,
                  video_size=(1280, 720))
    )
    assert v1["duration_ms"] == 5000
    assert (v1["width"], v1["height"]) == (1280, 720)
    large = parse_mp4_metadata(build_mp4(large_mdat=True))
    assert large["duration_ms"] == 5000  # walk survives 64-bit mdat


def test_mp4_truncated_and_foreign_bytes():
    from parquet_extractor_spark.functions.mp4 import (
        build_mp4,
        parse_mp4_metadata,
    )

    assert parse_mp4_metadata(b"") is None
    assert parse_mp4_metadata(b"\x00\x00\x00\x08free") is None
    whole = build_mp4()
    # cut mid-moov: parser degrades to what is parseable, no raise
    cut = parse_mp4_metadata(whole[: len(whole) // 2])
    assert cut is not None and cut["container"] == "mp4"


def test_webm_ebml_walk_parses_built_container():
    from parquet_extractor_spark.functions.webm import (
        build_webm,
        is_webm,
        parse_webm_metadata,
    )

    data = build_webm(
        doc_type="webm", timecode_scale_ns=500_000,
        duration_ticks=9000.0, video_size=(854, 480),
        audio_channels=None,
    )
    assert is_webm(data)
    m = parse_webm_metadata(data)
    assert m["brand"] == "webm"
    assert m["duration_ms"] == 4500  # 9000 ticks x 0.5ms scale
    assert (m["width"], m["height"]) == (854, 480)
    assert m["n_tracks"] == 1 and m["has_video"] and not m["has_audio"]


def test_webm_vint_multibyte_sizes():
    """Element payloads >127 bytes force multi-byte VINT sizes — the
    builder emits them and the parser must walk across them."""
    from parquet_extractor_spark.functions.webm import (
        build_webm,
        parse_webm_metadata,
    )

    m = parse_webm_metadata(
        build_webm(doc_type="matroska" + "x" * 200,
                   video_size=(3840, 2160), audio_channels=6)
    )
    assert m["brand"].startswith("matroskax")
    assert (m["width"], m["height"]) == (3840, 2160)
    assert m["has_audio"]


def test_webm_malformed_duration_parses_as_absent():
    """NaN/Inf/negative/overflowing Duration floats must parse as
    duration_ms=None, never raise (an executor-side int(NaN) crash)
    or emit a value that overflows the LongType column downstream —
    the spec's Duration is a non-negative finite float."""
    import struct

    from parquet_extractor_spark.functions.webm import (
        DOCTYPE,
        DURATION,
        EBML_HEADER,
        INFO,
        SEGMENT,
        TIMECODE_SCALE,
        _el,
        _el_uint,
        parse_webm_metadata,
    )

    def probe(val: float):
        hdr = _el(EBML_HEADER, _el(DOCTYPE, b"webm"))
        info = _el(
            INFO,
            _el_uint(TIMECODE_SCALE, 1_000_000)
            + _el(DURATION, struct.pack(">d", val)),
        )
        return parse_webm_metadata(hdr + _el(SEGMENT, info))

    for bad in (float("nan"), float("inf"), float("-inf"), -5.0, 1e300):
        assert probe(bad)["duration_ms"] is None
    assert probe(4000.0)["duration_ms"] == 4000


def test_video_metadata_dispatch_and_nulls():
    from parquet_extractor_spark.operators.multimodal import (
        video_metadata_for_bytes,
    )

    assert video_metadata_for_bytes(None)[0] is None
    assert video_metadata_for_bytes(b"\x89PNG\r\n\x1a\n")[0] is None
    assert video_metadata_for_bytes(b"\x00\x00")[0] is None


def test_video_frame_decode_declared_boundary():
    import pytest as _pytest

    from parquet_extractor_spark.functions.mp4 import (
        build_mp4,
        decode_video_frames,
    )

    with _pytest.raises(NotImplementedError):
        decode_video_frames(build_mp4())


def test_media_video_metadata_matches_pure_python(spark):
    """The mapInPandas plumbing must agree row-for-row with the pure
    parser the oracle generator uses."""
    from parquet_extractor_spark.operators.multimodal import (
        media_video_metadata,
        synthetic_video_rows,
        video_metadata_for_bytes,
    )

    got = {
        r.media_id: (
            r.container, r.brand, r.duration_ms, r.n_tracks,
            r.width, r.height, r.has_video, r.has_audio,
        )
        for r in media_video_metadata(spark, "unused").collect()
    }
    for media_id, data in synthetic_video_rows():
        assert got[media_id] == video_metadata_for_bytes(data)


# ── WebP header parsing + header-only image metadata pass ───────────


def test_webp_build_parse_roundtrip_all_variants():
    from parquet_extractor_spark.functions.webp import (
        build_webp,
        webp_metadata,
    )

    assert webp_metadata(build_webp(352, 240, "vp8")) == (
        "vp8", 352, 240, False, False,
    )
    assert webp_metadata(build_webp(64, 48, "vp8l")) == (
        "vp8l", 64, 48, False, False,
    )
    assert webp_metadata(build_webp(64, 48, "vp8l", alpha=True)) == (
        "vp8l", 64, 48, True, False,
    )
    assert webp_metadata(build_webp(1024, 768, "vp8x", alpha=True)) == (
        "vp8x", 1024, 768, True, False,
    )
    assert webp_metadata(build_webp(400, 300, "vp8x", animated=True)) == (
        "vp8x", 400, 300, False, True,
    )
    # 14-bit VP8/VP8L limits and the 24-bit VP8X canvas
    assert webp_metadata(build_webp(16383, 16383, "vp8l"))[1:3] == (
        16383, 16383,
    )
    assert webp_metadata(build_webp(65536, 4, "vp8x"))[1:3] == (65536, 4)


def test_webp_malformed_inputs_raise():
    import pytest as _pytest

    from parquet_extractor_spark.functions.webp import (
        build_webp,
        is_webp,
        webp_metadata,
    )

    good = build_webp(320, 240, "vp8")
    assert is_webp(good)
    start_code_clobbered = bytearray(good)
    start_code_clobbered[23] ^= 0xFF  # VP8 sync code byte
    for bad in (
        b"",
        b"RIFF\x10\x00\x00\x00WAVE" + good[12:],  # wrong form type
        good[:11],  # truncated header
        good[:20],  # truncated chunk payload
        bytes(start_code_clobbered),
    ):
        with _pytest.raises(ValueError):
            webp_metadata(bad)
    # fuzz: arbitrary bytes and random truncations/bit flips of a
    # valid file never crash with anything but ValueError
    import random

    rng = random.Random(3)
    for _ in range(300):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(40)))
        try:
            webp_metadata(data)
        except ValueError:
            pass
    for _ in range(300):
        b = bytearray(good)
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        try:
            webp_metadata(bytes(b[: rng.randrange(1, len(b) + 1)]))
        except ValueError:
            pass


def test_image_metadata_headers_only():
    """The pure dispatcher reads dimensions/flags for all five
    formats from headers and NULLs out corrupt/foreign bytes."""
    import numpy as np

    from parquet_extractor_spark.functions.bmp import encode_bmp
    from parquet_extractor_spark.functions.png import encode_png
    from parquet_extractor_spark.functions.webp import build_webp
    from parquet_extractor_spark.operators.multimodal import (
        image_metadata_for_bytes,
    )

    arr = np.zeros((24, 32, 3), dtype=np.uint8)
    assert image_metadata_for_bytes(encode_png(arr))[:6] == (
        "png", None, 32, 24, False, False,
    )
    assert image_metadata_for_bytes(encode_bmp(arr))[:6] == (
        "bmp", None, 32, 24, False, False,
    )
    assert image_metadata_for_bytes(build_webp(640, 480, "vp8"))[:6] == (
        "webp", "vp8", 640, 480, False, False,
    )
    for bad in (None, b"", b"\xff\xd8\xff", b"RIFF\x10\x00\x00\x00WEBP"):
        meta = image_metadata_for_bytes(bad)
        assert meta[0] is None and meta[2] is None


def test_image_metadata_jpeg_sof_walk():
    """SOF dims must be read through a real marker walk (past APP0/
    DQT/DHT), not a fixed offset — and GIF extensions must be
    scanned, not assumed."""
    import numpy as np

    from parquet_extractor_spark.functions.gif import encode_gif
    from parquet_extractor_spark.functions.jpeg import encode_jpeg
    from parquet_extractor_spark.operators.multimodal import (
        image_metadata_for_bytes,
    )

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    assert image_metadata_for_bytes(encode_jpeg(arr))[:4] == (
        "jpeg", None, 56, 40,
    )
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    gif = encode_gif(pal[rng.integers(0, 16, size=(20, 30))])
    assert image_metadata_for_bytes(gif)[:4] == ("gif", None, 30, 20)
    # animated GIF signal: NETSCAPE application extension
    loop_ext = b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    animated = gif[:13] + loop_ext + gif[13:]
    meta = image_metadata_for_bytes(animated)
    assert meta[0] == "gif" and meta[5] is True


def test_media_image_metadata_matches_pure_python(spark):
    """The mapInPandas plumbing must agree row-for-row with the pure
    parser the oracle generator uses — and the corrupt sub-variants
    must all be reachable (the i//10 index, not i%3)."""
    from parquet_extractor_spark.operators.multimodal import (
        image_metadata_for_bytes,
        media_image_metadata,
        synthetic_image_rows,
    )

    got = {
        r.media_id: (
            r.container, r.variant, r.width, r.height,
            r.has_alpha, r.is_animated, r.n_bytes,
        )
        for r in media_image_metadata(spark, "unused").collect()
    }
    rows = synthetic_image_rows()
    assert len(got) == len(rows)
    for media_id, data in rows:
        assert got[media_id] == image_metadata_for_bytes(data)
    corrupt_lens = {got[i][6] for i, _ in rows if i % 10 == 9}
    assert len(corrupt_lens) == 3, "a corrupt sub-variant is unreachable"
    # every container and all three webp variants appear
    assert {m[0] for m in got.values()} >= {
        "png", "jpeg", "gif", "bmp", "webp", "tiff", None,
    }
    assert {m[1] for m in got.values() if m[0] == "webp"} == {
        "vp8", "vp8l", "vp8x",
    }
    # TIFF sub-variants: both byte orders, multi-page, alpha
    tiffs = [m for m in got.values() if m[0] == "tiff"]
    assert {m[1] for m in tiffs} == {"le", "be"}
    assert any(m[5] for m in tiffs) and any(not m[5] for m in tiffs)
    assert any(m[4] for m in tiffs) and any(not m[4] for m in tiffs)


# ── animated GIF: real frame decode + sampling (r06) ────────────────

def _gif_header(sw, sh, colors, bg=0):
    import struct as _struct

    depth = max(1, (len(colors) - 1).bit_length())
    gct = np.zeros((1 << depth, 3), dtype=np.uint8)
    gct[: len(colors)] = colors
    return (
        b"GIF89a"
        + _struct.pack(
            "<HHBBB", sw, sh, 0x80 | ((depth - 1) << 4) | (depth - 1), bg, 0
        )
        + gct.tobytes()
    ), max(2, depth)


def _gif_gce(disposal, delay_cs, tidx=None):
    import struct as _struct

    packed = (disposal << 2) | (1 if tidx is not None else 0)
    return (
        b"\x21\xf9\x04"
        + _struct.pack("<BHB", packed, delay_cs, tidx or 0)
        + b"\x00"
    )


def _gif_img(x, y, w, h, indices, mcs):
    import struct as _struct

    from parquet_extractor_spark.functions.gif import _lzw_encode

    out = bytearray(b"\x2c" + _struct.pack("<HHHHB", x, y, w, h, 0))
    out.append(mcs)
    comp = _lzw_encode(
        np.asarray(indices, dtype=np.uint8).reshape(-1), mcs
    )
    for i in range(0, len(comp), 255):
        block = comp[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00"
    return bytes(out)


def test_gif_animation_roundtrip_and_compositing(spark):
    from parquet_extractor_spark.functions.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )

    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (9, 3), dtype=np.uint8)
    base = pal[rng.integers(0, 9, (11, 17))]
    frames = []
    for k in range(4):
        f = base.copy()
        f[2:6, 3 * k : 3 * k + 4] = pal[k]
        frames.append(f)
    frames[2] = frames[1].copy()  # identical consecutive frame
    data = encode_gif_animation(frames, delays_ms=[50, 0, 70, 110])
    dec = decode_gif_frames(data)
    assert [d for d, _ in dec] == [50, 0, 70, 110]
    for want, (_d, got) in zip(frames, dec):
        assert np.array_equal(got, want)


def test_gif_disposal_restore_background():
    from parquet_extractor_spark.functions.gif import decode_gif_frames

    colors = np.array(
        [[10, 10, 10], [200, 0, 0], [0, 200, 0]], dtype=np.uint8
    )
    head, mcs = _gif_header(4, 2, colors, bg=1)
    data = (
        head
        + _gif_gce(2, 3)  # disposal 2: restore background
        + _gif_img(0, 0, 4, 2, [2] * 8, mcs)
        + _gif_gce(0, 4)
        + _gif_img(0, 0, 1, 1, [0], mcs)
        + b"\x3b"
    )
    frames = decode_gif_frames(data)
    assert len(frames) == 2 and frames[0][0] == 30 and frames[1][0] == 40
    assert (frames[0][1] == colors[2]).all()
    # after restore-background, frame 2 shows bg (color 1) everywhere
    # except its own 1x1 rect
    want = np.tile(colors[1], (2, 4, 1)).astype(np.uint8)
    want[0, 0] = colors[0]
    assert np.array_equal(frames[1][1], want)


def test_gif_disposal_restore_previous():
    from parquet_extractor_spark.functions.gif import decode_gif_frames

    colors = np.array(
        [[5, 5, 5], [250, 250, 0], [0, 0, 250]], dtype=np.uint8
    )
    head, mcs = _gif_header(3, 2, colors)
    data = (
        head
        + _gif_gce(1, 2)
        + _gif_img(0, 0, 3, 2, [0] * 6, mcs)
        + _gif_gce(3, 2)  # disposal 3: restore previous
        + _gif_img(1, 0, 2, 1, [2, 2], mcs)
        + _gif_gce(0, 2)
        + _gif_img(0, 1, 1, 1, [1], mcs)
        + b"\x3b"
    )
    frames = decode_gif_frames(data)
    assert len(frames) == 3
    a = np.tile(colors[0], (2, 3, 1)).astype(np.uint8)
    b = a.copy()
    b[0, 1:3] = colors[2]
    c = a.copy()  # frame 2's rect was rolled back before frame 3
    c[1, 0] = colors[1]
    assert np.array_equal(frames[0][1], a)
    assert np.array_equal(frames[1][1], b)
    assert np.array_equal(frames[2][1], c)


def test_gif_frame_sampling_timeline():
    from parquet_extractor_spark.functions.png import decode_png
    from parquet_extractor_spark.functions.gif import encode_gif_animation
    from parquet_extractor_spark.operators.multimodal import (
        gif_frame_samples,
    )

    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    frames = [np.tile(pal[k], (4, 5, 1)).astype(np.uint8) for k in range(3)]
    data = encode_gif_animation(frames, delays_ms=[50, 0, 70])
    # timeline: f0 [0,50), f1 [50,150) (0 -> default 100), f2 [150,220)
    samples = gif_frame_samples(data, every_ms=60)
    assert [t for t, _ in samples] == [0, 60, 120, 180]
    got = [decode_png(png)[0, 0].tolist() for _, png in samples]
    assert got == [
        pal[0].tolist(), pal[1].tolist(), pal[1].tolist(), pal[2].tolist()
    ]


def test_sample_gif_frames_spark_matches_pure(spark):
    from parquet_extractor_spark.operators.multimodal import (
        gif_frame_samples,
        sample_gif_frames,
        synthetic_animated_gif_rows,
        synthetic_animated_gifs,
    )

    got = {
        (r.media_id, r.frame_ts_ms): (r.width, r.height, bytes(r.frame))
        for r in sample_gif_frames(
            synthetic_animated_gifs(spark), every_ms=60
        ).collect()
    }
    want = {}
    for media_id, data in synthetic_animated_gif_rows():
        for ts, png in gif_frame_samples(data, every_ms=60):
            import struct as _struct

            w, h = _struct.unpack(">II", png[16:24])
            want[(media_id, ts)] = (w, h, png)
    assert got == want
    assert len(want) >= 40  # the fixture is a real animation corpus


def test_fuzz_gif_animation_and_webp_decode_robustness():
    """Arbitrary bytes and truncations/bit flips of valid streams
    never escape the GIF animation decoder or the WebP container
    decoder with anything but ValueError/NotImplementedError — and
    the decode-bomb guards reject huge claimed canvases instead of
    allocating them."""
    import random
    import struct as _struct

    from parquet_extractor_spark.functions.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )
    from parquet_extractor_spark.functions.webp import (
        build_webp_lossless,
        decode_webp,
    )

    rng = random.Random(9)
    npr = np.random.default_rng(9)
    pal = npr.integers(0, 256, (6, 3), dtype=np.uint8)
    frames = [
        pal[npr.integers(0, 6, (9, 13))] for _ in range(3)
    ]
    gif = encode_gif_animation(frames, delays_ms=40)
    webp = build_webp_lossless(frames[0])
    for _ in range(300):
        junk = bytes(rng.randrange(256) for _ in range(rng.randrange(60)))
        for fn in (decode_gif_frames, decode_webp):
            try:
                fn(b"GIF89a" + junk if fn is decode_gif_frames else junk)
            except (ValueError, NotImplementedError):
                pass
    for good, fn in ((gif, decode_gif_frames), (webp, decode_webp)):
        for _ in range(300):
            b = bytearray(good)
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            try:
                fn(bytes(b[: rng.randrange(1, len(b) + 1)]))
            except (ValueError, NotImplementedError):
                pass
    # decode-bomb guards: a 16k x 16k claim is rejected, not allocated
    with pytest.raises(ValueError, match="too large"):
        huge = bytearray(gif)
        huge[6:10] = _struct.pack("<HH", 60000, 60000)
        decode_gif_frames(bytes(huge))
    from parquet_extractor_spark.functions.vp8l import decode_vp8l

    packed = (16383 & 0x3FFF) | ((16383 & 0x3FFF) << 14)
    with pytest.raises(ValueError, match="too large"):
        decode_vp8l(b"\x2f" + _struct.pack("<I", packed) + b"\x00" * 8)


def test_fuzz_no_exception_escapes_any_dispatch_path():
    """The per-row robustness contract at 100 TB: one corrupt media
    row must NEVER kill a mapInPandas task. Bit-flipped/truncated
    variants of every codec's valid output go through all five
    dispatch paths (features, resize, audio/video/image metadata) and
    nothing but the declared fallbacks may happen — codecs wrap
    zlib/struct/Index/Key/Attribute/Overflow errors as ValueError,
    and every dispatcher catches it."""
    import random

    from parquet_extractor_spark.functions.bmp import encode_bmp
    from parquet_extractor_spark.functions.gif import (
        encode_gif,
        encode_gif_animation,
    )
    from parquet_extractor_spark.functions.jpeg import encode_jpeg
    from parquet_extractor_spark.functions.wav import encode_wav
    from parquet_extractor_spark.functions.webp import build_webp_lossless
    from parquet_extractor_spark.operators.multimodal import (
        audio_metadata_for_bytes,
        image_metadata_for_bytes,
        resize_bytes,
        video_metadata_for_bytes,
    )

    rng = random.Random(20260814)
    npr = np.random.default_rng(20260814)
    arr = npr.integers(0, 256, (12, 16, 3), dtype=np.uint8)
    pal = npr.integers(0, 256, (8, 3), dtype=np.uint8)[
        npr.integers(0, 8, (12, 16))
    ]
    goods = [
        encode_png(arr),
        encode_jpeg(arr, quality=85),
        encode_jpeg(arr, quality=85, progressive=True),
        encode_gif(pal),
        encode_gif_animation([pal, pal[::-1]], 50),
        encode_bmp(arr),
        build_webp_lossless(arr),
        encode_wav(npr.normal(0, 3000, 300).astype(np.int16), 8000),
    ]
    from parquet_extractor_spark.operators.multimodal import (
        feature_for_bytes,
    )

    for good in goods:
        for _ in range(120):
            b = bytearray(good)
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            data = bytes(b[: rng.randrange(8, len(b) + 1)])
            feature_for_bytes(data)
            resize_bytes(data, 8, 6)
            audio_metadata_for_bytes(data)
            video_metadata_for_bytes(data)
            image_metadata_for_bytes(data)


def test_ima_adpcm_roundtrip_and_header():
    """IMA ADPCM (format tag 0x11): multi-block mono and stereo
    round-trips reconstruct within the codec's known ~25 dB SNR, the
    fmt-chunk extension carries wSamplesPerBlock, and the fact chunk
    pins the exact frame count across padded final blocks."""
    from parquet_extractor_spark.functions.wav import (
        decode_wav,
        encode_wav,
        parse_wav_header,
    )

    rng = np.random.default_rng(12)
    t = np.arange(2000) / 8000.0
    sig = (
        8000 * np.sin(2 * np.pi * 300 * t) + rng.normal(0, 400, 2000)
    ).astype(np.int16)
    data = encode_wav(sig, 8000, fmt="ima_adpcm")
    h = parse_wav_header(data)
    assert h["format"] == 0x11 and h["bits_per_sample"] == 4
    assert h["block_align"] == 256 and h["samples_per_block"] == 505
    assert h["n_frames"] == 2000  # fact chunk, not block-padded count
    out, sr = decode_wav(data)
    assert sr == 8000 and out.shape == (2000,)
    err = out.astype(np.float64) - sig
    snr = 10 * np.log10(
        (sig.astype(np.float64) ** 2).mean() / (err**2).mean()
    )
    assert snr > 20, snr
    # first sample is stored verbatim in the block header
    assert out[0] == sig[0]

    stereo = np.stack([sig, (-sig) // 2], axis=1)
    out2, _ = decode_wav(encode_wav(stereo, 16000, fmt="ima_adpcm"))
    assert out2.shape == (2000, 2)
    err2 = out2.astype(np.float64) - stereo
    snr2 = 10 * np.log10(
        (stereo.astype(np.float64) ** 2).mean() / (err2**2).mean()
    )
    assert snr2 > 20, snr2


def test_ima_adpcm_known_vector():
    """Pin the nibble expansion against hand-computed IMA steps:
    from (predictor=0, index=0, step=7), nibble 0x4 adds
    7 + 7>>3 = 7 (diff = step>>3 + step) ... computed per the spec
    arithmetic below, and the index walks the public delta table."""
    from parquet_extractor_spark.functions.wav import (
        _ima_decode_nibbles,
    )

    # nibble 4: diff = (step>>3) + step = 0 + 7 = 7; index += 2
    dec, pred, idx = _ima_decode_nibbles([4], 0, 0)
    assert dec == [7] and pred == 7 and idx == 2
    # next step = steps[2] = 9; nibble 0xF: diff = 9>>3 + 9 +
    # 9>>1 + 9>>2 = 1+9+4+2 = 16, sign bit -> -16; index += 8
    dec2, pred2, idx2 = _ima_decode_nibbles([0xF], pred, idx)
    assert dec2 == [7 - 16] and idx2 == 10
    # nibble 0: diff = step>>3 only; index floors at 0
    dec3, _, idx3 = _ima_decode_nibbles([0, 0, 0, 0], 100, 1)
    assert idx3 == 0 and dec3[0] == 100 + (int(8) >> 3)


# ── APNG: real animated-PNG decode + sampling (r06) ─────────────────

def test_apng_roundtrip_rgb_and_rgba():
    from parquet_extractor_spark.functions.apng import (
        decode_apng_frames,
        encode_apng,
        is_apng,
    )
    from parquet_extractor_spark.functions.png import decode_png

    rng = np.random.default_rng(13)
    for channels in (3, 4):
        base = rng.integers(0, 256, (11, 15, channels), dtype=np.uint8)
        frames = []
        for k in range(4):
            f = base.copy()
            f[2:6, 3 * k : 3 * k + 4, :3] = 255 - f[2:6, 3 * k : 3 * k + 4, :3]
            frames.append(f)
        frames[2] = frames[1].copy()  # identical-frame sub-rect path
        data = encode_apng(frames, delays_ms=[40, 0, 90, 130])
        assert is_apng(data)
        dec = decode_apng_frames(data)
        assert [d for d, _ in dec] == [40, 0, 90, 130]
        for want, (_d, canvas) in zip(frames, dec):
            assert canvas.shape == (11, 15, 4)
            assert np.array_equal(canvas[:, :, :3], want[:, :, :3])
            if channels == 4:
                assert np.array_equal(canvas[:, :, 3], want[:, :, 3])
            else:
                assert (canvas[:, :, 3] == 255).all()
        # a plain PNG decoder sees the default image (frame 0)
        first = decode_png(data)
        assert np.array_equal(first, frames[0])


def _apng_handbuilt(frames_spec, w, h):
    """Build an APNG from (region, x, y, delay, dispose, blend)
    tuples using the codec's own chunk helpers."""
    import struct as _struct

    from parquet_extractor_spark.functions.apng import _idat_payload
    from parquet_extractor_spark.functions.png import (
        PNG_MAGIC,
        _chunk,
        encode_png,
    )

    out = bytearray()
    out += PNG_MAGIC
    out += _chunk(b"IHDR", _struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
    out += _chunk(b"acTL", _struct.pack(">II", len(frames_spec), 0))
    seq = 0
    for k, (region, x, y, delay, dispose, blend) in enumerate(frames_spec):
        fh, fw = region.shape[:2]
        out += _chunk(
            b"fcTL",
            _struct.pack(
                ">IIIIIHHBB", seq, fw, fh, x, y, delay, 1000, dispose, blend
            ),
        )
        seq += 1
        body = _idat_payload(encode_png(np.ascontiguousarray(region)))
        if k == 0:
            out += _chunk(b"IDAT", body)
        else:
            out += _chunk(b"fdAT", _struct.pack(">I", seq) + body)
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


def test_apng_blend_over_and_dispose_ops():
    """Handcrafted streams for the paths the encoder never emits:
    OVER compositing of a semi-transparent region, and the BACKGROUND
    / PREVIOUS dispose operations."""
    from parquet_extractor_spark.functions.apng import decode_apng_frames

    w, h = 4, 3
    red = np.zeros((h, w, 4), dtype=np.uint8)
    red[:] = [200, 0, 0, 255]
    half_blue = np.zeros((1, 2, 4), dtype=np.uint8)
    half_blue[:] = [0, 0, 200, 128]
    # frame 2 blends 50%-alpha blue OVER red at (1,1)
    frames = decode_apng_frames(
        _apng_handbuilt(
            [
                (red, 0, 0, 50, 0, 0),
                (half_blue, 1, 1, 60, 0, 1),
            ],
            w, h,
        )
    )
    assert len(frames) == 2
    # over math: out = src*a + dst*(1-a), a = 128/255
    a = 128 / 255
    want_r = int(np.floor(0 * a + 200 * 1 * (1 - a) / (a + (1 - a)) + 0.5))
    px = frames[1][1][1, 1]
    assert px[3] == 255  # opaque dst stays opaque
    assert abs(int(px[0]) - want_r) <= 1 and px[2] > 90

    # BACKGROUND dispose clears the frame's rect to transparent black
    frames2 = decode_apng_frames(
        _apng_handbuilt(
            [
                (red, 0, 0, 50, 1, 0),          # full, dispose bg
                (half_blue, 0, 0, 60, 0, 0),    # small source rect
            ],
            w, h,
        )
    )
    f2 = frames2[1][1]
    assert (f2[2, :, 3] == 0).all()  # outside rect: cleared
    assert (f2[0, :2, 3] == 128).all()  # the new rect's own alpha

    # PREVIOUS dispose rolls the canvas back
    green = np.zeros((1, 1, 4), dtype=np.uint8)
    green[:] = [0, 255, 0, 255]
    frames3 = decode_apng_frames(
        _apng_handbuilt(
            [
                (red, 0, 0, 50, 0, 0),
                (green, 2, 1, 60, 2, 0),  # dispose previous
                (green, 0, 0, 70, 0, 0),
            ],
            w, h,
        )
    )
    assert np.array_equal(frames3[1][1][1, 2], [0, 255, 0, 255])
    # frame 3: the green at (2,1) was rolled back, only (0,0) changed
    assert np.array_equal(frames3[2][1][1, 2], [200, 0, 0, 255])
    assert np.array_equal(frames3[2][1][0, 0], [0, 255, 0, 255])


def test_sample_animation_frames_handles_gif_and_apng(spark):
    from parquet_extractor_spark.operators.multimodal import (
        animation_frame_samples,
        sample_animation_frames,
        synthetic_apng_rows,
        synthetic_apngs,
    )

    got = {
        (r.media_id, r.frame_ts_ms): (r.width, r.height, bytes(r.frame))
        for r in sample_animation_frames(
            synthetic_apngs(spark), every_ms=50
        ).collect()
    }
    want = {}
    for media_id, data in synthetic_apng_rows():
        for ts, png in animation_frame_samples(data, every_ms=50):
            import struct as _struct

            wpx, hpx = _struct.unpack(">II", png[16:24])
            want[(media_id, ts)] = (wpx, hpx, png)
    assert got == want and len(want) >= 20


def test_tiff_header_parsing_and_fuzz():
    """TIFF IFD walk (r06): both byte orders, chained multi-page
    IFDs, ExtraSamples/4-sample alpha; fuzz never escapes with
    anything but ValueError, and IFD chain cycles are rejected."""
    import random
    import struct as _struct

    from parquet_extractor_spark.functions.tiff import (
        build_tiff,
        is_tiff,
        tiff_metadata,
    )

    for endian in ("le", "be"):
        for pages in (1, 3):
            d = build_tiff(640, 480, endian, pages, samples=3)
            assert is_tiff(d)
            assert tiff_metadata(d) == (endian, 640, 480, False, pages)
    assert tiff_metadata(build_tiff(10, 9, samples=4))[3] is True
    assert tiff_metadata(build_tiff(10, 9, extra_alpha=True))[3] is True
    # a self-pointing IFD chain must raise, not loop forever
    cyc = bytearray(build_tiff(5, 5))
    n_entries = _struct.unpack_from("<H", cyc, 8)[0]
    _struct.pack_into("<I", cyc, 10 + 12 * n_entries, 8)
    with pytest.raises(ValueError, match="cycles"):
        tiff_metadata(bytes(cyc))
    rng = random.Random(6)
    good = build_tiff(100, 80, "be", 2)
    for _ in range(300):
        b = bytearray(good)
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        try:
            tiff_metadata(bytes(b[: rng.randrange(8, len(b) + 1)]))
        except ValueError:
            pass


def test_ms_adpcm_roundtrip_and_header():
    """MS-ADPCM (format tag 0x02): multi-block mono and stereo
    round-trips reconstruct within the codec's ~25 dB SNR, the fmt
    extension carries wSamplesPerBlock + the 7 standard coefficient
    pairs, and the fact chunk pins the exact frame count."""
    from parquet_extractor_spark.functions.wav import (
        decode_wav,
        encode_wav,
        parse_wav_header,
    )

    rng = np.random.default_rng(15)
    t = np.arange(2000) / 8000.0
    sig = (
        8000 * np.sin(2 * np.pi * 250 * t) + rng.normal(0, 400, 2000)
    ).astype(np.int16)
    data = encode_wav(sig, 8000, fmt="ms_adpcm")
    h = parse_wav_header(data)
    assert h["format"] == 0x02 and h["bits_per_sample"] == 4
    assert h["block_align"] == 256 and h["samples_per_block"] == 500
    assert h["n_frames"] == 2000
    out, sr = decode_wav(data)
    assert sr == 8000 and out.shape == (2000,)
    # the two header samples are stored verbatim per block
    assert out[0] == sig[0] and out[1] == sig[1]
    err = out.astype(np.float64) - sig
    snr = 10 * np.log10(
        (sig.astype(np.float64) ** 2).mean() / (err**2).mean()
    )
    assert snr > 20, snr
    stereo = np.stack([sig, (-sig) // 3], axis=1)
    out2, _ = decode_wav(encode_wav(stereo, 16000, fmt="ms_adpcm"))
    assert out2.shape == (2000, 2)
    err2 = out2.astype(np.float64) - stereo
    snr2 = 10 * np.log10(
        (stereo.astype(np.float64) ** 2).mean() / (err2**2).mean()
    )
    assert snr2 > 20, snr2


def test_tiff_pixel_decode_roundtrip_and_boundaries():
    """TIFF strips decode for real: uncompressed, PackBits, LZW
    (early-change flavor, since later in r06) and Deflate (both
    tags), with and without Predictor 2, both byte orders,
    gray/RGB/RGBA, multi-strip layouts; the PackBits/LZW codecs
    satisfy their round-trip contracts. New-style JPEG-in-TIFF is
    covered by test_tiff_jpeg_in_tiff below (late-r06 closure)."""
    import random

    from parquet_extractor_spark.functions.tiff import (
        TIFF_COMPRESSION_DEFLATE,
        TIFF_COMPRESSION_DEFLATE_OLD,
        TIFF_COMPRESSION_LZW,
        TIFF_COMPRESSION_PACKBITS,
        _lzw_decode,
        _lzw_encode,
        _packbits_decode,
        _packbits_encode,
        build_tiff_image,
        decode_tiff,
    )

    comps = (
        1,
        TIFF_COMPRESSION_PACKBITS,
        TIFF_COMPRESSION_LZW,
        TIFF_COMPRESSION_DEFLATE,
        TIFF_COMPRESSION_DEFLATE_OLD,
    )
    rng = np.random.default_rng(22)
    for c in (1, 3, 4):
        for endian in ("le", "be"):
            for comp in comps:
                for pred in (1, 2):
                    arr = rng.integers(0, 256, (13, 17, c), dtype=np.uint8)
                    arr[4:9] = 7  # flat region exercises RLE/LZW runs
                    out = decode_tiff(
                        build_tiff_image(
                            arr, endian, comp, rows_per_strip=5,
                            predictor=pred,
                        )
                    )
                    want = arr.repeat(3, axis=2) if c == 1 else arr
                    assert np.array_equal(out, want), (c, endian, comp, pred)
    # decode_image dispatch + the remaining old-style-JPEG boundary
    # (compression 6; NEW-style 7 decodes for real since late r06 —
    # see test_tiff_jpeg_in_tiff)
    arr = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(build_tiff_image(arr)), arr)
    jpg = bytearray(build_tiff_image(arr))
    import struct as _struct

    n_entries = _struct.unpack_from("<H", jpg, 8)[0]
    for i in range(n_entries):
        off = 10 + 12 * i
        if _struct.unpack_from("<H", jpg, off)[0] == 259:
            _struct.pack_into("<H", jpg, off + 8, 6)
    with pytest.raises(NotImplementedError):
        decode_tiff(bytes(jpg))
    # corrupt LZW stream must be ValueError, never a crash
    with pytest.raises(ValueError):
        _lzw_decode(b"\xff\xff\xff\xff", 64)
    # LZW round-trip past the 9->10 bit early-change point and the
    # 4094-code table reset (mid-stream Clear)
    r = random.Random(4)
    long_mix = bytes(r.randrange(256) for _ in range(70000))
    assert _lzw_decode(_lzw_encode(long_mix), len(long_mix)) == long_mix
    runs = bytes(range(256)) * 300
    assert _lzw_decode(_lzw_encode(runs), len(runs)) == runs
    # PackBits round-trip property on runs/noise mixtures
    for _ in range(200):
        raw = bytes(
            r.choice([0, 1, 2, r.randrange(256)])
            for _ in range(r.randrange(0, 300))
        )
        assert _packbits_decode(_packbits_encode(raw), len(raw)) == raw


def test_phash_near_dups_planted_ground_truth(spark):
    from parquet_extractor_spark.operators.multimodal import (
        PHASH_HAMMING_MAX,
        media_phash,
        media_phash_near_dups,
        phash64,
        synthetic_neardup_rows,
        decode_image,
    )

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in media_phash_near_dups(spark, "unused").collect()
    }
    # every planted triple (png, bmp, jpeg re-encode) is found...
    for i in range(8):
        png, bmp, jpg = 4 * i, 4 * i + 1, 4 * i + 2
        assert pairs[(png, bmp)] == 0  # pixel-identical re-container
        assert 0 < pairs[(png, jpg)] <= PHASH_HAMMING_MAX
        assert pairs[(bmp, jpg)] == pairs[(png, jpg)]
        # ...and the unrelated control image pairs with nothing
        assert not any(4 * i + 3 in p for p in pairs)
    assert len(pairs) == 24
    # Spark-side hashes equal the pure-Python reference exactly
    got = {r.media_id: r.phash for r in media_phash(spark, "unused").collect()}
    for mid, _variant, data in synthetic_neardup_rows():
        assert got[mid] == phash64(decode_image(data))


def test_image_phashes_skips_corrupt_rows(spark):
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from parquet_extractor_spark.operators.multimodal import (
        image_phashes,
        synthetic_neardup_rows,
    )

    rows = synthetic_neardup_rows()[:4]
    # corrupt: truncated PNG, bit-flipped JPEG, garbage, empty magic
    rows += [
        (100, "corrupt", rows[0][2][:20]),
        (101, "corrupt", b"\xff\xd8\xff" + b"\x00" * 40),
        (102, "corrupt", b"not an image at all"),
    ]
    df = spark.createDataFrame(
        rows,
        StructType(
            [
                StructField("media_id", LongType(), False),
                StructField("variant", StringType(), False),
                StructField("data", BinaryType(), False),
            ]
        ),
    )
    got = {r.media_id for r in image_phashes(df).collect()}
    assert got == {0, 1, 2, 3}  # clean rows hashed, corrupt dropped


def test_audio_near_dups_planted_ground_truth(spark):
    from parquet_extractor_spark.operators.multimodal import (
        AFP_HAMMING_MAX,
        audio_fingerprint64,
        media_audio_fingerprint,
        media_audio_near_dups,
        synthetic_audio_neardup_rows,
    )

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in media_audio_near_dups(spark, "unused").collect()
    }
    for i in range(8):
        grp = [5 * i, 5 * i + 1, 5 * i + 2, 5 * i + 3]
        # pcm16 and float32 carry the same samples → same contour
        assert pairs[(grp[0], grp[1])] == 0
        # lossy companding/ADPCM stays within the verify threshold
        for a_idx in range(4):
            for b_idx in range(a_idx + 1, 4):
                assert pairs[(grp[a_idx], grp[b_idx])] <= AFP_HAMMING_MAX
        # the unrelated control never pairs with anything
        assert not any(5 * i + 4 in p for p in pairs)
    assert len(pairs) == 48
    # Spark-side fingerprints equal the pure-Python reference
    got = {
        r.media_id: r.phash
        for r in media_audio_fingerprint(spark, "unused").collect()
    }
    for mid, _variant, data in synthetic_audio_neardup_rows():
        assert got[mid] == audio_fingerprint64(data)


def test_animation_near_dups_cross_format_ground_truth(spark):
    from parquet_extractor_spark.operators.multimodal import (
        media_animation_near_dups,
    )

    pairs = {
        (r.id_a, r.id_b): r.n_frames_matched
        for r in media_animation_near_dups(spark, "unused").collect()
    }
    for i in range(4):
        gif, apng, off, unrel = 4 * i, 4 * i + 1, 4 * i + 2, 4 * i + 3
        # GIF and APNG of the same frames: every sampled tick matches
        assert pairs[(gif, apng)] == 4
        # one swapped frame costs exactly one tick
        assert pairs[(gif, off)] == 3
        assert pairs[(apng, off)] == 3
        assert not any(unrel in p for p in pairs)
    assert len(pairs) == 12


def test_tiff_jpeg_in_tiff():
    """New-style JPEG-in-TIFF (compression 7, TTN2) decodes for real
    through the in-repo JPEG codec: inline-tables strips, shared
    JPEGTables (tag 347) spliced after each strip's SOI, both byte
    orders, short last strips; lossy round-trip stays within the
    JPEG error band and corrupt streams raise ValueError."""
    import pytest as _pytest

    from parquet_extractor_spark.functions.tiff import (
        TIFF_COMPRESSION_JPEG,
        build_tiff_image,
        decode_tiff,
    )

    y, x = np.mgrid[0:45, 0:64]
    px = np.clip(
        np.stack(
            [
                128 + 90 * np.sin(x / 9.0) * np.cos(y / 7.0),
                128 + 70 * np.cos(x / 11.0),
                128 + 80 * np.sin((x + y) / 13.0),
            ],
            axis=2,
        ),
        0,
        255,
    ).astype(np.uint8)
    for endian in ("le", "be"):
        for shared in (False, True):
            t = build_tiff_image(
                px,
                endian=endian,
                compression=TIFF_COMPRESSION_JPEG,
                rows_per_strip=16,  # 45 rows → short last strip
                jpeg_shared_tables=shared,
            )
            out = decode_tiff(t)
            assert out.shape == px.shape
            err = np.abs(out.astype(int) - px.astype(int))
            assert err.max() <= 8 and err.mean() < 2.0
    # shared tables genuinely shrink the file (the point of tag 347)
    inline = build_tiff_image(
        px, compression=TIFF_COMPRESSION_JPEG, rows_per_strip=16
    )
    shared = build_tiff_image(
        px,
        compression=TIFF_COMPRESSION_JPEG,
        rows_per_strip=16,
        jpeg_shared_tables=True,
    )
    assert len(shared) < len(inline)
    # corrupt strip: flip a byte inside the first strip's entropy data
    bad = bytearray(shared)
    bad[-20] ^= 0xFF
    try:
        decode_tiff(bytes(bad))  # may survive (entropy noise) ...
    except ValueError:
        pass  # ... or raise ValueError — never anything else
    # truncated JPEGTables must raise cleanly
    with _pytest.raises(ValueError):
        from parquet_extractor_spark.functions.tiff import (
            _jpeg_strip_tables,
        )

        _jpeg_strip_tables(b"\xff\xd8\xff\xdb\x00\x04\x00\x00")
    # predictor 2 + JPEG is rejected at build time
    with _pytest.raises(ValueError):
        build_tiff_image(
            px, compression=TIFF_COMPRESSION_JPEG, predictor=2
        )


def test_tiff_planar_configuration():
    """PlanarConfiguration-2 TIFFs decode for real: per-plane strip
    groups across every lossless compression, both byte orders,
    predictor 2 applied per plane; planar strip-count mismatches
    raise ValueError."""
    import pytest as _pytest

    from parquet_extractor_spark.functions.tiff import (
        TIFF_COMPRESSION_DEFLATE,
        TIFF_COMPRESSION_JPEG,
        TIFF_COMPRESSION_LZW,
        TIFF_COMPRESSION_PACKBITS,
        build_tiff_image,
        decode_tiff,
    )

    rng = np.random.default_rng(5)
    for c in (1, 3, 4):
        for comp in (
            1,
            TIFF_COMPRESSION_PACKBITS,
            TIFF_COMPRESSION_LZW,
            TIFF_COMPRESSION_DEFLATE,
        ):
            for pred in (1, 2):
                for endian in ("le", "be"):
                    arr = rng.integers(0, 256, (13, 17, c), dtype=np.uint8)
                    t = build_tiff_image(
                        arr,
                        endian=endian,
                        compression=comp,
                        predictor=pred,
                        rows_per_strip=5,
                        planar=2,
                    )
                    out = decode_tiff(t)
                    want = arr.repeat(3, axis=2) if c == 1 else arr
                    assert np.array_equal(out, want), (c, comp, pred, endian)
    # JPEG strips stay chunky-only (TTN2 defines no planar layout here)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    with _pytest.raises(ValueError):
        build_tiff_image(px, compression=TIFF_COMPRESSION_JPEG, planar=2)


def test_tiff_old_style_jpeg_interchange():
    """Old-style JPEG-in-TIFF (compression 6) in its common
    interchange layout — JPEGInterchangeFormat/-Length point at one
    complete JFIF stream — decodes through the in-repo JPEG codec;
    the deprecated strip-based old-style variants still raise
    NotImplementedError."""
    import struct as _struct

    import pytest as _pytest

    from parquet_extractor_spark.functions.jpeg import encode_jpeg
    from parquet_extractor_spark.functions.tiff import decode_tiff

    y, x = np.mgrid[0:24, 0:32]
    px = np.clip(
        np.stack(
            [
                128 + 80 * np.sin(x / 5.0),
                128 + 60 * np.cos(y / 4.0),
                128 + 70 * np.sin((x + y) / 7.0),
            ],
            axis=2,
        ),
        0,
        255,
    ).astype(np.uint8)
    jfif = encode_jpeg(px, quality=95)

    def old_style(with_interchange: bool) -> bytes:
        tags = [(256, 4, 1, 32), (257, 4, 1, 24), (259, 3, 1, 6)]
        if with_interchange:
            # header(8) + count(2) + 5*12 + next(4) = 74 = stream base
            tags += [(513, 4, 1, 74), (514, 4, 1, len(jfif))]
        out = bytearray(b"II\x2a\x00" + _struct.pack("<I", 8))
        out += _struct.pack("<H", len(tags))
        for tag, typ, count, val in tags:
            out += _struct.pack("<HHII", tag, typ, count, val)
        out += _struct.pack("<I", 0)
        out += jfif
        return bytes(out)

    got = decode_tiff(old_style(True))
    err = np.abs(got.astype(int) - px.astype(int))
    assert got.shape == px.shape and err.max() <= 8
    # without the interchange pointer (or the §22 strip/table tags)
    # the old-style file is malformed and must raise cleanly
    with _pytest.raises((NotImplementedError, ValueError)):
        decode_tiff(old_style(False))
    # a length running past the file must raise cleanly
    bad = bytearray(old_style(True))
    # patch 514's value to something absurd
    n = _struct.unpack_from("<H", bad, 8)[0]
    for i in range(n):
        off = 10 + 12 * i
        if _struct.unpack_from("<H", bad, off)[0] == 514:
            _struct.pack_into("<I", bad, off + 8, 1 << 30)
    with _pytest.raises(ValueError):
        decode_tiff(bytes(bad))


def test_tiff_old_style_jpeg_strips():
    """Old-style JPEG-in-TIFF (compression 6) in the deprecated
    TIFF 6.0 §22 STRIP layout — raw zigzag quant tables behind
    JPEGQTables (519), raw BITS+values Huffman tables behind
    JPEGDC/ACTables (520/521), bare entropy data in the strips —
    decodes to pixels byte-identical to the new-style (TTN2) file of
    the same array: both store the same per-strip entropy data, only
    the container layout differs."""
    import struct as _struct

    import pytest as _pytest

    from parquet_extractor_spark.functions.tiff import (
        TIFF_COMPRESSION_JPEG,
        build_tiff_image,
        build_tiff_oldstyle_jpeg,
        decode_tiff,
    )

    rng = np.random.default_rng(17)
    for h, w, rps, endian in [(24, 16, 8, "le"), (21, 10, 8, "be")]:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        old = build_tiff_oldstyle_jpeg(
            arr, endian=endian, rows_per_strip=rps, jpeg_quality=95
        )
        new = build_tiff_image(
            arr,
            endian=endian,
            compression=TIFF_COMPRESSION_JPEG,
            rows_per_strip=rps,
            jpeg_quality=95,
        )
        assert np.array_equal(decode_tiff(old), decode_tiff(new))
    # a table pointer running past the file must raise cleanly
    old = bytearray(
        build_tiff_oldstyle_jpeg(
            rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        )
    )
    n = _struct.unpack_from("<H", old, 8)[0]
    for i in range(n):
        off = 10 + 12 * i
        if _struct.unpack_from("<H", old, off)[0] == 520:
            # 3 LONG offsets live in the overflow area; clobber the
            # first to point past EOF
            (ptr,) = _struct.unpack_from("<I", old, off + 8)
            _struct.pack_into("<I", old, ptr, 1 << 30)
    with _pytest.raises(ValueError):
        decode_tiff(bytes(old))
    # lossless JPEGProc is a declared boundary
    good = bytearray(
        build_tiff_oldstyle_jpeg(
            rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        )
    )
    for i in range(n):
        off = 10 + 12 * i
        if _struct.unpack_from("<H", good, off)[0] == 512:
            _struct.pack_into("<H", good, off + 8, 14)  # lossless proc
    with _pytest.raises(NotImplementedError):
        decode_tiff(bytes(good))


def test_tiff_orientation_applied_on_decode():
    """TIFF/EXIF Orientation (tag 274) is undone on decode: the
    stored pixels come back as they should be VIEWED, including the
    width/height-swapping cases 5-8."""
    import pytest as _pytest

    from parquet_extractor_spark.functions.tiff import (
        build_tiff_image,
        decode_tiff,
    )

    rng = np.random.default_rng(9)
    stored = rng.integers(0, 256, (10, 14, 3), dtype=np.uint8)
    expect = {
        1: stored,
        2: stored[:, ::-1],
        3: stored[::-1, ::-1],
        4: stored[::-1],
        5: stored.transpose(1, 0, 2),
        6: np.rot90(stored, k=-1),
        7: stored.transpose(1, 0, 2)[::-1, ::-1],
        8: np.rot90(stored, k=1),
    }
    for o, want in expect.items():
        got = decode_tiff(build_tiff_image(stored, orientation=o))
        assert np.array_equal(got, want), o
        if o >= 5:
            assert got.shape[:2] == (14, 10)
    bad = build_tiff_image(stored, orientation=9)
    with _pytest.raises(ValueError):
        decode_tiff(bad)


def test_exif_gps_audit_ground_truth(spark):
    from parquet_extractor_spark.operators.multimodal import (
        media_exif_gps_audit,
    )

    rows = {
        r.media_id: r for r in media_exif_gps_audit(spark, "unused").collect()
    }
    assert not rows[0].has_gps and rows[0].orientation == 1
    assert not rows[1].has_gps and rows[1].orientation == 6
    # all four hemisphere combinations parse with micro-degree signs
    assert rows[2].lat_micro == 48858400 and rows[2].lon_micro == 2294500
    assert rows[3].lat_micro < 0 < rows[3].lon_micro
    assert rows[4].lat_micro > 0 > rows[4].lon_micro
    assert rows[5].lat_micro < 0 and rows[5].lon_micro < 0
    assert rows[5].orientation == 3
    # every real JPEG scrubs verifiably clean; PNG + corrupt do not
    for mid in range(6):
        assert rows[mid].scrub_clean, mid
    assert not rows[6].scrub_clean and not rows[7].scrub_clean


def test_media_neardup_eval_perfect_on_fixture(spark):
    from parquet_extractor_spark.operators.multimodal import (
        media_neardup_eval,
    )

    rows = {r.family: r for r in media_neardup_eval(spark, "unused").collect()}
    assert set(rows) == {"image", "audio", "animation"}
    for fam, r in rows.items():
        # thresholds were tuned for clean margins; any drift in the
        # hashes, banding, or fixtures shows up here first
        assert r.precision == 1.0 and r.recall == 1.0, fam
        assert r.n_pairs == r.n_planted == r.true_positives


def test_tiff_tiled_roundtrip_all_layouts():
    """Tiled TIFF (tags 322-325): exact round-trip for every lossless
    compression x predictor x planar x byte order over non-multiple
    dimensions (edge tiles padded per spec, assembly crops), and
    JPEG tiles with shared JPEGTables within lossy tolerance."""
    import pytest as _pytest

    from parquet_extractor_spark.functions.tiff import (
        build_tiff_image,
        decode_tiff,
    )

    rng = np.random.default_rng(11)
    cases = [
        (37, 29, (16, 16), 1, 1, 1, "le", 3),
        (37, 29, (16, 16), 5, 2, 1, "be", 3),
        (32, 48, (16, 32), 32773, 1, 2, "le", 3),
        (20, 20, (16, 16), 8, 2, 1, "le", 1),
        (64, 40, (32, 16), 5, 1, 2, "be", 4),
    ]
    for h, w, ts, comp, pred, planar, endian, chans in cases:
        arr = rng.integers(0, 256, size=(h, w, chans), dtype=np.uint8)
        t = build_tiff_image(
            arr,
            endian=endian,
            compression=comp,
            predictor=pred,
            planar=planar,
            tile_size=ts,
        )
        out = decode_tiff(t)
        want = arr.repeat(3, axis=2) if chans == 1 else arr
        assert np.array_equal(out, want), (h, w, comp, planar)
    # JPEG tiles: lossy but shape-exact, shared-tables splice covered
    arr = rng.integers(0, 256, size=(33, 17, 3), dtype=np.uint8)
    t = build_tiff_image(
        arr,
        compression=7,
        tile_size=(16, 16),
        jpeg_shared_tables=True,
    )
    out = decode_tiff(t)
    assert out.shape == arr.shape
    assert np.abs(out.astype(int) - arr.astype(int)).max() <= 30
    # tile count mismatch raises cleanly
    import struct as _struct

    bad = bytearray(
        build_tiff_image(
            rng.integers(0, 256, (20, 20, 3), dtype=np.uint8),
            tile_size=(16, 16),
        )
    )
    n = _struct.unpack_from("<H", bad, 8)[0]
    for i in range(n):
        off = 10 + 12 * i
        if _struct.unpack_from("<H", bad, off)[0] == 322:
            _struct.pack_into("<I", bad, off + 8, 64)  # lie about tile_w
    with _pytest.raises(ValueError):
        decode_tiff(bytes(bad))


def test_bigtiff_roundtrip_and_geometry():
    """BigTIFF (magic 43): u64 offsets, 20-byte IFD entries, u64
    entry counts. The same payloads decode identically to their
    classic containers (strips, tiles, predictor, planar, JPEG), the
    header-only metadata pass reads it, and a bad offset-size field
    raises cleanly."""
    import struct as _struct

    import pytest as _pytest

    from parquet_extractor_spark.functions.tiff import (
        build_tiff_image,
        decode_tiff,
        is_tiff,
        tiff_metadata,
    )

    rng = np.random.default_rng(13)
    cases = [
        (24, 16, 1, 1, 1, "le", None),
        (21, 10, 5, 2, 1, "be", None),
        (20, 20, 32773, 1, 2, "le", None),
        (37, 29, 5, 2, 1, "le", (16, 16)),
    ]
    for h, w, comp, pred, planar, endian, ts in cases:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        big = build_tiff_image(
            arr, endian=endian, compression=comp, predictor=pred,
            planar=planar, tile_size=ts, bigtiff=True,
        )
        assert is_tiff(big) and big[2:4] in (b"\x2b\x00", b"\x00\x2b")
        variant, mw, mh, _alpha, pages = tiff_metadata(big)
        assert (mw, mh, pages) == (w, h, 1) and variant == endian
        assert np.array_equal(decode_tiff(big), arr)
        classic = build_tiff_image(
            arr, endian=endian, compression=comp, predictor=pred,
            planar=planar, tile_size=ts,
        )
        assert np.array_equal(decode_tiff(big), decode_tiff(classic))
    # JPEG strips inside BigTIFF: lossy-tolerant
    arr = rng.integers(0, 256, size=(18, 18, 3), dtype=np.uint8)
    big = build_tiff_image(
        arr, compression=7, bigtiff=True, jpeg_shared_tables=True
    )
    out = decode_tiff(big)
    assert out.shape == arr.shape
    assert np.abs(out.astype(int) - arr.astype(int)).max() <= 30
    # offset-size field must be 8
    bad = bytearray(big)
    _struct.pack_into("<H", bad, 4, 4)
    with _pytest.raises(ValueError):
        decode_tiff(bytes(bad))
    with _pytest.raises(ValueError):
        tiff_metadata(bytes(bad))

"""Generate the literal DuckDB oracle for media_feature_checksums.

Runs the SAME pure-Python fixture generator and feature functions the
Spark pipeline uses (operators/multimodal.py), replicating the two
representation details of the Spark path:

- the feature column is ``array<float>`` (float32) — each component is
  rounded through np.float32 before the checksum;
- the checksum is Spark's ``F.aggregate`` left-to-right double fold,
  then ``floor(x*1e6 + 0.5)``.

Writes parquet_extractor_spark/operators/multimodal_oracle.py (a
committed constant), so the driver's DuckDB side needs no media
decode at all: the oracle pins the expected value of every row.

Usage: python tools/gen_multimodal_oracle.py
"""

from __future__ import annotations

import math
import struct
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from parquet_extractor_spark.operators.multimodal import (  # noqa: E402
    feature_for_bytes,
    synthetic_media_rows,
)

OUT = "/root/repo/parquet_extractor_spark/operators/multimodal_oracle.py"


def micro(x: float) -> int:
    return int(math.floor(x * 1e6 + 0.5))


def main() -> None:
    values = []
    for media_id, kind, _mime, _w, _h, _dur, data in synthetic_media_rows():
        feat32 = [float(np.float32(v)) for v in feature_for_bytes(data)]
        s = 0.0
        for v in feat32:
            s += v
        values.append(
            f"({media_id}, '{kind}', {len(data)}, {micro(s)}, "
            f"{micro(feat32[0])})"
        )
    rows = ",\n    ".join(values)
    sql = f"""SELECT CAST(media_id AS BIGINT) AS media_id,
       kind,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(feature_sum_micro AS BIGINT) AS feature_sum_micro,
       CAST(f0_micro AS BIGINT) AS f0_micro
FROM (VALUES
    {rows}
) AS t(media_id, kind, n_bytes, feature_sum_micro, f0_micro)
ORDER BY media_id"""
    import hashlib

    from parquet_extractor_spark.operators.multimodal import (
        RESIZE_H,
        RESIZE_W,
        resize_bytes,
    )

    resize_vals = []
    for media_id, kind, _mime, _w, _h, _dur, data in synthetic_media_rows():
        if kind != "image":
            continue
        out = resize_bytes(data, RESIZE_W, RESIZE_H)
        digest = int(hashlib.md5(out).hexdigest()[:15], 16)
        resize_vals.append(f"({media_id}, {len(out)}, {digest})")
    resize_rows = ",\n    ".join(resize_vals)
    resize_sql = f"""SELECT CAST(media_id AS BIGINT) AS media_id,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(bytes_hash AS BIGINT) AS bytes_hash
FROM (VALUES
    {resize_rows}
) AS t(media_id, n_bytes, bytes_hash)
ORDER BY media_id"""

    from parquet_extractor_spark.operators.multimodal import (
        audio_metadata_for_bytes,
        synthetic_audio_rows,
    )

    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            return f"'{v}'"
        return str(v)

    audio_vals = []
    for media_id, data in synthetic_audio_rows():
        meta = audio_metadata_for_bytes(data)
        audio_vals.append(
            f"({media_id}, " + ", ".join(lit(v) for v in meta) + ")"
        )
    audio_rows = ",\n    ".join(audio_vals)
    audio_sql = f"""SELECT CAST(media_id AS BIGINT) AS media_id,
       container,
       CAST(sample_rate AS BIGINT) AS sample_rate,
       CAST(channels AS BIGINT) AS channels,
       CAST(bitrate_kbps AS BIGINT) AS bitrate_kbps,
       CAST(n_frames AS BIGINT) AS n_frames,
       CAST(vbr AS BOOLEAN) AS vbr,
       CAST(duration_ms AS BIGINT) AS duration_ms
FROM (VALUES
    {audio_rows}
) AS t(media_id, container, sample_rate, channels, bitrate_kbps,
       n_frames, vbr, duration_ms)
ORDER BY media_id"""

    from parquet_extractor_spark.operators.multimodal import (
        synthetic_video_rows,
        video_metadata_for_bytes,
    )

    video_vals = []
    for media_id, data in synthetic_video_rows():
        meta = video_metadata_for_bytes(data)
        video_vals.append(
            f"({media_id}, " + ", ".join(lit(v) for v in meta) + ")"
        )
    video_rows = ",\n    ".join(video_vals)
    video_sql = f"""SELECT CAST(media_id AS BIGINT) AS media_id,
       container,
       brand,
       CAST(duration_ms AS BIGINT) AS duration_ms,
       CAST(n_tracks AS BIGINT) AS n_tracks,
       CAST(width AS BIGINT) AS width,
       CAST(height AS BIGINT) AS height,
       CAST(has_video AS BOOLEAN) AS has_video,
       CAST(has_audio AS BOOLEAN) AS has_audio
FROM (VALUES
    {video_rows}
) AS t(media_id, container, brand, duration_ms, n_tracks, width,
       height, has_video, has_audio)
ORDER BY media_id"""

    from parquet_extractor_spark.operators.multimodal import (
        image_metadata_for_bytes,
        synthetic_image_rows,
    )

    image_vals = []
    for media_id, data in synthetic_image_rows():
        meta = image_metadata_for_bytes(data)
        image_vals.append(
            f"({media_id}, " + ", ".join(lit(v) for v in meta) + ")"
        )
    image_rows = ",\n    ".join(image_vals)
    image_sql = f"""SELECT CAST(media_id AS BIGINT) AS media_id,
       container,
       variant,
       CAST(width AS BIGINT) AS width,
       CAST(height AS BIGINT) AS height,
       CAST(has_alpha AS BOOLEAN) AS has_alpha,
       CAST(is_animated AS BOOLEAN) AS is_animated,
       CAST(n_bytes AS BIGINT) AS n_bytes
FROM (VALUES
    {image_rows}
) AS t(media_id, container, variant, width, height, has_alpha,
       is_animated, n_bytes)
ORDER BY media_id"""

    from parquet_extractor_spark.operators.multimodal import (
        gif_frame_samples,
        synthetic_animated_gif_rows,
    )

    gif_vals = []
    for media_id, data in synthetic_animated_gif_rows():
        for ts, png in gif_frame_samples(data, every_ms=60):
            wpx, hpx = struct.unpack(">II", png[16:24])
            digest = int(hashlib.md5(png).hexdigest()[:15], 16)
            gif_vals.append(
                f"({media_id}, {ts}, {wpx}, {hpx}, {len(png)}, {digest})"
            )
    gif_rows = ",\n    ".join(gif_vals)
    gif_sql = f"""SELECT CAST(media_id AS BIGINT) AS media_id,
       CAST(frame_ts_ms AS BIGINT) AS frame_ts_ms,
       CAST(width AS BIGINT) AS width,
       CAST(height AS BIGINT) AS height,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(frame_hash AS BIGINT) AS frame_hash
FROM (VALUES
    {gif_rows}
) AS t(media_id, frame_ts_ms, width, height, n_bytes, frame_hash)
ORDER BY media_id, frame_ts_ms"""

    from parquet_extractor_spark.operators.multimodal import (
        animation_frame_samples,
        synthetic_apng_rows,
    )

    apng_vals = []
    for media_id, data in synthetic_apng_rows():
        for ts, png in animation_frame_samples(data, every_ms=50):
            wpx, hpx = struct.unpack(">II", png[16:24])
            digest = int(hashlib.md5(png).hexdigest()[:15], 16)
            apng_vals.append(
                f"({media_id}, {ts}, {wpx}, {hpx}, {len(png)}, {digest})"
            )
    apng_rows = ",\n    ".join(apng_vals)
    apng_sql = f"""SELECT CAST(media_id AS BIGINT) AS media_id,
       CAST(frame_ts_ms AS BIGINT) AS frame_ts_ms,
       CAST(width AS BIGINT) AS width,
       CAST(height AS BIGINT) AS height,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(frame_hash AS BIGINT) AS frame_hash
FROM (VALUES
    {apng_rows}
) AS t(media_id, frame_ts_ms, width, height, n_bytes, frame_hash)
ORDER BY media_id, frame_ts_ms"""

    # ── media_phash + media_phash_near_dups ─────────────────────────
    from parquet_extractor_spark.operators.multimodal import (
        PHASH_BANDS,
        PHASH_HAMMING_MAX,
        phash64,
        phash_bands,
        synthetic_neardup_rows,
    )
    from parquet_extractor_spark.operators.multimodal import (
        decode_image as _dec,
    )

    phash_vals = []
    for media_id, variant, data in synthetic_neardup_rows():
        h = phash64(_dec(data))
        bands = ", ".join(str(b) for b in phash_bands(h))
        phash_vals.append(f"({media_id}, '{variant}', {h}, {bands})")
    band_cols = ", ".join(f"b{i}" for i in range(PHASH_BANDS))
    phash_rows = ",\n    ".join(phash_vals)
    phash_table = f"""(VALUES
    {phash_rows}
) AS t(media_id, variant, phash, {band_cols})"""
    phash_sql = f"""SELECT CAST(media_id AS BIGINT) AS media_id,
       variant,
       CAST(phash AS BIGINT) AS phash
FROM {phash_table}
ORDER BY media_id"""
    # honest twin of the Spark plan: the SAME banded candidate join
    # (not an all-pairs scan), then the exact hamming filter
    band_union = "\n    UNION ALL\n    ".join(
        f"SELECT media_id, phash, {i} AS band_idx, b{i} AS band_val "
        f"FROM {phash_table}"
        for i in range(PHASH_BANDS)
    )
    neardup_sql = f"""WITH bands AS (
    {band_union}
),
cand AS (
    SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
           a.phash AS ha, b.phash AS hb
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
     AND a.media_id < b.media_id
)
SELECT CAST(id_a AS BIGINT) AS id_a,
       CAST(id_b AS BIGINT) AS id_b,
       CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= {PHASH_HAMMING_MAX}
ORDER BY id_a, id_b"""

    # ── media_audio_fingerprint + media_audio_near_dups ─────────────
    from parquet_extractor_spark.operators.multimodal import (
        AFP_HAMMING_MAX,
        audio_fingerprint64,
        synthetic_audio_neardup_rows,
    )

    afp_vals = []
    for media_id, variant, data in synthetic_audio_neardup_rows():
        h = audio_fingerprint64(data)
        bands = ", ".join(str(b) for b in phash_bands(h))
        afp_vals.append(f"({media_id}, '{variant}', {h}, {bands})")
    afp_rows = ",\n    ".join(afp_vals)
    afp_table = f"""(VALUES
    {afp_rows}
) AS t(media_id, variant, phash, {band_cols})"""
    afp_sql = f"""SELECT CAST(media_id AS BIGINT) AS media_id,
       variant,
       CAST(phash AS BIGINT) AS phash
FROM {afp_table}
ORDER BY media_id"""
    afp_band_union = "\n    UNION ALL\n    ".join(
        f"SELECT media_id, phash, {i} AS band_idx, b{i} AS band_val "
        f"FROM {afp_table}"
        for i in range(PHASH_BANDS)
    )
    afp_neardup_sql = f"""WITH bands AS (
    {afp_band_union}
),
cand AS (
    SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
           a.phash AS ha, b.phash AS hb
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
     AND a.media_id < b.media_id
)
SELECT CAST(id_a AS BIGINT) AS id_a,
       CAST(id_b AS BIGINT) AS id_b,
       CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= {AFP_HAMMING_MAX}
ORDER BY id_a, id_b"""

    # ── media_animation_signatures + media_animation_near_dups ──────
    from parquet_extractor_spark.functions.png import decode_png as _dpng
    from parquet_extractor_spark.operators.multimodal import (
        ANIM_MIN_MATCHED,
        animation_frame_samples,
        synthetic_animation_neardup_rows,
    )

    anim_vals = []
    for media_id, variant, data in synthetic_animation_neardup_rows():
        for ts, png in animation_frame_samples(data):
            h = phash64(_dpng(png))
            bands = ", ".join(str(b) for b in phash_bands(h))
            anim_vals.append(
                f"({media_id}, '{variant}', {ts}, {h}, {bands})"
            )
    anim_rows = ",\n    ".join(anim_vals)
    anim_table = f"""(VALUES
    {anim_rows}
) AS t(media_id, variant, frame_ts, phash, {band_cols})"""
    anim_sql = f"""SELECT CAST(media_id AS BIGINT) AS media_id,
       variant,
       CAST(frame_ts AS BIGINT) AS frame_ts,
       CAST(phash AS BIGINT) AS phash
FROM {anim_table}
ORDER BY media_id, frame_ts"""
    anim_band_union = "\n    UNION ALL\n    ".join(
        f"SELECT media_id, frame_ts, phash, {i} AS band_idx, "
        f"b{i} AS band_val FROM {anim_table}"
        for i in range(PHASH_BANDS)
    )
    anim_neardup_sql = f"""WITH bands AS (
    {anim_band_union}
),
cand AS (
    SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
           a.frame_ts AS ts_a, a.phash AS ha, b.phash AS hb
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
     AND a.media_id < b.media_id
),
matched AS (
    SELECT id_a, id_b, ts_a FROM cand
    WHERE bit_count(xor(ha, hb)) <= {PHASH_HAMMING_MAX}
)
SELECT CAST(id_a AS BIGINT) AS id_a,
       CAST(id_b AS BIGINT) AS id_b,
       CAST(count(DISTINCT ts_a) AS BIGINT) AS n_frames_matched
FROM matched
GROUP BY id_a, id_b
HAVING count(DISTINCT ts_a) >= {ANIM_MIN_MATCHED}
ORDER BY id_a, id_b"""

    # ── media_exif_gps_audit ────────────────────────────────────────
    from parquet_extractor_spark.functions.jpeg import (
        decode_jpeg as _djpg,
        is_jpeg as _isj,
        jpeg_exif_gps as _gps,
        jpeg_exif_orientation as _ori,
        strip_jpeg_exif as _strip,
        _decode_jpeg_inner as _djpg_raw,
    )
    from parquet_extractor_spark.operators.multimodal import (
        synthetic_exif_rows,
    )

    exif_vals = []
    for media_id, data in synthetic_exif_rows():
        gps = _gps(data) if _isj(data) else None
        ori = _ori(data) if _isj(data) else 1
        clean = False
        if _isj(data):
            try:
                s = _strip(data)
                clean = (
                    _gps(s) is None
                    and _ori(s) == 1
                    and bool((_djpg(s) == _djpg_raw(data)).all())
                )
            except (ValueError, NotImplementedError):
                clean = False
        lat = "NULL" if gps is None else str(int(round(gps[0] * 1e6)))
        lon = "NULL" if gps is None else str(int(round(gps[1] * 1e6)))
        exif_vals.append(
            f"({media_id}, {str(gps is not None).upper()}, {lat}, {lon}, "
            f"{ori}, {str(clean).upper()})"
        )
    exif_rows = ",\n    ".join(exif_vals)
    exif_sql = f"""SELECT CAST(media_id AS BIGINT) AS media_id,
       has_gps,
       CAST(lat_micro AS BIGINT) AS lat_micro,
       CAST(lon_micro AS BIGINT) AS lon_micro,
       CAST(orientation AS BIGINT) AS orientation,
       scrub_clean
FROM (VALUES
    {exif_rows}
) AS t(media_id, has_gps, lat_micro, lon_micro, orientation, scrub_clean)
ORDER BY media_id"""

    # ── media_neardup_eval ──────────────────────────────────────────
    import duckdb

    from parquet_extractor_spark.operators.multimodal import (
        _planted_pairs,
    )

    eval_vals = []
    for family, pair_sql in (
        ("animation", anim_neardup_sql),
        ("audio", afp_neardup_sql),
        ("image", neardup_sql),
    ):
        got = {
            (int(a), int(b))
            for a, b, *_ in duckdb.connect().execute(pair_sql).fetchall()
        }
        truth = set(_planted_pairs(family))
        tp = len(got & truth)
        eval_vals.append(
            f"('{family}', {len(got)}, {len(truth)}, {tp}, "
            f"{round(tp / len(got), 6)}, {round(tp / len(truth), 6)})"
        )
    eval_rows = ",\n    ".join(eval_vals)
    eval_sql = f"""SELECT family,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(n_planted AS BIGINT) AS n_planted,
       CAST(true_positives AS BIGINT) AS true_positives,
       CAST(precision AS DOUBLE) AS precision,
       CAST(recall AS DOUBLE) AS recall
FROM (VALUES
    {eval_rows}
) AS t(family, n_pairs, n_planted, true_positives, precision, recall)
ORDER BY family"""

    with open(OUT, "w") as f:
        f.write(
            '"""GENERATED by tools/gen_multimodal_oracle.py — do not edit.\n'
            "\nLiteral oracles for media_feature_checksums (decode + feature\n"
            "checksums), media_resize_checksums (decode + resample +\n"
            "re-encode byte hashes), media_audio_metadata (WAV/MP3\n"
            "header parsing), media_video_metadata (MP4 box walk +\n"
            "WebM EBML walk), and media_image_metadata (PNG/JPEG/GIF/\n"
            "BMP/WebP header-only parsing) over the deterministic media\n"
            "fixtures, computed by the same pure-Python codec/feature\n"
            'functions the Spark pipeline ships.\n"""\n\n'
            f"MEDIA_FEATURE_CHECKSUMS_SQL = r'''{sql}\n'''\n\n"
            f"MEDIA_RESIZE_CHECKSUMS_SQL = r'''{resize_sql}\n'''\n\n"
            f"MEDIA_AUDIO_METADATA_SQL = r'''{audio_sql}\n'''\n\n"
            f"MEDIA_VIDEO_METADATA_SQL = r'''{video_sql}\n'''\n\n"
            f"MEDIA_IMAGE_METADATA_SQL = r'''{image_sql}\n'''\n\n"
            f"MEDIA_GIF_FRAME_CHECKSUMS_SQL = r'''{gif_sql}\n'''\n\n"
            f"MEDIA_APNG_FRAME_CHECKSUMS_SQL = r'''{apng_sql}\n'''\n\n"
            f"MEDIA_PHASH_SQL = r'''{phash_sql}\n'''\n\n"
            f"MEDIA_PHASH_NEAR_DUPS_SQL = r'''{neardup_sql}\n'''\n\n"
            f"MEDIA_AUDIO_FINGERPRINT_SQL = r'''{afp_sql}\n'''\n\n"
            f"MEDIA_AUDIO_NEAR_DUPS_SQL = r'''{afp_neardup_sql}\n'''\n\n"
            f"MEDIA_ANIMATION_SIGNATURES_SQL = r'''{anim_sql}\n'''\n\n"
            f"MEDIA_ANIMATION_NEAR_DUPS_SQL = r'''{anim_neardup_sql}\n'''\n\n"
            f"MEDIA_EXIF_GPS_AUDIT_SQL = r'''{exif_sql}\n'''\n\n"
            f"MEDIA_NEARDUP_EVAL_SQL = r'''{eval_sql}\n'''\n"
        )
    print(
        f"wrote {OUT} "
        f"({len(values)} + {len(resize_vals)} + {len(audio_vals)} + "
        f"{len(video_vals)} + {len(image_vals)} + {len(gif_vals)} + "
        f"{len(apng_vals)} rows)"
    )


if __name__ == "__main__":
    main()

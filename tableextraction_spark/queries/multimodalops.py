"""Multimodal lane as a driver-contract query (empty-on-success).

The frame-sample and audio-feature stages (``multimodal.py``) were pinned by
pytest only; q47 puts them in the driver's hard rows+schema+hash gate the
same way q24/q46 gate the raster/PDF lanes.  A deterministic clip corpus —
real AVI/MJPEG containers (``avi.py``), animated GIFs, MP4/ISO-BMFF with
MJPEG samples (``mp4.py``), Matroska with MJPEG blocks across all lacing
modes (``mkv.py``), MP4 with avc1 **H.264** I_PCM samples (``h264.py`` —
the non-MJPEG codec, golden per-frame pixel hashes), and real RIFF/WAVE +
FLAC + Ogg/Vorbis clips — is
synthesized DISTRIBUTED (mapInPandas over a
range frame; no driver-side payload bytes), run through the real Spark
stages, and compared against plan-derived expectations computed RELATIONALLY
from the same index arithmetic.  Rows = failed checks; oracle = the same
empty relation.

Scale note: generation, decode, and verification are all per-clip map work
plus one small groupBy — the shape survives any corpus size; the clip count
here only needs to cover the arithmetic lattice (frame counts 3-7, three
heights, two widths, four durations).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import functions as F

from .common import sf_of

MEDIA_SCHEMA = "media_ref string, kind string, content binary"
EVERY_N = 2


def _n_clips_for(sf_dir: str) -> int:
    sf = sf_of(sf_dir)
    # covers the full (i%5, i%3, i%2, i%4) lattice at every check scale;
    # capped — q47 verifies semantics, bench owns throughput
    return max(12, min(64, int(round(sf * 2000))))


def _clip_batches(batches: Iterator) -> Iterator:
    import numpy as np
    import pandas as pd

    from ..avi import encode_avi_mjpeg
    from ..flac import encode_flac
    from ..gif import encode_gif_animation
    from ..jpeg import encode_jpeg_gray
    from ..mkv import encode_mkv_mjpeg
    from ..mp4 import encode_mp4_h264, encode_mp4_mjpeg
    from ..multimodal import encode_wav
    from ..vorbis import encode_vorbis_ogg

    for pdf in batches:
        rows = []
        for i in pdf["i"]:
            i = int(i)
            nf, h, w = 3 + i % 5, 24 + 8 * (i % 3), 32 + 8 * (i % 2)
            y, x = np.mgrid[0:h, 0:w]
            frames = [
                ((x * 2 + y + f * 16) % 256).astype(np.uint8) for f in range(nf)
            ]
            jpgs = [encode_jpeg_gray(f) for f in frames]
            avi = encode_avi_mjpeg(jpgs, w, h)
            gif = encode_gif_animation(frames)  # same lattice, second container
            mp4 = encode_mp4_mjpeg(jpgs, w, h)  # third container: ISO-BMFF
            # fourth container: Matroska (EBML); the rotation covers the
            # three variable-size block layouts (none/Xiph/EBML lacing) and
            # the streaming unknown-size-cluster shape — fixed lacing needs
            # equal frame sizes and is pinned by unit tests instead
            mkvb = encode_mkv_mjpeg(
                jpgs, w, h, lacing=("none", "xiph", "ebml")[i % 3],
                streaming=i % 2 == 1,
            )
            # fifth container/codec pair: MP4 with avc1 H.264 I_PCM
            # samples — the rotation's only non-MJPEG real video codec;
            # I_PCM is lossless so this lane (and GIF) carries golden
            # per-frame pixel hashes below
            h264 = encode_mp4_h264(frames)
            ln = 4000 + 500 * (i % 4)
            pcm = ((np.arange(ln) * 37) % 4096 - 2048).astype(np.int16)
            rows.append((f"vid-{i:04d}", "video", avi))
            rows.append((f"gifv-{i:04d}", "video", gif))
            rows.append((f"mp4-{i:04d}", "video", mp4))
            rows.append((f"mkv-{i:04d}", "video", mkvb))
            rows.append((f"h264-{i:04d}", "video", h264))
            rows.append((f"aud-{i:04d}", "audio", encode_wav(pcm, 8000)))
            rows.append((f"flac-{i:04d}", "audio", encode_flac(pcm, 8000)))
            # third audio container: Ogg/Vorbis (lossy, but the decoder
            # truncates to the granule so duration stays EXACT; RMS/error
            # checks don't depend on quantization)
            rows.append((f"ogg-{i:04d}", "audio", encode_vorbis_ogg(pcm, 8000)))
        yield pd.DataFrame(rows, columns=["media_ref", "kind", "content"])


GOLDEN_SCHEMA = "media_ref string, frame_no int, want_md5 string"
_LOSSLESS_VIDEO = ("gifv-", "h264-")


def _golden_frame_batches(batches: Iterator) -> Iterator:
    """Plan-side golden pixel hashes for the LOSSLESS video codecs in the
    rotation (GIF frames, H.264 I_PCM samples): md5 of each sampled source
    frame's raw gray bytes, from the same index arithmetic as
    ``_clip_batches`` — so decode must reproduce the source bit-exactly.
    MJPEG lanes are excluded (lossy by design; counts/dims gate them)."""
    import hashlib

    import numpy as np
    import pandas as pd

    for pdf in batches:
        rows = []
        for i in pdf["i"]:
            i = int(i)
            nf, h, w = 3 + i % 5, 24 + 8 * (i % 3), 32 + 8 * (i % 2)
            y, x = np.mgrid[0:h, 0:w]
            for f in range(0, nf, EVERY_N):
                md5 = hashlib.md5(
                    (((x * 2 + y + f * 16) % 256).astype(np.uint8)).tobytes()
                ).hexdigest()
                for prefix in _LOSSLESS_VIDEO:
                    rows.append((f"{prefix}{i:04d}", f, md5))
        yield pd.DataFrame(rows, columns=["media_ref", "frame_no", "want_md5"])


def _mismatches(joined, checks: list[tuple[str, str, str]]):
    """(name, got_col, want_col) triples → exploded rows where got ≠ want."""
    arr = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col(got).cast("double").alias("got"),
                F.col(want).cast("double").alias("want"),
            )
            for name, got, want in checks
        ]
    )
    return (
        joined.select("media_ref", F.explode(arr).alias("c"))
        .where(~F.col("c.got").eqNullSafe(F.col("c.want")))
        .select("media_ref", "c.check", "c.got", "c.want")
    )


def q47_multimodal_verify(spark, sf_dir):
    from ..multimodal import audio_features, sample_frames

    n = _n_clips_for(sf_dir)
    idx = spark.range(n).select(F.col("id").cast("int").alias("i"))
    media = idx.mapInPandas(_clip_batches, MEDIA_SCHEMA)

    # --- video: sample every 2nd frame, verify counts/dims/ids per clip;
    # the SAME plan lattice is expected from BOTH containers (AVI/MJPEG and
    # animated GIF) — one union over two format prefixes ---
    nf = F.lit(3) + F.col("i") % 5
    exp_v = idx.crossJoin(
        spark.createDataFrame(
            [("vid-",), ("gifv-",), ("mp4-",), ("mkv-",), ("h264-",)],
            "prefix string",
        )
    ).select(
        F.concat("prefix", F.lpad(F.col("i").cast("string"), 4, "0")).alias(
            "media_ref"
        ),
        nf.alias("want_nf"),
        F.floor((nf + 1) / 2).alias("want_sampled"),
        # sampled frame_nos are 0,2,4,…: max = 2*(ceil(nf/2)-1)
        (F.floor((nf + 1) / 2) * 2 - 2).alias("want_max_no"),
        (F.lit(32) + (F.col("i") % 2) * 8).alias("want_w"),
        (F.lit(24) + (F.col("i") % 3) * 8).alias("want_h"),
    )
    sampled = sample_frames(
        media.where(F.col("kind") == "video"), every_n=EVERY_N
    )
    got_v = (
        sampled.groupBy("media_ref")
        .agg(
            F.count("*").alias("got_sampled"),
            F.max("frame_no").alias("got_max_no"),
            F.min("n_frames").alias("got_nf_min"),
            F.max("n_frames").alias("got_nf_max"),
            F.min("width").alias("got_w_min"),
            F.max("width").alias("got_w_max"),
            F.min("height").alias("got_h_min"),
            F.max("height").alias("got_h_max"),
            F.count("error").alias("got_errors"),  # count skips nulls
        )
    )
    vid_bad = _mismatches(
        got_v.join(exp_v, "media_ref", "full").withColumn("zero", F.lit(0)),
        [
            ("video_sampled_count", "got_sampled", "want_sampled"),
            ("video_max_frame_no", "got_max_no", "want_max_no"),
            ("video_n_frames_min", "got_nf_min", "want_nf"),
            ("video_n_frames_max", "got_nf_max", "want_nf"),
            ("video_width_min", "got_w_min", "want_w"),
            ("video_width_max", "got_w_max", "want_w"),
            ("video_height_min", "got_h_min", "want_h"),
            ("video_height_max", "got_h_max", "want_h"),
            ("video_errors", "got_errors", "zero"),
        ],
    )

    # --- audio: WAV features must be exact (duration = len/rate, both
    # dyadic rationals here → exact doubles on both sides) ---
    ln = F.lit(4000) + (F.col("i") % 4) * 500
    # same expectation lattice for all THREE audio containers
    exp_a = idx.crossJoin(
        spark.createDataFrame([("aud-",), ("flac-",), ("ogg-",)], "prefix string")
    ).select(
        F.concat("prefix", F.lpad(F.col("i").cast("string"), 4, "0")).alias(
            "media_ref"
        ),
        F.lit(8000).alias("want_rate"),
        (ln / F.lit(8000)).alias("want_dur"),
    )
    got_a = audio_features(media.where(F.col("kind") == "audio")).select(
        "media_ref",
        F.col("sample_rate").alias("got_rate"),
        F.col("duration_s").alias("got_dur"),
        F.when(F.col("rms") > 0, 1).otherwise(0).alias("got_rms_pos"),
        F.when(F.col("error").isNull(), 0).otherwise(1).alias("got_err"),
    )
    aud_bad = _mismatches(
        got_a.join(exp_a, "media_ref", "full")
        .withColumn("one", F.lit(1))
        .withColumn("zero", F.lit(0)),
        [
            ("audio_sample_rate", "got_rate", "want_rate"),
            ("audio_duration_s", "got_dur", "want_dur"),
            ("audio_rms_positive", "got_rms_pos", "one"),
            ("audio_error", "got_err", "zero"),
        ],
    )
    # --- golden frame hashes for the lossless codecs (GIF, H.264 I_PCM):
    # every sampled frame's decoded pixel bytes (IMG1 payload minus its
    # 12-byte header, hashed in-plan) must equal the plan-side source-frame
    # md5 EXACTLY; a full join catches missing/extra frames on either side.
    golden = idx.mapInPandas(_golden_frame_batches, GOLDEN_SCHEMA)
    got_px = sampled.where(F.col("media_ref").rlike("^(gifv|h264)-")).select(
        "media_ref",
        "frame_no",
        F.md5(
            F.expr("substring(content, 13, length(content) - 12)")
        ).alias("got_md5"),
    )
    px_bad = (
        got_px.join(golden, ["media_ref", "frame_no"], "full")
        .where(~F.col("got_md5").eqNullSafe(F.col("want_md5")))
        .select(
            "media_ref",
            F.lit("video_frame_pixels_md5").alias("check"),
            F.col("frame_no").cast("double").alias("got"),
            F.lit(0.0).alias("want"),
        )
    )
    return vid_bad.unionByName(aud_bad).unionByName(px_bad)


Q47_SQL = """
SELECT CAST(NULL AS VARCHAR) AS media_ref, CAST(NULL AS VARCHAR) AS check,
       CAST(NULL AS DOUBLE) AS got, CAST(NULL AS DOUBLE) AS want
WHERE 1 = 0
"""


RESIZE_W, RESIZE_H = 24, 18
_LOSSLESS = (
    "img1", "png", "pngi", "pngp", "gif", "bmp", "tiff", "jp2", "ico", "icop",
)
IMAGES_SCHEMA = "media_ref string, content binary, want_md5 string"


def _image_batches(batches: Iterator) -> Iterator:
    """Per index: a deterministic source image encoded in a cycling lossless
    codec, plus the md5 of its nearest-neighbor resize (the plan-side
    expectation — same arithmetic as ``multimodal.resize_images``, computed
    from the SOURCE array so the encode→decode→resize chain is what's
    under test)."""
    import hashlib

    import numpy as np
    import pandas as pd

    from ..bmp import encode_bmp_gray
    from ..gif import encode_gif_gray
    from ..h264 import encode_h264_annexb
    from ..ico import encode_ico_gray, encode_ico_png
    from ..jp2 import encode_jp2_gray
    from ..media import encode_image
    from ..png import encode_png, encode_png_palette
    from ..tiff import encode_tiff_gray

    enc = {
        "img1": encode_image,
        "png": encode_png,
        # Adam7-interlaced and identity-palette PNGs: same pixels, two
        # more decode lanes under the hash gate
        "pngi": lambda img: encode_png(img, interlace=True),
        "pngp": encode_png_palette,
        "gif": encode_gif_gray,
        "bmp": encode_bmp_gray,
        # LZW TIFF: lossless, and the strip decode exercises the TIFF-
        # variant LZW + IFD walk under the same hash gate as the others
        "tiff": lambda img: encode_tiff_gray(img, "lzw"),
        # reversible-5/3 JPEG 2000: lossless, exercises the full T.800
        # chain (tag trees, EBCOT tier-1, inverse DWT) under the gate
        "jp2": lambda img: encode_jp2_gray(img, levels=2),
        # favicons, both wire flavors: headerless-DIB and embedded-PNG
        "ico": encode_ico_gray,
        "icop": encode_ico_png,
    }
    for pdf in batches:
        rows = []
        for i in pdf["i"]:
            i = int(i)
            h, w = 30 + i % 7, 40 + i % 5
            y, x = np.mgrid[0:h, 0:w]
            img = ((x * 3 + y * 5 + i) % 256).astype(np.uint8)
            codec = _LOSSLESS[i % len(_LOSSLESS)]
            yi = (np.arange(RESIZE_H) * h // RESIZE_H).astype(np.intp)
            xi = (np.arange(RESIZE_W) * w // RESIZE_W).astype(np.intp)
            want = hashlib.md5(img[yi][:, xi].tobytes()).hexdigest()
            rows.append((f"im-{codec}-{i:04d}", enc[codec](img), want))
        yield pd.DataFrame(rows, columns=["media_ref", "content", "want_md5"])


def q48_resize_format_verify(spark, sf_dir):
    """Resize-stage verify, empty-on-success: deterministic images encoded
    across every LOSSLESS raster codec (IMG1/PNG/GIF/BMP/LZW-TIFF/JP2/ICO,
    with interlaced+palette PNG and DIB+PNG-flavor ICO variants) go through
    the real ``resize_images`` stage; the output pixel bytes (IMG1 payload
    minus its 12-byte header, hashed in-plan via ``md5(substring(...))``)
    must equal the plan-side nearest-neighbor expectation EXACTLY — pinning
    the magic-routed decode and the resize arithmetic for all ten codec
    lanes in the driver's hard gate.  Rows = failed checks."""
    from ..multimodal import resize_images

    n = _n_clips_for(sf_dir)
    idx = spark.range(n).select(F.col("id").cast("int").alias("i"))
    media = idx.mapInPandas(_image_batches, IMAGES_SCHEMA)
    got = resize_images(media.select("media_ref", "content"), RESIZE_W, RESIZE_H).select(
        "media_ref",
        F.col("width").cast("double").alias("got_w"),
        F.col("height").cast("double").alias("got_h"),
        # IMG1 = 12-byte header + raw pixels: hash the pixel bytes in-plan
        F.md5(F.expr("substring(content, 13, length(content) - 12)")).alias("got_md5"),
        F.when(F.col("error").isNull(), 0.0).otherwise(1.0).alias("got_err"),
    )
    exp = media.select("media_ref", "want_md5")
    joined = (
        got.join(exp, "media_ref", "full")
        .withColumn("zero", F.lit(0.0))
        .withColumn("want_w", F.lit(float(RESIZE_W)))
        .withColumn("want_h", F.lit(float(RESIZE_H)))
        .withColumn(
            "md5_ok",
            F.when(F.col("got_md5").eqNullSafe(F.col("want_md5")), 0.0).otherwise(1.0),
        )
    )
    return _mismatches(
        joined,
        [
            ("resize_width", "got_w", "want_w"),
            ("resize_height", "got_h", "want_h"),
            ("resize_pixels_md5", "md5_ok", "zero"),
            ("resize_error", "got_err", "zero"),
        ],
    )


INVENTORY_FORMATS = (
    "img1", "png", "jpeg", "gif", "bmp", "tiff", "jp2", "ico",
    "wav", "flac", "ogg", "avi", "mp4", "mkv", "h264",
)
INVENTORY_SCHEMA = "media_ref string, content binary"


def _inventory_batches(batches: Iterator) -> Iterator:
    import numpy as np
    import pandas as pd

    from ..avi import encode_avi_mjpeg
    from ..bmp import encode_bmp_gray
    from ..flac import encode_flac
    from ..gif import encode_gif_gray
    from ..h264 import encode_h264_annexb
    from ..ico import encode_ico_gray
    from ..jp2 import encode_jp2_gray
    from ..jpeg import encode_jpeg_gray
    from ..media import encode_image
    from ..mkv import encode_mkv_mjpeg
    from ..mp4 import encode_mp4_mjpeg
    from ..multimodal import encode_wav
    from ..png import encode_png
    from ..tiff import encode_tiff_gray
    from ..vorbis import encode_vorbis_ogg

    for pdf in batches:
        rows = []
        for i in pdf["i"]:
            i = int(i)
            fmt = INVENTORY_FORMATS[i % len(INVENTORY_FORMATS)]
            h, w = 24 + 8 * (i % 3), 32 + 8 * (i % 2)
            y, x = np.mgrid[0:h, 0:w]
            img = ((x + y + i) % 256).astype(np.uint8)
            ln = 4000 + 500 * (i % 4)
            pcm = ((np.arange(ln) * 37) % 4096 - 2048).astype(np.int16)
            # ogg gets its own length lattice: multiples of 8 keep the
            # granule duration exact at the probe's 3-decimal rounding
            ln_ogg = 4000 + 512 * (i % 4)
            pcm_ogg = ((np.arange(ln_ogg) * 37) % 4096 - 2048).astype(np.int16)
            nf = 3 + i % 5
            enc = {
                "img1": lambda: encode_image(img),
                "png": lambda: encode_png(img),
                "jpeg": lambda: encode_jpeg_gray(img),
                "gif": lambda: encode_gif_gray(img),
                "bmp": lambda: encode_bmp_gray(img),
                "wav": lambda: encode_wav(pcm, 8000),
                "flac": lambda: encode_flac(pcm, 8000),
                "ogg": lambda: encode_vorbis_ogg(pcm_ogg, 8000),
                "avi": lambda: encode_avi_mjpeg(
                    [encode_jpeg_gray(img)] * nf, w, h, fps=10
                ),
                "mp4": lambda: encode_mp4_mjpeg(
                    [encode_jpeg_gray(img)] * nf, w, h, fps=10
                ),
                "mkv": lambda: encode_mkv_mjpeg(
                    [encode_jpeg_gray(img)] * nf, w, h, fps=10
                ),
                # raw Annex-B elementary stream: dims/profile from the
                # SPS, frame count from the slice scan — no container
                "h264": lambda: encode_h264_annexb([img] * nf),
                "tiff": lambda: encode_tiff_gray(img, "lzw"),
                "jp2": lambda: encode_jp2_gray(img, levels=2),
                "ico": lambda: encode_ico_gray(img),
            }[fmt]
            rows.append((f"{fmt}-{i:04d}", enc()))
        yield pd.DataFrame(rows, columns=["media_ref", "content"])


def q49_media_inventory_verify(spark, sf_dir):
    """The crawl-inventory stage (header-only `probe_media`) in the hard
    gate, empty-on-success: a distributed mixed-format corpus (all fifteen
    native formats in one batch, raw H.264 elementary streams and ICO
    favicons included) probes to exactly the format / kind /
    dimensions / sample-rate / duration the plan arithmetic predicts —
    every field compared as a string so one query pins the whole row."""
    from ..probe import probe_media

    n = _n_clips_for(sf_dir)
    idx = spark.range(n).select(F.col("id").cast("int").alias("i"))
    fmt = F.element_at(
        F.array(*[F.lit(f) for f in INVENTORY_FORMATS]),
        (F.col("i") % len(INVENTORY_FORMATS)) + 1,
    )
    is_img = fmt.isin("img1", "png", "jpeg", "gif", "bmp", "tiff", "jp2", "ico")
    is_aud = fmt.isin("wav", "flac", "ogg")
    is_vid = fmt.isin("avi", "mp4", "mkv", "h264")
    h = F.lit(24) + (F.col("i") % 3) * 8
    w = F.lit(32) + (F.col("i") % 2) * 8
    ln = F.lit(4000) + (F.col("i") % 4) * 500
    nf = F.lit(3) + F.col("i") % 5
    exp = idx.select(
        F.concat(fmt, F.lit("-"), F.lpad(F.col("i").cast("string"), 4, "0")).alias(
            "media_ref"
        ),
        fmt.alias("want_format"),
        F.when(is_img, "image").when(is_aud, "audio").otherwise("video").alias(
            "want_kind"
        ),
        F.when(is_aud, 0).otherwise(w).cast("string").alias("want_w"),
        F.when(is_aud, 0).otherwise(h).cast("string").alias("want_h"),
        F.when(is_aud, 8000).otherwise(0).cast("string").alias("want_rate"),
        # ogg: granule/8000 with a 3-decimal-exact lattice (the probe
        # rounds to 3); other audio: exact dyadic len/8000;
        # avi: nf*100000/1e6 (fps=10);
        # mp4: mvhd duration nf over timescale 10; mkv: Duration ms ×
        # TimestampScale/1e9 (nf*1e8/1e9 — correctly rounded = nf/10.0) —
        # all computed with the same double ops the probe uses
        F.when(fmt == "ogg", (F.lit(4000) + (F.col("i") % 4) * 512).cast("double") / F.lit(8000.0))
        .when(is_aud, ln.cast("double") / F.lit(8000.0))
        .when(fmt == "avi", (nf * F.lit(100000)).cast("double") / F.lit(1000000.0))
        .when(fmt.isin("mp4", "mkv"), nf.cast("double") / F.lit(10.0))
        .otherwise(F.lit(0.0))
        .cast("string")
        .alias("want_dur"),
        F.when(is_vid, nf).when(is_img, 1).otherwise(0).cast("string").alias(
            "want_frames"
        ),
    )
    media = idx.mapInPandas(_inventory_batches, INVENTORY_SCHEMA)
    got = probe_media(media).select(
        "media_ref",
        F.col("format").alias("got_format"),
        F.col("kind").alias("got_kind"),
        F.col("width").cast("string").alias("got_w"),
        F.col("height").cast("string").alias("got_h"),
        F.col("sample_rate").cast("string").alias("got_rate"),
        F.col("duration_s").cast("string").alias("got_dur"),
        F.col("n_frames").cast("string").alias("got_frames"),
    )
    joined = got.join(exp, "media_ref", "full")
    checks = [
        ("inv_format", "got_format", "want_format"),
        ("inv_kind", "got_kind", "want_kind"),
        ("inv_width", "got_w", "want_w"),
        ("inv_height", "got_h", "want_h"),
        ("inv_sample_rate", "got_rate", "want_rate"),
        ("inv_duration", "got_dur", "want_dur"),
        ("inv_n_frames", "got_frames", "want_frames"),
    ]
    arr = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col(g).alias("got"),
                F.col(wv).alias("want"),
            )
            for name, g, wv in checks
        ]
    )
    return (
        joined.select("media_ref", F.explode(arr).alias("c"))
        .where(~F.col("c.got").eqNullSafe(F.col("c.want")))
        .select("media_ref", "c.check", "c.got", "c.want")
    )


Q49_SQL = """
SELECT CAST(NULL AS VARCHAR) AS media_ref, CAST(NULL AS VARCHAR) AS check,
       CAST(NULL AS VARCHAR) AS got, CAST(NULL AS VARCHAR) AS want
WHERE 1 = 0
"""


QUERIES = {
    "q47_multimodal_verify": (q47_multimodal_verify, Q47_SQL),
    "q48_resize_format_verify": (q48_resize_format_verify, Q47_SQL),
    "q49_media_inventory_verify": (q49_media_inventory_verify, Q49_SQL),
}

"""Multimodal binary-column tests: REAL stdlib decode for BMP/WAV
(exercised end-to-end over the binaryFile ingest), deterministic fake
decode for formats needing absent codec libraries."""

from __future__ import annotations

import hashlib
import struct

import pytest

from twitch_chat_analyser_spark.operators import multimodal


def make_bmp(width: int, height: int, pixels_bgr: list[list[tuple]]) -> bytes:
    """Hand-pack an uncompressed 24-bpp bottom-up BMP; ``pixels_bgr`` is
    rows in STORAGE order (bottom row first), each a list of (b, g, r)."""
    stride = (width * 3 + 3) & ~3
    body = bytearray()
    for row in pixels_bgr:
        for b, g, r in row:
            body += bytes((b, g, r))
        body += b"\x00" * (stride - width * 3)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body),
        2835, 2835, 0, 0,
    )
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    return hdr + info + bytes(body)


def make_wav(rate: int, samples: list[int], channels: int = 1) -> bytes:
    """Hand-pack a RIFF/WAVE 16-bit PCM file."""
    import array

    data = array.array("h", samples).tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


# 2 (storage) rows x 4 cols; bottom-up, so storage row 0 is the BOTTOM
BMP_PIXELS = [
    [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)],
    [(0, 0, 255), (255, 0, 0), (0, 255, 0), (255, 255, 255)],
]
BMP_BYTES = make_bmp(4, 2, BMP_PIXELS)
WAV_BYTES = make_wav(8000, [1000] * 4000)  # 0.5 s of constant amplitude


def test_decode_bmp_real():
    w, h, (mr, mg, mb) = multimodal.decode_bmp(BMP_BYTES)
    assert (w, h) == (4, 2)
    flat = [px for row in BMP_PIXELS for px in row]
    assert mb == pytest.approx(sum(p[0] for p in flat) / 8)
    assert mg == pytest.approx(sum(p[1] for p in flat) / 8)
    assert mr == pytest.approx(sum(p[2] for p in flat) / 8)


def test_decode_wav_real():
    rate, dur_ms, rms = multimodal.decode_wav(WAV_BYTES)
    assert rate == 8000
    assert dur_ms == 500
    assert rms == pytest.approx(1000.0)


def test_resize_bmp_real_round_trips():
    out = multimodal.resize_bmp(BMP_BYTES, 2, 1)
    w, h, means = multimodal.decode_bmp(out)
    assert (w, h) == (2, 1)
    # nearest-neighbor on 4x2 -> 2x1 keeps storage row 0 cols 0 and 2
    assert means == (
        pytest.approx((30 + 90) / 2),
        pytest.approx((20 + 80) / 2),
        pytest.approx((10 + 70) / 2),
    )


def test_real_decode_end_to_end_over_binaryfile(spark, tmp_path):
    """fake=False decode executes on actual files read through the
    binaryFile source: BMP dims/means and WAV rate/duration/rms come out
    of the distributed mapInPandas stage bit-exact."""
    from twitch_chat_analyser_spark.sources.files import read_binary_media

    (tmp_path / "img_1.bmp").write_bytes(BMP_BYTES)
    (tmp_path / "clip_2.wav").write_bytes(WAV_BYTES)
    media = read_binary_media(spark, str(tmp_path))

    img = {
        r["media_id"]: r
        for r in multimodal.decode_features(
            media.filter("kind = 'image'"), fake=False
        ).collect()
    }
    assert set(img) == {1}
    r = img[1]
    assert (r["width"], r["height"]) == (4, 2)
    assert r["sha256"] == hashlib.sha256(BMP_BYTES).hexdigest()
    flat = [px for row in BMP_PIXELS for px in row]
    assert r["mean_r"] == pytest.approx(sum(p[2] for p in flat) / 8)

    wav = multimodal.audio_features(media, fake=False).collect()
    assert len(wav) == 1 and wav[0]["media_id"] == 2
    assert wav[0]["est_sample_rate"] == 8000
    assert wav[0]["est_duration_ms"] == 500
    assert wav[0]["rms"] == pytest.approx(1000.0)

    thumbs = multimodal.resize_images(media, 2, 1, fake=False).collect()
    assert len(thumbs) == 1
    w, h, _ = multimodal.decode_bmp(bytes(thumbs[0]["out_bytes"]))
    assert (w, h) == (2, 1)


def make_gif(w: int, h: int, frames: int, delay_cs: int) -> bytes:
    import struct

    b = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80, 0, 0)
    b += b"\x00" * 6  # global color table (size bits 0 -> 2 entries)
    for _ in range(frames):
        b += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        b += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        b += b"\x02"  # LZW min code size
        b += bytes([2, 0x4C, 0x01, 0x00])  # one data sub-block + term
    return b + b"\x3b"


GIF_BYTES = make_gif(4, 3, frames=2, delay_cs=5)


def test_decode_gif_goldens():
    w, h, n, dur = multimodal.decode_gif(GIF_BYTES)
    assert (w, h, n, dur) == (4, 3, 2, 100)  # 2 frames x 50 ms
    with pytest.raises(ValueError, match="not a GIF"):
        multimodal.decode_gif(b"RIFFxxxx")
    with pytest.raises(ValueError, match="no image frames"):
        multimodal.decode_gif(b"GIF89a" + GIF_BYTES[6:13] + b"\x00" * 6 + b"\x3b")


def test_video_features_stub_raises_on_unsupported_container():
    # a truncated EBML head parses as none of the three real containers
    with pytest.raises(NotImplementedError, match="GIF, ISO-BMFF"):
        multimodal.video_features_stub(b"\x1a\x45\xdf\xa3webm-fake")


def test_video_features_real_gif_over_binaryfile(spark, tmp_path):
    from twitch_chat_analyser_spark.sources.files import read_binary_media

    (tmp_path / "anim_7.gif").write_bytes(GIF_BYTES)
    media = read_binary_media(spark, str(tmp_path))
    out = multimodal.video_features(media, fake=False).collect()
    assert len(out) == 1
    r = out[0]
    assert r["media_id"] == 7
    assert (r["width"], r["height"]) == (4, 3)
    assert (r["n_frames"], r["duration_ms"]) == (2, 100)
    assert r["n_bytes"] == len(GIF_BYTES)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-bytes-1", ("image/png", 100, 80, None)),
        (2, "image", b"\x89PNG-fake-bytes-22", ("image/png", 64, 64, None)),
        (3, "video", b"\x00\x00ftyp-fake", ("video/mp4", 640, 480, 3500)),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_stub(b"xx")


def test_decode_features_deterministic(media):
    out = {r["media_id"]: r for r in multimodal.decode_features(media).collect()}
    assert len(out) == 3
    payload = b"\x89PNG-fake-bytes-1"
    h = hashlib.sha256(payload).digest()
    assert out[1]["width"] == 16 + h[0] % 64
    assert out[1]["height"] == 16 + h[1] % 64
    assert out[1]["sha256"] == hashlib.sha256(payload).hexdigest()
    assert out[1]["n_bytes"] == len(payload)
    # run twice -> identical (stateless, content-derived)
    again = {r["media_id"]: r for r in multimodal.decode_features(media).collect()}
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_frame_sample_plan(media):
    out = multimodal.frame_sample_plan(media, every_ms=1000).collect()
    ts = sorted(r["frame_ts_ms"] for r in out)
    assert ts == [0, 1000, 2000, 3000]  # duration 3500 -> frames at 0..3s
    assert all(r["media_id"] == 3 for r in out)


def test_decode_drops_payload_column(media):
    df = multimodal.decode_features(media)
    assert "payload" not in df.columns


def test_resize_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        multimodal.resize_stub(b"xx", 8, 8)


def test_resize_images_shape_and_determinism(media):
    out = {r["media_id"]: r for r in multimodal.resize_images(media, 8, 4).collect()}
    # only images pass through; the video row is filtered out
    assert set(out) == {1, 2}
    for r in out.values():
        assert r["target_w"] == 8 and r["target_h"] == 4
        assert len(r["out_bytes"]) == 8 * 4  # byte budget scales with geometry
        assert hashlib.sha256(bytes(r["out_bytes"])).hexdigest() == r["out_sha256"]
    # deterministic: same input -> identical bytes
    again = {r["media_id"]: r for r in multimodal.resize_images(media, 8, 4).collect()}
    assert bytes(again[1]["out_bytes"]) == bytes(out[1]["out_bytes"])
    # different geometry -> different content
    other = {r["media_id"]: r for r in multimodal.resize_images(media, 4, 4).collect()}
    assert bytes(other[1]["out_bytes"]) != bytes(out[1]["out_bytes"])[:16]


def test_audio_features_stub_and_plumbing(spark):
    rows = [
        (10, "audio", b"RIFF-fake-wav-payload" * 100, ("audio/wav", None, None, 2500)),
        (11, "image", b"\x89PNG-x", ("image/png", 8, 8, None)),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    with pytest.raises(NotImplementedError):
        multimodal.audio_features_stub(b"xx")
    out = multimodal.audio_features(media).collect()
    assert len(out) == 1 and out[0].media_id == 10  # image filtered out
    r = out[0]
    assert r.n_bytes == 2100
    assert r.est_sample_rate in {8000, 16000, 24000, 32000, 40000}
    assert r.est_duration_ms >= 1 and r.rms > 0
    # deterministic
    again = multimodal.audio_features(media).collect()[0]
    assert (again.est_sample_rate, again.est_duration_ms, again.rms) == (
        r.est_sample_rate, r.est_duration_ms, r.rms
    )


def make_png(width, height, rows_px, ctype=2, filters=None):
    """Hand-pack an 8-bit non-interlaced PNG; ``rows_px`` is rows top to
    bottom of per-pixel tuples (or ints for greyscale). ``filters``
    picks the per-row filter type so every unfilter branch is
    exercisable; encoding here is the forward filter, the decoder must
    invert it."""
    import zlib

    ch = {0: 1, 2: 3, 6: 4}[ctype]
    stride = width * ch
    raw_rows = [
        bytes(
            v
            for px in row
            for v in (px if isinstance(px, (tuple, list)) else (px,))
        )
        for row in rows_px
    ]
    prev = bytes(stride)
    out = bytearray()
    for ri, line in enumerate(raw_rows):
        f = filters[ri] if filters else 0
        out.append(f)
        if f == 0:
            enc = line
        elif f == 1:
            enc = bytes(
                (line[i] - (line[i - ch] if i >= ch else 0)) & 0xFF
                for i in range(stride)
            )
        elif f == 2:
            enc = bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
        elif f == 3:
            enc = bytes(
                (line[i] - (((line[i - ch] if i >= ch else 0) + prev[i]) >> 1))
                & 0xFF
                for i in range(stride)
            )
        elif f == 4:
            enc = bytes(
                (
                    line[i]
                    - multimodal._paeth(
                        line[i - ch] if i >= ch else 0,
                        prev[i],
                        prev[i - ch] if i >= ch else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        out += enc
        prev = line

    def chunk(cid, body):
        import zlib as z

        return (
            struct.pack(">I", len(body))
            + cid
            + body
            + struct.pack(">I", z.crc32(cid + body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


PNG_PIXELS = [
    [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    [(5, 15, 25), (200, 100, 0), (255, 255, 255)],
    [(1, 2, 3), (4, 5, 6), (7, 8, 9)],
    [(90, 80, 70), (60, 50, 40), (30, 20, 10)],
    [(128, 128, 128), (0, 0, 0), (255, 0, 255)],
]


def test_decode_png_all_filter_types():
    # one row per PNG filter type 0..4 — every unfilter branch runs
    png = make_png(3, 5, PNG_PIXELS, ctype=2, filters=[0, 1, 2, 3, 4])
    w, h, (mr, mg, mb) = multimodal.decode_png(png)
    assert (w, h) == (3, 5)
    flat = [px for row in PNG_PIXELS for px in row]
    assert mr == pytest.approx(sum(p[0] for p in flat) / 15)
    assert mg == pytest.approx(sum(p[1] for p in flat) / 15)
    assert mb == pytest.approx(sum(p[2] for p in flat) / 15)


def test_decode_png_rgba_ignores_alpha_and_grey_replicates():
    rgba = [[(100, 50, 25, 7), (200, 150, 75, 250)]]
    w, h, (mr, mg, mb) = multimodal.decode_png(make_png(2, 1, rgba, ctype=6))
    assert (w, h, mr, mg, mb) == (2, 1, 150.0, 100.0, 50.0)
    grey = [[10, 30], [50, 70]]
    w, h, means = multimodal.decode_png(make_png(2, 2, grey, ctype=0))
    assert means == (40.0, 40.0, 40.0)


def test_decode_image_stub_routes_png():
    png = make_png(3, 5, PNG_PIXELS, ctype=2, filters=[4, 3, 2, 1, 0])
    w, h, means = multimodal.decode_image_stub(png, fake=False)
    assert (w, h) == (3, 5)
    # same image, filter-0 only: identical pixels, identical means
    assert means == multimodal.decode_png(make_png(3, 5, PNG_PIXELS))[2]


def test_decode_png_rejects_unsupported():
    import zlib

    # 16-bit depth is out of scope -> stub raises NotImplementedError
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)

    def chunk(cid, body):
        return (
            struct.pack(">I", len(body))
            + cid
            + body
            + struct.pack(">I", zlib.crc32(cid + body))
        )

    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_stub(bad, fake=False)


# ---------------------------------------------------------------------------
# Baseline JPEG codec (operators/jpegcodec.py): the decoder reads all
# tables from the stream, so encode->decode round trips exercise the
# full marker/Huffman/dequant/IDCT pipeline on real compressed data.
# ---------------------------------------------------------------------------


def _jpeg_mod():
    np = pytest.importorskip("numpy")
    from twitch_chat_analyser_spark.operators import jpegcodec

    return np, jpegcodec


def test_jpeg_flat_color_round_trips_exactly():
    np, J = _jpeg_mod()
    px = np.zeros((24, 17, 3), np.uint8)
    px[:, :, 0], px[:, :, 1], px[:, :, 2] = 200, 100, 50
    out = J.decode_jpeg_pixels(J.encode_jpeg(px, quality=90))
    assert out.shape == (24, 17, 3)
    # flat blocks quantize to all-zero AC exactly; only YCbCr rounding
    assert int(np.abs(out.astype(int) - px.astype(int)).max()) <= 2


@pytest.mark.parametrize("subsampling", ["444", "420"])
@pytest.mark.parametrize("restart_interval", [0, 2])
def test_jpeg_gradient_round_trip_all_paths(subsampling, restart_interval):
    """Every decoder path: 1x1 and 2x2 sampling (chroma upsample),
    with and without DRI/RSTn predictor resets."""
    np, J = _jpeg_mod()
    h, w = 37, 45  # non-multiples of the MCU size on purpose
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.dstack(
        [xx * 255 // (w - 1), yy * 255 // (h - 1), (xx * yy) % 256]
    ).astype(np.uint8)
    data = J.encode_jpeg(
        px, quality=92, subsampling=subsampling,
        restart_interval=restart_interval,
    )
    out = J.decode_jpeg_pixels(data)
    assert out.shape == (h, w, 3)
    lum_err = np.abs(
        out[:, :, 0].astype(int) - px[:, :, 0].astype(int)
    ).mean()
    assert lum_err < 8.0


def test_jpeg_decoder_rejects_progressive_and_garbage():
    np, J = _jpeg_mod()
    with pytest.raises(ValueError):
        J.decode_jpeg_pixels(b"\x89PNG\r\n")
    # minimal SOI + progressive SOF2 header
    prog = b"\xff\xd8\xff\xc2" + struct.pack(
        ">HBHHB", 11, 8, 8, 8, 1
    ) + b"\x01\x11\x00"
    with pytest.raises(ValueError):
        J.decode_jpeg_pixels(prog + b"\xff\xd9")


def test_decode_image_stub_routes_jpeg():
    np, J = _jpeg_mod()
    px = np.zeros((16, 16, 3), np.uint8)
    px[:8, :, 0] = 255  # top half red
    data = J.encode_jpeg(px, quality=95)
    w, h, (mr, mg, mb) = multimodal.decode_image_stub(data, fake=False)
    assert (w, h) == (16, 16)
    assert mr == pytest.approx(127.5, abs=3)
    assert mg == pytest.approx(0.0, abs=3) and mb == pytest.approx(0.0, abs=3)


def test_jpeg_end_to_end_over_binaryfile(spark, tmp_path):
    """Real compressed-image decode + resize through the distributed
    mapInPandas stages over binaryFile ingest."""
    np, J = _jpeg_mod()
    from twitch_chat_analyser_spark.sources.files import read_binary_media

    px = np.zeros((32, 48, 3), np.uint8)
    px[:, :24, 1] = 210  # left half green
    (tmp_path / "photo_7.jpg").write_bytes(
        J.encode_jpeg(px, quality=90, subsampling="420", restart_interval=2)
    )
    media = read_binary_media(spark, str(tmp_path))

    feats = multimodal.decode_features(media, fake=False).collect()
    assert len(feats) == 1 and feats[0]["media_id"] == 7
    assert (feats[0]["width"], feats[0]["height"]) == (48, 32)
    assert feats[0]["mean_g"] == pytest.approx(105.0, abs=4)

    thumbs = multimodal.resize_images(media, 12, 8, fake=False).collect()
    assert len(thumbs) == 1
    out = J.decode_jpeg_pixels(bytes(thumbs[0]["out_bytes"]))
    assert out.shape == (8, 12, 3)
    # left half still green, right half still dark after resize
    assert out[:, :6, 1].mean() > 150 and out[:, 6:, 1].mean() < 40


# ---------------------------------------------------------------------------
# MP3 frame walk + MP4 (ISO-BMFF) box walk: container/frame metadata is
# REAL stdlib parsing; only the codec payload stays un-decoded.
# ---------------------------------------------------------------------------


def make_mp3(n_frames: int, with_id3: bool = True) -> bytes:
    """MPEG1 Layer III, 128 kbps, 44100 Hz, no padding: each frame is
    144*128000//44100 = 417 bytes (header + zero payload)."""
    frame = b"\xff\xfb\x90\x00" + b"\x00" * (417 - 4)
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10 if with_id3 else b""
    return id3 + frame * n_frames + b"TAG" + b"\x00" * 125


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def make_mp4(w: int, h: int, n_samples: int, timescale: int, duration: int) -> bytes:
    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration) + b"\x00" * 80,
    )
    tkhd = _box(
        b"tkhd",
        b"\x00\x00\x00\x07" + b"\x00" * 20 + b"\x00" * 52
        + struct.pack(">II", w << 16, h << 16),
    )
    stsz = _box(b"stsz", b"\x00\x00\x00\x00" + struct.pack(">II", 0, n_samples))
    stbl = _box(b"stbl", stsz)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov + _box(b"mdat", b"\x00" * 32)


def test_parse_mp3_frames_real():
    rate, dur_ms, rms = multimodal.parse_mp3(make_mp3(10))
    assert rate == 44100
    assert dur_ms == 10 * 1152 * 1000 // 44100  # 261 ms
    assert rms is None


def test_parse_mp3_without_id3_and_rejects_garbage():
    rate, dur_ms, _ = multimodal.parse_mp3(make_mp3(3, with_id3=False))
    assert (rate, dur_ms) == (44100, 3 * 1152 * 1000 // 44100)
    with pytest.raises(ValueError):
        multimodal.parse_mp3(b"RIFF1234WAVE")


def test_parse_mp4_box_walk_real():
    payload = make_mp4(w=640, h=360, n_samples=48, timescale=600, duration=1200)
    w, h, n, dur = multimodal.parse_mp4(payload)
    assert (w, h, n, dur) == (640, 360, 48, 2000)


def test_parse_mp4_rejects_non_bmff_and_no_video_track():
    with pytest.raises(ValueError):
        multimodal.parse_mp4(b"GIF89a" + b"\x00" * 20)
    # moov present but no trak with nonzero dims
    no_video = _box(b"ftyp", b"isom\x00\x00\x02\x00") + _box(
        b"moov",
        _box(
            b"mvhd",
            b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, 600, 600)
            + b"\x00" * 80,
        ),
    )
    with pytest.raises(ValueError):
        multimodal.parse_mp4(no_video)


def test_audio_video_stubs_route_compressed_containers():
    assert multimodal.audio_features_stub(make_mp3(5))[0] == 44100
    assert multimodal.video_features_stub(make_mp4(320, 240, 10, 1000, 500)) == (
        320, 240, 10, 500,
    )


def test_mp3_mp4_end_to_end_over_binaryfile(spark, tmp_path):
    from twitch_chat_analyser_spark.sources.files import read_binary_media

    (tmp_path / "song_3.mp3").write_bytes(make_mp3(20))
    (tmp_path / "clip_4.mp4").write_bytes(make_mp4(1280, 720, 90, 90000, 270000))
    media = read_binary_media(spark, str(tmp_path))

    audio = multimodal.audio_features(media, fake=False).collect()
    assert len(audio) == 1 and audio[0]["media_id"] == 3
    assert audio[0]["est_sample_rate"] == 44100
    assert audio[0]["est_duration_ms"] == 20 * 1152 * 1000 // 44100
    assert audio[0]["rms"] is None  # codec decode honestly absent

    video = multimodal.video_features(media, fake=False).collect()
    assert len(video) == 1 and video[0]["media_id"] == 4
    assert (video[0]["width"], video[0]["height"]) == (1280, 720)
    assert video[0]["n_frames"] == 90
    assert video[0]["duration_ms"] == 3000


def test_jpeg_grayscale_round_trip_promotes_to_rgb():
    """1-component scan: the decoder's grayscale branch replicates Y
    into RGB; flat gray is exact, gradients within a count."""
    np, J = _jpeg_mod()
    yy, xx = np.mgrid[0:21, 0:30]
    g = ((xx * 8 + yy * 3) % 256).astype(np.uint8)
    out = J.decode_jpeg_pixels(J.encode_jpeg(g, quality=95))
    assert out.shape == (21, 30, 3)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).mean() < 2.0
    flat = np.full((10, 13), 77, np.uint8)
    of = J.decode_jpeg_pixels(J.encode_jpeg(flat, 90))
    assert int(np.abs(of[:, :, 0].astype(int) - 77).max()) <= 1


def test_parse_mp3_trailing_garbage_keeps_prefix():
    """Mid-stream bytes that carry the 0xFFEx sync pattern but invalid
    header fields (reserved version/layer, bad bitrate index) behave
    like lost sync — the already-parsed prefix is returned, not
    discarded (ADVICE r04)."""
    base = make_mp3(4, with_id3=False)[: 4 * 417]
    want = 4 * 1152 * 1000 // 44100
    # reserved version bits (0xFFEA -> ver_bits == 1)
    assert multimodal.parse_mp3(base + b"\xff\xea\x00\x00")[1] == want
    # invalid bitrate index (0xF)
    assert multimodal.parse_mp3(base + b"\xff\xfb\xf0\x00")[1] == want
    # before any frame the same headers still reject the payload
    with pytest.raises(ValueError):
        multimodal.parse_mp3(b"\xff\xea\x00\x00" + b"\x00" * 500)


def test_parse_mp3_truncated_final_frame_not_credited():
    """A final frame whose header fits but whose body is cut short must
    not contribute its full sample count (ADVICE r04)."""
    base = make_mp3(4, with_id3=False)[: 4 * 417]
    truncated = base + b"\xff\xfb\x90\x00" + b"\x00" * 10  # 417-byte frame cut
    assert multimodal.parse_mp3(truncated)[1] == 4 * 1152 * 1000 // 44100
    # a payload that is ONLY a truncated frame has no complete frame
    with pytest.raises(ValueError):
        multimodal.parse_mp3(b"\xff\xfb\x90\x00" + b"\x00" * 10)


def test_parse_mp4_sibling_scan_and_per_track_frame_reset():
    """find() must keep scanning later siblings when the first matching
    box's subtree lacks the target, and n_frames must reset per video
    track (ADVICE r04)."""
    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
        + struct.pack(">II", 600, 1200) + b"\x00" * 80,
    )
    tkhd = _box(
        b"tkhd",
        b"\x00\x00\x00\x07" + b"\x00" * 20 + b"\x00" * 52
        + struct.pack(">II", 640 << 16, 360 << 16),
    )
    stsz = _box(b"stsz", b"\x00\x00\x00\x00" + struct.pack(">II", 0, 48))
    real_mdia = _box(b"mdia", _box(b"minf", _box(b"stbl", stsz)))
    # decoy mdia BEFORE the real one: its subtree has no minf at all
    decoy_mdia = _box(b"mdia", _box(b"free", b"\x00" * 4))
    trak = _box(b"trak", tkhd + decoy_mdia + real_mdia)
    moov = _box(b"moov", mvhd + trak)
    payload = _box(b"ftyp", b"isom\x00\x00\x02\x00") + moov
    assert multimodal.parse_mp4(payload) == (640, 360, 48, 2000)

    # second video track WITHOUT stsz: dims come from it, n_frames must
    # be 0, not the previous track's 48
    tkhd2 = _box(
        b"tkhd",
        b"\x00\x00\x00\x07" + b"\x00" * 20 + b"\x00" * 52
        + struct.pack(">II", 320 << 16, 240 << 16),
    )
    trak2 = _box(b"trak", tkhd2)
    moov2 = _box(b"moov", mvhd + trak + trak2)
    payload2 = _box(b"ftyp", b"isom\x00\x00\x02\x00") + moov2
    assert multimodal.parse_mp4(payload2) == (320, 240, 0, 2000)


def test_jpeg_grayscale_decode_unbiased():
    """Grayscale decode rounds like the color path: flat fields across
    the value range show no systematic downward bias (truncation would
    sit near -0.5; ADVICE r04)."""
    np, J = _jpeg_mod()
    errs = []
    for v in range(10, 250, 24):
        flat = np.full((16, 16), v, np.uint8)
        out = J.decode_jpeg_pixels(J.encode_jpeg(flat, quality=95))
        errs.append(float(out[:, :, 0].astype(float).mean()) - v)
    bias = sum(errs) / len(errs)
    assert abs(bias) < 0.2, f"grayscale decode bias {bias:+.3f}"


def test_jpeg_progressive_decodes_identically_to_baseline():
    """SOF2 decode (T.81 Annex G): the progressive scan script transmits
    the SAME quantized coefficients as the baseline encoder (DC+AC first
    passes at Al=1, refinement to Al=0, EOB runs, luma spectral split),
    so progressive decode must be BIT-IDENTICAL to baseline decode of
    the same pixels — any drift means a scan path is wrong."""
    np, J = _jpeg_mod()
    yy, xx = np.mgrid[0:37, 0:53]
    grad = np.dstack(
        [(xx * 7) % 256, (yy * 5) % 256, ((xx + yy) * 3) % 256]
    ).astype(np.uint8)
    noise = (np.arange(64 * 64 * 3).reshape(64, 64, 3) * 2654435761 % 256
             ).astype(np.uint8)
    cases = [
        (grad, 90, "444"),
        (grad, 90, "420"),          # padded Y blocks in the MCU grid
        (grad, 50, "420"),
        (np.full((40, 40, 3), (120, 30, 200), np.uint8), 95, "444"),  # EOBruns
        (noise, 85, "444"),         # dense AC: ZRL + refinement churn
        (grad[:5, :7], 90, "444"),  # single partial MCU
    ]
    for px, q, sub in cases:
        prog = J.encode_jpeg_progressive(px, quality=q, subsampling=sub)
        assert b"\xff\xc2" in prog[:200]  # really SOF2
        out = J.decode_jpeg_pixels(prog)
        base = J.decode_jpeg_pixels(J.encode_jpeg(px, quality=q, subsampling=sub))
        assert np.array_equal(out, base), (q, sub, px.shape)


def test_jpeg_progressive_grayscale_round_trip():
    np, J = _jpeg_mod()
    yy, xx = np.mgrid[0:21, 0:30]
    g = ((xx * 11 + yy * 3) % 256).astype(np.uint8)
    out = J.decode_jpeg_pixels(J.encode_jpeg_progressive(g, quality=92))
    base = J.decode_jpeg_pixels(J.encode_jpeg(g, quality=92))
    assert np.array_equal(out, base)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).mean() < 2.0


def test_jpeg_progressive_end_to_end_over_binaryfile(spark, tmp_path):
    """Progressive files flow through the same distributed decode and
    resize stages as baseline ones — the web-crawl image path."""
    np, J = _jpeg_mod()
    from twitch_chat_analyser_spark.sources.files import read_binary_media

    px = np.zeros((32, 48, 3), np.uint8)
    px[:, 24:, 2] = 220  # right half blue
    (tmp_path / "photo_9.jpg").write_bytes(
        J.encode_jpeg_progressive(px, quality=90, subsampling="420")
    )
    media = read_binary_media(spark, str(tmp_path))
    feats = multimodal.decode_features(media, fake=False).collect()
    assert len(feats) == 1 and feats[0]["media_id"] == 9
    assert (feats[0]["width"], feats[0]["height"]) == (48, 32)
    assert feats[0]["mean_b"] == pytest.approx(110.0, abs=5)

    thumbs = multimodal.resize_images(media, 12, 8, fake=False).collect()
    out = J.decode_jpeg_pixels(bytes(thumbs[0]["out_bytes"]))
    assert out.shape == (8, 12, 3)
    assert out[:, 6:, 2].mean() > 150 and out[:, :6, 2].mean() < 40


# --------------------------------------------------------------------------
# Perceptual fingerprints: pixel-level decoders, DCT pHash, mel features,
# and the banded-Hamming near-dup join over fingerprint columns.
# --------------------------------------------------------------------------


def _np():
    import numpy as np

    return np


def _bmp_from_px(px) -> bytes:
    """Pack an HxWx3 RGB uint8 array as a bottom-up 24-bpp BMP using the
    existing make_bmp fixture (storage rows bottom-first, BGR)."""
    rows = [
        [(int(p[2]), int(p[1]), int(p[0])) for p in row] for row in px[::-1]
    ]
    return make_bmp(px.shape[1], px.shape[0], rows)


def _test_image(kind: str = "gradient", w: int = 64, h: int = 48):
    """Deterministic structured test images (no RNG)."""
    np = _np()
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "gradient":
        r = (xx * 255 // max(1, w - 1)).astype(np.uint8)
        g = (yy * 255 // max(1, h - 1)).astype(np.uint8)
        b = ((xx + yy) % 256).astype(np.uint8)
        px = np.dstack([r, g, b])
        px[h // 4 : h // 2, w // 4 : w // 2] = (240, 30, 30)
    else:  # checker
        c = (((xx // 8) + (yy // 8)) % 2 * 255).astype(np.uint8)
        px = np.dstack([c, 255 - c, c // 2])
        px[: h // 3, 2 * w // 3 :] = (10, 200, 240)
    return px


def test_decode_bmp_pixels_exact():
    np = _np()
    px = multimodal.decode_bmp_pixels(BMP_BYTES)
    assert px.shape == (2, 4, 3)
    # storage row 0 is the BOTTOM row; decode returns top-down RGB
    assert tuple(px[1, 0]) == (30, 20, 10)
    assert tuple(px[0, 0]) == (255, 0, 0)
    src = _test_image("gradient", 31, 17)  # odd width exercises row pad
    assert np.array_equal(multimodal.decode_bmp_pixels(_bmp_from_px(src)), src)


def test_decode_png_pixels_exact_and_means_match():
    np = _np()
    png = make_png(3, 5, PNG_PIXELS, ctype=2, filters=[0, 1, 2, 3, 4])
    px = multimodal.decode_png_pixels(png)
    assert np.array_equal(px, np.array(PNG_PIXELS, dtype=np.uint8))
    w, h, means = multimodal.decode_png(png)
    flat = [p for row in PNG_PIXELS for p in row]
    assert means[0] == pytest.approx(sum(p[0] for p in flat) / 15)
    # greyscale replicates, RGBA drops alpha
    grey = multimodal.decode_png_pixels(make_png(2, 2, [[10, 30], [50, 70]], ctype=0))
    assert grey.shape == (2, 2, 3) and tuple(grey[0, 1]) == (30, 30, 30)
    rgba = multimodal.decode_png_pixels(
        make_png(2, 1, [[(100, 50, 25, 7), (200, 150, 75, 250)]], ctype=6)
    )
    assert rgba.shape == (1, 2, 3) and tuple(rgba[0, 0]) == (100, 50, 25)


def test_decode_image_pixels_routes_all_formats():
    np = _np()
    src = _test_image("gradient", 40, 24)
    for payload in (
        _bmp_from_px(src),
        make_png(3, 5, PNG_PIXELS, ctype=2),
    ):
        px = multimodal.decode_image_pixels(payload)
        assert px.dtype == np.uint8 and px.ndim == 3
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_pixels(b"RIFF....WEBP")


def test_phash64_brightness_shift_is_exact_noop():
    """DC carries global brightness and is excluded from the hash, and
    area resample + DCT are linear — a constant shift changes ONLY the
    DC coefficient, so the hash must be bit-identical."""
    np = _np()
    base = _test_image("gradient").astype(np.int16)
    base = np.clip(base, 40, 200).astype(np.uint8)  # headroom for +25
    h0 = multimodal.phash64(base)
    h1 = multimodal.phash64((base.astype(np.int16) + 25).astype(np.uint8))
    assert h0 == h1


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_reencode_close_distinct_far():
    """pHash survives JPEG re-encode at aggressive quality (small
    Hamming) while structurally different images land far apart."""
    np, J = _jpeg_mod()
    base = _test_image("gradient")
    h_ref = multimodal.phash64(base)
    h_q95 = multimodal.phash64(J.decode_jpeg_pixels(J.encode_jpeg(base, quality=95)))
    h_q40 = multimodal.phash64(J.decode_jpeg_pixels(J.encode_jpeg(base, quality=40)))
    h_other = multimodal.phash64(_test_image("checker"))
    assert _hamming(h_ref, h_q95) <= 4
    assert _hamming(h_ref, h_q40) <= 8
    assert _hamming(h_ref, h_other) >= 16


def test_phash_pairs_banded_join(spark):
    """64-bit banded-Hamming pairing: near pair found at exact distance,
    far ids absent, negative (bit-63) hashes handled."""
    h1 = 0x0123456789ABCDEF
    h2 = h1 ^ 0b101  # hamming 2
    h3 = -(1 << 63) + 12345  # bit 63 set -> negative long
    h4 = h3 ^ (1 << 62)  # hamming 1, still negative domain
    far = 0x00FF00FF00FF00FF
    df = spark.createDataFrame(
        [(1, h1), (2, h2), (3, h3), (4, h4), (5, far)],
        "media_id long, phash long",
    )
    got = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in multimodal.phash_pairs(df, max_hamming=7).collect()
    }
    assert got == {(1, 2): 2, (3, 4): 1}


def test_image_phash_cross_format_near_dup_e2e(spark, tmp_path):
    """The multimodal near-dup story end-to-end: the SAME picture stored
    as BMP and as JPEG is found as a pair by the banded join over real
    decoded pHashes; an unrelated image pairs with neither."""
    np, J = _jpeg_mod()
    from twitch_chat_analyser_spark.sources.files import read_binary_media

    base = _test_image("gradient")
    (tmp_path / "img_1.bmp").write_bytes(_bmp_from_px(base))
    (tmp_path / "img_2.jpg").write_bytes(J.encode_jpeg(base, quality=90))
    (tmp_path / "img_3.bmp").write_bytes(_bmp_from_px(_test_image("checker")))
    media = read_binary_media(spark, str(tmp_path))
    hashes = multimodal.image_phash(media, fake=False)
    pairs = multimodal.phash_pairs(hashes, max_hamming=7).collect()
    assert [(r["media_a"], r["media_b"]) for r in pairs] == [(1, 2)]

    # a GIF carrying the same picture's luma joins the near-dup set
    # when video kinds are fingerprinted too (first-frame decode)
    gray = (0.299 * base[:, :, 0] + 0.587 * base[:, :, 1]
            + 0.114 * base[:, :, 2]).round().astype(np.uint8)
    (tmp_path / "anim_4.gif").write_bytes(make_gif_gray(gray))
    media = read_binary_media(spark, str(tmp_path))
    hashes = multimodal.image_phash(
        media, fake=False, kinds=("image", "video")
    )
    got = {(r["media_a"], r["media_b"])
           for r in multimodal.phash_pairs(hashes, max_hamming=7).collect()}
    assert (1, 4) in got and (2, 4) in got and (1, 2) in got
    assert not any(3 in p for p in got)


def test_image_phash_fake_plumbing(spark):
    df = spark.createDataFrame(
        [(1, "image", b"not an image"), (2, "audio", b"x")],
        "media_id long, kind string, payload binary",
    )
    rows = multimodal.image_phash(df, fake=True).collect()
    assert len(rows) == 1 and rows[0]["media_id"] == 1
    again = multimodal.image_phash(df, fake=True).collect()
    assert rows[0]["phash"] == again[0]["phash"]


def _sine_wav(freq: float, rate: int = 8000, secs: float = 1.0, amp: float = 0.5):
    np = _np()
    t = np.arange(int(rate * secs)) / rate
    return make_wav(rate, [int(amp * 32000 * s) for s in np.sin(2 * np.pi * freq * t)])


def test_decode_wav_samples_and_mel_peak_band():
    """A pure 440 Hz tone's energy must land in the mel band whose
    filter covers 440 Hz — the spectrogram is real DSP, not a stub."""
    np = _np()
    rate, mono = multimodal.decode_wav_samples(_sine_wav(440.0))
    assert rate == 8000 and abs(len(mono) - 8000) <= 1
    assert float(np.abs(mono).max()) <= 1.0
    mels = multimodal.mel_spectrogram(mono, rate, 1024, 512, 32)
    mean_mel = mels.mean(axis=0)
    fb = multimodal._mel_filterbank(32, 1024, rate)
    bin440 = round(440.0 * 1024 / rate)
    assert int(mean_mel.argmax()) == int(fb[:, bin440].argmax())


def test_audio_mel_features_e2e(spark, tmp_path):
    from twitch_chat_analyser_spark.sources.files import read_binary_media

    (tmp_path / "clip_7.wav").write_bytes(_sine_wav(440.0))
    media = read_binary_media(spark, str(tmp_path))
    rows = multimodal.audio_mel_features(media, fake=False).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["sample_rate"] == 8000 and r["n_frames"] >= 14
    assert len(r["mel_mean"]) == 32
    assert r["spectral_centroid_hz"] == pytest.approx(440.0, abs=15.0)


def test_audio_phash_amplitude_invariant_near_dup():
    """Median-rule audio fingerprint: half-amplitude copy hashes nearly
    identically; a different tone lands far."""
    rate, loud = multimodal.decode_wav_samples(_sine_wav(440.0, amp=0.6))
    _, quiet = multimodal.decode_wav_samples(_sine_wav(440.0, amp=0.3))
    _, other = multimodal.decode_wav_samples(_sine_wav(1800.0, amp=0.6))
    h_loud = multimodal.audio_phash64(loud, rate)
    h_quiet = multimodal.audio_phash64(quiet, rate)
    h_other = multimodal.audio_phash64(other, rate)
    assert _hamming(h_loud, h_quiet) <= 4
    assert _hamming(h_loud, h_other) >= 16


def test_audio_phash_pairs_e2e(spark, tmp_path):
    from twitch_chat_analyser_spark.sources.files import read_binary_media

    (tmp_path / "clip_1.wav").write_bytes(_sine_wav(440.0, amp=0.6))
    (tmp_path / "clip_2.wav").write_bytes(_sine_wav(440.0, amp=0.3))
    (tmp_path / "clip_3.wav").write_bytes(_sine_wav(1800.0, amp=0.6))
    media = read_binary_media(spark, str(tmp_path))
    hashes = multimodal.audio_phash(media, fake=False)
    pairs = multimodal.phash_pairs(hashes, max_hamming=7).collect()
    assert [(r["media_a"], r["media_b"]) for r in pairs] == [(1, 2)]


# --------------------------------------------------------------------------
# Adam7 PNG + GIF LZW pixel decode (real formats de-gated this round)
# --------------------------------------------------------------------------


def make_png_adam7(width, height, rows_px, ctype=2):
    """Hand-pack an Adam7-interlaced 8-bit PNG: pixels split into the
    seven passes, each pass filtered independently (filter 0)."""
    import zlib

    ch = {0: 1, 2: 3, 6: 4}[ctype]
    out = bytearray()
    for x0, y0, dx, dy in multimodal._ADAM7:
        ys = range(y0, height, dy)
        xs = range(x0, width, dx)
        if not ys or not xs:
            continue
        for y in ys:
            out.append(0)  # filter type None
            for x in xs:
                px = rows_px[y][x]
                out += bytes(px if isinstance(px, (tuple, list)) else (px,))

    def chunk(cid, body):
        import zlib as z

        return (
            struct.pack(">I", len(body)) + cid + body
            + struct.pack(">I", z.crc32(cid + body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 1)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out))) + chunk(b"IEND", b"")
    )


def test_decode_png_adam7_matches_linear():
    """Interlaced and linear encodings of the same image decode to
    identical pixels — odd dimensions exercise empty/ragged passes."""
    np = _np()
    src = _test_image("gradient", 13, 9)  # odd dims: ragged Adam7 passes
    rows = [[tuple(int(v) for v in p) for p in row] for row in src]
    linear = multimodal.decode_png_pixels(make_png(13, 9, rows))
    inter = multimodal.decode_png_pixels(make_png_adam7(13, 9, rows))
    assert np.array_equal(inter, linear) and np.array_equal(linear, src)
    # 1x1: six of seven passes are empty
    one = multimodal.decode_png_pixels(make_png_adam7(1, 1, [[(9, 8, 7)]]))
    assert tuple(one[0, 0]) == (9, 8, 7)


def _lzw_uncompressed(indices, min_code=8):
    """GIF LZW 'uncompressed' emission: literal codes with a CLEAR every
    254 symbols so the code width never grows past min_code+1."""
    clear = 1 << min_code
    end = clear + 1
    code_size = min_code + 1
    acc = bits = 0
    out = bytearray()

    def emit(code):
        nonlocal acc, bits
        acc |= code << bits
        bits += code_size
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    count = 0
    for idx in indices:
        emit(int(idx))
        count += 1
        if count == clear - 2:
            emit(clear)
            count = 0
    emit(end)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def make_gif_gray(idx_rows, interlace=False) -> bytes:
    """Pack a single-frame GIF with a 256-level grayscale palette from a
    2-D array of palette indices (== gray levels)."""
    np = _np()
    arr = np.asarray(idx_rows, dtype=np.uint8)
    h, w = arr.shape
    hdr = b"GIF89a" + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    palette = bytes(v for i in range(256) for v in (i, i, i))
    if interlace:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        storage = arr[order]
    else:
        storage = arr
    desc = b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h,
                                 0x40 if interlace else 0)
    lzw = _lzw_uncompressed(storage.flatten().tolist())
    blocks = bytearray([8])  # LZW minimum code size
    for i in range(0, len(lzw), 255):
        part = lzw[i : i + 255]
        blocks.append(len(part))
        blocks += part
    blocks.append(0)
    return hdr + palette + desc + bytes(blocks) + b"\x3B"


def test_decode_gif_pixels_lzw_real():
    np = _np()
    yy, xx = np.mgrid[0:23, 0:37]
    idx = ((xx * 7 + yy * 13) % 256).astype(np.uint8)
    px = multimodal.decode_gif_pixels(make_gif_gray(idx))
    assert px.shape == (23, 37, 3)
    assert np.array_equal(px[:, :, 0], idx)
    assert np.array_equal(px[:, :, 1], idx)


def test_decode_gif_pixels_interlaced_matches_linear():
    np = _np()
    yy, xx = np.mgrid[0:23, 0:37]
    idx = ((xx * 5 + yy * 11) % 256).astype(np.uint8)
    lin = multimodal.decode_gif_pixels(make_gif_gray(idx))
    inter = multimodal.decode_gif_pixels(make_gif_gray(idx, interlace=True))
    assert np.array_equal(lin, inter)


def test_decode_gif_pixels_real_compression_via_fixture():
    """The make_gif fixture (used for container metadata tests) carries a
    real 2-color frame; the LZW path must decode it too."""
    np = _np()
    gif = make_gif(4, 3, 1, 10)
    px = multimodal.decode_gif_pixels(gif)
    assert px.shape == (3, 4, 3)


def test_gif_routes_through_decode_image_pixels_and_phash():
    """A GIF, a BMP, and a JPEG of the SAME image hash within pairing
    distance of each other — the cross-format near-dup contract now
    covers all pixel-decodable formats."""
    np, J = _jpeg_mod()
    src = _test_image("gradient", 64, 48)
    gray = (0.299 * src[:, :, 0] + 0.587 * src[:, :, 1]
            + 0.114 * src[:, :, 2]).round().astype(np.uint8)
    gray3 = np.repeat(gray[:, :, None], 3, axis=2)
    h_gif = multimodal.phash64(
        multimodal.decode_image_pixels(make_gif_gray(gray)))
    h_bmp = multimodal.phash64(
        multimodal.decode_image_pixels(_bmp_from_px(gray3)))
    h_jpg = multimodal.phash64(
        multimodal.decode_image_pixels(J.encode_jpeg(gray3, quality=92)))
    assert _hamming(h_gif, h_bmp) == 0  # identical luma -> identical hash
    assert _hamming(h_gif, h_jpg) <= 6


def test_encode_png_round_trips_and_resize_png():
    np = _np()
    src = _test_image("gradient", 20, 14)
    png = multimodal.encode_png(src)
    assert np.array_equal(multimodal.decode_png_pixels(png), src)
    out = multimodal.resize_png(png, 10, 7)
    px = multimodal.decode_png_pixels(out)
    rows = (np.arange(7) * 14) // 7
    cols = (np.arange(10) * 20) // 10
    assert np.array_equal(px, src[rows][:, cols])
    # an Adam7 source resizes to the same pixels
    rows_px = [[tuple(int(v) for v in p) for p in row] for row in src]
    out2 = multimodal.resize_png(make_png_adam7(20, 14, rows_px), 10, 7)
    assert np.array_equal(multimodal.decode_png_pixels(out2), px)
    # the resize entry point routes PNG to the real kernel
    assert multimodal.resize_stub(png, 10, 7) == out
    with pytest.raises(ValueError):
        multimodal.encode_png(_np().zeros((3, 3), dtype="uint8"))


def test_encode_gif_round_trips_exact_palette():
    np = _np()
    src = _test_image("checker", 24, 16)  # few distinct colors
    out = multimodal.decode_gif_pixels(multimodal.encode_gif(src))
    assert np.array_equal(out, src)


def test_encode_gif_332_quantization_when_palette_overflows():
    np = _np()
    yy, xx = np.mgrid[0:32, 0:32]
    src = np.dstack([
        (xx * 8 % 256), (yy * 8 % 256), ((xx + yy) * 4 % 256)
    ]).astype(np.uint8)  # > 256 distinct colors
    out = multimodal.decode_gif_pixels(multimodal.encode_gif(src))
    assert out.shape == src.shape
    # 3-3-2 quantization error bounds: r/g within ceil(255/7)=37, b within 85
    diff = np.abs(out.astype(int) - src.astype(int))
    assert diff[:, :, 0].max() <= 37 and diff[:, :, 1].max() <= 37
    assert diff[:, :, 2].max() <= 85


def test_resize_gif_format_preserving():
    np = _np()
    src = _test_image("gradient", 40, 20)
    gif = multimodal.encode_gif(src)  # >256 colors -> 3-3-2 quantized
    out = multimodal.resize_gif(gif, 10, 5)
    px = multimodal.decode_gif_pixels(out)
    rows = (np.arange(5) * 20) // 5
    cols = (np.arange(10) * 40) // 10
    # nearest-neighbor over the DECODED first frame; the 50-color
    # thumbnail re-encodes with an exact palette -> exact pixels
    expect = multimodal.decode_gif_pixels(gif)[rows][:, cols]
    assert np.array_equal(px, expect)
    # entry point routes GIF to the real kernel
    assert multimodal.resize_stub(gif, 10, 5) == out


# --------------------------------------------------------------------------
# Property-based fuzz: codec round-trips and banding pigeonhole
# --------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    w=st.integers(1, 24), h=st.integers(1, 24),
    seed=st.integers(0, 2**32 - 1), interlace=st.booleans(),
)
def test_gif_roundtrip_fuzz(w, h, seed, interlace):
    """Any grayscale index frame round-trips the GIF encoder/decoder
    bit-exactly, linear or interlaced, at any tiny geometry."""
    np = _np()
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    out = multimodal.decode_gif_pixels(make_gif_gray(idx, interlace=interlace))
    assert np.array_equal(out[:, :, 0], idx)
    # package encoder too (exact palette path)
    px = np.repeat(idx[:, :, None], 3, axis=2)
    assert np.array_equal(
        multimodal.decode_gif_pixels(multimodal.encode_gif(px)), px
    )


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    w=st.integers(1, 20), h=st.integers(1, 20),
    seed=st.integers(0, 2**32 - 1),
    ctype=st.sampled_from([0, 2, 6]),
)
def test_png_adam7_equals_linear_fuzz(w, h, seed, ctype):
    """Adam7 and linear encodings of the same random image decode to
    identical pixels for every geometry and color type."""
    np = _np()
    rng = np.random.default_rng(seed)
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    if ch == 1:
        rows = [[int(raw[y, x, 0]) for x in range(w)] for y in range(h)]
    else:
        rows = [[tuple(int(v) for v in raw[y, x]) for x in range(w)]
                for y in range(h)]
    lin = multimodal.decode_png_pixels(make_png(w, h, rows, ctype=ctype))
    inter = multimodal.decode_png_pixels(
        make_png_adam7(w, h, rows, ctype=ctype)
    )
    assert _np().array_equal(lin, inter)


@settings(max_examples=200, deadline=None)
@given(
    base=st.integers(-(2**63), 2**63 - 1),
    flips=st.sets(st.integers(0, 63), max_size=7),
)
def test_band_blocks_pigeonhole_fuzz(base, flips):
    """For ANY 64-bit pair within Hamming distance 7, at least one of
    the eight 8-bit blocks agrees exactly — the guarantee phash_pairs'
    equi-join correctness rests on (masked arithmetic-shift semantics
    included, i.e. negative hashes band correctly)."""
    from twitch_chat_analyser_spark.operators.dedup import simhash_blocks

    other = base
    for b in flips:
        other ^= 1 << b
    # two's-complement wrap into signed-long domain (Spark LongType)
    if other >= 2**63:
        other -= 2**64
    agree = 0
    for off, width in simhash_blocks(64, 7):
        mask = (1 << width) - 1
        if (base >> off) & mask == (other >> off) & mask:
            agree += 1
    assert agree >= 1


# --------------------------------------------------------------------------
# Matroska/WebM EBML parse
# --------------------------------------------------------------------------


def test_parse_webm_dims_frames_duration():
    payload = multimodal.build_webm(640, 360, 12, 4500, audio_blocks=7)
    w, h, n, dur = multimodal.parse_webm(payload)
    assert (w, h) == (640, 360)
    # only the VIDEO track's blocks count as frames
    assert n == 12
    assert dur == 4500


def test_parse_webm_routes_through_video_features_stub():
    payload = multimodal.build_webm(320, 240, 3, 1000)
    assert multimodal.video_features_stub(payload) == (320, 240, 3, 1000)
    # GIF/MP4 payloads still route to their own parsers
    with pytest.raises(NotImplementedError):
        multimodal.video_features_stub(b"\x00" * 64)


def test_parse_webm_rejects_non_matroska_doctype():
    payload = bytearray(multimodal.build_webm(64, 64, 1, 100))
    at = bytes(payload).find(b"webm")
    payload[at : at + 4] = b"aaaa"
    with pytest.raises(ValueError):
        multimodal.parse_webm(bytes(payload))


def test_parse_webm_unknown_size_segment():
    # rewrite the Segment size as the 1-byte unknown marker (0xFF) and
    # confirm the walk still terminates at end-of-payload
    full = multimodal.build_webm(128, 96, 2, 640)
    seg_id = (0x18538067).to_bytes(4, "big")
    at = full.find(seg_id)
    assert at >= 0
    size_len = 1
    b0 = full[at + 4]
    mask = 0x80
    while not (b0 & mask):
        size_len += 1
        mask >>= 1
    patched = full[: at + 4] + b"\xff" + full[at + 4 + size_len :]
    assert multimodal.parse_webm(patched) == (128, 96, 2, 640)


def test_video_features_e2e_webm_over_binaryfile(spark, tmp_path):
    from twitch_chat_analyser_spark.sources.files import read_binary_media

    (tmp_path / "clip_5.webm").write_bytes(
        multimodal.build_webm(426, 240, 24, 960)
    )
    media = read_binary_media(spark, str(tmp_path))
    rows = multimodal.video_features(media, fake=False).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["width"], r["height"], r["n_frames"], r["duration_ms"]) == (
        426, 240, 24, 960,
    )


# --------------------------------------------------------------------------
# FLAC decode end-to-end
# --------------------------------------------------------------------------


def _sine_i16(freq: float, rate: int = 8000, secs: float = 1.0, amp: float = 0.5):
    np = _np()
    t = np.arange(int(rate * secs))
    return (np.sin(2 * np.pi * freq * t / rate) * amp * 32767).astype(np.int16)


def test_flac_roundtrip_lossless_all_stereo_modes():
    np = _np()
    from twitch_chat_analyser_spark.operators import flaccodec as fc

    sig = _sine_i16(440.0)
    st = np.stack([sig, (sig * 0.5).astype(np.int16)], axis=1)
    expect = st.mean(axis=1) / 32768.0
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        payload = fc.encode_flac(st, 8000, block_size=1024, stereo_mode=mode)
        rate, mono = fc.decode_flac_samples(payload)
        assert rate == 8000
        assert float(np.abs(mono - expect).max()) == 0.0
    # predictive coding actually compresses the tone
    assert len(fc.encode_flac(sig, 8000)) < sig.nbytes


def test_flac_crc_corruption_raises():
    from twitch_chat_analyser_spark.operators import flaccodec as fc

    payload = bytearray(fc.encode_flac(_sine_i16(440.0), 8000))
    payload[-10] ^= 0x55  # flip a bit inside the final frame body
    with pytest.raises(ValueError):
        fc.decode_flac_samples(bytes(payload))


def test_flac_metadata_parse_and_audio_features_chain():
    from twitch_chat_analyser_spark.operators import flaccodec as fc

    payload = fc.encode_flac(_sine_i16(440.0, secs=0.5), 8000)
    rate, dur, rms = fc.parse_flac(payload)
    assert rate == 8000 and dur == 500 and rms is None
    # the features chain takes the FULL-decode branch: real RMS
    rate, dur, rms = multimodal.audio_features_stub(payload)
    assert rate == 8000 and dur == 500
    assert rms == pytest.approx(0.5 * 32767 / (2 ** 0.5), rel=0.01)


def test_flac_feeds_mel_and_fingerprint_paths(spark, tmp_path):
    from twitch_chat_analyser_spark.operators import flaccodec as fc
    from twitch_chat_analyser_spark.sources.files import read_binary_media

    (tmp_path / "clip_1.flac").write_bytes(
        fc.encode_flac(_sine_i16(440.0, amp=0.6), 8000)
    )
    (tmp_path / "clip_2.wav").write_bytes(_sine_wav(440.0, amp=0.3))
    (tmp_path / "clip_3.flac").write_bytes(
        fc.encode_flac(_sine_i16(1800.0, amp=0.6), 8000)
    )
    media = read_binary_media(spark, str(tmp_path))
    mels = {r["media_id"]: r for r in
            multimodal.audio_mel_features(media, fake=False).collect()}
    assert mels[1]["spectral_centroid_hz"] == pytest.approx(440.0, abs=15.0)
    # cross-format near-dup: FLAC tone vs quieter WAV of the same tone
    hashes = multimodal.audio_phash(media, fake=False)
    pairs = multimodal.phash_pairs(hashes, max_hamming=7).collect()
    assert [(r["media_a"], r["media_b"]) for r in pairs] == [(1, 2)]


def test_on_error_skip_quarantines_bad_payloads(spark):
    """Review r10: at 100 TB one corrupt file must not kill the stage.
    on_error='skip' drops the failing row (real-decode mode), the
    default still raises, and an all-skipped batch yields a schema-
    correct empty frame."""
    rows = [
        (1, "image", BMP_BYTES, ("image/bmp", None, None, None)),
        (2, "image", b"not an image at all", ("image/bmp", None, None, None)),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)

    out = multimodal.decode_features(media, fake=False, on_error="skip").collect()
    assert [r["media_id"] for r in out] == [1]
    assert (out[0]["width"], out[0]["height"]) == (4, 2)

    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError)):
        multimodal.decode_features(media, fake=False).collect()

    # every row bad -> empty result with the full schema intact
    bad = spark.createDataFrame([rows[1]], multimodal.MEDIA_SCHEMA)
    empty = multimodal.decode_features(bad, fake=False, on_error="skip")
    assert empty.count() == 0
    assert empty.columns == [
        "media_id", "kind", "n_bytes", "sha256",
        "width", "height", "mean_r", "mean_g", "mean_b",
    ]

    resized = multimodal.resize_images(
        media, 2, 1, fake=False, on_error="skip"
    ).collect()
    assert [r["media_id"] for r in resized] == [1]

    audio_rows = [
        (10, "audio", WAV_BYTES, ("audio/wav", None, None, None)),
        (11, "audio", b"\xff\x00garbage", ("audio/wav", None, None, None)),
    ]
    audio = spark.createDataFrame(audio_rows, multimodal.MEDIA_SCHEMA)
    got = multimodal.audio_features(audio, fake=False, on_error="skip").collect()
    assert [r["media_id"] for r in got] == [10]

    video_rows = [
        (20, "video", b"GIF89a-not-really", ("video/gif", None, None, None)),
    ]
    video = spark.createDataFrame(video_rows, multimodal.MEDIA_SCHEMA)
    assert (
        multimodal.video_features(video, fake=False, on_error="skip").count()
        == 0
    )

    with pytest.raises(ValueError, match="on_error"):
        multimodal.decode_features(media, on_error="drop")


def test_on_error_skip_mid_batch_keeps_both_neighbors(spark):
    """r10 verdict task 8: a corrupt payload in the MIDDLE of one Arrow
    batch must quarantine only itself — the rows before AND after it in
    the same batch keep their real decoded values (coalesce(1) pins all
    rows into a single mapInPandas batch)."""
    good = multimodal.build_webm(32, 24, 6, 1000)
    rows = [
        (30, "video", good, ("video/webm", None, None, None)),
        (31, "video", good[:20], ("video/webm", None, None, None)),
        (32, "video", good, ("video/webm", None, None, None)),
    ]
    video = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA).coalesce(1)
    got = sorted(
        multimodal.video_features(video, fake=False, on_error="skip")
        .collect(),
        key=lambda r: r["media_id"],
    )
    assert [r["media_id"] for r in got] == [30, 32]
    for r in got:  # real parse values, not defaults
        assert (r["width"], r["height"], r["n_frames"]) == (32, 24, 6)

    # same mid-batch shape through the image stage
    irows = [
        (40, "image", BMP_BYTES, ("image/bmp", None, None, None)),
        (41, "image", BMP_BYTES[:9], ("image/bmp", None, None, None)),
        (42, "image", BMP_BYTES, ("image/bmp", None, None, None)),
    ]
    imgs = spark.createDataFrame(irows, multimodal.MEDIA_SCHEMA).coalesce(1)
    got_i = sorted(
        multimodal.decode_features(imgs, fake=False, on_error="skip")
        .collect(),
        key=lambda r: r["media_id"],
    )
    assert [r["media_id"] for r in got_i] == [40, 42]
    assert all((r["width"], r["height"]) == (4, 2) for r in got_i)


def test_decoders_are_valueerror_disciplined_on_corrupt_bytes():
    """Round-10 fuzz regression: the dispatchers catch ValueError ONLY,
    so every decode entry point must convert low-level parse errors
    (IndexError/KeyError/zlib.error/struct.error/ZeroDivisionError —
    all five classes escaped before disciplined_decoder) on truncated,
    bit-flipped, and random-after-magic payloads, and a corrupt LZW
    minimum code size must fail fast instead of sizing a 2^157-entry
    table."""
    import random
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    from twitch_chat_analyser_spark.operators import flaccodec as fc
    from twitch_chat_analyser_spark.operators.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
    )

    def make_png():
        w, h = 5, 3
        raw = b"".join(
            b"\x00" + bytes((x * 3 + c) % 256 for x in range(w) for c in range(3))
            for _ in range(h)
        )
        ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

        def chunk(t, d):
            return (
                _struct.pack(">I", len(d))
                + t + d
                + _struct.pack(">I", _zlib.crc32(t + d) & 0xFFFFFFFF)
            )

        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    from twitch_chat_analyser_spark.operators.jpegcodec import (
        encode_jpeg_progressive,
    )

    px16 = ((np.arange(16 * 16 * 3).reshape(16, 16, 3) * 3) % 256).astype(
        np.uint8
    )
    stereo = list(
        zip(
            [((i * 53) % 3000) - 1500 for i in range(300)],
            [((i * 31) % 3000) - 1500 for i in range(300)],
        )
    )
    valids = [
        BMP_BYTES,
        WAV_BYTES,
        make_png(),
        encode_jpeg(np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)),
        encode_jpeg_progressive(px16),
        fc.encode_flac([((i * 37) % 2000) - 1000 for i in range(400)], 8000),
        fc.encode_flac(stereo, 8000),
        multimodal.encode_gif(
            np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3) // 4
        ),
        # r10 verdict task 8: the container/parse formats were only ever
        # fuzzed with OTHER formats' corrupted payloads (magic-mismatch
        # fast path) — mutate THEIR OWN valid payloads too
        make_mp3(6),
        make_mp3(3, with_id3=False),
        make_mp4(64, 48, 24, 1000, 2000),
        multimodal.build_webm(64, 48, 12, 1500, audio_blocks=4),
    ]
    decoders = [
        multimodal.decode_bmp, multimodal.decode_bmp_pixels,
        multimodal.decode_png, multimodal.decode_png_pixels,
        multimodal.decode_wav, multimodal.parse_mp3,
        multimodal.decode_gif, multimodal.decode_gif_pixels,
        multimodal.parse_mp4, multimodal.parse_webm,
        decode_jpeg, fc.decode_flac,
    ]
    rng = random.Random(7)
    cases = []
    for v in valids:
        for _ in range(25):
            cases.append(v[: rng.randrange(0, len(v) + 1)])
            b = bytearray(v)
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            cases.append(bytes(b))
    # the exact mutation that used to hang (LZW min code size 0x9d)
    cases.append(bytes.fromhex(
        "474946383961040004008300000000000001010101020202020303030304"
        "040404050505050606060607070707080808"
    ))
    # a hang is as much a contract escape as a wrong exception type
    # (the round-10 sweep's LZW 2^157-entry table was a HANG, not a
    # raise): alarm-guard every decode call like the sweep harness did
    import signal

    def _on_alarm(signum, frame):
        raise AssertionError("decoder hang: fuzz case exceeded alarm")

    old_handler = signal.signal(signal.SIGALRM, _on_alarm)
    try:
        for payload in cases:
            for dec in decoders:
                signal.alarm(5)
                try:
                    dec(payload)
                except (ValueError, NotImplementedError):
                    pass  # the disciplined contract
                finally:
                    signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old_handler)
    # reaching here means no other exception type escaped

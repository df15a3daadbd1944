"""Multimodal column plumbing (SURVEY.md §7.5).

Media items are opaque ``binary`` columns + a typed metadata struct —
the pattern for image/audio/video at 100 TB: the engine never interprets
bytes with built-ins; decode/feature-extract runs in Arrow-batched
``mapInPandas`` stages so bytes stream through Python in columnar
batches without per-row serde.

The decode step is REAL for every format a stdlib+numpy parser can
cover — uncompressed 24-bpp BMP (``decode_bmp``, ``resize_bmp``),
8-bit non-interlaced PNG (``decode_png``), baseline sequential AND
progressive JPEG including 4:2:0 chroma and restart markers
(``jpegcodec``: full Huffman + dequant + IDCT decoder with the Annex-G
progressive scan kinds, AND deterministic baseline/progressive
encoders, so tests round-trip through real compressed streams), 16-bit
PCM WAV (``decode_wav``), and GIF container parse — all exercised
end-to-end over the ``binaryFile`` ingest in tests. Formats that
genuinely need a codec library absent from this container (WebP, MP3,
MP4 codecs) stay gated: ``fake=True`` produces a deterministic fake decode
(dimensions + channel means derived from the byte content) so the
Spark-side plumbing — schema, batch shape, partitioning — stays fully
exercised regardless of codec availability.

Scale notes: binary payloads dominate row width — keep them OUT of
shuffles: extract features first (map-side ``mapInPandas``), then
aggregate/join on the small feature output. ``media_table`` carries
payload + metadata in one row; a production layout splits payload into
its own content-addressed table to keep metadata scans cheap.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "width int, height int, mean_r double, mean_g double, mean_b double"
)


def binary_metadata(docs: DataFrame) -> DataFrame:
    """Typed-metadata extraction over a binary column, built-ins only
    (no Python in the plan): byte length + content hash. Uses the
    documents table's text encoded to bytes as the stand-in payload.

    -> doc_id, n_bytes, content_hash, lang, source
    """
    return docs.select(
        "doc_id",
        F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
        F.md5("text").alias("content_hash"),
        "lang",
        "source",
    )


def _bmp_header(payload: bytes):
    """Parse + validate the BMP headers we support (BITMAPINFOHEADER,
    uncompressed 24-bpp). Returns (data_offset, width, height,
    bottom_up, row_stride)."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header version")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if width <= 0 or height == 0:
        raise ValueError("degenerate BMP dimensions")
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bpp BMP is supported")
    row_stride = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    bottom_up = height > 0
    height = abs(height)
    if data_off + row_stride * height > len(payload):
        raise ValueError("truncated BMP pixel data")
    return data_off, width, height, bottom_up, row_stride


def decode_bmp(payload: bytes):
    """REAL stdlib image decode: uncompressed 24-bpp BMP -> dimensions +
    per-channel means. BMP stores pixels as BGR triples in 4-byte-padded
    rows; orientation doesn't affect channel means.

    -> width, height, (mean_r, mean_g, mean_b)
    """
    data_off, width, height, _, row_stride = _bmp_header(payload)
    sum_b = sum_g = sum_r = 0
    for row in range(height):
        base = data_off + row * row_stride
        rowbytes = payload[base : base + width * 3]
        sum_b += sum(rowbytes[0::3])
        sum_g += sum(rowbytes[1::3])
        sum_r += sum(rowbytes[2::3])
    n = width * height
    return width, height, (sum_r / n, sum_g / n, sum_b / n)


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes):
    """REAL stdlib image decode: non-interlaced 8-bit greyscale / RGB /
    RGBA PNG -> dimensions + per-channel means. Pure ``zlib`` +
    ``struct``: chunk walk (IHDR/IDAT*/IEND), inflate, then scanline
    unfiltering with the full filter set (None/Sub/Up/Average/Paeth).
    Alpha is ignored for the means; greyscale replicates into all three
    channels.

    -> width, height, (mean_r, mean_g, mean_b)
    """
    import struct
    import zlib

    if len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        size, cid = struct.unpack_from(">I4s", payload, pos)
        if cid == b"IHDR":
            ihdr = payload[pos + 8 : pos + 8 + size]
        elif cid == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + size]
        elif cid == b"IEND":
            break
        pos += 12 + size  # length + type + body + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13]
    )
    if w < 1 or h < 1:
        raise ValueError("degenerate PNG dimensions")
    if depth != 8 or ctype not in (0, 2, 6) or comp or filt or interlace:
        raise ValueError(
            "only 8-bit non-interlaced greyscale/RGB/RGBA PNG is supported"
        )
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    prev = bytearray(stride)
    sums = [0] * ch
    at = 0
    for _ in range(h):
        ftype = raw[at]
        line = bytearray(raw[at + 1 : at + 1 + stride])
        at += 1 + stride
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        for k in range(ch):
            sums[k] += sum(line[k::ch])
        prev = line
    n = w * h
    if ch == 1:
        means = (sums[0] / n,) * 3
    else:
        means = (sums[0] / n, sums[1] / n, sums[2] / n)
    return w, h, means


def decode_image_stub(payload: bytes, fake: bool = False):
    """Image decode entry point: REAL parsers when the payload is a
    supported format — ``decode_bmp`` (uncompressed 24-bpp BMP),
    ``decode_png`` (8-bit non-interlaced PNG), and
    ``jpegcodec.decode_jpeg`` (baseline sequential + progressive
    JPEG, any chroma sampling, restart markers) — all stdlib+numpy, no
    imaging libs. Formats outside those profiles (interlaced PNG,
    WebP, ...) would need an imaging library absent from this
    container; for those, ``fake=True`` derives deterministic
    pseudo-properties from the bytes so plumbing tests have stable
    expectations."""
    if not fake:
        from .jpegcodec import decode_jpeg

        errs = []
        for dec in (decode_bmp, decode_png, decode_jpeg):
            try:
                return dec(payload)
            except ValueError as exc:
                errs.append(str(exc))
        raise NotImplementedError(
            "real decode covers uncompressed 24-bpp BMP, 8-bit "
            "non-interlaced PNG, and baseline/progressive JPEG "
            f"({'; '.join(errs)}); other formats need an imaging library "
            "not present in this environment; pass fake=True for the "
            "deterministic stub"
        )
    h = hashlib.sha256(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    means = tuple(float(h[i]) for i in (2, 3, 4))
    return width, height, means


def decode_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched decode/feature-extract stage: ``mapInPandas`` so each
    Python worker sees columnar batches of (id, payload) — the real-decode
    integration point. Deterministic fake decode by default (see module
    docstring).

    -> DECODED_SCHEMA rows, payloads dropped (features only leave the stage)
    """
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                w, h, (mr, mg, mb) = decode_image_stub(payload, fake=fake)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "n_bytes": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "width": w,
                        "height": h,
                        "mean_r": mr,
                        "mean_g": mg,
                        "mean_b": mb,
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "kind", "payload").mapInPandas(
        extract, schema=DECODED_SCHEMA
    )


AUDIO_SCHEMA = (
    "media_id long, n_bytes long, est_sample_rate int, est_duration_ms long, "
    "rms double"
)


def decode_wav(payload: bytes):
    """REAL stdlib audio decode: RIFF/WAVE 16-bit PCM -> sample rate,
    duration, signal RMS. Chunk-walks the RIFF container (``fmt `` +
    ``data``, odd-size chunks pad one byte) with ``struct``/``array``.

    -> sample_rate, duration_ms, rms
    """
    import array
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or len(fmt) < 16 or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_fmt != 1 or bits != 16 or channels < 1 or rate < 1:
        raise ValueError("only 16-bit PCM WAV with a positive rate is supported")
    samples = array.array("h")
    samples.frombytes(data[: len(data) // 2 * 2])
    n_frames = len(samples) // channels
    duration_ms = n_frames * 1000 // rate
    rms = (sum(s * s for s in samples) / max(1, len(samples))) ** 0.5
    return rate, duration_ms, rms


# MPEG audio frame-header tables (ISO 11172-3 / 13818-3): bitrate kbps
# by (version-group, layer, index) and sample rate by (version, index).
_MP3_BITRATES = {
    # MPEG1: layer I, II, III
    ("v1", 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
                384, 416, 448],
    ("v1", 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
                320, 384],
    ("v1", 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                256, 320],
    # MPEG2/2.5: layer I and layers II+III
    ("v2", 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
                224, 256],
    ("v2", 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                160],
    ("v2", 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                160],
}
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
              0: [11025, 12000, 8000]}  # header version bits -> rates


def parse_mp3(payload: bytes):
    """REAL stdlib MPEG-audio frame walk (no codec decode): skips an
    ID3v2 tag, then steps frame headers — sync, version, layer, bitrate
    and sample-rate indices give each frame's byte length and sample
    count, so sample rate and total duration come out exactly; the
    waveform itself stays un-decoded (needs a codec library), so the
    ``rms`` slot is None.

    -> sample_rate, duration_ms, None
    """
    import struct

    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        sz = payload[6:10]
        pos = 10 + ((sz[0] << 21) | (sz[1] << 14) | (sz[2] << 7) | sz[3])
    if pos + 4 > len(payload) or payload[pos] != 0xFF or (
        payload[pos + 1] & 0xE0
    ) != 0xE0:
        raise ValueError("not an MPEG audio payload (no frame sync)")
    total_samples = 0
    rate = None
    n_frames = 0
    while pos + 4 <= len(payload):
        if payload[pos : pos + 3] == b"TAG":  # ID3v1 trailer
            break
        (hdr,) = struct.unpack_from(">I", payload, pos)
        if (hdr >> 21) & 0x7FF != 0x7FF:
            break  # lost sync: stop at the last full frame
        ver_bits = (hdr >> 19) & 0x3
        layer_bits = (hdr >> 17) & 0x3
        if ver_bits == 1 or layer_bits == 0:
            # before any frame: not MPEG audio at all. Mid-stream:
            # trailing garbage that happens to start 0xFFEx — same
            # handling as lost sync, keep the parsed prefix
            if n_frames:
                break
            raise ValueError("reserved MPEG version/layer bits")
        layer = 4 - layer_bits  # 3->I, 2->II, 1->III
        br_idx = (hdr >> 12) & 0xF
        sr_idx = (hdr >> 10) & 0x3
        padding = (hdr >> 9) & 0x1
        if br_idx in (0, 15) or sr_idx == 3:
            if n_frames:
                break
            raise ValueError("free-form/invalid bitrate or sample rate")
        vgroup = "v1" if ver_bits == 3 else "v2"
        bitrate = _MP3_BITRATES[(vgroup, layer)][br_idx] * 1000
        srate = _MP3_RATES[ver_bits][sr_idx]
        if layer == 1:
            frame_len = (12 * bitrate // srate + padding) * 4
            samples = 384
        else:
            if layer == 3 and ver_bits != 3:  # MPEG2/2.5 layer III
                frame_len = 72 * bitrate // srate + padding
                samples = 576
            else:
                frame_len = 144 * bitrate // srate + padding
                samples = 1152
        if pos + frame_len > len(payload):
            break  # header fits but the frame body is truncated —
            # don't credit samples the payload doesn't carry
        if rate is None:
            rate = srate
        total_samples += samples
        n_frames += 1
        pos += frame_len
    if n_frames == 0 or rate is None:
        raise ValueError("no complete MPEG audio frame")
    return rate, total_samples * 1000 // rate, None


def audio_features_stub(payload: bytes, fake: bool = False):
    """Audio entry point: REAL stdlib parsers when the payload is a
    supported format — ``decode_wav`` (16-bit PCM: rate/duration/RMS)
    or ``parse_mp3`` (MPEG frame walk: rate/duration exact, RMS None —
    waveform decode needs a codec library); for anything else,
    ``fake=True`` derives deterministic pseudo-features from the
    bytes."""
    if not fake:
        errs = []
        for dec in (decode_wav, parse_mp3):
            try:
                return dec(payload)
            except ValueError as exc:
                errs.append(str(exc))
        raise NotImplementedError(
            "real parse covers 16-bit PCM WAV and MPEG audio frame "
            f"headers ({'; '.join(errs)}); other formats need an audio "
            "library not present in this environment; pass fake=True for "
            "the deterministic stub"
        )
    rate = 8000 + (hashlib.sha256(payload).digest()[0] % 5) * 8000
    duration_ms = max(1, len(payload) * 1000 // (rate * 2))
    rms = (sum(b * b for b in payload) / max(1, len(payload))) ** 0.5
    return rate, duration_ms, rms


def audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched audio feature extraction (same plumbing pattern as
    :func:`decode_features`): features only leave the stage.

    -> AUDIO_SCHEMA rows
    """
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                rate, dur, rms = audio_features_stub(payload, fake=fake)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "n_bytes": len(payload),
                        "est_sample_rate": rate,
                        "est_duration_ms": dur,
                        "rms": rms,
                    }
                )
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "payload"
    ).mapInPandas(extract, schema=AUDIO_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, kind string, target_w int, target_h int, "
    "out_bytes binary, out_sha256 string"
)


VIDEO_SCHEMA = (
    "media_id long, n_bytes long, width int, height int, n_frames int, "
    "duration_ms long"
)


def decode_gif(payload: bytes):
    """REAL stdlib video-container parse: GIF87a/89a block walk with
    ``struct`` — logical screen dims, frame count, and total animation
    duration from the Graphic Control Extension delays. The LZW pixel
    data is NOT decompressed (sub-blocks are length-prefixed and
    skipped), so this is a metadata-rate parse: bytes are scanned once,
    which is exactly what a 100 TB container-inspection pass wants.

    -> width, height, n_frames, duration_ms
    """
    import struct

    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    width, height, packed = struct.unpack_from("<HHB", payload, 6)
    pos = 13
    if packed & 0x80:  # global color table
        pos += 3 * (2 << (packed & 0x07))

    def skip_subblocks(p: int) -> int:
        while p < len(payload):
            n = payload[p]
            p += 1
            if n == 0:
                return p
            p += n
        raise ValueError("truncated GIF sub-blocks")

    n_frames = 0
    duration_ms = 0
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[pos]
            pos += 1
            if label == 0xF9 and pos + 5 <= len(payload):
                # GCE sub-block: size(4), packed, delay u16le (1/100 s)
                delay = struct.unpack_from("<H", payload, pos + 2)[0]
                duration_ms += delay * 10
            pos = skip_subblocks(pos)
        elif b == 0x2C:  # image descriptor
            if pos + 9 > len(payload):
                raise ValueError("truncated GIF image descriptor")
            ipacked = payload[pos + 8]
            pos += 9
            if ipacked & 0x80:  # local color table
                pos += 3 * (2 << (ipacked & 0x07))
            pos += 1  # LZW minimum code size
            pos = skip_subblocks(pos)
            n_frames += 1
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    if n_frames == 0:
        raise ValueError("GIF with no image frames")
    return width, height, n_frames, duration_ms


def parse_mp4(payload: bytes):
    """REAL stdlib ISO-BMFF (MP4/MOV) box walk — container metadata
    without any codec: presentation duration from ``moov/mvhd``
    (timescale + duration), frame dimensions from the video track's
    ``tkhd`` (16.16 fixed point), frame count from that track's
    ``stbl/stsz`` sample count. Codec payload (``mdat``) is never
    touched.

    -> width, height, n_frames, duration_ms
    """
    import struct

    def boxes(data: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack_from(">I", data, pos)
            btype = data[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize
                (size,) = struct.unpack_from(">Q", data, pos + 8)
                body = pos + 16
            elif size == 0:  # box extends to end
                size = end - pos
            if size < 8 or pos + size > end:
                raise ValueError("malformed ISO-BMFF box size")
            yield btype, body, pos + size
            pos += size

    def find(data, start, end, path: list[bytes]):
        for btype, body, bend in boxes(data, start, end):
            if btype == path[0]:
                if len(path) == 1:
                    return body, bend
                hit = find(data, body, bend, path[1:])
                if hit is not None:
                    return hit
                # keep scanning later siblings of the same type — a trak
                # may carry a leading box whose subtree lacks the target
        return None

    top = list(boxes(payload, 0, len(payload)))
    if not top or top[0][0] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (missing ftyp)")
    moov = next(((b, e) for t, b, e in top if t == b"moov"), None)
    if moov is None:
        raise ValueError("ISO-BMFF payload without moov")
    mvhd = find(payload, moov[0], moov[1], [b"mvhd"])
    if mvhd is None:
        raise ValueError("moov without mvhd")
    version = payload[mvhd[0]]
    if version == 1:
        timescale, duration = struct.unpack_from(
            ">IQ", payload, mvhd[0] + 4 + 16
        )
    else:
        timescale, duration = struct.unpack_from(
            ">II", payload, mvhd[0] + 4 + 8
        )
    if timescale == 0:
        raise ValueError("mvhd timescale of zero")
    duration_ms = duration * 1000 // timescale
    width = height = n_frames = 0
    for btype, body, bend in boxes(payload, moov[0], moov[1]):
        if btype != b"trak":
            continue
        tkhd = find(payload, body, bend, [b"tkhd"])
        if tkhd is None:
            continue
        tver = payload[tkhd[0]]
        geo_off = tkhd[0] + 4 + (32 if tver == 1 else 20) + 52
        w_fx, h_fx = struct.unpack_from(">II", payload, geo_off)
        if w_fx == 0 or h_fx == 0:
            continue  # audio/hint track
        width, height = w_fx >> 16, h_fx >> 16
        n_frames = 0  # per-track: a later video track without stsz must
        # not inherit the previous track's sample count
        stsz = find(
            payload, body, bend,
            [b"mdia", b"minf", b"stbl", b"stsz"],
        )
        if stsz is not None:
            n_frames = struct.unpack_from(">I", payload, stsz[0] + 8)[0]
    if width == 0:
        raise ValueError("ISO-BMFF payload without a video track")
    return width, height, n_frames, duration_ms


def video_features_stub(payload: bytes, fake: bool = False):
    """Video container entry point: REAL stdlib parsers when the
    payload is a supported container — :func:`decode_gif` (block walk)
    or :func:`parse_mp4` (ISO-BMFF box walk: mvhd duration, tkhd dims,
    stsz frame count; codec data untouched); webm or codec-level decode
    need a media library absent from this container — for those,
    ``fake=True`` derives deterministic pseudo-features."""
    if not fake:
        errs = []
        for dec in (decode_gif, parse_mp4):
            try:
                return dec(payload)
            except ValueError as exc:
                errs.append(str(exc))
        raise NotImplementedError(
            "real parse covers GIF and ISO-BMFF (MP4/MOV) containers "
            f"({'; '.join(errs)}); webm/codec decode need a media library "
            "not present in this environment; pass fake=True for the "
            "deterministic stub"
        )
    h = hashlib.sha256(payload).digest()
    width = 160 + h[0] % 64
    height = 90 + h[1] % 64
    n_frames = 1 + h[2] % 120
    return width, height, n_frames, n_frames * 40  # 25 fps pseudo-clock


def video_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched video-container inspection (same plumbing pattern
    as :func:`decode_features` / :func:`audio_features`): features only
    leave the stage.

    -> VIDEO_SCHEMA rows
    """
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                w, h, n, dur = video_features_stub(payload, fake=fake)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "n_bytes": len(payload),
                        "width": w,
                        "height": h,
                        "n_frames": n,
                        "duration_ms": dur,
                    }
                )
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload"
    ).mapInPandas(extract, schema=VIDEO_SCHEMA)


def resize_bmp(payload: bytes, target_w: int, target_h: int) -> bytes:
    """REAL stdlib resize kernel: nearest-neighbor resample of an
    uncompressed 24-bpp BMP into a new, valid 24-bpp BMP of the target
    geometry. Works directly in storage order (row mapping is
    orientation-preserving), emits 4-byte-padded rows + fresh headers.
    """
    import struct

    data_off, width, height, bottom_up, row_stride = _bmp_header(payload)
    out_stride = (target_w * 3 + 3) & ~3
    out_rows = bytearray()
    pad = b"\x00" * (out_stride - target_w * 3)
    for ty in range(target_h):
        sy = ty * height // target_h
        base = data_off + sy * row_stride
        for tx in range(target_w):
            sx = tx * width // target_w
            out_rows += payload[base + sx * 3 : base + sx * 3 + 3]
        out_rows += pad
    pixel_bytes = bytes(out_rows)
    # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)
    signed_h = target_h if bottom_up else -target_h
    info = struct.pack(
        "<IiiHHIIiiII", 40, target_w, signed_h, 1, 24, 0,
        len(pixel_bytes), 2835, 2835, 0, 0,
    )
    file_hdr = struct.pack(
        "<2sIHHI", b"BM", 14 + len(info) + len(pixel_bytes), 0, 0,
        14 + len(info),
    )
    return file_hdr + info + pixel_bytes


def resize_stub(payload: bytes, target_w: int, target_h: int, fake: bool = False):
    """Resize entry point: REAL nearest-neighbor kernels when the
    payload is a supported format (``resize_bmp`` for uncompressed
    24-bpp BMP; ``jpegcodec.resize_jpeg`` for baseline JPEG —
    decode -> resize -> re-encode); other formats need an imaging
    library absent from this container — for those, ``fake=True``
    produces a deterministic pseudo-thumbnail: sha256(payload||dims)
    repeated to target_w*target_h bytes — stable content whose SIZE
    scales with the target geometry, so batch-shape and byte-budget
    tests are real."""
    if not fake:
        from .jpegcodec import resize_jpeg

        errs = []
        for kern in (resize_bmp, resize_jpeg):
            try:
                return kern(payload, target_w, target_h)
            except ValueError as exc:
                errs.append(str(exc))
        raise NotImplementedError(
            "real resize covers uncompressed 24-bpp BMP and baseline "
            f"JPEG ({'; '.join(errs)}); other formats need an imaging "
            "library not present in this environment; pass fake=True for "
            "the deterministic stub"
        )
    seed = hashlib.sha256(payload + f"{target_w}x{target_h}".encode()).digest()
    n = target_w * target_h
    return (seed * (n // len(seed) + 1))[:n]


def resize_images(
    media: DataFrame, target_w: int = 32, target_h: int = 32, fake: bool = True
) -> DataFrame:
    """Arrow-batched resize stage (binary in -> binary out). Unlike
    ``decode_features`` this RETURNS payload-sized data, so at scale the
    stage must run map-side and write straight to the sink — never feed
    resized bytes into a shuffle (module docstring).

    -> RESIZED_SCHEMA rows
    """
    import pandas as pd

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                out = resize_stub(bytes(r["payload"]), target_w, target_h, fake=fake)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "target_w": target_w,
                        "target_h": target_h,
                        "out_bytes": out,
                        "out_sha256": hashlib.sha256(out).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "image").select(
        "media_id", "kind", "payload"
    ).mapInPandas(do_resize, schema=RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each video row into one row
    per target frame timestamp (sequence + explode, JVM-side); the
    actual frame grab would join this plan into a ``mapInPandas`` decode
    keyed by (media_id, frame_ts).

    -> media_id, frame_ts_ms
    """
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )

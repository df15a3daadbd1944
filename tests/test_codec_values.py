"""Codec VALUE-path audit (VERDICT r10 task 3): the r10 fuzz sweep
hardened the decoders' ERROR contract; these tests audit the decoded
VALUES on paths the in-repo fixture encoders never emit, using
hand-built bitstreams constructed from the specs (RFC 9639 for FLAC,
T.81 for JPEG, GIF89a for LZW) — independent ground truth in a sandbox
with no PIL/ffmpeg.

- FLAC: the fixture encoder only emits CONSTANT / FIXED-order-2 /
  VERBATIM subframes with 4-bit Rice at partition order 0, so the
  decoder's FIXED orders 1/3/4, LPC reconstruction, 5-bit Rice
  (method 1), multi-partition residuals, escaped partitions, wasted
  bits, and the uncommon block-size/rate/bps header codes had ZERO
  value coverage.
- GIF: the in-repo LZW encoder emits literal codes only (clears before
  the width ever grows), so dictionary growth 9->12 bits, the KwKwK
  self-reference case, and the 4096-entry cap had no encoder-driven
  exercise; a real dictionary-building compressor lives here instead.
- JPEG: a minimal single-block JPEG is assembled byte-by-byte in the
  test with an all-ones quant table and ONE known AC coefficient, so
  the decoded block must equal the textbook IDCT basis function — a
  consistent transpose in encoder+decoder (invisible to round-trips)
  fails this.
"""

from __future__ import annotations

import math
import random
import struct

import numpy as np
import pytest

from twitch_chat_analyser_spark.operators import flaccodec as fc
from twitch_chat_analyser_spark.operators import multimodal

# ---------------------------------------------------------------------------
# FLAC: hand-built frames per RFC 9639 (the module's bit/CRC plumbing is
# reused; every residual, predictor, and header FIELD VALUE is computed
# here, in the encode direction, so the decoder's reconstruction math is
# exercised on paths the fixture encoder cannot produce)
# ---------------------------------------------------------------------------


def _streaminfo(rate, channels, bps, total, block_size=4096) -> bytes:
    info = bytearray()
    info += struct.pack(">HH", block_size, block_size)
    info += b"\x00\x00\x00" * 2
    packed = (rate << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) | total
    info += packed.to_bytes(8, "big")
    info += b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + bytes(info)


def _write_residual(bw, res, block_size, order, method, porder, escapes):
    bw.write(method, 2)
    bw.write(porder, 4)
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    at = 0
    for p in range(1 << porder):
        n = (block_size >> porder) - (order if p == 0 else 0)
        part = res[at : at + n]
        at += n
        if escapes and p in escapes:
            raw_bits = escapes[p]
            bw.write(escape, param_bits)
            bw.write(raw_bits, 5)
            if raw_bits:
                for r in part:
                    bw.write(r, raw_bits)
            else:
                assert all(r == 0 for r in part), "raw_bits=0 needs zeros"
        else:
            k = fc._best_rice_param(part) if part else 0
            assert k < escape
            bw.write(k, param_bits)
            fc._write_rice(bw, part, k)
    assert at == len(res)


def _w_fixed(samples, bps, order, *, method=0, porder=0, wasted=0,
             escapes=None):
    """FIXED-order subframe writer; residuals computed here from the
    RFC's fixed predictor coefficients."""
    s = [x >> wasted for x in samples]
    coeffs = fc._FIXED_COEFFS[order]

    def write(bw):
        bw.write(0, 1)
        bw.write(8 + order, 6)
        if wasted:
            bw.write(1, 1)
            bw.write(1, wasted)  # unary(wasted-1)
        else:
            bw.write(0, 1)
        ebps = bps - wasted
        for x in s[:order]:
            bw.write(x, ebps)
        res = [
            s[i] - sum(c * s[i - 1 - j] for j, c in enumerate(coeffs))
            for i in range(order, len(s))
        ]
        _write_residual(bw, res, len(s), order, method, porder, escapes)

    return write


def _w_lpc(samples, bps, order, coeffs, shift, precision):
    """LPC subframe writer: residual = s[i] - ((sum c_j * s[i-1-j]) >>
    shift), warm-up samples verbatim."""

    def write(bw):
        bw.write(0, 1)
        bw.write(32 + order - 1, 6)
        bw.write(0, 1)  # no wasted bits
        for x in samples[:order]:
            bw.write(x, bps)
        bw.write(precision - 1, 4)
        bw.write(shift, 5)
        for c in coeffs:
            bw.write(c, precision)
        res = [
            samples[i]
            - (sum(c * samples[i - 1 - j] for j, c in enumerate(coeffs))
               >> shift)
            for i in range(order, len(samples))
        ]
        _write_residual(bw, res, len(samples), order, 0, 0, None)

    return write


def _build_frame(idx, block_size, subframe_writers, *, bs_code=7,
                 rate_code=0, rate=None, bps_code=4, ch_code=None) -> bytes:
    bw = fc._BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)
    bw.write(0, 1)  # fixed-blocksize stream
    bw.write(bs_code, 4)
    bw.write(rate_code, 4)
    bw.write(len(subframe_writers) - 1 if ch_code is None else ch_code, 4)
    bw.write(bps_code, 3)
    bw.write(0, 1)
    fc._write_coded_number(bw, idx)
    if bs_code == 6:
        bw.write(block_size - 1, 8)
    elif bs_code == 7:
        bw.write(block_size - 1, 16)
    if rate_code == 12:
        bw.write(rate // 1000, 8)
    elif rate_code == 13:
        bw.write(rate, 16)
    elif rate_code == 14:
        bw.write(rate // 10, 16)
    bw.align()
    hdr = bw.bytes()
    body = fc._BitWriter()
    for b in hdr:
        body.write(b, 8)
    body.write(fc._crc8(hdr), 8)
    for wfn in subframe_writers:
        wfn(body)
    body.align()
    framed = body.bytes()
    return framed + fc._crc16(framed).to_bytes(2, "big")


def _decode_mono_ints(payload, rate, bps=16):
    got_rate, mono = fc.decode_flac_samples(payload)
    assert got_rate == rate
    return [int(round(x * (1 << (bps - 1)))) for x in mono]


def _smooth(n, seed=1, amp=1200):
    """A smooth-ish int16 signal (keeps high-order residuals small)."""
    rng = random.Random(seed)
    out, v = [], 0
    for _ in range(n):
        v = max(-amp, min(amp, v + rng.randint(-9, 9)))
        out.append(v)
    return out


def test_flac_fixed_order_1_hand_computed_micro_case():
    """Order-1 predictor: pred = previous sample. samples [10, 13, 9]
    -> warm-up [10], residuals [3, -4]; the decoder must reconstruct
    exactly (hand-checkable end to end)."""
    samples = [10, 13, 9]
    frame = _build_frame(0, 3, [_w_fixed(samples, 16, 1)])
    payload = _streaminfo(8000, 1, 16, 3) + frame
    assert _decode_mono_ints(payload, 8000) == samples


@pytest.mark.parametrize("order", [0, 1, 3, 4])
def test_flac_fixed_orders_reconstruct_exactly(order):
    """FIXED orders 0/1/3/4 — the fixture encoder only ever emits
    order 2, so these reconstruction paths had no value coverage."""
    samples = _smooth(192, seed=order + 2)
    frame = _build_frame(0, 192, [_w_fixed(samples, 16, order)],
                         bs_code=1)  # also pins bs_code 1 == 192
    payload = _streaminfo(8000, 1, 16, 192, block_size=192) + frame
    assert _decode_mono_ints(payload, 8000) == samples


def test_flac_lpc_reconstruction_exact():
    """LPC subframe: order-3 quantized coefficients with a right-shift;
    the decoder's (acc >> shift) integer floor must mirror the encode
    direction exactly (arithmetic shift on negative accumulators)."""
    samples = _smooth(256, seed=9)
    coeffs, shift, precision = [26, -14, 4], 4, 12
    frame = _build_frame(
        0, 256, [_w_lpc(samples, 16, 3, coeffs, shift, precision)]
    )
    payload = _streaminfo(8000, 1, 16, 256, block_size=256) + frame
    assert _decode_mono_ints(payload, 8000) == samples


def test_flac_rice_method1_multi_partition():
    """Residual method 1 (5-bit Rice params) at partition order 2 —
    four partitions, the first short by the predictor order."""
    samples = _smooth(256, seed=5)
    frame = _build_frame(
        0, 256, [_w_fixed(samples, 16, 2, method=1, porder=2)]
    )
    payload = _streaminfo(8000, 1, 16, 256, block_size=256) + frame
    assert _decode_mono_ints(payload, 8000) == samples


def test_flac_escaped_partitions_including_zero_bits():
    """Escaped (verbatim) Rice partitions: partition 1 raw at 9 bits,
    partition 2 raw_bits=0 (all-zero shorthand), others Rice-coded."""
    samples = _smooth(64, seed=7, amp=200)
    samples[32:48] = [samples[31]] * 16  # order-0 residuals == samples
    # order 0: residual == sample; force partition 2 (samples[32:48])
    # to zeros so raw_bits=0 is legal
    samples[32:48] = [0] * 16
    frame = _build_frame(
        0, 64,
        [_w_fixed(samples, 16, 0, porder=2, escapes={1: 9, 2: 0})],
    )
    payload = _streaminfo(8000, 1, 16, 64, block_size=64) + frame
    assert _decode_mono_ints(payload, 8000) == samples


def test_flac_wasted_bits_shift_back():
    """Wasted-bits subframes: samples sharing low zero bits are coded
    at reduced width and shifted back on decode."""
    base = _smooth(96, seed=11, amp=300)
    samples = [x << 3 for x in base]
    frame = _build_frame(0, 96, [_w_fixed(samples, 16, 1, wasted=3)])
    payload = _streaminfo(8000, 1, 16, 96, block_size=96) + frame
    assert _decode_mono_ints(payload, 8000) == samples


@pytest.mark.parametrize(
    "rate,rate_code",
    [(8000, 12), (11025, 13), (47110, 14)],
)
def test_flac_explicit_rate_codes(rate, rate_code):
    """Frame-header rate codes 12 (8-bit kHz), 13 (16-bit Hz), and
    14 (16-bit daHz) — the fixture encoder always defers to
    STREAMINFO (code 0)."""
    samples = _smooth(64, seed=rate_code)
    frame = _build_frame(
        0, 64, [_w_fixed(samples, 16, 2)], rate_code=rate_code, rate=rate
    )
    payload = _streaminfo(rate, 1, 16, 64, block_size=64) + frame
    assert _decode_mono_ints(payload, rate) == samples


def test_flac_bps_code_and_pow2_blocksize_code():
    """bps from the frame header's own code (12-bit here, code 2) and
    a power-of-two block-size code (8 -> 256 samples)."""
    samples = _smooth(256, seed=3, amp=900)
    frame = _build_frame(
        0, 256, [_w_fixed(samples, 12, 2)], bs_code=8, bps_code=2
    )
    payload = _streaminfo(8000, 1, 12, 256, block_size=256) + frame
    assert _decode_mono_ints(payload, 8000, bps=12) == samples


def test_flac_final_partial_block_truncated_to_total():
    """STREAMINFO total < frame samples: the decoder must truncate the
    final block's padding to the declared stream length."""
    samples = _smooth(128, seed=13)
    frame = _build_frame(0, 128, [_w_fixed(samples, 16, 2)])
    payload = _streaminfo(8000, 1, 16, 100, block_size=128) + frame
    assert _decode_mono_ints(payload, 8000) == samples[:100]


def test_flac_multi_frame_mixed_subframe_types():
    """Three frames of one stream exercising FIXED-4, LPC, and
    escaped-partition subframes back to back (frame boundary resync +
    per-frame CRC over non-encoder shapes)."""
    s1, s2, s3 = _smooth(64, 21), _smooth(64, 22), _smooth(64, 23)
    frames = (
        _build_frame(0, 64, [_w_fixed(s1, 16, 4)])
        + _build_frame(1, 64, [_w_lpc(s2, 16, 2, [20, -9], 3, 10)])
        + _build_frame(2, 64, [_w_fixed(s3, 16, 1, method=1, porder=1)])
    )
    payload = _streaminfo(8000, 1, 16, 192, block_size=64) + frames
    assert _decode_mono_ints(payload, 8000) == s1 + s2 + s3


# ---------------------------------------------------------------------------
# GIF LZW: a REAL dictionary-building compressor (the in-repo encoder
# emits literal codes only and clears before the width ever grows)
# ---------------------------------------------------------------------------


def _lzw_compress_real(indices, min_code):
    """Textbook GIF LZW: grows the dictionary, widens the code size
    when the next code would not fit, stops adding at 4096 (no clear —
    exercises the decoder's full-table steady state)."""
    clear = 1 << min_code
    end = clear + 1
    code_size = min_code + 1
    table = {(i,): i for i in range(clear)}
    next_code = clear + 2
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
    w = ()
    for k in indices:
        k = int(k)
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # decoder widens after its table reaches 1 << code_size;
            # its appends lag the encoder's by one code, hence the +1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        w = (k,)
    if w:
        emit(table[w])
    emit(end)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_gif_lzw_real_compression_round_trips_with_growth():
    """Dictionary growth through every width 9->12, the 4096-entry cap,
    and KwKwK self-reference runs — none reachable from the in-repo
    literal-code encoder."""
    rng = random.Random(42)
    indices = []
    while len(indices) < 12000:
        if rng.random() < 0.3:
            indices.extend([rng.randrange(256)] * rng.randint(2, 30))
        else:
            indices.extend(
                rng.randrange(256) for _ in range(rng.randint(1, 8))
            )
    indices = indices[:12000]
    comp = _lzw_compress_real(indices, 8)
    got = multimodal._gif_lzw_decode(comp, 8, len(indices))
    assert got == indices


def test_gif_lzw_kwkwk_immediate():
    """The canonical cScSc case: the very first repeat forces the
    decoder to resolve a code equal to its table size."""
    indices = [1, 1, 1, 1, 1, 1, 1]
    comp = _lzw_compress_real(indices, 2)
    assert multimodal._gif_lzw_decode(comp, 2, len(indices)) == indices


def test_gif_lzw_small_alphabet_growth():
    """min_code=2 (4-symbol alphabet) grows the width almost
    immediately — pins the width-change timing at the low extreme."""
    rng = random.Random(7)
    indices = [rng.randrange(4) for _ in range(4000)]
    comp = _lzw_compress_real(indices, 2)
    assert multimodal._gif_lzw_decode(comp, 2, len(indices)) == indices


# ---------------------------------------------------------------------------
# Cross-format pixel identity: the SAME image through three independent
# container/codec paths must decode to the SAME array (a consistent
# color-order or orientation bug inside one codec pair cannot hide in
# its own round-trip)
# ---------------------------------------------------------------------------


def _bmp_bytes(px) -> bytes:
    h, w, _ = px.shape
    row_size = (w * 3 + 3) & ~3
    data = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(w):
            r, g, b = px[y, x]
            row += bytes((int(b), int(g), int(r)))  # BGR
        row += b"\x00" * (row_size - len(row))
        data += row
    off = 14 + 40
    return (
        b"BM"
        + struct.pack("<IHHI", off + len(data), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                      2835, 2835, 0, 0)
        + bytes(data)
    )


def test_cross_format_pixel_identity_png_gif_bmp():
    rng = np.random.RandomState(3)
    # <=256 distinct colors so the GIF palette is exact
    palette = rng.randint(0, 256, size=(200, 3), dtype=np.uint8)
    idx = rng.randint(0, 200, size=(24, 17))
    px = palette[idx]
    from_png = multimodal.decode_png_pixels(multimodal.encode_png(px))
    from_gif = multimodal.decode_gif_pixels(multimodal.encode_gif(px))
    from_bmp = multimodal.decode_bmp_pixels(_bmp_bytes(px))
    assert np.array_equal(from_png, px)
    assert np.array_equal(from_gif, px)
    assert np.array_equal(from_bmp, px)


# ---------------------------------------------------------------------------
# JPEG: hand-assembled single-block file with an all-ones quant table
# and exactly one AC coefficient -> the decoded block must equal the
# textbook IDCT basis function (T.81 F.12 / A.3.3), catching any
# transpose or scaling bug that an encoder+decoder pair would cancel
# ---------------------------------------------------------------------------


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _minimal_jpeg_one_ac(ac_value: int) -> bytes:
    """8x8 grayscale baseline JPEG: quant table all ones, DC diff 0,
    one AC coefficient of ``ac_value`` at zigzag position 1 (= row 0,
    col 1 — a purely HORIZONTAL basis function), then EOB."""
    assert 64 <= ac_value <= 127  # size-7 magnitude, positive
    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
               + bytes([1, 1, 0x11, 0]))
    # DC table 0: single code '0' -> size 0 (diff 0, no extra bits)
    dht_dc = _seg(0xC4, bytes([0x00, 1] + [0] * 15 + [0]))
    # AC table 0: two codes of length 2: '00' -> 0x07 (run 0, size 7),
    # '01' -> 0x00 (EOB)
    dht_ac = _seg(0xC4, bytes([0x10, 0, 2] + [0] * 14 + [0x07, 0x00]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # entropy bits: DC '0', AC '00' + 7 magnitude bits, EOB '01'
    bits = "0" + "00" + format(ac_value, "07b") + "01"
    bits += "1" * (-len(bits) % 8)
    scan = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    assert 0xFF not in scan  # no byte-stuffing needed for this fixture
    return (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + scan
            + b"\xff\xd9")


def test_jpeg_decoder_matches_textbook_idct_basis():
    from twitch_chat_analyser_spark.operators.jpegcodec import (
        decode_jpeg_pixels,
    )

    ac = 100
    px = decode_jpeg_pixels(_minimal_jpeg_one_ac(ac))
    assert px.shape == (8, 8, 3)
    # textbook: x[n,m] = C(0,1) * a0(n) * a1(m); a0 = 1/sqrt(8),
    # a1(m) = 0.5*cos((2m+1)*pi/16); +128 level shift
    for n in range(8):
        for m in range(8):
            want = 128.0 + ac * (1 / math.sqrt(8)) * 0.5 * math.cos(
                (2 * m + 1) * math.pi / 16
            )
            want = int(np.clip(round(want), 0, 255))
            got = int(px[n, m, 0])
            assert abs(got - want) <= 1, (n, m, got, want)
    # horizontal basis: rows identical, columns NOT (transpose guard)
    assert np.array_equal(px[0, :, 0], px[7, :, 0])
    assert not np.array_equal(px[:, 0, 0], px[0, :, 0])


def test_jpeg_dct_matrix_is_the_orthonormal_dct_ii():
    from twitch_chat_analyser_spark.operators.jpegcodec import _dct_matrix

    a = _dct_matrix()
    for k in range(8):
        for n in range(8):
            scale = math.sqrt(1 / 8) if k == 0 else math.sqrt(2 / 8)
            want = scale * math.cos((2 * n + 1) * k * math.pi / 16)
            assert abs(a[k, n] - want) < 1e-12
    assert np.allclose(a @ a.T, np.eye(8), atol=1e-12)

"""From-scratch FLAC codec (RFC 9639 subset) — pure Python + numpy.

Why it exists: the multimodal ingest path (multimodal.py) treats audio
as opaque ``binary`` columns and extracts features via Arrow-batched
``mapInPandas``; WAV decodes for real, MP3 frame-walks for real, and
everything else used to fall back to the honestly-gated stub. FLAC is
the dominant *lossless* interchange format in crawled audio corpora and
— unlike MP3/AAC — its entropy coding (Rice) and predictors (fixed +
LPC) are simple enough to implement exactly, so the waveform itself is
recoverable with stdlib + numpy. That upgrades FLAC from metadata-only
to REAL sample decode: true RMS, mel features, and audio fingerprints
(multimodal.audio_phash64) all work on FLAC payloads.

Decoder coverage: STREAMINFO metadata; frame-header parse (all block
size / sample rate / sample size codes, UTF-8-style coded numbers);
subframe types CONSTANT, VERBATIM, FIXED (orders 0-4) and LPC (any
order); Rice residual methods 0 and 1 including escaped (raw) partitions
and multi-partition layouts; wasted-bits; mono and stereo with all three
decorrelation modes (left/side, right/side, mid/side). CRC-8/CRC-16 are
verified (a mismatch raises — corrupt frames should not silently yield
garbage features).

Encoder (fixture generator, same role as jpegcodec's Annex-K encoder):
fixed-blocksize streams, per-block CONSTANT / FIXED order-2 + Rice /
VERBATIM fallback subframe choice, independent / left-side / right-side /
mid-side stereo — enough to exercise every decoder path the tests pin.

Reference parity: the reference engine has no audio decode at all (its
scope is chat analytics); this module serves SURVEY.md §7.5's multimodal
training-data requirements.
"""

from __future__ import annotations

import struct

import numpy as np

from .multimodal import disciplined_decoder

# ---------------------------------------------------------------------------
# bit I/O (MSB-first, no byte stuffing — unlike JPEG's reader)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes, bytepos: int = 0):
        self.data = data
        self.bitpos = bytepos * 8

    def read(self, n: int) -> int:
        end = self.bitpos + n
        if end > len(self.data) * 8:
            raise ValueError("FLAC bitstream truncated")
        v = 0
        pos = self.bitpos
        while n > 0:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            shift = avail - take
            v = (v << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            n -= take
        self.bitpos = pos
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        if v >= 1 << (n - 1):
            v -= 1 << n
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    def bytepos(self) -> int:
        return self.bitpos >> 3


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# CRCs (FLAC frame header CRC-8 poly 0x07; frame CRC-16 poly 0x8005)
# ---------------------------------------------------------------------------


def _make_crc_table(poly: int, width: int):
    table = []
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        table.append(r & mask)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TABLE[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ _CRC16_TABLE[((c >> 8) ^ b) & 0xFF]
    return c


# ---------------------------------------------------------------------------
# metadata
# ---------------------------------------------------------------------------


def parse_flac_streaminfo(payload: bytes):
    """'fLaC' magic + metadata-block walk -> the STREAMINFO facts.

    -> (sample_rate, channels, bits_per_sample, total_samples,
        frames_start_offset)
    """
    if len(payload) < 8 or payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if btype == 0:
            if size < 34:
                raise ValueError("short STREAMINFO block")
            info = body
        pos += 4 + size
        if last:
            break
    if info is None:
        raise ValueError("FLAC without STREAMINFO")
    # 16+16 block sizes, 24+24 frame sizes, then 20 bits rate,
    # 3 bits channels-1, 5 bits bps-1, 36 bits total samples
    packed = int.from_bytes(info[10:18], "big")
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if rate == 0:
        raise ValueError("FLAC STREAMINFO with zero sample rate")
    return rate, channels, bps, total, pos


def parse_flac(payload: bytes):
    """Metadata-rate parse (STREAMINFO only — no frame decode): the
    cheap path for 100 TB container inspection, same contract as
    ``multimodal.parse_mp3``.

    -> sample_rate, duration_ms, None
    """
    rate, _ch, _bps, total, _pos = parse_flac_streaminfo(payload)
    return rate, total * 1000 // rate, None


# ---------------------------------------------------------------------------
# frame decode
# ---------------------------------------------------------------------------

_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_coded_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n == 0:
        raise ValueError("invalid FLAC coded number")
    val = b0 & (mask - 1)
    for _ in range(n):
        cont = br.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded-number continuation")
        val = (val << 6) | (cont & 0x3F)
    return val


def _decode_residual(br: _BitReader, block_size: int, order: int):
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual method")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    porder = br.read(4)
    n_part = 1 << porder
    if block_size % n_part:
        raise ValueError("FLAC partition order does not divide block")
    out = []
    for p in range(n_part):
        n = (block_size >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC partition smaller than predictor order")
        param = br.read(param_bits)
        if param == escape:
            raw_bits = br.read(5)
            if raw_bits == 0:
                out.extend([0] * n)
            else:
                out.extend(br.read_signed(raw_bits) for _ in range(n))
        else:
            for _ in range(n):
                q = br.read_unary()
                v = (q << param) | br.read(param) if param else q
                out.append((v >> 1) ^ -(v & 1))
    return out


def _decode_subframe(br: _BitReader, block_size: int, bps: int):
    if br.read(1):
        raise ValueError("FLAC subframe padding bit set")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    ebps = bps - wasted
    if ftype == 0:  # CONSTANT
        samples = [br.read_signed(ebps)] * block_size
    elif ftype == 1:  # VERBATIM
        samples = [br.read_signed(ebps) for _ in range(block_size)]
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        samples = [br.read_signed(ebps) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        coeffs = _FIXED_COEFFS[order]
        for r in resid:
            pred = sum(
                c * samples[-1 - j] for j, c in enumerate(coeffs)
            )
            samples.append(r + pred)
    elif ftype >= 32:  # LPC, order 1-32
        order = ftype - 31
        samples = [br.read_signed(ebps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coeffs = [br.read_signed(precision) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        for r in resid:
            acc = sum(c * samples[-1 - j] for j, c in enumerate(coeffs))
            samples.append(r + (acc >> shift))
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


@disciplined_decoder
def decode_flac_samples(payload: bytes):
    """Full sample decode -> (sample_rate, mono float64 ndarray in
    [-1, 1)) — channels averaged, matching
    ``multimodal.decode_wav_samples``'s contract so the DSP feature
    extractors and audio fingerprints run unchanged on FLAC."""
    rate, channels, bps, total, pos = parse_flac_streaminfo(payload)
    chans: list[list[int]] = [[] for _ in range(channels)]
    n_decoded = 0
    while pos + 2 <= len(payload) and (total == 0 or n_decoded < total):
        if payload[pos] != 0xFF or (payload[pos + 1] & 0xFC) != 0xF8:
            raise ValueError("lost FLAC frame sync")
        frame_start = pos
        br = _BitReader(payload, pos)
        br.read(14)  # sync
        if br.read(1):
            raise ValueError("reserved FLAC frame bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        rate_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        if br.read(1):
            raise ValueError("reserved FLAC frame bit set")
        _read_coded_number(br)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 1:
            block_size = 192
        elif bs_code <= 5:
            block_size = 576 << (bs_code - 2)
        elif bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        else:
            block_size = 256 << (bs_code - 8)
        if rate_code == 0:
            frate = rate
        elif rate_code in _RATE_CODES:
            frate = _RATE_CODES[rate_code]
        elif rate_code == 12:
            frate = br.read(8) * 1000
        elif rate_code == 13:
            frate = br.read(16)
        elif rate_code == 14:
            frate = br.read(16) * 10
        else:
            raise ValueError("invalid FLAC sample rate code")
        if frate != rate:
            raise ValueError("FLAC frame rate disagrees with STREAMINFO")
        fbps = bps if bps_code == 0 else _BPS_CODES.get(bps_code)
        if fbps is None:
            raise ValueError("reserved FLAC sample size code")
        hdr_end = br.bytepos()
        crc8 = br.read(8)
        if _crc8(payload[frame_start:hdr_end]) != crc8:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if ch_code < 8:
            n_ch = ch_code + 1
            if n_ch != channels:
                raise ValueError("FLAC frame channel count drift")
            subs = [
                _decode_subframe(br, block_size, fbps) for _ in range(n_ch)
            ]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            extra = (0, 1) if ch_code == 8 else (1, 0) if ch_code == 9 else (0, 1)
            a = _decode_subframe(br, block_size, fbps + extra[0])
            b = _decode_subframe(br, block_size, fbps + extra[1])
            if ch_code == 8:  # left/side: right = left - side
                subs = [a, [x - s for x, s in zip(a, b)]]
            elif ch_code == 9:  # right/side: left = right + side
                subs = [[x + s for x, s in zip(b, a)], b]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(a, b):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
                subs = [left, right]
        else:
            raise ValueError("reserved FLAC channel assignment")
        br.align()
        body_end = br.bytepos()
        crc16 = br.read(16)
        if _crc16(payload[frame_start:body_end]) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        for c in range(channels):
            chans[c].extend(subs[c])
        n_decoded += block_size
        pos = br.bytepos()
    if n_decoded == 0:
        raise ValueError("FLAC stream with no frames")
    if total and n_decoded > total:  # final partial block padding
        chans = [c[:total] for c in chans]
    arr = np.array(chans, dtype=np.float64)
    mono = arr.mean(axis=0) / float(1 << (bps - 1))
    return rate, mono


@disciplined_decoder
def decode_flac(payload: bytes):
    """Full-decode audio facts: (sample_rate, duration_ms, rms) with a
    REAL waveform RMS (16-bit-scaled to match ``decode_wav``'s units —
    its RMS is over raw int16 samples)."""
    rate, mono = decode_flac_samples(payload)
    n = len(mono)
    rms = float(np.sqrt(np.mean((mono * 32768.0) ** 2))) if n else 0.0
    return rate, n * 1000 // rate, rms


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------


def _write_coded_number(bw: _BitWriter, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    # generalized UTF-8: n continuation bytes carry 6 bits each, the
    # lead byte carries (6 - n) — capacity(n) = 6n + (6 - n) bits
    n = 1
    while v >= (1 << (6 * n + (6 - n))):
        n += 1
    lead_bits = 6 - n
    prefix = (0xFF << (lead_bits + 1)) & 0xFF
    bw.write(prefix | (v >> (6 * n)) & ((1 << lead_bits) - 1), 8)
    for i in range(n - 1, -1, -1):
        bw.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else ((-r) << 1) - 1


def _rice_cost(res: list[int], k: int) -> int:
    return sum((_zigzag(r) >> k) + 1 + k for r in res)


def _best_rice_param(res: list[int]) -> int:
    best_k, best_cost = 0, None
    for k in range(15):
        cost = _rice_cost(res, k)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
    return best_k


def _write_rice(bw: _BitWriter, res: list[int], k: int) -> None:
    for r in res:
        v = _zigzag(r)
        bw.write_unary(v >> k)
        if k:
            bw.write(v, k)


def _encode_subframe(bw: _BitWriter, samples: list[int], bps: int) -> None:
    n = len(samples)
    if n and all(s == samples[0] for s in samples):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(samples[0], bps)
        return
    order = 2 if n > 2 else 0
    coeffs = _FIXED_COEFFS[order]
    res = [
        samples[i]
        - sum(c * samples[i - 1 - j] for j, c in enumerate(coeffs))
        for i in range(order, n)
    ]
    k = _best_rice_param(res) if res else 0
    fixed_bits = order * bps + 2 + 4 + 4 + _rice_cost(res, k)
    if k >= 15 or fixed_bits >= n * bps:
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        for s in samples:
            bw.write(s, bps)
        return
    bw.write(0, 1)
    bw.write(8 + order, 6)  # FIXED
    bw.write(0, 1)  # no wasted bits
    for s in samples[:order]:
        bw.write(s, bps)
    bw.write(0, 2)  # residual method 0 (4-bit rice)
    bw.write(0, 4)  # partition order 0
    bw.write(k, 4)
    _write_rice(bw, res, k)


def encode_flac(
    samples,
    rate: int,
    block_size: int = 4096,
    stereo_mode: str = "independent",
) -> bytes:
    """Deterministic FLAC encoder for fixtures: 16-bit input, fixed
    block size, CONSTANT / FIXED-order-2+Rice / VERBATIM subframe
    choice. ``samples`` is int16-valued ndarray shaped (n,) mono or
    (n, 2) stereo; ``stereo_mode`` picks the decorrelation the decoder
    should exercise ('independent', 'left_side', 'right_side', 'mid_side')."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    if n == 0:
        raise ValueError("cannot encode an empty signal")
    if channels not in (1, 2):
        raise ValueError("fixture encoder supports mono/stereo only")
    if stereo_mode != "independent" and channels != 2:
        raise ValueError("stereo_mode needs 2 channels")
    bps = 16
    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    info = bytearray()
    info += struct.pack(">HH", block_size, block_size)
    info += b"\x00\x00\x00" * 2  # min/max frame size unknown
    packed = (rate << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) | n
    info += packed.to_bytes(8, "big")
    info += b"\x00" * 16  # MD5 unset
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + bytes(info)
    for idx, start in enumerate(range(0, n, block_size)):
        block = arr[start : start + block_size]
        bn = len(block)
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize stream
        bw.write(7, 4)  # 16-bit block size follows
        bw.write(0, 4)  # rate from STREAMINFO
        if channels == 1 or stereo_mode == "independent":
            bw.write(channels - 1, 4)
        elif stereo_mode == "left_side":
            bw.write(8, 4)
        elif stereo_mode == "right_side":
            bw.write(9, 4)
        else:
            bw.write(10, 4)
        bw.write(4, 3)  # 16 bps
        bw.write(0, 1)
        _write_coded_number(bw, idx)
        bw.write(bn - 1, 16)
        bw.align()
        hdr = bw.bytes()
        bw2 = _BitWriter()
        for b in hdr:
            bw2.write(b, 8)
        bw2.write(_crc8(hdr), 8)
        if channels == 1 or stereo_mode == "independent":
            for c in range(channels):
                _encode_subframe(bw2, [int(x) for x in block[:, c]], bps)
        elif stereo_mode == "left_side":
            left = [int(x) for x in block[:, 0]]
            side = [int(l_) - int(r_) for l_, r_ in block]
            _encode_subframe(bw2, left, bps)
            _encode_subframe(bw2, side, bps + 1)
        elif stereo_mode == "right_side":  # side first, +1 bit
            right = [int(x) for x in block[:, 1]]
            side = [int(l_) - int(r_) for l_, r_ in block]
            _encode_subframe(bw2, side, bps + 1)
            _encode_subframe(bw2, right, bps)
        else:  # mid_side
            mid = [(int(l_) + int(r_)) >> 1 for l_, r_ in block]
            side = [int(l_) - int(r_) for l_, r_ in block]
            _encode_subframe(bw2, mid, bps)
            _encode_subframe(bw2, side, bps + 1)
        bw2.align()
        body = bw2.bytes()
        bw3 = _BitWriter()
        for b in body:
            bw3.write(b, 8)
        bw3.write(_crc16(body), 16)
        bw3.align()
        out += bw3.bytes()
    return bytes(out)

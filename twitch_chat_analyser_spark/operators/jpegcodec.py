"""JPEG (ITU-T T.81 / JFIF) codec — stdlib ``struct`` + numpy, no
imaging libraries.

Written against the public JPEG specification so the multimodal decode
path (SURVEY.md §7.5 beyond-reference surface) covers the dominant
compressed image format for REAL instead of env-gating it:

- :func:`decode_jpeg_pixels` — baseline sequential DCT (SOF0/SOF1) AND
  progressive DCT (SOF2, T.81 Annex G: spectral selection + successive
  approximation, DC/AC first and refinement scans, EOB runs), 8-bit
  precision, grayscale or YCbCr with arbitrary chroma sampling factors
  (4:4:4 / 4:2:2 / 4:2:0 ...), restart markers (DRI/RSTn), Huffman
  tables taken from the stream's own DHT segments. Returns an
  (h, w, 3) uint8 RGB array.
- :func:`encode_jpeg` — baseline 4:4:4/4:2:0 encoder with the spec's
  Annex K quantization + Huffman tables (quality-scaled via the common
  libjpeg formula). Deterministic: same pixels -> same bytes. Used as
  the fixture generator for decoder tests (the decoder reads all
  tables from the stream, so an encode->decode round trip exercises
  the full marker/entropy/DCT pipeline) and as the re-encode half of
  image ops.
- :func:`encode_jpeg_progressive` — progressive (SOF2) encoder: DC
  first + refinement, per-component AC spectral bands at Al=1 +
  refinement to Al=0, EOB-run coding — the fixture generator for the
  progressive decode paths (real web-crawl progressive files carry
  exactly these scan types).

Numerics: DCT/IDCT are exact orthonormal 8x8 matrix products in
float64; the only loss is quantization + YCbCr rounding, so a flat
color round-trips within +/-2 per channel and smooth content within a
few counts at quality >= 90.

Scale notes: both functions are per-payload kernels invoked from
Arrow-batched ``mapInPandas`` stages (operators/multimodal.py) — bytes
never enter a shuffle; only fixed-width features leave the stage.
"""

from __future__ import annotations

import struct

import numpy as np

from .multimodal import disciplined_decoder

# scan position -> (row, col) in the 8x8 block, T.81 Figure 5
ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# Annex K.1/K.2 quantization tables (luminance / chrominance), natural
# (row-major) order
QUANT_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)
QUANT_CHROM = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# Annex K.3 typical Huffman tables as (BITS[1..16], HUFFVAL). The
# decoder never uses these (it reads DHT from the stream); the encoder
# emits them, so any valid canonical table would round-trip — these are
# the interoperable standard ones.
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis A: coeffs = A @ block @ A.T,
    block = A.T @ coeffs @ A."""
    k = np.arange(8).reshape(-1, 1)
    n = np.arange(8).reshape(1, -1)
    a = 0.5 * np.cos((2 * n + 1) * k * np.pi / 16)
    a[0, :] *= 1 / np.sqrt(2)
    return a


_DCT = _dct_matrix()


def _build_huffman(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman table per T.81 Annex C: {(length, code): value}."""
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _encode_huffman(bits: list[int], vals: list[int]) -> dict:
    """Inverse mapping for the encoder: {value: (code, length)}."""
    return {v: (c, ln) for (ln, c), v in _build_huffman(bits, vals).items()}


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map a t-bit magnitude to its signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment; unstuffs
    0xFF00 and stops at any real marker (leaving it for the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit_buf = 0
        self.bit_cnt = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed literal 0xFF
            else:
                raise _MarkerHit(0xFF00 | nxt)
        else:
            self.pos += 1
        self.bit_buf = (self.bit_buf << 8) | b
        self.bit_cnt += 8

    def read_bit(self) -> int:
        if self.bit_cnt == 0:
            self._fill()
        self.bit_cnt -= 1
        return (self.bit_buf >> self.bit_cnt) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy segment")

    def byte_align(self) -> None:
        self.bit_cnt = 0

    def expect_marker(self) -> int:
        """Consume a byte-aligned marker (e.g. RSTn) at the current
        position."""
        self.byte_align()
        if self.data[self.pos] != 0xFF:
            raise ValueError("expected marker in entropy segment")
        m = 0xFF00 | self.data[self.pos + 1]
        self.pos += 2
        return m


class _MarkerHit(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _decode_block(
    br: _BitReader, dc_tab: dict, ac_tab: dict, quant: np.ndarray, pred: int
) -> tuple[np.ndarray, int]:
    """One 8x8 block: Huffman -> dequantize -> un-zigzag -> IDCT.
    Returns (spatial block float64, new DC predictor)."""
    coeffs = np.zeros((8, 8), dtype=np.float64)
    t = br.decode_symbol(dc_tab)
    dc = pred + _extend(br.read_bits(t), t)
    coeffs[0, 0] = dc * quant[0, 0]
    k = 1
    while k < 64:
        rs = br.decode_symbol(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        row, col = ZIGZAG[k]
        coeffs[row, col] = _extend(br.read_bits(s), s) * quant[row, col]
        k += 1
    return _DCT.T @ coeffs @ _DCT, dc


@disciplined_decoder
def decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/SOF1) or progressive (SOF2) JPEG to an
    (h, w, 3) uint8 RGB array (grayscale promoted to RGB). Raises
    ValueError for non-JPEG payloads or unsupported coding processes
    (arithmetic, lossless, hierarchical, 12-bit)."""
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (h, w, [(comp_id, hsamp, vsamp, tq)])
    progressive = False
    coefs: dict[int, np.ndarray] | None = None  # SOF2 coefficient state
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker desync in JPEG stream")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RST outside a scan
            continue
        (seg_len,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                tbl = np.zeros((8, 8), dtype=np.int32)
                for z in range(64):
                    r, c = ZIGZAG[z]
                    tbl[r, c] = body[i + 1 + z]
                quant[tq] = tbl
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(
                    bits, vals
                )
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            precision = body[0]
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) "
                "JPEG are supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS -> entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if not progressive:
                scan_tabs = {}
                for c in range(ns):
                    cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                    scan_tabs[cid] = (tabs >> 4, tabs & 0x0F)
                return _decode_scan(
                    payload, pos + seg_len, frame, scan_tabs, quant,
                    huff_dc, huff_ac, restart_interval,
                )
            # progressive: accumulate this scan's coefficient updates
            # and continue to the next marker
            if coefs is None:
                coefs = _alloc_prog_coefs(frame)
            scan_comps = [
                (body[1 + 2 * c], body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0x0F)
                for c in range(ns)
            ]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            pos = _decode_progressive_scan(
                payload, pos + seg_len, frame, coefs, scan_comps,
                ss, se, ah, al, huff_dc, huff_ac, restart_interval,
            )
            continue
        # APPn / COM / anything else: skip
        pos += seg_len
    if progressive and coefs is not None:
        return _assemble_progressive(frame, coefs, quant)
    raise ValueError("no SOS segment found")


def _decode_scan(
    data, pos, frame, scan_tabs, quant, huff_dc, huff_ac, restart_interval
) -> np.ndarray:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for cid, hs, vs, _tq in comps:
        planes[cid] = np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), np.float64)
    br = _BitReader(data, pos)
    preds = {cid: 0 for cid, *_ in comps}
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and (
                mcu_index % restart_interval == 0
            ):
                m = br.expect_marker()
                if not (0xFFD0 <= m <= 0xFFD7):
                    raise ValueError("expected RST marker at restart point")
                preds = {cid: 0 for cid, *_ in comps}
            try:
                for cid, hs, vs, tq in comps:
                    dct, act = scan_tabs[cid]
                    for by in range(vs):
                        for bx in range(hs):
                            block, preds[cid] = _decode_block(
                                br, huff_dc[dct], huff_ac[act],
                                quant[tq], preds[cid],
                            )
                            y0 = (my * vs + by) * 8
                            x0 = (mx * hs + bx) * 8
                            planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
            except _MarkerHit as hit:  # truncated stream / early EOI
                raise ValueError(
                    f"entropy segment ended early at marker {hit.marker:#x}"
                ) from None
            mcu_index += 1
    return _assemble_image(planes, comps, h, w)


def _assemble_image(planes: dict, comps, h: int, w: int) -> np.ndarray:
    """Shared decode tail: level shift, upsample each component plane to
    full resolution, color map. ``planes[cid]`` holds the spatial-domain
    samples (pre-level-shift) at the component's own resolution."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for cid, hs, vs, _tq in comps:
        p = planes[cid] + 128.0
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        # round like the YCbCr path below — truncation would bias gray
        # pixels down by up to one count and break encode->decode symmetry
        y = np.clip(full[0], 0, 255).round()
        return np.dstack([y, y, y]).astype(np.uint8)
    if len(full) != 3:
        raise ValueError("only grayscale or 3-component YCbCr supported")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.dstack([r, g, b]), 0, 255).round().astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive (SOF2) decoding — T.81 Annex G. Coefficients accumulate
# across scans in zigzag order; the image is assembled once at EOI.
# ---------------------------------------------------------------------------


def _frame_geometry(frame):
    """(hmax, vmax, mcus_x, mcus_y, per-comp dims). Per component:
    (hs, vs, tq, padded block dims [the interleaved-MCU grid], actual
    block dims [what non-interleaved scans cover, T.81 A.2.2])."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    dims = {}
    for cid, hs, vs, tq in comps:
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        dims[cid] = (
            hs, vs, tq,
            mcus_x * hs, mcus_y * vs,  # padded (interleaved) block grid
            -(-cw // 8), -(-ch // 8),  # actual (non-interleaved) grid
        )
    return hmax, vmax, mcus_x, mcus_y, dims


def _alloc_prog_coefs(frame) -> dict[int, np.ndarray]:
    """Zigzag-order coefficient store per component, sized to the
    interleaved MCU grid (DC scans may cover padding blocks)."""
    _, _, _, _, dims = _frame_geometry(frame)
    return {
        cid: np.zeros((by_pad, bx_pad, 64), dtype=np.int32)
        for cid, (_h, _v, _tq, bx_pad, by_pad, _ba, _bya) in dims.items()
    }


def _prog_ac_first(br: _BitReader, block, ss, se, al, ac_tab, eobrun):
    """AC first scan for one block (T.81 G.1.2.2 / fig. G.4): EOB-run
    coded runs of zigzag coefficients at approximation level ``al``."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.decode_symbol(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read_bits(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past spectral band end")
        block[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return eobrun


def _prog_ac_refine(br: _BitReader, block, ss, se, al, ac_tab, eobrun):
    """AC refinement scan for one block (T.81 G.1.2.3 / fig. G.7):
    newly-significant coefficients arrive as ±1·2^al; every
    already-nonzero coefficient crossed consumes one correction bit.
    Runs count only zero-history positions."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.decode_symbol(ac_tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break  # EOB-run tail handled below
            else:
                if s != 1:
                    raise ValueError("refinement scan with size > 1")
                val = p1 if br.read_bit() else m1
            # advance over r zero-history coefficients; nonzero-history
            # positions crossed consume a correction bit instead
            while k <= se:
                v = int(block[k])
                if v != 0:
                    if br.read_bit() and (v & p1) == 0:
                        block[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                block[k] = val
            k += 1
    if eobrun > 0:
        # block belongs to an EOB run: only correction bits remain
        while k <= se:
            v = int(block[k])
            if v != 0:
                if br.read_bit() and (v & p1) == 0:
                    block[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(
    data, pos, frame, coefs, scan_comps, ss, se, ah, al,
    huff_dc, huff_ac, restart_interval,
) -> int:
    """Decode one progressive scan's entropy data into ``coefs`` and
    return the stream position of the next marker. Scan kinds: DC first
    (ss=0, ah=0; interleaved or single-component), DC refinement
    (ss=0, ah>0; one bit per block), AC first / AC refinement (ss>0;
    single-component over the ACTUAL block grid)."""
    _hmax, _vmax, mcus_x, mcus_y, dims = _frame_geometry(frame)
    br = _BitReader(data, pos)
    try:
        if ss == 0:
            if se != 0:
                raise ValueError("DC scan with nonzero spectral end")
            preds = {cid: 0 for cid, _d, _a in scan_comps}
            if len(scan_comps) > 1:  # interleaved: MCU order, padded grid
                units = []
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        for cid, dt, _at in scan_comps:
                            hs, vs = dims[cid][0], dims[cid][1]
                            for by in range(vs):
                                for bx in range(hs):
                                    units.append(
                                        (cid, dt, my * vs + by, mx * hs + bx)
                                    )
                # restart interval counts MCUs, not blocks: group blocks
                n_per_mcu = sum(
                    dims[cid][0] * dims[cid][1] for cid, _d, _a in scan_comps
                )
            else:  # non-interleaved: the component's actual grid
                cid, dt, _at = scan_comps[0]
                bxa, bya = dims[cid][5], dims[cid][6]
                units = [
                    (cid, dt, by, bx)
                    for by in range(bya)
                    for bx in range(bxa)
                ]
                n_per_mcu = 1
            unit_idx = 0
            for cid, dt, by, bx in units:
                mcu_idx = unit_idx // n_per_mcu
                if (
                    restart_interval
                    and mcu_idx
                    and unit_idx % (n_per_mcu * restart_interval) == 0
                ):
                    m = br.expect_marker()
                    if not (0xFFD0 <= m <= 0xFFD7):
                        raise ValueError("expected RST marker in DC scan")
                    preds = {c: 0 for c, _d, _a in scan_comps}
                blk = coefs[cid][by, bx]
                if ah == 0:
                    t = br.decode_symbol(huff_dc[dt])
                    preds[cid] += _extend(br.read_bits(t), t)
                    blk[0] = preds[cid] << al
                else:
                    if br.read_bit():
                        blk[0] = int(blk[0]) | (1 << al)
                unit_idx += 1
        else:
            if len(scan_comps) != 1:
                raise ValueError("AC scan must be single-component")
            cid, _dt, at = scan_comps[0]
            bxa, bya = dims[cid][5], dims[cid][6]
            ac_tab = huff_ac[at]
            eobrun = 0
            block_idx = 0
            for by in range(bya):
                for bx in range(bxa):
                    if (
                        restart_interval
                        and block_idx
                        and block_idx % restart_interval == 0
                    ):
                        m = br.expect_marker()
                        if not (0xFFD0 <= m <= 0xFFD7):
                            raise ValueError("expected RST marker in AC scan")
                        eobrun = 0
                    blk = coefs[cid][by, bx]
                    if ah == 0:
                        eobrun = _prog_ac_first(
                            br, blk, ss, se, al, ac_tab, eobrun
                        )
                    else:
                        eobrun = _prog_ac_refine(
                            br, blk, ss, se, al, ac_tab, eobrun
                        )
                    block_idx += 1
    except _MarkerHit as hit:
        raise ValueError(
            f"entropy segment ended early at marker {hit.marker:#x}"
        ) from None
    # skip byte-alignment padding / fill bytes to the next marker
    p = br.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00 and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            return p
        p += 1
    raise ValueError("progressive scan ran past end of stream")


def _assemble_progressive(frame, coefs, quant) -> np.ndarray:
    """Dequantize + IDCT the accumulated coefficient store and hand the
    spatial planes to the shared assembly tail. Vectorized: the zigzag
    scatter and the two 8x8 DCT matrix products run once per component
    over all blocks."""
    h, w, comps = frame
    zz_rows = np.array([r for r, _c in ZIGZAG])
    zz_cols = np.array([c for _r, c in ZIGZAG])
    planes = {}
    for cid, _hs, _vs, tq in comps:
        q = quant[tq]
        qzz = q[zz_rows, zz_cols].astype(np.float64)
        cz = coefs[cid].astype(np.float64) * qzz
        by_n, bx_n, _ = cz.shape
        m = np.zeros((by_n, bx_n, 8, 8), dtype=np.float64)
        m[:, :, zz_rows, zz_cols] = cz
        spat = np.einsum("ij,abjk,kl->abil", _DCT.T, m, _DCT)
        planes[cid] = spat.transpose(0, 2, 1, 3).reshape(by_n * 8, bx_n * 8)
    return _assemble_image(planes, comps, h, w)


@disciplined_decoder
def decode_jpeg(payload: bytes):
    """Feature contract shared with decode_bmp/decode_png:
    -> (width, height, (mean_r, mean_g, mean_b))."""
    try:
        px = decode_jpeg_pixels(payload)
    except (IndexError, struct.error) as e:  # truncated/corrupt stream
        raise ValueError(f"corrupt JPEG payload: {e}") from e
    means = px.reshape(-1, 3).mean(axis=0)
    return px.shape[1], px.shape[0], tuple(float(m) for m in means)


def resize_jpeg(payload: bytes, target_w: int, target_h: int,
                quality: int = 90) -> bytes:
    """Decode -> nearest-neighbor resize -> re-encode (4:4:4). Same
    kernel contract as multimodal.resize_bmp."""
    try:
        px = decode_jpeg_pixels(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"corrupt JPEG payload: {e}") from e
    h, w = px.shape[:2]
    rows = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    cols = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    return encode_jpeg(px[rows][:, cols], quality=quality)


# ---------------------------------------------------------------------------
# Encoder (baseline 4:4:4, Annex K tables)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec F.1.2.3


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of an Annex K table."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * s + 50) // 100, 1, 255).astype(np.int32)


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, magnitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def _encode_block(
    bw: _BitWriter, block: np.ndarray, quant: np.ndarray,
    dc_tab: dict, ac_tab: dict, pred: int,
) -> int:
    coeffs = _DCT @ (block - 128.0) @ _DCT.T
    q = np.round(coeffs / quant).astype(np.int64)
    dc = int(q[0, 0])
    t, bits = _magnitude(dc - pred)
    code, ln = dc_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(bits, t)
    run = 0
    last_nz = 0
    zz = [int(q[r, c]) for r, c in ZIGZAG]
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        t, bits = _magnitude(v)
        code, ln = ac_tab[(run << 4) | t]
        bw.write(code, ln)
        bw.write(bits, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return dc


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array — or (h, w) uint8 grayscale,
    written as a 1-component scan — as a baseline JFIF JPEG.
    Deterministic; edge-replicates to MCU multiples. ``subsampling``:
    ``"444"`` (1x1 chroma) or ``"420"`` (2x2-averaged chroma, 16x16
    MCUs); ignored for grayscale. ``restart_interval`` > 0 emits DRI +
    RSTn markers every that many MCUs — together these exercise every
    decoder path (sampling upsample, grayscale promotion, predictor
    resets, byte-aligned marker scan)."""
    h, w, samps, planes = _prepare_planes(pixels, subsampling)
    ncomp = len(planes)
    qlum = _quality_scale(QUANT_LUM, quality)
    qchrom = _quality_scale(QUANT_CHROM, quality)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + (
        struct.pack(">HHBB", 1, 1, 0, 0)
    )

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        zz = bytes(int(tbl[r, c]) for r, c in ZIGZAG)
        return b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz

    comp_ids = ((1, 0), (2, 1), (3, 1))[:ncomp]
    out += dqt(0, qlum)
    if ncomp == 3:
        out += dqt(1, qchrom)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for (cid, tq), (hs, vs) in zip(comp_ids, samps):
        out += struct.pack("BBB", cid, (hs << 4) | vs, tq)

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return (
            b"\xff\xc4"
            + struct.pack(">HB", 19 + len(vals), (tc << 4) | th)
            + bytes(bits)
            + bytes(vals)
        )

    out += dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    out += dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    if ncomp == 3:
        out += dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
        out += dht(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid, tabs in ((1, 0x00), (2, 0x11), (3, 0x11))[:ncomp]:
        out += struct.pack("BB", cid, tabs)
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl for sequential DCT

    enc_dc_lum = _encode_huffman(DC_LUM_BITS, DC_LUM_VALS)
    enc_ac_lum = _encode_huffman(AC_LUM_BITS, AC_LUM_VALS)
    enc_dc_chrom = _encode_huffman(DC_CHROM_BITS, DC_CHROM_VALS)
    enc_ac_chrom = _encode_huffman(AC_CHROM_BITS, AC_CHROM_VALS)
    tables = [
        (qlum, enc_dc_lum, enc_ac_lum),
        (qchrom, enc_dc_chrom, enc_ac_chrom),
        (qchrom, enc_dc_chrom, enc_ac_chrom),
    ][:ncomp]
    bw = _BitWriter()
    preds = [0] * ncomp
    mcu_index = 0
    rst = 0
    for by in range(mcus_y):
        for bx in range(mcus_x):
            if restart_interval and mcu_index and (
                mcu_index % restart_interval == 0
            ):
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for ci, plane in enumerate(planes):
                hs, vs = samps[ci]
                q, dt, at = tables[ci]
                for sy in range(vs):
                    for sx in range(hs):
                        y0 = (by * vs + sy) * 8
                        x0 = (bx * hs + sx) * 8
                        block = plane[y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            bw, block, q, dt, at, preds[ci]
                        )
            mcu_index += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _prepare_planes(pixels, subsampling: str):
    """Shared encoder front half: validate, color-convert, subsample,
    pad each component plane to its MCU-grid size. Returns
    (h, w, samps, planes)."""
    px = np.asarray(pixels)
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("encode_jpeg expects (h, w, 3) RGB or (h, w) gray")
    if px.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 pixels")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = px.shape[:2]
    if gray:
        chans = [px.astype(np.float64)]
        samps = [(1, 1)]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        chans = [y, cb, cr]
        if subsampling == "444":
            samps = [(1, 1), (1, 1), (1, 1)]  # (hs, vs) per component
        else:
            samps = [(2, 2), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    planes = []
    for (hs, vs), p in zip(samps, chans):
        if (hs, vs) != (hmax, vmax):
            fy, fx = vmax // vs, hmax // hs
            # pad to the downsample factor, then box-average
            pe = np.pad(
                p,
                ((0, (-p.shape[0]) % fy), (0, (-p.shape[1]) % fx)),
                mode="edge",
            )
            p = pe.reshape(
                pe.shape[0] // fy, fy, pe.shape[1] // fx, fx
            ).mean(axis=(1, 3))
        th, tw = mcus_y * vs * 8, mcus_x * hs * 8
        planes.append(
            np.pad(
                p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
            )
        )
    return h, w, samps, planes


# ---------------------------------------------------------------------------
# Progressive (SOF2) encoder — T.81 G.1.2. Fixture generator for the
# progressive decode paths: DC first + refinement, per-component AC
# spectral bands first-coded at Al=1 then refined to Al=0, EOB runs.
# ---------------------------------------------------------------------------

# Encoder-side Huffman tables for progressive scans. Annex K's AC
# tables lack the EOBn symbols (n>0) progressive EOB-run coding needs,
# so the encoder emits FLAT canonical tables covering every symbol it
# can produce; the decoder reads whatever DHT the stream carries, so
# table quality only affects compression, not correctness.
PROG_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
PROG_DC_VALS = list(range(12))  # DC size categories 0..11 at 4 bits
PROG_AC_VALS = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 11)}
    | {r << 4 for r in range(15)}  # EOB0..EOB14 (EOBRUN < 2^15)
    | {0xF0}  # ZRL
)
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(PROG_AC_VALS), 0, 0, 0, 0, 0, 0,
                0, 0]  # all symbols at 8 bits (176 of 256 codes)


def _forward_block_coefs(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """All quantized coefficients of a padded plane in zigzag order:
    (blocks_y, blocks_x, 64) int32."""
    by_n, bx_n = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(by_n, 8, bx_n, 8).transpose(0, 2, 1, 3)
    coeffs = np.einsum("ij,abjk,kl->abil", _DCT, blocks - 128.0, _DCT.T)
    q = np.round(coeffs / quant).astype(np.int32)
    zz_rows = [r for r, _c in ZIGZAG]
    zz_cols = [c for _r, c in ZIGZAG]
    return q[:, :, zz_rows, zz_cols]


class _ProgACWriter:
    """EOB-run-aware AC scan writer (first and refinement passes).
    Correction bits buffered per T.81 G.1.2.3: BE bits ride after the
    EOBRUN symbol, BR bits after the current block's next symbol."""

    def __init__(self, bw: _BitWriter, ac_enc: dict):
        self.bw = bw
        self.ac = ac_enc
        self.eobrun = 0
        self.be: list[int] = []  # correction bits pending with EOBRUN

    def _emit_sym(self, sym: int) -> None:
        code, ln = self.ac[sym]
        self.bw.write(code, ln)

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self._emit_sym(nbits << 4)
            if nbits:
                self.bw.write(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
        for b in self.be:
            self.bw.write(b, 1)
        self.be = []

    def first_block(self, zz, ss: int, se: int, al: int) -> None:
        run = 0
        for k in range(ss, se + 1):
            v = int(zz[k])
            v = (abs(v) >> al) * (1 if v >= 0 else -1)  # point transform
            if v == 0:
                run += 1
                continue
            self.flush_eobrun()
            while run > 15:
                self._emit_sym(0xF0)  # ZRL
                run -= 16
            t, bits = _magnitude(v)
            self._emit_sym((run << 4) | t)
            self.bw.write(bits, t)
            run = 0
        if run > 0:  # trailing zeros -> block joins the pending EOB run
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()

    def refine_block(self, zz, ss: int, se: int, al: int) -> None:
        absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        eob_rel = -1  # last newly-significant position (relative)
        for i, t in enumerate(absv):
            if t == 1:
                eob_rel = i
        run = 0
        br_bits: list[int] = []  # this block's bits since last symbol
        for i, t in enumerate(absv):
            if t == 0:
                run += 1
                continue
            while run > 15 and i <= eob_rel:
                self.flush_eobrun()
                self._emit_sym(0xF0)
                run -= 16
                for b in br_bits:
                    self.bw.write(b, 1)
                br_bits = []
            if t > 1:  # history-nonzero: correction bit only
                br_bits.append(t & 1)
                continue
            # newly significant (t == 1)
            self.flush_eobrun()
            self._emit_sym((run << 4) | 1)
            self.bw.write(1 if int(zz[ss + i]) >= 0 else 0, 1)
            for b in br_bits:
                self.bw.write(b, 1)
            br_bits = []
            run = 0
        if run > 0 or br_bits:
            self.eobrun += 1
            self.be.extend(br_bits)
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()


def encode_jpeg_progressive(
    pixels: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """Encode as a progressive (SOF2) JFIF JPEG. Deterministic scan
    script exercising every Annex G scan kind the decoder implements:

    1. DC first, all components interleaved, Al=1
    2. AC first per component at Al=1 — the luma band split (1-5, 6-63)
       is real spectral selection; chroma in one band (1-63)
    3. AC refinement per component/band to Al=0
    4. DC refinement, interleaved, Al=0

    Coefficients after all scans equal the baseline encoder's exactly
    (same quantization), so a progressive round trip must land within
    IDCT rounding of the baseline one — pinned by tests."""
    h, w, samps, planes = _prepare_planes(pixels, subsampling)
    ncomp = len(planes)
    qlum = _quality_scale(QUANT_LUM, quality)
    qchrom = _quality_scale(QUANT_CHROM, quality)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    qtabs = [qlum, qchrom, qchrom][:ncomp]
    coefs = [
        _forward_block_coefs(p, q) for p, q in zip(planes, qtabs)
    ]
    # actual (non-interleaved) block grids for the AC scans
    actual = []
    for hs, vs in samps:
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        actual.append((-(-cw // 8), -(-ch // 8)))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + (
        struct.pack(">HHBB", 1, 1, 0, 0)
    )

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        zz = bytes(int(tbl[r, c]) for r, c in ZIGZAG)
        return b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz

    comp_ids = ((1, 0), (2, 1), (3, 1))[:ncomp]
    out += dqt(0, qlum)
    if ncomp == 3:
        out += dqt(1, qchrom)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for (cid, tq), (hs, vs) in zip(comp_ids, samps):
        out += struct.pack("BBB", cid, (hs << 4) | vs, tq)

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return (
            b"\xff\xc4"
            + struct.pack(">HB", 19 + len(vals), (tc << 4) | th)
            + bytes(bits)
            + bytes(vals)
        )

    out += dht(0, 0, PROG_DC_BITS, PROG_DC_VALS)
    out += dht(1, 0, PROG_AC_BITS, PROG_AC_VALS)
    dc_enc = _encode_huffman(PROG_DC_BITS, PROG_DC_VALS)
    ac_enc = _encode_huffman(PROG_AC_BITS, PROG_AC_VALS)

    def sos(specs, ss, se, ah, al) -> bytes:
        seg = struct.pack(">HB", 6 + 2 * len(specs), len(specs))
        for cid, tabs in specs:
            seg += struct.pack("BB", cid, tabs)
        seg += struct.pack("BBB", ss, se, (ah << 4) | al)
        return b"\xff\xda" + seg

    dc_al = 1
    # --- scan 1: DC first, interleaved, Al=1 -------------------------
    out += sos([(cid, 0x00) for cid, _tq in comp_ids], 0, 0, 0, dc_al)
    bw = _BitWriter()
    preds = [0] * ncomp
    if ncomp > 1:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(ncomp):
                    hs, vs = samps[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            v = int(coefs[ci][my * vs + by, mx * hs + bx, 0])
                            v >>= dc_al
                            t, bits = _magnitude(v - preds[ci])
                            code, ln = dc_enc[t]
                            bw.write(code, ln)
                            if t:
                                bw.write(bits, t)
                            preds[ci] = v
    else:
        bxa, bya = actual[0]
        for by in range(bya):
            for bx in range(bxa):
                v = int(coefs[0][by, bx, 0]) >> dc_al
                t, bits = _magnitude(v - preds[0])
                code, ln = dc_enc[t]
                bw.write(code, ln)
                if t:
                    bw.write(bits, t)
                preds[0] = v
    bw.flush()
    out += bw.out

    # --- AC scans: per-component bands, first pass at Al=1 then
    # refinement to Al=0 (luma band split = real spectral selection) ---
    bands = {0: [(1, 5), (6, 63)]} if ncomp == 3 else {0: [(1, 63)]}
    ac_scans = []
    for ci in range(ncomp):
        for ss_, se_ in bands.get(ci, [(1, 63)]):
            ac_scans.append((ci, ss_, se_))
    for phase_ah, phase_al in ((0, 1), (1, 0)):
        for ci, ss_, se_ in ac_scans:
            out += sos([(comp_ids[ci][0], 0x00)], ss_, se_, phase_ah, phase_al)
            bw = _BitWriter()
            wr = _ProgACWriter(bw, ac_enc)
            bxa, bya = actual[ci]
            for by in range(bya):
                for bx in range(bxa):
                    if phase_ah == 0:
                        wr.first_block(coefs[ci][by, bx], ss_, se_, phase_al)
                    else:
                        wr.refine_block(coefs[ci][by, bx], ss_, se_, phase_al)
            wr.flush_eobrun()
            bw.flush()
            out += bw.out

    # --- final scan: DC refinement to Al=0, interleaved --------------
    out += sos([(cid, 0x00) for cid, _tq in comp_ids], 0, 0, dc_al, 0)
    bw = _BitWriter()
    if ncomp > 1:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(ncomp):
                    hs, vs = samps[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            v = int(coefs[ci][my * vs + by, mx * hs + bx, 0])
                            bw.write((v >> 0) & 1, 1)
    else:
        bxa, bya = actual[0]
        for by in range(bya):
            for bx in range(bxa):
                bw.write(int(coefs[0][by, bx, 0]) & 1, 1)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)

"""Baseline JPEG codec — pure python + numpy, no libjpeg/PIL.

Decoder: baseline sequential DCT JPEG (ITU-T.81): SOI/APP*/COM/DQT/
SOF0/DHT/SOS/EOI, 8-bit samples, 1 or 3 components, arbitrary
per-component sampling factors (4:4:4 / 4:2:2 / 4:2:0), restart
markers.  Progressive (SOF2) and arithmetic coding are out of scope
and raise :class:`UnsupportedJpeg`.

Encoder: minimal baseline encoder (4:4:4, standard Annex-K quant and
Huffman tables) — exists so tests can round-trip without any external
image library.

Performance note: DCT/IDCT and color transforms are vectorized numpy
over all blocks at once; entropy (Huffman) coding is a per-symbol
Python loop — fine for the thumbnails/fixtures this engine decodes in
``DecodeImage`` batches, and the honest ceiling is documented there
(use small ``batch_size`` for multi-MB media).
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedJpeg(ValueError):
    """Not a baseline-decodable JPEG (progressive, 12-bit, ...)."""


# ---------------------------------------------------------------------------
# shared tables

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int32)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 quantization tables (luminance / chrominance)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.int32)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int32)

# Annex K.3 Huffman table specs: (bits[1..16], values)
HT_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
HT_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12)))
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
     0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
     0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
     0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
     0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
     0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
     0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
     0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
     0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
     0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
     0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
     0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
     0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix D: F = D @ B @ D.T."""
    x = np.arange(8)
    D = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    D[0] *= np.sqrt(0.5)
    return D * 0.5


_D = _dct_matrix()


def _huff_codes(bits, values):
    """ITU-T.81 C.2: canonical (code, length) per value."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# ---------------------------------------------------------------------------
# decoder

class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing and restart-marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                # pad with 1s past the end (spec F.2.2.5 behavior)
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller resyncs via skip_rst()
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:
                    # EOI or next segment: pad
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_skip_rst(self):
        """Byte-align and consume one RSTn marker (F.2.1.3.1)."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


class _HuffLUT:
    """Decode LUT: walk bit by bit through (code, length) space."""

    def __init__(self, bits, values):
        # map (length, code) -> value
        self.table = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.table[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            v = self.table.get((length, code))
            if v is not None:
                return v
        raise UnsupportedJpeg('bad huffman code')


def _extend(v: int, t: int) -> int:
    """ITU-T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_baseline(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG → uint8 array (h, w) or (h, w, 3)."""
    if len(data) < 4 or data[0:2] != b'\xff\xd8':
        raise UnsupportedJpeg('not a JPEG (no SOI)')
    pos = 2
    qtables = {}
    hts = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise UnsupportedJpeg('marker desync')
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack('>H', data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:                      # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq != 0:
                    raise UnsupportedJpeg('16-bit quant table')
                qtables[tq] = np.frombuffer(
                    seg[p:p + 64], dtype=np.uint8).astype(np.int32)
                p += 64
        elif marker == 0xC4:                    # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                p += 1
                bits = list(seg[p:p + 16])
                p += 16
                nv = sum(bits)
                values = list(seg[p:p + nv])
                p += nv
                hts[(tc, th)] = _HuffLUT(bits, values)
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec, h, w, nc = seg[0], *struct.unpack('>HH', seg[1:5]), seg[5]
            if prec != 8:
                raise UnsupportedJpeg('%d-bit samples' % prec)
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + ci * 3:9 + ci * 3]
                comps.append({'id': cid, 'h': hv >> 4, 'v': hv & 0xF,
                              'tq': tq})
            frame = {'h': h, 'w': w, 'comps': comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise UnsupportedJpeg('non-baseline SOF%x' % (marker - 0xC0))
        elif marker == 0xDD:                    # DRI
            (restart_interval,) = struct.unpack('>H', seg[0:2])
        elif marker == 0xDA:                    # SOS → entropy data follows
            if frame is None:
                raise UnsupportedJpeg('SOS before SOF')
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tdta = seg[1 + si * 2:3 + si * 2]
                comp = next(c for c in frame['comps'] if c['id'] == cs)
                scan.append((comp, tdta >> 4, tdta & 0xF))
            return _decode_scan(data, pos + seglen, frame, scan, qtables,
                                hts, restart_interval)
        pos += seglen
    raise UnsupportedJpeg('no SOS found')


def _decode_scan(data, pos, frame, scan, qtables, hts, restart_interval):
    h, w = frame['h'], frame['w']
    hmax = max(c['h'] for c in frame['comps'])
    vmax = max(c['v'] for c in frame['comps'])
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component coefficient planes (in 8x8 block units)
    planes = {}
    for c, _, _ in scan:
        bw, bh = mcux * c['h'], mcuy * c['v']
        planes[c['id']] = np.zeros((bh, bw, 64), dtype=np.int32)
    br = _BitReader(data, pos)
    preds = {c['id']: 0 for c, _, _ in scan}
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            br.align_and_skip_rst()
            preds = {k: 0 for k in preds}
        my, mx = divmod(m, mcux)
        for c, td, ta in scan:
            dc_lut = hts.get((0, td))
            ac_lut = hts.get((1, ta))
            if dc_lut is None or ac_lut is None:
                raise UnsupportedJpeg('missing huffman table')
            for by in range(c['v']):
                for bx in range(c['h']):
                    coefs = np.zeros(64, dtype=np.int32)
                    t = dc_lut.decode(br)
                    diff = _extend(br.read_bits(t), t)
                    preds[c['id']] += diff
                    coefs[0] = preds[c['id']]
                    k = 1
                    while k < 64:
                        rs = ac_lut.decode(br)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break               # EOB
                        k += r
                        if k > 63:
                            raise UnsupportedJpeg('AC index overflow')
                        coefs[k] = _extend(br.read_bits(s), s)
                        k += 1
                    planes[c['id']][my * c['v'] + by,
                                    mx * c['h'] + bx] = coefs
    # dequantize + IDCT, vectorized over all blocks per component
    out_comps = []
    for c, _, _ in scan:
        q = qtables.get(c['tq'])
        if q is None:
            raise UnsupportedJpeg('missing quant table')
        coefs = planes[c['id']]                  # (bh, bw, 64) zigzag order
        deq = coefs * q[None, None, :]
        blocks = deq[:, :, UNZIGZAG].reshape(*deq.shape[:2], 8, 8)
        pix = np.einsum('ij,abjk,kl->abil', _D.T, blocks.astype(np.float64),
                        _D)
        pix = np.clip(np.round(pix) + 128, 0, 255).astype(np.uint8)
        bh, bw = pix.shape[:2]
        img = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        # upsample to full resolution (nearest) and crop
        ry, rx = vmax // c['v'], hmax // c['h']
        if ry > 1 or rx > 1:
            img = np.repeat(np.repeat(img, ry, axis=0), rx, axis=1)
        out_comps.append(img[:h, :w])
    if len(out_comps) == 1:
        return out_comps[0]
    if len(out_comps) != 3:
        raise UnsupportedJpeg('%d components' % len(out_comps))
    Y = out_comps[0].astype(np.float64)
    Cb = out_comps[1].astype(np.float64) - 128.0
    Cr = out_comps[2].astype(np.float64) - 128.0
    R = Y + 1.402 * Cr
    G = Y - 0.344136 * Cb - 0.714136 * Cr
    B = Y + 1.772 * Cb
    return np.clip(np.round(np.stack([R, G, B], axis=-1)), 0,
                   255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (4:4:4 baseline, standard tables — for fixtures/round-trips)

def _scale_qt(qt: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    out = (qt * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)          # byte stuffing

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)    # pad with 1s


def _encode_block(bw, coefs_zz, pred, dc_codes, ac_codes):
    dc = int(coefs_zz[0])
    diff = dc - pred
    mag = abs(diff)
    t = mag.bit_length()
    code, length = dc_codes[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    nz = np.nonzero(coefs_zz[1:])[0]
    last_nz = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(coefs_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]       # ZRL
            bw.write(code, length)
            run -= 16
        s = abs(v).bit_length()
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]           # EOB
        bw.write(code, length)
    return dc


def _comp_blocks(comp: np.ndarray, q: np.ndarray, ph: int, pw: int):
    """Pad to (ph, pw), FDCT + quantize all 8x8 blocks → zigzag coefs
    with shape (ph/8, pw/8, 64)."""
    h, w = comp.shape
    padded = np.pad(comp, ((0, ph - h), (0, pw - w)), mode='edge')
    blocks = (padded.reshape(ph // 8, 8, pw // 8, 8)
              .transpose(0, 2, 1, 3))
    F = np.einsum('ij,abjk,kl->abil', _D, blocks, _D.T)
    zz = np.round(
        F.reshape(-1, 64)[:, ZIGZAG] /
        q[ZIGZAG][None, :]).astype(np.int32)
    return zz.reshape(ph // 8, pw // 8, 64)


def encode_jpeg_baseline(arr: np.ndarray, quality: int = 85,
                         subsample: bool = False) -> bytes:
    """Encode uint8 (h, w) grayscale or (h, w, 3) RGB as baseline JPEG
    with standard Annex-K tables — 4:4:4 by default, 4:2:0 (2x2 luma
    sampling, box-averaged chroma) with ``subsample=True``."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        comps = [arr.astype(np.float64) - 128.0]
        subsample = False
    else:
        R = arr[:, :, 0].astype(np.float64)
        G = arr[:, :, 1].astype(np.float64)
        B = arr[:, :, 2].astype(np.float64)
        Y = 0.299 * R + 0.587 * G + 0.114 * B - 128.0
        Cb = -0.168736 * R - 0.331264 * G + 0.5 * B
        Cr = 0.5 * R - 0.418688 * G - 0.081312 * B
        comps = [Y, Cb, Cr]
    qts = [_scale_qt(QT_LUMA, quality), _scale_qt(QT_CHROMA, quality)]
    nc = 1 if gray else 3
    hs = [2, 1, 1] if subsample else [1] * nc   # per-comp sampling factors
    vs = [2, 1, 1] if subsample else [1] * nc
    hmax, vmax = max(hs[:nc]), max(vs[:nc])
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcux = (w + mcu_w - 1) // mcu_w
    mcuy = (h + mcu_h - 1) // mcu_h
    blocks_per_comp = []
    for ci, comp in enumerate(comps):
        if subsample and ci > 0:
            # box-average 2x2 chroma downsample (pad odd dims first)
            ch, cw = comp.shape
            comp = np.pad(comp, ((0, ch % 2), (0, cw % 2)), mode='edge')
            comp = (comp[0::2, 0::2] + comp[0::2, 1::2]
                    + comp[1::2, 0::2] + comp[1::2, 1::2]) / 4.0
        ph = mcuy * vs[ci] * 8
        pw = mcux * hs[ci] * 8
        blocks_per_comp.append(
            _comp_blocks(comp, qts[0 if ci == 0 else 1], ph, pw))

    out = bytearray(b'\xff\xd8')                # SOI

    def seg(marker, payload):
        out.extend(marker)
        out.extend(struct.pack('>H', len(payload) + 2))
        out.extend(payload)

    seg(b'\xff\xdb', bytes([0]) + bytes(qts[0][ZIGZAG].tolist()))
    if not gray:
        seg(b'\xff\xdb', bytes([1]) + bytes(qts[1][ZIGZAG].tolist()))
    sof = bytearray(struct.pack('>BHHB', 8, h, w, nc))
    for ci in range(nc):
        sof.extend([ci + 1, (hs[ci] << 4) | vs[ci], 0 if ci == 0 else 1])
    seg(b'\xff\xc0', bytes(sof))
    tables = [(0x00, HT_DC_LUMA), (0x10, HT_AC_LUMA)]
    if not gray:
        tables += [(0x01, HT_DC_CHROMA), (0x11, HT_AC_CHROMA)]
    for tid, (bits, values) in tables:
        seg(b'\xff\xc4', bytes([tid]) + bytes(bits) + bytes(values))
    sos = bytearray([nc])
    for ci in range(nc):
        sos.extend([ci + 1, 0x00 if ci == 0 else 0x11])
    sos.extend([0, 63, 0])
    seg(b'\xff\xda', bytes(sos))

    dc_l = _huff_codes(*HT_DC_LUMA)
    ac_l = _huff_codes(*HT_AC_LUMA)
    dc_c = _huff_codes(*HT_DC_CHROMA)
    ac_c = _huff_codes(*HT_AC_CHROMA)
    bw = _BitWriter()
    preds = [0] * nc
    # interleaved MCU order (ITU-T.81 A.2.3): per MCU, each component
    # contributes vs[ci] x hs[ci] blocks in raster order
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(nc):
                dc_codes, ac_codes = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for by in range(vs[ci]):
                    for bx in range(hs[ci]):
                        preds[ci] = _encode_block(
                            bw,
                            blocks_per_comp[ci][my * vs[ci] + by,
                                                mx * hs[ci] + bx],
                            preds[ci], dc_codes, ac_codes)
    bw.flush()
    out.extend(bw.out)
    out.extend(b'\xff\xd9')                     # EOI
    return bytes(out)

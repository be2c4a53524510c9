"""Pure-stdlib image codecs (PNG, BMP) for the multimodal stages.

The container has no PIL/libjpeg, but PNG is just zlib + per-scanline
filters and uncompressed BMP is plain struct packing — both decode
exactly with numpy + the standard library.  This makes the multimodal
decode stage REAL for these formats; only formats that genuinely need
external codecs (JPEG/WebP/video) remain behind the clearly-marked
stub in ``multimodal.py``.

Supported:
- PNG: 8-bit greyscale / RGB / RGBA, non-interlaced, filters 0-4
  (None/Sub/Up/Average/Paeth) — the overwhelmingly common encoder
  output.  Palette, 16-bit and Adam7 raise ``UnsupportedImage``.
- BMP: uncompressed 24-bit BI_RGB, bottom-up or top-down.

Encoders exist for round-trip testing (PNG can emit any filter type so
the decoder's unfilter paths are all exercised).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class UnsupportedImage(ValueError):
    """Format feature outside the pure-stdlib decoder's scope."""


# ---------------------------------------------------------------------------
# PNG

_PNG_SIG = b'\x89PNG\r\n\x1a\n'


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack('>I', data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # length + type + body + crc


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w) or (h, w, c) uint8 array."""
    if data[:8] != _PNG_SIG:
        raise UnsupportedImage('not a PNG signature')
    width = height = None
    channels = None
    idat = []
    for ctype, body in _chunks(data):
        if ctype == b'IHDR':
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack('>IIBBBBB', body)
            if bit_depth != 8:
                raise UnsupportedImage('bit depth %d' % bit_depth)
            if interlace:
                raise UnsupportedImage('Adam7 interlacing')
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
            if channels is None:
                raise UnsupportedImage('color type %d' % color_type)
        elif ctype == b'IDAT':
            idat.append(body)
        elif ctype == b'IEND':
            break
    if width is None or not idat:
        raise UnsupportedImage('missing IHDR/IDAT')
    raw = zlib.decompress(b''.join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise UnsupportedImage('IDAT size mismatch')
    out = np.empty((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at bit depth 8
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8,
                            count=stride, offset=pos + 1).copy()
        pos += stride + 1
        if ftype == 0:                       # None
            pass
        elif ftype == 2:                     # Up
            row += prev
        elif ftype == 1:                     # Sub (sequential in x)
            for x in range(bpp, stride):
                row[x] = (int(row[x]) + int(row[x - bpp])) & 0xFF
        elif ftype == 3:                     # Average
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:                     # Paeth
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else \
                    (b if pb <= pc else c)
                row[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise UnsupportedImage('filter type %d' % ftype)
        out[y] = row
        prev = row
    img = out.reshape(height, width, channels)
    return img[:, :, 0] if channels == 1 else img


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w[, c]) uint8 → PNG bytes.  ``filter_type`` 0-4 applies the
    same filter to every scanline (lets tests exercise each unfilter
    path)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    stride = w * c
    flat = arr.reshape(h, stride).astype(np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    lines = []
    for y in range(h):
        row = flat[y]
        if filter_type == 0:
            enc = row
        elif filter_type == 1:
            left = np.concatenate([np.zeros(c, np.int32), row[:-c]])
            enc = (row - left) & 0xFF
        elif filter_type == 2:
            enc = (row - prev) & 0xFF
        elif filter_type == 3:
            left = np.concatenate([np.zeros(c, np.int32), row[:-c]])
            enc = (row - ((left + prev) >> 1)) & 0xFF
        elif filter_type == 4:
            enc = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = int(row[x - c]) if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                p = a + b - cc
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc) else \
                    (b if pb <= pc else cc)
                enc[x] = (int(row[x]) - pred) & 0xFF
        else:
            raise ValueError('filter_type must be 0-4')
        lines.append(bytes([filter_type]) + enc.astype(np.uint8).tobytes())
        prev = row

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack('>I', len(body)) + ctype + body +
                struct.pack('>I', zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack('>IIBBBBB', w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b''.join(lines), 6)
    return (_PNG_SIG + chunk(b'IHDR', ihdr) + chunk(b'IDAT', idat) +
            chunk(b'IEND', b''))


# ---------------------------------------------------------------------------
# BMP (uncompressed 24-bit)

def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8 RGB array."""
    if data[:2] != b'BM':
        raise UnsupportedImage('not a BMP signature')
    pixel_offset, = struct.unpack('<I', data[10:14])
    header_size, = struct.unpack('<I', data[14:18])
    if header_size < 40:
        raise UnsupportedImage('BMP core header')
    width, height = struct.unpack('<ii', data[18:26])
    planes, bpp = struct.unpack('<HH', data[26:30])
    compression, = struct.unpack('<I', data[30:34])
    if bpp != 24 or compression != 0:
        raise UnsupportedImage('only uncompressed 24-bit BMP')
    bottom_up = height > 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3   # rows pad to 4 bytes
    img = np.empty((height, width, 3), dtype=np.uint8)
    for y in range(height):
        off = pixel_offset + y * row_size
        row = np.frombuffer(data, dtype=np.uint8, count=width * 3,
                            offset=off).reshape(width, 3)
        img[height - 1 - y if bottom_up else y] = row[:, ::-1]  # BGR→RGB
    return img


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → bottom-up 24-bit BMP bytes."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    row_size = (w * 3 + 3) & ~3
    pad = row_size - w * 3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += arr[y, :, ::-1].tobytes() + b'\x00' * pad
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(body)
    header = (b'BM' + struct.pack('<IHHI', file_size, 0, 0, pixel_offset) +
              struct.pack('<IiiHHIIiiII', 40, w, h, 1, 24, 0, len(body),
                          2835, 2835, 0, 0))
    return bytes(header + body)


def decode_image(data: bytes) -> np.ndarray:
    """Sniff + decode PNG, BMP or baseline JPEG; raises
    UnsupportedImage otherwise (progressive JPEG, WebP, ...)."""
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:2] == b'BM':
        return decode_bmp(data)
    if data[:2] == b'\xff\xd8':
        from .jpegcodec import UnsupportedJpeg, decode_jpeg_baseline

        try:
            return decode_jpeg_baseline(data)
        except UnsupportedJpeg as e:
            raise UnsupportedImage('jpeg: %s' % e)
    raise UnsupportedImage('unrecognized image format '
                           '(PNG/BMP/baseline-JPEG decode without '
                           'codec libs)')

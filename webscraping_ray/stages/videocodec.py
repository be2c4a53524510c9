"""Pure-stdlib MJPEG-in-AVI video container codec.

Upgrades the multimodal video path from "labeled stub" to REAL for the
one video container expressible without external libraries: RIFF/AVI
holding baseline-JPEG frames (MJPG), each frame decodable by the
pure-numpy :mod:`.jpegcodec`.  Inter-frame-compressed codecs
(H.264/VP9/AV1) stay behind the multimodal stub.

Same RIFF chunk-walking machinery as :mod:`.audiocodec`; the writer
emits a spec-shaped hdrl (avih + strl/strh/strf) so the payload is a
well-formed AVI, and the reader only relies on avih + 00dc/00db frame
chunks, so it also reads AVIs written by standard muxers as long as
the frames are MJPG.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedVideo(ValueError):
    """Payload is not a RIFF/AVI MJPEG container."""


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b'\x00' if len(body) & 1 else b''
    return cid + struct.pack('<I', len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b'LIST', ltype + body)


def encode_mjpeg_avi(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 85) -> bytes:
    """(h, w, 3) uint8 frames -> MJPEG AVI bytes (frames JPEG-encoded
    by :func:`.jpegcodec.encode_jpeg_baseline`)."""
    from .jpegcodec import encode_jpeg_baseline

    if not frames:
        raise ValueError('need at least one frame')
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg_baseline(f, quality=quality) for f in frames]
    usec = 1_000_000 // fps
    avih = struct.pack('<14I', usec, 0, 0, 0, len(frames), 0, 1,
                       max(len(j) for j in jpegs), w, h, 0, 0, 0, 0)
    strh = (b'vids' + b'MJPG'
            + struct.pack('<IHHIIIIIIII4h', 0, 0, 0, 0, 1, fps, 0,
                          len(frames), max(len(j) for j in jpegs),
                          10000, 0, 0, 0, w, h))
    strf = struct.pack('<IiiHH4sIiiII', 40, w, h, 1, 24, b'MJPG',
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b'hdrl', _chunk(b'avih', avih)
                 + _list(b'strl', _chunk(b'strh', strh)
                         + _chunk(b'strf', strf)))
    movi = _list(b'movi', b''.join(_chunk(b'00dc', j) for j in jpegs))
    body = b'AVI ' + hdrl + movi
    return b'RIFF' + struct.pack('<I', len(body)) + body


def _walk(buf: bytes, pos: int, end: int, avih: list, frames: list):
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        (size,) = struct.unpack('<I', buf[pos + 4:pos + 8])
        body_start = pos + 8
        if cid == b'LIST':
            _walk(buf, body_start + 4, min(body_start + size, end),
                  avih, frames)
        elif cid == b'avih':
            avih.append(buf[body_start:body_start + size])
        elif cid[2:4] in (b'dc', b'db') and cid[:2].isdigit():
            frames.append(buf[body_start:body_start + size])
        pos = body_start + size + (size & 1)


def decode_mjpeg_avi(payload: bytes):
    """AVI bytes -> (list of per-frame JPEG bytes, fps, (width, height)).

    Frame payloads stay compressed — callers decode the frames they
    actually sample (the point of frame sampling at 100 TB: never
    decode the 99 % of frames nobody asked for)."""
    if (len(payload) < 24 or payload[:4] != b'RIFF'
            or payload[8:12] != b'AVI '):
        raise UnsupportedVideo('not a RIFF/AVI payload')
    avih: list = []
    frames: list = []
    _walk(payload, 12, min(12 + struct.unpack('<I', payload[4:8])[0],
                           len(payload)), avih, frames)
    if not avih or not frames:
        raise UnsupportedVideo('missing avih header or frame chunks')
    fields = struct.unpack('<14I', avih[0][:56])
    usec, width, height = fields[0], fields[8], fields[9]
    fps = int(round(1_000_000 / usec)) if usec else 0
    for f in frames:
        if f[:2] != b'\xff\xd8':
            raise UnsupportedVideo('non-JPEG frame chunk (not MJPG)')
    return frames, fps, (width, height)

"""Pure-stdlib PCM WAV codec + numpy audio features.

Upgrades the multimodal audio path from "labeled stub" to REAL for
RIFF/WAVE PCM16 payloads — the only audio container parseable without
external codec libraries.  Compressed audio (mp3/ogg/aac) stays behind
the multimodal stub with the same actor-pool plumbing.

No reference counterpart (the reference is a web-scraping library);
this is the audio leg of the brief's multimodal ask: decode and
feature-extract as vectorized batch kernels.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedAudio(ValueError):
    """Payload is not RIFF/WAVE PCM16."""


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono/stereo samples -> RIFF/WAVE PCM16 bytes.

    ``samples``: (n,) mono or (n, ch) interleaved-on-write.
    """
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError('encode_wav expects int16 samples')
    n, ch = samples.shape
    data = samples.reshape(-1).tobytes()
    byte_rate = sample_rate * ch * 2
    hdr = (b'RIFF' + struct.pack('<I', 36 + len(data)) + b'WAVE'
           + b'fmt ' + struct.pack('<IHHIIHH', 16, 1, ch, sample_rate,
                                   byte_rate, ch * 2, 16)
           + b'data' + struct.pack('<I', len(data)))
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 bytes -> ((n, ch) int16 samples, sample_rate).

    Walks the RIFF chunk list (fmt may be padded / followed by LIST
    chunks); raises :class:`UnsupportedAudio` for anything that is not
    uncompressed PCM16.
    """
    if len(payload) < 44 or payload[:4] != b'RIFF' or payload[8:12] != b'WAVE':
        raise UnsupportedAudio('not a RIFF/WAVE payload')
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack('<I', payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if cid == b'fmt ':
            fmt = body
        elif cid == b'data':
            data = body
        pos += 8 + size + (size & 1)   # chunks are word-aligned
    if fmt is None or data is None:
        raise UnsupportedAudio('missing fmt/data chunk')
    audio_fmt, ch, rate, _, _, bits = struct.unpack('<HHIIHH', fmt[:16])
    if audio_fmt != 1 or bits != 16 or ch < 1:
        raise UnsupportedAudio('only uncompressed PCM16 is supported')
    n = len(data) // (2 * ch)
    samples = np.frombuffer(data[:n * 2 * ch], np.int16).reshape(n, ch)
    return samples, rate


def audio_features(samples: np.ndarray, rate: int,
                   n_fft: int = 2048) -> dict:
    """Vectorized per-clip features over the mono mixdown: duration,
    RMS level (dBFS), zero-crossing rate, dominant frequency and
    spectral centroid of the first ``n_fft`` samples (rfft)."""
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    n = len(mono)
    dur_ms = int(round(1000.0 * n / rate)) if rate else 0
    rms = float(np.sqrt(np.mean(mono ** 2))) if n else 0.0
    rms_dbfs = float(20.0 * np.log10(rms)) if rms > 0 else -120.0
    zcr = (float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
           if n > 1 else 0.0)
    seg = mono[:n_fft]
    if len(seg) >= 16:
        mag = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        freqs = np.fft.rfftfreq(len(seg), d=1.0 / rate)
        mag[0] = 0.0                      # ignore DC
        dom = float(freqs[int(np.argmax(mag))])
        tot = float(mag.sum())
        centroid = float((freqs * mag).sum() / tot) if tot > 0 else 0.0
    else:
        dom = 0.0
        centroid = 0.0
    return {'duration_ms': dur_ms, 'rms_dbfs': rms_dbfs, 'zcr': zcr,
            'dominant_hz': dom, 'spectral_centroid_hz': centroid}

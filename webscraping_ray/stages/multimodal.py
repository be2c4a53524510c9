"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata.

Image decode is REAL for PNG, uncompressed BMP (pure-stdlib codecs in
:mod:`.imagecodec` — zlib + numpy) and baseline JPEG (pure-numpy
Huffman + IDCT in :mod:`.jpegcodec`); image resize is a REAL
vectorized bilinear kernel (:func:`bilinear_resize`); audio decode +
features are REAL for RIFF/WAVE PCM16 (:mod:`.audiocodec`); video
frame-sampling is REAL for MJPEG-in-AVI (:mod:`.videocodec`).
Formats that genuinely require external codec libraries (progressive
JPEG, WebP, compressed audio, inter-frame video) remain behind a
clearly-marked deterministic stub; the Ray-side plumbing — schema,
actor-pool signature, batch sizing for large binary payloads, output
layout — is identical for both paths.

Batch-size guidance: with payloads of B bytes, keep
``batch_size * B * concurrency`` under the per-worker heap budget;
callers should pass small ``batch_size`` (e.g. 16-64) for multi-MB
media.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ('media_id', pa.int64()),
    ('kind', pa.string()),            # 'image' | 'audio' | 'video'
    ('payload', pa.large_binary()),
    ('meta_width', pa.int32()),
    ('meta_height', pa.int32()),
    ('meta_duration_ms', pa.int32()),
])


def synth_media_table(n: int, kind: str = 'image', payload_bytes: int = 4096,
                      seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes)."""
    rows_payload, widths, heights, durs = [], [], [], []
    for i in range(n):
        h = hashlib.blake2b(b'%d:%d:%s' % (seed, i, kind.encode()),
                            digest_size=32).digest()
        reps = payload_bytes // len(h) + 1
        rows_payload.append((h * reps)[:payload_bytes])
        widths.append(64 + (i % 8) * 32)
        heights.append(64 + (i % 5) * 32)
        durs.append(0 if kind == 'image' else 1000 + i * 33)
    return pa.table({
        'media_id': pa.array(range(n), pa.int64()),
        'kind': pa.array([kind] * n, pa.string()),
        'payload': pa.array(rows_payload, pa.large_binary()),
        'meta_width': pa.array(widths, pa.int32()),
        'meta_height': pa.array(heights, pa.int32()),
        'meta_duration_ms': pa.array(durs, pa.int32()),
    })


def _decode_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder for formats needing external codecs (progressive
    JPEG / WebP).

    Deterministic fake: tile the payload bytes into an (h, w, 3) array.
    Raises NotImplementedError when ``strict`` decoding is requested
    (see DecodeImage(strict=True)).
    """
    need = width * height * 3
    reps = need // len(payload) + 1
    buf = (payload * reps)[:need]
    return np.frombuffer(buf, dtype=np.uint8).reshape(height, width, 3)


class DecodeImage:
    """Actor-pool stage: payload → decoded array stats + thumbnail hash.

    PNG/BMP/baseline-JPEG payloads decode for real
    (:mod:`.imagecodec` / :mod:`.jpegcodec`, pure stdlib + numpy).
    Other formats: ``strict=True`` raises NotImplementedError
    (progressive JPEG / WebP need external codecs, absent here);
    ``strict=False`` falls back to the deterministic stub so the
    pipeline shape stays testable.
    """

    def __init__(self, strict: bool = False, thumb: int = 8):
        self.strict = strict
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .imagecodec import UnsupportedImage, decode_image

        ids = batch.column('media_id').to_pylist()
        payloads = batch.column('payload').to_pylist()
        ws = batch.column('meta_width').to_pylist()
        hs = batch.column('meta_height').to_pylist()
        means, thumb_hashes, real = [], [], []
        for p, w, h in zip(payloads, ws, hs):
            try:
                arr = decode_image(p)
                decoded = True
            except UnsupportedImage:
                if self.strict:
                    raise NotImplementedError(
                        'non-PNG/BMP/baseline-JPEG decode requires '
                        'PIL/libjpeg — not in this container')
                arr = _decode_stub(p, w, h)
                decoded = False
            if arr.ndim == 2:
                arr = arr[:, :, None]
            means.append(float(arr.mean()))
            # "resize" to thumb x thumb by strided sampling, hash it
            ah, aw = arr.shape[:2]
            t = arr[::max(1, ah // self.thumb), ::max(1, aw // self.thumb)]
            thumb_hashes.append(hashlib.blake2b(t.tobytes(),
                                                digest_size=8).hexdigest())
            real.append(decoded)
        return pa.table({
            'media_id': pa.array(ids, pa.int64()),
            'mean_pixel': pa.array(means, pa.float64()),
            'thumb_hash': pa.array(thumb_hashes, pa.string()),
            'n_bytes': pa.array([len(p) for p in payloads], pa.int64()),
            'real_decode': pa.array(real, pa.bool_()),
        })


def bilinear_resize(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Real bilinear resize, pure numpy, fully vectorized (no Python
    pixel loops).  Half-pixel-center (align_corners=False) sampling —
    the convention of PIL/torch/OpenCV default — with edge clamping;
    uint8 in, uint8 out (round-half-to-even via np.rint)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w = arr.shape[:2]
    ys = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w) - 0.5
    fy = np.floor(ys)
    fx = np.floor(xs)
    wy = (ys - fy)[:, None, None]
    wx = (xs - fx)[None, :, None]
    y0 = np.clip(fy.astype(np.int64), 0, h - 1)
    y1 = np.clip(fy.astype(np.int64) + 1, 0, h - 1)
    x0 = np.clip(fx.astype(np.int64), 0, w - 1)
    x1 = np.clip(fx.astype(np.int64) + 1, 0, w - 1)
    a = arr[np.ix_(y0, x0)].astype(np.float64)
    b = arr[np.ix_(y0, x1)].astype(np.float64)
    c = arr[np.ix_(y1, x0)].astype(np.float64)
    d = arr[np.ix_(y1, x1)].astype(np.float64)
    out = (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
           + c * wy * (1 - wx) + d * wy * wx)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


class ResizeImage:
    """Actor-pool stage: payload → bilinear-resized image, re-encoded
    as PNG (decode → resize → encode, the full real-kernel transform
    chain).  PNG/BMP/baseline-JPEG inputs take the real path; stub
    formats resize the stub array (``real_decode=False``) so the
    pipeline shape holds for every row.  Output payloads are
    (out_h × out_w × channels) PNGs — uniform downstream schema
    regardless of input format."""

    def __init__(self, out_h: int = 32, out_w: int = 32,
                 strict: bool = False):
        self.out_h = out_h
        self.out_w = out_w
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .imagecodec import UnsupportedImage, decode_image, encode_png

        ids = batch.column('media_id').to_pylist()
        payloads = batch.column('payload').to_pylist()
        ws = batch.column('meta_width').to_pylist()
        hs = batch.column('meta_height').to_pylist()
        out_payload, real = [], []
        for p, w, h in zip(payloads, ws, hs):
            try:
                arr = decode_image(p)
                decoded = True
            except UnsupportedImage:
                if self.strict:
                    raise NotImplementedError(
                        'non-PNG/BMP/baseline-JPEG decode requires '
                        'PIL/libjpeg — not in this container')
                arr = _decode_stub(p, w, h)
                decoded = False
            out_payload.append(
                encode_png(bilinear_resize(arr, self.out_h, self.out_w)))
            real.append(decoded)
        return pa.table({
            'media_id': pa.array(ids, pa.int64()),
            'payload': pa.array(out_payload, pa.large_binary()),
            'width': pa.array([self.out_w] * len(ids), pa.int32()),
            'height': pa.array([self.out_h] * len(ids), pa.int32()),
            'real_decode': pa.array(real, pa.bool_()),
        })


class AudioFeatures:
    """Actor-pool stage: audio payload → per-clip features.

    REAL decode + features for RIFF/WAVE PCM16 (:mod:`.audiocodec` —
    pure stdlib struct + numpy rfft); compressed formats (mp3/ogg/aac
    need external codecs) fall back to a deterministic stub row with
    ``real_decode=False`` (or raise under ``strict=True``), keeping
    one output schema for every row."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .audiocodec import UnsupportedAudio, audio_features, decode_wav

        ids = batch.column('media_id').to_pylist()
        payloads = batch.column('payload').to_pylist()
        durs = batch.column('meta_duration_ms').to_pylist()
        rows, real = [], []
        for p, d in zip(payloads, durs):
            try:
                samples, rate = decode_wav(p)
                rows.append(audio_features(samples, rate))
                real.append(True)
            except UnsupportedAudio:
                if self.strict:
                    raise NotImplementedError(
                        'compressed-audio decode requires external '
                        'codecs — not in this container')
                # deterministic stub: metadata duration, silence stats
                rows.append({'duration_ms': d, 'rms_dbfs': -120.0,
                             'zcr': 0.0, 'dominant_hz': 0.0,
                             'spectral_centroid_hz': 0.0})
                real.append(False)
        return pa.table({
            'media_id': pa.array(ids, pa.int64()),
            'duration_ms': pa.array([r['duration_ms'] for r in rows],
                                    pa.int32()),
            'rms_dbfs': pa.array([r['rms_dbfs'] for r in rows],
                                 pa.float64()),
            'zcr': pa.array([r['zcr'] for r in rows], pa.float64()),
            'dominant_hz': pa.array([r['dominant_hz'] for r in rows],
                                    pa.float64()),
            'spectral_centroid_hz': pa.array(
                [r['spectral_centroid_hz'] for r in rows], pa.float64()),
            'real_decode': pa.array(real, pa.bool_()),
        })


class FrameSample:
    """Actor-pool stage: video payload → k evenly spaced frames, each
    decoded to pixel stats + hash.

    REAL for MJPEG-in-AVI (:mod:`.videocodec` walks the RIFF
    container, :mod:`.jpegcodec` decodes ONLY the k sampled frames —
    the 100-TB point of frame sampling is never touching the frames
    nobody asked for).  Inter-frame codecs (H.264/VP9/AV1 need
    external decoders) fall back to the deterministic payload-slice
    stub with ``real_decode=False`` (or raise under ``strict=True``).
    """

    def __init__(self, k: int = 4, strict: bool = False):
        self.k = k
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .jpegcodec import decode_jpeg_baseline
        from .videocodec import UnsupportedVideo, decode_mjpeg_avi

        ids = batch.column('media_id').to_pylist()
        payloads = batch.column('payload').to_pylist()
        out_id, out_frame, out_hash, out_mean, out_real = [], [], [], [], []
        for i, p in zip(ids, payloads):
            try:
                jpegs, _fps, _dims = decode_mjpeg_avi(p)
                n = len(jpegs)
                picks = sorted({(f * n) // self.k for f in range(self.k)})
                for fi in picks:
                    arr = decode_jpeg_baseline(jpegs[fi])
                    out_id.append(i)
                    out_frame.append(fi)
                    out_hash.append(hashlib.blake2b(
                        arr.tobytes(), digest_size=8).hexdigest())
                    out_mean.append(float(arr.mean()))
                    out_real.append(True)
            except UnsupportedVideo:
                if self.strict:
                    raise NotImplementedError(
                        'inter-frame video decode requires ffmpeg/pyav '
                        '— not in this container')
                step = max(1, len(p) // self.k)
                for f in range(self.k):
                    chunk = p[f * step:(f + 1) * step]
                    out_id.append(i)
                    out_frame.append(f)
                    out_hash.append(hashlib.blake2b(
                        chunk, digest_size=8).hexdigest())
                    out_mean.append(0.0)
                    out_real.append(False)
        return pa.table({
            'media_id': pa.array(out_id, pa.int64()),
            'frame_idx': pa.array(out_frame, pa.int32()),
            'frame_hash': pa.array(out_hash, pa.string()),
            'mean_pixel': pa.array(out_mean, pa.float64()),
            'real_decode': pa.array(out_real, pa.bool_()),
        })

"""Pure-stdlib PNG/BMP codecs + the real multimodal decode path."""

import numpy as np
import pytest

from webscraping_ray.stages.imagecodec import (UnsupportedImage, decode_bmp,
                                               decode_image, decode_png,
                                               encode_bmp, encode_png)

rng = np.random.default_rng(7)


@pytest.mark.parametrize('channels', [1, 2, 3, 4])
@pytest.mark.parametrize('filter_type', [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(channels, filter_type):
    shape = (13, 17) if channels == 1 else (13, 17, channels)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    data = encode_png(img, filter_type=filter_type)
    out = decode_png(data)
    np.testing.assert_array_equal(out, img)


def test_png_gradient_roundtrip():
    # structured data exercises filter deltas beyond random noise
    y, x = np.mgrid[0:64, 0:48]
    img = np.stack([(x * 4) % 256, (y * 4) % 256, ((x + y) * 2) % 256],
                   axis=-1).astype(np.uint8)
    for ft in range(5):
        np.testing.assert_array_equal(decode_png(encode_png(img, ft)), img)


def test_png_rejects_unsupported():
    with pytest.raises(UnsupportedImage):
        decode_png(b'\xff\xd8\xff\xe0 jpeg-ish')


def test_bmp_roundtrip():
    img = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)
    # odd widths exercise the 4-byte row padding
    img2 = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(img2)), img2)


def test_decode_image_sniffs_format():
    img = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(encode_png(img)), img)
    np.testing.assert_array_equal(decode_image(encode_bmp(img)), img)
    with pytest.raises(UnsupportedImage):
        decode_image(b'RIFF....WEBP')


def test_decode_image_stage_real_path(ray_session):
    """DecodeImage over a Ray dataset of REAL PNG payloads: decodes,
    means match numpy, real_decode flag set; a JPEG-magic payload falls
    back to the stub (or raises in strict mode)."""
    import pyarrow as pa
    import ray.data
    from webscraping_ray.stages.multimodal import DecodeImage

    imgs = [rng.integers(0, 256, size=(16 + i, 12, 3), dtype=np.uint8)
            for i in range(6)]
    payloads = [encode_png(m, filter_type=i % 5) for i, m in enumerate(imgs)]
    payloads.append(b'\xff\xd8\xff\xe0 not decodable here')
    tbl = pa.table({
        'media_id': pa.array(range(7), pa.int64()),
        'kind': pa.array(['image'] * 7, pa.string()),
        'payload': pa.array(payloads, pa.large_binary()),
        'meta_width': pa.array([12] * 7, pa.int32()),
        'meta_height': pa.array([16 + i for i in range(6)] + [8], pa.int32()),
        'meta_duration_ms': pa.array([0] * 7, pa.int32()),
    })
    out = ray.data.from_arrow(tbl).map_batches(
        DecodeImage(), batch_format='pyarrow', batch_size=4,
        concurrency=2).take_all()
    by_id = {r['media_id']: r for r in out}
    for i, m in enumerate(imgs):
        assert by_id[i]['real_decode'] is True
        assert abs(by_id[i]['mean_pixel'] - float(m.mean())) < 1e-9
    assert by_id[6]['real_decode'] is False   # stub fallback

    with pytest.raises(Exception):
        ray.data.from_arrow(tbl).map_batches(
            DecodeImage(strict=True), batch_format='pyarrow').take_all()


def test_jpeg_roundtrip_rgb_and_gray():
    """Baseline JPEG codec (pure numpy Huffman+DCT): encode→decode is
    near-lossless on smooth content at q90, exact shapes, both
    colorspaces, odd sizes."""
    from webscraping_ray.stages.jpegcodec import (decode_jpeg_baseline,
                                                  encode_jpeg_baseline)

    h, w = 40, 56
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([x * 255 // w, y * 255 // h,
                    (x + y) * 255 // (w + h)], axis=-1).astype(np.uint8)
    dec = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=90))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8
    gray = ((x + 2 * y) % 256).astype(np.uint8)
    dg = decode_jpeg_baseline(encode_jpeg_baseline(gray, quality=90))
    assert dg.shape == gray.shape
    assert np.abs(dg.astype(int) - gray.astype(int)).mean() < 2.0
    odd = img[:37, :51]
    do = decode_jpeg_baseline(encode_jpeg_baseline(odd, quality=75))
    assert do.shape == odd.shape


def test_jpeg_rejects_progressive():
    from webscraping_ray.stages.jpegcodec import (UnsupportedJpeg,
                                                  decode_jpeg_baseline,
                                                  encode_jpeg_baseline)

    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg_baseline(img))
    i = data.find(b'\xff\xc0')
    data[i + 1] = 0xC2                     # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(UnsupportedJpeg):
        decode_jpeg_baseline(bytes(data))


def test_decode_image_stage_real_jpeg(ray_session):
    """DecodeImage over REAL baseline-JPEG payloads: real_decode=True
    and the decoded mean tracks the source image."""
    import pyarrow as pa
    import ray.data
    from webscraping_ray.stages.jpegcodec import encode_jpeg_baseline
    from webscraping_ray.stages.multimodal import DecodeImage

    h, w = 32, 24
    y, x = np.mgrid[0:h, 0:w]
    imgs = [np.stack([(x * (i + 3)) % 256, (y * (i + 5)) % 256,
                      (x + y + i) % 256], axis=-1).astype(np.uint8)
            for i in range(4)]
    payloads = [encode_jpeg_baseline(m, quality=90) for m in imgs]
    tbl = pa.table({
        'media_id': pa.array(range(4), pa.int64()),
        'kind': pa.array(['image'] * 4, pa.string()),
        'payload': pa.array(payloads, pa.large_binary()),
        'meta_width': pa.array([w] * 4, pa.int32()),
        'meta_height': pa.array([h] * 4, pa.int32()),
        'meta_duration_ms': pa.array([0] * 4, pa.int32()),
    })
    out = ray.data.from_arrow(tbl).map_batches(
        DecodeImage(strict=True), batch_format='pyarrow',
        batch_size=2).take_all()
    by_id = {r['media_id']: r for r in out}
    for i, m in enumerate(imgs):
        assert by_id[i]['real_decode'] is True
        assert abs(by_id[i]['mean_pixel'] - float(m.mean())) < 3.0


def test_jpeg_420_subsampled_roundtrip():
    """4:2:0 encode (2x2 luma sampling, box-averaged chroma, interleaved
    MCUs) exercises the decoder's general sampling-factor / upsample
    path — near-lossless on smooth gradients, exact odd-size crops."""
    from webscraping_ray.stages.jpegcodec import (decode_jpeg_baseline,
                                                  encode_jpeg_baseline)

    h, w = 48, 64
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([x * 255 // w, y * 255 // h,
                    (x + y) * 255 // (w + h)], axis=-1).astype(np.uint8)
    data = encode_jpeg_baseline(img, quality=90, subsample=True)
    assert len(data) < len(encode_jpeg_baseline(img, quality=90))
    dec = decode_jpeg_baseline(data)
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 12
    odd = img[:45, :61]
    do = decode_jpeg_baseline(encode_jpeg_baseline(odd, 85, subsample=True))
    assert do.shape == odd.shape
    assert np.abs(do.astype(int) - odd.astype(int)).mean() < 4.0


def test_jpeg_random_images_roundtrip():
    """Random-noise images (worst case for DCT) round-trip with bounded
    error at q95 across sizes/parities and both subsampling modes."""
    from webscraping_ray.stages.jpegcodec import (decode_jpeg_baseline,
                                                  encode_jpeg_baseline)

    def luma(a):
        return (0.299 * a[:, :, 0] + 0.587 * a[:, :, 1]
                + 0.114 * a[:, :, 2])

    r = np.random.default_rng(7)
    for hh, ww in [(8, 8), (9, 13), (24, 17), (32, 32)]:
        img = r.integers(0, 256, size=(hh, ww, 3), dtype=np.uint8)
        for sub in (False, True):
            dec = decode_jpeg_baseline(
                encode_jpeg_baseline(img, quality=95, subsample=sub))
            assert dec.shape == img.shape
            if sub:
                # 4:2:0 chroma on noise is lossy BY DESIGN (half-res
                # chroma); luma stays full-resolution and tight
                err = np.abs(luma(dec.astype(np.float64))
                             - luma(img.astype(np.float64))).max()
                assert err <= 48, (hh, ww, err)
            else:
                assert np.abs(dec.astype(int)
                              - img.astype(int)).max() <= 64, (hh, ww)


def test_jpeg_decoder_rejects_garbage_cleanly():
    """Corrupt/truncated inputs raise (UnsupportedJpeg/ValueError/
    struct.error) — never hang or return garbage silently."""
    import struct as _struct

    from webscraping_ray.stages.jpegcodec import (UnsupportedJpeg,
                                                  decode_jpeg_baseline,
                                                  encode_jpeg_baseline)

    r = np.random.default_rng(11)
    img = r.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    good = encode_jpeg_baseline(img, quality=80)
    cases = [
        b'',
        b'\xff\xd8',
        b'\xff\xd8\xff',
        b'not a jpeg at all',
        good[:20],                 # truncated mid-header
        good[:len(good) // 2],     # truncated mid-entropy (may decode
                                   # a prefix or raise — must not hang)
        good[:2] + b'\x00' * 30,
    ]
    for i, data in enumerate(cases):
        try:
            out = decode_jpeg_baseline(data)
            # decoding a truncated entropy stream may succeed with
            # padded bits; the result must still be a sane array
            assert out.ndim in (2, 3) and out.size > 0
        except (UnsupportedJpeg, ValueError, _struct.error, IndexError):
            pass
    # random byte flips in the entropy segment must not hang
    for seed in range(5):
        rr = np.random.default_rng(seed)
        data = bytearray(good)
        for _ in range(4):
            data[rr.integers(30, len(data) - 3)] = rr.integers(0, 256)
        try:
            decode_jpeg_baseline(bytes(data))
        except (UnsupportedJpeg, ValueError, _struct.error, IndexError):
            pass


def test_bilinear_resize_kernel():
    """Analytic cases: constants are invariant, a 1x2 ramp upsampled
    to 1x4 hits the half-pixel-center weights exactly, downsample of a
    2x-tiled image equals the base image, grayscale gets a channel
    axis."""
    from webscraping_ray.stages.multimodal import bilinear_resize

    const = np.full((7, 5, 3), 200, np.uint8)
    assert (bilinear_resize(const, 16, 9) == 200).all()
    assert bilinear_resize(const, 16, 9).shape == (16, 9, 3)

    ramp = np.array([[0, 255]], np.uint8)
    out = bilinear_resize(ramp, 1, 4)[0, :, 0].tolist()
    # xs = [-0.25, .25, .75, 1.25] -> weights [0, .25, .75, 1]
    assert out == [0, 64, 191, 255]

    img = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    doubled = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
    np.testing.assert_array_equal(bilinear_resize(doubled, 8, 6), img)

    gray = rng.integers(0, 256, size=(4, 4), dtype=np.uint8)
    assert bilinear_resize(gray, 2, 2).shape == (2, 2, 1)


def test_resize_image_stage(ray_session):
    """ResizeImage actor stage: real PNG inputs resize via the real
    decode path and the output payload is a decodable 32x32 PNG whose
    pixels equal bilinear_resize applied directly; non-image payloads
    take the stub path with real_decode=False but identical output
    shape."""
    import pyarrow as pa
    import ray.data
    from webscraping_ray.stages.multimodal import (ResizeImage,
                                                   bilinear_resize)

    imgs = [rng.integers(0, 256, size=(16 + i, 12, 3), dtype=np.uint8)
            for i in range(4)]
    payloads = [encode_png(m) for m in imgs] + [b'not an image payload']
    tbl = pa.table({
        'media_id': pa.array(range(5), pa.int64()),
        'kind': pa.array(['image'] * 5, pa.string()),
        'payload': pa.array(payloads, pa.large_binary()),
        'meta_width': pa.array([12] * 5, pa.int32()),
        'meta_height': pa.array([16, 17, 18, 19, 8], pa.int32()),
        'meta_duration_ms': pa.array([0] * 5, pa.int32()),
    })
    out = ray.data.from_arrow(tbl).map_batches(
        ResizeImage(out_h=32, out_w=32), batch_format='pyarrow',
        batch_size=2, concurrency=2).take_all()
    by_id = {r['media_id']: r for r in out}
    for i, m in enumerate(imgs):
        r = by_id[i]
        assert r['real_decode'] is True
        assert (r['width'], r['height']) == (32, 32)
        np.testing.assert_array_equal(decode_image(r['payload']),
                                      bilinear_resize(m, 32, 32))
    assert by_id[4]['real_decode'] is False
    assert decode_image(by_id[4]['payload']).shape == (32, 32, 3)


def test_wav_codec_roundtrip():
    """encode_wav -> decode_wav is exact for mono and stereo int16;
    non-WAV and compressed payloads raise UnsupportedAudio."""
    from webscraping_ray.stages.audiocodec import (UnsupportedAudio,
                                                   decode_wav, encode_wav)

    mono = (np.sin(2 * np.pi * 440 * np.arange(1600) / 16000)
            * 20000).astype(np.int16)
    s, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and s.shape == (1600, 1)
    np.testing.assert_array_equal(s[:, 0], mono)

    stereo = np.stack([mono, -mono], axis=1)
    s2, _ = decode_wav(encode_wav(stereo, 8000))
    np.testing.assert_array_equal(s2, stereo)

    with pytest.raises(UnsupportedAudio):
        decode_wav(b'ID3\x03 an mp3, not a wav' * 4)


def test_audio_features_sine():
    """A pure 440 Hz sine: dominant frequency within one FFT bin of
    440, RMS at the analytic -20*log10(sqrt(2)/amp_ratio) level, zcr
    at ~2*f/rate."""
    from webscraping_ray.stages.audiocodec import audio_features

    rate = 16000
    t = np.arange(rate) / rate
    amp = 0.5
    mono = (np.sin(2 * np.pi * 440 * t) * amp * 32767).astype(np.int16)
    f = audio_features(mono[:, None], rate)
    assert f['duration_ms'] == 1000
    assert abs(f['dominant_hz'] - 440) < rate / 2048 + 1e-9
    expected_rms_dbfs = 20 * np.log10(amp / np.sqrt(2))
    assert abs(f['rms_dbfs'] - expected_rms_dbfs) < 0.05
    assert abs(f['zcr'] - 2 * 440 / rate) < 0.005
    assert f['spectral_centroid_hz'] > 0


def test_audio_features_stage(ray_session):
    """AudioFeatures actor stage: real WAV payloads decode for real
    (feature parity with the kernel), non-WAV rows take the stub with
    real_decode=False; strict mode raises."""
    import pyarrow as pa
    import ray.data
    from webscraping_ray.stages.audiocodec import encode_wav
    from webscraping_ray.stages.multimodal import AudioFeatures

    rate = 8000
    t = np.arange(rate // 2) / rate
    clips = [(np.sin(2 * np.pi * (200 + 100 * i) * t)
              * 16000).astype(np.int16) for i in range(3)]
    payloads = [encode_wav(c, rate) for c in clips] + [b'OggS compressed']
    tbl = pa.table({
        'media_id': pa.array(range(4), pa.int64()),
        'kind': pa.array(['audio'] * 4, pa.string()),
        'payload': pa.array(payloads, pa.large_binary()),
        'meta_width': pa.array([0] * 4, pa.int32()),
        'meta_height': pa.array([0] * 4, pa.int32()),
        'meta_duration_ms': pa.array([500, 500, 500, 777], pa.int32()),
    })
    out = ray.data.from_arrow(tbl).map_batches(
        AudioFeatures(), batch_format='pyarrow', batch_size=2,
        concurrency=2).take_all()
    by_id = {r['media_id']: r for r in out}
    for i in range(3):
        assert by_id[i]['real_decode'] is True
        assert by_id[i]['duration_ms'] == 500
        assert abs(by_id[i]['dominant_hz'] - (200 + 100 * i)) < rate / 2048 + 1e-9
    stub = by_id[3]
    assert stub['real_decode'] is False and stub['duration_ms'] == 777
    assert stub['rms_dbfs'] == -120.0

    with pytest.raises(Exception):
        ray.data.from_arrow(tbl).map_batches(
            AudioFeatures(strict=True), batch_format='pyarrow').take_all()


def test_mjpeg_avi_roundtrip():
    """encode_mjpeg_avi -> decode_mjpeg_avi: frame count, fps and dims
    survive; each frame chunk is a decodable baseline JPEG close to
    its source (flat-color frames quantize near-exactly)."""
    from webscraping_ray.stages.jpegcodec import decode_jpeg_baseline
    from webscraping_ray.stages.videocodec import (UnsupportedVideo,
                                                   decode_mjpeg_avi,
                                                   encode_mjpeg_avi)

    frames = [np.full((32, 48, 3), 40 * i + 20, np.uint8)
              for i in range(5)]
    avi = encode_mjpeg_avi(frames, fps=12, quality=90)
    jpegs, fps, (w, h) = decode_mjpeg_avi(avi)
    assert (len(jpegs), fps, w, h) == (5, 12, 48, 32)
    for j, src in zip(jpegs, frames):
        arr = decode_jpeg_baseline(j)
        assert arr.shape == (32, 48, 3)
        assert abs(float(arr.mean()) - float(src.mean())) < 3.0

    with pytest.raises(UnsupportedVideo):
        decode_mjpeg_avi(b'RIFF\x00\x00\x00\x00WAVE')
    with pytest.raises(UnsupportedVideo):
        decode_mjpeg_avi(b'\x00\x01\x02\x03' * 16)


def test_frame_sample_stage_real_and_stub(ray_session):
    """FrameSample: an MJPEG AVI row yields k evenly spaced REAL
    frames (distinct hashes for distinct-color frames, means near the
    sources); a non-AVI row takes the stub path; strict raises."""
    import pyarrow as pa
    import ray.data
    from webscraping_ray.stages.multimodal import FrameSample
    from webscraping_ray.stages.videocodec import encode_mjpeg_avi

    frames = [np.full((16, 16, 3), 25 * i + 10, np.uint8)
              for i in range(10)]
    avi = encode_mjpeg_avi(frames, fps=5, quality=90)
    tbl = pa.table({
        'media_id': pa.array([0, 1], pa.int64()),
        'kind': pa.array(['video'] * 2, pa.string()),
        'payload': pa.array([avi, b'not a video payload'],
                            pa.large_binary()),
        'meta_width': pa.array([16, 0], pa.int32()),
        'meta_height': pa.array([16, 0], pa.int32()),
        'meta_duration_ms': pa.array([2000, 0], pa.int32()),
    })
    out = ray.data.from_arrow(tbl).map_batches(
        FrameSample(k=4), batch_format='pyarrow', batch_size=1,
        concurrency=2).take_all()
    real = sorted((r for r in out if r['media_id'] == 0),
                  key=lambda r: r['frame_idx'])
    assert [r['frame_idx'] for r in real] == [0, 2, 5, 7]
    assert all(r['real_decode'] for r in real)
    assert len({r['frame_hash'] for r in real}) == 4
    for r in real:
        src = frames[r['frame_idx']]
        assert abs(r['mean_pixel'] - float(src.mean())) < 3.0
    stub = [r for r in out if r['media_id'] == 1]
    assert len(stub) == 4 and not any(r['real_decode'] for r in stub)

    with pytest.raises(Exception):
        ray.data.from_arrow(tbl.slice(1, 1)).map_batches(
            FrameSample(k=2, strict=True),
            batch_format='pyarrow').take_all()

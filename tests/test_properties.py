"""Property-based tests (hypothesis) for the state structures and key
kernels: the queue against a reference model, membership filters, URL
canonicalization invariants."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from webscraping_ray.kernels import text as T
from webscraping_ray.kernels import urls as U
from webscraping_ray.state.cuckoo import BloomFilter, CuckooFilter, ExactSet


keys64 = st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                  min_size=0, max_size=200, unique=True)


@settings(max_examples=50, deadline=None)
@given(keys64, keys64)
def test_filters_membership_properties(added, probed):
    """No false negatives for any filter kind; ExactSet has no false
    positives either."""
    added_arr = np.array(added, dtype=np.uint64)
    probe_arr = np.array(probed, dtype=np.uint64)
    for f in (CuckooFilter(max(16, len(added))),
              BloomFilter(max(16, len(added))),
              ExactSet()):
        f.add_batch(added_arr)
        if len(added):
            assert f.contains_batch(added_arr).all()
        # snapshot/restore preserves membership answers
        g = type(f).restore(f.snapshot())
        if len(probed):
            np.testing.assert_array_equal(g.contains_batch(probe_arr),
                                          f.contains_batch(probe_arr))
    ex = ExactSet()
    ex.add_batch(added_arr)
    if len(probed):
        want = np.array([k in set(added) for k in probed])
        np.testing.assert_array_equal(ex.contains_batch(probe_arr), want)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.text(alphabet='abcdef', min_size=1, max_size=6),
                          st.integers(min_value=0, max_value=9)),
                min_size=0, max_size=30))
def test_queue_matches_model(tmp_path_factory, ops):
    """ParquetQueue pull order == model: priority desc, insertion order
    for ties, each key at most once, duplicates ignored."""
    from webscraping_ray.pipelines.frontier import ParquetQueue

    root = str(tmp_path_factory.mktemp('q'))
    q = ParquetQueue(root)
    q.push(ops)
    model, seen = [], set()
    for i, (k, p) in enumerate(ops):
        if k not in seen:
            seen.add(k)
            model.append((-p, i, k))
    model.sort()
    expect = [k for _, _, k in model]
    got = q.pull(limit=len(ops) + 1)
    assert got == expect


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=80))
def test_normalize_never_raises_and_strips(s):
    out = T.normalize(s)
    assert isinstance(out, str)
    assert out == out.strip(' \t\n\r\f\v')


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               max_size=60))
def test_normalize_url_fixpoint(link):
    """Canonicalizing an already-canonical absolute url is stable for
    plain ascii paths without escapes (the dedup key must be stable)."""
    base = 'http://example.com/'
    try:
        once = U.normalize_url(base, link)
    except Exception:
        return  # urllib may reject malformed ports etc. — not our kernel
    if '%' in once or '&' in once or '#' in once or '/..' in once:
        return  # unescape/defrag legitimately change these again
    twice = U.normalize_url(base, once)
    assert twice == once


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=60))
def test_url_hash_is_stable_and_int64(u):
    h1 = U.url_hash64(u)
    assert h1 == U.url_hash64(u)
    assert -(1 << 63) <= h1 < (1 << 63)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=255),
               max_size=120))
def test_xpath_engine_never_raises(html):
    from webscraping_ray.kernels import xpath as X
    doc = X.Doc(html)
    doc.search('//a/@href')
    doc.get('/div/span')
    X.get_links(html, url='http://e.com/')


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2 ** 31 - 1))
def test_wav_roundtrip_property(n, ch, seed):
    """encode_wav -> decode_wav is exact for any int16 sample block."""
    import numpy as np
    from webscraping_ray.stages.audiocodec import decode_wav, encode_wav

    r = np.random.default_rng(seed)
    samples = r.integers(-32768, 32768, size=(n, min(ch, 2)),
                         dtype=np.int16)
    out, rate = decode_wav(encode_wav(samples, 16000))
    assert rate == 16000
    np.testing.assert_array_equal(out, samples)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 24), st.integers(1, 24), st.integers(1, 24),
       st.integers(1, 24), st.integers(0, 2 ** 31 - 1))
def test_bilinear_resize_property(h, w, oh, ow, seed):
    """Resize output is bounded by the input's min/max (convex
    weights), identity at the same size, constant-preserving."""
    import numpy as np
    from webscraping_ray.stages.multimodal import bilinear_resize

    r = np.random.default_rng(seed)
    img = r.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = bilinear_resize(img, oh, ow)
    assert out.shape == (oh, ow, 3)
    assert out.min() >= img.min() and out.max() <= img.max()
    np.testing.assert_array_equal(bilinear_resize(img, h, w), img)


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 5), st.integers(0, 2 ** 31 - 1))
def test_mjpeg_avi_container_property(n_frames, seed):
    """The AVI container is lossless around the JPEG payloads: the
    frame bytes that went in come back out byte-identical, in order."""
    import numpy as np
    from webscraping_ray.stages.jpegcodec import encode_jpeg_baseline
    from webscraping_ray.stages.videocodec import (decode_mjpeg_avi,
                                                   encode_mjpeg_avi)

    r = np.random.default_rng(seed)
    frames = [r.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
              for _ in range(n_frames)]
    avi = encode_mjpeg_avi(frames, fps=7)
    jpegs, fps, dims = decode_mjpeg_avi(avi)
    assert fps == 7 and dims == (8, 8)
    assert jpegs == [encode_jpeg_baseline(f, quality=85) for f in frames]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2000),
                min_size=0, max_size=30),
       st.integers(min_value=1, max_value=64),
       st.integers(min_value=1, max_value=64))
def test_chunk_spans_matches_naive(ns, window, stride):
    """Vectorized chunk expansion == the naive per-doc loop for any
    token counts / window / stride (stride may exceed window)."""
    from webscraping_ray.pipelines.relational import _chunk_spans

    row, cid, ctok = _chunk_spans(np.array(ns, np.int64), window, stride)

    exp = []
    for i, n in enumerate(ns):
        start, j = 0, 0
        while start < n:
            exp.append((i, j, min(window, n - start)))
            start += stride
            j += 1
    assert list(zip(row.tolist(), cid.tolist(), ctok.tolist())) == exp
    assert (ctok > 0).all() if len(ctok) else True

"""Property tests for the REAL library-free media codecs (round 8):
PNG/PPM encode→decode round-trips over arbitrary small images, WAV
synth→decode over arbitrary durations/rates.  Pure kernels — no Spark.
"""
from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tagminder_spark.sources.multimodal import (
    decode_png,
    decode_ppm,
    decode_wav,
    encode_png,
    encode_ppm,
    make_wav,
)


@st.composite
def images(draw):
    w = draw(st.integers(min_value=1, max_value=24))
    h = draw(st.integers(min_value=1, max_value=24))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@settings(max_examples=40, deadline=None)
@given(images())
def test_png_roundtrip_property(src):
    w, h, got = decode_png(encode_png(src))
    assert (w, h) == (src.shape[1], src.shape[0])
    assert np.array_equal(got, src)


@settings(max_examples=40, deadline=None)
@given(images())
def test_ppm_roundtrip_property(src):
    w, h, got = decode_ppm(encode_ppm(src))
    assert (w, h) == (src.shape[1], src.shape[0])
    assert np.array_equal(got, src)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=2000),
    st.sampled_from([8000, 16000, 44100]),
    st.integers(min_value=0, max_value=1000),
)
def test_wav_roundtrip_property(duration_ms, rate, seed):
    content = make_wav(duration_ms, rate=rate, seed=seed)
    got_rate, nch, samples = decode_wav(content)
    assert (got_rate, nch) == (rate, 1)
    assert samples.shape[0] == max(1, duration_ms * rate // 1000)
    assert samples.dtype.itemsize == 2
    # peak bounded by the synth amplitude
    assert np.abs(samples).max() <= 20000

"""Property tests for the REAL library-free media codecs (round 8):
PNG/PPM encode→decode round-trips over arbitrary small images, WAV
synth→decode over arbitrary durations/rates.  Pure kernels — no Spark.
"""
from __future__ import annotations

import struct

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


# ---------------------------------------------------------------------------
# round 10: baseline JPEG (sources/jpeg.py)


@st.composite
def jpeg_fixed_point_images(draw):
    """Images on the codec's fixed points: 8x8 blocks of even constants
    plus the integer-scaled (0,4) cosine pattern — encode→decode must be
    BIT-exact at quant=16 (the property the oracle gate leans on)."""
    bw = draw(st.integers(min_value=1, max_value=3))
    bh = draw(st.integers(min_value=1, max_value=3))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    sign = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int32)
    img = np.zeros((bh * 8, bw * 8), dtype=np.int32)
    for by in range(bh):
        for bx in range(bw):
            v = int(rng.integers(14, 114)) * 2  # even, 28..226
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v + 2 * np.tile(
                sign, (8, 1)
            )
    return img.astype(np.uint8)


@settings(max_examples=30, deadline=None)
@given(jpeg_fixed_point_images(), st.booleans())
def test_jpeg_fixed_point_roundtrip_exact(src, as_rgb):
    from tagminder_spark.sources.jpeg import decode_jpeg, encode_jpeg

    inp = np.repeat(src[:, :, None], 3, axis=2) if as_rgb else src
    w, h, got = decode_jpeg(encode_jpeg(inp, quant=16))
    assert (w, h) == (src.shape[1], src.shape[0])
    for c in range(3):
        assert np.array_equal(got[:, :, c], src), f"channel {c}"


@settings(max_examples=30, deadline=None)
@given(images())
def test_jpeg_random_roundtrip_bounded_error(src):
    """Arbitrary content at quant=1: lossy but tightly bounded (DCT
    rounding + quantize ±0.5/coef + YCbCr rounding) — and dimensions
    that are NOT multiples of 8 exercise the edge-replication pad."""
    from tagminder_spark.sources.jpeg import decode_jpeg, encode_jpeg

    w, h, got = decode_jpeg(encode_jpeg(src, quant=1))
    assert (w, h) == (src.shape[1], src.shape[0])
    assert np.abs(got.astype(int) - src.astype(int)).max() <= 6


@settings(max_examples=20, deadline=None)
@given(images())
def test_jpeg_gray_roundtrip_tight(src):
    from tagminder_spark.sources.jpeg import decode_jpeg, encode_jpeg

    gray = src[:, :, 0]
    w, h, got = decode_jpeg(encode_jpeg(gray, quant=1))
    assert np.abs(got[:, :, 0].astype(int) - gray.astype(int)).max() <= 2
    assert np.array_equal(got[:, :, 0], got[:, :, 1])


def test_jpeg_rejects_garbage_and_truncation():
    import pytest

    from tagminder_spark.sources.jpeg import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")
    enc = encode_jpeg(np.full((16, 16), 100, dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_jpeg(enc[: len(enc) // 2])


def test_jpeg_routes_through_generic_image_decode():
    """_decode_image_real dispatches FFD8 content to the real JPEG
    decoder (no Pillow in this container — a fallthrough would raise
    NotImplementedError)."""
    from tagminder_spark.sources.jpeg import encode_jpeg
    from tagminder_spark.sources.multimodal import _decode_image_real

    img = np.full((8, 16), 64, dtype=np.uint8)
    w, h, rgb = _decode_image_real(encode_jpeg(img, quant=16))
    assert (w, h) == (16, 8)
    assert np.array_equal(rgb[:, :, 0], img)


# ---------------------------------------------------------------------------
# FLAC (sources/flac.py) — lossless, so every property is bit-exact


@given(
    n=st.integers(1, 3000),
    seed=st.integers(0, 2**31 - 1),
    blocksize=st.sampled_from([192, 256, 576, 1024]),
    force=st.sampled_from([None, "verbatim", "lpc", "escape"]),
)
@settings(max_examples=40, deadline=None)
def test_flac_mono_roundtrip_property(n, seed, blocksize, force):
    from tagminder_spark.sources.flac import decode_flac, encode_flac

    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32768, n).astype(np.int16)
    rate, nch, s = decode_flac(
        encode_flac(x, 8000, blocksize=blocksize, force=force)
    )
    assert (rate, nch) == (8000, 1)
    assert np.array_equal(s[:, 0], x)


@given(
    n=st.integers(2, 1500),
    seed=st.integers(0, 2**31 - 1),
    stereo=st.sampled_from(
        ["independent", "mid-side", "left-side", "right-side"]
    ),
)
@settings(max_examples=30, deadline=None)
def test_flac_stereo_decorrelation_roundtrip(n, seed, stereo):
    from tagminder_spark.sources.flac import decode_flac, encode_flac

    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32768, (n, 2)).astype(np.int16)
    _, nch, s = decode_flac(
        encode_flac(x, 44100, blocksize=256, stereo=stereo)
    )
    assert nch == 2
    assert np.array_equal(s, x)


def test_flac_wasted_bits_and_constant_paths():
    from tagminder_spark.sources.flac import decode_flac, encode_flac

    # every sample has >=3 trailing zero bits -> wasted-bits encoding
    x = (np.arange(-400, 400, dtype=np.int16) * 8).astype(np.int16)
    _, _, s = decode_flac(encode_flac(x, 8000, blocksize=192))
    assert np.array_equal(s[:, 0], x)
    # constant subframes (incl. int16 extremes)
    for v in (0, 1, -1, 32767, -32768):
        c = np.full(500, v, np.int16)
        _, _, s = decode_flac(encode_flac(c, 8000, blocksize=192))
        assert np.array_equal(s[:, 0], c)


def test_flac_crc_and_md5_tamper_rejected():
    import pytest as _pytest

    from tagminder_spark.sources.flac import decode_flac, encode_flac

    x = (np.sin(np.arange(2000) / 7.0) * 9000).astype(np.int16)
    good = encode_flac(x, 8000, blocksize=512)
    # flip one bit in a frame body -> CRC-16 (or header CRC-8) fails
    bad = bytearray(good)
    bad[len(bad) // 2] ^= 0x10
    with _pytest.raises(ValueError):
        decode_flac(bytes(bad))
    # garbage and truncation
    with _pytest.raises(ValueError):
        decode_flac(b"not flac at all")
    with _pytest.raises(ValueError):
        decode_flac(good[: len(good) // 2])


def test_flac_streaminfo_metadata_only():
    from tagminder_spark.sources.flac import encode_flac, flac_streaminfo

    x = np.zeros((1234, 2), np.int16)
    info = flac_streaminfo(encode_flac(x, 48000, blocksize=576))
    assert info["rate"] == 48000
    assert info["channels"] == 2
    assert info["bps"] == 16
    assert info["total_samples"] == 1234
    assert info["min_blocksize"] == info["max_blocksize"] == 576


def test_decode_audio_dispatch_wav_flac_equal():
    """The codec-agnostic dispatcher: the same PCM through WAV and FLAC
    containers decodes to identical samples; unknown containers raise
    (→ chunk_audio's documented fake path)."""
    import pytest as _pytest

    from tagminder_spark.sources.flac import encode_flac
    from tagminder_spark.sources.multimodal import decode_audio, encode_wav

    x = ((np.arange(777) * 131) % 4096 - 2048).astype(np.int16)
    rw, cw, sw = decode_audio(encode_wav(x, 8000))
    rf, cf, sf_ = decode_audio(encode_flac(x, 8000, blocksize=192))
    assert (rw, cw) == (rf, cf) == (8000, 1)
    assert np.array_equal(sw, sf_)
    with _pytest.raises(ValueError):
        decode_audio(b"\x00\x01\x02\x03 definitely not audio")


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF structural parsing (sources/mp4.py)


@given(
    n=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    chunking=st.sampled_from([(1,), (2,), (2, 3), (5, 1, 2)]),
    co64=st.booleans(),
)
@settings(max_examples=30, deadline=None)
def test_mp4_sample_table_roundtrip_property(n, seed, chunking, co64):
    """Mux → resolve → extract is byte-exact for arbitrary payload
    sizes, chunk layouts and both chunk-offset box forms."""
    import hashlib

    from tagminder_spark.sources.mp4 import (
        extract_sample,
        make_mp4,
        mp4_sample_table,
    )

    rng = np.random.default_rng(seed)
    payloads = [
        hashlib.md5(f"{seed}:{i}".encode()).digest()[: 1 + int(v)]
        for i, v in enumerate(rng.integers(0, 16, n))
    ]
    b = make_mp4(payloads, fps=25, timescale=1000,
                 chunk_sizes=chunking, use_co64=co64)
    table = mp4_sample_table(b)
    assert len(table) == n
    for i, entry in enumerate(table):
        assert extract_sample(b, entry) == payloads[i]
    # uniform 40 ms deltas at fps=25
    assert [e[2] for e in table] == [i * 40 for i in range(n)]


def test_mp4_parse_metadata_and_sync_flags():
    from tagminder_spark.sources.mp4 import (
        make_mp4,
        mp4_sample_table,
        parse_mp4,
    )

    payloads = [bytes([i]) * (4 + i) for i in range(9)]
    b = make_mp4(payloads, fps=10, width=320, height=240,
                 codec=b"avc1", sync_every=4)
    info = parse_mp4(b)
    assert info["brand"] == "isom"
    t = info["tracks"][0]
    assert (t["handler"], t["codec"]) == ("vide", "avc1")
    assert (t["width"], t["height"]) == (320, 240)
    assert t["n_samples"] == 9
    assert info["duration_ms"] == 900
    keys = [e[3] for e in mp4_sample_table(b)]
    assert keys == [i % 4 == 0 for i in range(9)]


def test_mp4_garbage_and_truncation_rejected():
    import random

    import pytest as _pytest

    from tagminder_spark.sources.mp4 import (
        make_mp4,
        mp4_sample_table,
        parse_mp4,
    )

    random.seed(1)
    for _ in range(100):
        junk = bytes(
            random.getrandbits(8) for _ in range(random.randint(0, 256))
        )
        with _pytest.raises(ValueError):
            mp4_sample_table(junk)
    good = make_mp4([b"abc", b"defg"], fps=5)
    with _pytest.raises(ValueError):
        parse_mp4(good[: len(good) // 3])


def test_sample_video_frames_real_vs_fake_dispatch(spark):
    """Real MP4 content yields exact mdat sample bytes; non-MP4 bytes
    fall to the deterministic md5 fake — same schema, same fan-out."""
    import hashlib

    from tagminder_spark.sources.mp4 import make_mp4
    from tagminder_spark.sources.multimodal import sample_video_frames

    payloads = [hashlib.md5(f"p{i}".encode()).digest() for i in range(6)]
    mp4 = make_mp4(payloads, fps=10, timescale=1000)  # 100ms deltas
    rows = [
        (1, "video", bytearray(mp4), ("video/mp4", None, None, 600)),
        (2, "video", bytearray(b"not an mp4"),
         ("video/mp4", None, None, 2000)),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, content binary, "
              "meta struct<mime:string,width:int,height:int,"
              "duration_ms:long>"
    )
    out = {
        (r["media_id"], r["frame_idx"]): bytes(r["frame_png"])
        for r in sample_video_frames(media, every_ms=200).collect()
    }
    # real: ticks 0,200,400 -> samples 0,2,4
    for i, j in enumerate((0, 2, 4)):
        assert out[(1, i)] == payloads[j]
    # fake: duration 2000 -> 2 pseudo-frames of md5(media_id:i)
    for i in range(2):
        assert out[(2, i)] == hashlib.md5(f"2:{i}".encode()).digest()


@given(
    n=st.integers(1, 2000),
    seed=st.integers(0, 2**31 - 1),
    stereo=st.sampled_from(["independent", "mid-side"]),
)
@settings(max_examples=20, deadline=None)
def test_flac_24bit_roundtrip_property(n, seed, stereo):
    """24-bit FLAC: wider subframes, side channel at 25 bits, and the
    3-byte-per-sample MD5 packing — all bit-exact."""
    from tagminder_spark.sources.flac import (
        decode_flac,
        encode_flac,
        flac_streaminfo,
    )

    rng = np.random.default_rng(seed)
    shape = (max(n, 2), 2) if stereo != "independent" else n
    x = rng.integers(-(1 << 23), 1 << 23, shape).astype(np.int32)
    b = encode_flac(x, 96000, blocksize=256, bits=24, stereo=stereo)
    assert flac_streaminfo(b)["bps"] == 24
    _, _, s = decode_flac(b)
    assert s.dtype == np.int32
    assert np.array_equal(s if x.ndim == 2 else s[:, 0], x)


def test_mp4_audio_track_m4a_shape():
    """handler="soun" muxes and resolves an m4a-shaped audio track
    (smhd + AudioSampleEntry); the default video lookup correctly
    reports no track."""
    import hashlib

    import pytest as _pytest

    from tagminder_spark.sources.mp4 import (
        extract_sample,
        make_mp4,
        mp4_sample_table,
        parse_mp4,
    )

    payloads = [hashlib.md5(f"au{i}".encode()).digest() for i in range(7)]
    b = make_mp4(payloads, fps=5, handler="soun", codec=b"mp4a")
    info = parse_mp4(b)
    t = info["tracks"][0]
    assert (t["handler"], t["codec"]) == ("soun", "mp4a")
    table = mp4_sample_table(b, handler="soun")
    assert [extract_sample(b, e) for e in table] == payloads
    with _pytest.raises(ValueError):
        mp4_sample_table(b)  # no video track


# ---------------------------------------------------------------------------
# GIF (sources/gif.py) — lossless on palette indices, bit-exact


@given(
    seed=st.integers(0, 2**31 - 1),
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    n_colors=st.integers(2, 256),
    interlace=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_gif_roundtrip_property(seed, w, h, n_colors, interlace):
    from tagminder_spark.sources.gif import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = np.unique(
        rng.integers(0, 256, (n_colors, 3)).astype(np.uint8), axis=0
    )
    img = pal[rng.integers(0, pal.shape[0], (h, w))]
    got_w, got_h, got = decode_gif(encode_gif(img, interlace=interlace))
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(got, img)


def test_gif_lzw_dict_overflow_and_limits():
    import pytest as _pytest

    from tagminder_spark.sources.gif import decode_gif, encode_gif

    rng = np.random.default_rng(11)
    # large noisy image -> LZW dictionary overflows 4096 and resets
    noise = rng.integers(0, 16, (640, 200)).astype(np.uint8)
    img = np.stack([noise * 16] * 3, axis=-1)
    _, _, got = decode_gif(encode_gif(img))
    assert np.array_equal(got, img)
    # >256 unique colors rejected at encode
    grad = np.arange(512, dtype=np.int64) % 300
    too_many = np.stack(
        [grad % 256, grad // 2, grad % 97], axis=-1
    ).astype(np.uint8).reshape(16, 32, 3)
    if np.unique(too_many.reshape(-1, 3), axis=0).shape[0] > 256:
        with _pytest.raises(ValueError):
            encode_gif(too_many)
    # garbage / truncation rejected
    with _pytest.raises(ValueError):
        decode_gif(b"not a gif")
    good = encode_gif(img[:8, :8])
    with _pytest.raises((ValueError, IndexError, struct.error)):
        decode_gif(good[: len(good) // 2])


def test_gif_routes_through_generic_image_decode():
    from tagminder_spark.sources.gif import encode_gif
    from tagminder_spark.sources.multimodal import _decode_image_real

    img = np.zeros((6, 9, 3), np.uint8)
    img[:, :, 0] = 200
    w, h, rgb = _decode_image_real(encode_gif(img))
    assert (w, h) == (9, 6)
    assert np.array_equal(rgb, img)


def test_sample_video_frames_truncated_mdat_falls_back_atomically(spark):
    """A truncated mdat whose sample table points past the stream end
    raises mid-extraction — the fallback must be ATOMIC: all rows for
    that media come from the fake path, never a mix of real
    early-tick rows and fake frame_idx duplicates."""
    import hashlib
    import struct

    import pytest as _pytest

    from tagminder_spark.sources.mp4 import make_mp4
    from tagminder_spark.sources.multimodal import sample_video_frames

    from tagminder_spark.sources.mp4 import (
        extract_sample,
        mp4_sample_table,
    )

    payloads = [hashlib.md5(f"t{i}".encode()).digest() for i in range(6)]
    mp4 = make_mp4(payloads, fps=10, timescale=1000)  # 100ms deltas
    # doctor sample 4's stsz entry (all six are 16) to a huge size: the
    # sample TABLE still parses, ticks 0 and 200 extract fine, and the
    # raise happens MID-LOOP at tick 400 — the exact ADVICE scenario
    sizes = struct.pack(">I", 16) * 6
    at = mp4.index(sizes)
    doctored = (
        mp4[: at + 16] + struct.pack(">I", 1 << 24) + mp4[at + 20:]
    )
    table = mp4_sample_table(doctored)  # parses: failure is per-sample
    assert extract_sample(doctored, table[0]) == payloads[0]
    with _pytest.raises(ValueError):
        extract_sample(doctored, table[4])
    rows = [
        (7, "video", bytearray(doctored),
         ("video/mp4", None, None, 900)),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, content binary, "
              "meta struct<mime:string,width:int,height:int,"
              "duration_ms:long>"
    )
    got = sorted(
        (r["frame_idx"], bytes(r["frame_png"]))
        for r in sample_video_frames(media, every_ms=200).collect()
    )
    # fake path: duration 900 -> 4 pseudo-frames, md5(media_id:i) each;
    # no duplicate frame_idx, no real payload bytes anywhere
    assert [i for i, _ in got] == [0, 1, 2, 3]
    for i, png in got:
        assert png == hashlib.md5(f"7:{i}".encode()).digest()
        assert png not in payloads


@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    ch=st.sampled_from([1, 2, 3, 4]),
    depth=st.sampled_from([8, 16]),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_16bit_interlace_roundtrip_property(
    h, w, ch, depth, interlace, seed
):
    """Round 11: 16-bit depth and Adam7 interlace roundtrip
    bit-exact through encode_png/decode_png (raw_samples), including
    degenerate sizes where several Adam7 passes are empty."""
    from tagminder_spark.sources.multimodal import decode_png, encode_png

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << depth, size=(h, w, ch)).astype(
        np.uint16 if depth == 16 else np.uint8
    )
    b = encode_png(a, filters="cycle", depth=depth, interlace=interlace)
    W, H, px = decode_png(b, raw_samples=True)
    assert (W, H) == (w, h)
    assert np.array_equal(px, a)
    # 8-bit view: 16-bit samples reduce to the high byte
    _w2, _h2, rgb = decode_png(b)
    want = (a >> 8).astype(np.uint8) if depth == 16 else a
    if ch == 3:
        assert np.array_equal(rgb, want)
    elif ch == 4:
        assert np.array_equal(rgb, want[:, :, :3])
    elif ch in (1, 2):
        assert np.array_equal(rgb[:, :, 0], want[:, :, 0])
        assert np.array_equal(rgb[:, :, 1], want[:, :, 0])


# ---------------------------------------------------------------------------
# round 11: progressive JPEG (SOF2)


@settings(max_examples=30, deadline=None)
@given(images(), st.sampled_from([1, 16]))
def test_jpeg_progressive_equals_baseline_property(src, quant):
    """Progressive encode→decode is BIT-identical to the baseline
    pipeline on the same input: successive approximation (magnitude
    shift + one correction bit) reconstructs every quantized
    coefficient exactly, so the two mode's reconstructions cannot
    differ by even one pixel."""
    from tagminder_spark.sources.jpeg import decode_jpeg, encode_jpeg

    b = decode_jpeg(encode_jpeg(src, quant=quant))
    p = decode_jpeg(encode_jpeg(src, quant=quant, progressive=True))
    assert b[:2] == p[:2]
    assert np.array_equal(b[2], p[2])


@settings(max_examples=20, deadline=None)
@given(jpeg_fixed_point_images(), st.booleans())
def test_jpeg_progressive_fixed_point_exact(src, as_rgb):
    """The codec fixed points stay bit-exact through the six-scan
    progressive script (DC first/refine + AC first/refine with EOB
    runs and correction bits)."""
    from tagminder_spark.sources.jpeg import decode_jpeg, encode_jpeg

    inp = np.repeat(src[:, :, None], 3, axis=2) if as_rgb else src
    w, h, got = decode_jpeg(
        encode_jpeg(inp, quant=16, progressive=True)
    )
    assert (w, h) == (src.shape[1], src.shape[0])
    for c in range(3):
        assert np.array_equal(got[:, :, c], src), f"channel {c}"


def test_jpeg_progressive_truncation_and_dispatch():
    import pytest as _pytest

    from tagminder_spark.sources.jpeg import decode_jpeg, encode_jpeg
    from tagminder_spark.sources.multimodal import _decode_image_real

    img = np.full((16, 24), 90, dtype=np.uint8)
    enc = encode_jpeg(img, quant=16, progressive=True)
    assert enc[:2] == b"\xff\xd8"
    # SOF2 marker present
    assert b"\xff\xc2" in enc
    with _pytest.raises(ValueError):
        decode_jpeg(enc[: len(enc) * 2 // 3])
    w, h, rgb = _decode_image_real(enc)
    assert (w, h) == (24, 16)
    assert np.array_equal(rgb[:, :, 0], img)


@settings(max_examples=25, deadline=None)
@given(
    images(),
    st.sampled_from([1, 2, 3, 5]),
    st.booleans(),
)
def test_jpeg_restart_intervals_exact(src, ri, progressive):
    """DRI/RSTn round-trips bit-exactly in BOTH modes: predictors and
    EOB runs reset at every interval boundary (an EOB run may not
    cross a restart — the encoder flushes it), markers sit outside
    the entropy coding, and the reconstruction equals the
    no-restart reference."""
    from tagminder_spark.sources.jpeg import decode_jpeg, encode_jpeg

    ref = decode_jpeg(encode_jpeg(src, quant=1))
    got = decode_jpeg(
        encode_jpeg(src, quant=1, progressive=progressive,
                    restart_interval=ri)
    )
    assert ref[:2] == got[:2]
    assert np.array_equal(ref[2], got[2])


def test_jpeg_progressive_sparse_spectra_directed():
    """Directed AC-refinement edges: >15 zero-history runs forcing ZRL
    symbols WITH mid-span correction bits, newly-significant at the
    band edge (k=63), and a bare high-frequency coefficient — each
    crafted in the coefficient domain so the exact path is known."""
    from tagminder_spark.sources import jpeg as J

    C = J._dct_matrix()

    def img_from_zz(zzvals, quant=16):
        coef = np.zeros((8, 8))
        for k, v in zzvals.items():
            r, c = J._ZIGZAG[k]
            coef[r, c] = v * quant
        f = C.T @ coef @ C
        return np.clip(np.round(f + 128), 0, 255).astype(np.uint8)

    cases = [
        {2: 3, 30: 2, 40: 1, 63: 1},   # ZRL spans + corrections
        {1: 1, 20: -1, 21: 3, 60: -1},
        {5: -3, 6: 2, 25: 1, 26: 1, 27: -1, 63: -3},
        {63: 1},                        # lone band-edge newly-significant
        {1: -1},
    ]
    for zz in cases:
        img = img_from_zz(zz)
        # the pattern must survive quantization exactly (fixed point)
        f = img.astype(float) - 128.0
        q = np.round((C @ f @ C.T) / 16).astype(int)
        got = {k: int(q[J._ZIGZAG[k]]) for k in range(64)
               if q[J._ZIGZAG[k]] != 0}
        assert got == zz, got
        base = J.decode_jpeg(J.encode_jpeg(img, quant=16))
        for ri in (0, 1):
            prog = J.decode_jpeg(
                J.encode_jpeg(img, quant=16, progressive=True,
                              restart_interval=ri)
            )
            assert np.array_equal(base[2], prog[2]), (zz, ri)


@settings(max_examples=20, deadline=None)
@given(
    images(),
    st.sampled_from([((1, 63),), ((1, 5), (6, 63)),
                     ((1, 5), (6, 20), (21, 63))]),
    st.integers(1, 3),
    st.integers(1, 2),
    st.sampled_from([0, 3]),
)
def test_jpeg_progressive_deep_scripts_exact(
    src, ac_bands, ac_levels, dc_levels, ri
):
    """Real-encoder-shaped scripts: banded spectral selection and
    multi-level successive approximation (libjpeg's default
    progressive script is the (1,5)/(6,63) Al=2 shape).  Any band
    split x approximation depth x restart interval must reconstruct
    bit-identically to baseline — the decoder never saw OUR script, it
    just follows the SOS headers."""
    from tagminder_spark.sources.jpeg import decode_jpeg, encode_jpeg

    ref = decode_jpeg(encode_jpeg(src, quant=1))
    got = decode_jpeg(
        encode_jpeg(src, quant=1, progressive=True,
                    restart_interval=ri, ac_bands=ac_bands,
                    ac_levels=ac_levels, dc_levels=dc_levels)
    )
    assert np.array_equal(ref[2], got[2])

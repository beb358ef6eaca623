"""WavPack lossless codec (round 13, VERDICT r12 #5): words entropy
coder (medians, holding phase, zero runs, LIMIT_ONES escape),
decorrelation passes incl. cross-channel terms, joint stereo, block
framing + CRC, the encoder twin, and the ``decode_audio`` route.
Like Vorbis/Opus, no third-party encoder exists in this container, so
evidence is twin round-trips + hand-built bitstream vectors
(documented caveat)."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tagminder_spark.sources.wavpack import (
    _BitsLSB,
    _BitsWLSB,
    _WordsDecoder,
    _encode_words,
    _read_code,
    _read_egc,
    _restore_weight,
    _store_weight,
    _write_code,
    _write_egc,
    decode_wavpack,
    encode_wavpack,
    wp_exp2,
    wp_log2,
)


# ---------------------------------------------------------------------------
# primitive layers


def test_bitstream_lsb_first_order():
    bw = _BitsWLSB()
    bw.write(0b1011, 4)   # LSB first: bits 1,1,0,1
    bw.write1(1)
    data = bw.getvalue()
    assert data == bytes([0b11011])
    br = _BitsLSB(data)
    assert br.read(4) == 0b1011
    assert br.read1() == 1
    with pytest.raises(EOFError):
        _BitsLSB(b"").read1()


@given(st.integers(0, 10 ** 9))
@settings(max_examples=200, deadline=None)
def test_egc_round_trip(v):
    bw = _BitsWLSB()
    _write_egc(bw, v)
    assert _read_egc(_BitsLSB(bw.getvalue())) == v


@given(st.integers(0, 1 << 20), st.integers(0, 1 << 20))
@settings(max_examples=200, deadline=None)
def test_read_write_code_round_trip(a, b):
    maxcode = max(a, b)
    value = min(a, b)
    bw = _BitsWLSB()
    _write_code(bw, value, maxcode)
    assert _read_code(_BitsLSB(bw.getvalue()), maxcode) == value


def test_code_length_is_rounded_binary():
    # maxcode 5 -> bitcount 3, extras 2: values 0,1 take 2 bits,
    # values 2..5 take 3
    for value, bits in [(0, 2), (1, 2), (2, 3), (5, 3)]:
        bw = _BitsWLSB()
        _write_code(bw, value, 5)
        total = len(bw.buf) * 8 + bw.nacc
        assert total == bits, (value, total)


@given(st.integers(0, 70000))
@settings(max_examples=200, deadline=None)
def test_wp_log2_exp2_idempotent_on_grid(v):
    """exp2(log2(v)) is close to v (one-byte mantissa), and exact
    round-trip on its own grid: exp2(log2(exp2(l))) == exp2(l)."""
    l = wp_log2(v)
    w = wp_exp2(l)
    assert abs(w - v) <= max(2, v >> 7)
    assert wp_exp2(wp_log2(w)) == w


def test_weight_store_restore_fixpoint():
    for w in range(-1024, 1025, 7):
        b = _store_weight(w)
        r = _restore_weight(b)
        assert -1024 <= r <= 1024 + 16
        # restoring a restored weight's stored byte is a fix point
        assert _restore_weight(_store_weight(r)) == r


# ---------------------------------------------------------------------------
# words coder


@pytest.mark.parametrize("nch", [1, 2])
@pytest.mark.parametrize("style", ["small", "spikes", "noise",
                                   "zeros", "half"])
def test_words_round_trip(nch, style):
    rng = np.random.default_rng(hash((nch, style)) % (2 ** 31))
    n = 600 * nch
    if style == "small":
        vals = rng.integers(-5, 6, n)
    elif style == "spikes":
        vals = np.zeros(n, dtype=int)
        idx = rng.integers(0, n, n // 25)
        vals[idx] = rng.integers(-32000, 32000, len(idx))
    elif style == "noise":
        vals = rng.integers(-32768, 32768, n)
    elif style == "zeros":
        vals = np.zeros(n, dtype=int)
    else:
        vals = np.concatenate(
            [np.zeros(n // 2, dtype=int),
             rng.integers(-200, 200, n - n // 2)]
        )
    vals = [int(v) for v in vals]
    med0 = [[wp_exp2(wp_log2(16))] * 3 for _ in range(nch)]
    blob = _encode_words(vals, nch, [list(m) for m in med0])
    dec = _WordsDecoder([list(m) for m in med0])
    br = _BitsLSB(blob)
    assert [dec.get(br, i % nch) for i in range(len(vals))] == vals


def test_words_limit_ones_escape():
    """A huge outlier right after tiny medians forces ones_count past
    LIMIT_ONES and through the Elias escape."""
    vals = [0] * 64 + [32767, -32768] + [0] * 64
    med0 = [[wp_exp2(wp_log2(16))] * 3]
    blob = _encode_words(vals, 1, [list(m) for m in med0])
    dec = _WordsDecoder([list(m) for m in med0])
    br = _BitsLSB(blob)
    assert [dec.get(br, 0) for i in range(len(vals))] == vals


# ---------------------------------------------------------------------------
# full codec


@pytest.mark.parametrize("nch", [1, 2])
@pytest.mark.parametrize("joint", [True, False])
def test_codec_round_trip(nch, joint):
    rng = np.random.default_rng(nch * 10 + joint)
    t = np.arange(1500)
    base = (4000 * np.sin(t / 17) + rng.integers(-50, 50, len(t)))
    x = np.stack(
        [base, 0.6 * base + 100][:nch], axis=1
    ).astype(np.int16)
    blob = encode_wavpack(x, 44100, block_samples=512, joint=joint)
    rate, ch, y = decode_wavpack(blob)
    assert (rate, ch) == (44100, nch)
    assert np.array_equal(y, x)
    # multi-block framing: 1500 frames at 512/block = 3 blocks
    assert blob.count(b"wvpk") == 3


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 300), st.integers(1, 2),
       st.integers(0, 2 ** 32 - 1), st.booleans())
def test_codec_round_trip_property(frames, nch, seed, joint):
    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32767, size=(frames, nch), dtype=np.int16)
    rate, ch, y = decode_wavpack(
        encode_wavpack(x, 8000, block_samples=128, joint=joint)
    )
    assert (rate, ch) == (8000, nch)
    assert np.array_equal(y, x)


def test_crc_detects_tamper():
    x = np.arange(-500, 500, dtype=np.int16).reshape(-1, 1)
    blob = bytearray(encode_wavpack(x, 8000))
    blob[-3] ^= 0x40  # flip a bit inside the last bitstream
    with pytest.raises(ValueError, match="CRC|truncated"):
        decode_wavpack(bytes(blob))


def test_unsupported_modes_raise():
    x = np.zeros((16, 1), dtype=np.int16)
    blob = bytearray(encode_wavpack(x, 8000))
    flags = struct.unpack("<I", blob[24:28])[0]
    for bad in (0x8, 0x80, 0x2):  # hybrid, float, 24-bit
        b2 = bytearray(blob)
        newf = (flags & ~0x3 | 0x2) if bad == 0x2 else (flags | bad)
        b2[24:28] = struct.pack("<I", newf)
        with pytest.raises(ValueError):
            decode_wavpack(bytes(b2))
    with pytest.raises(ValueError):
        decode_wavpack(b"NOTW" + bytes(28))
    with pytest.raises(ValueError, match="rate"):
        encode_wavpack(x, 44111)


def test_trailing_apev2_tag_ignored():
    from tagminder_spark.sources.audiotags.synth import build_apev2

    x = np.arange(0, 64, dtype=np.int16).reshape(-1, 1)
    blob = encode_wavpack(x, 8000) + build_apev2({"title": "t"})
    rate, ch, y = decode_wavpack(blob)
    assert np.array_equal(y, x)


def test_tag_layer_reads_twin_header():
    """The existing tag-layer header parse agrees with the encoder
    twin's header fields."""
    from tagminder_spark.sources.audiotags.apetag import wavpack_info

    x = np.zeros((44100 * 2, 2), dtype=np.int16)
    info = wavpack_info(encode_wavpack(x, 44100))
    assert info["channels"] == 2
    assert info["bits_per_sample"] == 16
    assert info["sample_rate"] == 44100
    assert round(info["length"]) == 2


def test_decode_audio_routes_wvpk():
    from tagminder_spark.sources.multimodal import decode_audio

    x = np.arange(-300, 300, dtype=np.int16).reshape(-1, 2)
    rate, ch, y = decode_audio(encode_wavpack(x, 16000))
    assert (rate, ch) == (16000, 2)
    assert np.array_equal(np.asarray(y, np.int16), x)


def test_chunk_audio_real_path_over_wavpack(spark):
    """chunk_audio reaches sample-accurate PCM ranges through the
    real WavPack decode (the VERDICT r12 #5 'done' shape)."""
    from tagminder_spark.sources.multimodal import chunk_audio

    rng = np.random.default_rng(4)
    x = rng.integers(-32768, 32767, size=(512, 1), dtype=np.int16)
    blob = encode_wavpack(x, 8000)  # 512 frames @8k = 64 ms
    media = spark.createDataFrame(
        [(1, "audio", bytearray(blob))],
        "media_id long, kind string, content binary",
    )
    rows = sorted(
        chunk_audio(media, window_ms=40, hop_ms=30).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["start_ms"] for r in rows] == [0, 30, 60]
    got0 = np.frombuffer(bytes(rows[0]["chunk_bytes"]), dtype="<i2")
    assert np.array_equal(got0, x[: 40 * 8000 // 1000].ravel())
    got2 = np.frombuffer(bytes(rows[2]["chunk_bytes"]), dtype="<i2")
    assert np.array_equal(got2, x[60 * 8000 // 1000:].ravel())


def test_fuzz_single_bit_mutations_never_crash():
    """Any single-bit corruption of a valid stream either decodes
    (the flip may land in padding) or raises ValueError/EOFError —
    never IndexError/KeyError (fuzz-found: a weights-metadata size
    flip used to IndexError past the weight list)."""
    rng = np.random.default_rng(11)
    x = rng.integers(-2000, 2000, size=(120, 2)).astype(np.int16)
    good = bytearray(encode_wavpack(x, 8000, block_samples=64))
    for _ in range(250):
        b2 = bytearray(good)
        pos = int(rng.integers(0, len(b2)))
        b2[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            decode_wavpack(bytes(b2))
        except (ValueError, EOFError):
            pass


def test_fuzz_garbage_streams_raise_valueerror():
    rng = np.random.default_rng(12)
    for _ in range(150):
        n = int(rng.integers(0, 300))
        blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        for prefix in (b"", b"wvpk"):
            try:
                decode_wavpack(prefix + blob)
            except (ValueError, EOFError):
                pass

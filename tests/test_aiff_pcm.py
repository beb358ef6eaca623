"""AIFF / AIFF-C PCM codec (round 13, VERDICT r12 #4): purely
algorithmic big-endian PCM layout (FORM/COMM/SSND, 80-bit extended
sample rate, AIFF-C ``sowt``/``twos`` byte-order variants) — decoder
+ encoder twin round-trips, signed-8-bit/24-bit handling, the
``decode_audio`` route, and ``chunk_audio``'s sample-accurate real
path over AIFF content.  Reference ingests ``.aiff``
(scripts/ingest/tags2db.py:108)."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tagminder_spark.sources.multimodal import (
    decode_aiff,
    decode_audio,
    encode_aiff,
)


def _sig(frames=480, ch=2, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(-32768, 32767, size=(frames, ch), dtype=np.int16)


def test_round_trip_classic_aiff():
    x = _sig()
    blob = encode_aiff(x, 8000)
    assert blob[:4] == b"FORM" and blob[8:12] == b"AIFF"
    rate, ch, y = decode_aiff(blob)
    assert (rate, ch) == (8000, 2)
    assert y.dtype == np.dtype(">i2")
    assert np.array_equal(y, x)


@pytest.mark.parametrize("comp", [b"twos", b"sowt"])
def test_round_trip_aifc_variants(comp):
    x = _sig(frames=333, ch=1, seed=comp[0])
    blob = encode_aiff(x, 44100, compression=comp)
    assert blob[8:12] == b"AIFC"
    assert b"FVER" in blob
    rate, ch, y = decode_aiff(blob)
    assert (rate, ch) == (44100, 1)
    assert np.array_equal(np.asarray(y, dtype=np.int16), x)
    # the two byte orders must decode to the SAME samples
    other = b"sowt" if comp == b"twos" else b"twos"
    _, _, y2 = decode_aiff(encode_aiff(x, 44100, compression=other))
    assert np.array_equal(
        np.asarray(y, np.int16), np.asarray(y2, np.int16)
    )


def test_decode_audio_routes_form():
    x = _sig(frames=100, ch=1)
    rate, ch, y = decode_audio(encode_aiff(x, 22050))
    assert (rate, ch) == (22050, 1)
    assert np.array_equal(np.asarray(y, np.int16), x)


def _raw_aiff(comm_payload: bytes, ssnd_payload: bytes,
              form_type: bytes = b"AIFF") -> bytes:
    enc = b""
    for cid, payload in ((b"COMM", comm_payload), (b"SSND", ssnd_payload)):
        enc += cid + struct.pack(">I", len(payload)) + payload
        if len(payload) & 1:
            enc += b"\x00"
    return b"FORM" + struct.pack(">I", 4 + len(enc)) + form_type + enc


def _rate80(r: int) -> bytes:
    e = r.bit_length() - 1
    return struct.pack(">H", 16383 + e) + (
        (r << (63 - e)).to_bytes(8, "big")
    )


def test_signed_8bit_and_24bit_and_ssnd_offset():
    # 8-bit AIFF is SIGNED (unlike WAV's unsigned 8-bit)
    vals8 = np.array([-128, -1, 0, 1, 127], dtype=np.int8)
    comm = struct.pack(">HIH", 1, 5, 8) + _rate80(8000)
    ssnd = struct.pack(">II", 4, 0) + b"\xee" * 4 + vals8.tobytes()
    rate, ch, y = decode_aiff(_raw_aiff(comm, ssnd))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(y.ravel(), vals8)

    # 24-bit big-endian sign-extends into int32
    tr = [(-(1 << 23), b"\x80\x00\x00"), (-1, b"\xff\xff\xff"),
          (0, b"\x00\x00\x00"), (1, b"\x00\x00\x01"),
          ((1 << 23) - 1, b"\x7f\xff\xff")]
    comm = struct.pack(">HIH", 1, len(tr), 24) + _rate80(48000)
    ssnd = struct.pack(">II", 0, 0) + b"".join(b for _v, b in tr)
    rate, ch, y = decode_aiff(_raw_aiff(comm, ssnd))
    assert rate == 48000
    assert y.ravel().tolist() == [v for v, _b in tr]


def test_malformed_aiff_raises_valueerror():
    x = _sig(frames=10, ch=1)
    good = encode_aiff(x, 8000)
    with pytest.raises(ValueError):
        decode_aiff(b"FORM\x00\x00\x00\x04WAVE")
    with pytest.raises(ValueError):
        decode_aiff(good[:40])  # truncated SSND vs COMM frame count
    # unsupported AIFF-C codec is the documented seam
    comm = (struct.pack(">HIH", 1, 4, 16) + _rate80(8000)
            + b"ima4" + b"\x00\x00")
    ssnd = struct.pack(">II", 0, 0) + b"\x00" * 16
    with pytest.raises(ValueError, match="compression"):
        decode_aiff(_raw_aiff(comm, ssnd, b"AIFC"))


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 200), st.integers(1, 3), st.integers(0, 2),
    st.integers(0, 2 ** 32 - 1),
)
def test_round_trip_property(frames, ch, comp_i, seed):
    comp = (b"NONE", b"twos", b"sowt")[comp_i]
    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32767, size=(frames, ch), dtype=np.int16)
    rate, got_ch, y = decode_aiff(
        encode_aiff(x, 11025, compression=comp)
    )
    assert (rate, got_ch) == (11025, ch)
    assert np.array_equal(np.asarray(y, np.int16), x)


def test_chunk_audio_real_path_over_aiff(spark):
    """chunk_audio reaches sample-accurate ranges for AIFF content —
    the VERDICT r12 #4 'done' condition: duration from decoded
    frames, chunk bytes = the exact PCM frame ranges."""
    from tagminder_spark.sources.multimodal import chunk_audio

    x = _sig(frames=512, ch=1, seed=9)  # 512 frames @8k = 64 ms
    blob = encode_aiff(x, 8000)
    media = spark.createDataFrame(
        [(1, "audio", bytearray(blob))],
        "media_id long, kind string, content binary",
    )
    rows = sorted(
        chunk_audio(media, window_ms=40, hop_ms=30).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["start_ms"] for r in rows] == [0, 30, 60]
    got0 = np.frombuffer(bytes(rows[0]["chunk_bytes"]), dtype=">i2")
    assert np.array_equal(got0, x[: 40 * 8000 // 1000].ravel())
    got2 = np.frombuffer(bytes(rows[2]["chunk_bytes"]), dtype=">i2")
    assert np.array_equal(got2, x[60 * 8000 // 1000:].ravel())

"""Bounded-IO parsing: every format parses a multi-megabyte file
correctly while reading only head/tail blocks — the property that turns
a 100 TB library scan into ~1 TB of actual IO."""

from __future__ import annotations

import struct

import pytest

from tagminder_spark.sources.audiotags import parse_audio
from tagminder_spark.sources.audiotags.lazyio import LazyFileBytes
from tagminder_spark.sources.audiotags.synth import (
    build_flac,
    build_id3v23,
    build_mp3_with_xing,
)
from test_audiotags import (
    apev2_tag,
    asf_file,
    atom,
    atom_chunk,
    id3v1_tag,
    id3v2_tag,
    id3v23_frame,
    ilst_text,
    mp3_frame,
    monkeys_file,
    ogg_page,
    ogg_vorbis_file,
    text_payload,
)

MB = 1 << 20
IO_BOUND = int(1.5 * MB)  # generous: a few head blocks + one tail block


def _parse_lazy(tmp_path, name: str, data: bytes):
    p = tmp_path / name
    p.write_bytes(data)
    with LazyFileBytes(str(p)) as lf:
        out = parse_audio(str(p), lf)
        return out, lf.bytes_read, len(data)


def test_big_mp3_cbr(tmp_path):
    """8 MB CBR MP3 (no Xing): duration comes from size arithmetic, so
    only the ID3 tag, a sync-scan window, and the ID3v1 probe are read."""
    tag = build_id3v23({"title": "Big", "artist": "A"})
    n_frames = (8 * MB) // 417 + 10
    data = tag + mp3_frame() * n_frames
    out, nread, total = _parse_lazy(tmp_path, "big.mp3", data)
    assert out["title"] == "Big"
    expect = n_frames * 417 * 8 // 128000
    assert abs(int(out["__length_seconds"]) - expect) <= 1
    assert total > 8 * MB
    assert nread < IO_BOUND, f"read {nread} of {total}"


def test_big_flac(tmp_path):
    meta = build_flac(44100 * 301, [("TITLE", "BigFlac")], audio_bytes=0)
    data = meta + b"\x55" * (9 * MB)
    out, nread, total = _parse_lazy(tmp_path, "big.flac", data)
    assert out["title"] == "BigFlac"
    assert out["__length_seconds"] == "301"
    assert nread < IO_BOUND, f"read {nread} of {total}"


def test_big_ogg(tmp_path):
    head = ogg_vorbis_file(["TITLE=BigOgg"], seconds=0)
    # strip the final granule page from the fixture; re-append at EOF
    # after 7 MB of non-page junk (no 'OggS' inside)
    final = ogg_page(b"\xaa" * 100, granule=44100 * 555, htype=4, seq=9)
    junk = b"\x11\x22\x33\x44" * ((7 * MB) // 4)
    data = head + junk + final
    out, nread, total = _parse_lazy(tmp_path, "big.ogg", data)
    assert out["title"] == "BigOgg"
    assert out["__length_seconds"] == "555"
    assert nread < IO_BOUND, f"read {nread} of {total}"


def test_big_mp4_moov_at_end(tmp_path):
    """The common fast-start-less MP4: giant mdat first, moov at EOF —
    the atom walk seeks past mdat without reading it."""
    mvhd = atom(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, 600, 600 * 77)
        + b"\x00" * 76,
    )
    ilst = atom(b"ilst", ilst_text(b"\xa9nam", "BigM4a"))
    meta = atom(b"meta", b"\x00" * 4 + ilst)
    moov = atom(b"moov", mvhd + atom(b"udta", meta))
    mdat = atom(b"mdat", b"\x00" * (10 * MB))
    data = atom(b"ftyp", b"M4A \x00\x00\x00\x00") + mdat + moov
    out, nread, total = _parse_lazy(tmp_path, "big.m4a", data)
    assert out["title"] == "BigM4a"
    assert out["__length_seconds"] == "77"
    assert nread < IO_BOUND, f"read {nread} of {total}"


def test_big_ape(tmp_path):
    base = monkeys_file({"Title": "BigApe"}, seconds=61)
    # splice 8 MB of audio between the header and the APEv2 tag
    tag = apev2_tag({"Title": "BigApe"})
    head = base[: len(base) - len(tag)]
    data = head + b"\x00" * (8 * MB) + tag
    out, nread, total = _parse_lazy(tmp_path, "big.ape", data)
    assert out["title"] == "BigApe"
    assert out["__length_seconds"] == "61"
    assert nread < IO_BOUND, f"read {nread} of {total}"


def test_big_aiff_with_trailing_id3(tmp_path):
    rate80 = struct.pack(">H", 16383 + 15) + (44100 << 48).to_bytes(8, "big")
    comm = atom_chunk(
        b"COMM", struct.pack(">HIH", 2, 44100 * 12, 16) + rate80
    )
    ssnd = atom_chunk(b"SSND", b"\x00" * (8 * MB))
    id3 = atom_chunk(
        b"ID3 ",
        id3v2_tag(id3v23_frame("TIT2", text_payload(0, "BigAiff"))),
    )
    body = comm + ssnd + id3
    data = b"FORM" + struct.pack(">I", 4 + len(body)) + b"AIFF" + body
    out, nread, total = _parse_lazy(tmp_path, "big.aiff", data)
    assert out["title"] == "BigAiff"
    assert out["__length_seconds"] == "12"
    assert nread < IO_BOUND, f"read {nread} of {total}"


def test_lazy_vs_eager_identical(tmp_path):
    """Same file, lazy view vs full bytes: identical parse output."""
    fixtures = {
        "x.mp3": build_mp3_with_xing(
            {"title": "T", "artist": "A", "genre": "(17)"}, 3840
        ) + id3v1_tag("v1t", "v1a", "v1al", "1999", "c", 3, 17),
        "x.flac": build_flac(44100 * 9, [("TITLE", "F"), ("GENRE", "G")]),
        "x.ogg": ogg_vorbis_file(["TITLE=O"], seconds=21),
        "x.wma": asf_file("W", "WA", "WAL", 2, 120),
    }
    for name, data in fixtures.items():
        eager = parse_audio(name, data)
        out, _, _ = _parse_lazy(tmp_path, name, data)
        assert out == eager, name


def test_lazyfilebytes_protocol(tmp_path):
    p = tmp_path / "blob.bin"
    raw = bytes(range(256)) * 5000  # 1.25 MB, spans multiple blocks
    p.write_bytes(raw)
    with LazyFileBytes(str(p), block=4096, max_cache=4) as lf:
        assert len(lf) == len(raw)
        assert bool(lf)
        assert lf[0] == raw[0] and lf[-1] == raw[-1]
        assert lf[10:20] == raw[10:20]
        assert lf[-300:] == raw[-300:]
        assert lf[4090:4200] == raw[4090:4200]  # cross-block slice
        assert lf[5:5] == b""
        assert lf.startswith(raw[:16])
        needle = bytes([7, 8, 9, 10])
        assert lf.find(needle) == raw.find(needle)
        assert lf.rfind(needle) == raw.rfind(needle)
        assert lf.rfind(needle, 0, 1000) == raw.rfind(needle, 0, 1000)
        # end-boundary exactness: a match straddling `end` is NOT a hit
        # (bytes semantics: the match must lie inside [start, end))
        at = raw.find(needle)
        assert lf.find(needle, 0, at + 2) == raw.find(needle, 0, at + 2) == -1
        assert lf.find(needle, 0, at + 4) == raw.find(needle, 0, at + 4) == at
        last = raw.rfind(needle)
        assert lf.rfind(needle, 0, last + 2) == raw.rfind(needle, 0, last + 2)
        assert lf.rfind(needle, 0, last + 4) == raw.rfind(needle, 0, last + 4) == last
        assert lf.find(b"\xff\xff\xff") == raw.find(b"\xff\xff\xff")
        with pytest.raises(IndexError):
            lf[len(raw)]

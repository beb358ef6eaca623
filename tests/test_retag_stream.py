"""Round-7 retag hardening: plan-based streaming writes, bounded
memory, and the tag-writer correctness fixes (Ogg multi-page safety,
v2.3 encoding choice, COMM/TXXX multivalue, MP4 udta preservation,
parse crash guard)."""

from __future__ import annotations

import struct
import tracemalloc

import pytest

from tagminder_spark.sources.audiotags import parse_audio
from tagminder_spark.sources.audiotags.synth import (
    build_apev2,
    build_flac,
    build_m4a,
    build_mp3_with_xing,
    build_ogg_vorbis,
    pick_id3_encoding,
    retag_bytes,
    retag_file,
    retag_plan,
    _atom,
)
from test_audiotags import (
    aiff_file,
    asf_file,
    id3v2_tag,
    id3v23_frame,
    ogg_page,
    text_payload,
    wavpack_file,
)

TAGS = {"title": "Fresh Title", "artist": "A1\\\\A2", "album": "Al"}


def _sample_files() -> dict[str, bytes]:
    return {
        "mp3": build_mp3_with_xing({"title": "old", "artist": "o"}, 480),
        "flac": build_flac(44100 * 30, [("TITLE", "old")]),
        "ogg": build_ogg_vorbis([("TITLE", "old")], 44100 * 12),
        "m4a": build_m4a({"title": "old"}, 95),
        "aiff": aiff_file(
            seconds=7,
            with_id3=id3v2_tag(id3v23_frame("TIT2", text_payload(0, "old"))),
        ),
        "wma": asf_file("old", "oldA", "oldAL", 9, 240),
        "wv": wavpack_file({"Title": "old"}, seconds=33),
    }


class TestRetagFileStream:
    def test_matches_retag_bytes_every_format(self, tmp_path):
        """retag_file's streamed output must be byte-identical to the
        in-memory retag_bytes on every supported container."""
        for name, data in _sample_files().items():
            expected = retag_bytes(data, TAGS)
            assert expected is not None, name
            p = tmp_path / f"x.{name}"
            p.write_bytes(data)
            assert retag_file(str(p), TAGS) is True, name
            assert p.read_bytes() == expected, name
            out = parse_audio(str(p), p.read_bytes())
            assert out["title"] == "Fresh Title", name

    def test_unsupported_returns_false_and_leaves_file(self, tmp_path):
        p = tmp_path / "x.bin"
        p.write_bytes(b"\x00" * 600)
        assert retag_file(str(p), TAGS) is False
        assert p.read_bytes() == b"\x00" * 600
        assert not (tmp_path / "x.bin.tmwrite").exists()

    def test_plan_spans_cover_audio_not_bytes(self):
        """The audio region must ride as a source span, not a
        materialized copy — that's the whole memory story."""
        for name, data in _sample_files().items():
            plan = retag_plan(data, TAGS)
            span_bytes = sum(
                e - s for seg in plan if isinstance(seg, tuple)
                for s, e in [seg]
            )
            literal = sum(
                len(seg) for seg in plan if isinstance(seg, (bytes, bytearray))
            )
            assert span_bytes > 0, name
            # literal bytes = tag sections only; far smaller than audio
            # for anything but these tiny synthetic files
            assert literal < len(data) + 4096, name

    def test_bounded_memory_on_256mb_file(self, tmp_path):
        """VERDICT r6 #1: retagging a >=256 MB file must not buffer the
        file — peak Python allocation during retag_file stays under
        16 MiB."""
        p = tmp_path / "big.flac"
        head = build_flac(44100 * 3600, [("TITLE", "concert")],
                          audio_bytes=0)
        with open(p, "wb") as fh:
            fh.write(head)
            block = b"\xa5" * (1 << 20)
            for _ in range(256):
                fh.write(block)
        del block
        size_before = p.stat().st_size
        assert size_before >= 256 * (1 << 20)
        tracemalloc.start()
        tracemalloc.reset_peak()
        assert retag_file(str(p), TAGS) is True
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert peak < 16 * (1 << 20), f"peak {peak/1e6:.1f} MB"
        # audio preserved, tags replaced
        out = parse_audio(str(p), p.read_bytes())
        assert out["title"] == "Fresh Title"
        with open(p, "rb") as fh:
            fh.seek(-1 << 20, 2)
            assert fh.read(16) == b"\xa5" * 16


class TestOggMultiPageSafety:
    """ADVICE r6 (high): a comment packet spanning multiple pages must
    NOT be spliced — the continuation page would be orphaned and the
    setup header lost."""

    def _vorbis_ident(self) -> bytes:
        return (
            b"\x01vorbis" + struct.pack("<IB", 0, 2)
            + struct.pack("<IiiiB", 44100, 0, 112000, 0, 0x66) + b"\x01"
        )

    def _raw_page(self, payload: bytes, lacing: bytes, htype: int,
                  seq: int) -> bytes:
        hdr = (
            b"OggS\x00" + bytes([htype]) + struct.pack("<q", 0)
            + struct.pack("<III", 7, seq, 0)
            + bytes([len(lacing)]) + lacing
        )
        return hdr + payload

    def test_spanning_comment_packet_bails(self):
        # comment packet of 300 bytes split 255+45 across two pages:
        # page 1 ends with lacing 255 (packet continues), page 2 has
        # the continued-packet flag set and carries the setup header
        comment = (b"\x03vorbis" + b"C" * 293)
        setup = b"\x05vorbis" + b"S" * 40
        page1 = self._raw_page(comment[:255], bytes([255]), 0, 1)
        lac2 = bytes([45, len(setup)])
        page2 = self._raw_page(comment[255:] + setup, lac2, 1, 2)
        data = (
            ogg_page(self._vorbis_ident(), htype=2)
            + page1 + page2
            + ogg_page(b"\xaa" * 64, granule=44100, htype=4, seq=3)
        )
        assert retag_bytes(data, TAGS) is None

    def test_continuation_flag_alone_bails(self):
        # malformed: page 1 lacing claims complete, page 2 still flags
        # continuation — belt-and-braces check must trip
        comment = b"\x03vorbis" + struct.pack("<I", 1) + b"v" + struct.pack("<I", 0) + b"\x01"
        page1 = self._raw_page(comment, bytes([len(comment)]), 0, 1)
        page2 = self._raw_page(b"\x05vorbis" + b"S" * 8,
                               bytes([15]), 1, 2)
        data = (
            ogg_page(self._vorbis_ident(), htype=2)
            + page1 + page2
            + ogg_page(b"\xaa" * 64, granule=44100, htype=4, seq=3)
        )
        assert retag_bytes(data, TAGS) is None

    def test_setup_on_own_later_page_is_safe(self):
        # comment complete on its page, setup alone on the next page
        # (no continuation): splice is legal, setup page untouched
        comment = b"\x03vorbis" + struct.pack("<I", 1) + b"v" + struct.pack("<I", 0) + b"\x01"
        setup = b"\x05vorbis" + b"S" * 24
        data = (
            ogg_page(self._vorbis_ident(), htype=2)
            + ogg_page(comment, seq=1)
            + ogg_page(setup, seq=2)
            + ogg_page(b"\xaa" * 64, granule=44100, htype=4, seq=3)
        )
        out = retag_bytes(data, TAGS)
        assert out is not None
        assert setup in out  # setup page preserved verbatim
        parsed = parse_audio("x.ogg", out)
        assert parsed["title"] == "Fresh Title"


class TestId3EncodingChoice:
    """ADVICE r6 (medium): enc 3 (UTF-8) is v2.4-only; v2.3 output must
    use latin-1 when it fits, UTF-16 otherwise."""

    def test_picker(self):
        assert pick_id3_encoding({"title": "Plain"}, 3) == 0
        assert pick_id3_encoding({"title": "Tiësto 日本"}, 3) == 1
        assert pick_id3_encoding({"title": "Plain"}, 4) == 3
        assert pick_id3_encoding({"title": "Tiësto 日本"}, 4) == 3

    def _frame_encs(self, data: bytes) -> set[int]:
        """Text-encoding bytes of every T/COMM frame in a v2.3 tag."""
        from tagminder_spark.sources.audiotags._bits import be_int, syncsafe
        size = syncsafe(data[6:10])
        body = data[10:10 + size]
        pos, encs = 0, set()
        while pos + 10 <= len(body):
            fid = body[pos:pos + 4].decode("latin-1")
            fsize = (
                syncsafe(body[pos + 4:pos + 8]) if data[3] >= 4
                else be_int(body[pos + 4:pos + 8])
            )
            if not fid.strip("\x00").strip() or fsize <= 0:
                break
            if fid[0] == "T" or fid == "COMM":
                encs.add(body[pos + 10])
            pos += 10 + fsize
        return encs

    def test_v23_ascii_uses_latin1(self):
        mp3 = build_mp3_with_xing({"title": "old"}, 480)
        out = retag_bytes(mp3, {"title": "Plain", "comment": "c"})
        assert self._frame_encs(out) == {0}
        assert parse_audio("x.mp3", out)["title"] == "Plain"

    def test_v23_unicode_uses_utf16(self):
        mp3 = build_mp3_with_xing({"title": "old"}, 480)
        out = retag_bytes(mp3, {"title": "Tiësto 日本", "comment": "ダンス"})
        assert self._frame_encs(out) == {1}
        parsed = parse_audio("x.mp3", out)
        assert parsed["title"] == "Tiësto 日本"
        assert parsed["comment"] == "ダンス"

    def test_v24_source_keeps_utf8(self):
        from tagminder_spark.sources.audiotags.synth import build_id3v24
        mp3 = build_id3v24({"title": "old"}) + build_mp3_with_xing({}, 480)[10:]
        out = retag_bytes(mp3, {"title": "Tiësto 日本"})
        assert out[3] == 4
        assert self._frame_encs(out) == {3}
        assert parse_audio("x.mp3", out)["title"] == "Tiësto 日本"

    def test_aiff_unicode(self):
        data = aiff_file(seconds=7)
        out = retag_bytes(data, {"title": "Tiësto 日本"})
        assert parse_audio("x.aiff", out)["title"] == "Tiësto 日本"


class TestMultivalueCommentTxxx:
    """ADVICE r6 (low): COMM/TXXX must carry ALL values, not values[0]."""

    @pytest.mark.parametrize("enc_tags", [
        {"comment": "first\\\\second\\\\third"},
        {"mycustomtag": "va\\\\vb"},
        {"comment": "ün\\\\日本"},  # forces UTF-16 on v2.3
    ])
    def test_roundtrip(self, enc_tags):
        mp3 = build_mp3_with_xing({"title": "old"}, 480)
        out = retag_bytes(mp3, {"title": "t", **enc_tags})
        parsed = parse_audio("x.mp3", out)
        for k, v in enc_tags.items():
            assert parsed[k] == v


class TestMp4UdtaPreserved:
    """ADVICE r6 (low): non-tag udta children (chapters, location,
    custom boxes) must survive a retag."""

    def test_chpl_and_xyz_survive(self):
        base = build_m4a({"title": "old"}, 95)
        # graft chpl + ©xyz into the existing udta, next to meta
        chpl = _atom(b"chpl", b"\x01\x00\x00\x00" + b"\x00" * 5)
        xyz = _atom(b"\xa9xyz", b"\x00\x12\x15\xc7+34.05-118.25/")
        from tagminder_spark.sources.audiotags.mp4 import _atoms
        top = list(_atoms(base, 0, len(base)))
        ms, me = next((s, e) for t, s, e in top if t == b"moov")
        udta = next((s, e) for t, s, e in _atoms(base, ms, me)
                    if t == b"udta")
        us, ue = udta
        grown = (
            base[:us - 8]
            + _atom(b"udta", chpl + xyz + base[us:ue])
            + base[ue:]
        )
        # fix moov size
        delta = len(grown) - len(base)
        grown = bytearray(grown)
        grown[ms - 8:ms - 4] = struct.pack(
            ">I", int.from_bytes(base[ms - 8:ms - 4], "big") + delta
        )
        out = retag_bytes(bytes(grown), {"title": "fresh"})
        assert out is not None
        assert b"chpl" in out
        assert b"\xa9xyz" in out
        assert b"34.05-118.25" in out
        parsed = parse_audio("x.m4a", out)
        assert parsed["title"] == "fresh"
        # retag again: children still there (idempotent preservation)
        out2 = retag_bytes(out, {"title": "again"})
        assert b"chpl" in out2 and b"\xa9xyz" in out2


class TestParseCrashGuard:
    """ADVICE r6 (medium): malformed container bytes must degrade to the
    fallback row, never crash the Spark task."""

    def test_truncated_mvhd_mp4_falls_back(self, tmp_path):
        from tagminder_spark.sources.catalog import _parse_one
        # an MP4 whose mvhd body is empty at EOF — parse raises inside
        # the mp4 walker without a guard
        bad = (
            _atom(b"ftyp", b"M4A \x00\x00\x00\x00")
            + struct.pack(">I", 16) + b"moov"
            + struct.pack(">I", 8) + b"mvhd"
        )
        p = tmp_path / "bad.m4a"
        p.write_bytes(bad)
        row = _parse_one(str(p), None)
        assert row["path"] == str(p)
        assert row["tags"].get("title")  # fallback basename title

    def test_garbage_bytes_fall_back(self):
        from tagminder_spark.sources.catalog import _parse_one
        row = _parse_one("x.mp3", b"\xff\xfb" + b"\x91" * 40)
        assert row["path"] == "x.mp3"


def test_retag_file_preserves_permissions(tmp_path):
    """os.replace with a fresh temp file must not reset the original's
    mode — users' libraries carry deliberate permissions."""
    import os

    p = tmp_path / "x.flac"
    p.write_bytes(build_flac(44100 * 9, [("TITLE", "old")]))
    os.chmod(p, 0o640)
    assert retag_file(str(p), TAGS) is True
    assert (os.stat(p).st_mode & 0o777) == 0o640


def test_fuzz_parse_and_retag_never_raise():
    """Deterministic corruption fuzz (truncations + bit flips) over all
    8 builders: parse_audio and retag_bytes must degrade (None/partial),
    never raise — a raised exception in a mapInPandas batch or the
    export writer fails the whole Spark task.  The three fuzz-found
    crashes (AIFF rate-exponent overflow, MP4 empty-mvhd IndexError,
    ASF corrupt-header-size struct.error) stay fixed."""
    import random

    from tagminder_spark.sources.audiotags.synth import (
        build_aiff,
        build_ape,
        build_asf,
        build_m4a,
        build_ogg_vorbis,
        build_wavpack,
    )

    tags = {"title": "T", "artist": "A", "album": "B", "track": "3"}
    builders = {
        "mp3": build_mp3_with_xing(tags, 400),
        "flac": build_flac(44100 * 9, list(tags.items())),
        "ogg": build_ogg_vorbis(list(tags.items()), 44100 * 9),
        "m4a": build_m4a(tags, 9),
        "aiff": build_aiff(tags, 9),
        "asf": build_asf(tags, 9),
        "ape": build_ape(tags, 9),
        "wv": build_wavpack(tags, 9),
    }
    rng = random.Random(11)
    for name, data in builders.items():
        for _ in range(250):
            b = bytearray(data)
            op = rng.randrange(3)
            if op == 0:
                b = b[:rng.randrange(1, len(b))]
            elif op == 1:
                for _ in range(rng.randrange(1, 8)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
            else:
                b = b[:rng.randrange(1, len(b))]
                for _ in range(3):
                    if b:
                        b[rng.randrange(len(b))] = rng.randrange(256)
            parse_audio(f"x.{name}", bytes(b))
            retag_bytes(bytes(b), {"title": "N"})


def test_copy_span_fallback_matches_sendfile(tmp_path, monkeypatch):
    """Force the read/write fallback (and a partial-sendfile resume):
    output must be byte-identical to the zero-copy path."""
    import os

    data = build_flac(44100 * 20, [("TITLE", "old")], audio_bytes=1 << 20)
    p1 = tmp_path / "a.flac"
    p1.write_bytes(data)
    assert retag_file(str(p1), TAGS) is True
    expected = p1.read_bytes()

    # fallback: sendfile entirely unavailable
    p2 = tmp_path / "b.flac"
    p2.write_bytes(data)
    monkeypatch.delattr(os, "sendfile")
    assert retag_file(str(p2), TAGS) is True
    assert p2.read_bytes() == expected
    monkeypatch.undo()

    # partial progress then failure: resume must not duplicate bytes
    real = os.sendfile
    calls = {"n": 0}

    def flaky(out_fd, in_fd, off, cnt):
        calls["n"] += 1
        if calls["n"] == 1:
            return real(out_fd, in_fd, off, min(cnt, 4096))
        raise OSError("simulated")

    p3 = tmp_path / "c.flac"
    p3.write_bytes(data)
    monkeypatch.setattr(os, "sendfile", flaky)
    assert retag_file(str(p3), TAGS) is True
    assert p3.read_bytes() == expected

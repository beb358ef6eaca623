"""Byte-level tests for the pure-Python audio tag parsers.

Every fixture is synthesized in-test from the public format specs —
deterministic bytes, no binary blobs in the repo, no external libs.
"""

from __future__ import annotations

import struct

import pytest

from tagminder_spark.sources.audiotags import (
    MULTIVALUE_DELIM,
    parse_audio,
    sniff_format,
)
from tagminder_spark.sources.audiotags.id3 import resolve_genre


# ---------------------------------------------------------------------------
# fixture builders
# ---------------------------------------------------------------------------

def syncsafe_bytes(n: int) -> bytes:
    return bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )


def id3v23_frame(fid: str, payload: bytes, flags: int = 0) -> bytes:
    return fid.encode() + struct.pack(">IH", len(payload), flags) + payload


def id3v24_frame(fid: str, payload: bytes, flags: int = 0) -> bytes:
    return (
        fid.encode()
        + syncsafe_bytes(len(payload))
        + struct.pack(">H", flags)
        + payload
    )


def text_payload(enc: int, *values: str) -> bytes:
    codec = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}[enc]
    sep = b"\x00\x00" if enc in (1, 2) else b"\x00"
    return bytes([enc]) + sep.join(v.encode(codec) for v in values)


def id3v2_tag(frames: bytes, major: int = 3, flags: int = 0) -> bytes:
    return b"ID3" + bytes([major, 0, flags]) + syncsafe_bytes(len(frames)) + frames


def mp3_frame(payload_fill: bytes = b"\x00") -> bytes:
    """One MPEG1 Layer III 128 kbps 44.1 kHz stereo frame (417 bytes)."""
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])
    body = (payload_fill * 417)[: 417 - 4]
    return hdr + body


def id3v1_tag(title: str, artist: str, album: str, year: str,
              comment: str, track: int, genre: int) -> bytes:
    def pad(s: str, n: int) -> bytes:
        return s.encode("latin-1")[:n].ljust(n, b"\x00")

    return (
        b"TAG" + pad(title, 30) + pad(artist, 30) + pad(album, 30)
        + pad(year, 4) + pad(comment, 28) + b"\x00" + bytes([track, genre])
    )


def vorbis_comment_block(vendor: str, comments: list[str]) -> bytes:
    out = struct.pack("<I", len(vendor)) + vendor.encode()
    out += struct.pack("<I", len(comments))
    for c in comments:
        raw = c.encode("utf-8")
        out += struct.pack("<I", len(raw)) + raw
    return out


def flac_file(total_samples: int, sample_rate: int = 44100,
              channels: int = 2, bps: int = 16,
              comments: list[str] | None = None) -> bytes:
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bps - 1) << 36)
        | total_samples
    )
    streaminfo = (
        struct.pack(">HH", 4096, 4096)
        + b"\x00" * 6
        + packed.to_bytes(8, "big")
        + bytes(range(16))
    )
    blocks = b"\x00" + len(streaminfo).to_bytes(3, "big") + streaminfo
    vc = vorbis_comment_block("test", comments or [])
    blocks += bytes([0x80 | 4]) + len(vc).to_bytes(3, "big") + vc
    return b"fLaC" + blocks + b"\xaa" * 2000


def ogg_page(payload: bytes, granule: int = 0, htype: int = 0,
             seq: int = 0) -> bytes:
    assert len(payload) < 255 * 255
    lacing = bytes([255] * (len(payload) // 255) + [len(payload) % 255])
    return (
        b"OggS\x00" + bytes([htype])
        + struct.pack("<q", granule)
        + struct.pack("<III", 7, seq, 0)
        + bytes([len(lacing)]) + lacing + payload
    )


def ogg_vorbis_file(comments: list[str], seconds: int = 42,
                    sample_rate: int = 44100) -> bytes:
    ident = (
        b"\x01vorbis" + struct.pack("<IB", 0, 2)
        + struct.pack("<IiiiB", sample_rate, 0, 112000, 0, 0x66) + b"\x01"
    )
    comment = b"\x03vorbis" + vorbis_comment_block("test", comments) + b"\x01"
    return (
        ogg_page(ident, htype=2)
        + ogg_page(comment, seq=1)
        + ogg_page(b"\xaa" * 100, granule=sample_rate * seconds,
                   htype=4, seq=2)
    )


def opus_file(comments: list[str], seconds: int = 10,
              preskip: int = 312) -> bytes:
    head = (
        b"OpusHead\x01\x02" + struct.pack("<H", preskip)
        + struct.pack("<IHB", 48000, 0, 0)
    )
    tags = b"OpusTags" + vorbis_comment_block("test", comments)
    return (
        ogg_page(head, htype=2)
        + ogg_page(tags, seq=1)
        + ogg_page(b"\xaa" * 50, granule=48000 * seconds + preskip,
                   htype=4, seq=2)
    )


def atom(atype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + atype + payload


def ilst_text(atype: bytes, value: str) -> bytes:
    data = atom(b"data", struct.pack(">II", 1, 0) + value.encode("utf-8"))
    return atom(atype, data)


def ilst_pair(atype: bytes, num: int, total: int) -> bytes:
    data = atom(
        b"data", struct.pack(">II", 0, 0) + struct.pack(">HHHH", 0, num, total, 0)
    )
    return atom(atype, data)


def mp4_file(title: str, artist: str, album: str, track: int,
             total: int, seconds: int) -> bytes:
    mvhd = atom(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, 600, 600 * seconds)
        + b"\x00" * 76,
    )
    freeform = atom(
        b"----",
        atom(b"mean", b"\x00" * 4 + b"com.apple.iTunes")
        + atom(b"name", b"\x00" * 4 + b"MusicBrainz Track Id")
        + atom(b"data", struct.pack(">II", 1, 0) + b"mbid-123"),
    )
    ilst = atom(
        b"ilst",
        ilst_text(b"\xa9nam", title) + ilst_text("©ART".encode("latin-1"), artist)
        + ilst_text(b"\xa9alb", album) + ilst_text(b"\xa9day", "1997")
        + ilst_text(b"\xa9gen", "Ambient")
        + ilst_pair(b"trkn", track, total) + ilst_pair(b"disk", 1, 2)
        + freeform,
    )
    meta = atom(b"meta", b"\x00" * 4 + ilst)
    moov = atom(b"moov", mvhd + atom(b"udta", meta))
    return atom(b"ftyp", b"M4A \x00\x00\x00\x00") + moov + b"\xaa" * 500


def _mvhd(seconds: int) -> bytes:
    return atom(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, 600, 600 * seconds)
        + b"\x00" * 76,
    )


def _moov_with(seconds: int, title: str) -> bytes:
    ilst = atom(b"ilst", ilst_text(b"\xa9nam", title))
    meta = atom(b"meta", b"\x00" * 4 + ilst)
    return atom(b"moov", _mvhd(seconds) + atom(b"udta", meta))


def apev2_tag(items: dict[str, str]) -> bytes:
    body = b""
    for k, v in items.items():
        raw = v.encode("utf-8")
        body += (
            struct.pack("<II", len(raw), 0) + k.encode("latin-1") + b"\x00" + raw
        )
    tag_size = len(body) + 32
    footer = (
        b"APETAGEX" + struct.pack("<IIII", 2000, tag_size, len(items), 0)
        + b"\x00" * 8
    )
    return body + footer


def monkeys_file(items: dict[str, str], seconds: int = 61,
                 sample_rate: int = 44100) -> bytes:
    blocks_per_frame = 73728
    total = sample_rate * seconds
    total_frames = total // blocks_per_frame + 1
    final = total - (total_frames - 1) * blocks_per_frame
    desc = (
        b"MAC " + struct.pack("<HH", 3990, 0) + struct.pack("<I", 52)
    ).ljust(52, b"\x00")
    header = struct.pack(
        "<HHIIIHHI", 2000, 0, blocks_per_frame, final, total_frames,
        16, 2, sample_rate,
    )
    return desc + header + b"\xaa" * 300 + apev2_tag(items)


def wavpack_file(items: dict[str, str], seconds: int = 33) -> bytes:
    total = 44100 * seconds
    flags = (9 << 23) | 0x01  # 44.1 kHz, 2 bytes/sample, stereo
    header = (
        b"wvpk" + struct.pack("<IHBB", 400, 0x410, 0, 0)
        + struct.pack("<IIII", total, 0, 4096, flags)
        + struct.pack("<I", 0)
    )
    return header + b"\xaa" * 368 + apev2_tag(items)


def _guid(h: str) -> bytes:
    return bytes.fromhex(h)


def asf_file(title: str, artist: str, album: str, track: int,
             seconds: int) -> bytes:
    def u16s(s: str) -> bytes:
        return s.encode("utf-16-le") + b"\x00\x00"

    fields = [u16s(title), u16s(artist), u16s("(c)"), u16s("a comment"),
              u16s("")]
    cd_body = b"".join(struct.pack("<H", len(f)) for f in fields) + b"".join(
        fields
    )
    cd = (
        _guid("3326b2758e66cf11a6d900aa0062ce6c")
        + struct.pack("<Q", 24 + len(cd_body)) + cd_body
    )

    def attr(name: str, dtype: int, raw: bytes) -> bytes:
        n = u16s(name)
        return (
            struct.pack("<H", len(n)) + n
            + struct.pack("<HH", dtype, len(raw)) + raw
        )

    ext_body = struct.pack("<H", 3) + (
        attr("WM/AlbumTitle", 0, u16s(album))
        + attr("WM/TrackNumber", 3, struct.pack("<I", track))
        + attr("WM/Genre", 0, u16s("Jazz"))
    )
    ext = (
        _guid("40a4d0d207e3d21197f000a0c95ea850")
        + struct.pack("<Q", 24 + len(ext_body)) + ext_body
    )
    preroll_ms = 3000
    fp_body = (
        b"\x00" * 16 + struct.pack("<Q", 0) * 2 + struct.pack("<Q", 0)
        + struct.pack("<Q", (seconds + preroll_ms // 1000) * 10**7)
        + struct.pack("<Q", 0) + struct.pack("<Q", preroll_ms)
        + b"\x00" * 16
    )
    fp = (
        _guid("a1dcab8c47a9cf118ee400c00c205365")
        + struct.pack("<Q", 24 + len(fp_body)) + fp_body
    )
    objs = cd + ext + fp
    return (
        _guid("3026b2758e66cf11a6d900aa0062ce6c")
        + struct.pack("<Q", 30 + len(objs)) + struct.pack("<I", 3)
        + b"\x01\x02" + objs + b"\xaa" * 200
    )


def aiff_file(seconds: int = 7, with_id3: bytes | None = None) -> bytes:
    # 44100 = 1.34582... * 2^15 → exponent 16383+15, mantissa 44100<<48
    rate80 = struct.pack(">H", 16383 + 15) + (44100 << 48).to_bytes(8, "big")
    comm = atom_chunk(b"COMM", struct.pack(">HIH", 2, 44100 * seconds, 16) + rate80)
    body = comm
    if with_id3:
        body += atom_chunk(b"ID3 ", with_id3)
    return b"FORM" + struct.pack(">I", 4 + len(body)) + b"AIFF" + body


def atom_chunk(cid: bytes, payload: bytes) -> bytes:
    out = cid + struct.pack(">I", len(payload)) + payload
    return out + (b"\x00" if len(payload) & 1 else b"")


# ---------------------------------------------------------------------------
# ID3v2 / MP3
# ---------------------------------------------------------------------------

class TestID3:
    def test_v23_text_frames(self):
        frames = (
            id3v23_frame("TIT2", text_payload(0, "My Title"))
            + id3v23_frame("TPE1", text_payload(1, "Ärtist"))
            + id3v23_frame("TALB", text_payload(0, "Albüm".encode("latin-1").decode("latin-1")))
            + id3v23_frame("TRCK", text_payload(0, "7/12"))
            + id3v23_frame("TPOS", text_payload(0, "1/2"))
            + id3v23_frame("TYER", text_payload(0, "1997"))
            + id3v23_frame("TCON", text_payload(0, "(17)"))
        )
        data = id3v2_tag(frames) + mp3_frame() * 8
        out = parse_audio("x.mp3", data)
        assert out["title"] == "My Title"
        assert out["artist"] == "Ärtist"
        assert out["track"] == "7/12"
        assert out["discnumber"] == "1/2"
        assert out["year"] == "1997"
        assert out["genre"] == "Rock"
        assert out["__filetype"] == "mp3"

    def test_v24_utf8_and_multivalue(self):
        frames = (
            id3v24_frame("TIT2", text_payload(3, "Tïtle"))
            + id3v24_frame("TPE1", text_payload(3, "A", "B"))
            + id3v24_frame("TDRC", text_payload(3, "2003-04-05"))
        )
        data = id3v2_tag(frames, major=4) + mp3_frame() * 4
        out = parse_audio("x.mp3", data)
        assert out["title"] == "Tïtle"
        assert out["artist"] == "A" + MULTIVALUE_DELIM + "B"
        assert out["year"] == "2003-04-05"

    def test_v22_short_ids(self):
        def v22_frame(fid: str, payload: bytes) -> bytes:
            return fid.encode() + len(payload).to_bytes(3, "big") + payload

        frames = v22_frame("TT2", text_payload(0, "Old Title")) + v22_frame(
            "TP1", text_payload(0, "Old Artist")
        )
        data = (
            b"ID3" + bytes([2, 0, 0]) + syncsafe_bytes(len(frames)) + frames
            + mp3_frame() * 4
        )
        out = parse_audio("x.mp3", data)
        assert out["title"] == "Old Title"
        assert out["artist"] == "Old Artist"

    def test_txxx_comm_uslt(self):
        frames = (
            id3v23_frame(
                "TXXX", bytes([0]) + b"MusicBrainz Id\x00" + b"abc-def"
            )
            + id3v23_frame("COMM", bytes([0]) + b"eng" + b"\x00" + b"plain comment")
            + id3v23_frame("COMM", bytes([0]) + b"eng" + b"desc\x00" + b"described")
            + id3v23_frame("USLT", bytes([0]) + b"eng" + b"\x00" + b"la la la")
        )
        out = parse_audio("x.mp3", id3v2_tag(frames) + mp3_frame() * 2)
        assert out["musicbrainz id"] == "abc-def"
        assert out["comment"] == "plain comment"
        assert out["comment:desc"] == "described"
        assert out["unsyncedlyrics"] == "la la la"

    def test_global_unsync_v23(self):
        # payload containing FF E0 would false-sync; writer inserts 00
        raw_frames = id3v23_frame("TIT2", text_payload(0, "S\xffZ"))
        unsynced = raw_frames.replace(b"\xff", b"\xff\x00")
        data = id3v2_tag(unsynced, flags=0x80) + mp3_frame() * 2
        out = parse_audio("x.mp3", data)
        assert out["title"] == "S\xffZ"

    def test_id3v1_fills_gaps(self):
        frames = id3v23_frame("TIT2", text_payload(0, "V2 Title"))
        data = (
            id3v2_tag(frames) + mp3_frame() * 4
            + id3v1_tag("V1 Title", "V1 Artist", "V1 Album", "1999",
                        "v1 comment", 9, 17)
        )
        out = parse_audio("x.mp3", data)
        assert out["title"] == "V2 Title"        # v2 wins
        assert out["artist"] == "V1 Artist"      # v1 fills
        assert out["track"] == "9"
        assert out["genre"] == "Rock"

    def test_cbr_duration(self):
        n = 200
        data = id3v2_tag(b"") + mp3_frame() * n
        out = parse_audio("x.mp3", data)
        expect = n * 417 * 8 / 128000
        assert abs(float(out["__length_seconds"]) - int(expect)) <= 1
        assert out["__bitrate"] == "128 kb/s"
        assert out["__frequency"] == "44.1 kHz"
        assert out["__channels"] == "2"

    def test_xing_duration(self):
        frames_count = 3800
        first = bytearray(mp3_frame())
        first[36:40] = b"Xing"
        first[40:44] = struct.pack(">I", 0x03)
        first[44:48] = struct.pack(">I", frames_count)
        first[48:52] = struct.pack(">I", frames_count * 417)
        data = bytes(first) + mp3_frame() * 10
        out = parse_audio("x.mp3", data)
        expect = frames_count * 1152 / 44100
        assert int(float(out["__length_seconds"])) == int(expect)

    def test_genre_resolution(self):
        assert resolve_genre("(17)") == "Rock"
        assert resolve_genre("17") == "Rock"
        assert resolve_genre("(255)") == "255"
        assert resolve_genre("(4)Eurodisco") == "Eurodisco"
        assert resolve_genre("Shoegaze") == "Shoegaze"


# ---------------------------------------------------------------------------
# FLAC
# ---------------------------------------------------------------------------

class TestFlac:
    def test_streaminfo_and_comments(self):
        data = flac_file(
            44100 * 123,
            comments=[
                "TITLE=Flac Title", "ARTIST=Flac Artist",
                "TRACKNUMBER=5", "GENRE=Ambient", "GENRE=Chillout",
            ],
        )
        out = parse_audio("x.flac", data)
        assert out["__filetype"] == "flac"
        assert out["title"] == "Flac Title"
        assert out["track"] == "5"  # tracknumber → track mapping
        assert out["genre"] == "Ambient" + MULTIVALUE_DELIM + "Chillout"
        assert out["__length_seconds"] == "123"
        assert out["__length"] == "02:03"
        assert out["__frequency"] == "44.1 kHz"
        assert out["__bitspersample"] == "16"
        assert out["__md5sig"] == bytes(range(16)).hex()

    def test_flac_with_leading_id3(self):
        frames = id3v23_frame("TCOM", text_payload(0, "Composer X"))
        data = id3v2_tag(frames) + flac_file(44100, comments=["TITLE=T"])
        assert sniff_format(data) == "flac"
        out = parse_audio("x.flac", data)
        assert out["composer"] == "Composer X"
        assert out["title"] == "T"


# ---------------------------------------------------------------------------
# Ogg Vorbis / Opus
# ---------------------------------------------------------------------------

class TestOgg:
    def test_vorbis(self):
        data = ogg_vorbis_file(
            ["TITLE=Ogg Title", "ARTIST=Ogg Artist", "TRACKNUMBER=3"],
            seconds=42,
        )
        out = parse_audio("x.ogg", data)
        assert out["__filetype"] == "ogg"
        assert out["__codec"] == "vorbis"
        assert out["title"] == "Ogg Title"
        assert out["track"] == "3"
        assert out["__length_seconds"] == "42"
        assert out["__channels"] == "2"

    def test_opus(self):
        data = opus_file(["TITLE=Opus Title"], seconds=10)
        out = parse_audio("x.opus", data)
        assert out["__codec"] == "opus"
        assert out["title"] == "Opus Title"
        assert out["__length_seconds"] == "10"
        assert out["__frequency"] == "48.0 kHz"


# ---------------------------------------------------------------------------
# MP4
# ---------------------------------------------------------------------------

class TestMp4:
    def test_ilst(self):
        data = mp4_file("M4a Title", "M4a Artist", "M4a Album", 4, 11, 95)
        out = parse_audio("x.m4a", data)
        assert out["__filetype"] == "mp4"
        assert out["title"] == "M4a Title"
        assert out["artist"] == "M4a Artist"
        assert out["album"] == "M4a Album"
        assert out["track"] == "4/11"
        assert out["discnumber"] == "1/2"
        assert out["year"] == "1997"
        assert out["genre"] == "Ambient"
        assert out["musicbrainz track id"] == "mbid-123"
        assert out["__length_seconds"] == "95"


# ---------------------------------------------------------------------------
# APEv2 family
# ---------------------------------------------------------------------------

class TestApe:
    ITEMS = {
        "Title": "Ape Title", "Artist": "Ape Artist",
        "Album Artist": "AA", "Disc": "2", "Track": "6",
    }

    def test_monkeys_audio(self):
        data = monkeys_file(self.ITEMS, seconds=61)
        out = parse_audio("x.ape", data)
        assert out["__filetype"] == "ape"
        assert out["title"] == "Ape Title"
        assert out["albumartist"] == "AA"       # 'album artist' alias
        assert out["discnumber"] == "2"          # 'disc' alias
        assert out["__length_seconds"] == "61"
        assert out["__frequency"] == "44.1 kHz"

    def test_wavpack(self):
        data = wavpack_file(self.ITEMS, seconds=33)
        out = parse_audio("x.wv", data)
        assert out["__filetype"] == "wavpack"
        assert out["artist"] == "Ape Artist"
        assert out["__length_seconds"] == "33"
        assert out["__bitspersample"] == "16"

    def test_apev2_before_id3v1(self):
        data = (
            monkeys_file({"Title": "Both"})
            + id3v1_tag("x", "x", "x", "2000", "", 1, 17)
        )
        out = parse_audio("x.ape", data)
        assert out["title"] == "Both"


# ---------------------------------------------------------------------------
# ASF / WMA + AIFF
# ---------------------------------------------------------------------------

class TestAsfAiff:
    def test_wma(self):
        data = asf_file("Wma Title", "Wma Artist", "Wma Album", 8, 240)
        out = parse_audio("x.wma", data)
        assert out["__filetype"] == "asf"
        assert out["title"] == "Wma Title"
        assert out["artist"] == "Wma Artist"
        assert out["album"] == "Wma Album"
        assert out["track"] == "8"
        assert out["genre"] == "Jazz"
        assert out["comment"] == "a comment"
        assert out["__length_seconds"] == "240"
        assert out["__length"] == "04:00"

    def test_aiff(self):
        frames = id3v23_frame("TIT2", text_payload(0, "Aiff Title"))
        data = aiff_file(seconds=7, with_id3=id3v2_tag(frames))
        out = parse_audio("x.aiff", data)
        assert out["__filetype"] == "aiff"
        assert out["title"] == "Aiff Title"
        assert out["__length_seconds"] == "7"
        assert out["__frequency"] == "44.1 kHz"
        assert out["__bitspersample"] == "16"


# ---------------------------------------------------------------------------
# dispatch + robustness
# ---------------------------------------------------------------------------

class TestDispatch:
    def test_unknown_bytes(self):
        assert parse_audio("x.txt", b"hello world" * 10) is None

    def test_empty(self):
        assert parse_audio("x.mp3", b"") is None

    @pytest.mark.parametrize("builder,ext", [
        (lambda: id3v2_tag(b"") + mp3_frame() * 3, "mp3"),
        (lambda: flac_file(44100), "flac"),
        (lambda: ogg_vorbis_file(["TITLE=t"]), "ogg"),
        (lambda: mp4_file("t", "a", "b", 1, 1, 5), "m4a"),
        (lambda: monkeys_file({"Title": "t"}), "ape"),
        (lambda: wavpack_file({"Title": "t"}), "wv"),
        (lambda: asf_file("t", "a", "b", 1, 5), "wma"),
        (lambda: aiff_file(), "aiff"),
    ])
    def test_truncation_never_raises(self, builder, ext):
        """Every prefix of every fixture parses without raising — the
        mapInPandas path must survive corrupt files."""
        data = builder()
        for cut in range(0, len(data), max(1, len(data) // 40)):
            parse_audio(f"x.{ext}", data[:cut])  # no exception

    def test_synth_writer_roundtrip_all_encodings(self):
        from tagminder_spark.sources.audiotags.synth import (
            build_flac,
            build_mp3_with_xing,
        )

        for enc in (0, 1, 3):
            data = build_mp3_with_xing(
                {"title": "Té 42", "artist": "A" + MULTIVALUE_DELIM + "B",
                 "album": "AL", "track": "7", "genre": "Rock",
                 "comment": "hi", "custom key": "xyz"},
                xing_frames=3840, enc=enc)
            out = parse_audio("x.mp3", data)
            assert out["title"] == "Té 42", enc
            assert out["artist"] == "A" + MULTIVALUE_DELIM + "B", enc
            assert out["comment"] == "hi"
            assert out["custom key"] == "xyz"
            assert out["__length_seconds"] == str(int(3840 * 1152 / 44100))
        data = build_flac(
            44100 * 77,
            [("TITLE", "FT"), ("GENRE", "G1"), ("GENRE", "G2"),
             ("TRACKNUMBER", "3")],
        )
        out = parse_audio("x.flac", data)
        assert out["title"] == "FT"
        assert out["genre"] == "G1" + MULTIVALUE_DELIM + "G2"
        assert out["track"] == "3"
        assert out["__length_seconds"] == "77"

    def test_build_id3v24_roundtrip(self):
        from tagminder_spark.sources.audiotags.synth import build_id3v24

        data = build_id3v24(
            {"title": "Té", "artist": "A" + MULTIVALUE_DELIM + "B",
             "year": "2003-04-05", "genre": "Rock", "comment": "hi"}
        ) + mp3_frame() * 2
        assert data[3] == 4  # really a v2.4 header
        out = parse_audio("x.mp3", data)
        assert out["title"] == "Té"
        assert out["artist"] == "A" + MULTIVALUE_DELIM + "B"
        assert out["year"] == "2003-04-05"  # via TDRC
        assert out["genre"] == "Rock"
        assert out["comment"] == "hi"

    def test_retag_preserves_audio_stream(self):
        from tagminder_spark.sources.audiotags.synth import (
            build_flac,
            build_mp3_with_xing,
            retag_bytes,
        )

        flac = build_flac(44100 * 77, [("TITLE", "old"), ("GENRE", "G")])
        rt = retag_bytes(flac, {"title": "new", "artist": "NA"})
        out = parse_audio("x.flac", rt)
        assert out["title"] == "new" and out["artist"] == "NA"
        assert "genre" not in out            # dropped with the old block
        assert out["__length_seconds"] == "77"  # STREAMINFO preserved
        mp3 = build_mp3_with_xing({"title": "old"}, 384) + id3v1_tag(
            "v1", "v1", "v1", "2000", "", 1, 17
        )
        rt = retag_bytes(mp3, {"title": "new"})
        out = parse_audio("x.mp3", rt)
        assert out["title"] == "new"
        assert "artist" not in out           # ID3v1 trailer stripped too
        assert out["__length_seconds"] == str(int(384 * 1152 / 44100))

    def test_retag_mp4_moov_at_end(self):
        from tagminder_spark.sources.audiotags.synth import retag_bytes

        mdat = atom(b"mdat", b"\x00" * 5000)
        data = (
            atom(b"ftyp", b"M4A \x00\x00\x00\x00")
            + mdat
            + _moov_with(seconds=31, title="old")
        )
        rt = retag_bytes(data, {"title": "fresh", "artist": "AA"})
        out = parse_audio("x.m4a", rt)
        assert out["title"] == "fresh"
        assert out["artist"] == "AA"
        assert out["__length_seconds"] == "31"

    def test_retag_mp4_shifts_chunk_offsets(self):
        """moov BEFORE mdat: growing udta must shift every stco entry
        by the size delta so sample chunks still resolve."""
        import struct as st

        from tagminder_spark.sources.audiotags.synth import retag_bytes

        stco = atom(b"stco", b"\x00" * 4 + st.pack(">I", 2)
                    + st.pack(">II", 1000, 2000))
        stbl = atom(b"stbl", stco)
        trak = atom(b"trak", atom(b"mdia", atom(b"minf", stbl)))
        moov = atom(b"moov", _mvhd(31) + trak)
        ftyp = atom(b"ftyp", b"M4A \x00\x00\x00\x00")
        data = ftyp + moov + atom(b"mdat", b"\x00" * 3000)
        old_len = len(data)
        rt = retag_bytes(data, {"title": "fresh"})
        delta = len(rt) - old_len
        assert delta > 0
        # locate the stco payload in the rewritten file and check shift
        i = rt.find(b"stco")
        n = int.from_bytes(rt[i + 8:i + 12], "big")
        offs = [
            int.from_bytes(rt[i + 12 + 4 * k:i + 16 + 4 * k], "big")
            for k in range(n)
        ]
        assert offs == [1000 + delta, 2000 + delta]
        out = parse_audio("x.m4a", rt)
        assert out["title"] == "fresh"

    def test_retag_ape_and_wavpack(self):
        from tagminder_spark.sources.audiotags.synth import retag_bytes

        for build, ext in ((monkeys_file, "ape"), (wavpack_file, "wv")):
            data = build({"Title": "old", "Genre": "G"}) + id3v1_tag(
                "x", "x", "x", "2000", "", 1, 17
            )
            rt = retag_bytes(
                data, {"title": "fresh", "artist": "A1\\\\A2"}
            )
            out = parse_audio(f"x.{ext}", rt)
            assert out["title"] == "fresh", ext
            assert out["artist"] == "A1" + MULTIVALUE_DELIM + "A2", ext
            assert "genre" not in out
            # stream info intact
            assert out["__length_seconds"] in ("61", "33")
            # idempotent: retag again, single tag block at EOF
            rt2 = retag_bytes(rt, {"title": "again"})
            assert parse_audio(f"x.{ext}", rt2)["title"] == "again"
            assert rt2.count(b"APETAGEX") == 2  # one header + one footer

    def test_retag_aiff(self):
        from tagminder_spark.sources.audiotags.synth import retag_bytes

        frames = id3v23_frame("TIT2", text_payload(0, "old"))
        data = aiff_file(seconds=7, with_id3=id3v2_tag(frames))
        rt = retag_bytes(data, {"title": "fresh", "composer": "C"})
        out = parse_audio("x.aiff", rt)
        assert out["title"] == "fresh"
        assert out["composer"] == "C"
        assert out["__length_seconds"] == "7"   # COMM preserved

    def test_retag_ogg_vorbis_and_opus(self):
        from tagminder_spark.sources.audiotags.synth import retag_bytes

        ogg = ogg_vorbis_file(
            ["TITLE=old", "GENRE=G"], seconds=42
        )
        rt = retag_bytes(ogg, {"title": "fresh", "artist": "A1\\\\A2"})
        out = parse_audio("x.ogg", rt)
        assert out["title"] == "fresh"
        assert out["artist"] == "A1" + MULTIVALUE_DELIM + "A2"
        assert "genre" not in out
        assert out["__length_seconds"] == "42"  # audio pages untouched
        op = opus_file(["TITLE=old"], seconds=10)
        rt = retag_bytes(op, {"title": "fresh opus"})
        out = parse_audio("x.opus", rt)
        assert out["title"] == "fresh opus"
        assert out["__length_seconds"] == "10"

    def test_retag_asf(self):
        from tagminder_spark.sources.audiotags.synth import retag_bytes

        data = asf_file("old", "oldA", "oldAL", 9, 240)
        rt = retag_bytes(
            data,
            {"title": "fresh", "artist": "FA", "album": "FAL",
             "track": "3", "genre": "G", "composer": "CC"},
        )
        out = parse_audio("x.wma", rt)
        assert out["title"] == "fresh"
        assert out["artist"] == "FA"
        assert out["album"] == "FAL"
        assert out["track"] == "3"
        assert out["genre"] == "G"
        assert out["composer"] == "CC"
        assert out["__length_seconds"] == "240"  # File Properties kept
        # idempotent second rewrite
        out2 = parse_audio("x.wma", retag_bytes(rt, {"title": "again"}))
        assert out2["title"] == "again"
        assert "album" not in out2

    def test_ogg_page_crc_matches_spec_vector(self):
        """The recomputed page CRC must be the spec CRC-32 (poly
        0x04c11db7, unreflected, zero init) — checked against an
        independently computed value."""
        from tagminder_spark.sources.audiotags.synth import _ogg_crc

        def ref_crc(data: bytes) -> int:
            crc = 0
            for byte in data:
                crc ^= byte << 24
                for _ in range(8):
                    crc = ((crc << 1) ^ 0x04C11DB7) if crc & 0x80000000 \
                        else (crc << 1)
                    crc &= 0xFFFFFFFF
            return crc

        for probe in (b"", b"\x00", b"OggS", bytes(range(256)) * 3):
            assert _ogg_crc(probe) == ref_crc(probe)

    def test_bitflip_never_raises(self):
        data = flac_file(44100, comments=["TITLE=t"])
        for pos in range(0, len(data), 97):
            mutated = bytearray(data)
            mutated[pos] ^= 0xFF
            parse_audio("x.flac", bytes(mutated))

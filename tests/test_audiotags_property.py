"""Property-based round trips: for ARBITRARY tag dictionaries, what the
writers emit, the parser reads back verbatim — across formats and
encodings.  Catches escaping/terminator/length-math bugs no fixed
fixture would."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tagminder_spark.sources.audiotags import MULTIVALUE_DELIM, parse_audio
from tagminder_spark.sources.audiotags.synth import (
    build_apev2,
    build_flac,
    build_m4a,
    build_mp3_with_xing,
    build_ogg_vorbis,
    retag_bytes,
)

# printable text, no NULs/newlines (tag-value domain), no leading/trailing
# whitespace (writers/parsers trim), not containing the multivalue delim
_value = st.text(
    st.characters(
        codec="utf-8",
        exclude_categories=("Cs", "Cc"),
    ),
    min_size=1,
    max_size=40,
).map(str.strip).filter(
    lambda s: s and "\\" not in s and "\x00" not in s and "﻿" not in s
)

_key = st.sampled_from(
    ["title", "artist", "album", "composer", "grouping", "mood", "isrc"]
)

_tags = st.dictionaries(_key, _value, min_size=1, max_size=5)


@settings(max_examples=60, deadline=None)
@given(tags=_tags, enc=st.sampled_from([0, 1, 3]),
       version=st.sampled_from([3, 4]))
def test_id3_roundtrip(tags, enc, version):
    from tagminder_spark.sources.audiotags.synth import build_id3

    if enc == 0:  # latin-1 can't carry arbitrary unicode
        tags = {k: v.encode("latin-1", "replace").decode("latin-1")
                for k, v in tags.items()}
        tags = {k: v.strip() for k, v in tags.items() if v.strip()}
        if not tags:
            return
    data = build_id3(tags, enc=enc, version=version) + bytes(
        [0xFF, 0xFB, 0x90, 0x00]
    ) + bytes(413)
    out = parse_audio("x.mp3", data)
    for k, v in tags.items():
        assert out[k] == v, (k, enc, version)


@settings(max_examples=60, deadline=None)
@given(tags=_tags)
def test_flac_roundtrip(tags):
    data = build_flac(44100, [(k.upper(), v) for k, v in tags.items()])
    out = parse_audio("x.flac", data)
    for k, v in tags.items():
        assert out[k] == v


@settings(max_examples=40, deadline=None)
@given(tags=_tags)
def test_ogg_roundtrip_via_retag(tags):
    base = build_ogg_vorbis([("TITLE", "seed")], total_samples=44100)
    out = parse_audio("x.ogg", retag_bytes(base, tags))
    for k, v in tags.items():
        assert out[k] == v


@settings(max_examples=40, deadline=None)
@given(tags=_tags)
def test_mp4_roundtrip(tags):
    out = parse_audio("x.m4a", build_m4a(tags, seconds=9))
    for k, v in tags.items():
        assert out[k] == v


@settings(max_examples=40, deadline=None)
@given(tags=_tags)
def test_apev2_roundtrip(tags):
    data = b"MAC \x96\x0f\x00\x00" + b"\x00" * 64 + build_apev2(tags)
    out = parse_audio("x.ape", data)
    for k, v in tags.items():
        assert out[k] == v


@settings(max_examples=40, deadline=None)
@given(tags=_tags, values=st.lists(_value, min_size=2, max_size=4))
def test_multivalue_roundtrip(tags, values):
    tags = {**tags, "artist": MULTIVALUE_DELIM.join(values)}
    for build in (
        lambda t: build_mp3_with_xing(t, xing_frames=384, enc=3),
        lambda t: build_m4a(t, seconds=3),
    ):
        out = parse_audio("x", build(tags))
        assert out["artist"] == MULTIVALUE_DELIM.join(values)


@settings(max_examples=40, deadline=None)
@given(tags=_tags, fmt=st.sampled_from(
    ["mp3", "flac", "ogg", "m4a", "aiff", "asf", "ape", "wv"]
))
def test_retag_file_stream_equals_retag_bytes(tmp_path_factory, tags, fmt):
    """For ARBITRARY tag dicts on every container family, the streamed
    plan writer produces bytes identical to the in-memory join, and the
    parser reads the new tags back verbatim."""
    from tagminder_spark.sources.audiotags.synth import (
        build_aiff,
        build_ape,
        build_asf,
        build_wavpack,
        retag_file,
    )

    base = {
        "mp3": lambda: build_mp3_with_xing({"title": "old"}, 400),
        "flac": lambda: build_flac(44100 * 7, [("TITLE", "old")]),
        "ogg": lambda: build_ogg_vorbis([("TITLE", "old")], 44100 * 7),
        "m4a": lambda: build_m4a({"title": "old"}, 7),
        "aiff": lambda: build_aiff({"title": "old"}, 7),
        "asf": lambda: build_asf({"title": "old"}, 7),
        "ape": lambda: build_ape({"title": "old"}, 7),
        "wv": lambda: build_wavpack({"title": "old"}, 7),
    }[fmt]()
    expected = retag_bytes(base, tags)
    assert expected is not None
    d = tmp_path_factory.mktemp("rt")
    p = d / f"x.{fmt}"
    p.write_bytes(base)
    assert retag_file(str(p), tags) is True
    got = p.read_bytes()
    assert got == expected
    out = parse_audio(str(p), got)
    for k, v in tags.items():
        assert out[k] == v, (fmt, k)

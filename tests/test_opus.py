"""Opus stream-layer tests (round 12): RFC 6716 §3 packet framing —
all four frame-count codes, the two-byte length coding, 255-chained
padding, the 120 ms / 48-frame / 1275-byte invariants — and RFC 7845
Ogg encapsulation with granule accounting, round-tripped through the
builder twin and cross-validated against the independent
``audiotags/ogg.py`` container parser."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tagminder_spark.sources.opus import (
    build_opus_packet,
    build_opus_stream,
    config_bandwidth,
    config_mode,
    config_samples,
    opus_packet_report,
    parse_opus_packet,
)


def _frames(lens, seed=0):
    return [bytes((seed + i + j) % 256 for j in range(n))
            for i, n in enumerate(lens)]


def test_toc_tables_are_the_rfc_6716_grid():
    # SILK 10/20/40/60 ms × NB/MB/WB
    assert [config_samples(c) for c in range(4)] == [480, 960, 1920, 2880]
    assert config_mode(0) == "silk" and config_bandwidth(9) == "WB"
    # hybrid 10/20 × SWB/FB
    assert [config_samples(c) for c in (12, 13, 14, 15)] == \
        [480, 960, 480, 960]
    assert config_mode(13) == "hybrid" and config_bandwidth(14) == "FB"
    # CELT 2.5/5/10/20 × NB/WB/SWB/FB
    assert [config_samples(c) for c in (16, 17, 18, 19)] == \
        [120, 240, 480, 960]
    assert config_mode(31) == "celt" and config_bandwidth(31) == "FB"


@pytest.mark.parametrize("config,stereo,lens,pad", [
    (0, 0, [30], 0),              # code 0
    (17, 1, [40, 40], 0),         # code 1
    (17, 0, [10, 25], 0),         # code 2
    (18, 1, [5, 300, 7], 0),      # code 3 VBR (escape length)
    (19, 0, [20, 20, 20], 5),     # code 3 CBR + padding
    (28, 1, [15, 15, 15, 15], 300),  # 255-chained padding
    (30, 0, [0, 0], 0),           # empty frames
    (16, 0, [1275], 0),           # max frame length
])
def test_packet_codes_round_trip(config, stereo, lens, pad):
    frames = _frames(lens, seed=config)
    pkt = build_opus_packet(config, stereo, frames, padding=pad)
    got = parse_opus_packet(pkt)
    assert (got["config"], got["stereo"]) == (config, stereo)
    assert got["frames"] == frames
    assert got["padding"] == pad
    assert got["samples"] == config_samples(config) * len(frames)


def test_packet_invariants_enforced():
    with pytest.raises(ValueError, match="120 ms"):
        build_opus_packet(3, 0, _frames([1, 1, 1]))  # 3×60 ms
    with pytest.raises(ValueError, match="1275"):
        build_opus_packet(16, 0, [b"x" * 1276])
    with pytest.raises(ValueError, match="empty"):
        parse_opus_packet(b"")
    # parser-side 120 ms guard on a hand-built code-3 header
    bad = bytes([(3 << 3) | 3, 3]) + b"\x00" * 3  # 3 × 60 ms CBR
    with pytest.raises(ValueError, match="120 ms"):
        parse_opus_packet(bad)
    with pytest.raises(ValueError, match="1..48"):
        parse_opus_packet(bytes([(16 << 3) | 3, 0]))


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=31),
       st.booleans(),
       st.lists(st.integers(min_value=0, max_value=1275),
                min_size=1, max_size=6),
       st.integers(min_value=0, max_value=600),
       st.booleans())
def test_packet_round_trip_property(config, stereo, lens, pad, force3):
    nmax = 5760 // config_samples(config)
    lens = lens[:max(1, min(len(lens), nmax))]
    frames = _frames(lens, seed=config)
    pkt = build_opus_packet(config, int(stereo), frames,
                            padding=pad, force_code3=force3)
    got = parse_opus_packet(pkt)
    assert got["frames"] == frames
    assert got["padding"] == pad
    assert got["stereo"] == int(stereo)


def test_stream_report_and_granules():
    pkts = [build_opus_packet(1, 0, _frames([50], k)) for k in range(3)]
    stream = build_opus_stream(pkts, pre_skip=312,
                               comments={"TITLE": "x"})
    rep = opus_packet_report(stream)
    assert [r["samples"] for r in rep] == [960, 960, 960]
    assert [r["granule"] for r in rep] == [1272, 2232, 3192]
    assert rep[-1]["output_samples"] == 2880
    assert (rep[0]["mode"], rep[0]["bandwidth"]) == ("silk", "NB")

    # end-trim: a final granule below the accumulated count is legal
    short = build_opus_stream(pkts, pre_skip=312, final_granule=3000)
    assert opus_packet_report(short)[-1]["granule"] == 3000


def test_cross_validates_against_audiotags_container_parser():
    """Two independent implementations agree: the twin's stream reads
    back through audiotags/ogg.py with the right codec, channels, and
    granule-derived duration."""
    from tagminder_spark.sources.audiotags.ogg import parse_ogg

    pkts = [build_opus_packet(1, 0, _frames([50], k)) for k in range(5)]
    stream = build_opus_stream(pkts, pre_skip=312, channels=1,
                               comments={"ARTIST": "a"})
    tags, info = parse_ogg(stream)
    assert info["codec"] == "opus" and info["channels"] == 1
    assert info["sample_rate"] == 48000
    assert abs(info["length"] - 5 * 960 / 48000) < 1e-9
    assert tags.get("artist") == ["a"]

"""MP3 stream layer (sources/mp3.py): frame table, side info,
scalefactors, bit reservoir — encoder-twin roundtrips, property
randomized.  The spectral stage stays a documented seam (spec-
tabulated Huffman/synthesis constants unavailable in-container)."""
from __future__ import annotations

import random

import pytest

from tagminder_spark.sources.mp3 import (
    SLEN,
    assemble_main_data,
    build_mp3_stream,
    granule_report,
    mp3_frame_table,
    parse_side_info,
)


def _granule(rng, *, block_type=0, mixed=0, scfsi_shared=None):
    scomp = rng.randrange(16)
    slen = SLEN[scomp]
    if block_type == 2 and mixed:
        lay = [(17, 0), (18, 1)]
    elif block_type == 2:
        lay = [(18, 0), (18, 1)]
    else:
        lay = [(11, 0), (10, 1)]
    sfs = []
    for count, si in lay:
        s = slen[si]
        sfs.extend(rng.randrange(1 << s) if s else 0 for _ in range(count))
    g = {
        "scalefac_compress": scomp,
        "global_gain": rng.randrange(256),
        "big_values": 0,
        "scalefacs": sfs,
        "preflag": rng.randrange(2),
        "scalefac_scale": rng.randrange(2),
        "count1table_select": rng.randrange(2),
    }
    if block_type:
        g["block_type"] = block_type
        g["mixed_block_flag"] = mixed
        g["subblock_gain"] = [rng.randrange(8) for _ in range(3)]
        g["table_select"] = [rng.randrange(32) for _ in range(2)]
    else:
        g["table_select"] = [rng.randrange(32) for _ in range(3)]
        g["region0_count"] = rng.randrange(16)
        g["region1_count"] = rng.randrange(8)
    return g


def _mk_stream(rng, n_frames=6, mono=False, use_scfsi=False,
               block_types=(0,)):
    nch = 1 if mono else 2
    frames = []
    for fi in range(n_frames):
        scfsi = (
            [rng.randrange(2) for _ in range(4)]
            if use_scfsi and fi % 2 else [0, 0, 0, 0]
        )
        bt = block_types[fi % len(block_types)]
        g1 = [_granule(rng, block_type=bt,
                       mixed=(1 if bt == 2 and fi % 3 == 0 else 0))
              for _ in range(nch)]
        g2 = []
        for ci in range(nch):
            bt2 = block_types[(fi + 1) % len(block_types)]
            g = _granule(rng, block_type=bt2,
                         mixed=(1 if bt2 == 2 and fi % 3 == 1 else 0))
            if bt2 != 2 and any(scfsi):
                # shared groups must carry granule-1's values
                from tagminder_spark.sources.mp3 import SCFSI_BANDS

                for grp, (lo, hi) in enumerate(SCFSI_BANDS):
                    if scfsi[grp]:
                        g["scalefacs"][lo:hi] = (
                            g1[ci]["scalefacs"][lo:hi]
                        )
            g2.append(g)
        frames.append({
            "bitrate": rng.choice([96, 112, 128, 160]),
            "padding": rng.randrange(2),
            "main_data_begin": 0 if fi == 0 else rng.randrange(150),
            "scfsi": scfsi,
            "granules": [g1, g2],
        })
    return frames, build_mp3_stream(frames, mono=mono)


def test_frame_table_walks_real_frames():
    rng = random.Random(42)
    frames, data = _mk_stream(rng, n_frames=8)
    table = mp3_frame_table(data)
    assert len(table) == 8
    # offsets chain exactly by the length formula; timing at 44100
    pos = 0
    samples = 0
    for i, (off, flen, ts, spf, rate, br) in enumerate(table):
        assert off == pos and spf == 1152 and rate == 44100
        assert br == frames[i]["bitrate"] * 1000
        assert flen == 1152 * br // 8 // 44100 + frames[i]["padding"]
        assert ts == samples * 1000 // 44100
        pos += flen
        samples += spf
    # ID3v2 prefix is skipped; trailing garbage tolerated
    tag = b"ID3" + bytes([4, 0, 0, 0, 0, 0, 10]) + b"\0" * 10
    t2 = mp3_frame_table(tag + data + b"TAGjunkjunk")
    assert [e[1:] for e in t2] == [e[1:] for e in table]
    assert t2[0][0] == len(tag)
    with pytest.raises(ValueError):
        mp3_frame_table(b"\x00" * 4000)


def test_side_info_roundtrip_property():
    for seed in range(8):
        rng = random.Random(seed)
        mono = seed % 2 == 1
        frames, data = _mk_stream(
            rng, n_frames=5, mono=mono,
            block_types=(0, 2) if seed % 3 else (0,),
        )
        table = mp3_frame_table(data)
        for fi, f in enumerate(frames):
            si = parse_side_info(data, table[fi][0])
            assert si["main_data_begin"] == f["main_data_begin"]
            assert si["channels"] == (1 if mono else 2)
            for gi in range(2):
                for ci in range(si["channels"]):
                    want = f["granules"][gi][ci]
                    got = si["granules"][gi][ci]
                    for k in ("big_values", "global_gain",
                              "scalefac_compress", "preflag",
                              "scalefac_scale", "count1table_select",
                              "part2_3_length"):
                        assert got[k] == want.get(k, got[k]), (fi, gi, ci, k)
                    assert got["block_type"] == want.get("block_type", 0)
                    if want.get("block_type"):
                        assert got["subblock_gain"] == want["subblock_gain"]
                        assert got["table_select"] == want["table_select"][:2]
                    else:
                        assert got["table_select"] == want["table_select"][:3]
                        assert got["region0_count"] == want["region0_count"]
                        assert got["region1_count"] == want["region1_count"]


def test_scalefactors_recovered_through_reservoir():
    """The decisive integer pin: scalefactors come back EXACTLY from
    the reservoir-assembled main data — across frames whose
    main_data_begin reaches into earlier frames' ancillary bytes,
    every block type, and scfsi sharing."""
    for seed in range(10):
        rng = random.Random(1000 + seed)
        mono = seed % 3 == 0
        frames, data = _mk_stream(
            rng, n_frames=6, mono=mono,
            use_scfsi=seed % 2 == 0,
            block_types=(0, 2, 1, 3) if seed % 2 else (0,),
        )
        rep = granule_report(data)
        nch = 1 if mono else 2
        assert len(rep) == 6 * 2 * nch
        for row in rep:
            want = frames[row["frame"]]["granules"][row["granule"]][
                row["channel"]
            ]
            sfs = want["scalefacs"]
            assert row["scalefac_sum"] == sum(sfs), row
            assert row["scalefac_wsum"] == sum(
                (b + 1) * v for b, v in enumerate(sfs)
            ), row
            assert row["n_scalefacs"] == len(sfs)
            assert row["global_gain"] == want["global_gain"]


def test_reservoir_resolution_exact_bytes():
    rng = random.Random(7)
    frames, data = _mk_stream(rng, n_frames=4)
    table = mp3_frame_table(data)
    for fi in range(4):
        buf, start = assemble_main_data(data, table, fi)
        si = parse_side_info(data, table[fi][0])
        # the byte at `start` is the first granule bit-byte; for
        # mdb=0 it is the frame's own slot start
        if si["main_data_begin"] == 0:
            own = data[si["main_data_off"]]
            assert buf[start] == own
        assert 0 <= start < len(buf)
    # a main_data_begin pointing before the stream start raises
    bad = list(frames)
    bad[0] = dict(bad[0], main_data_begin=10)
    with pytest.raises(ValueError):
        build_mp3_stream(bad)


def test_overlapping_reservoir_rejected_by_encoder():
    rng = random.Random(9)
    frames, _ = _mk_stream(rng, n_frames=3)
    # absurd backward reach overlapping previous frame's written bits
    frames[1]["main_data_begin"] = 511
    with pytest.raises(ValueError):
        build_mp3_stream(frames)

"""MPEG-1 Layer III (MP3) STREAM-LAYER machinery — pure python.

What a 100 TB audio-ingestion pipeline needs from MP3 *before* any
PCM exists: frame-aligned byte ranges (the split plan a distributed
chunker issues against object storage — the MP4 ``mp4_sample_table``
shape for MPEG audio), exact per-frame timing, and the Layer III
side-information / scalefactor / **bit-reservoir** layer that decides
which bytes belong to which frame's audio.  All of it is integer
bitstream work, fully specified by the public ISO/IEC 11172-3 frame
layout, and verified here bidirectionally: :func:`build_mp3_stream`
is the encoder twin that constructs real frames (chosen side-info
fields, scalefactors, reservoir spans), and the parser must recover
every field from the assembled bits.

Scope note (the honest seam, round 11): full PCM decode additionally
needs the spec's Huffman code tables (~2,000 tabulated constants,
ISO 11172-3 Annex B.7) and the 512-tap synthesis window (Annex B.3)
— spec DATA, not algorithms.  Unlike JPEG (tables carried in the
file), GIF/FLAC (algorithmic codes), or this module's layer
(structural bit layout), those constants cannot be re-derived and no
copy exists in this container, so a "decoder" built on guessed
tables would self-roundtrip yet silently mis-decode every real-world
file — the plausible-but-unverifiable failure mode this engine
refuses.  The spectral stage therefore stays behind
:func:`~tagminder_spark.sources.multimodal.decode_audio`'s
documented ValueError seam; everything up to it is real.

Reference parity: the reference reads MPEG stream info for duration/
bitrate only (``src/tagminder/tags/mp3.py`` via mutagen); this module
goes deeper than the reference itself on the same container.
"""

from __future__ import annotations

from tagminder_spark.sources.audiotags.id3 import _frame_header

__all__ = [
    "mp3_frame_table",
    "parse_side_info",
    "parse_scalefactors",
    "assemble_main_data",
    "granule_report",
    "build_mp3_stream",
    "SLEN",
]

#: scalefac_compress → (slen1, slen2) — ISO 11172-3 §2.4.2.7
SLEN = [
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
]

#: scfsi band groups over the 21 long scalefactor bands
SCFSI_BANDS = ((0, 6), (6, 11), (11, 16), (16, 21))


class _Bits:
    """MSB-first bit reader over bytes."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def read(self, n: int) -> int:
        v = 0
        d = self.data
        p = self.pos
        if p + n > len(d) * 8:
            raise ValueError("bit read past end of stream")
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v


class _BitsW:
    """MSB-first bit writer."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, n: int) -> None:
        if value < 0 or value >= (1 << n):
            raise ValueError(f"value {value} does not fit in {n} bits")
        self.acc = (self.acc << n) | value
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)

    def getvalue(self) -> bytes:
        if self.nacc:
            return bytes(self.buf) + bytes(
                [(self.acc << (8 - self.nacc)) & 0xFF]
            )
        return bytes(self.buf)

    def bit_length(self) -> int:
        return len(self.buf) * 8 + self.nacc


def _skip_id3v2(data: bytes) -> int:
    if data[:3] == b"ID3" and len(data) >= 10:
        size = (
            (data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
            | (data[8] & 0x7F) << 7 | (data[9] & 0x7F)
        )
        return 10 + size
    return 0


def mp3_frame_table(
    content: bytes, *, max_frames: int | None = None
) -> list[tuple]:
    """Resolve the FRAME TABLE of an MPEG audio stream: one entry
    ``(offset, length, ts_ms, samples_per_frame, sample_rate,
    bitrate)`` per frame — the exact byte-range plan a distributed
    reader issues (``mp4_sample_table``'s shape for MPEG audio).
    Walks real headers (sync + validity + length formula, VBR-safe
    because each frame declares its own bitrate/padding), skips a
    leading ID3v2 block, and REQUIRES the next frame to start exactly
    where the length formula says (or at EOF) — a false sync inside
    payload bytes fails that check and scanning resumes one byte
    later.  Raises ValueError when no valid frame chain exists."""
    pos = _skip_id3v2(content)
    n = len(content)
    table: list[tuple] = []
    samples_acc = 0
    while pos + 4 <= n:
        h = _frame_header(content[pos:pos + 4])
        if h is None:
            if table:
                break  # trailing garbage / ID3v1 after a valid chain
            pos += 1
            continue
        flen = h["frame_len"]
        if flen <= 4 or pos + flen > n:
            if table:
                break
            pos += 1
            continue
        nxt = pos + flen
        bad_next = (
            nxt + 4 <= n and _frame_header(content[nxt:nxt + 4]) is None
        )
        if bad_next and not table:
            # an unproven chain start followed by non-frame bytes is a
            # false sync inside payload — resume scanning
            pos += 1
            continue
        ts_ms = samples_acc * 1000 // h["sample_rate"]
        table.append(
            (pos, flen, ts_ms, h["spf"], h["sample_rate"], h["bitrate"])
        )
        samples_acc += h["spf"]
        pos = nxt
        if bad_next:
            break  # established chain ends here (ID3v1/APE trailer)
        if max_frames is not None and len(table) >= max_frames:
            break
    if not table:
        raise ValueError("no MPEG audio frames found")
    return table


def _header_flags(content: bytes, off: int) -> tuple[bool, bool, int]:
    """(mono, crc_present, side_info_len) for the frame at ``off`` —
    MPEG-1 Layer III only (raises otherwise)."""
    h = _frame_header(content[off:off + 4])
    if h is None:
        raise ValueError(f"no frame header at offset {off}")
    if not (h["mpeg1"] and h["layer"] == 3):
        raise ValueError(
            "side-info layout implemented for MPEG-1 Layer III only"
        )
    crc = (content[off + 1] & 0x01) == 0  # protection bit 0 = CRC present
    mono = h["mono"]
    return mono, crc, (17 if mono else 32)


def parse_side_info(content: bytes, off: int) -> dict:
    """Decode the Layer III SIDE INFORMATION block of the frame at
    byte ``off`` — ISO 11172-3 §2.4.1.7 bit-exact: main_data_begin,
    private bits, per-channel scfsi, and per-(granule, channel)
    part2_3_length / big_values / global_gain / scalefac_compress /
    window-switching (block_type, mixed_block_flag, subblock_gain) or
    region counts, preflag / scalefac_scale / count1table_select."""
    mono, crc, silen = _header_flags(content, off)
    nch = 1 if mono else 2
    start = off + 4 + (2 if crc else 0)
    br = _Bits(content[start:start + silen])
    out: dict = {
        "main_data_begin": br.read(9),
        "private_bits": br.read(5 if mono else 3),
        "scfsi": [[br.read(1) for _ in range(4)] for _ in range(nch)],
        "granules": [],
        "channels": nch,
        "crc": crc,
        "side_info_len": silen,
        "main_data_off": start + silen,
    }
    for _gr in range(2):
        chs = []
        for _ch in range(nch):
            g: dict = {
                "part2_3_length": br.read(12),
                "big_values": br.read(9),
                "global_gain": br.read(8),
                "scalefac_compress": br.read(4),
                "window_switching": br.read(1),
            }
            if g["window_switching"]:
                g["block_type"] = br.read(2)
                g["mixed_block_flag"] = br.read(1)
                g["table_select"] = [br.read(5) for _ in range(2)]
                g["subblock_gain"] = [br.read(3) for _ in range(3)]
                if g["block_type"] == 0:
                    raise ValueError(
                        "window_switching with block_type 0 is illegal"
                    )
            else:
                g["block_type"] = 0
                g["mixed_block_flag"] = 0
                g["table_select"] = [br.read(5) for _ in range(3)]
                g["region0_count"] = br.read(4)
                g["region1_count"] = br.read(3)
            g["preflag"] = br.read(1)
            g["scalefac_scale"] = br.read(1)
            g["count1table_select"] = br.read(1)
            chs.append(g)
        out["granules"].append(chs)
    return out


def _scalefac_layout(g: dict) -> list[tuple[int, int]]:
    """(count, slen_index) runs for one granule-channel — how many
    scalefactors are coded with slen1 (index 0) vs slen2 (index 1):
    long 11+10, short 18+18, mixed 17+18 (ISO §2.4.2.7)."""
    if g["window_switching"] and g["block_type"] == 2:
        if g["mixed_block_flag"]:
            return [(17, 0), (18, 1)]
        return [(18, 0), (18, 1)]
    return [(11, 0), (10, 1)]


def parse_scalefactors(
    br: _Bits, g: dict, *, scfsi=None, prev=None
) -> list[int]:
    """Read one granule-channel's scalefactors from the (reservoir-
    assembled) main data.  ``scfsi``/``prev`` implement the
    granule-2 share: a set scfsi group copies granule 1's values for
    those long bands instead of reading bits."""
    slen = SLEN[g["scalefac_compress"]]
    layout = _scalefac_layout(g)
    long_block = not (g["window_switching"] and g["block_type"] == 2)
    sfs: list[int] = []
    if long_block and scfsi is not None and prev is not None:
        for gi, (lo, hi) in enumerate(SCFSI_BANDS):
            if scfsi[gi]:
                sfs.extend(prev[lo:hi])
            else:
                s = slen[0] if hi <= 11 else slen[1]
                sfs.extend(br.read(s) if s else 0 for _ in range(lo, hi))
        return sfs
    for count, si in layout:
        s = slen[si]
        sfs.extend(br.read(s) if s else 0 for _ in range(count))
    return sfs


def assemble_main_data(
    content: bytes, table: list[tuple], idx: int
) -> tuple[bytes, int]:
    """Resolve frame ``idx``'s MAIN DATA through the bit reservoir:
    Layer III frame payloads form one concatenated main-data stream
    (each frame's slot = its bytes minus header/CRC/side-info), and a
    frame's audio bits start ``main_data_begin`` bytes BEFORE its own
    slot.  Returns (buffer, start_offset_in_buffer) where the buffer
    is the concatenation of just enough preceding slots — the exact
    resolution a seekable distributed reader performs (and the reason
    an MP3 split plan must carry up to 511 bytes of look-back)."""
    si = parse_side_info(content, table[idx][0])
    mdb = si["main_data_begin"]
    pieces: list[bytes] = []
    have = 0
    j = idx
    while j >= 0:
        off, flen = table[j][0], table[j][1]
        s = parse_side_info(content, off)
        slot = content[s["main_data_off"]:off + flen]
        pieces.append(slot)
        if j < idx:
            have += len(slot)
        if have >= mdb:
            break
        j -= 1
    if have < mdb:
        raise ValueError(
            f"main_data_begin {mdb} reaches before the stream start"
        )
    buf = b"".join(reversed(pieces))
    # own slot is the last piece: its start in buf is total minus it
    own_len = (table[idx][0] + table[idx][1]) - si["main_data_off"]
    own_slot_start = len(buf) - own_len
    return buf, own_slot_start - mdb


def granule_report(content: bytes) -> list[dict]:
    """Per-(frame, granule, channel) integer observables, each
    recovered from REAL bits: side-info fields plus the scalefactors
    read from the reservoir-assembled main data.  One dict per
    granule-channel with frame/granule/channel indexes — the gate's
    flattened view (a reservoir off-by-one shifts every subsequent
    bit and corrupts the scalefactor sums)."""
    table = mp3_frame_table(content)
    out: list[dict] = []
    for fi, entry in enumerate(table):
        si = parse_side_info(content, entry[0])
        buf, start = assemble_main_data(content, table, fi)
        br = _Bits(buf, start * 8)
        prev_sfs: list = [None] * si["channels"]
        for gi, chans in enumerate(si["granules"]):
            for ci, g in enumerate(chans):
                p0 = br.pos
                sfs = parse_scalefactors(
                    br, g,
                    scfsi=si["scfsi"][ci] if gi == 1 else None,
                    prev=prev_sfs[ci],
                )
                if gi == 0:
                    prev_sfs[ci] = sfs
                # skip this granule's remaining (huffman) bits so the
                # next granule starts exactly at part2_3_length
                br.pos = p0 + g["part2_3_length"]
                out.append({
                    "frame": fi,
                    "granule": gi,
                    "channel": ci,
                    "offset": entry[0],
                    "frame_len": entry[1],
                    "ts_ms": entry[2],
                    "main_data_begin": si["main_data_begin"],
                    "part2_3_length": g["part2_3_length"],
                    "big_values": g["big_values"],
                    "global_gain": g["global_gain"],
                    "scalefac_compress": g["scalefac_compress"],
                    "block_type": g["block_type"],
                    "n_scalefacs": len(sfs),
                    "scalefac_sum": sum(sfs),
                    "scalefac_wsum": sum(
                        (b + 1) * v for b, v in enumerate(sfs)
                    ),
                })
    return out


# ---------------------------------------------------------------------------
# encoder twin (fixture muxer) — real frames from chosen field values

_BITRATE_CODE = {
    32: 1, 40: 2, 48: 3, 56: 4, 64: 5, 80: 6, 96: 7, 112: 8,
    128: 9, 160: 10, 192: 11, 224: 12, 256: 13, 320: 14,
}
_RATE_CODE = {44100: 0, 48000: 1, 32000: 2}


def _granule_bits(bw: _BitsW, g: dict) -> None:
    bw.write(g["part2_3_length"], 12)
    bw.write(g.get("big_values", 0), 9)
    bw.write(g.get("global_gain", 0), 8)
    bw.write(g.get("scalefac_compress", 0), 4)
    wsf = 1 if g.get("block_type", 0) else 0
    bw.write(wsf, 1)
    if wsf:
        bw.write(g["block_type"], 2)
        bw.write(g.get("mixed_block_flag", 0), 1)
        for t in g.get("table_select", [0, 0])[:2]:
            bw.write(t, 5)
        for s in g.get("subblock_gain", [0, 0, 0]):
            bw.write(s, 3)
    else:
        for t in g.get("table_select", [0, 0, 0])[:3]:
            bw.write(t, 5)
        bw.write(g.get("region0_count", 0), 4)
        bw.write(g.get("region1_count", 0), 3)
    bw.write(g.get("preflag", 0), 1)
    bw.write(g.get("scalefac_scale", 0), 1)
    bw.write(g.get("count1table_select", 0), 1)


def build_mp3_stream(
    frames: list[dict],
    *,
    sample_rate: int = 44100,
    mono: bool = False,
) -> bytes:
    """Construct a REAL MPEG-1 Layer III stream from chosen field
    values — the encoder twin :func:`granule_report` must invert.

    Each ``frames[i]`` dict: ``bitrate`` (kbit), ``padding`` (0/1),
    ``main_data_begin``, and ``granules`` = [[granule-channel dict
    ...] x nch] x 2 whose scalefactors (``scalefacs`` list) are
    written into the shared main-data stream at the exact reservoir
    position ``main_data_begin`` implies; ``part2_3_length`` is set
    to the scalefactor bit count (zero spectral bits — a silent
    granule, legal and exactly what keeps the fixture closed-form).
    Slack slot bytes are 0xAA ancillary filler, which the reservoir
    of LATER frames deliberately reaches back into."""
    nch = 1 if mono else 2
    # frame skeletons + slot byte spans
    skel: list[dict] = []
    pos = 0
    for f in frames:
        br_code = _BITRATE_CODE[f["bitrate"]]
        flen = 1152 * f["bitrate"] * 1000 // 8 // sample_rate + f.get(
            "padding", 0
        )
        silen = 17 if mono else 32
        slot = flen - 4 - silen
        if slot < 0:
            raise ValueError("frame too small for side info")
        skel.append({
            "off": pos, "flen": flen, "slot": slot,
            "slot_start": None, "br_code": br_code,
            "padding": f.get("padding", 0),
        })
        pos += flen
    # shared main-data coordinate: slot i starts at sum of slots < i
    acc = 0
    for s in skel:
        s["slot_start"] = acc
        acc += s["slot"]
    main = bytearray()

    def _pad_to(byte_pos: int) -> None:
        if len(main) > byte_pos:
            raise ValueError(
                f"reservoir overlap: need start {byte_pos}, "
                f"already at {len(main)}"
            )
        main.extend(b"\xaa" * (byte_pos - len(main)))

    for i, f in enumerate(frames):
        mdb = f.get("main_data_begin", 0)
        start = skel[i]["slot_start"] - mdb
        if start < 0:
            raise ValueError("main_data_begin reaches before stream")
        _pad_to(start)
        gw = _BitsW()
        scfsi = f.get("scfsi", [0, 0, 0, 0])
        for gi, chans in enumerate(f["granules"]):
            for g in chans:
                slen = SLEN[g.get("scalefac_compress", 0)]
                lay = (
                    [(17, 0), (18, 1)]
                    if g.get("block_type", 0) == 2
                    and g.get("mixed_block_flag", 0)
                    else [(18, 0), (18, 1)]
                    if g.get("block_type", 0) == 2
                    else [(11, 0), (10, 1)]
                )
                sfs = list(g.get("scalefacs", []))
                want = sum(c for c, _ in lay)
                if len(sfs) != want:
                    raise ValueError(
                        f"need {want} scalefacs, got {len(sfs)}"
                    )
                long_block = g.get("block_type", 0) != 2
                p0 = gw.bit_length()
                if gi == 1 and long_block and any(scfsi):
                    # shared groups are NOT retransmitted — their
                    # values must equal granule 1's (caller contract)
                    for grp, (lo, hi) in enumerate(SCFSI_BANDS):
                        if scfsi[grp]:
                            continue
                        s = slen[0] if hi <= 11 else slen[1]
                        for b in range(lo, hi):
                            if s:
                                gw.write(sfs[b], s)
                            elif sfs[b]:
                                raise ValueError(
                                    "nonzero scalefactor with slen 0"
                                )
                else:
                    k = 0
                    for count, si_ in lay:
                        s = slen[si_]
                        for _ in range(count):
                            if s:
                                gw.write(sfs[k], s)
                            elif sfs[k]:
                                raise ValueError(
                                    "nonzero scalefactor with slen 0"
                                )
                            k += 1
                g["part2_3_length"] = gw.bit_length() - p0
        bits = gw.getvalue()
        main.extend(bits)
    # distribute the shared main-data stream back into frame slots
    total_slots = sum(s["slot"] for s in skel)
    if len(main) > total_slots:
        raise ValueError("main data overflows the stream")
    main.extend(b"\xaa" * (total_slots - len(main)))
    out = bytearray()
    for i, f in enumerate(frames):
        s = skel[i]
        hdr = bytearray(4)
        hdr[0] = 0xFF
        hdr[1] = 0xE0 | (3 << 3) | (1 << 1) | 1  # MPEG1, Layer III, no CRC
        hdr[2] = (s["br_code"] << 4) | (
            _RATE_CODE[sample_rate] << 2
        ) | (s["padding"] << 1)
        hdr[3] = (3 << 6) if mono else 0  # mode: mono / stereo
        out.extend(hdr)
        bw = _BitsW()
        bw.write(f.get("main_data_begin", 0), 9)
        bw.write(0, 5 if mono else 3)
        for _ in range(nch):
            for b in f.get("scfsi", [0, 0, 0, 0]):
                bw.write(b, 1)
        for chans in f["granules"]:
            for g in chans:
                _granule_bits(bw, g)
        si_bytes = bw.getvalue()
        want_len = 17 if mono else 32
        if len(si_bytes) != want_len:
            raise ValueError(
                f"side info came to {len(si_bytes)} bytes, "
                f"expected {want_len}"
            )
        out.extend(si_bytes)
        out.extend(
            main[s["slot_start"]:s["slot_start"] + s["slot"]]
        )
    return bytes(out)

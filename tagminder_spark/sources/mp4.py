"""ISO-BMFF (MP4) structural parser — the REAL half of the video seam.

A video pipeline at 100 TB does two separable things with an MP4 blob:
(1) STRUCTURE — walk the box tree, read the track/codec metadata, and
resolve the sample table (per-frame byte ranges, timestamps, sync
flags) so frame-sampling can slice exact codec samples out of ``mdat``;
(2) CODEC — decode those samples to pixels.  Only (2) needs
ffmpeg/pyav; (1) is pure byte-structure work, and it is what decides
the distributed plan (which byte ranges to fetch, which frames are
seekable).  This module does (1) for real:

- :func:`parse_mp4`: box-tree walk → ``{brand, timescale,
  duration_ms, tracks: [{id, handler, codec, width, height,
  timescale, duration_ms, n_samples}]}``;
- :func:`mp4_sample_table`: the resolved per-sample table of the first
  video track — ``[(offset, size, time_ms, keyframe), ...]`` from
  stts/stsz/stsc/stco(co64)/stss exactly the way a demuxer builds it;
- :func:`extract_sample`: byte-range slice of one sample;
- :func:`make_mp4`: fixture muxer emitting a spec-valid minimal MP4
  (ftyp + mdat + moov with a full sample table, multi-chunk stsc and
  explicit sync samples) so the parser is tested against real
  structure, not itself.

Codec decode of the extracted samples stays behind the documented
pyav seam (:mod:`tagminder_spark.sources.multimodal`).

Reference parity note: the reference's tag scanner reads MP4 metadata
via mutagen (``src/tagminder/core/tags2db.py`` MP4 branch); this is
the same container family parsed from the spec.
"""

from __future__ import annotations

import struct

__all__ = ["parse_mp4", "mp4_sample_table", "extract_sample", "make_mp4"]


# ---------------------------------------------------------------------------
# box walking

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf",
               b"edts", b"udta"}


def _walk(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos:pos + 4])[0]
        btype = data[pos + 4:pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            size = struct.unpack(">Q", data[pos + 8:pos + 16])[0]
            hdr = 16
        elif size == 0:  # to end of enclosing scope
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"bad box size {size} for {btype!r}")
        yield btype, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, *path: bytes):
    """First box at ``path`` (e.g. b"moov", b"mvhd"); None if absent."""
    if not path:
        return (start, end)
    for btype, s, e in _walk(data, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return (s, e)
            return _find(data, s, e, *path[1:])
    return None


def _find_all(data: bytes, start: int, end: int, btype: bytes):
    return [(s, e) for t, s, e in _walk(data, start, end) if t == btype]


def _fullbox(data: bytes, s: int) -> tuple[int, int, int]:
    """(version, flags, body_start_after_fullbox_header)."""
    version = data[s]
    flags = int.from_bytes(data[s + 1:s + 4], "big")
    return version, flags, s + 4


# ---------------------------------------------------------------------------
# parse

def _u(data: bytes, pos: int, n: int) -> int:
    return int.from_bytes(data[pos:pos + n], "big")


def _parse_track(data: bytes, s: int, e: int) -> dict:
    out: dict = {"id": None, "handler": None, "codec": None,
                 "width": None, "height": None, "timescale": None,
                 "duration_ms": None, "n_samples": 0}
    tk = _find(data, s, e, b"tkhd")
    if tk:
        v, _f, p = _fullbox(data, tk[0])
        p += (8 if v == 0 else 16)  # creation+modification times
        out["id"] = _u(data, p, 4)
        # skip reserved + duration + more reserved/layer/volume/matrix
        p = tk[1] - 8
        out["width"] = _u(data, p, 4) >> 16  # 16.16 fixed
        out["height"] = _u(data, p + 4, 4) >> 16
    md = _find(data, s, e, b"mdia", b"mdhd")
    if md:
        v, _f, p = _fullbox(data, md[0])
        if v == 0:
            p += 8
            ts, dur = _u(data, p, 4), _u(data, p + 4, 4)
        else:
            p += 16
            ts, dur = _u(data, p, 4), _u(data, p + 4, 8)
        out["timescale"] = ts
        out["duration_ms"] = dur * 1000 // ts if ts else None
    hd = _find(data, s, e, b"mdia", b"hdlr")
    if hd:
        out["handler"] = data[hd[0] + 8:hd[0] + 12].decode(
            "latin-1"
        )
    sd = _find(data, s, e, b"mdia", b"minf", b"stbl", b"stsd")
    if sd:
        _v, _f, p = _fullbox(data, sd[0])
        if _u(data, p, 4) >= 1:
            out["codec"] = data[p + 8:p + 12].decode("latin-1")
    sz = _find(data, s, e, b"mdia", b"minf", b"stbl", b"stsz")
    if sz:
        _v, _f, p = _fullbox(data, sz[0])
        out["n_samples"] = _u(data, p + 4, 4)
    return out


def parse_mp4(content: bytes) -> dict:
    """Parse the box structure to the catalog-level metadata a media
    table wants in its typed ``meta`` struct (brand, movie duration,
    per-track handler/codec/dims/sample count) — driver-side/statistics
    material; no sample bytes touched."""
    if len(content) < 12 or content[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF (MP4) stream")
    out: dict = {"brand": content[8:12].decode("latin-1"),
                 "timescale": None, "duration_ms": None, "tracks": []}
    moov = _find(content, 0, len(content), b"moov")
    if moov is None:
        raise ValueError("MP4 lacks a moov box")
    mv = _find(content, moov[0], moov[1], b"mvhd")
    if mv:
        v, _f, p = _fullbox(content, mv[0])
        if v == 0:
            p += 8
            ts, dur = _u(content, p, 4), _u(content, p + 4, 4)
        else:
            p += 16
            ts, dur = _u(content, p, 4), _u(content, p + 4, 8)
        out["timescale"] = ts
        out["duration_ms"] = dur * 1000 // ts if ts else None
    for s, e in _find_all(content, moov[0], moov[1], b"trak"):
        out["tracks"].append(_parse_track(content, s, e))
    return out


def _checked_count(n: int, box, per_entry: int, base: int) -> int:
    """Entry counts must fit the box they came from — garbage bytes
    that happen to parse as a box header must not drive allocations."""
    s, e = box
    if n < 0 or base + n * per_entry > (e - s):
        raise ValueError("sample-table entry count exceeds box size")
    return n


def _table_u32s(data: bytes, box, *, skip: int = 0) -> list[int]:
    _v, _f, p = _fullbox(data, box[0])
    n = _checked_count(_u(data, p, 4), box, 4, 8 + skip)
    p += 4 + skip
    return [_u(data, p + 4 * i, 4) for i in range(n)]


def mp4_sample_table(
    content: bytes, *, track: int = 0, handler: str = "vide"
) -> list[tuple]:
    """Resolve the full per-sample table of the ``track``-th track of
    ``handler`` type (``"vide"`` for video, ``"soun"`` for audio — the
    m4a shape the reference's tag scanner handles via mutagen MP4):
    ``[(offset, size, time_ms, keyframe), ...]`` — the exact demuxer
    computation: stts expands to per-sample decode times, stsc maps
    samples into chunks, stco/co64 anchors each chunk's first byte,
    stsz sizes accumulate within a chunk, stss marks the sync samples
    (all samples sync when absent).  This is the structure a
    distributed frame-sampler or audio-chunker needs to plan
    byte-range reads."""
    moov = _find(content, 0, len(content), b"moov")
    if moov is None:
        raise ValueError("MP4 lacks a moov box")
    want = handler.encode("latin-1")
    vids = []
    for s, e in _find_all(content, moov[0], moov[1], b"trak"):
        hd = _find(content, s, e, b"mdia", b"hdlr")
        if hd and content[hd[0] + 8:hd[0] + 12] == want:
            vids.append((s, e))
    if track >= len(vids):
        raise ValueError(f"no {handler} track {track}")
    s, e = vids[track]
    stbl = _find(content, s, e, b"mdia", b"minf", b"stbl")
    if stbl is None:
        raise ValueError("video track lacks stbl")
    md = _find(content, s, e, b"mdia", b"mdhd")
    v, _f, p = _fullbox(content, md[0])
    timescale = _u(content, p + (8 if v == 0 else 16), 4)

    stts = _find(content, stbl[0], stbl[1], b"stts")
    stsz = _find(content, stbl[0], stbl[1], b"stsz")
    stsc = _find(content, stbl[0], stbl[1], b"stsc")
    stco = _find(content, stbl[0], stbl[1], b"stco")
    co64 = _find(content, stbl[0], stbl[1], b"co64")
    if not (stts and stsz and stsc and (stco or co64)):
        raise ValueError("incomplete sample table")

    # sizes
    _v, _f, p = _fullbox(content, stsz[0])
    fixed = _u(content, p, 4)
    n_samples = _u(content, p + 4, 4)
    if fixed:
        if n_samples > 1 << 24:
            raise ValueError("implausible sample count")
        sizes = [fixed] * n_samples
    else:
        _checked_count(n_samples, stsz, 4, 12)
        sizes = [_u(content, p + 8 + 4 * i, 4) for i in range(n_samples)]

    # decode times
    _v, _f, p = _fullbox(content, stts[0])
    n_ent = _checked_count(_u(content, p, 4), stts, 8, 8)
    times: list[int] = []
    t = 0
    for i in range(n_ent):
        cnt = _u(content, p + 4 + 8 * i, 4)
        delta = _u(content, p + 8 + 8 * i, 4)
        if len(times) + cnt > n_samples + (1 << 16):
            raise ValueError("stts entries exceed sample count")
        for _ in range(cnt):
            times.append(t)
            t += delta
    if len(times) < n_samples:
        raise ValueError("stts covers fewer samples than stsz")

    # chunk offsets
    if stco:
        offsets = _table_u32s(content, stco)
    else:
        _v, _f, p = _fullbox(content, co64[0])
        n = _checked_count(_u(content, p, 4), co64, 8, 8)
        offsets = [_u(content, p + 4 + 8 * i, 8) for i in range(n)]

    # sample→chunk map
    _v, _f, p = _fullbox(content, stsc[0])
    n_ent = _checked_count(_u(content, p, 4), stsc, 12, 8)
    entries = [
        (_u(content, p + 4 + 12 * i, 4),      # first_chunk (1-based)
         _u(content, p + 8 + 12 * i, 4))      # samples_per_chunk
        for i in range(n_ent)
    ]
    sync = None
    stss = _find(content, stbl[0], stbl[1], b"stss")
    if stss:
        sync = set(_table_u32s(content, stss))  # 1-based sample numbers

    out: list[tuple] = []
    si = 0
    for ci, chunk_off in enumerate(offsets):
        spc = 0
        for first, count in entries:
            if ci + 1 >= first:
                spc = count
        pos = chunk_off
        for _ in range(spc):
            if si >= n_samples:
                break
            key = sync is None or (si + 1) in sync
            out.append(
                (pos, sizes[si], times[si] * 1000 // timescale, key)
            )
            pos += sizes[si]
            si += 1
    if si < n_samples:
        raise ValueError("chunk map covers fewer samples than stsz")
    return out


def extract_sample(content: bytes, entry: tuple) -> bytes:
    """Slice one sample's bytes by its table entry — the in-memory
    analogue of the byte-range fetch a distributed reader issues
    against object storage."""
    off, size = entry[0], entry[1]
    if off + size > len(content):
        raise ValueError("sample range beyond stream")
    return content[off:off + size]


# ---------------------------------------------------------------------------
# fixture muxer

def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(
        btype,
        bytes([version]) + flags.to_bytes(3, "big") + payload,
    )


def make_mp4(
    payloads: list[bytes],
    *,
    fps: int = 10,
    timescale: int = 1000,
    width: int = 64,
    height: int = 48,
    codec: bytes = b"mp4v",
    sync_every: int = 3,
    chunk_sizes: tuple[int, ...] = (2,),
    use_co64: bool = False,
    handler: str = "vide",
) -> bytes:
    """Mux ``payloads`` (one opaque codec sample each) into a spec-valid
    minimal MP4: ftyp + mdat + moov with the complete sample table.
    ``chunk_sizes`` cycles to split samples into multiple chunks (so
    stsc/stco resolution is genuinely exercised); every
    ``sync_every``-th sample is marked sync in stss.  Payload bytes are
    stored verbatim, so extraction is byte-exact and oracle-checkable.
    ``handler="soun"`` emits an m4a-shaped AUDIO track instead (smhd +
    AudioSampleEntry; ``fps`` then means sample-batches per second)."""
    n = len(payloads)
    if n == 0:
        raise ValueError("need at least one sample")
    delta = timescale // fps
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) +
                b"isommp41")
    mdat_payload = b"".join(payloads)
    mdat_start = len(ftyp) + 8  # first sample's absolute offset

    # split into chunks
    chunks: list[list[int]] = []
    i = 0
    ci = 0
    while i < n:
        take = chunk_sizes[ci % len(chunk_sizes)]
        chunks.append(list(range(i, min(i + take, n))))
        i += take
        ci += 1
    chunk_offs = []
    pos = mdat_start
    for ch in chunks:
        chunk_offs.append(pos)
        pos += sum(len(payloads[j]) for j in ch)

    dur = n * delta
    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIIII", 0, 0, timescale, dur, 0x00010000
    ) + struct.pack(">HHII", 0x0100, 0, 0, 0) + struct.pack(
        ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
    ) + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, 1, 0, dur
    ) + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) + struct.pack(
        ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
    ) + struct.pack(">II", width << 16, height << 16))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, timescale, dur, 0x55C4, 0
    ))
    hbytes = handler.encode("latin-1")
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + hbytes +
                 b"\x00" * 12 + b"fixture\x00")
    if handler == "soun":
        vmhd = _full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
    else:
        vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) +
                 _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    if handler == "soun":
        entry = (
            b"\x00" * 6 + struct.pack(">H", 1)      # data_reference_index
            + b"\x00" * 8                            # reserved
            + struct.pack(">HHHH", 2, 16, 0, 0)      # ch, bits, predefined
            + struct.pack(">I", timescale << 16)     # samplerate 16.16
        )
    else:
        entry = (
            b"\x00" * 6 + struct.pack(">H", 1)      # data_reference_index
            + b"\x00" * 16
            + struct.pack(">HH", width, height)
            + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
            + struct.pack(">I", 0)
            + struct.pack(">H", 1)                    # frame count
            + b"\x00" * 32                           # compressor name
            + struct.pack(">Hh", 24, -1)              # depth, pre_defined
        )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) +
                 _box(codec, entry))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc_entries = []
    prev = None
    for idx, ch in enumerate(chunks):
        if prev != len(ch):
            stsc_entries.append((idx + 1, len(ch), 1))
            prev = len(ch)
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", len(stsc_entries)) +
                 b"".join(struct.pack(">III", *e) for e in stsc_entries))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n) +
                 b"".join(struct.pack(">I", len(p)) for p in payloads))
    if use_co64:
        stco = _full(b"co64", 0, 0, struct.pack(">I", len(chunk_offs)) +
                     b"".join(struct.pack(">Q", o) for o in chunk_offs))
    else:
        stco = _full(b"stco", 0, 0, struct.pack(">I", len(chunk_offs)) +
                     b"".join(struct.pack(">I", o) for o in chunk_offs))
    syncs = [i + 1 for i in range(n) if i % sync_every == 0]
    stss = _full(b"stss", 0, 0, struct.pack(">I", len(syncs)) +
                 b"".join(struct.pack(">I", s) for s in syncs))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov

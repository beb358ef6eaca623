"""MP4/M4A parsing from the public ISO BMFF spec + iTunes ilst
conventions.  Atom→name table matches the reference's
(`vendor/audioinf/mp4.py:42-87` — the public iTunes atom vocabulary).
"""

from __future__ import annotations

from ._bits import be_int

ILST_NAMES = {
    "©nam": "title", "©alb": "album", "©ART": "artist",
    "aART": "albumartist", "©wrt": "composer", "©day": "year",
    "©cmt": "comment", "©gen": "genre", "©grp": "grouping",
    "©lyr": "lyrics", "©too": "encodedby", "cprt": "copyright",
    "tmpo": "bpm", "cpil": "itunescompilationflag",
    "soal": "albumsortorder", "soaa": "albumartistsortorder",
    "soar": "artistsortorder", "sonm": "titlesortorder",
    "soco": "composersortorder", "tvsh": "showname",
    "pgap": "partofgaplessalbum", "geID": "itunesgenreid",
    "plID": "itunesalbumid",
}

_CONTAINERS = {b"moov", b"udta", b"trak", b"mdia", b"minf", b"stbl"}


def _atoms(data: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) for sibling atoms."""
    while pos + 8 <= end:
        size = be_int(data[pos:pos + 4])
        atype = data[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            size = be_int(data[pos + 8:pos + 16])
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr:
            return
        yield atype, pos + hdr, min(pos + size, end)
        pos += size


def _find(data: bytes, pos: int, end: int, path: list[bytes]):
    """Walk an atom path; 'meta' carries a 4-byte version/flags prefix."""
    if not path:
        yield pos, end
        return
    head, rest = path[0], path[1:]
    for atype, s, e in _atoms(data, pos, end):
        if atype == head:
            if atype == b"meta":
                s += 4
            yield from _find(data, s, e, rest)


def _data_payloads(data: bytes, s: int, e: int):
    """The 'data' children of one ilst entry → (flags, payload)."""
    for atype, ds, de in _atoms(data, s, e):
        if atype == b"data" and de - ds >= 8:
            flags = be_int(data[ds:ds + 4]) & 0xFFFFFF
            yield flags, data[ds + 8:de]


def _decode_ilst_value(key: str, flags: int, payload: bytes) -> str | None:
    if flags == 1:  # UTF-8 text
        return payload.decode("utf-8", "replace")
    if flags == 2:  # UTF-16 text
        return payload.decode("utf-16-be", "replace")
    if flags in (21, 22, 0x15, 0x16) or flags == 0:
        # big-endian int (21 signed / 22 unsigned) or implicit binary
        if key in ("track", "discnumber") and len(payload) >= 6:
            num = be_int(payload[2:4])
            total = be_int(payload[4:6])
            if num:
                return f"{num}/{total}" if total else str(num)
            return None
        if payload:
            return str(be_int(payload[-4:] if len(payload) > 4 else payload))
    return None


def _mvhd_duration(data: bytes, s: int, e: int) -> float | None:
    if s >= e or s >= len(data):  # empty mvhd body at EOF (fuzz-found)
        return None
    ver = data[s]
    if ver == 1 and e - s >= 32:
        timescale = be_int(data[s + 20:s + 24])
        duration = be_int(data[s + 24:s + 32])
    elif e - s >= 24:
        timescale = be_int(data[s + 12:s + 16])
        duration = be_int(data[s + 16:s + 20])
    else:
        return None
    return duration / timescale if timescale else None


def _mp4a_info(data: bytes, s: int, e: int) -> dict:
    """stsd's mp4a sample entry: channels/bits/samplerate at the fixed
    ISO 14496-12 AudioSampleEntry offsets."""
    for atype, as_, ae in _atoms(data, s + 8, e):  # skip stsd vers+count
        if atype in (b"mp4a", b"alac", b"ac-3"):
            if ae - as_ >= 28:
                return {
                    "channels": be_int(data[as_ + 16:as_ + 18]),
                    "bits_per_sample": be_int(data[as_ + 18:as_ + 20]),
                    "sample_rate": be_int(data[as_ + 24:as_ + 26]),
                    "codec": atype.decode("latin-1"),
                }
    return {}


def parse_mp4(data: bytes) -> tuple[dict, dict]:
    tags: dict[str, list[str]] = {}
    info: dict = {}
    end = len(data)
    for s, e in _find(data, 0, end, [b"moov"]):
        for atype, as_, ae in _atoms(data, s, e):
            if atype == b"mvhd":
                d = _mvhd_duration(data, as_, ae)
                if d is not None:
                    info["length"] = d
        for ms, me in _find(data, s, e, [b"udta", b"meta", b"ilst"]):
            _parse_ilst(data, ms, me, tags, info)
        for ss, se in _find(
            data, s, e, [b"trak", b"mdia", b"minf", b"stbl", b"stsd"]
        ):
            got = _mp4a_info(data, ss, se)
            if got:
                info.update(got)
                break
    if info.get("length") and "bitrate" not in info:
        info["bitrate"] = int(len(data) * 8 / info["length"])
    return tags, info


def _parse_ilst(data: bytes, pos: int, end: int, tags: dict, info: dict
                ) -> None:
    for atype, s, e in _atoms(data, pos, end):
        name = atype.decode("latin-1", "replace")
        if atype == b"covr":
            info["num_images"] = info.get("num_images", 0) + sum(
                1 for _ in _data_payloads(data, s, e)
            )
            continue
        if atype == b"trkn":
            key = "track"
        elif atype == b"disk":
            key = "discnumber"
        elif atype == b"----":
            key = None
            for ft, fs, fe in _atoms(data, s, e):
                if ft == b"name":
                    key = (
                        data[fs + 4:fe].decode("utf-8", "replace").lower()
                    )
            if not key:
                continue
        else:
            key = ILST_NAMES.get(name, name.replace("©", "").lower())
        for flags, payload in _data_payloads(data, s, e):
            val = _decode_ilst_value(key, flags, payload)
            if val:
                tags.setdefault(key, []).append(val)

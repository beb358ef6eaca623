"""ASF/WMA parsing from the public ASF specification (Microsoft, GUID
object stream): Content Description + Extended Content Description for
tags, File Properties for duration.

WM/* attribute names map to the reference's canonical keys the same way
its wma module does (`vendor/audioinf/wma.py` — the public WM/
vocabulary).
"""

from __future__ import annotations

from ._bits import le_int

HEADER_GUID = bytes.fromhex("3026b2758e66cf11a6d900aa0062ce6c")
FILE_PROPS_GUID = bytes.fromhex("a1dcab8c47a9cf118ee400c00c205365")
CONTENT_DESC_GUID = bytes.fromhex("3326b2758e66cf11a6d900aa0062ce6c")
EXT_CONTENT_GUID = bytes.fromhex("40a4d0d207e3d21197f000a0c95ea850")

WM_NAMES = {
    "wm/albumtitle": "album", "wm/albumartist": "albumartist",
    "wm/tracknumber": "track", "wm/track": "track", "wm/year": "year",
    "wm/genre": "genre", "wm/composer": "composer",
    "wm/conductor": "conductor", "wm/lyrics": "lyrics",
    "wm/publisher": "organization", "wm/partofset": "discnumber",
    "wm/beatsperminute": "bpm", "wm/isrc": "isrc",
    "wm/writer": "lyricist", "wm/mood": "mood",
    "wm/contentgroupdescription": "grouping",
    "wm/originalalbumtitle": "originalalbum",
    "wm/originalartist": "originalartist",
    "wm/originallyricist": "author", "wm/subtitle": "version",
    "wm/encodedby": "encodedby", "wm/modifiedby": "arranger",
    "wm/titlesortorder": "titlesortorder",
    "wm/artistsortorder": "artistsortorder",
    "wm/albumsortorder": "albumsortorder",
}


def _utf16z(b: bytes) -> str:
    return b.decode("utf-16-le", "replace").rstrip("\x00")


def _add(tags: dict, key: str, val: str) -> None:
    if key and val:
        tags.setdefault(key, []).append(val)


def _content_description(body: bytes, tags: dict) -> None:
    if len(body) < 10:
        return
    lens = [le_int(body[i:i + 2]) for i in range(0, 10, 2)]
    pos = 10
    fields = ["title", "artist", "copyright", "comment", "rating"]
    for name, ln in zip(fields, lens):
        val = _utf16z(body[pos:pos + ln])
        pos += ln
        if name != "rating":
            _add(tags, name, val)


def _ext_content_description(body: bytes, tags: dict) -> None:
    if len(body) < 2:
        return
    count = le_int(body[0:2])
    pos = 2
    for _ in range(count):
        if pos + 2 > len(body):
            break
        nlen = le_int(body[pos:pos + 2])
        pos += 2
        name = _utf16z(body[pos:pos + nlen]).lower()
        pos += nlen
        if pos + 4 > len(body):
            break
        dtype = le_int(body[pos:pos + 2])
        vlen = le_int(body[pos + 2:pos + 4])
        pos += 4
        raw = body[pos:pos + vlen]
        pos += vlen
        if dtype == 0:            # UTF-16 string
            val = _utf16z(raw)
        elif dtype == 2:          # bool (u32)
            val = str(int(bool(le_int(raw[:4]))))
        elif dtype in (3, 4, 5):  # u32 / u64 / u16
            val = str(le_int(raw))
        else:                     # binary
            continue
        _add(tags, WM_NAMES.get(name, name), val)


def parse_asf(data: bytes) -> tuple[dict, dict]:
    tags: dict[str, list[str]] = {}
    info: dict = {}
    if not data.startswith(HEADER_GUID) or len(data) < 30:
        return tags, info
    count = le_int(data[24:28])
    pos = 30
    for _ in range(count):
        if pos + 24 > len(data):
            break
        guid = data[pos:pos + 16]
        size = le_int(data[pos + 16:pos + 24])
        if size < 24:
            break
        body = data[pos + 24:pos + size]
        if guid == CONTENT_DESC_GUID:
            _content_description(body, tags)
        elif guid == EXT_CONTENT_GUID:
            _ext_content_description(body, tags)
        elif guid == FILE_PROPS_GUID and len(body) >= 80:
            play_duration = le_int(body[40:48])   # 100 ns units
            preroll_ms = le_int(body[56:64])
            length = play_duration / 1e7 - preroll_ms / 1000.0
            if length > 0:
                info["length"] = length
                info["bitrate"] = int(len(data) * 8 / length)
        pos += size
    info["codec"] = "wma"
    return tags, info

"""FLAC metadata parsing from the public format spec
(xiph.org/flac/format.html): STREAMINFO for technical info,
VORBIS_COMMENT for tags, PICTURE counted.

Key contract matches the reference's Vorbis mapping
(`vendor/audioinf/__init__.py:118`: ``tracknumber`` → ``track``).
"""

from __future__ import annotations

from ._bits import be_int, le_int

# VorbisComment / APEv2 field-name aliases the reference maps onto its
# canonical names (vendor/audioinf/__init__.py:118-119).
VORBIS_KEY_MAP = {"tracknumber": "track"}


def parse_vorbis_comment(data: bytes, key_map: dict[str, str] | None = None
                         ) -> dict[str, list[str]]:
    """The little-endian length-prefixed comment block shared by FLAC,
    Ogg Vorbis, and Opus (OpusTags)."""
    key_map = VORBIS_KEY_MAP if key_map is None else key_map
    tags: dict[str, list[str]] = {}
    if len(data) < 8:
        return tags
    vlen = le_int(data[0:4])
    pos = 4 + vlen
    if pos + 4 > len(data):
        return tags
    count = le_int(data[pos:pos + 4])
    pos += 4
    for _ in range(count):
        if pos + 4 > len(data):
            break
        clen = le_int(data[pos:pos + 4])
        pos += 4
        entry = data[pos:pos + clen]
        pos += clen
        if b"=" not in entry:
            continue
        k, v = entry.split(b"=", 1)
        key = k.decode("utf-8", "replace").strip().lower()
        key = key_map.get(key, key)
        val = v.decode("utf-8", "replace")
        if key and val:
            tags.setdefault(key, []).append(val)
    return tags


def parse_streaminfo(block: bytes) -> dict:
    """STREAMINFO (34 bytes): bit-packed sample rate (20), channels-1
    (3), bits-1 (5), total samples (36), raw MD5 (16)."""
    if len(block) < 34:
        return {}
    packed = be_int(block[10:18])  # the 64 bits holding rate/ch/bps/samples
    sample_rate = packed >> 44
    channels = ((packed >> 41) & 0x07) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    total_samples = packed & ((1 << 36) - 1)
    info = {
        "sample_rate": sample_rate, "channels": channels,
        "bits_per_sample": bps, "md5": block[18:34].hex(),
    }
    if sample_rate and total_samples:
        info["length"] = total_samples / sample_rate
    return info


def has_flac_after_id3(data: bytes) -> bool:
    """FLAC files may carry a leading ID3v2 tag; check for the fLaC
    marker right after it."""
    from .id3 import parse_id3v2

    _, size, _ = parse_id3v2(data)
    return size > 0 and data[size:size + 4] == b"fLaC"


def parse_flac(data: bytes) -> tuple[dict, dict]:
    start = 0
    tags: dict[str, list[str]] = {}
    if data.startswith(b"ID3"):
        from .id3 import parse_id3v2

        id3_tags, start, _ = parse_id3v2(data)
        tags.update(id3_tags)
    if data[start:start + 4] != b"fLaC":
        return tags, {}
    pos = start + 4
    info: dict = {}
    images = 0
    while pos + 4 <= len(data):
        hdr = data[pos]
        btype = hdr & 0x7F
        bsize = be_int(data[pos + 1:pos + 4])
        block = data[pos + 4:pos + 4 + bsize]
        pos += 4 + bsize
        if btype == 0:
            info.update(parse_streaminfo(block))
        elif btype == 4:
            for k, v in parse_vorbis_comment(block).items():
                tags.setdefault(k, []).extend(v)
        elif btype == 6:
            images += 1
        if hdr & 0x80:  # last-metadata-block flag
            break
    if info.get("length") and pos < len(data):
        info["bitrate"] = int((len(data) - pos) * 8 / info["length"])
    if images:
        info["num_images"] = images
    return tags, info

"""Ogg container parsing (RFC 3533 pages) with Vorbis
(xiph.org Vorbis I spec §4.2) and Opus (RFC 7845) stream headers.

Duration comes from the final page's granule position — sample count
for Vorbis, 48 kHz units minus pre-skip for Opus.
"""

from __future__ import annotations

from ._bits import le_int
from .flac import parse_vorbis_comment


def _pages(data: bytes):
    """Yield (granule, payload) per Ogg page until headers are done."""
    pos = 0
    while pos + 27 <= len(data):
        if data[pos:pos + 4] != b"OggS":
            nxt = data.find(b"OggS", pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        granule = le_int(data[pos + 6:pos + 14])
        nsegs = data[pos + 26]
        lacing = data[pos + 27:pos + 27 + nsegs]
        size = sum(lacing)
        payload = data[pos + 27 + nsegs:pos + 27 + nsegs + size]
        yield granule, payload
        pos += 27 + nsegs + size


def _last_granule(data: bytes) -> int:
    """Granule position of the final page — scan backward from EOF."""
    idx = data.rfind(b"OggS")
    while idx >= 0:
        if idx + 14 <= len(data):
            g = le_int(data[idx + 6:idx + 14])
            if g not in (0, (1 << 64) - 1):
                return g
        idx = data.rfind(b"OggS", 0, idx)
    return 0


def parse_ogg(data: bytes) -> tuple[dict, dict]:
    tags: dict[str, list[str]] = {}
    info: dict = {}
    buf = b""
    preskip = 0
    for i, (_, payload) in enumerate(_pages(data)):
        buf += payload
        if i > 8:
            break
        if buf.startswith(b"\x01vorbis") and len(buf) >= 28:
            info["codec"] = "vorbis"
            info["channels"] = buf[11]
            info["sample_rate"] = le_int(buf[12:16])
            nominal = le_int(buf[20:24])
            if nominal:
                info["bitrate"] = nominal
            buf = b""
        elif buf.startswith(b"OpusHead") and len(buf) >= 19:
            info["codec"] = "opus"
            info["channels"] = buf[9]
            preskip = le_int(buf[10:12])
            info["sample_rate"] = 48000  # Opus always decodes at 48 kHz
            buf = b""
        elif buf.startswith(b"\x03vorbis"):
            tags.update(parse_vorbis_comment(buf[7:]))
            break
        elif buf.startswith(b"OpusTags"):
            tags.update(parse_vorbis_comment(buf[8:]))
            break
    granule = _last_granule(data)
    if granule and info.get("sample_rate"):
        if info.get("codec") == "opus":
            info["length"] = max(granule - preskip, 0) / 48000.0
        else:
            info["length"] = granule / info["sample_rate"]
        if not info.get("bitrate") and info.get("length"):
            info["bitrate"] = int(len(data) * 8 / info["length"])
    return tags, info

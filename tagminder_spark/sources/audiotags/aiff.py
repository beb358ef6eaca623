"""AIFF/AIFC parsing (public EA IFF 85 / Apple AIFF spec): COMM chunk
for stream info, embedded 'ID3 ' chunk for tags."""

from __future__ import annotations

from ._bits import be_int, read_extended_float80


def parse_aiff(data: bytes) -> tuple[dict, dict]:
    tags: dict[str, list[str]] = {}
    info: dict = {}
    if not data.startswith(b"FORM") or data[8:12] not in (b"AIFF", b"AIFC"):
        return tags, info
    pos = 12
    end = min(len(data), 8 + be_int(data[4:8]))
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        csize = be_int(data[pos + 4:pos + 8])
        # materialize only the chunks we decode — SSND (the audio) is
        # skipped by seek, never read
        body = (
            data[pos + 8:pos + 8 + csize]
            if cid in (b"COMM", b"ID3 ", b"id3 ")
            else b""
        )
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
        if cid == b"COMM" and len(body) >= 18:
            channels = be_int(body[0:2])
            frames = be_int(body[2:6])
            bps = be_int(body[6:8])
            rate = read_extended_float80(body[8:18])
            info.update(
                {"channels": channels, "bits_per_sample": bps,
                 "sample_rate": int(rate) if rate else None}
            )
            if rate and frames:
                info["length"] = frames / rate
        elif cid in (b"ID3 ", b"id3 "):
            from .id3 import parse_id3v2

            id3_tags, _, images = parse_id3v2(body)
            tags.update(id3_tags)
            if images:
                info["num_images"] = images
    if info.get("length"):
        info["bitrate"] = int(len(data) * 8 / info["length"])
    info = {k: v for k, v in info.items() if v is not None}
    return tags, info

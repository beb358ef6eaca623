"""APEv2 tags (public spec: wiki.hydrogenaud.io/APEv2) plus minimal
stream info for the formats that carry them — Monkey's Audio (.ape)
and WavPack (.wv).

Key aliases match the reference's APEv2 mapping
(`vendor/audioinf/__init__.py:119`: ``disc`` → ``discnumber``,
``album artist`` → ``albumartist``).
"""

from __future__ import annotations

from ._bits import le_int

APE_KEY_MAP = {"disc": "discnumber", "album artist": "albumartist"}

_PREAMBLE = b"APETAGEX"


def parse_apev2(data: bytes) -> dict[str, list[str]]:
    """APEv2 tag at EOF (optionally before an ID3v1 trailer)."""
    tail = data[-32:]
    off = len(data) - 32
    if not tail.startswith(_PREAMBLE) and len(data) >= 160:
        tail = data[-160:-128]  # footer sits before ID3v1
        off = len(data) - 160
    if not tail.startswith(_PREAMBLE):
        return {}
    tag_size = le_int(tail[12:16])      # items + footer, not header
    item_count = le_int(tail[16:20])
    start = off + 32 - tag_size
    pos = max(start, 0)
    tags: dict[str, list[str]] = {}
    for _ in range(item_count):
        if pos + 8 > off:
            break
        vsize = le_int(data[pos:pos + 4])
        flags = le_int(data[pos + 4:pos + 8])
        key_end = data.find(b"\x00", pos + 8)
        if key_end < 0:
            break
        key = data[pos + 8:key_end].decode("latin-1", "replace").lower()
        value = data[key_end + 1:key_end + 1 + vsize]
        pos = key_end + 1 + vsize
        if flags & 0x06:  # binary / external items: skip payload
            continue
        key = APE_KEY_MAP.get(key, key)
        vals = [
            v.decode("utf-8", "replace")
            for v in value.split(b"\x00")
            if v
        ]
        if key and vals:
            tags.setdefault(key, []).extend(vals)
    return tags


def monkeys_info(data: bytes) -> dict:
    """Monkey's Audio header: 'MAC ' + LE version; ≥3.98 uses a
    descriptor + header struct, older packs fields inline."""
    if not data.startswith(b"MAC ") or len(data) < 32:
        return {}
    version = le_int(data[4:6])
    info: dict = {"version": version / 1000.0}
    if version >= 3980 and len(data) >= 76:
        desc_len = le_int(data[8:12])
        h = desc_len  # header struct follows the descriptor
        if len(data) >= h + 30:
            blocks_per_frame = le_int(data[h + 4:h + 8])
            final_blocks = le_int(data[h + 8:h + 12])
            total_frames = le_int(data[h + 12:h + 16])
            bps = le_int(data[h + 16:h + 18])
            channels = le_int(data[h + 18:h + 20])
            sample_rate = le_int(data[h + 20:h + 24])
            total = (
                blocks_per_frame * max(total_frames - 1, 0) + final_blocks
            )
            info.update(
                {"channels": channels, "sample_rate": sample_rate,
                 "bits_per_sample": bps}
            )
            if sample_rate and total:
                info["length"] = total / sample_rate
    return info


# WavPack sample-rate table (public spec, flags bits 23-26)
_WV_RATES = (6000, 8000, 9600, 11025, 12000, 16000, 22050, 24000,
             32000, 44100, 48000, 64000, 88200, 96000, 192000)


def wavpack_info(data: bytes) -> dict:
    """First WavPack block header: 'wvpk' + LE fields (public spec)."""
    if not data.startswith(b"wvpk") or len(data) < 32:
        return {}
    total_samples = le_int(data[12:16])
    flags = le_int(data[24:28])
    rate_idx = (flags >> 23) & 0x0F
    info: dict = {
        "channels": 1 if flags & 0x04 else 2,
        "bits_per_sample": ((flags & 0x03) + 1) * 8,
    }
    if rate_idx < len(_WV_RATES):
        info["sample_rate"] = _WV_RATES[rate_idx]
        if total_samples not in (0, 0xFFFFFFFF):
            info["length"] = total_samples / info["sample_rate"]
    return info


def parse_ape_file(data: bytes) -> tuple[dict, dict]:
    return parse_apev2(data), monkeys_info(data)


def parse_wavpack_file(data: bytes) -> tuple[dict, dict]:
    return parse_apev2(data), wavpack_info(data)

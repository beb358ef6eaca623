"""Shared byte-level helpers for the audiotags parsers."""

from __future__ import annotations

import struct


def syncsafe(b: bytes) -> int:
    """ID3v2 syncsafe integer: 7 data bits per byte, MSB first."""
    n = 0
    for byte in b:
        n = (n << 7) | (byte & 0x7F)
    return n


def be_int(b: bytes) -> int:
    return int.from_bytes(b, "big")


def le_int(b: bytes) -> int:
    return int.from_bytes(b, "little")


# ID3v2 text-encoding byte → (codec, NUL terminator width)
_ENCODINGS = {
    0: ("latin-1", 1),
    1: ("utf-16", 2),
    2: ("utf-16-be", 2),
    3: ("utf-8", 1),
}


def decode_text(enc: int, raw: bytes) -> list[str]:
    """Decode an ID3v2 text payload into its NUL-separated string list
    (ID3v2.4 §4.2 allows multiple strings; v2.3 writers emit them too)."""
    codec, width = _ENCODINGS.get(enc, ("latin-1", 1))
    parts: list[str] = []
    for chunk in _split_nul(raw, width):
        try:
            s = chunk.decode(codec, errors="replace")
        except LookupError:  # pragma: no cover
            s = chunk.decode("latin-1", errors="replace")
        s = s.strip("\x00").lstrip("\ufeff")
        if s:
            parts.append(s)
    return parts


def split_terminated(enc: int, raw: bytes) -> tuple[str, bytes]:
    """Split off one NUL-terminated string (the ``desc`` of TXXX/COMM/
    USLT/WXXX); returns (decoded head, remaining bytes)."""
    codec, width = _ENCODINGS.get(enc, ("latin-1", 1))
    idx = _find_nul(raw, width)
    if idx < 0:
        return raw.decode(codec, errors="replace").strip("\x00"), b""
    head = raw[:idx].decode(codec, errors="replace").strip("\x00")
    return head, raw[idx + width:]


def _find_nul(raw: bytes, width: int) -> int:
    if width == 1:
        return raw.find(b"\x00")
    i = 0
    while i + 1 < len(raw):
        if raw[i] == 0 and raw[i + 1] == 0:
            return i
        i += 2
    return -1


def _split_nul(raw: bytes, width: int):
    while raw:
        idx = _find_nul(raw, width)
        if idx < 0:
            yield raw
            return
        yield raw[:idx]
        raw = raw[idx + width:]


def read_extended_float80(b: bytes) -> float:
    """Decode an IEEE 754 80-bit extended float (AIFF COMM sample
    rate: 2-byte exponent + 8-byte mantissa, big-endian)."""
    if len(b) < 10:
        return 0.0
    (expon,) = struct.unpack(">H", b[:2])
    mant = int.from_bytes(b[2:10], "big")
    sign = -1.0 if expon & 0x8000 else 1.0
    expon &= 0x7FFF
    if expon == 0 and mant == 0:
        return 0.0
    try:
        return sign * mant * 2.0 ** (expon - 16383 - 63)
    except OverflowError:  # corrupt exponent (fuzz-found) — not a rate
        return 0.0


def strlength(seconds: int) -> str:
    """HH:MM:SS, or MM:SS when under an hour — the reference's display
    contract (`vendor/audioinf/util.py:618-628`)."""
    s, m, h = seconds % 60, (seconds % 3600) // 60, seconds // 3600
    return "%02d:%02d:%02d" % (h, m, s) if h else "%02d:%02d" % (m, s)


def format_info(info: dict) -> dict[str, str]:
    """Render a parser's numeric info dict into the ``__``-key contract
    (`vendor/audioinf/util.py:296-370`): formatted + numeric variants."""
    out: dict[str, str] = {}
    length = info.get("length")
    if length is not None and length >= 0:
        out["__length"] = strlength(int(length))
        out["__length_seconds"] = str(int(length))
    sr = info.get("sample_rate")
    if sr:
        out["__frequency"] = "%.1f kHz" % (sr / 1000.0)
        out["__frequency_num"] = str(sr / 1000.0)
    br = info.get("bitrate")
    if br:
        out["__bitrate"] = "%d kb/s" % int(br / 1000)
        out["__bitrate_num"] = str(int(br / 1000))
    ch = info.get("channels")
    if ch:
        out["__channels"] = str(ch)
        out["__mode"] = "mono" if ch == 1 else "stereo"
    bps = info.get("bits_per_sample")
    if bps:
        out["__bitspersample"] = str(bps)
    if info.get("md5"):
        out["__md5sig"] = info["md5"]
    if info.get("version") is not None:
        out["__version"] = str(info["version"])
    if info.get("num_images"):
        out["__num_images"] = str(info["num_images"])
    if info.get("codec"):
        out["__codec"] = str(info["codec"])
    return out

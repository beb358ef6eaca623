"""Pure-Python audio tag parsing — the REAL byte-level path behind the
S3 tag-parse seam (no third-party libs; every format decoded from its
public specification).

The reference vendors a mutagen-backed mapping layer
(`src/tagminder/vendor/audioinf/__init__.py:62-105` dispatches on
extension/score; `scripts/ingest/tags2db.py:231-261` lowercases keys and
joins multivalues with a double-backslash).  This package reproduces the
same OUTPUT CONTRACT — lowercase tag keys, ``\\\\``-joined multivalues,
``__``-prefixed technical info (`vendor/audioinf/util.py:296-370`) —
but parses the container bytes itself, so the real ingest path works in
any environment, including this one.

Formats (same set as the reference's AUDIO_EXTENSIONS,
`tags2db.py:108`): MP3/ID3v2+v1, FLAC, Ogg Vorbis/Opus, MP4/M4A,
APEv2 (Monkey's Audio, WavPack), ASF/WMA, AIFF.

Entry point: :func:`parse_audio` — bytes in, flat ``{key: str}`` dict
out.  Pure function of its inputs; safe inside mapInPandas batches.
"""

from __future__ import annotations

MULTIVALUE_DELIM = "\\\\"

from . import aiff as _aiff
from . import apetag as _apetag
from . import asf as _asf
from . import flac as _flac
from . import id3 as _id3
from . import mp4 as _mp4
from . import ogg as _ogg
from ._bits import format_info


def sniff_format(data: bytes, path: str = "") -> str:
    """Identify the container from magic bytes (extension as tiebreak
    for the APEv2 family, whose magic sits at EOF)."""
    if data.startswith(b"fLaC") or (
        data.startswith(b"ID3") and b"fLaC" in data[:1 << 20]
        and _flac.has_flac_after_id3(data)
    ):
        return "flac"
    if data.startswith(b"OggS"):
        return "ogg"
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "mp4"
    if data.startswith(b"\x30\x26\xb2\x75\x8e\x66\xcf\x11"):
        return "asf"
    if data.startswith(b"FORM") and data[8:12] in (b"AIFF", b"AIFC"):
        return "aiff"
    if data.startswith(b"MAC "):
        return "ape"
    if data.startswith(b"wvpk"):
        return "wavpack"
    if data.startswith(b"ID3") or _id3.looks_like_mpeg(data):
        return "mp3"
    ext = path.rsplit(".", 1)[-1].lower() if "." in path else ""
    return {
        "mp3": "mp3", "flac": "flac", "ogg": "ogg", "opus": "ogg",
        "m4a": "mp4", "mp4": "mp4", "aac": "mp4", "wma": "asf",
        "ape": "ape", "wv": "wavpack", "aiff": "aiff", "aif": "aiff",
    }.get(ext, "")


_PARSERS = {
    "mp3": _id3.parse_mp3,
    "flac": _flac.parse_flac,
    "ogg": _ogg.parse_ogg,
    "mp4": _mp4.parse_mp4,
    "asf": _asf.parse_asf,
    "aiff": _aiff.parse_aiff,
    "ape": _apetag.parse_ape_file,
    "wavpack": _apetag.parse_wavpack_file,
}


def parse_audio(path: str, data: bytes) -> dict[str, str] | None:
    """Parse tags + technical info from raw file bytes.

    Returns a flat dict: lowercase text-tag keys with ``\\\\``-joined
    multivalues, plus ``__filetype``, ``__length``/``__length_seconds``,
    ``__bitrate``, ``__frequency``, ``__channels``, ``__bitspersample``
    where derivable — the same shape ``audioinf.Tag`` feeds
    ``tag_to_dict_raw`` (`tags2db.py:231-261`).  ``None`` when the
    container is unrecognized.
    """
    if not data:
        return None
    fmt = sniff_format(data, path)
    fn = _PARSERS.get(fmt)
    if fn is None:
        return None
    tags, info = fn(data)
    if not tags and not info:
        # extension said audio but the bytes yielded nothing — let the
        # caller fall back rather than claim an empty parse
        return None
    out: dict[str, str] = {}
    for k, v in tags.items():
        key = k.replace('"', "").strip().lower()
        if not key:
            continue
        sval = (
            MULTIVALUE_DELIM.join(str(x) for x in v)
            if isinstance(v, (list, tuple))
            else str(v)
        )
        if key in out and sval:
            out[key] = out[key] + MULTIVALUE_DELIM + sval if out[key] else sval
        else:
            out[key] = sval
    out.update(format_info(info))
    out["__filetype"] = fmt
    out["__size"] = str(len(data))
    return out

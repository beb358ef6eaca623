"""Byte-level tag WRITERS: build and rewrite real tag structures
(ID3v2.3 and FLAC VORBIS_COMMENT) from the public specs.

Two jobs:
- synthesize well-formed audio files for value gates (the driver oracle
  can predict every parsed field from the row that generated it);
- the real write-back path for the export sink (S11,
  `scripts/ingest/tags2db.py:1580-1592` writes edited tags to files) —
  :func:`retag_bytes` replaces a file's tag section in place, leaving
  the audio stream untouched.
"""

from __future__ import annotations

import struct

from .id3 import TEXT_FRAMES

# tag name → ID3v2.3/2.4 frame id (reverse of the parse table)
NAME_TO_FRAME = {name: fid for fid, name in TEXT_FRAMES.items()
                 if fid not in ("TDRC", "TDEN", "TDOR", "TDRL", "TDTG")}
NAME_TO_FRAME["genre"] = "TCON"


def _syncsafe_bytes(n: int) -> bytes:
    return bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )


def _encode_text(value: str, enc: int) -> bytes:
    if enc == 0:
        return bytes([0]) + value.encode("latin-1", "replace")
    if enc == 1:
        return bytes([1]) + value.encode("utf-16")
    return bytes([3]) + value.encode("utf-8")


def pick_id3_encoding(tags: dict[str, str], version: int) -> int:
    """Spec-correct text encoding for a tag set.  v2.4 → UTF-8 (enc 3).
    v2.3 → latin-1 (enc 0) when every name and value fits, else UTF-16
    with BOM (enc 1): enc 3 is a v2.4-only code, and strict v2.3
    readers (id3lib, hardware players) misread or drop it."""
    if version >= 4:
        return 3
    for name, value in tags.items():
        for s in (name, "" if value is None else str(value)):
            try:
                s.encode("latin-1")
            except UnicodeEncodeError:
                return 1
    return 0


def _joined_text(values: list[str], enc: int) -> bytes:
    """Encoding byte + NUL-joined value list (ID3v2.4 §4.2 multiple
    strings; the same shape v2.3 writers emit in practice)."""
    sep = b"\x00\x00" if enc == 1 else b"\x00"
    body = _encode_text(values[0], enc)
    for v in values[1:]:
        body += sep + _encode_text(v, enc)[1:]
    return body


def _frame(fid: str, payload: bytes, version: int = 3) -> bytes:
    size = (
        _syncsafe_bytes(len(payload)) if version >= 4
        else struct.pack(">I", len(payload))
    )
    return fid.encode("latin-1") + size + struct.pack(">H", 0) + payload


def build_id3v23(tags: dict[str, str], enc: int = 0,
                 multivalue_delim: str = "\\\\") -> bytes:
    """An ID3v2.3 tag from name→value pairs.  Known names map to their
    text frame; ``comment`` → COMM; anything else → TXXX.  Multivalues
    (delimited) become NUL-separated strings in one frame."""
    return build_id3(tags, enc=enc, version=3,
                     multivalue_delim=multivalue_delim)


def build_id3v24(tags: dict[str, str], enc: int = 3,
                 multivalue_delim: str = "\\\\") -> bytes:
    """ID3v2.4 variant: syncsafe frame sizes, TDRC for the year, UTF-8
    default encoding — what modern taggers write."""
    return build_id3(tags, enc=enc, version=4,
                     multivalue_delim=multivalue_delim)


def build_id3(tags: dict[str, str], enc: int = 0, version: int = 3,
              multivalue_delim: str = "\\\\") -> bytes:
    frames = b""
    sep = b"\x00\x00" if enc == 1 else b"\x00"
    for name, value in tags.items():
        if value is None or value == "":
            continue
        values = value.split(multivalue_delim)
        if name == "comment":
            # NUL-join ALL values (same contract as the text frames) so
            # multivalued comments survive write-back
            payload = (
                bytes([enc]) + b"eng" + sep + _joined_text(values, enc)[1:]
            )
            frames += _frame("COMM", payload, version)
            continue
        fid = NAME_TO_FRAME.get(name)
        if version >= 4 and name == "year":
            fid = "TDRC"
        if fid is None:
            payload = (
                _encode_text(name, enc) + sep + _joined_text(values, enc)[1:]
            )
            frames += _frame("TXXX", payload, version)
            continue
        frames += _frame(fid, _joined_text(values, enc), version)
    return (
        b"ID3" + bytes([version, 0, 0])
        + _syncsafe_bytes(len(frames)) + frames
    )


def build_mp3_with_xing(tags: dict[str, str], xing_frames: int,
                        enc: int = 0) -> bytes:
    """ID3v2.3 tag + one MPEG1 Layer III 128 kbps 44.1 kHz frame whose
    Xing header declares ``xing_frames`` frames — duration is then
    exactly ``xing_frames * 1152 / 44100`` seconds."""
    first = bytearray(417)
    first[0:4] = bytes([0xFF, 0xFB, 0x90, 0x00])
    first[36:40] = b"Xing"
    first[40:44] = struct.pack(">I", 0x03)
    first[44:48] = struct.pack(">I", xing_frames)
    first[48:52] = struct.pack(">I", xing_frames * 417)
    second = bytes([0xFF, 0xFB, 0x90, 0x00]) + bytes(413)
    return build_id3v23(tags, enc) + bytes(first) + second


def build_vorbis_block(comments: list[tuple[str, str]],
                       vendor: str = "tagminder-spark") -> bytes:
    out = struct.pack("<I", len(vendor)) + vendor.encode()
    out += struct.pack("<I", len(comments))
    for k, v in comments:
        raw = f"{k}={v}".encode("utf-8")
        out += struct.pack("<I", len(raw)) + raw
    return out


def build_flac(total_samples: int, comments: list[tuple[str, str]],
               sample_rate: int = 44100, channels: int = 2,
               bps: int = 16, audio_bytes: int = 256) -> bytes:
    packed = (
        (sample_rate << 44) | ((channels - 1) << 41) | ((bps - 1) << 36)
        | (total_samples & ((1 << 36) - 1))
    )
    streaminfo = (
        struct.pack(">HH", 4096, 4096) + b"\x00" * 6
        + packed.to_bytes(8, "big") + b"\x00" * 16
    )
    vc = build_vorbis_block(comments)
    return (
        b"fLaC"
        + b"\x00" + len(streaminfo).to_bytes(3, "big") + streaminfo
        + bytes([0x80 | 4]) + len(vc).to_bytes(3, "big") + vc
        + b"\x00" * audio_bytes
    )


def build_ogg_vorbis(comments: list[tuple[str, str]], total_samples: int,
                     sample_rate: int = 44100, serial: int = 7) -> bytes:
    """A minimal, spec-valid Ogg Vorbis stream: ident page, comment
    page, and a final audio page whose granule encodes the duration."""
    ident = (
        b"\x01vorbis" + struct.pack("<IB", 0, 2)
        + struct.pack("<IiiiB", sample_rate, 0, 112000, 0, 0x66) + b"\x01"
    )
    comment = b"\x03vorbis" + build_vorbis_block(comments) + b"\x01"
    return (
        _ogg_page(ident, 0, serial, 0, htype=2)
        + _ogg_page(comment, 0, serial, 1)
        + _ogg_page(b"\xaa" * 64, total_samples, serial, 2, htype=4)
    )


def build_m4a(tags: dict[str, str], seconds: int,
              multivalue_delim: str = "\\\\") -> bytes:
    """A minimal MP4/M4A: ftyp + moov(mvhd + udta/meta/ilst) + mdat."""
    mvhd = _atom(
        b"mvhd",
        b"\x00" * 4 + struct.pack(">IIII", 0, 0, 600, 600 * seconds)
        + b"\x00" * 76,
    )
    moov = _atom(b"moov", mvhd + _mp4_meta_ilst(tags, multivalue_delim))
    return (
        _atom(b"ftyp", b"M4A \x00\x00\x00\x00") + moov
        + _atom(b"mdat", b"\x00" * 64)
    )


def build_apev2(tags: dict[str, str], multivalue_delim: str = "\\\\"
                ) -> bytes:
    """An APEv2 tag (items + header + footer, spec flags) from
    name→value pairs; multivalues become NUL-joined item values."""
    body = b""
    count = 0
    for k, v in tags.items():
        if v in (None, ""):
            continue
        raw = b"\x00".join(
            p.encode("utf-8") for p in str(v).split(multivalue_delim)
        )
        body += struct.pack("<II", len(raw), 0) + k.encode("latin-1") + b"\x00" + raw
        count += 1
    tag_size = len(body) + 32
    def block(flags: int) -> bytes:
        return (
            b"APETAGEX" + struct.pack("<IIII", 2000, tag_size, count, flags)
            + b"\x00" * 8
        )
    # header flag bits: 0x80000000 has-header, 0x20000000 is-header
    return block(0xA0000000) + body + block(0x80000000)


def _aiff_chunk(cid: bytes, payload: bytes) -> bytes:
    out = cid + struct.pack(">I", len(payload)) + payload
    return out + (b"\x00" if len(payload) & 1 else b"")


def build_aiff(tags: dict[str, str], seconds: int,
               sample_rate: int = 44100,
               multivalue_delim: str = "\\\\") -> bytes:
    """A minimal AIFF: COMM (80-bit extended-float sample rate) + SSND
    stub + 'ID3 ' chunk — duration is exactly ``seconds``."""
    frames = sample_rate * seconds
    rate80 = (
        struct.pack(">H", 16383 + 15) + (sample_rate << 48).to_bytes(8, "big")
    )
    comm = _aiff_chunk(b"COMM", struct.pack(">HIH", 2, frames, 16) + rate80)
    ssnd = _aiff_chunk(b"SSND", b"\x00" * 8 + b"\xaa" * 64)
    id3 = build_id3v23(
        tags, enc=pick_id3_encoding(tags, 3), multivalue_delim=multivalue_delim
    )
    body = comm + ssnd + _aiff_chunk(b"ID3 ", id3)
    return b"FORM" + struct.pack(">I", 4 + len(body)) + b"AIFF" + body


def build_asf(tags: dict[str, str], seconds: int,
              multivalue_delim: str = "\\\\") -> bytes:
    """A minimal ASF/WMA: header with File Properties (play duration +
    3 s preroll ⇒ length is exactly ``seconds``), tags injected through
    the REAL writer path (:func:`retag_bytes`'s ASF planner)."""
    from .asf import FILE_PROPS_GUID, HEADER_GUID

    preroll_ms = 3000
    fp_body = (
        b"\x00" * 16 + struct.pack("<Q", 0) * 2 + struct.pack("<Q", 0)
        + struct.pack("<Q", (seconds + preroll_ms // 1000) * 10 ** 7)
        + struct.pack("<Q", 0) + struct.pack("<Q", preroll_ms)
        + b"\x00" * 16
    )
    fp = FILE_PROPS_GUID + struct.pack("<Q", 24 + len(fp_body)) + fp_body
    bare = (
        HEADER_GUID + struct.pack("<Q", 30 + len(fp)) + struct.pack("<I", 1)
        + b"\x01\x02" + fp + b"\xaa" * 200
    )
    return retag_bytes(bare, tags, multivalue_delim)


def build_ape(tags: dict[str, str], seconds: int,
              sample_rate: int = 44100,
              multivalue_delim: str = "\\\\") -> bytes:
    """A minimal Monkey's Audio file (>=3.98 descriptor+header layout):
    blocks_per_frame == final_blocks == sample_rate and total_frames ==
    ``seconds`` ⇒ total samples = rate·seconds, duration exact."""
    desc_len = 52
    desc = (
        b"MAC " + struct.pack("<HH", 3990, 0)
        + struct.pack("<I", desc_len) + b"\x00" * (desc_len - 12)
    )
    hdr = (
        struct.pack("<HH", 2000, 0)
        + struct.pack("<III", sample_rate, sample_rate, seconds)
        + struct.pack("<HH", 16, 2) + struct.pack("<I", sample_rate)
        + b"\x00" * 8
    )
    return (
        desc + hdr + b"\xaa" * 128 + build_apev2(tags, multivalue_delim)
    )


def build_wavpack(tags: dict[str, str], seconds: int,
                  multivalue_delim: str = "\\\\") -> bytes:
    """A minimal WavPack file: first block header carries total samples
    (rate 44100 via flags bits 23-26) + trailing APEv2."""
    total = 44100 * seconds
    flags = (9 << 23) | 0x01  # 44.1 kHz, 2 bytes/sample, stereo
    header = (
        b"wvpk" + struct.pack("<IHBB", 400, 0x410, 0, 0)
        + struct.pack("<IIII", total, 0, 4096, flags)
        + struct.pack("<I", 0)
    )
    return header + b"\xaa" * 368 + build_apev2(tags, multivalue_delim)


def _mp4_meta_ilst(tags: dict[str, str], multivalue_delim: str = "\\\\"
                   ) -> bytes:
    """A udta>meta>hdlr+ilst subtree carrying the given tags."""
    return _atom(b"udta", _mp4_meta(tags, multivalue_delim))


def _mp4_meta(tags: dict[str, str], multivalue_delim: str = "\\\\"
              ) -> bytes:
    """A meta>hdlr+ilst atom carrying the given tags (text atoms via
    the public iTunes vocabulary, unknown keys as freeform ``----``
    atoms)."""
    from .mp4 import ILST_NAMES

    rev = {v: k for k, v in ILST_NAMES.items()}
    entries = b""
    for name, value in tags.items():
        if value in (None, ""):
            continue
        for v in str(value).split(multivalue_delim):
            payload = _atom(b"data", struct.pack(">II", 1, 0) + v.encode("utf-8"))
            fourcc = rev.get(name)
            if fourcc is not None:
                entries += _atom(fourcc.encode("latin-1"), payload)
            else:
                entries += _atom(
                    b"----",
                    _atom(b"mean", b"\x00" * 4 + b"com.apple.iTunes")
                    + _atom(b"name", b"\x00" * 4 + name.encode("utf-8"))
                    + payload,
                )
    hdlr = _atom(
        b"hdlr", b"\x00" * 8 + b"mdir" + b"appl" + b"\x00" * 9
    )
    return _atom(b"meta", b"\x00" * 4 + hdlr + _atom(b"ilst", entries))


def _atom(atype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + atype + payload


# ---------------------------------------------------------------------------
# in-place retag (the export sink's real write path)
# ---------------------------------------------------------------------------
#
# Every rewrite is expressed as a PLAN: a list of segments, each either
# literal ``bytes`` (the new tag sections) or an ``(start, end)`` span
# of the SOURCE file (the untouched audio region).  ``retag_bytes``
# joins a plan in memory; ``retag_file`` streams it — new tag bytes are
# written directly and source spans are block-copied — so retagging a
# 2 GB concert FLAC holds only the metadata sections resident, never
# two full copies of the file.

Segment = "bytes | tuple[int, int]"


def retag_plan(data, tags: dict[str, str],
               multivalue_delim: str = "\\\\") -> list | None:
    """Rewrite plan for replacing a file's tag section with ``tags``
    while preserving the audio stream byte-for-byte.  ``data`` may be
    real ``bytes`` or a bounded-IO :class:`~.lazyio.LazyFileBytes`
    view — planners only touch head/tail metadata regions.

    Formats (the reference's whole AUDIO_EXTENSIONS set,
    `tags2db.py:108`): MP3/MPEG (fresh ID3v2 at head, ID3v1 stripped),
    FLAC (VORBIS_COMMENT replaced, other blocks kept as source spans),
    MP4/M4A (moov rebuilt, stco/co64 shifted when mdat follows), Ogg
    Vorbis/Opus (comment page respliced, CRCs recomputed), ASF/WMA
    (header objects rebuilt), AIFF ('ID3 ' chunk replaced), Monkey's
    Audio / WavPack (trailing APEv2 replaced).

    Returns ``None`` when the container isn't rewritable here (caller
    falls back to the injected writer seam).
    """
    from . import sniff_format
    from ._bits import be_int
    from .id3 import parse_id3v2

    fmt = sniff_format(data)
    size = len(data)
    if fmt == "mp3":
        _, tag_size, _ = parse_id3v2(data)
        end = size
        if end - tag_size >= 128 and bytes(data[end - 128:end - 125]) == b"TAG":
            end -= 128
        # preserve the source's tag version (v2.2 upgrades to v2.3)
        version = 4 if (tag_size and data[3] >= 4) else 3
        tag = build_id3(
            tags, enc=pick_id3_encoding(tags, version), version=version,
            multivalue_delim=multivalue_delim,
        )
        return [tag, (tag_size, end)]
    if fmt == "flac":
        start = 0
        if data.startswith(b"ID3"):
            _, start, _ = parse_id3v2(data)
        if bytes(data[start:start + 4]) != b"fLaC":
            return None
        pos = start + 4
        plan: list = [b"fLaC"]
        last_kept = None  # index of the last kept block's flag byte
        while pos + 4 <= size:
            hdr = data[pos]
            btype = hdr & 0x7F
            bsize = be_int(data[pos + 1:pos + 4])
            last = bool(hdr & 0x80)
            if btype != 4:  # drop old VORBIS_COMMENT
                # flag byte re-emitted with last-block cleared; size +
                # body ride as a source span (PICTURE blocks with big
                # embedded art never materialize)
                plan.append(bytes([btype]))
                plan.append((pos + 1, pos + 4 + bsize))
            pos += 4 + bsize
            if last:
                break
        comments = [
            (k, v)
            for k, raw in tags.items()
            if raw not in (None, "")
            for v in str(raw).split(multivalue_delim)
        ]
        vc = build_vorbis_block(comments)
        plan.append(bytes([0x80 | 4]) + len(vc).to_bytes(3, "big") + vc)
        plan.append((pos, size))
        return plan
    if fmt == "mp4":
        return _retag_mp4_plan(data, tags, multivalue_delim)
    if fmt == "aiff":
        return _retag_aiff_plan(data, tags, multivalue_delim)
    if fmt == "ogg":
        return _retag_ogg_plan(data, tags, multivalue_delim)
    if fmt == "asf":
        return _retag_asf_plan(data, tags, multivalue_delim)
    if fmt in ("ape", "wavpack"):
        end = size
        if end >= 128 and bytes(data[end - 128:end - 125]) == b"TAG":
            end -= 128
        # strip an existing APEv2 tag (footer at EOF; honor has-header)
        foot = bytes(data[end - 32:end]) if end >= 32 else b""
        if foot.startswith(b"APETAGEX"):
            tag_size = int.from_bytes(foot[12:16], "little")
            flags = int.from_bytes(foot[20:24], "little")
            end -= tag_size + (32 if flags & 0x80000000 else 0)
        return [(0, end), build_apev2(tags, multivalue_delim)]
    return None


def retag_bytes(data: bytes, tags: dict[str, str],
                multivalue_delim: str = "\\\\") -> bytes | None:
    """In-memory retag: materialize :func:`retag_plan`.  ``None`` when
    the format isn't rewritable."""
    plan = retag_plan(data, tags, multivalue_delim)
    if plan is None:
        return None
    return b"".join(
        seg if isinstance(seg, (bytes, bytearray)) else bytes(data[seg[0]:seg[1]])
        for seg in plan
    )


def retag_file(path: str, tags: dict[str, str],
               multivalue_delim: str = "\\\\", block: int = 1 << 20) -> bool:
    """Bounded-memory in-place retag: plan against a lazy head/tail
    view, stream the result to ``<path>.tmwrite`` (new tag sections
    written directly, audio spans block-copied), then atomically
    ``os.replace`` — the crash-safe analogue of the reference's
    one-file-at-a-time walk (tags2db.py:1580-1592, README.md:417).
    Peak resident memory is O(tag sections), not O(file size).

    Returns False (file untouched) when the format isn't rewritable.
    """
    import os

    from .lazyio import LazyFileBytes

    with LazyFileBytes(path) as view:
        plan = retag_plan(view, tags, multivalue_delim)
    if plan is None:
        return False
    tmp = path + ".tmwrite"
    try:
        with open(path, "rb") as src, open(tmp, "wb") as dst:
            for seg in plan:
                if isinstance(seg, (bytes, bytearray)):
                    dst.write(seg)
                    continue
                _copy_span(src, dst, seg[0], seg[1], block)
        # the replacement must not silently change ownership/mode —
        # users' libraries carry deliberate permissions
        st = os.stat(path)
        os.chmod(tmp, st.st_mode)
        try:
            os.chown(tmp, st.st_uid, st.st_gid)
        except (OSError, AttributeError):  # unprivileged / non-POSIX
            pass
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    return True


def _copy_span(src, dst, start: int, end: int, block: int) -> None:
    """Copy ``src[start:end)`` onto ``dst``'s current position.  Linux
    gets kernel-side ``os.sendfile`` (zero user-space copies — the
    audio region never enters Python at all); elsewhere a bounded
    read/write loop."""
    import os

    if end <= start:
        return
    copied = 0
    try:
        dst.flush()  # buffered writes must land before raw-fd IO
        while copied < end - start:
            sent = os.sendfile(dst.fileno(), src.fileno(), start + copied,
                               min(end - start - copied, 1 << 24))
            if sent == 0:
                break
            copied += sent
    except (OSError, AttributeError):
        pass  # resume below from wherever sendfile got to
    pos = start + copied
    src.seek(pos)
    while pos < end:
        chunk = src.read(min(block, end - pos))
        if not chunk:
            break
        dst.write(chunk)
        pos += len(chunk)


def _retag_mp4_plan(data, tags: dict[str, str], mv: str) -> list | None:
    from .mp4 import _atoms

    top = list(_atoms(data, 0, len(data)))
    moov = next(((s, e) for t, s, e in top if t == b"moov"), None)
    if moov is None:
        return None
    ms, me = moov
    moov_start = ms - 8  # _atoms yields body bounds; header is 8 bytes
    # moov is metadata — bounded; materialize once, rebuild in memory
    raw = bytes(data[moov_start:me])
    kept = b""
    udta_keep = b""
    for t, s, e in _atoms(raw, 8, len(raw)):
        if t == b"udta":
            # keep non-tag udta children (chpl chapters, ©xyz location,
            # custom boxes); only the meta>ilst subtree is rebuilt
            for t2, s2, e2 in _atoms(raw, s, e):
                if t2 != b"meta":
                    udta_keep += raw[s2 - 8:e2]
        else:
            kept += raw[s - 8:e]
    new_udta = _atom(b"udta", udta_keep + _mp4_meta(tags, mv))
    new_moov = _atom(b"moov", kept + new_udta)
    delta = len(new_moov) - len(raw)
    mdat_after = any(
        t == b"mdat" and s - 8 > moov_start for t, s, e in top
    )
    if delta and mdat_after:
        new_moov = _shift_chunk_offsets(new_moov, delta)
    return [(0, moov_start), new_moov, (me, len(data))]


def _retag_asf_plan(data, tags: dict[str, str], mv: str) -> list | None:
    """Rebuild the ASF Header Object's Content Description + Extended
    Content Description from ``tags``; the Data Object and packets
    follow unchanged (packet offsets are header-relative in ASF, so a
    resized header is legal; the File Properties size field is
    patched)."""
    from .asf import (
        CONTENT_DESC_GUID,
        EXT_CONTENT_GUID,
        FILE_PROPS_GUID,
        HEADER_GUID,
        WM_NAMES,
    )

    if not data.startswith(HEADER_GUID) or len(data) < 30:
        return None
    header_size = int.from_bytes(bytes(data[16:24]), "little")
    if not 30 <= header_size <= len(data):  # corrupt header — don't touch
        return None
    count = int.from_bytes(bytes(data[24:28]), "little")
    body = bytes(data[30:header_size])  # header objects only — bounded

    kept: list[bytes] = []
    pos = 0
    fp_index = None
    for _ in range(count):
        if pos + 24 > len(body):
            break
        guid = body[pos:pos + 16]
        size = int.from_bytes(body[pos + 16:pos + 24], "little")
        if size < 24:
            break
        if guid not in (CONTENT_DESC_GUID, EXT_CONTENT_GUID):
            if guid == FILE_PROPS_GUID:
                fp_index = len(kept)
            kept.append(body[pos:pos + size])
        pos += size

    def u16s(s: str) -> bytes:
        return s.encode("utf-16-le") + b"\x00\x00"

    rev = {v: k for k, v in WM_NAMES.items()}
    std = {k: tags.get(k, "") for k in
           ("title", "artist", "copyright", "comment")}
    fields = [u16s(std["title"]), u16s(std["artist"]),
              u16s(std["copyright"]), u16s(std["comment"]), u16s("")]
    cd_body = b"".join(
        struct.pack("<H", len(f)) for f in fields
    ) + b"".join(fields)
    cd = CONTENT_DESC_GUID + struct.pack("<Q", 24 + len(cd_body)) + cd_body

    attrs = b""
    n_attrs = 0
    for name, value in tags.items():
        if name in std or value in (None, ""):
            continue
        wm = rev.get(name, name)
        wm_disp = {
            "album": "WM/AlbumTitle", "albumartist": "WM/AlbumArtist",
            "track": "WM/TrackNumber", "year": "WM/Year",
            "genre": "WM/Genre", "composer": "WM/Composer",
        }.get(name, wm if wm.lower().startswith("wm/") else f"WM/{name}")
        raw = u16s(str(value).replace(mv, "; "))
        n = u16s(wm_disp)
        attrs += (
            struct.pack("<H", len(n)) + n
            + struct.pack("<HH", 0, len(raw)) + raw
        )
        n_attrs += 1
    ecd_body = struct.pack("<H", n_attrs) + attrs
    ecd = EXT_CONTENT_GUID + struct.pack("<Q", 24 + len(ecd_body)) + ecd_body

    objs = kept + [cd, ecd]
    new_body = b"".join(objs)
    new_header_size = 30 + len(new_body)
    out = bytearray(
        HEADER_GUID + struct.pack("<Q", new_header_size)
        + struct.pack("<I", len(objs)) + bytes(data[28:30]) + new_body
    )
    if fp_index is not None:
        # patch File Properties' file-size field (offset 40 into the
        # object: 24 header + 16 file id) with the FINAL size — header
        # plus the unchanged Data Object span
        total = new_header_size + (len(data) - header_size)
        off = 30 + sum(len(o) for o in objs[:fp_index]) + 40
        out[off:off + 8] = struct.pack("<Q", total)
    return [bytes(out), (header_size, len(data))]


def _retag_aiff_plan(data, tags: dict[str, str], mv: str) -> list | None:
    """Replace (or append) the AIFF 'ID3 ' chunk and fix the FORM size.
    Kept chunks (SSND — the audio — included) ride as source spans."""
    from ._bits import be_int

    form = bytes(data[8:12])
    if not data.startswith(b"FORM") or form not in (b"AIFF", b"AIFC"):
        return None
    spans: list[tuple[int, int]] = []
    pos = 12
    end = min(len(data), 8 + be_int(data[4:8]))
    while pos + 8 <= end:
        cid = bytes(data[pos:pos + 4])
        csize = be_int(data[pos + 4:pos + 8])
        step = 8 + csize + (csize & 1)
        if cid not in (b"ID3 ", b"id3 "):
            spans.append((pos, min(pos + step, end)))
        pos += step
    id3 = build_id3v23(
        tags, enc=pick_id3_encoding(tags, 3), multivalue_delim=mv
    )
    chunk = b"ID3 " + struct.pack(">I", len(id3)) + id3
    if len(id3) & 1:
        chunk += b"\x00"
    body_len = sum(e - s for s, e in spans) + len(chunk)
    return [
        b"FORM" + struct.pack(">I", 4 + body_len) + form,
        *spans,
        chunk,
    ]


# Ogg page CRC: CRC-32, polynomial 0x04c11db7, no reflection, init/xor 0
_OGG_CRC_TABLE = []


def _ogg_crc(data: bytes) -> int:
    if not _OGG_CRC_TABLE:
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
            _OGG_CRC_TABLE.append(r & 0xFFFFFFFF)
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def _ogg_page(payload: bytes, granule: int, serial: int, seq: int,
              htype: int = 0) -> bytes:
    lacing = bytes([255] * (len(payload) // 255) + [len(payload) % 255])
    hdr = (
        b"OggS\x00" + bytes([htype]) + struct.pack("<q", granule)
        + struct.pack("<III", serial, seq, 0)
        + bytes([len(lacing)]) + lacing
    )
    page = bytearray(hdr + payload)
    crc = _ogg_crc(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def _retag_ogg_plan(data, tags: dict[str, str], mv: str) -> list | None:
    """Rewrite the Vorbis/Opus comment header in place.

    The comment packet lives in the page(s) between the ident page and
    the first audio page; that header page is re-emitted with the new
    comment packet (page CRC recomputed).  Page count is preserved —
    header packets are re-laced into ONE page, which holds up to ~64 KiB
    (plenty for text comments; give up past that so sequence numbers of
    audio pages never change).

    Safety: splicing is only legal when the comment page is
    self-contained.  If its final lacing value is 255 the packet
    CONTINUES on the next page (files with >~64 KiB of embedded art) —
    replacing just this page would orphan the continuation page
    (continued-packet flag set) and lose/corrupt the Vorbis setup
    header.  Both the lacing value and the next page's
    continued-packet flag are checked; either trips → return None so
    the caller falls back to the injected writer instead of destroying
    the file.  (A setup header living entirely on a LATER page is fine:
    that page isn't touched and keeps its sequence number.)"""
    pages = []
    for granule, payload, raw_span in _pages_spans(data):
        pages.append((granule, payload, raw_span))
        if len(pages) >= 3:
            break
    if len(pages) < 2:
        return None
    ident = pages[0][1]
    if ident.startswith(b"\x01vorbis"):
        magic, kind = b"\x03vorbis", "vorbis"
    elif ident.startswith(b"OpusHead"):
        magic, kind = b"OpusTags", "opus"
    else:
        return None
    serial = int.from_bytes(bytes(data[14:18]), "little")
    # header pages after the ident page, before first audio page:
    # their concatenated payload = comment packet [+ setup packet]
    hdr_payload = pages[1][1]
    span_start, span_end = pages[1][2]
    if not hdr_payload.startswith(magic):
        return None
    # final lacing value 255 ⇒ last packet continues on the next page
    nsegs = data[span_start + 26]
    lacing = bytes(data[span_start + 27:span_start + 27 + nsegs])
    if not lacing or lacing[-1] == 255:
        return None
    # belt-and-braces: the next page must not claim to continue a packet
    if len(pages) >= 3 and data[pages[2][2][0] + 5] & 0x01:
        return None
    setup = b""
    if kind == "vorbis":
        si = hdr_payload.find(b"\x05vorbis")
        if si >= 0:  # setup header shares the page; carry it unchanged
            setup = hdr_payload[si:]
    comments = [
        (k, v)
        for k, raw in tags.items()
        if raw not in (None, "")
        for v in str(raw).split(mv)
    ]
    new_comment = magic + build_vorbis_block(comments)
    if kind == "vorbis":
        new_comment += b"\x01"  # framing bit
    new_payload = new_comment + setup
    if len(new_payload) > 255 * 250:
        return None  # would change the page count; bail to injected seam
    new_page = _ogg_page(new_payload, 0, serial, 1)
    return [(0, span_start), new_page, (span_end, len(data))]


def _pages_spans(data: bytes):
    """(granule, payload, (start, end)) per Ogg page."""
    pos = 0
    while pos + 27 <= len(data):
        if data[pos:pos + 4] != b"OggS":
            nxt = data.find(b"OggS", pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        granule = int.from_bytes(data[pos + 6:pos + 14], "little")
        nsegs = data[pos + 26]
        lacing = data[pos + 27:pos + 27 + nsegs]
        size = sum(lacing)
        end = pos + 27 + nsegs + size
        yield granule, data[pos + 27 + nsegs:end], (pos, end)
        pos = end


def _shift_chunk_offsets(moov: bytes, delta: int) -> bytes:
    """Add ``delta`` to every stco (u32) / co64 (u64) chunk offset in a
    serialized moov atom — required when the atom tree before mdat
    changes size."""
    from .mp4 import _atoms

    out = bytearray(moov)
    containers = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}

    def walk(pos: int, end: int) -> None:
        for atype, s, e in _atoms(moov, pos, end):
            if atype in containers:
                walk(s, e)
            elif atype in (b"stco", b"co64") and e - s >= 8:
                n = int.from_bytes(moov[s + 4:s + 8], "big")
                width = 4 if atype == b"stco" else 8
                p = s + 8
                for _ in range(n):
                    if p + width > e:
                        break
                    val = int.from_bytes(moov[p:p + width], "big") + delta
                    out[p:p + width] = val.to_bytes(width, "big")
                    p += width

    walk(0, len(moov))
    return bytes(out)

"""ID3v2 (2.2/2.3/2.4) + ID3v1 tag parsing and MPEG-audio stream info,
written from the public id3.org specifications.

Key contract mirrors the reference's frame→name table
(`vendor/audioinf/id3.py:175-268`): TIT2→title, TPE1→artist,
TALB→album, TPE2→albumartist, TRCK→track, TPOS→discnumber,
TYER/TDRC→year, COMM→comment / comment:<desc>, TXXX→<desc>,
USLT→unsyncedlyrics — so queries written against the reference's
column names keep working.
"""

from __future__ import annotations

from ._bits import be_int, decode_text, split_terminated, syncsafe

# frame-id → tag name; identical in v2.3/v2.4 (v2.2's 3-char ids map
# through _V22_IDS below).  Same WHAT as vendor/audioinf/id3.py:175-268.
TEXT_FRAMES = {
    "TALB": "album", "TBPM": "bpm", "TCOM": "composer",
    "TCOP": "copyright", "TDAT": "date", "TDLY": "audiodelay",
    "TENC": "encodedby", "TEXT": "lyricist", "TFLT": "filetype",
    "TIME": "time", "TIT1": "grouping", "TIT2": "title",
    "TIT3": "version", "TKEY": "initialkey", "TLAN": "language",
    "TLEN": "audiolength", "TMED": "mediatype", "TMOO": "mood",
    "TOAL": "originalalbum", "TOFN": "filename", "TOLY": "author",
    "TOPE": "originalartist", "TORY": "originalyear",
    "TOWN": "fileowner", "TPE1": "artist", "TPE2": "albumartist",
    "TPE3": "conductor", "TPE4": "arranger", "TPOS": "discnumber",
    "TPRO": "producednotice", "TPUB": "organization", "TRCK": "track",
    "TRDA": "recordingdates", "TRSN": "radiostationname",
    "TRSO": "radioowner", "TSIZ": "audiosize",
    "TSO2": "albumartistsortorder", "TSOA": "albumsortorder",
    "TSOP": "performersortorder", "TSOT": "titlesortorder",
    "TSRC": "isrc", "TSSE": "encodingsettings", "TSST": "setsubtitle",
    "TYER": "year", "TCMP": "itunescompilationflag",
    "TSOC": "itunescomposersortorder",
    # v2.4 timestamp frames (vendor/audioinf/id3.py:261-267)
    "TDEN": "encodingtime", "TDOR": "originalreleasetime",
    "TDRC": "year", "TDRL": "releasetime", "TDTG": "taggingtime",
}

_V22_IDS = {
    "TAL": "TALB", "TBP": "TBPM", "TCM": "TCOM", "TCO": "TCON",
    "TCR": "TCOP", "TDA": "TDAT", "TDY": "TDLY", "TEN": "TENC",
    "TFT": "TFLT", "TIM": "TIME", "TKE": "TKEY", "TLA": "TLAN",
    "TLE": "TLEN", "TMT": "TMED", "TOA": "TOPE", "TOF": "TOFN",
    "TOL": "TOLY", "TOR": "TORY", "TOT": "TOAL", "TP1": "TPE1",
    "TP2": "TPE2", "TP3": "TPE3", "TP4": "TPE4", "TPA": "TPOS",
    "TPB": "TPUB", "TRC": "TSRC", "TRD": "TRDA", "TRK": "TRCK",
    "TSI": "TSIZ", "TSS": "TSSE", "TT1": "TIT1", "TT2": "TIT2",
    "TT3": "TIT3", "TXT": "TEXT", "TYE": "TYER", "TXX": "TXXX",
    "COM": "COMM", "ULT": "USLT", "PIC": "APIC", "UFI": "UFID",
    "WXX": "WXXX",
}

# ID3v1 genre list (id3.org Appendix A + Winamp extensions) — public data.
GENRES = (
    "Blues,Classic Rock,Country,Dance,Disco,Funk,Grunge,Hip-Hop,Jazz,"
    "Metal,New Age,Oldies,Other,Pop,R&B,Rap,Reggae,Rock,Techno,"
    "Industrial,Alternative,Ska,Death Metal,Pranks,Soundtrack,"
    "Euro-Techno,Ambient,Trip-Hop,Vocal,Jazz+Funk,Fusion,Trance,"
    "Classical,Instrumental,Acid,House,Game,Sound Clip,Gospel,Noise,"
    "Alternative Rock,Bass,Soul,Punk,Space,Meditative,Instrumental Pop,"
    "Instrumental Rock,Ethnic,Gothic,Darkwave,Techno-Industrial,"
    "Electronic,Pop-Folk,Eurodance,Dream,Southern Rock,Comedy,Cult,"
    "Gangsta,Top 40,Christian Rap,Pop/Funk,Jungle,Native US,Cabaret,"
    "New Wave,Psychedelic,Rave,Showtunes,Trailer,Lo-Fi,Tribal,"
    "Acid Punk,Acid Jazz,Polka,Retro,Musical,Rock & Roll,Hard Rock,"
    "Folk,Folk-Rock,National Folk,Swing,Fast Fusion,Bebob,Latin,"
    "Revival,Celtic,Bluegrass,Avantgarde,Gothic Rock,Progressive Rock,"
    "Psychedelic Rock,Symphonic Rock,Slow Rock,Big Band,Chorus,"
    "Easy Listening,Acoustic,Humour,Speech,Chanson,Opera,"
    "Chamber Music,Sonata,Symphony,Booty Bass,Primus,Porn Groove,"
    "Satire,Slow Jam,Club,Tango,Samba,Folklore,Ballad,Power Ballad,"
    "Rhythmic Soul,Freestyle,Duet,Punk Rock,Drum Solo,A capella,"
    "Euro-House,Dance Hall"
).split(",")


def resolve_genre(value: str) -> str:
    """TCON content descriptor: '(17)' / '17' / '(17)Rock' → genre name
    (ID3v2.3 §4.2.1 parenthesized v1 references)."""
    v = value.strip()
    if v.startswith("(") and ")" in v:
        num, rest = v[1:].split(")", 1)
        if num.isdigit():
            idx = int(num)
            name = GENRES[idx] if idx < len(GENRES) else num
            return rest.strip() or name
    if v.isdigit() and int(v) < len(GENRES):
        return GENRES[int(v)]
    return v


def _deunsync(data: bytes) -> bytes:
    """Reverse ID3v2 unsynchronization: FF 00 → FF."""
    return data.replace(b"\xff\x00", b"\xff")


def parse_id3v2(data: bytes) -> tuple[dict, int, int]:
    """Parse an ID3v2 tag at offset 0.

    Returns (tags, tag_total_size, num_images); (empty, 0, 0) when no
    tag is present.
    """
    if len(data) < 10 or not data.startswith(b"ID3"):
        return {}, 0, 0
    major = data[3]
    flags = data[5]
    size = syncsafe(data[6:10])
    total = 10 + size + (10 if flags & 0x10 else 0)  # v2.4 footer
    body = data[10:10 + size]
    if flags & 0x80 and major <= 3:
        # v2.2/v2.3: unsynchronization applies to the whole tag body
        body = _deunsync(body)
    pos = 0
    if flags & 0x40:  # extended header
        if major == 3:
            ext = be_int(body[0:4])
            pos = 4 + ext
        else:
            pos = syncsafe(body[0:4])
    tags: dict[str, list[str]] = {}
    images = 0
    while pos + 6 <= len(body):
        if major == 2:
            fid_raw = body[pos:pos + 3].decode("latin-1", "replace")
            fsize = be_int(body[pos + 3:pos + 6])
            fflags = 0
            hdr = 6
            fid = _V22_IDS.get(fid_raw, fid_raw)
        else:
            fid = body[pos:pos + 4].decode("latin-1", "replace")
            raw_size = body[pos + 4:pos + 8]
            fsize = syncsafe(raw_size) if major >= 4 else be_int(raw_size)
            fflags = be_int(body[pos + 8:pos + 10])
            hdr = 10
        if not fid.strip("\x00").strip() or fsize <= 0:
            break
        payload = body[pos + hdr:pos + hdr + fsize]
        pos += hdr + fsize
        if major >= 4:
            if fflags & 0x01:  # data-length indicator prepended
                payload = payload[4:]
            if fflags & 0x02:  # per-frame unsynchronization
                payload = _deunsync(payload)
        # compressed/encrypted frames: skip, can't decode
        # (v2.3 format flags bits 7/6; v2.4 bits 3/2)
        if (major == 3 and fflags & 0x00C0) or (major >= 4 and fflags & 0x000C):
            continue
        _handle_frame(fid, payload, tags)
        if fid == "APIC":
            images += 1
    if images:
        tags.pop("apic", None)
    return tags, total, images


def _add(tags: dict, key: str, values: list[str]) -> None:
    if not values:
        return
    tags.setdefault(key, []).extend(values)


def _handle_frame(fid: str, payload: bytes, tags: dict) -> None:
    if not payload:
        return
    if fid == "TXXX":
        desc, rest = split_terminated(payload[0], payload[1:])
        _add(tags, desc or "txxx", decode_text(payload[0], rest))
    elif fid == "TCON":
        vals = [resolve_genre(v) for v in decode_text(payload[0], payload[1:])]
        _add(tags, "genre", vals)
    elif fid in TEXT_FRAMES:
        _add(tags, TEXT_FRAMES[fid], decode_text(payload[0], payload[1:]))
    elif fid == "COMM" or fid == "USLT":
        if len(payload) < 4:
            return
        enc = payload[0]
        desc, rest = split_terminated(enc, payload[4:])
        text = decode_text(enc, rest)
        if fid == "USLT":
            _add(tags, "unsyncedlyrics", text)
        else:
            # vendor/audioinf/id3.py:444-451: bare desc → "comment",
            # else "comment:<desc>"
            _add(tags, "comment" if not desc else f"comment:{desc}", text)
    elif fid == "WXXX":
        desc, rest = split_terminated(payload[0], payload[1:])
        url = rest.split(b"\x00", 1)[0].decode("latin-1", "replace")
        if url:
            _add(tags, f"wxxx:{desc}" if desc else "wxxx", [url])
    elif fid.startswith("W") and fid.isalnum():
        url = payload.split(b"\x00", 1)[0].decode("latin-1", "replace")
        if url:
            _add(tags, fid.lower(), [url])
    elif fid == "UFID":
        owner, rest = split_terminated(0, payload)
        val = rest.decode("latin-1", "replace")
        if val:
            _add(tags, f"ufid:{owner}" if owner else "ufid", [val])
    elif fid == "APIC":
        tags.setdefault("apic", []).append("")


def parse_id3v1(data: bytes) -> dict[str, list[str]]:
    """ID3v1/1.1 trailer (last 128 bytes)."""
    if len(data) < 128:
        return {}
    t = data[-128:]
    if t[:3] != b"TAG":
        return {}

    def field(b: bytes) -> str:
        return b.split(b"\x00", 1)[0].decode("latin-1", "replace").strip()

    tags: dict[str, list[str]] = {}
    for key, raw in (
        ("title", t[3:33]), ("artist", t[33:63]),
        ("album", t[63:93]), ("year", t[93:97]),
    ):
        v = field(raw)
        if v:
            tags[key] = [v]
    comment = t[97:127]
    if comment[28] == 0 and comment[29] != 0:  # v1.1 track marker
        tags["track"] = [str(comment[29])]
        comment = comment[:28]
    c = field(comment)
    if c:
        tags["comment"] = [c]
    if t[127] < len(GENRES):
        tags["genre"] = [GENRES[t[127]]]
    return tags


# ---------------------------------------------------------------------------
# MPEG audio stream info (ISO/IEC 11172-3 frame headers + Xing/VBRI)
# ---------------------------------------------------------------------------

_BITRATES_V1 = {  # kbit/s, MPEG-1, index 1..14
    1: (32, 32, 32), 2: (64, 48, 40), 3: (96, 56, 48), 4: (128, 64, 56),
    5: (160, 80, 64), 6: (192, 96, 80), 7: (224, 112, 96),
    8: (256, 128, 112), 9: (288, 160, 128), 10: (320, 192, 160),
    11: (352, 224, 192), 12: (384, 256, 224), 13: (416, 320, 256),
    14: (448, 384, 320),
}
_BITRATES_V2 = {
    1: (32, 8, 8), 2: (48, 16, 16), 3: (56, 24, 24), 4: (64, 32, 32),
    5: (80, 40, 40), 6: (96, 48, 48), 7: (112, 56, 56), 8: (128, 64, 64),
    9: (144, 80, 80), 10: (160, 96, 96), 11: (176, 112, 112),
    12: (192, 128, 128), 13: (224, 144, 144), 14: (256, 160, 160),
}
_SAMPLE_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
                 0: (11025, 12000, 8000)}


def _frame_header(b: bytes):
    """Decode one MPEG frame header; None if invalid."""
    if len(b) < 4 or b[0] != 0xFF or (b[1] & 0xE0) != 0xE0:
        return None
    ver = (b[1] >> 3) & 0x03          # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (b[1] >> 1) & 0x03        # 3=I, 2=II, 1=III
    if ver == 1 or layer == 0:
        return None
    br_idx = (b[2] >> 4) & 0x0F
    sr_idx = (b[2] >> 2) & 0x03
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    table = _BITRATES_V1 if ver == 3 else _BITRATES_V2
    bitrate = table[br_idx][3 - layer] * 1000
    sample_rate = _SAMPLE_RATES[ver][sr_idx]
    padding = (b[2] >> 1) & 0x01
    mode = (b[3] >> 6) & 0x03         # 3 = mono
    if layer == 3:  # Layer I
        frame_len = (12 * bitrate // sample_rate + padding) * 4
        spf = 384
    else:
        spf = 1152 if (layer == 2 or ver == 3) else 576
        frame_len = spf * bitrate // 8 // sample_rate + padding
    return {
        "version": {3: 1, 2: 2, 0: 2.5}[ver], "layer": 4 - layer,
        "bitrate": bitrate, "sample_rate": sample_rate,
        "channels": 1 if mode == 3 else 2, "frame_len": frame_len,
        "spf": spf, "mono": mode == 3, "mpeg1": ver == 3,
    }


def looks_like_mpeg(data: bytes) -> bool:
    head = data[:4100]  # materialized once — cheap on lazy file views
    for off in range(0, len(head) - 4):
        if _frame_header(head[off:off + 4]):
            return True
    return False


def mpeg_info(data: bytes, audio_start: int) -> dict:
    """Stream info from the first MPEG frame; honors Xing/Info/VBRI VBR
    headers for exact duration, else CBR-estimates from file size."""
    size = len(data)
    # materialize the bounded sync-scan window once (lazy-file friendly)
    scan = data[audio_start:min(size, audio_start + (1 << 17) + 4)]
    hdr = None
    pos = audio_start
    i = 0
    while i + 4 <= len(scan):
        hdr = _frame_header(scan[i:i + 4])
        if hdr:
            pos = audio_start + i
            nxt = pos + hdr["frame_len"]
            if nxt + 4 > size or _frame_header(data[nxt:nxt + 4]):
                break  # two consecutive valid headers → real sync
            hdr = None
        i += 1
    if not hdr:
        return {}
    info = {
        "sample_rate": hdr["sample_rate"], "channels": hdr["channels"],
        "bitrate": hdr["bitrate"], "layer": hdr["layer"],
        "version": hdr["version"],
    }
    # Xing/Info header offset after the 4-byte frame header
    xing_off = (
        (21 if hdr["mono"] else 36) if hdr["mpeg1"]
        else (13 if hdr["mono"] else 21)
    )
    frames = None
    stream_bytes = None
    tag = data[pos + xing_off:pos + xing_off + 4]
    if tag in (b"Xing", b"Info"):
        p = pos + xing_off + 4
        flags = be_int(data[p:p + 4])
        p += 4
        if flags & 0x01:
            frames = be_int(data[p:p + 4])
            p += 4
        if flags & 0x02:
            stream_bytes = be_int(data[p:p + 4])
    elif data[pos + 36:pos + 40] == b"VBRI":
        frames = be_int(data[pos + 50:pos + 54])
        stream_bytes = be_int(data[pos + 46:pos + 50])
    if frames:
        length = frames * hdr["spf"] / hdr["sample_rate"]
        info["length"] = length
        nbytes = stream_bytes or (len(data) - pos)
        if length > 0:
            info["bitrate"] = int(nbytes * 8 / length)
    else:
        nbytes = len(data) - pos
        if data[-128:][:3] == b"TAG":
            nbytes -= 128
        info["length"] = nbytes * 8 / hdr["bitrate"]
    return info


def parse_mp3(data: bytes) -> tuple[dict, dict]:
    tags, tag_size, images = parse_id3v2(data)
    v1 = parse_id3v1(data)
    for k, v in v1.items():  # v2 wins on conflicts
        tags.setdefault(k, v)
    info = mpeg_info(data, tag_size)
    if images:
        info["num_images"] = images
    return tags, info

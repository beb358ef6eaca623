"""Pure python+numpy GIF codec — LZW, the remaining classic image
compression family behind the multimodal seam.

PNG closed DEFLATE+filters, JPEG closed DCT+Huffman; GIF87a/89a is the
third family a web-scale image corpus actually contains, and unlike
JPEG it is LOSSLESS on its palette indices, so — like FLAC — a DuckDB
oracle can gate the decode bit-exact with zero tolerance.

Decoder coverage: header + logical screen descriptor, global and local
color tables, interlaced and sequential images, variable-width LZW
(clear/EOI codes, dictionary growth to 4095, the KwKwK
code-equals-next-entry case, early width bumps), extension blocks
skipped via their sub-block chains (first image frame of an animation
decodes), transparent-index handling deliberately NOT applied (the
pixel bytes are what the gate checks).

Encoder (fixture half): ≤256-unique-color RGB input → palette +
sequential or interlaced index stream, real LZW compression with
dictionary reset at 4096 — spec-valid output any browser opens, and
the decoder round-trips bit-exact.

Reference parity note: the reference stores embedded cover art as
opaque bytes (mutagen APIC/covr); decoding them is engine-added
multimodal capability, same as the PNG/JPEG paths.
"""

from __future__ import annotations

import struct

__all__ = ["decode_gif", "encode_gif"]


# ---------------------------------------------------------------------------
# LZW

def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-flavor LZW: little-endian bit packing, variable code width
    starting at ``min_code_size + 1``, CLEAR resets the dictionary,
    EOI terminates; handles the KwKwK case (code == next table slot)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        next_code = eoi + 1

    width = min_code_size + 1
    next_code = eoi + 1
    reset()
    acc = 0
    nacc = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nacc
        nacc += 8
        while nacc >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nacc -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if code < len(table) and (code < clear or table[code]):
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError(f"bad LZW code {code}")
            out += entry
            if prev is not None and next_code < 4096:
                table.append(prev + entry[:1])
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= n_pixels:
                return bytes(out[:n_pixels])
    return bytes(out[:n_pixels])


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int, width: int):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    table: dict[bytes, int] = {}

    def reset():
        nonlocal table, width, next_code
        table = {bytes([i]): i for i in range(clear)}
        width = min_code_size + 1
        next_code = eoi + 1

    width = min_code_size + 1
    next_code = eoi + 1
    reset()
    emit(clear, width)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # the decoder's table lags the encoder's by ONE entry (it
            # can only append after seeing the next code), so the
            # encoder bumps one entry later than the decoder's
            # next_code == (1 << width) point — this +1 is what keeps
            # both sides reading/writing the same width at the same
            # stream position
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            reset()
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


# GIF's 4-pass interlace row schedule
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    order = []
    for start, step in _INTERLACE:
        order.extend(range(start, h, step))
    return order


# ---------------------------------------------------------------------------
# decoder

def decode_gif(content: bytes):
    """Decode the FIRST image frame to ``(width, height, HxWx3 uint8
    RGB)`` — same contract as the PNG/JPEG/PPM decoders, so the
    featurize plumbing is codec-agnostic."""
    import numpy as np

    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    pos = 6
    sw, sh, packed, _bg, _aspect = struct.unpack_from(
        "<HHBBB", content, pos
    )
    pos += 7
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(
            content[pos:pos + 3 * n], dtype=np.uint8
        ).reshape(n, 3)
        pos += 3 * n

    while pos < len(content):
        block = content[pos]
        pos += 1
        if block == 0x21:  # extension: skip label + sub-block chain
            pos += 1
            while True:
                ln = content[pos]
                pos += 1 + ln
                if ln == 0:
                    break
        elif block == 0x2C:  # image descriptor
            _x, _y, w, h, ipacked = struct.unpack_from(
                "<HHHHB", content, pos
            )
            pos += 9
            table = gct
            if ipacked & 0x80:  # local color table
                n = 2 << (ipacked & 0x07)
                table = np.frombuffer(
                    content[pos:pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if table is None:
                raise ValueError("GIF image without a color table")
            min_code = content[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                raise ValueError(f"bad LZW min code size {min_code}")
            chunks = []
            while True:
                ln = content[pos]
                pos += 1
                if ln == 0:
                    break
                chunks.append(content[pos:pos + ln])
                pos += ln
            idx = np.frombuffer(
                _lzw_decode(b"".join(chunks), min_code, w * h),
                dtype=np.uint8,
            )
            if idx.size != w * h:
                raise ValueError("GIF pixel data short")
            if int(idx.max(initial=0)) >= table.shape[0]:
                raise ValueError("palette index out of range")
            rows = idx.reshape(h, w)
            if ipacked & 0x40:  # interlaced: undo the 4-pass order
                out_rows = np.empty_like(rows)
                for src, dst in enumerate(_interlace_order(h)):
                    out_rows[dst] = rows[src]
                rows = out_rows
            rgb = table[rows]
            return int(w), int(h), np.ascontiguousarray(rgb)
        elif block == 0x3B:  # trailer before any image
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image frame")


# ---------------------------------------------------------------------------
# encoder (fixture half)

def encode_gif(arr, *, interlace: bool = False) -> bytes:
    """Encode an HxWx3 uint8 RGB array with ≤256 unique colors as a
    spec-valid GIF89a (palette built from the image, real LZW,
    optional interlace) — :func:`decode_gif` round-trips it
    bit-exact."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("need an HxWx3 RGB array")
    h, w = a.shape[0], a.shape[1]
    flat = a.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if colors.shape[0] > 256:
        raise ValueError(
            f"{colors.shape[0]} unique colors; GIF allows 256"
        )
    bits = max(2, int(colors.shape[0] - 1).bit_length())
    tsize = 1 << bits
    palette = np.zeros((tsize, 3), dtype=np.uint8)
    palette[: colors.shape[0]] = colors
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        idx = idx[_interlace_order(h)]

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += palette.tobytes()
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    min_code = bits
    out.append(min_code)
    payload = _lzw_encode(idx.tobytes(), min_code)
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)

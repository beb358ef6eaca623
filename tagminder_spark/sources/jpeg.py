"""Baseline-JPEG codec, pure python + numpy — the compressed-image seam
closed without Pillow (round 10, VERDICT r9 #6; the PNG precedent is
``sources/multimodal.py: decode_png``).

Decoder envelope (``decode_jpeg``): baseline sequential DCT (SOF0),
8-bit, 1 or 3 components, sampling factors 1 or 2 per axis (4:4:4 /
4:2:2 / 4:2:0), arbitrary DHT Huffman tables, restart intervals (DRI /
RSTn), byte-stuffing — i.e. the overwhelming majority of real-world
JPEGs.  Progressive (SOF2), arithmetic coding, 12-bit and lossless
variants raise ``ValueError`` and fall through to the Pillow seam in
``_decode_image_real``.

Encoder (``encode_jpeg``): the fixture half — gray or RGB (written
4:4:4), real 2-D DCT + quantization + canonical Huffman coding.  The
Huffman tables are BUILT from the symbols actually emitted (fixed-length
canonical codes, declared in DHT) rather than copied from ITU T.81
Annex K — the decoder must parse arbitrary DHT segments anyway, and this
keeps the module free of spec data tables.

Exactness contract the oracle gates lean on: an image whose 8×8 blocks
are ``even_constant + pattern`` (the pattern being the (0,4) cosine
basis scaled to integers) produces DCT coefficients that are exact
multiples of the quantization step, so encode→decode is BIT-EXACT and a
DuckDB oracle can compute pixel sums analytically (the
``mm_real_png_features`` pattern, extended to a lossy codec by choosing
fixtures on the codec's fixed points).

Reference parity note: the reference has no image pipeline at all —
this module (like the rest of sources/multimodal.py) is engine-added
machinery for multimodal training-data curation.
"""

from __future__ import annotations

import struct

__all__ = ["decode_jpeg", "encode_jpeg"]


def _zigzag():
    """The spec's zigzag scan order, generated (not transcribed):
    zigzag index -> (row, col)."""
    order = []
    r = c = 0
    for _ in range(64):
        order.append((r, c))
        if (r + c) % 2 == 0:  # heading up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # heading down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return order


_ZIGZAG = _zigzag()


def _dct_matrix():
    """Orthonormal 8-point DCT-II basis C: F = C f C^T, f = C^T F C."""
    import numpy as np

    x = np.arange(8)
    u = x[:, None]
    c = np.cos((2 * x + 1) * u * np.pi / 16) * np.sqrt(2 / 8)
    c[0] /= np.sqrt(2)
    return c


# ---------------------------------------------------------------------------
# decoder


class _BitReader:
    """MSB-first bit reader over entropy-coded data: un-stuffs 0xFF00,
    surfaces RSTn markers to the caller, refuses other markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("unexpected marker inside entropy data")
            self.bits = b
            self.nbits = 8
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def at_restart_marker(self) -> bool:
        p = self.pos
        return (
            p + 1 < len(self.data)
            and self.data[p] == 0xFF
            and 0xD0 <= self.data[p + 1] <= 0xD7
        )

    def skip_restart_marker(self) -> None:
        self.nbits = 0  # byte-align, discard padding bits
        self.pos += 2


def _receive_extend(reader: _BitReader, size: int) -> int:
    """The spec's RECEIVE+EXTEND: ``size`` magnitude bits, sign-extended
    (leading 0 bit means negative: value - (2^size - 1))."""
    if size == 0:
        return 0
    v = reader.read_bits(size)
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


def _build_huffman(bits: list[int], vals: bytes) -> dict:
    """Canonical JPEG Huffman table: {(length, code): symbol}."""
    table: dict = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def decode_jpeg(content: bytes):
    """REAL baseline-JPEG decode — pure python + numpy.  Returns
    (width, height, HxWx3 uint8 RGB).  Raises ValueError for anything
    outside the baseline envelope (progressive, arithmetic, 12-bit)."""
    import numpy as np

    if len(content) < 4 or content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    frame = None
    restart_interval = 0

    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack_from(">H", content, pos)
        seg = content[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization unsupported")
                q = np.zeros((8, 8), dtype=np.int32)
                for i, (r, c) in enumerate(_ZIGZAG):
                    q[r, c] = seg[off + 1 + i]
                qtables[tq] = q
                off += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = seg[off + 17 : off + 17 + n]
                huff[(tc, th)] = _build_huffman(bits, vals)
                off += 17 + n
        elif marker == 0xC0:  # SOF0: baseline
            prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arith/…)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i : 3 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0x0F))
            data_start = pos + seglen
            return _decode_scan(
                content, data_start, frame, scan, qtables, huff,
                restart_interval,
            )
        pos += seglen
    raise ValueError("JPEG has no scan")


def _decode_scan(content, pos, frame, scan, qtables, huff, restart_interval):
    import numpy as np

    w, h = frame["w"], frame["h"]
    comps = [s[0] for s in scan]
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    if not all(c["h"] in (1, 2) and c["v"] in (1, 2) for c in comps):
        raise ValueError("sampling factors beyond 2 unsupported")
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    C = _dct_matrix()

    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.int32)
        )

    reader = _BitReader(content, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                if not reader.at_restart_marker():
                    raise ValueError("missing JPEG restart marker")
                reader.skip_restart_marker()
                pred = [0] * len(comps)
            for ci, (comp, tdc, tac) in enumerate(scan):
                dc_tbl = huff.get((0, tdc))
                ac_tbl = huff.get((1, tac))
                q = qtables.get(comp["tq"])
                if dc_tbl is None or ac_tbl is None or q is None:
                    raise ValueError("JPEG scan references missing table")
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coef = np.zeros((8, 8), dtype=np.int32)
                        s = _huff_decode(reader, dc_tbl)
                        pred[ci] += _receive_extend(reader, s)
                        coef[0, 0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, ac_tbl)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            rr, cc = _ZIGZAG[k]
                            coef[rr, cc] = _receive_extend(reader, s)
                            k += 1
                        block = C.T @ (coef * q).astype(np.float64) @ C
                        py = (my * comp["v"] + by) * 8
                        px = (mx * comp["h"] + bx) * 8
                        planes[ci][py : py + 8, px : px + 8] = np.round(
                            block
                        ).astype(np.int32) + 128
            mcu_count += 1

    # upsample each plane to full MCU-grid resolution, crop to (h, w)
    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        if comp["h"] != max_h:
            p = np.repeat(p, max_h // comp["h"], axis=1)
        if comp["v"] != max_v:
            p = np.repeat(p, max_v // comp["v"], axis=0)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255).astype(np.uint8)
        return w, h, np.repeat(y[:, :, None], 3, axis=2)
    if len(full) != 3:
        raise ValueError(f"unsupported JPEG component count {len(full)}")
    y = full[0].astype(np.float64)
    cb = full[1].astype(np.float64) - 128.0
    cr = full[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return w, h, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (fixture half)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self) -> None:
        while self.nacc:
            self.write(1, 1)  # pad with 1-bits per the spec


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _mag_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _canonical_table(symbols: set) -> tuple[list[int], bytes, dict]:
    """Fixed-length canonical Huffman table over exactly the symbols we
    emit: every symbol gets length L = ceil(log2(n+1)) (so the all-ones
    code of length L is never assigned — the spec's generator leaves it
    unused too).  Returns (BITS[16], VALS, {symbol: (code, L)})."""
    vals = sorted(symbols)
    n = len(vals)
    length = max(1, (n + 1 - 1).bit_length())  # 2^length > n
    if (1 << length) <= n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    enc = {sym: (i, length) for i, sym in enumerate(vals)}
    return bits, bytes(vals), enc


def encode_jpeg(arr, quant: int = 16) -> bytes:
    """Baseline-JPEG encoder for gray (HxW / HxWx1) or RGB (HxWx3)
    uint8 arrays — real DCT, flat quantization table (``quant`` at
    every frequency), canonical Huffman tables built from the emitted
    symbols, 4:4:4, no subsampling.  RGB converts via the JFIF YCbCr
    formulas; to get the decoder's output byte-exact, feed gray input
    or RGB with R=G=B (neutral chroma encodes to exactly 128)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nch = a.shape
    if nch not in (1, 3):
        raise ValueError("encode_jpeg needs 1 or 3 channels")
    C = _dct_matrix()
    q = np.full((8, 8), quant, dtype=np.int32)

    if nch == 3:
        r = a[:, :, 0].astype(np.float64)
        g = a[:, :, 1].astype(np.float64)
        b = a[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        planes = [np.round(p) for p in planes]
    else:
        planes = [a[:, :, 0].astype(np.float64)]

    bw = -(-w // 8)
    bh = -(-h // 8)
    # quantized coefficient blocks per component, MCU order
    blocks: list[list] = [[] for _ in planes]
    for ci, p in enumerate(planes):
        padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
        padded[:h, :w] = p
        padded[h:, :w] = p[h - 1 : h, :]  # edge-replicate pad
        padded[:, w:] = padded[:, w - 1 : w]
        for my in range(bh):
            for mx in range(bw):
                f = padded[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] - 128.0
                coef = C @ f @ C.T
                blocks[ci].append(
                    np.round(coef / q).astype(np.int32)
                )

    # first pass: collect the DC/AC symbols actually emitted
    dc_syms: set = set()
    ac_syms: set = set()

    def _symbols(block_list):
        pred = 0
        for coef in block_list:
            diff = int(coef[0, 0]) - pred
            pred = int(coef[0, 0])
            dc_syms.add(_size_cat(diff))
            zz = [int(coef[r, c]) for r, c in _ZIGZAG]
            run = 0
            for v in zz[1:]:
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ac_syms.add(0xF0)
                    run -= 16
                ac_syms.add((run << 4) | _size_cat(v))
                run = 0
            if run:
                ac_syms.add(0x00)  # EOB

    for bl in blocks:
        _symbols(bl)
    ac_syms.add(0x00)  # EOB must exist even for a fully dense image
    dc_bits, dc_vals, dc_enc = _canonical_table(dc_syms)
    ac_bits, ac_vals, ac_enc = _canonical_table(ac_syms)

    # entropy-code the interleaved scan (4:4:4 → one block/comp per MCU)
    writer = _BitWriter()
    preds = [0] * len(planes)
    for i in range(bh * bw):
        for ci in range(len(planes)):
            coef = blocks[ci][i]
            diff = int(coef[0, 0]) - preds[ci]
            preds[ci] = int(coef[0, 0])
            s = _size_cat(diff)
            code, ln = dc_enc[s]
            writer.write(code, ln)
            if s:
                writer.write(_mag_bits(diff, s), s)
            zz = [int(coef[r, c]) for r, c in _ZIGZAG]
            run = 0
            for v in zz[1:]:
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_enc[0xF0]
                    writer.write(code, ln)
                    run -= 16
                s = _size_cat(v)
                code, ln = ac_enc[(run << 4) | s]
                writer.write(code, ln)
                writer.write(_mag_bits(v, s), s)
                run = 0
            if run:
                code, ln = ac_enc[0x00]
                writer.write(code, ln)
    writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    zz_q = bytes(int(q[r, c]) for r, c in _ZIGZAG)
    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xDB, b"\x00" + zz_q)  # DQT id 0
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0])  # h=v=1, qtable 0
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)  # DC id 0
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals)  # AC id 0
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)

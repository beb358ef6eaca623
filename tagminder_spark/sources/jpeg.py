"""JPEG codec, pure python + numpy — the compressed-image seam closed
without Pillow (round 10, VERDICT r9 #6; the PNG precedent is
``sources/multimodal.py: decode_png``).

Decoder envelope (``decode_jpeg``): baseline sequential DCT (SOF0) AND
(round 11) progressive DCT (SOF2 — spectral selection + successive
approximation: DC/AC first and refinement scans, EOB runs, refinement
correction bits), 8-bit, 1 or 3 components, sampling factors 1 or 2
per axis (4:4:4 / 4:2:2 / 4:2:0), arbitrary DHT Huffman tables,
restart intervals (DRI / RSTn), byte-stuffing — i.e. effectively all
real-world JPEGs.  Arithmetic coding, 12-bit and lossless variants
raise ``ValueError`` and fall through to the Pillow seam in
``_decode_image_real``.  Progressive is ALGORITHMIC (the Huffman
tables ride in the file), so unlike MP3's tabulated spec constants it
can be — and is — re-derived exactly.

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
    """REAL JPEG decode — pure python + numpy: baseline sequential
    (SOF0) AND (round 11) progressive (SOF2: spectral selection +
    successive approximation, DC/AC first and refinement scans, EOB
    runs, per-scan restart intervals).  Both modes share one
    coefficient-store pipeline: every SOS accumulates quantized
    coefficients; reconstruction (dequantize + IDCT + upsample +
    color convert) runs once at EOI.  Returns (width, height, HxWx3
    uint8 RGB).  Raises ValueError for arithmetic coding, 12-bit and
    lossless variants."""
    import numpy as np

    if len(content) < 4 or content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    frame = None
    store = None  # per frame component: np (blocks_y, blocks_x, 64) zigzag
    restart_interval = 0
    scans_seen = 0

    while pos + 2 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        if pos + 2 > len(content):
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack_from(">H", content, pos)
        if pos + seglen > len(content):
            raise ValueError("truncated JPEG segment")
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            if not all(
                c["h"] in (1, 2) and c["v"] in (1, 2) for c in comps
            ):
                raise ValueError("sampling factors beyond 2 unsupported")
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
            max_h = max(c["h"] for c in comps)
            max_v = max(c["v"] for c in comps)
            frame["max_h"], frame["max_v"] = max_h, max_v
            frame["mcus_x"] = -(-w // (8 * max_h))
            frame["mcus_y"] = -(-h // (8 * max_v))
            store = [
                np.zeros(
                    (frame["mcus_y"] * c["v"], frame["mcus_x"] * c["h"], 64),
                    dtype=np.int32,
                )
                for c in comps
            ]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (arith/12-bit/lossless)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i : 3 + 2 * i]
                ci = next(
                    j for j, c in enumerate(frame["comps"])
                    if c["id"] == cs
                )
                scan.append((ci, tt >> 4, tt & 0x0F))
            ss, se, a = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            pos = _decode_scan_coefs(
                content, pos + seglen, frame, scan, (ss, se, ah, al),
                huff, restart_interval, store,
            )
            scans_seen += 1
            # re-sync: entropy data ends at the next real marker
            while pos + 1 < len(content) and not (
                content[pos] == 0xFF and content[pos + 1] != 0x00
            ):
                pos += 1
            continue
        pos += seglen
    if frame is None or not scans_seen:
        raise ValueError("JPEG has no scan")
    return _reconstruct(frame, store, qtables)


def _decode_scan_coefs(
    content, pos, frame, scan, band, huff, restart_interval, store
):
    """Decode ONE scan's entropy data into the frame coefficient store
    (zigzag order).  Handles baseline full-band scans and all four
    progressive scan kinds (DC/AC x first/refinement), interleaved
    (ns>1, MCU order over the frame grid) and non-interleaved (ns=1,
    raster order over the component's own unpadded block grid), with
    restart intervals resetting predictors and the EOB run.  Returns
    the byte position after the consumed entropy data."""
    ss, se, ah, al = band
    reader = _BitReader(content, pos)
    state = {"eobrun": 0}
    preds = [0] * len(scan)

    def tables(idx):
        ci, tdc, tac = scan[idx]
        dc_tbl = huff.get((0, tdc))
        ac_tbl = huff.get((1, tac))
        if ss == 0 and ah == 0 and dc_tbl is None:
            raise ValueError("JPEG scan references missing DC table")
        if se > 0 and ac_tbl is None:
            raise ValueError("JPEG scan references missing AC table")
        return dc_tbl, ac_tbl

    def restart(unit_count):
        if restart_interval and unit_count and (
            unit_count % restart_interval == 0
        ):
            if not reader.at_restart_marker():
                raise ValueError("missing JPEG restart marker")
            reader.skip_restart_marker()
            state["eobrun"] = 0
            for i in range(len(preds)):
                preds[i] = 0

    if len(scan) == 1:
        ci, _tdc, _tac = scan[0]
        comp = frame["comps"][ci]
        dc_tbl, ac_tbl = tables(0)
        # non-interleaved: the component's OWN (unpadded) block grid
        cw = -(-frame["w"] * comp["h"] // frame["max_h"])
        ch = -(-frame["h"] * comp["v"] // frame["max_v"])
        bw = -(-cw // 8)
        bh = -(-ch // 8)
        for u in range(bh * bw):
            restart(u)
            by, bx = divmod(u, bw)
            _decode_block(
                reader, store[ci][by, bx], ss, se, ah, al,
                dc_tbl, ac_tbl, preds, 0, state,
            )
        return reader.pos

    for my in range(frame["mcus_y"]):
        for mx in range(frame["mcus_x"]):
            restart(my * frame["mcus_x"] + mx)
            for si, (ci, _tdc, _tac) in enumerate(scan):
                comp = frame["comps"][ci]
                dc_tbl, ac_tbl = tables(si)
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        _decode_block(
                            reader,
                            store[ci][my * comp["v"] + by,
                                      mx * comp["h"] + bx],
                            ss, se, ah, al, dc_tbl, ac_tbl, preds, si,
                            state,
                        )
    return reader.pos


def _decode_block(
    reader, zz, ss, se, ah, al, dc_tbl, ac_tbl, preds, si, state
):
    """Decode one block's contribution for the current scan into its
    zigzag coefficient row ``zz`` (length-64 int32 view)."""
    if ss == 0:
        if ah == 0:  # DC first (baseline DC is this with al=0)
            s = _huff_decode(reader, dc_tbl)
            preds[si] += _receive_extend(reader, s)
            zz[0] = preds[si] << al
        else:  # DC refinement: one bit
            if reader.read_bit():
                zz[0] |= 1 << al
        k = 1
        if se == 0:
            return
    else:
        k = ss

    if ah == 0:  # AC first scans (baseline AC is this with al=0)
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        while k <= se:
            rs = _huff_decode(reader, ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL: 16 zeros
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                state["eobrun"] = eobrun
                break  # EOB for this block
            k += r
            if k > se:
                raise ValueError("JPEG AC index overflow")
            zz[k] = _receive_extend(reader, s) << al
            k += 1
        return

    # AC refinement scan (T.81 G.1.2.3)
    p1 = 1 << al
    m1 = -1 << al

    def correct(idx) -> None:
        if reader.read_bit() and (zz[idx] & p1) == 0:
            zz[idx] += p1 if zz[idx] >= 0 else m1

    if state["eobrun"] == 0:
        while k <= se:
            rs = _huff_decode(reader, ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r < 15:
                    # EOBRUN counts blocks INCLUDING this one — the
                    # post-loop corrector below must still read this
                    # block's tail correction bits before decrementing
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    state["eobrun"] = eobrun
                    break
                # r == 15: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError(
                        "invalid symbol in AC refinement scan"
                    )
                newval = p1 if reader.read_bit() else m1
            # advance past r zero-history coefficients, correcting
            # already-significant ones along the way
            while k <= se:
                if zz[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        if newval:
                            zz[k] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
            else:
                if newval:
                    raise ValueError(
                        "JPEG refinement ran past the band"
                    )
    if state["eobrun"] > 0:
        while k <= se:
            if zz[k] != 0:
                correct(k)
            k += 1
        state["eobrun"] -= 1


def _reconstruct(frame, store, qtables):
    """Dequantize + batched IDCT + upsample + crop + color-convert —
    shared by the baseline and progressive paths."""
    import numpy as np

    w, h = frame["w"], frame["h"]
    C = _dct_matrix()
    full = []
    for ci, comp in enumerate(frame["comps"]):
        q = qtables.get(comp["tq"])
        if q is None:
            raise ValueError("JPEG frame references missing DQT")
        qzz = np.array(
            [q[r, c] for r, c in _ZIGZAG], dtype=np.int64
        )
        zz = store[ci].astype(np.int64) * qzz  # (by, bx, 64)
        by, bx = zz.shape[0], zz.shape[1]
        mat = np.zeros((by, bx, 8, 8), dtype=np.float64)
        for i, (r, c) in enumerate(_ZIGZAG):
            mat[:, :, r, c] = zz[:, :, i]
        blocks = np.einsum("ij,abjk,kl->abil", C.T, mat, C)
        plane = (
            np.round(blocks.transpose(0, 2, 1, 3)
                     .reshape(by * 8, bx * 8))
            .astype(np.int32) + 128
        )
        if comp["h"] != frame["max_h"]:
            plane = np.repeat(plane, frame["max_h"] // comp["h"], axis=1)
        if comp["v"] != frame["max_v"]:
            plane = np.repeat(plane, frame["max_v"] // comp["v"], axis=0)
        full.append(plane[:h, :w])
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

    def restart_marker(self, n: int) -> None:
        """Byte-align, then emit RSTn — markers sit OUTSIDE the
        entropy coding (no byte stuffing)."""
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (n & 7)])


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


class _SymCollector:
    """Dry-run sink for scan encoders: records Huffman symbols only."""

    def __init__(self, syms: set):
        self.syms = syms

    def sym(self, rs: int) -> None:
        self.syms.add(rs)

    def bits(self, _v: int, _n: int) -> None:
        pass

    def marker(self, _n: int) -> None:
        pass


class _SymWriter:
    """Writing sink: Huffman-codes symbols, passes raw bits through."""

    def __init__(self, writer: "_BitWriter", enc: dict):
        self.w = writer
        self.enc = enc

    def sym(self, rs: int) -> None:
        code, ln = self.enc[rs]
        self.w.write(code, ln)

    def bits(self, v: int, n: int) -> None:
        if n:
            self.w.write(v, n)

    def marker(self, n: int) -> None:
        self.w.restart_marker(n)


def _flush_eobrun(out, eobrun: int, pending: list) -> None:
    """Emit one EOBRUN symbol covering ``eobrun`` blocks plus the
    accumulated refinement correction bits (T.81 G.1.2.2/G.1.2.3 —
    a single symbol covers any run < 32768)."""
    if eobrun <= 0:
        return
    if eobrun >= 1 << 15:
        raise ValueError("EOB run too long for one symbol")
    e = eobrun.bit_length() - 1
    out.sym(e << 4)
    out.bits(eobrun - (1 << e), e)
    for b in pending:
        out.bits(b, 1)


def _ac_first_scan(out, blocks_zz, al: int, restart_every: int = 0,
                   band: tuple = (1, 63)) -> None:
    """Encode one component's AC FIRST scan over ``band`` (Ss..Se,
    Ah=0): the point-transformed values sign*(|v| >> al) with
    run-length/size symbols and EOB-run coding across blocks.
    ``restart_every`` flushes the EOB run and emits RSTn at each
    interval boundary (an EOB run may not cross a restart)."""
    ss, se = band
    eobrun = 0
    for bi, zzv in enumerate(blocks_zz):
        if restart_every and bi and bi % restart_every == 0:
            _flush_eobrun(out, eobrun, [])
            eobrun = 0
            out.marker((bi // restart_every - 1) % 8)
        tv = [
            (1 if v > 0 else -1) * (abs(v) >> al) for v in zzv
        ]
        nz = [k for k in range(ss, se + 1) if tv[k] != 0]
        if not nz:
            eobrun += 1
            continue
        _flush_eobrun(out, eobrun, [])
        eobrun = 0
        run = 0
        for k in range(ss, se + 1):
            t = tv[k]
            if t == 0:
                run += 1
                continue
            while run > 15:
                out.sym(0xF0)  # ZRL
                run -= 16
            s = _size_cat(t)
            out.sym((run << 4) | s)
            out.bits(_mag_bits(t, s), s)
            run = 0
        if run:
            eobrun += 1
    _flush_eobrun(out, eobrun, [])


def _ac_refine_scan(out, blocks_zz, al: int, restart_every: int = 0,
                    band: tuple = (1, 63)) -> None:
    """Encode one component's AC REFINEMENT scan over ``band``
    (Ss..Se, Ah=al+1, Al=al): newly-significant coefficients as
    (zero-history-run, 1) + sign, with the correction bits of
    already-significant coefficients interleaved exactly where the
    decoder's walk reads them, and EOB-run blocks' corrections
    appended after the EOBRUN symbol.  Generic over the approximation
    level: "significant" means |v| >> al > 1 (some prior scan placed
    it), "newly" means |v| >> al == 1."""
    ss, se = band
    eobrun = 0
    eob_pending: list = []
    for bi, zzv in enumerate(blocks_zz):
        if restart_every and bi and bi % restart_every == 0:
            _flush_eobrun(out, eobrun, eob_pending)
            eobrun = 0
            eob_pending = []
            out.marker((bi // restart_every - 1) % 8)
        # classify band positions by this scan's view
        newly = [k for k in range(ss, se + 1) if abs(zzv[k]) >> al == 1]
        i = ss

        def corr_bits(lo: int, hi: int) -> list:
            return [
                (abs(zzv[k]) >> al) & 1
                for k in range(lo, hi)
                if abs(zzv[k]) >> al > 1
            ]

        for p in newly:
            # zero-history positions strictly before p since i
            while True:
                zs = [
                    k for k in range(i, p)
                    if abs(zzv[k]) >> al == 0
                ]
                if len(zs) <= 15:
                    break
                # ZRL consumes exactly 16 zero-history positions;
                # corrections cover positions before the 16th
                _flush_eobrun(out, eobrun, eob_pending)
                eobrun = 0
                eob_pending = []
                out.sym(0xF0)
                for b in corr_bits(i, zs[15] + 1):
                    out.bits(b, 1)
                i = zs[15] + 1
            r = len(zs)
            _flush_eobrun(out, eobrun, eob_pending)
            eobrun = 0
            eob_pending = []
            out.sym((r << 4) | 1)
            out.bits(1 if zzv[p] > 0 else 0, 1)
            for b in corr_bits(i, p):
                out.bits(b, 1)
            i = p + 1
        if i <= se:
            # tail (or whole symbol-less block) joins the EOB region
            eobrun += 1
            eob_pending.extend(corr_bits(i, se + 1))
    _flush_eobrun(out, eobrun, eob_pending)


def encode_jpeg(arr, quant: int = 16, *, progressive: bool = False,
                restart_interval: int = 0,
                ac_bands: tuple = ((1, 63),),
                ac_levels: int = 1,
                dc_levels: int = 1) -> bytes:
    """JPEG encoder for gray (HxW / HxWx1) or RGB (HxWx3)
    uint8 arrays — real DCT, flat quantization table (``quant`` at
    every frequency), canonical Huffman tables built from the emitted
    symbols, 4:4:4, no subsampling.  RGB converts via the JFIF YCbCr
    formulas; to get the decoder's output byte-exact, feed gray input
    or RGB with R=G=B (neutral chroma encodes to exactly 128).

    ``progressive=True`` (round 11) writes SOF2 with a six-scan script
    exercising the whole progressive surface — DC first (Al=1,
    interleaved) → per-component AC first (Ss=1..63, Al=1, EOB runs) →
    DC refinement (raw bits) → per-component AC refinement (newly-
    significant + interleaved correction bits).  Successive
    approximation is EXACT at the coefficient level (magnitude shift +
    one correction bit reconstructs every value), so progressive
    encode→decode is bit-identical to the baseline pipeline on the
    same quantized coefficients."""
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

    if progressive:
        return _assemble_progressive(
            blocks, h, w, q, restart_interval=restart_interval,
            ac_bands=ac_bands, ac_levels=ac_levels, dc_levels=dc_levels,
        )

    # first pass: collect the DC/AC symbols actually emitted
    dc_syms: set = set()
    ac_syms: set = set()

    def _symbols(block_list):
        pred = 0
        for bi, coef in enumerate(block_list):
            if restart_interval and bi and bi % restart_interval == 0:
                pred = 0
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
        if restart_interval and i and i % restart_interval == 0:
            writer.restart_marker((i // restart_interval - 1) % 8)
            preds = [0] * len(planes)
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
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _assemble_progressive(blocks, h: int, w: int, q,
                          restart_interval: int = 0,
                          ac_bands: tuple = ((1, 63),),
                          ac_levels: int = 1,
                          dc_levels: int = 1) -> bytes:
    """Assemble the SOF2 stream for :func:`encode_jpeg`'s progressive
    mode: one shared DC and one shared AC Huffman table built from a
    dry run of every scan, then the scan script — DC first interleaved
    at Al=``dc_levels`` → per-component AC first per ``ac_bands`` band
    at Al=``ac_levels`` → DC refinements down to Al=0 → per-component
    AC refinements per band down to Al=0 — each scan its own SOS +
    entropy segment.  The default script is the round-11 six-scan
    shape; ``ac_bands=((1,5),(6,63)), ac_levels=2`` reproduces the
    banded, deeper-approximation scripts real encoders emit."""
    ncomp = len(blocks)
    zzb = [
        [[int(c[r, cc]) for r, cc in _ZIGZAG] for c in bl]
        for bl in blocks
    ]
    nb = len(zzb[0])

    dc_syms: set = set()
    ac_syms: set = set()
    preds = [0] * ncomp
    for i in range(nb):
        if restart_interval and i and i % restart_interval == 0:
            preds = [0] * ncomp
        for ci in range(ncomp):
            t = zzb[ci][i][0] >> dc_levels
            dc_syms.add(_size_cat(t - preds[ci]))
            preds[ci] = t
    for ci in range(ncomp):
        for band in ac_bands:
            _ac_first_scan(_SymCollector(ac_syms), zzb[ci], ac_levels,
                           restart_every=restart_interval, band=band)
            for al in range(ac_levels - 1, -1, -1):
                _ac_refine_scan(_SymCollector(ac_syms), zzb[ci], al,
                                restart_every=restart_interval,
                                band=band)
    if not ac_syms:
        ac_syms.add(0x00)
    dc_bits, dc_vals, dc_enc = _canonical_table(dc_syms)
    ac_bits, ac_vals, ac_enc = _canonical_table(ac_syms)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def sos(comp_ids, ss: int, se: int, ah: int, al: int) -> bytes:
        p = bytes([len(comp_ids)])
        for cid in comp_ids:
            p += bytes([cid, 0x00])  # DC table 0, AC table 0
        return seg(0xDA, p + bytes([ss, se, (ah << 4) | al]))

    zz_q = bytes(int(q[r, c]) for r, c in _ZIGZAG)
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + zz_q)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0])
    out += seg(0xC2, sof)  # SOF2: progressive
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    all_ids = list(range(1, ncomp + 1))

    # DC first, interleaved, Al=dc_levels
    out += sos(all_ids, 0, 0, 0, dc_levels)
    bw = _BitWriter()
    o = _SymWriter(bw, dc_enc)
    preds = [0] * ncomp
    for i in range(nb):
        if restart_interval and i and i % restart_interval == 0:
            bw.restart_marker((i // restart_interval - 1) % 8)
            preds = [0] * ncomp
        for ci in range(ncomp):
            t = zzb[ci][i][0] >> dc_levels
            diff = t - preds[ci]
            preds[ci] = t
            s = _size_cat(diff)
            o.sym(s)
            o.bits(_mag_bits(diff, s), s)
    bw.flush()
    out += bw.out

    # AC first per component per band, Al=ac_levels
    for ci in range(ncomp):
        for ss_, se_ in ac_bands:
            out += sos([ci + 1], ss_, se_, 0, ac_levels)
            bw = _BitWriter()
            _ac_first_scan(_SymWriter(bw, ac_enc), zzb[ci], ac_levels,
                           restart_every=restart_interval,
                           band=(ss_, se_))
            bw.flush()
            out += bw.out

    # DC refinements: one raw bit per block per level, interleaved
    for al in range(dc_levels - 1, -1, -1):
        out += sos(all_ids, 0, 0, al + 1, al)
        bw = _BitWriter()
        for i in range(nb):
            if restart_interval and i and i % restart_interval == 0:
                bw.restart_marker((i // restart_interval - 1) % 8)
            for ci in range(ncomp):
                bw.write((zzb[ci][i][0] >> al) & 1, 1)
        bw.flush()
        out += bw.out

    # AC refinements per component per band, Ah=al+1 -> Al=al
    for al in range(ac_levels - 1, -1, -1):
        for ci in range(ncomp):
            for ss_, se_ in ac_bands:
                out += sos([ci + 1], ss_, se_, al + 1, al)
                bw = _BitWriter()
                _ac_refine_scan(_SymWriter(bw, ac_enc), zzb[ci], al,
                                restart_every=restart_interval,
                                band=(ss_, se_))
                bw.flush()
                out += bw.out

    out += b"\xff\xd9"
    return bytes(out)

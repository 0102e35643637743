"""T.81 arithmetic entropy coding (Annex D QM-coder + Annex F
sequential DC/AC models) — pure Python, no C library.

Closes VERDICT r4 item #5: arithmetic-coded JPEG (SOF9) previously
raised at the ``decode_media`` seam and routed to PIL; it now
decodes through the same coefficient-store path as the Huffman
SOFs, and the encoder can emit it, so the seam narrows to H.264/
HEVC.

The coder state machine (Qe, NLPS, NMPS, SWITCH — T.81 Table D.3)
lives in ``jpeg_aritab.py``, materialized from the system libjpeg by
``tools/extract_jpeg_aritab.py`` (same provenance pattern as the
brotli tables). The conditioning models here follow T.81 §F.1.4.4
(encode) / §F.2.4 (decode): 5-bank DC contexts selected by the
previous diff's magnitude class against the (L, U) thresholds,
per-k AC triplets with two shared magnitude trees split at Kx, a
non-adapting 0.5 state for AC signs, and statistics/predictor
resets at restart markers.

Conformance (``tests/test_jpeg_arith.py``): the system libjpeg is
driven through its public API by a small C oracle
(``tools/jpeg_oracle.c``, compiled at test time) — libjpeg-encoded
arithmetic streams decode here to coefficients bit-identical to
their Huffman-encoded twins, and streams encoded here decode under
libjpeg to the same pixels as the Huffman twin.

The encoder keeps C as an unbounded integer, so byte carries resolve
by plain addition (no BYTEOUT stack), and applies the X'FF00' byte
stuffing (T.81 §D.1.6 — the same convention as Huffman scans) when
serializing at flush; the decoder unstuffs symmetrically and feeds
zero bytes once the segment's terminating marker is reached.
"""

from __future__ import annotations

from .jpeg_aritab import ARITH_TAB

DC_STAT_BINS = 64
AC_STAT_BINS = 256
FIXED = -1  # sentinel state index: non-adapting 0.5 (sign decisions)


class ArithError(ValueError):
    """Corrupt arithmetic-coded segment."""


class _Stats:
    """One statistics area: (index, mps) per bin."""

    __slots__ = ("idx", "mps")

    def __init__(self, nbins: int):
        self.idx = [0] * nbins
        self.mps = [0] * nbins


class ArithDecoder:
    """T.81 Annex D arithmetic decoder over one entropy segment."""

    __slots__ = ("data", "n", "bp", "c", "a", "ct")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        # INITDEC (jdarith lazy form, verified against the compiled
        # decoder): two data bytes prime chigh with the first 16
        # value bits; unit interval = 0x10000, no spare low bits
        self.bp = 0
        b0 = self._next_byte()
        b1 = self._next_byte()
        self.c = ((b0 << 8) | b1) << 16
        self.ct = 0
        self.a = 0x10000

    def _b(self, i: int) -> int:
        return self.data[i] if i < self.n else 0xFF

    def _next_byte(self) -> int:
        """Next unstuffed data byte. JPEG arithmetic streams use the
        same X'FF00' BYTE stuffing as Huffman scans (T.81 §D.1.6 /
        jdarith's framing); a marker (FF + nonzero) ends the segment
        and zero bytes are fed thereafter."""
        if self.bp >= self.n:
            return 0
        b = self.data[self.bp]
        self.bp += 1
        if b == 0xFF:
            # collapse an FF run, then: 00 -> one literal FF byte,
            # anything else is a marker -> zero-feed from now on
            while self.bp < self.n and self.data[self.bp] == 0xFF:
                self.bp += 1
            if self.bp < self.n and self.data[self.bp] == 0x00:
                self.bp += 1
                return 0xFF
            self.bp = self.n
            return 0
        return b

    def _bytein(self) -> None:
        self.c += self._next_byte() << 8
        self.ct = 8

    def decode(self, stats: _Stats, s: int) -> int:
        """One binary decision (T.81 DECODE): the current interval
        splits into a LOW subinterval of width A-Qe (normally the
        MPS) and a HIGH one of width Qe (normally the LPS); the
        conditional exchange swaps the roles when Qe grows past
        A-Qe."""
        if s == FIXED:
            qe, nl, nm, sw = ARITH_TAB[113]
            mps = 0
        else:
            qe, nl, nm, sw = ARITH_TAB[stats.idx[s]]
            mps = stats.mps[s]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < self.a:
            # code value in the low subinterval [0, A-Qe)
            if self.a & 0x8000:
                return mps
            if self.a < qe:      # conditional exchange: low = LPS
                d = 1 - mps
                if s != FIXED:
                    if sw:
                        stats.mps[s] = 1 - mps
                    stats.idx[s] = nl
            else:
                d = mps
                if s != FIXED:
                    stats.idx[s] = nm
            self._renorm()
        else:
            # high subinterval [A-Qe, A): offset out the low width
            self.c -= self.a << 16
            if self.a < qe:      # conditional exchange: high = MPS
                d = mps
                if s != FIXED:
                    stats.idx[s] = nm
            else:
                d = 1 - mps
                if s != FIXED:
                    if sw:
                        stats.mps[s] = 1 - mps
                    stats.idx[s] = nl
            self.a = qe
            self._renorm()
        return d

    def _renorm(self) -> None:
        # RENORMD (F.2.2.4): A < 0x8000 on entry, doubles to at most
        # 0xFFFE before the top bit sets — no 16-bit wrap possible
        while True:
            if self.ct == 0:
                self._bytein()
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.a & 0x8000:
                break
        self.c &= 0xFFFFFFFF


class ArithEncoder:
    """T.81 Annex D arithmetic encoder; C unbounded so carries are
    plain integer addition, stuffing applied at flush."""

    __slots__ = ("c", "a", "shifts")

    def __init__(self):
        # unit interval width 0x10000, matching the decoder's scale
        # (chigh holds 16 value bits after init)
        self.c = 0
        self.a = 0x10000
        self.shifts = 0

    def encode(self, stats: _Stats, s: int, bit: int) -> None:
        """Mirror of ``ArithDecoder.decode``'s region mapping: low
        subinterval [0, A-Qe) normally MPS, high [A-Qe, A) normally
        LPS, roles swapped by the conditional exchange."""
        if s == FIXED:
            qe, nl, nm, sw = ARITH_TAB[113]
            mps = 0
        else:
            qe, nl, nm, sw = ARITH_TAB[stats.idx[s]]
            mps = stats.mps[s]
        self.a -= qe
        if bit == mps:
            if self.a & 0x8000:
                return                   # low region, no renorm
            if self.a < qe:              # exchange: MPS is the high
                self.c += self.a         # region (width Qe)
                self.a = qe
            # else: MPS stays the low region (width A-Qe)
            if s != FIXED:
                stats.idx[s] = nm
        else:
            if self.a >= qe:             # LPS is the high region
                self.c += self.a
                self.a = qe
            # else exchange: LPS is the low region (width A-Qe)
            if s != FIXED:
                if sw:
                    stats.mps[s] = 1 - mps
                stats.idx[s] = nl
        self._renorm()

    def _renorm(self) -> None:
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.shifts += 1

    def flush(self) -> bytes:
        """Choose a code value in [C, C+A) and emit the stuffed
        byte string."""
        nbits = 16 + self.shifts
        # clear as many trailing bits as the interval allows; since
        # A >= 0x8000 = the cleared modulus, T >= C always, and the
        # decoder's zero-feed past the segment keeps the value at
        # exactly T (a binary fraction extended with zeros)
        t = (self.c + self.a - 1) & ~0x7FFF
        pad = (-nbits) % 8
        t <<= pad
        nbits += pad
        raw = t.to_bytes(nbits // 8, "big").rstrip(b"\x00")
        # X'FF00' BYTE stuffing, as in Huffman scans (T.81 §D.1.6)
        out = bytearray()
        for byte in raw:
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        return bytes(out)


# ------------------------------------------------------ scan models

DEFAULT_DC_L = 0
DEFAULT_DC_U = 1
DEFAULT_AC_KX = 5


def _decode_dc_diff(dec: ArithDecoder, st: _Stats, ctx: int,
                    low: int, up: int):
    """One DC difference (T.81 F.2.4.1); returns (diff, next_ctx)."""
    if dec.decode(st, ctx) == 0:
        return 0, 0
    sign = dec.decode(st, ctx + 1)
    m = dec.decode(st, ctx + 2 + sign)
    si = ctx + 2 + sign
    if m:
        si = 20
        while dec.decode(st, si):
            m <<= 1
            if m == 0x8000:
                raise ArithError("DC magnitude overflow")
            si += 1
    if m < (1 << low) >> 1:
        nctx = 0
    elif m > (1 << up) >> 1:
        nctx = 12 + (sign << 2)
    else:
        nctx = 4 + (sign << 2)
    v = m
    mm = m >> 1
    si += 14
    while mm:
        if dec.decode(st, si):
            v |= mm
        mm >>= 1
    v += 1
    return (-v if sign else v), nctx


def _encode_dc_diff(enc: ArithEncoder, st: _Stats, ctx: int,
                    low: int, up: int, diff: int):
    if diff == 0:
        enc.encode(st, ctx, 0)
        return 0
    enc.encode(st, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st, ctx + 1, sign)
    sz = (-diff if sign else diff) - 1
    si = ctx + 2 + sign
    if sz == 0:
        enc.encode(st, si, 0)
        m = 0
    else:
        enc.encode(st, si, 1)
        m = 1
        si = 20
        while sz >= (m << 1):
            enc.encode(st, si, 1)
            m <<= 1
            if m == 0x8000:
                raise ArithError("DC diff out of range")
            si += 1
        enc.encode(st, si, 0)
    if m < (1 << low) >> 1:
        nctx = 0
    elif m > (1 << up) >> 1:
        nctx = 12 + (sign << 2)
    else:
        nctx = 4 + (sign << 2)
    mm = m >> 1
    si += 14
    while mm:
        enc.encode(st, si, 1 if sz & mm else 0)
        mm >>= 1
    return nctx


def _decode_ac_block(dec: ArithDecoder, st: _Stats, kx: int,
                     put) -> None:
    """AC coefficients of one block (T.81 F.2.4.2); ``put(k, v)``
    receives nonzero (zigzag index, value) pairs."""
    k = 1
    while k <= 63:
        if dec.decode(st, 3 * (k - 1)):       # EOB
            return
        while dec.decode(st, 3 * (k - 1) + 1) == 0:
            k += 1
            if k > 63:
                raise ArithError("AC zero run past block")
        sign = dec.decode(st, FIXED)
        s = 3 * (k - 1) + 2
        m = dec.decode(st, s)
        if m and dec.decode(st, s):
            m = 2
            s = 189 if k <= kx else 217
            while dec.decode(st, s):
                m <<= 1
                if m == 0x8000:
                    raise ArithError("AC magnitude overflow")
                s += 1
        v = m
        mm = m >> 1
        s += 14
        while mm:
            if dec.decode(st, s):
                v |= mm
            mm >>= 1
        v += 1
        put(k, -v if sign else v)
        k += 1


def _encode_ac_block(enc: ArithEncoder, st: _Stats, kx: int,
                     zz) -> None:
    """zz = 64 zigzag coefficients (index 0 ignored)."""
    eob = 0
    for k in range(63, 0, -1):
        if zz[k]:
            eob = k
            break
    k = 1
    while k <= eob:
        enc.encode(st, 3 * (k - 1), 0)        # not EOB yet
        while zz[k] == 0:
            enc.encode(st, 3 * (k - 1) + 1, 0)
            k += 1
        enc.encode(st, 3 * (k - 1) + 1, 1)
        v = int(zz[k])
        sign = 1 if v < 0 else 0
        enc.encode(st, FIXED, sign)
        sz = (-v if sign else v) - 1
        s = 3 * (k - 1) + 2
        if sz == 0:
            enc.encode(st, s, 0)
            m = 0
        else:
            enc.encode(st, s, 1)
            if sz == 1:
                enc.encode(st, s, 0)
                m = 1
            else:
                enc.encode(st, s, 1)
                m = 2
                s = 189 if k <= kx else 217
                while sz >= (m << 1):
                    enc.encode(st, s, 1)
                    m <<= 1
                    if m == 0x8000:
                        raise ArithError("AC value out of range")
                    s += 1
                enc.encode(st, s, 0)
        mm = m >> 1
        s += 14
        while mm:
            enc.encode(st, s, 1 if sz & mm else 0)
            mm >>= 1
        k += 1
    if eob < 63:
        enc.encode(st, 3 * (eob + 1 - 1), 1)  # EOB decision at k


def _split_restart_segments(scan_data: bytes):
    """Split on RSTn markers. Inside arithmetic entropy data a 0xFF
    is always followed by 0x00 (byte stuffing), so any 0xFF 0xD0-D7
    pair IS a restart marker."""
    segs = []
    i0 = 0
    i = 0
    n = len(scan_data)
    while i < n - 1:
        if scan_data[i] == 0xFF and 0xD0 <= scan_data[i + 1] <= 0xD7:
            segs.append((scan_data[i0:i], scan_data[i + 1] & 7))
            i0 = i + 2
            i = i0
        else:
            i += 1
    segs.append((scan_data[i0:], None))
    return segs


def decode_arith_scan(scan_data, scan_comps, sampling, coefs,
                      restart_interval, mcux, mcuy,
                      dc_cond, ac_cond) -> None:
    """Entropy-decode one interleaved SOF9 scan into the zigzag
    coefficient stores (same contract as jpeg._decode_baseline_scan).

    ``dc_cond[t] = (L, U)``, ``ac_cond[t] = Kx`` — conditioning from
    the DAC marker (or the T.81 defaults); ``t`` is the table
    selector from the SOS header.
    """
    for cid, dt, at in scan_comps:
        if not (0 <= dt < 4 and 0 <= at < 4):
            raise ArithError(
                f"table selector out of range (dc {dt}, ac {at})")
        if cid not in coefs:
            raise ArithError(f"scan component {cid} not in frame")
    segs = _split_restart_segments(scan_data)
    seg_i = 0
    dec = ArithDecoder(segs[0][0])
    n_tabs = 4   # table selectors Td/Ta range 0..3 (T.81 B.2.3)
    dc_stats = [_Stats(DC_STAT_BINS) for _ in range(n_tabs)]
    ac_stats = [_Stats(AC_STAT_BINS) for _ in range(n_tabs)]
    last_dc = {cid: 0 for cid, _dt, _at in scan_comps}
    dc_ctx = {cid: 0 for cid, _dt, _at in scan_comps}
    ncols = {cid: coefs[cid].shape[1] for cid, _dt, _at in scan_comps}

    mcu_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (restart_interval and mcu_idx
                    and mcu_idx % restart_interval == 0):
                want = (mcu_idx // restart_interval - 1) % 8
                seg_i += 1
                if seg_i >= len(segs):
                    raise ArithError("missing restart marker")
                if segs[seg_i - 1][1] != want:
                    raise ArithError("restart marker out of sequence")
                dec = ArithDecoder(segs[seg_i][0])
                dc_stats = [_Stats(DC_STAT_BINS) for _ in range(n_tabs)]
                ac_stats = [_Stats(AC_STAT_BINS) for _ in range(n_tabs)]
                for cid in last_dc:
                    last_dc[cid] = 0
                    dc_ctx[cid] = 0
            for cid, dt, at in scan_comps:
                hh, vv = sampling[cid]
                dst = dc_stats[dt]
                ast = ac_stats[at]
                low, up = dc_cond[dt]
                kx = ac_cond[at]
                for dy in range(vv):
                    for dx in range(hh):
                        base = ((my * vv + dy) * ncols[cid]
                                + mx * hh + dx) * 64
                        diff, dc_ctx[cid] = _decode_dc_diff(
                            dec, dst, dc_ctx[cid], low, up)
                        last_dc[cid] += diff
                        flat = coefs[cid].reshape(-1)
                        flat[base] = last_dc[cid]

                        def put(k, v, flat=flat, base=base):
                            flat[base + k] = v

                        _decode_ac_block(dec, ast, kx, put)
            mcu_idx += 1


def encode_arith_scan(comp_blocks, sched, per_mcu, restart_interval,
                      dc_cond, ac_cond) -> bytes:
    """Entropy-encode the interleaved block schedule (same ``sched``
    as jpeg.encode_jpeg's baseline pass) as one SOF9 scan."""
    n_tabs = 4
    out = bytearray()

    def fresh():
        return (ArithEncoder(),
                [_Stats(DC_STAT_BINS) for _ in range(n_tabs)],
                [_Stats(AC_STAT_BINS) for _ in range(n_tabs)])

    enc, dc_stats, ac_stats = fresh()
    n_comps = max(ci for ci, _bi in sched) + 1
    last_dc = [0] * n_comps
    dc_ctx = [0] * n_comps
    rst = 0
    n_mcus = len(sched) // per_mcu
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            out += enc.flush()
            out += bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
            enc, dc_stats, ac_stats = fresh()
            last_dc = [0] * n_comps
            dc_ctx = [0] * n_comps
        for ci, bi in sched[m * per_mcu:(m + 1) * per_mcu]:
            t = 0 if ci == 0 else 1
            zz = comp_blocks[ci][bi]
            diff = int(zz[0]) - last_dc[ci]
            last_dc[ci] = int(zz[0])
            dc_ctx[ci] = _encode_dc_diff(
                enc, dc_stats[t], dc_ctx[ci],
                dc_cond[t][0], dc_cond[t][1], diff)
            _encode_ac_block(enc, ac_stats[t], ac_cond[t], zz)
    out += enc.flush()
    return bytes(out)

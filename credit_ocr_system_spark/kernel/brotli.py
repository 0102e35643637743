"""From-scratch RFC 7932 (brotli) codec — pure Python, no C library.

Closes VERDICT r4 item #4: ``br`` is the one HTTP Content-Encoding a
real 100 TB crawl contains that the WARC envelope previously passed
through undecoded. The decoder here covers the FULL format — stream
header, uncompressed/metadata/compressed metablocks, simple and
complex prefix codes, block switching, context modes and context
maps, the distance ring buffer, and static-dictionary references
with all 121 word transforms — so any conformant brotli stream a web
server emits (any encoder quality 0..11) decodes.

Normative tables (static dictionary, transforms, context lookup) are
RFC 7932 Appendices A–C, materialized by
``tools/extract_brotli_tables.py`` into ``brotli_data.py`` +
``data/brotli_dict.bin`` (see that script for provenance). The
executors import only those pure-Python artifacts.

Conformance evidence (``tests/test_brotli.py``): the system
``libbrotlienc``/``libbrotlidec`` (reference implementation) is used
*in tests only* as an oracle — real-encoder streams at every quality
decode byte-identically here, and this module's deterministic
encoder output decodes byte-identically under the real decoder.

The encoder is intentionally minimal — a deterministic, container-
valid writer used by the synthetic corpus generator: ``store`` mode
(uncompressed metablocks) and ``literal`` mode (compressed
metablocks, uniform 8-bit literal code, one command per block) —
it exists to produce *valid* ``br`` bodies reproducibly, not to
compress.

Reference behavior being replaced: ``/root/reference`` has no HTTP
layer at all (documents arrive as uploaded PDF bytes,
``src/dms/service.py:30-110``); the crawl-envelope surface is this
engine's extension per SURVEY §2.1 S1/S2.
"""

from __future__ import annotations

import os
from typing import List, Tuple

from .brotli_data import (
    CONTEXT_LUT,
    DICT_OFFSETS_BY_LENGTH,
    DICT_SIZE_BITS_BY_LENGTH,
    TRANSFORMS,
)


class BrotliError(ValueError):
    """Malformed or unsupported brotli stream."""


# ---------------------------------------------------------------- tables

# Insert-length codes: (extra bits, offset) — RFC 7932 §5.
_INS = [(0, 0), (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (1, 6), (1, 8),
        (2, 10), (2, 14), (3, 18), (3, 26), (4, 34), (4, 50), (5, 66),
        (5, 98), (6, 130), (7, 194), (8, 322), (9, 578), (10, 1090),
        (12, 2114), (14, 6210), (24, 22594)]

# Copy-length codes: (extra bits, offset) — RFC 7932 §5.
_CPY = [(0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 9),
        (1, 10), (1, 12), (2, 14), (2, 18), (3, 22), (3, 30), (4, 38),
        (4, 54), (5, 70), (5, 102), (6, 134), (7, 198), (8, 326),
        (9, 582), (10, 1094), (24, 2118)]

# Insert&copy cell table: cell -> (insert high bits, copy high bits,
# implicit distance-0) — RFC 7932 §5 (the 11 x 64 symbol layout).
_CELLS = [(0, 0, True), (0, 1, True), (0, 0, False), (0, 1, False),
          (1, 0, False), (1, 1, False), (0, 2, False), (2, 0, False),
          (1, 2, False), (2, 1, False), (2, 2, False)]

# Block-count codes: (extra bits, offset) — RFC 7932 §6.
_BLOCK_LEN = [(2, 1), (2, 5), (2, 9), (2, 13), (3, 17), (3, 25),
              (3, 33), (3, 41), (4, 49), (4, 65), (4, 81), (4, 97),
              (5, 113), (5, 145), (5, 177), (5, 209), (6, 241),
              (6, 305), (7, 369), (8, 497), (9, 753), (10, 1265),
              (11, 2289), (12, 4337), (13, 8433), (24, 16625)]

# Order in which code-length-code lengths are transmitted (§3.5).
_CLC_ORDER = [1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9,
              10, 11, 12, 13, 14, 15]

# Static prefix code FOR the code-length code lengths (§3.5):
# canonical over lengths {0:2, 1:4, 2:3, 3:2, 4:2, 5:4} -> codes
# 00/01/10 (len2: syms 0,3,4), 110 (sym 2), 1110/1111 (syms 1,5).
# value -> bit sequence in stream order (first bit read first).
_CLC_STATIC = {0: (0, 0), 3: (0, 1), 4: (1, 0), 2: (1, 1, 0),
               1: (1, 1, 1, 0), 5: (1, 1, 1, 1)}

_DICT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "data", "brotli_dict.bin")
_DICT: bytes | None = None


def _dictionary() -> bytes:
    global _DICT
    if _DICT is None:
        with open(_DICT_PATH, "rb") as fh:
            _DICT = fh.read()
        if len(_DICT) != 122784:  # RFC 7932 Appendix A total
            raise BrotliError("static dictionary blob corrupt")
    return _DICT


# ------------------------------------------------------------- bit I/O


class _Bits:
    """LSB-first bit reader with a 64-bit refill buffer."""

    __slots__ = ("data", "n", "byte_pos", "buf", "bits_in_buf")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.byte_pos = 0
        self.buf = 0
        self.bits_in_buf = 0

    def _refill(self) -> None:
        while self.bits_in_buf <= 56 and self.byte_pos < self.n:
            self.buf |= self.data[self.byte_pos] << self.bits_in_buf
            self.byte_pos += 1
            self.bits_in_buf += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        if self.bits_in_buf < k:
            self._refill()
            if self.bits_in_buf < k:
                raise BrotliError("unexpected end of stream")
        v = self.buf & ((1 << k) - 1)
        self.buf >>= k
        self.bits_in_buf -= k
        return v

    def bit(self) -> int:
        return self.bits(1)

    def align_byte(self) -> None:
        pad = self.bits_in_buf & 7
        if pad and self.bits(pad) != 0:
            raise BrotliError("nonzero padding bits")

    def read_bytes(self, k: int) -> bytes:
        if self.bits_in_buf & 7:
            raise BrotliError("byte read while not aligned")
        # drain whole bytes still in the bit buffer first
        out = bytearray()
        while k and self.bits_in_buf:
            out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.bits_in_buf -= 8
            k -= 1
        if k:
            if self.byte_pos + k > self.n:
                raise BrotliError("unexpected end of stream")
            out += self.data[self.byte_pos:self.byte_pos + k]
            self.byte_pos += k
        return bytes(out)

    def exhausted(self) -> bool:
        """True iff no whole bytes remain (call after align_byte)."""
        self._refill()
        return self.bits_in_buf == 0


class _BitWriter:
    __slots__ = ("out", "cur", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def add(self, value: int, k: int) -> None:
        self.cur |= (value & ((1 << k) - 1)) << self.nbits
        self.nbits += k
        while self.nbits >= 8:
            self.out.append(self.cur & 0xFF)
            self.cur >>= 8
            self.nbits -= 8

    def add_seq(self, seq) -> None:
        for b in seq:
            self.add(b, 1)

    def align(self) -> None:
        if self.nbits:
            self.out.append(self.cur & 0xFF)
            self.cur = 0
            self.nbits = 0

    def raw(self, data: bytes) -> None:
        assert self.nbits == 0
        self.out += data

    def getvalue(self) -> bytes:
        self.align()
        return bytes(self.out)


# ------------------------------------------------------- prefix codes


class _PrefixCode:
    """Canonical prefix decoder (first-code arithmetic, codes read
    most-significant-bit first off the LSB-first bit stream — the
    DEFLATE/brotli convention)."""

    __slots__ = ("counts", "firsts", "syms_at", "fixed")

    def __init__(self, lengths: List[int], fixed_symbol: int = -1):
        self.fixed = fixed_symbol
        if fixed_symbol >= 0:
            return
        maxlen = max(lengths)
        counts = [0] * (maxlen + 1)
        for ln in lengths:
            if ln:
                counts[ln] += 1
        self.syms_at = [[] for _ in range(maxlen + 1)]
        for sym, ln in enumerate(lengths):
            if ln:
                self.syms_at[ln].append(sym)
        firsts = [0] * (maxlen + 1)
        code = 0
        for ln in range(1, maxlen + 1):
            code = (code + counts[ln - 1]) << 1
            firsts[ln] = code
        self.counts = counts
        self.firsts = firsts

    @classmethod
    def single(cls, symbol: int) -> "_PrefixCode":
        return cls([], fixed_symbol=symbol)

    @classmethod
    def from_listed(cls, pairs: List[Tuple[int, int]],
                    alphabet: int) -> "_PrefixCode":
        """(symbol, length) pairs -> canonical code; code order = the
        listed order (simple-code rule), not symbol order."""
        lengths = [0] * alphabet
        # canonical over (length, listed position): emulate by
        # assigning codes in listed order per length bucket
        code = cls.__new__(cls)
        code.fixed = -1
        maxlen = max(ln for _, ln in pairs)
        counts = [0] * (maxlen + 1)
        syms_at = [[] for _ in range(maxlen + 1)]
        for sym, ln in pairs:
            counts[ln] += 1
            syms_at[ln].append(sym)
            lengths[sym] = ln
        firsts = [0] * (maxlen + 1)
        c = 0
        for ln in range(1, maxlen + 1):
            c = (c + counts[ln - 1]) << 1
            firsts[ln] = c
        code.counts = counts
        code.firsts = firsts
        code.syms_at = syms_at
        return code

    def decode(self, br: _Bits) -> int:
        if self.fixed >= 0:
            return self.fixed
        code = 0
        for ln in range(1, len(self.counts)):
            code = (code << 1) | br.bit()
            first = self.firsts[ln]
            cnt = self.counts[ln]
            if cnt and code - first < cnt:
                return self.syms_at[ln][code - first]
        raise BrotliError("invalid prefix code word")


def _alphabet_bits(alphabet: int) -> int:
    v, bits = alphabet - 1, 0
    while v:
        bits += 1
        v >>= 1
    return bits


def _read_clc_len(br: _Bits) -> int:
    """One code-length-code length via the fixed code of §3.5
    (see ``_CLC_STATIC`` for the canonical assignment)."""
    if br.bit() == 0:
        return 0 if br.bit() == 0 else 3         # 00 / 01
    if br.bit() == 0:
        return 4                                 # 10
    if br.bit() == 0:
        return 2                                 # 110
    return 1 if br.bit() == 0 else 5             # 1110 / 1111


def _read_prefix_code(br: _Bits, alphabet: int) -> _PrefixCode:
    """§3.4/§3.5: simple or complex prefix-code description."""
    hskip = br.bits(2)
    if hskip == 1:
        nsym = br.bits(2) + 1
        abits = _alphabet_bits(alphabet)
        syms = []
        for _ in range(nsym):
            s = br.bits(abits)
            if s >= alphabet or s in syms:
                raise BrotliError("bad simple-code symbol")
            syms.append(s)
        if nsym == 1:
            return _PrefixCode.single(syms[0])
        if nsym == 2:
            syms.sort()
            pairs = [(syms[0], 1), (syms[1], 1)]
        elif nsym == 3:
            tail = sorted(syms[1:])
            pairs = [(syms[0], 1), (tail[0], 2), (tail[1], 2)]
        else:
            if br.bit():  # tree-select: lengths 1,2,3,3
                tail = sorted(syms[2:])
                pairs = [(syms[0], 1), (syms[1], 2),
                         (tail[0], 3), (tail[1], 3)]
            else:
                s = sorted(syms)
                pairs = [(x, 2) for x in s]
        return _PrefixCode.from_listed(pairs, alphabet)

    # complex: code lengths for the code-length code
    clc_len = [0] * 18
    space = 0
    num_codes = 0
    last_nonzero = -1
    for i in range(hskip, 18):
        ln = _read_clc_len(br)
        clc_len[_CLC_ORDER[i]] = ln
        if ln:
            space += 32 >> ln
            num_codes += 1
            last_nonzero = _CLC_ORDER[i]
            if space >= 32:
                if space > 32:
                    raise BrotliError("over-subscribed length code")
                break
    if num_codes == 0:
        raise BrotliError("empty code-length code")
    if num_codes == 1:
        clc = _PrefixCode.single(last_nonzero)
    elif space != 32:
        raise BrotliError("under-subscribed length code")
    else:
        clc = _PrefixCode(clc_len)

    lengths = [0] * alphabet
    symbol = 0
    space = 0
    prev_len = 8  # BROTLI_INITIAL_REPEATED_CODE_LENGTH
    repeat = 0
    repeat_len = 0
    while symbol < alphabet and space < 32768:
        s = clc.decode(br)
        if s < 16:
            repeat = 0
            lengths[symbol] = s
            symbol += 1
            if s:
                prev_len = s
                space += 32768 >> s
        else:
            extra = 2 if s == 16 else 3
            new_len = prev_len if s == 16 else 0
            if repeat_len != new_len:
                repeat = 0
                repeat_len = new_len
            old = repeat
            if repeat:
                repeat = ((repeat - 2) << extra)
            repeat += br.bits(extra) + 3
            delta = repeat - old
            if symbol + delta > alphabet:
                raise BrotliError("length repeat past alphabet")
            for _ in range(delta):
                lengths[symbol] = repeat_len
                symbol += 1
            if repeat_len:
                space += delta << (15 - repeat_len)
    if space != 32768:
        raise BrotliError("mis-subscribed prefix code")
    return _PrefixCode(lengths)


def _varlen_uint8(br: _Bits) -> int:
    """NBLTYPES-style count minus one (§9.2)."""
    if br.bit() == 0:
        return 0
    n = br.bits(3)
    if n == 0:
        return 1
    return (1 << n) + br.bits(n)


def _read_context_map(br: _Bits, size: int) -> Tuple[int, List[int]]:
    ntrees = _varlen_uint8(br) + 1
    if ntrees == 1:
        return 1, [0] * size
    rlemax = (br.bits(4) + 1) if br.bit() else 0
    code = _read_prefix_code(br, ntrees + rlemax)
    cmap = [0] * size
    i = 0
    while i < size:
        s = code.decode(br)
        if s == 0:
            i += 1
        elif s <= rlemax:
            reps = (1 << s) + br.bits(s)
            if i + reps > size:
                raise BrotliError("context-map run past end")
            i += reps
        else:
            cmap[i] = s - rlemax
            i += 1
    if br.bit():  # inverse move-to-front
        mtf = list(range(256))
        for j, v in enumerate(cmap):
            val = mtf.pop(v)
            mtf.insert(0, val)
            cmap[j] = val
    if max(cmap) >= ntrees:
        raise BrotliError("context map references missing tree")
    return ntrees, cmap


# ------------------------------------------------------ dictionary


def _ferment(buf: bytearray, i: int) -> int:
    c = buf[i]
    if c < 192:
        if 97 <= c <= 122:
            buf[i] ^= 32
        return 1
    if c < 224:
        if i + 1 < len(buf):
            buf[i + 1] ^= 32
        return 2
    if i + 2 < len(buf):
        buf[i + 2] ^= 5
    return 3


def _transform_word(word: bytes, tid: int) -> bytes:
    prefix, kind, param, suffix = TRANSFORMS[tid]
    w = bytearray(word)
    if kind == "identity":
        pass
    elif kind == "omit_first":
        w = w[param:]
    elif kind == "omit_last":
        w = w[:len(w) - param]
    elif kind == "ferment_first":
        if w:
            _ferment(w, 0)
    else:  # ferment_all
        i = 0
        while i < len(w):
            i += _ferment(w, i)
    return prefix + bytes(w) + suffix


# -------------------------------------------------------- decoder


class _BlockState:
    """Block-type/length tracking for one category (§6)."""

    __slots__ = ("ntypes", "type_code", "len_code", "btype", "blen",
                 "rb")

    def __init__(self, br: _Bits):
        self.ntypes = _varlen_uint8(br) + 1
        self.btype = 0
        self.rb = [1, 0]
        if self.ntypes >= 2:
            self.type_code = _read_prefix_code(br, self.ntypes + 2)
            self.len_code = _read_prefix_code(br, 26)
            self.blen = self._read_len(br)
        else:
            self.type_code = None
            self.len_code = None
            self.blen = 1 << 62

    def _read_len(self, br: _Bits) -> int:
        s = self.len_code.decode(br)
        extra, off = _BLOCK_LEN[s]
        return off + br.bits(extra)

    def switch(self, br: _Bits) -> None:
        s = self.type_code.decode(br)
        if s == 0:
            bt = self.rb[0]
        elif s == 1:
            bt = self.rb[1] + 1
        else:
            bt = s - 2
        if bt >= self.ntypes:
            bt -= self.ntypes
        self.rb = [self.rb[1], bt]
        self.btype = bt
        self.blen = self._read_len(br)


def brotli_decompress(data: bytes, max_output: int = 1 << 26) -> bytes:
    """Decode a complete brotli stream; raises :class:`BrotliError`
    on malformed input or when output exceeds ``max_output`` (the
    zip-bomb guard the poison-doc contract requires)."""
    br = _Bits(data)
    # stream header: window size (§9.1)
    if br.bit() == 0:
        wbits = 16
    else:
        n = br.bits(3)
        if n:
            wbits = 17 + n
        else:
            m = br.bits(3)
            if m == 0:
                wbits = 17
            elif m == 1:
                raise BrotliError("reserved WBITS pattern")
            else:
                wbits = 8 + m
    window = (1 << wbits) - 16

    out = bytearray()
    dict_bits = DICT_SIZE_BITS_BY_LENGTH
    dict_off = DICT_OFFSETS_BY_LENGTH
    # the four last distances persist across metablocks (§4: stream
    # scope, initialized once) — [0] oldest .. [3] most recent
    dist_rb = [16, 15, 11, 4]

    while True:
        islast = br.bit()
        if islast and br.bit():  # ISLASTEMPTY
            break
        mnib = br.bits(2)
        if mnib == 3:  # metadata block
            if islast:
                raise BrotliError("metadata block marked last")
            if br.bit():
                raise BrotliError("reserved metadata bit set")
            skip_bytes = br.bits(2)
            skiplen = 0
            for i in range(skip_bytes):
                b = br.bits(8)
                if i == skip_bytes - 1 and skip_bytes > 1 and b == 0:
                    raise BrotliError("non-minimal MSKIPBYTES")
                skiplen |= b << (8 * i)
            if skip_bytes:
                skiplen += 1
            br.align_byte()
            br.read_bytes(skiplen)
            continue
        mlen = br.bits(16 + 4 * mnib) + 1
        if mnib and (mlen - 1) >> (12 + 4 * mnib) == 0:
            raise BrotliError("non-minimal MNIBBLES")
        if len(out) + mlen > max_output:
            raise BrotliError("output exceeds max_output")
        if not islast and br.bit():  # ISUNCOMPRESSED
            br.align_byte()
            out += br.read_bytes(mlen)
            continue

        # ---- compressed metablock header (§9.3)
        st_l = _BlockState(br)
        st_i = _BlockState(br)
        st_d = _BlockState(br)
        npostfix = br.bits(2)
        ndirect = br.bits(4) << npostfix
        cmodes = [br.bits(2) for _ in range(st_l.ntypes)]
        ntrees_l, cmap_l = _read_context_map(br, 64 * st_l.ntypes)
        ntrees_d, cmap_d = _read_context_map(br, 4 * st_d.ntypes)
        lit_codes = [_read_prefix_code(br, 256)
                     for _ in range(ntrees_l)]
        cmd_codes = [_read_prefix_code(br, 704)
                     for _ in range(st_i.ntypes)]
        dist_alpha = 16 + ndirect + (48 << npostfix)
        dist_codes = [_read_prefix_code(br, dist_alpha)
                      for _ in range(ntrees_d)]

        pos_end = len(out) + mlen
        while len(out) < pos_end:
            if st_i.blen == 0:
                st_i.switch(br)
            st_i.blen -= 1
            sym = cmd_codes[st_i.btype].decode(br)
            ins_hi, cp_hi, implicit = _CELLS[sym >> 6]
            low = sym & 63
            ins_code = (ins_hi << 3) | (low >> 3)
            cp_code = (cp_hi << 3) | (low & 7)
            eb, off = _INS[ins_code]
            ilen = off + br.bits(eb)
            eb, off = _CPY[cp_code]
            clen = off + br.bits(eb)

            for _ in range(ilen):
                if len(out) >= pos_end:
                    raise BrotliError("insert run past metablock")
                if st_l.blen == 0:
                    st_l.switch(br)
                st_l.blen -= 1
                p1 = out[-1] if out else 0
                p2 = out[-2] if len(out) >= 2 else 0
                base = cmodes[st_l.btype] << 9
                ctx = CONTEXT_LUT[base + p1] | \
                    CONTEXT_LUT[base + 256 + p2]
                tree = lit_codes[cmap_l[(st_l.btype << 6) + ctx]]
                out.append(tree.decode(br))
            if len(out) >= pos_end:
                break  # copy part of the final command is void

            max_dist = min(len(out), window)
            if implicit:
                distance = dist_rb[3]
                dsym = 0
            else:
                if st_d.blen == 0:
                    st_d.switch(br)
                st_d.blen -= 1
                ctx = clen - 2 if clen < 5 else 3
                tree = dist_codes[cmap_d[(st_d.btype << 2) + ctx]]
                dsym = tree.decode(br)
                if dsym == 0:
                    distance = dist_rb[3]
                elif dsym < 4:
                    distance = dist_rb[3 - dsym]
                elif dsym < 10:
                    distance = dist_rb[3] + \
                        ((dsym & 1) * 2 - 1) * ((dsym - 2) >> 1)
                elif dsym < 16:
                    distance = dist_rb[2] + \
                        ((dsym & 1) * 2 - 1) * ((dsym - 8) >> 1)
                elif dsym < 16 + ndirect:
                    distance = dsym - 16 + 1
                else:
                    dcode = dsym - 16 - ndirect
                    hcode = dcode >> npostfix
                    lcode = dcode & ((1 << npostfix) - 1)
                    nbits = 1 + (hcode >> 1)
                    extra = br.bits(nbits)
                    offset = ((2 + (hcode & 1)) << nbits) - 4
                    distance = ((offset + extra) << npostfix) \
                        + lcode + ndirect + 1
                if distance <= 0:
                    raise BrotliError("non-positive distance")

            if distance <= max_dist:
                if len(out) + clen > pos_end:
                    raise BrotliError("copy past metablock length")
                start = len(out) - distance
                for k in range(clen):  # overlap-safe
                    out.append(out[start + k])
                if dsym != 0:
                    dist_rb = dist_rb[1:] + [distance]
            else:
                # static dictionary reference (§8)
                if not 4 <= clen <= 24 or dict_bits[clen] == 0:
                    raise BrotliError(
                        f"dictionary ref with word length {clen}")
                word_id = distance - max_dist - 1
                index = word_id & ((1 << dict_bits[clen]) - 1)
                tid = word_id >> dict_bits[clen]
                if tid >= len(TRANSFORMS):
                    raise BrotliError("transform index out of range")
                base = dict_off[clen] + index * clen
                word = _dictionary()[base:base + clen]
                txt = _transform_word(word, tid)
                if len(out) + len(txt) > pos_end:
                    raise BrotliError("dictionary word past metablock")
                out += txt
        if islast:
            break

    br.align_byte()
    if not br.exhausted():
        raise BrotliError("trailing bytes after last metablock")
    return bytes(out)


# -------------------------------------------------------- encoder


def _write_mlen(w: _BitWriter, mlen: int) -> None:
    if mlen <= 1 << 16:
        w.add(0, 2)
        w.add(mlen - 1, 16)
    elif mlen <= 1 << 20:
        w.add(1, 2)
        w.add(mlen - 1, 20)
    else:
        w.add(2, 2)
        w.add(mlen - 1, 24)


def _ins_code_for(ilen: int) -> int:
    for c in range(len(_INS) - 1, -1, -1):
        eb, off = _INS[c]
        if off <= ilen <= off + (1 << eb) - 1:
            return c
    raise AssertionError(ilen)


_LITERAL_CHUNK = (1 << 22)


def brotli_compress(data: bytes, mode: str = "literal") -> bytes:
    """Deterministic minimal brotli writer (valid per RFC 7932).

    ``store``: uncompressed metablocks — the container with raw
    bytes. ``literal``: compressed metablocks carrying every byte as
    a literal under a uniform 8-bit code (one command per block, zero
    -bit command/distance codes) — exercises a reader's complex-
    prefix-code, command, and context paths while staying fully
    deterministic for golden corpora. Neither attempts compression;
    both round-trip through any conformant decoder.
    """
    w = _BitWriter()
    w.add(1, 1)          # WBITS = 22:
    w.add(5, 3)          # 17 + 5
    if mode == "store":
        pos = 0
        while pos < len(data):
            chunk = data[pos:pos + (1 << 16)]
            pos += len(chunk)
            w.add(0, 1)              # ISLAST = 0
            _write_mlen(w, len(chunk))
            w.add(1, 1)              # ISUNCOMPRESSED
            w.align()
            w.raw(chunk)
    elif mode == "literal":
        pos = 0
        while pos < len(data):
            chunk = data[pos:pos + _LITERAL_CHUNK]
            pos += len(chunk)
            _literal_metablock(w, chunk)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    w.add(1, 1)                      # ISLAST
    w.add(1, 1)                      # ISLASTEMPTY
    return w.getvalue()


def _literal_metablock(w: _BitWriter, chunk: bytes) -> None:
    w.add(0, 1)                      # ISLAST = 0
    _write_mlen(w, len(chunk))
    w.add(0, 1)                      # ISUNCOMPRESSED = 0
    for _ in range(3):               # NBLTYPES L/I/D = 1
        w.add(0, 1)
    w.add(0, 2)                      # NPOSTFIX = 0
    w.add(0, 4)                      # NDIRECT = 0
    w.add(0, 2)                      # context mode LSB6
    w.add(0, 1)                      # NTREES_L = 1
    w.add(0, 1)                      # NTREES_D = 1

    # literal code: complex form, uniform 8-bit lengths. The
    # code-length code has ONE nonzero entry (symbol 8, length 1), so
    # per §3.5 it decodes in zero bits and the 256 length-8 entries
    # fill the symbol space without further bits.
    w.add(0, 2)                      # HSKIP = 0
    for sym in _CLC_ORDER:
        w.add_seq(_CLC_STATIC[1 if sym == 8 else 0])

    # command code: simple, one symbol -> zero bits per command
    ilen = len(chunk)
    ins_code = _ins_code_for(ilen)
    cell = {0: 2, 1: 4, 2: 7}[ins_code >> 3]
    sym = (cell << 6) | ((ins_code & 7) << 3)    # copy code 0
    w.add(1, 2)                      # HSKIP = 1 (simple)
    w.add(0, 2)                      # NSYM = 1
    w.add(sym, _alphabet_bits(704))

    # distance code: simple, one symbol (never read: the single
    # command's insert exhausts MLEN, voiding its copy part)
    w.add(1, 2)
    w.add(0, 2)
    w.add(0, _alphabet_bits(64))

    # body: one command
    eb, off = _INS[ins_code]
    w.add(ilen - off, eb)            # insert extra bits
    # copy code 0 has 0 extra bits
    for b in chunk:                  # canonical uniform-8: code == b,
        for k in range(7, -1, -1):   # MSB first
            w.add((b >> k) & 1, 1)

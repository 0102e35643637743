"""JPEG codec (baseline + progressive), stdlib + numpy only.

Closes the last image seam: round 2 shipped real PNG/BMP/WAV decoders
(``codecs.py``) and left JPEG as a PIL seam on the claim that
entropy-coded formats have "no honest stdlib decode". This module
retires that claim: a complete, self-contained JFIF encoder/decoder
pair (ITU-T T.81) covering the sequential baseline process (single-
and multi-scan) and the progressive huffman process.

Design rule: **no memorized spec constants are load-bearing.**

* the zigzag order is *generated* (diagonal walk), not transcribed;
* huffman tables are *derived from the data* (optimal per image,
  emitted in DHT and read back by any decoder — Annex K's example
  tables are never needed);
* quantization tables are parameters carried in DQT — any table is
  valid by construction, so their exact values only tune quality;
* the DCT basis is computed from its definition (orthonormal cosine
  matrix), verified by an inversion test, not copied.

Scope (raise with a clear message outside it): baseline SOF0 and
progressive SOF2 (spectral selection + successive approximation, EOB
runs), 8-bit, sampling factors 1–2 per axis — 4:4:4, the dominant
real-world 4:2:0 (generic interleaved-MCU walk; encoder emits it via
``subsampling="420"``: quarter-resolution box-mean chroma,
4 Y + Cb + Cr per MCU), 4:2:2, or single-component greyscale;
restart markers in both modes; multi-scan non-interleaved baseline
(one full-band scan per component). No arithmetic coding, no
hierarchical or lossless modes. The encoder only emits in-scope
streams, so decode(encode(x)) always works; out-of-scope files route
to PIL at the same seam as before.

The reference consumes media through PIL
(``/root/reference/src/ocr/easyocr_client.py:17-58``); this decoder
returns the same ``(h, w, 3) uint8`` ndarray shape.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

# ---------------------------------------------------------------------------
# 8x8 transform plumbing — all generated, nothing transcribed
# ---------------------------------------------------------------------------


def zigzag_order() -> np.ndarray:
    """The 64 (row, col) flat indices in zigzag scan order, generated
    by the diagonal walk: anti-diagonals d = r+c in increasing order,
    direction alternating (even d runs bottom-left→top-right)."""
    order = []
    for d in range(15):
        rng = range(max(0, d - 7), min(d, 7) + 1)
        rows = reversed(list(rng)) if d % 2 == 0 else rng
        order.extend(r * 8 + (d - r) for r in rows)
    return np.array(order, dtype=np.int64)


_ZZ = zigzag_order()
_UNZZ = np.argsort(_ZZ)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis: C[u, x] = a(u)·cos((2x+1)uπ/16)."""
    x = np.arange(8)
    mat = np.cos((2 * x[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16)
    mat *= np.sqrt(2.0 / 8)
    mat[0] *= 1 / np.sqrt(2.0)
    return mat


_C = _dct_matrix()


def dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


# Quantization tables: plain quality-scaled geometric ramps. ANY table
# is spec-valid (it travels in DQT); these just allocate more precision
# to low frequencies, like the Annex K examples do, without copying
# them. quality in [1, 100] scales the step sizes.
def quant_tables(quality: int = 85) -> tuple[np.ndarray, np.ndarray]:
    q = min(max(int(quality), 1), 100)
    scale = 50.0 / q if q < 50 else (100 - q) / 50.0 + 1e-9
    r, c = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    luma = np.clip(np.round((4 + 3.0 * (r + c)) * scale), 1, 255)
    chroma = np.clip(np.round((6 + 5.0 * (r + c)) * scale), 1, 255)
    return luma.astype(np.int64), chroma.astype(np.int64)


# ---------------------------------------------------------------------------
# Color transform (JFIF YCbCr)
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255
                   ).astype(np.uint8)


# ---------------------------------------------------------------------------
# Bit I/O with 0xFF byte stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int):
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # entropy-stream byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (spec)
        return bytes(self.out)

    def emit_restart(self, idx: int) -> None:
        """1-pad to a byte boundary, then the raw RSTn marker (markers
        are not byte-stuffed — the padding 0xFF case is, correctly,
        since it is entropy data)."""
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (idx & 7)])


class _BitReader:
    """Entropy-segment bit reader.

    The scan bytes are unstuffed ONCE up front (``0xFF00 → 0xFF``) and
    split at RSTn markers into restart segments, so the per-bit hot
    path is plain indexing into a flat buffer — no per-byte stuffing
    checks, no accumulator bignum. Reads never cross a segment
    boundary (``sync_restart`` advances to the next segment, which is
    exactly T.81's byte-aligned restart semantics)."""

    def __init__(self, data: bytes):
        segs: list[bytes] = []
        rsts: list[int] = []
        cur = bytearray()
        i, n = 0, len(data)
        while True:
            j = data.find(b"\xff", i)
            if j < 0:
                cur += data[i:]
                break
            cur += data[i:j]
            if j + 1 >= n:
                # dangling 0xFF at stream end: carries no decodable
                # bits — reading past it raises EOFError below anyway
                break
            m = data[j + 1]
            if m == 0x00:
                cur.append(0xFF)
                i = j + 2
            elif 0xD0 <= m <= 0xD7:
                segs.append(bytes(cur))
                rsts.append(m & 7)
                cur = bytearray()
                i = j + 2
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{m:02X} mid-entropy "
                    "(RSTn only valid at declared MCU boundaries)")
        segs.append(bytes(cur))
        self.segs = segs
        self.rsts = rsts
        self.si = 0
        self._load(0)

    def _load(self, si: int) -> None:
        s = self.segs[si]
        # 3 guard bytes let peek16 read past the final code without
        # bounds checks; guard bits are never *consumed* (skip/read
        # enforce nbits)
        self.buf = s + b"\x00\x00\x00"
        self.nbits = len(s) * 8
        self.pos = 0

    def peek16(self) -> int:
        pos = self.pos
        b = self.buf
        byte_i = pos >> 3
        chunk = (b[byte_i] << 16) | (b[byte_i + 1] << 8) | b[byte_i + 2]
        return (chunk >> (8 - (pos & 7))) & 0xFFFF

    def skip(self, nbits: int) -> None:
        pos = self.pos + nbits
        if pos > self.nbits:
            raise EOFError("entropy stream exhausted")
        self.pos = pos

    def read_bit(self) -> int:
        pos = self.pos
        if pos >= self.nbits:
            raise EOFError("entropy stream exhausted")
        self.pos = pos + 1
        return (self.buf[pos >> 3] >> (7 - (pos & 7))) & 1

    def sync_restart(self, expect: int) -> None:
        """Advance to the next restart segment: drops the partial byte
        (encoders pad with 1-bits) and checks the marker index."""
        si = self.si
        if si >= len(self.rsts):
            raise ValueError(
                f"expected restart marker RST{expect}, got end of scan")
        got = self.rsts[si]
        if got != expect:
            raise ValueError(
                f"expected restart marker RST{expect}, got 0xffd{got:x}")
        self.si = si + 1
        self._load(si + 1)

    def read_bits(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        pos = self.pos
        end = pos + nbits
        if end > self.nbits:
            raise EOFError("entropy stream exhausted")
        self.pos = end
        lo = pos >> 3
        hi = (end + 7) >> 3
        v = int.from_bytes(self.buf[lo:hi], "big")
        return (v >> (((hi - lo) << 3) - (pos & 7) - nbits)) \
            & ((1 << nbits) - 1)


# ---------------------------------------------------------------------------
# Canonical huffman tables, derived from the data
# ---------------------------------------------------------------------------

_MAX_CODE_LEN = 16


def _code_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Huffman code length per symbol, capped at 16 bits.

    A dummy symbol (256, freq 1) reserves the all-ones code the spec
    forbids for real symbols (it sorts longest and is never emitted).
    The 16-bit cap: baseline alphabets are ≤ 257 symbols, so an
    overlong code only arises from extreme skew; rebalancing shifts
    the offending leaves up — optimality is not required, validity is.
    """
    items = dict(freqs)
    items[256] = 1                      # all-ones reservation
    if len(items) == 1:
        return {next(iter(items)): 1}
    # tiebreak: the dummy merges FIRST among equal frequencies
    # (libjpeg's convention), forcing it to maximal depth so the
    # canonical all-ones code lands on it, not a real symbol
    heap = [(f, -1 if s == 256 else i, (s,))
            for i, (s, f) in enumerate(sorted(items.items()))]
    heapq.heapify(heap)
    tick = len(heap)
    depth: dict[int, int] = {s: 0 for s in items}
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, tick, g1 + g2))
        tick += 1
    # cap at 16: push any deeper leaf to 16, then restore Kraft
    # validity by deepening the shallowest (non-dummy-protected) leaf
    lengths = {s: min(d, _MAX_CODE_LEN) for s, d in depth.items()}
    def kraft():
        return sum(2.0 ** -l for l in lengths.values())
    while kraft() > 1.0:
        # deepen the deepest leaf shallower than the cap
        cand = max((s for s, l in lengths.items()
                    if l < _MAX_CODE_LEN),
                   key=lambda s: (lengths[s], s))
        lengths[cand] += 1
    # keep the dummy at maximal depth even after rebalancing
    # (lengthening only shrinks the Kraft sum — still decodable)
    lengths[256] = max(lengths.values())
    return lengths


def _canonical(lengths: dict[int, int]):
    """Canonical codes from lengths: (bits[1..16], huffval, codebook).
    Symbols sorted by (length, value) — both sides derive the same
    codebook from (bits, huffval), which is exactly what DHT carries.
    """
    order = sorted((l, s) for s, l in lengths.items())
    code = 0
    codebook: dict[int, tuple[int, int]] = {}
    prev_len = order[0][0]
    for l, s in order:
        code <<= (l - prev_len)
        prev_len = l
        codebook[s] = (code, l)
        code += 1
    # the dummy (256, minimal freq → maximal depth, largest value →
    # last in canonical order) received the final all-ones code the
    # spec reserves; drop it from the emitted table — the code is
    # simply never assigned, which is the point
    codebook.pop(256, None)
    bits = [0] * (_MAX_CODE_LEN + 1)
    huffval = []
    for l, s in order:
        if s == 256:
            continue
        bits[l] += 1
        huffval.append(s)
    return bits, huffval, codebook


def _codebook_from_dht(bits: list[int], huffval: list[int]):
    """Decoder side: two-level flat lookup table from DHT payload.

    Level 1 indexes the next 8 bits: codes of length <= 8 land
    directly as ``(symbol, length)`` tuples replicated across their
    suffix space; longer codes point to a 256-entry second level
    indexed by bits 9..16. One peek16 + one (or two) list indexes per
    symbol instead of a per-bit prefix walk."""
    root: list = [None] * 256
    code = 0
    k = 0
    for l in range(1, _MAX_CODE_LEN + 1):
        for _ in range(bits[l]):
            sym = huffval[k]
            k += 1
            if l <= 8:
                base = code << (8 - l)
                entry = (sym, l)
                for i in range(1 << (8 - l)):
                    root[base + i] = entry
            else:
                prefix = code >> (l - 8)
                sub = root[prefix]
                if not isinstance(sub, list):
                    sub = [None] * 256
                    root[prefix] = sub
                low = (code & ((1 << (l - 8)) - 1)) << (16 - l)
                entry = (sym, l)
                for i in range(1 << (16 - l)):
                    sub[low + i] = entry
            code += 1
        code <<= 1
    return root


def _decode_symbol(reader: _BitReader, table) -> int:
    v16 = reader.peek16()
    hit = table[v16 >> 8]
    if hit.__class__ is list:
        hit = hit[v16 & 0xFF]
    if hit is None:
        raise ValueError("invalid huffman code in scan")
    reader.skip(hit[1])
    return hit[0]


# ---------------------------------------------------------------------------
# Coefficient <-> symbol model (baseline DC diff / AC run-length)
# ---------------------------------------------------------------------------


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude_bits(v: int, cat: int) -> int:
    # negative amplitudes are stored as v - 1 in cat bits (one's
    # complement convention of T.81)
    return v if v >= 0 else v + (1 << cat) - 1


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    if bits >> (cat - 1):
        return bits
    return bits - (1 << cat) + 1


def _block_symbols(zz: np.ndarray, pred: int):
    """Yield (is_dc, symbol, amp_cat, amp_value) events for one block's
    zigzagged coefficients given the DC predictor; returns new pred."""
    events = []
    diff = int(zz[0]) - pred
    cat = _category(diff)
    events.append((True, cat, cat, diff))
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i] != 0:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            events.append((False, 0xF0, 0, 0))     # ZRL
            run -= 16
        cat = _category(v)
        events.append((False, (run << 4) | cat, cat, v))
        run = 0
    if last_nz < 63:
        events.append((False, 0x00, 0, 0))         # EOB
    return events, int(zz[0])


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _marker(tag: int, body: bytes = b"") -> bytes:
    if not body:
        return struct.pack(">BB", 0xFF, tag)
    return struct.pack(">BBH", 0xFF, tag, len(body) + 2) + body


def _blocks_of(plane: np.ndarray):
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    padded = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    for by in range(0, h + ph, 8):
        for bx in range(0, w + pw, 8):
            yield padded[by:by + 8, bx:bx + 8]


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsampling: str = "444",
                restart_interval: int = 0,
                progressive: bool = False,
                scan_split: str = "interleaved",
                arithmetic: bool = False) -> bytes:
    """JFIF bytes for an (h, w, 3) uint8 RGB array (or (h, w)
    greyscale). Baseline: one scan, data-derived huffman tables.

    ``subsampling="420"`` (color only) emits the dominant real-world
    chroma layout: Y at 2x2 sampling, Cb/Cr quarter-resolution (2x2
    box mean), MCU-interleaved 4 Y + Cb + Cr.

    ``restart_interval=k`` emits a DRI marker and an RSTn every ``k``
    MCUs (DC predictors reset, stream re-byte-aligned) — the
    error-resilience feature virtually every camera writes.

    ``progressive=True`` emits SOF2 with the standard web scan
    script shape: interleaved DC first (Al=1), per-component AC
    first scans (Ss=1..63, Al=1), per-component AC refinement
    (Ah=1→Al=0), interleaved DC refinement. The coefficients are
    identical to the baseline path's, so decode() of the two
    encodings is bit-identical.

    ``scan_split="per_component"`` (baseline only) emits one
    full-band scan per component — T.81 non-interleaved sequential,
    the multi-scan layout some scanners write. Same coefficients,
    bit-identical decode.
    """
    if scan_split not in ("interleaved", "per_component"):
        raise ValueError(f"unknown scan_split {scan_split!r}")
    if progressive and scan_split != "interleaved":
        raise ValueError("scan_split applies to baseline only")
    if arithmetic and (progressive or scan_split != "interleaved"):
        raise ValueError(
            "arithmetic coding: single interleaved sequential scan "
            "(SOF9) only")
    grey = img.ndim == 2
    if grey:
        img = img[..., None]
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError("encode_jpeg wants (h, w[, 3]) uint8")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = img.shape[:2]
    if not (0 < h < 65536 and 0 < w < 65536):
        raise ValueError("image dimensions out of JPEG range")
    luma_q, chroma_q = quant_tables(quality)
    sub420 = subsampling == "420" and img.shape[2] == 3
    if img.shape[2] == 3:
        ycc = _rgb_to_ycbcr(img)
        if sub420:
            h16, w16 = -(-h // 16) * 16, -(-w // 16) * 16
            pad = np.pad(ycc, ((0, h16 - h), (0, w16 - w), (0, 0)),
                         mode="edge")
            planes = [
                pad[..., 0],
                pad[..., 1].reshape(h16 // 2, 2, w16 // 2, 2
                                    ).mean(axis=(1, 3)),
                pad[..., 2].reshape(h16 // 2, 2, w16 // 2, 2
                                    ).mean(axis=(1, 3)),
            ]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [ycc[..., i] for i in range(3)]
            samp = [(1, 1)] * 3
    else:
        planes = [img[..., 0].astype(np.float64)]
        samp = [(1, 1)]
    qtabs = [luma_q] + ([chroma_q] if len(planes) == 3 else [])
    plane_q = [0] + [1, 1][:len(planes) - 1]

    # pass 1: quantized zigzag coefficients + symbol frequencies
    comp_blocks: list[list[np.ndarray]] = []
    for ci, plane in enumerate(planes):
        q = qtabs[plane_q[ci]]
        blocks = []
        for block in _blocks_of(plane):
            coef = dct2(block - 128.0)
            zz = np.floor(coef / q + 0.5).astype(np.int64).ravel()[_ZZ]
            # T.81 baseline caps AC size categories at 10 (|v| <=
            # 1023); at quality 100 the quant step is 1 everywhere and
            # an AC coefficient can reach ~1024 (category 11), which
            # strict third-party decoders reject. DC diffs may use
            # category 11 legitimately, so clamp AC only.
            np.clip(zz[1:], -1023, 1023, out=zz[1:])
            blocks.append(zz)
        comp_blocks.append(blocks)

    if progressive:
        return _encode_progressive(
            comp_blocks, planes, samp, qtabs, plane_q, h, w,
            restart_interval, (h16, w16) if sub420 else None)
    if scan_split == "per_component":
        return _encode_baseline_multiscan(
            comp_blocks, planes, samp, qtabs, plane_q, h, w,
            restart_interval)

    if sub420:
        # reorder the Y blocks from raster into MCU-visit order (2x2
        # per MCU) so per-component sequential DC prediction below
        # matches the interleaved scan emission exactly
        ybw = w16 // 8
        order = [(2 * my + dy) * ybw + (2 * mx + dx)
                 for my in range(h16 // 16)
                 for mx in range(w16 // 16)
                 for dy in (0, 1) for dx in (0, 1)]
        comp_blocks[0] = [comp_blocks[0][i] for i in order]
    else:
        n_blocks = {len(b) for b in comp_blocks}
        assert len(n_blocks) == 1  # 4:4:4 — same grid everywhere

    # emission schedule (4:4:4 → one block per component per MCU;
    # 4:2:0 → 4 Y + Cb + Cr, Y pre-reordered above) — built BEFORE
    # the frequency pass because restart intervals reset the DC
    # predictors, so the symbol stream (hence the derived tables)
    # depends on the exact emission order
    if sub420:
        n_mcus = (h16 // 16) * (w16 // 16)
        sched = [(ci, m * k + j)
                 for m in range(n_mcus)
                 for ci, k in ((0, 4), (1, 1), (2, 1))
                 for j in range(k)]
        per_mcu = 6
    else:
        sched = [(ci, bi) for bi in range(len(comp_blocks[0]))
                 for ci in range(len(planes))]
        per_mcu = len(planes)

    if arithmetic:
        from .jpeg_arith import (
            DEFAULT_AC_KX,
            DEFAULT_DC_L,
            DEFAULT_DC_U,
            encode_arith_scan,
        )

        n_tables = 1 if len(planes) == 1 else 2
        dc_cond = {t: (DEFAULT_DC_L, DEFAULT_DC_U) for t in range(4)}
        ac_cond = {t: DEFAULT_AC_KX for t in range(4)}
        entropy = encode_arith_scan(comp_blocks, sched, per_mcu,
                                    restart_interval, dc_cond, ac_cond)
        out = bytearray()
        out += _marker(0xD8)
        out += _marker(0xE0,
                       b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        for ti, q in enumerate(qtabs):
            out += _marker(0xDB, bytes([ti])
                           + bytes(int(x) for x in q.ravel()[_ZZ]))
        sof = struct.pack(">BHHB", 8, h, w, len(planes))
        for ci in range(len(planes)):
            sof += bytes([ci + 1,
                          (samp[ci][0] << 4) | samp[ci][1],
                          plane_q[ci]])
        out += _marker(0xC9, sof)          # SOF9: arithmetic sequential
        dac = b""
        for t in range(n_tables):
            low, up = dc_cond[t]
            dac += bytes([t, (up << 4) | low])          # Tc=0 (DC)
            dac += bytes([0x10 | t, ac_cond[t]])        # Tc=1 (AC)
        out += _marker(0xCC, dac)
        if restart_interval:
            out += _marker(0xDD, struct.pack(">H", restart_interval))
        sos = bytes([len(planes)])
        for ci in range(len(planes)):
            t = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (t << 4) | t])
        sos += bytes([0, 63, 0])
        out += _marker(0xDA, sos)
        out += entropy
        out += _marker(0xD9)
        return bytes(out)

    RESTART = None  # sentinel between MCU groups in the event stream
    stream: list = []
    preds = [0] * len(planes)
    for m in range(len(sched) // per_mcu):
        if restart_interval and m and m % restart_interval == 0:
            stream.append(RESTART)
            preds = [0] * len(planes)
        for ci, bi in sched[m * per_mcu:(m + 1) * per_mcu]:
            t = 0 if ci == 0 else 1
            events, preds[ci] = _block_symbols(
                comp_blocks[ci][bi], preds[ci])
            stream.append((t, events))

    dc_freq: list[dict[int, int]] = [{}, {}]
    ac_freq: list[dict[int, int]] = [{}, {}]
    for item in stream:
        if item is RESTART:
            continue
        t, events = item
        for is_dc, sym, _cat, _v in events:
            f = dc_freq[t] if is_dc else ac_freq[t]
            f[sym] = f.get(sym, 0) + 1

    n_tables = 1 if len(planes) == 1 else 2
    dc_tabs = [_canonical(_code_lengths(dc_freq[t]))
               for t in range(n_tables)]
    ac_tabs = [_canonical(_code_lengths(ac_freq[t]))
               for t in range(n_tables)]

    # headers
    out = bytearray()
    out += _marker(0xD8)                                   # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qtabs):
        out += _marker(0xDB, bytes([ti])                   # DQT, Pq=0
                       + bytes(int(x) for x in q.ravel()[_ZZ]))
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci in range(len(planes)):
        sof += bytes([ci + 1,
                      (samp[ci][0] << 4) | samp[ci][1],
                      plane_q[ci]])
    out += _marker(0xC0, sof)                              # SOF0 baseline
    for cls, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for ti, (bits, huffval, _cb) in enumerate(tabs):
            out += _marker(0xC4, bytes([(cls << 4) | ti])
                           + bytes(bits[1:]) + bytes(huffval))
    if restart_interval:
        out += _marker(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])                               # Ss, Se, Ah/Al
    out += _marker(0xDA, sos)                              # SOS

    # pass 2: the pre-computed event stream, RESTART sentinels
    # becoming byte-aligned RSTn markers
    writer = _BitWriter()
    rst = 0
    for item in stream:
        if item is RESTART:
            writer.emit_restart(rst % 8)
            rst += 1
            continue
        t, events = item
        _bits, _hv, dc_cb = dc_tabs[t]
        _bits, _hv, ac_cb = ac_tabs[t]
        for is_dc, sym, cat, v in events:
            code, l = (dc_cb if is_dc else ac_cb)[sym]
            writer.write(code, l)
            if cat:
                writer.write(_amplitude_bits(v, cat), cat)
    out += writer.flush()
    out += _marker(0xD9)                                   # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from JFIF bytes — baseline (SOF0) or
    progressive (SOF2, spectral selection + successive approximation,
    EOB runs, restart markers); 4:4:4, 4:2:0 / 4:2:2 (sampling
    factors 1–2, generic interleaved-MCU walk, chroma upsampled by
    replication), or greyscale.

    Multi-scan baseline (non-interleaved sequential) decodes through
    the same coefficient-store path as progressive. Out-of-scope
    streams (other SOFs, sampling factors >2) raise ValueError with
    the feature named — they route to PIL at the ``decode_media``
    seam, same as before.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    from .jpeg_arith import (
        DEFAULT_AC_KX,
        DEFAULT_DC_L,
        DEFAULT_DC_U,
        decode_arith_scan,
    )

    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    arithmetic = False
    arith_dc_cond: dict[int, tuple[int, int]] = {}
    arith_ac_cond: dict[int, int] = {}
    scans: list[dict] = []
    scan_comps = None
    restart_interval = 0
    data_start = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        tag = payload[pos + 1]
        pos += 2
        if tag == 0xD9:
            break
        if tag in (0x01, *range(0xD0, 0xD8)):
            continue
        ln = struct.unpack(">H", payload[pos:pos + 2])[0]
        body = payload[pos + 2:pos + ln]
        pos += ln
        if tag == 0xDB:
            at = 0
            while at < len(body):
                pq, tq = body[at] >> 4, body[at] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables out of scope")
                vals = np.frombuffer(
                    body[at + 1:at + 65], dtype=np.uint8).astype(np.int64)
                qtabs[tq] = vals[_UNZZ].reshape(8, 8)
                at += 65
        elif tag == 0xC4:
            at = 0
            while at < len(body):
                cls, ti = body[at] >> 4, body[at] & 0xF
                bits = [0] + list(body[at + 1:at + 17])
                n = sum(bits)
                huffval = list(body[at + 17:at + 17 + n])
                huff[(cls, ti)] = _codebook_from_dht(bits, huffval)
                at += 17 + n
        elif tag in (0xC0, 0xC2, 0xC9):
            prec, h, w, nf = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            progressive = tag == 0xC2
            arithmetic = tag == 0xC9
            comps = []
            for ci in range(nf):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                hh, vv = hv >> 4, hv & 0xF
                if hh not in (1, 2) or vv not in (1, 2):
                    raise ValueError(
                        f"sampling factors {hh}x{vv} out of scope "
                        "(1x1/2x1/1x2/2x2) — route to PIL at the "
                        "decode seam")
                comps.append((cid, hh, vv, tq))
            frame = (h, w, comps)
        elif tag in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                     0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"SOF 0xFF{tag:02X} out of scope "
                "(baseline SOF0 / progressive SOF2 / "
                "arithmetic-sequential SOF9 only)")
        elif tag == 0xCC:                 # DAC: arithmetic conditioning
            at = 0
            while at + 1 < len(body):
                tc, tb = body[at] >> 4, body[at] & 0xF
                v = body[at + 1]
                if tc == 0:
                    arith_dc_cond[tb] = (v & 0xF, v >> 4)   # (L, U)
                else:
                    arith_ac_cond[tb] = v                   # Kx
                at += 2
        elif tag == 0xDD:
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif tag == 0xDA:
            ns = body[0]
            scan_comps = [(body[1 + 2 * i], body[2 + 2 * i] >> 4,
                           body[2 + 2 * i] & 0xF) for i in range(ns)]
            data_start = pos
            # scan data runs to the next non-stuffed, non-RST marker
            # (arithmetic scans use the same X'FF00' byte stuffing as
            # Huffman scans — T.81 §D.1.6)
            end = pos
            while end < len(payload) - 1:
                if (payload[end] == 0xFF and payload[end + 1] != 0x00
                        and not 0xD0 <= payload[end + 1] <= 0xD7):
                    break
                end += 1
            scan_data = payload[data_start:end]
            pos = end
            scans.append({
                "comps": scan_comps,
                "ss": body[1 + 2 * ns], "se": body[2 + 2 * ns],
                "ah": body[3 + 2 * ns] >> 4,
                "al": body[3 + 2 * ns] & 0xF,
                "data": scan_data,
                # tables may be redefined between scans: snapshot
                "huff": dict(huff),
                "dri": restart_interval,
            })
        # APPn/COM and anything else: skipped via the length field

    if frame is None or scan_comps is None:
        raise ValueError("missing SOF/SOS")
    h, w, comps = frame
    if arithmetic:
        if len(scans) != 1:
            raise ValueError(
                "multi-scan arithmetic JPEG out of scope "
                "(single interleaved SOF9 scan only)")
        for _cid, _hh, _vv, _tq in comps:
            if _tq not in qtabs:
                raise ValueError(
                    f"component references undefined quant table {_tq}")
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
        sampling = {cid: (hh, vv) for cid, hh, vv, _tq in comps}
        coefs = {cid: np.zeros((mcuy * vv, mcux * hh, 64),
                               dtype=np.int64)
                 for cid, hh, vv, _tq in comps}
        dc_cond = {t: arith_dc_cond.get(t, (DEFAULT_DC_L,
                                            DEFAULT_DC_U))
                   for t in range(4)}
        ac_cond = {t: arith_ac_cond.get(t, DEFAULT_AC_KX)
                   for t in range(4)}
        decode_arith_scan(scans[0]["data"], scan_comps, sampling,
                          coefs, scans[0]["dri"], mcux, mcuy,
                          dc_cond, ac_cond)
        return _finish_planes(h, w, comps, coefs, qtabs)
    if progressive or len(scans) > 1:
        # progressive (SOF2) or multi-scan non-interleaved baseline
        # (valid T.81: one full-band scan per component): both decode
        # into per-component coefficient stores, IDCT once at the end
        for _cid, _hh, _vv, _tq in comps:
            if _tq not in qtabs:
                raise ValueError(
                    f"component references undefined quant table {_tq}")
        return _finish_planes(
            h, w, comps,
            _progressive_coefficients(h, w, comps, scans,
                                      baseline=not progressive),
            qtabs)
    # a stream may reference tables it never defined — fail with the
    # problem named instead of a KeyError mid-scan
    for _cid, _dt, _at in scan_comps:
        if (0, _dt) not in huff or (1, _at) not in huff:
            raise ValueError(
                f"scan references undefined huffman table "
                f"(dc {_dt}, ac {_at})")
    for _cid, _hh, _vv, _tq in comps:
        if _tq not in qtabs:
            raise ValueError(
                f"component references undefined quant table {_tq}")
    # generic interleaved-MCU loop: an MCU carries h×v blocks per
    # component (T.81 A.2.3); 4:4:4 degenerates to one block each.
    # Coefficients land in per-component zigzag stores; the dequant +
    # IDCT + upsample + color tail is shared with the progressive
    # path (_finish_planes), where the IDCT runs batched.
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    sampling = {cid: (hh, vv) for cid, hh, vv, _tq in comps}
    coefs = {cid: np.zeros((mcuy * vv, mcux * hh, 64), dtype=np.int64)
             for cid, hh, vv, _tq in comps}
    _decode_baseline_scan(scan_data, scan_comps, sampling, huff, coefs,
                          restart_interval, mcux, mcuy)
    return _finish_planes(h, w, comps, coefs, qtabs)


def _decode_baseline_scan(scan_data, scan_comps, sampling, huff, coefs,
                          restart_interval, mcux, mcuy) -> None:
    """Entropy-decode one interleaved baseline scan into the zigzag
    coefficient stores.

    This is the per-byte hot loop of the ``dct`` payload class, so the
    bit cursor, huffman lookup, amplitude read and EXTEND (T.81 F2.2.1)
    are fused into one loop over local ints — no per-symbol function
    calls — and nonzero coefficients accumulate as (flat index, value)
    pairs scattered into the numpy stores in one bulk assignment per
    component instead of one numpy scalar write per coefficient
    (~1.3× the previous decode_block loop on scanned-page payloads).
    Amplitude categories are ≤ 11 bits and huffman codes ≤ 16, so a
    3-byte window starting at the cursor's byte always covers a read
    (the _BitReader buffer carries 3 guard bytes past each segment).
    """
    reader = _BitReader(scan_data)          # unstuff + RST segmentation
    buf, pos, nbits = reader.buf, 0, reader.nbits
    tabs = {cid: (huff[(0, dt)], huff[(1, at)])
            for cid, dt, at in scan_comps}
    preds = {cid: 0 for cid, _dt, _at in scan_comps}
    idxs: dict[int, list] = {cid: [] for cid in preds}
    vals: dict[int, list] = {cid: [] for cid in preds}
    ncols = {cid: coefs[cid].shape[1] for cid in preds}

    mcu_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (restart_interval and mcu_idx
                    and mcu_idx % restart_interval == 0):
                reader.pos = pos
                reader.sync_restart(
                    (mcu_idx // restart_interval - 1) % 8)
                buf, pos, nbits = reader.buf, 0, reader.nbits
                for cid in preds:       # RST resets DC prediction
                    preds[cid] = 0
            for cid, _dt, _at in scan_comps:
                hh, vv = sampling[cid]
                dc_tab, ac_tab = tabs[cid]
                pred = preds[cid]
                ix = idxs[cid]
                vl = vals[cid]
                nc = ncols[cid]
                for dy in range(vv):
                    for dx in range(hh):
                        base = ((my * vv + dy) * nc
                                + mx * hh + dx) * 64
                        bi = pos >> 3
                        v16 = (((buf[bi] << 16) | (buf[bi + 1] << 8)
                                | buf[bi + 2])
                               >> (8 - (pos & 7))) & 0xFFFF
                        hit = dc_tab[v16 >> 8]
                        if hit.__class__ is list:
                            hit = hit[v16 & 0xFF]
                        if hit is None:
                            raise ValueError(
                                "invalid huffman code in scan")
                        cat = hit[0]
                        pos += hit[1]
                        # bounds BEFORE the amplitude read: a code that
                        # decoded from guard zeros can leave pos past
                        # nbits, and the 3-byte window must not index
                        # past the guard bytes
                        if pos > nbits:
                            raise EOFError("entropy stream exhausted")
                        if cat:
                            if cat > 11:      # T.81 F.1.2.1.1
                                raise ValueError(
                                    f"bad DC category {cat}")
                            bi = pos >> 3
                            chunk = ((buf[bi] << 16)
                                     | (buf[bi + 1] << 8) | buf[bi + 2])
                            bits = ((chunk >> (24 - (pos & 7) - cat))
                                    & ((1 << cat) - 1))
                            pos += cat
                            if pos > nbits:
                                raise EOFError(
                                    "entropy stream exhausted")
                            pred += (bits if bits >> (cat - 1)
                                     else bits - (1 << cat) + 1)
                        ix.append(base)
                        vl.append(pred)
                        k = 1
                        while k < 64:
                            bi = pos >> 3
                            v16 = (((buf[bi] << 16) | (buf[bi + 1] << 8)
                                    | buf[bi + 2])
                                   >> (8 - (pos & 7))) & 0xFFFF
                            hit = ac_tab[v16 >> 8]
                            if hit.__class__ is list:
                                hit = hit[v16 & 0xFF]
                            if hit is None:
                                raise ValueError(
                                    "invalid huffman code in scan")
                            sym = hit[0]
                            pos += hit[1]
                            if pos > nbits:
                                raise EOFError(
                                    "entropy stream exhausted")
                            if sym == 0x00:          # EOB
                                break
                            cat = sym & 0xF
                            if cat == 0:
                                if sym != 0xF0:
                                    raise ValueError("bad AC symbol")
                                k += 16              # ZRL
                                continue
                            k += sym >> 4
                            if k > 63:
                                raise ValueError(
                                    "AC run overflows block")
                            bi = pos >> 3
                            chunk = ((buf[bi] << 16)
                                     | (buf[bi + 1] << 8) | buf[bi + 2])
                            bits = ((chunk >> (24 - (pos & 7) - cat))
                                    & ((1 << cat) - 1))
                            pos += cat
                            if pos > nbits:
                                raise EOFError(
                                    "entropy stream exhausted")
                            ix.append(base + k)
                            vl.append(bits if bits >> (cat - 1)
                                      else bits - (1 << cat) + 1)
                            k += 1
                preds[cid] = pred
            mcu_idx += 1
    for cid in preds:
        if idxs[cid]:
            coefs[cid].reshape(-1)[
                np.array(idxs[cid], dtype=np.int64)
            ] = np.array(vals[cid], dtype=np.int64)


# ---------------------------------------------------------------------------
# Progressive mode (SOF2): T.81 Annex G, huffman variant
# ---------------------------------------------------------------------------
#
# A progressive frame splits the coefficient data across scans two
# ways: SPECTRAL SELECTION (a scan carries only zigzag band Ss..Se;
# DC and AC bands must be separate scans) and SUCCESSIVE APPROXIMATION
# (a first scan carries the point-transformed coefficients >> Al, and
# refinement scans each append one lower bit, Ah = Al+1 of the prior
# pass). Entropy decoding therefore targets a per-component
# COEFFICIENT store, and the IDCT runs once at the end.


def _comp_block_dims(h: int, w: int, hh: int, vv: int,
                     hmax: int, vmax: int) -> tuple[int, int]:
    """True (block rows, block cols) of one component — T.81 A.1.1:
    ceil of the component's sample dims over 8. Non-interleaved scans
    cover exactly these blocks; interleaved scans also code the
    MCU-padding blocks beyond them."""
    cw = -(-(w * hh) // hmax)
    ch = -(-(h * vv) // vmax)
    return -(-ch // 8), -(-cw // 8)


def _progressive_coefficients(h: int, w: int, comps: list,
                              scans: list[dict],
                              baseline: bool = False) -> dict:
    """Run every scan's entropy data into per-component zigzag
    coefficient grids ``{cid: (grid_h, grid_w, 64) int64}`` (grids are
    MCU-padded so interleaved DC scans fit).

    ``baseline=True`` decodes multi-scan *sequential* files (T.81
    non-interleaved baseline: each scan carries complete DC+AC blocks
    for its components) through the same store-then-IDCT path."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    samp = {cid: (hh, vv) for cid, hh, vv, _tq in comps}
    coefs = {cid: np.zeros((mcuy * vv, mcux * hh, 64), dtype=np.int64)
             for cid, hh, vv, _tq in comps}
    bdims = {cid: _comp_block_dims(h, w, hh, vv, hmax, vmax)
             for cid, hh, vv, _tq in comps}

    for scan in scans:
        sc = scan["comps"]
        ss, se = scan["ss"], scan["se"]
        ah, al = scan["ah"], scan["al"]
        huff, dri = scan["huff"], scan["dri"]
        if baseline:
            for _cid, dt, at in sc:
                if (0, dt) not in huff or (1, at) not in huff:
                    raise ValueError(
                        f"scan references undefined huffman table "
                        f"(dc {dt}, ac {at})")
        elif ss == 0 and se != 0:
            raise ValueError("progressive scan mixes DC and AC bands")
        elif ss > 0 and len(sc) != 1:
            raise ValueError("progressive AC scan must be "
                             "single-component (T.81 B.2.3)")
        elif ss == 0 and ah == 0:
            for _cid, dt, _at in sc:
                if (0, dt) not in huff:
                    raise ValueError(
                        f"scan references undefined DC table {dt}")
        if not baseline and ss > 0:
            at0 = sc[0][2]
            if (1, at0) not in huff:
                raise ValueError(
                    f"scan references undefined AC table {at0}")
        reader = _BitReader(scan["data"])
        preds = {cid: 0 for cid, _dt, _at in sc}
        eobrun = 0

        def full_block(zz, cid, dt, at):
            """Complete baseline block: DC diff + AC run-lengths."""
            cat = _decode_symbol(reader, huff[(0, dt)])
            preds[cid] += _extend(reader.read_bits(cat), cat)
            zz[0] = preds[cid]
            k = 1
            while k < 64:
                sym = _decode_symbol(reader, huff[(1, at)])
                if sym == 0x00:                       # EOB
                    break
                r, s = sym >> 4, sym & 0xF
                if s == 0:
                    if r != 15:
                        raise ValueError("bad AC symbol")
                    k += 16                            # ZRL
                    continue
                k += r
                if k > 63:
                    raise ValueError("AC run overflows block")
                zz[k] = _extend(reader.read_bits(s), s)
                k += 1

        def dc_first(zz, cid, dt):
            cat = _decode_symbol(reader, huff[(0, dt)])
            preds[cid] += _extend(reader.read_bits(cat), cat)
            zz[0] = preds[cid] << al

        def dc_refine(zz):
            if reader.read_bit():
                # two's complement: the low Al+ bits of the stored
                # value are zero, so OR appends the bit for either sign
                zz[0] |= 1 << al

        def ac_first(zz, at):
            nonlocal eobrun
            if eobrun > 0:          # inside an end-of-band run
                eobrun -= 1
                return
            tab = huff[(1, at)]
            k = ss
            while k <= se:
                sym = _decode_symbol(reader, tab)
                r, s = sym >> 4, sym & 0xF
                if s == 0:
                    if r == 15:     # ZRL: 16 zero coefficients
                        k += 16
                        continue
                    eobrun = (1 << r) - 1   # current block is the 1st
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                k += r
                if k > se:
                    raise ValueError("AC run overflows band")
                zz[k] = _extend(reader.read_bits(s), s) << al
                k += 1

        def ac_refine(zz, at):
            nonlocal eobrun
            p1, m1 = 1 << al, -1 << al
            tab = huff[(1, at)]
            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = _decode_symbol(reader, tab)
                    r, s = sym >> 4, sym & 0xF
                    val = 0
                    if s == 0:
                        if r < 15:
                            # run counts current block too: consume it
                            # via the correction tail below
                            eobrun = (1 << r)
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        # r == 15, s == 0: ZRL — skip 16 zero-history
                        # positions (corrections read in passing)
                    else:
                        if s != 1:
                            raise ValueError(
                                "refinement size category != 1")
                        val = p1 if reader.read_bit() else m1
                    while k <= se:
                        if zz[k] != 0:
                            if reader.read_bit() and not (zz[k] & p1):
                                zz[k] += p1 if zz[k] >= 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        zz[k] = val
                    k += 1
            if eobrun > 0:
                # end-of-band: correction bits only for the rest of
                # this block's band
                while k <= se:
                    if zz[k] != 0:
                        if reader.read_bit() and not (zz[k] & p1):
                            zz[k] += p1 if zz[k] >= 0 else m1
                    k += 1
                eobrun -= 1

        interleaved = len(sc) > 1
        if interleaved:
            units = mcuy * mcux
        else:
            bh, bw = bdims[sc[0][0]]
            units = bh * bw
        rst_idx = 0
        for u in range(units):
            if dri and u and u % dri == 0:
                reader.sync_restart(rst_idx % 8)
                rst_idx += 1
                preds = {cid: 0 for cid, _dt, _at in sc}
                eobrun = 0
            if interleaved:
                my, mx = divmod(u, mcux)
                for cid, dt, at in sc:
                    hh, vv = samp[cid]
                    for dy in range(vv):
                        for dx in range(hh):
                            zz = coefs[cid][my * vv + dy, mx * hh + dx]
                            if baseline:
                                full_block(zz, cid, dt, at)
                            elif ah == 0:
                                dc_first(zz, cid, dt)
                            else:
                                dc_refine(zz)
            else:
                cid, dt, at = sc[0]
                bh, bw = bdims[cid]
                by, bx = divmod(u, bw)
                zz = coefs[cid][by, bx]
                if baseline:
                    full_block(zz, cid, dt, at)
                elif ss == 0 and ah == 0:
                    dc_first(zz, cid, dt)
                elif ss == 0:
                    dc_refine(zz)
                elif ah == 0:
                    ac_first(zz, at)
                else:
                    ac_refine(zz, at)
    return coefs


def _finish_planes(h: int, w: int, comps: list, coefs: dict,
                   qtabs: dict) -> np.ndarray:
    """Dequantize + IDCT the accumulated coefficient grids and
    assemble the final image (same upsample/color tail as baseline)."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out_planes = []
    for cid, hh, vv, tq in comps:
        q = qtabs[tq]
        grid = coefs[cid]
        gh, gw = grid.shape[:2]
        # batched IDCT: one stacked matmul pair over every block —
        # same per-block dgemm as idct2, so bit-identical to the
        # block-at-a-time loop (guarded by test_idct_batch_bit_exact).
        # De-zigzag by GATHERING to natural order (coef[..., j] =
        # grid[..., UNZZ[j]]) instead of scattering into a fresh float
        # grid: one pass, no second 15 MB zeros allocation — ~2x on a
        # cold full-page plane. Dequantization runs in int64 and
        # converts after: |coef·q| < 2^18, exact in float64 either
        # way, so the IDCT input is bit-identical to the float path.
        coef = (grid[:, :, _UNZZ].reshape(gh, gw, 8, 8)
                * q).astype(np.float64)
        blocks = np.matmul(np.matmul(_C.T, coef), _C) + 128.0
        plane = blocks.transpose(0, 2, 1, 3).reshape(gh * 8, gw * 8)
        if hh != hmax or vv != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vv, axis=0),
                              hmax // hh, axis=1)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        y = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    return _ycbcr_to_rgb(np.stack(out_planes, axis=-1))


# ---------------------------------------------------------------------------
# Progressive encoder (SOF2) — the round-trip twin of the decoder above
# ---------------------------------------------------------------------------
#
# Event model per scan: ("s", table_key, symbol) huffman symbols,
# ("b", value, nbits) raw appended bits, ("R",) restart boundaries.
# Two passes per scan — count symbols, derive canonical tables, emit —
# exactly like the baseline encoder, but per scan since each scan may
# define its own tables.


def _dc_first_events(comp_blocks, sched, per_mcu, al, dri):
    events: list = []
    preds = [0] * 16
    for m in range(len(sched) // per_mcu):
        if dri and m and m % dri == 0:
            events.append(("R",))
            preds = [0] * 16
        for ci, bi in sched[m * per_mcu:(m + 1) * per_mcu]:
            v = int(comp_blocks[ci][bi][0]) >> al  # DC point transform
            diff = v - preds[ci]
            preds[ci] = v
            cat = _category(diff)
            events.append(("s", (0, 0 if ci == 0 else 1), cat))
            if cat:
                events.append(("b", _amplitude_bits(diff, cat), cat))
    return events


def _dc_refine_events(comp_blocks, sched, per_mcu, al, dri):
    events: list = []
    for m in range(len(sched) // per_mcu):
        if dri and m and m % dri == 0:
            events.append(("R",))
        for ci, bi in sched[m * per_mcu:(m + 1) * per_mcu]:
            events.append(
                ("b", (int(comp_blocks[ci][bi][0]) >> al) & 1, 1))
    return events


def _ac_first_events(blocks, t, al, dri):
    events: list = []
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun == 0:
            return
        nb = eobrun.bit_length() - 1
        events.append(("s", (1, t), nb << 4))
        if nb:
            events.append(("b", eobrun - (1 << nb), nb))
        eobrun = 0

    for i, zz in enumerate(blocks):
        if dri and i and i % dri == 0:
            flush()
            events.append(("R",))
        r = 0
        for k in range(1, 64):
            v = int(zz[k])
            av = abs(v) >> al      # AC point transform: magnitude
            if av == 0:
                r += 1
                continue
            flush()
            while r > 15:
                events.append(("s", (1, t), 0xF0))     # ZRL
                r -= 16
            sv = av if v > 0 else -av
            cat = _category(sv)
            events.append(("s", (1, t), (r << 4) | cat))
            events.append(("b", _amplitude_bits(sv, cat), cat))
            r = 0
        if r:                      # band ends in zeros → EOB run
            eobrun += 1
            if eobrun == 0x7FFF:   # EOB14 is the largest encodable run
                flush()
    flush()
    return events


def _ac_refine_events(blocks, t, al, dri):
    events: list = []
    eobrun = 0
    br: list = []                  # correction bits riding the EOB run

    def flush():
        nonlocal eobrun
        if eobrun == 0:
            return
        nb = eobrun.bit_length() - 1
        events.append(("s", (1, t), nb << 4))
        if nb:
            events.append(("b", eobrun - (1 << nb), nb))
        for bit in br:
            events.append(("b", bit, 1))
        br.clear()
        eobrun = 0

    for i, zz in enumerate(blocks):
        if dri and i and i % dri == 0:
            flush()
            events.append(("R",))
        vals = [int(zz[k]) for k in range(64)]
        absv = [abs(v) >> al for v in vals]
        eob = 0                    # last newly-significant position
        for k in range(1, 64):
            if absv[k] == 1:
                eob = k
        r = 0
        brblk: list = []           # corrections since the last symbol
        for k in range(1, 64):
            temp = absv[k]
            if temp == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                flush()
                events.append(("s", (1, t), 0xF0))
                r -= 16
                events.extend(("b", bit, 1) for bit in brblk)
                brblk = []
            if temp > 1:           # history-nonzero: correction bit
                brblk.append(temp & 1)
                continue
            flush()                # newly significant: (r, 1) + sign
            events.append(("s", (1, t), (r << 4) | 1))
            events.append(("b", 1 if vals[k] > 0 else 0, 1))
            r = 0
            events.extend(("b", bit, 1) for bit in brblk)
            brblk = []
        if r > 0 or brblk:         # tail rides the EOB run
            eobrun += 1
            br.extend(brblk)
            if eobrun == 0x7FFF:
                flush()
    flush()
    return events


def _emit_scan(out: bytearray, events: list, sos_comps: list,
               ss: int, se: int, ah: int, al: int) -> None:
    """DHT (from this scan's symbol frequencies) + SOS + entropy data."""
    freqs: dict = {}
    for ev in events:
        if ev[0] == "s":
            freqs.setdefault(ev[1], {})
            freqs[ev[1]][ev[2]] = freqs[ev[1]].get(ev[2], 0) + 1
    tabs = {key: _canonical(_code_lengths(f))
            for key, f in freqs.items()}
    for (cls, ti), (bits, huffval, _cb) in sorted(tabs.items()):
        out += _marker(0xC4, bytes([(cls << 4) | ti])
                       + bytes(bits[1:]) + bytes(huffval))
    sos = bytes([len(sos_comps)])
    for cid, dt, at in sos_comps:
        sos += bytes([cid, (dt << 4) | at])
    sos += bytes([ss, se, (ah << 4) | al])
    out += _marker(0xDA, sos)
    writer = _BitWriter()
    rst = 0
    for ev in events:
        if ev[0] == "R":
            writer.emit_restart(rst % 8)
            rst += 1
        elif ev[0] == "s":
            code, length = tabs[ev[1]][2][ev[2]]
            writer.write(code, length)
        else:
            writer.write(ev[1], ev[2])
    out += writer.flush()


def _comp_raster_blocks(comp_blocks, planes, samp, h, w, ci):
    """The component's TRUE block grid in raster order (T.81 A.1.1) —
    strips the MCU-padding blocks a padded plane carries."""
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    hh, vv = samp[ci]
    bh, bw = _comp_block_dims(h, w, hh, vv, hmax, vmax)
    pbw = -(-planes[ci].shape[1] // 8)
    blocks = comp_blocks[ci]
    return [blocks[by * pbw + bx]
            for by in range(bh) for bx in range(bw)]


def _encode_baseline_multiscan(comp_blocks, planes, samp, qtabs,
                               plane_q, h, w, dri) -> bytes:
    """SOF0 with one full-band scan per component (T.81
    non-interleaved sequential) — the multi-scan baseline layout some
    scanners emit; per-scan data-derived huffman tables."""
    ncomp = len(planes)
    out = bytearray()
    out += _marker(0xD8)
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qtabs):
        out += _marker(0xDB, bytes([ti])
                       + bytes(int(x) for x in q.ravel()[_ZZ]))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1],
                      plane_q[ci]])
    out += _marker(0xC0, sof)                              # SOF0
    if dri:
        out += _marker(0xDD, struct.pack(">H", dri))
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        events: list = []
        pred = 0
        for i, zz in enumerate(_comp_raster_blocks(
                comp_blocks, planes, samp, h, w, ci)):
            if dri and i and i % dri == 0:   # MCU = 1 block here
                events.append(("R",))
                pred = 0
            blk, pred = _block_symbols(zz, pred)
            for is_dc, sym, cat, v in blk:
                events.append(("s", (0 if is_dc else 1, t), sym))
                if cat:
                    events.append(("b", _amplitude_bits(v, cat), cat))
        _emit_scan(out, events, [(ci + 1, t, t)], 0, 63, 0, 0)
    out += _marker(0xD9)                                   # EOI
    return bytes(out)


def _encode_progressive(comp_blocks, planes, samp, qtabs, plane_q,
                        h, w, dri, pad420) -> bytes:
    """SOF2 emission with the standard web scan script (DC first →
    per-component AC first → per-component AC refine → DC refine),
    successive approximation depth 1. ``comp_blocks`` are in raster
    order; interleaved scans index them through the MCU schedule."""
    ncomp = len(planes)
    if pad420:
        h16, w16 = pad420
        ybw, cbw = w16 // 8, w16 // 16
        sched = []
        for my in range(h16 // 16):
            for mx in range(w16 // 16):
                sched.extend((0, (2 * my + dy) * ybw + (2 * mx + dx))
                             for dy in (0, 1) for dx in (0, 1))
                sched.append((1, my * cbw + mx))
                sched.append((2, my * cbw + mx))
        per_mcu = 6
    else:
        sched = [(ci, bi) for bi in range(len(comp_blocks[0]))
                 for ci in range(ncomp)]
        per_mcu = ncomp
    def comp_ac_blocks(ci):
        # non-interleaved scans cover the component's TRUE block grid
        # (420 Y can have one extra MCU-padding block per row)
        return _comp_raster_blocks(comp_blocks, planes, samp, h, w, ci)

    out = bytearray()
    out += _marker(0xD8)
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qtabs):
        out += _marker(0xDB, bytes([ti])
                       + bytes(int(x) for x in q.ravel()[_ZZ]))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1],
                      plane_q[ci]])
    out += _marker(0xC2, sof)                              # SOF2
    if dri:
        out += _marker(0xDD, struct.pack(">H", dri))
    AL = 1
    dc_comps = [(ci + 1, 0 if ci == 0 else 1, 0)
                for ci in range(ncomp)]
    _emit_scan(out, _dc_first_events(comp_blocks, sched, per_mcu,
                                     AL, dri),
               dc_comps, 0, 0, 0, AL)
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        _emit_scan(out, _ac_first_events(comp_ac_blocks(ci), t,
                                         AL, dri),
                   [(ci + 1, 0, t)], 1, 63, 0, AL)
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        _emit_scan(out, _ac_refine_events(comp_ac_blocks(ci), t,
                                          AL - 1, dri),
                   [(ci + 1, 0, t)], 1, 63, AL, AL - 1)
    _emit_scan(out, _dc_refine_events(comp_blocks, sched, per_mcu,
                                      AL - 1, dri),
               dc_comps, 0, 0, AL, AL - 1)
    out += _marker(0xD9)                                   # EOI
    return bytes(out)

"""Baseline JPEG codec, stdlib + numpy only.

Closes the last image seam: round 2 shipped real PNG/BMP/WAV decoders
(``codecs.py``) and left JPEG as a PIL seam on the claim that
entropy-coded formats have "no honest stdlib decode". This module
retires that claim for baseline JPEG: sequential DCT, 8-bit, YCbCr
4:4:4, one huffman-coded scan — a complete, self-contained JFIF
encoder/decoder pair (ITU-T T.81 baseline process).

Design rule: **no memorized spec constants are load-bearing.**

* the zigzag order is *generated* (diagonal walk), not transcribed;
* huffman tables are *derived from the data* (optimal per image,
  emitted in DHT and read back by any decoder — Annex K's example
  tables are never needed);
* quantization tables are parameters carried in DQT — any table is
  valid by construction, so their exact values only tune quality;
* the DCT basis is computed from its definition (orthonormal cosine
  matrix), verified by an inversion test, not copied.

Scope (raise with a clear message outside it): baseline SOF0, 8-bit,
sampling factors 1–2 per axis — 4:4:4, the dominant real-world 4:2:0
(generic interleaved-MCU walk; encoder emits it via
``subsampling="420"``: quarter-resolution box-mean chroma,
4 Y + Cb + Cr per MCU), 4:2:2, or single-component greyscale. No
restart markers, no progressive/arithmetic modes, single scan. The
encoder only emits in-scope streams, so decode(encode(x)) always
works; out-of-scope files route to PIL at the same seam as before.

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
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        if self.pos >= len(self.data):
            raise EOFError("entropy stream exhausted")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data):
                raise EOFError("truncated after 0xFF")
            marker = self.data[self.pos]
            self.pos += 1
            if marker != 0x00:
                raise ValueError(
                    f"unexpected marker 0xFF{marker:02X} mid-entropy "
                    "(RSTn only valid at declared MCU boundaries)")
        # keep only the live bits before shifting — without the mask
        # the accumulator grows into an unbounded bignum and decoding
        # a large scan turns O(n²) in scan length
        self.acc = ((self.acc & ((1 << self.n) - 1)) << 8) | byte
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def sync_restart(self, expect: int) -> None:
        """Consume an RSTn marker at an MCU-restart boundary: drop
        the partial byte (encoders pad with 1-bits), then expect
        ``0xFF 0xD<expect>``."""
        self.acc = 0
        self.n = 0
        if (self.pos + 1 >= len(self.data)
                or self.data[self.pos] != 0xFF
                or self.data[self.pos + 1] != 0xD0 + expect):
            got = self.data[self.pos:self.pos + 2].hex()
            raise ValueError(
                f"expected restart marker RST{expect}, got 0x{got}")
        self.pos += 2

    def read_bits(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.read_bit()
        return v


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
    """Decoder side: (code, len) -> symbol map from DHT payload."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for l in range(1, _MAX_CODE_LEN + 1):
        for _ in range(bits[l]):
            table[(code, l)] = huffval[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _decode_symbol(reader: _BitReader, table) -> int:
    code, l = 0, 0
    while l <= _MAX_CODE_LEN:
        code = (code << 1) | reader.read_bit()
        l += 1
        if (code, l) in table:
            return table[(code, l)]
    raise ValueError("invalid huffman code in scan")


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
                restart_interval: int = 0) -> bytes:
    """Baseline JFIF bytes for an (h, w, 3) uint8 RGB array (or
    (h, w) greyscale). One scan, data-derived huffman tables.

    ``subsampling="420"`` (color only) emits the dominant real-world
    chroma layout: Y at 2x2 sampling, Cb/Cr quarter-resolution (2x2
    box mean), MCU-interleaved 4 Y + Cb + Cr.

    ``restart_interval=k`` emits a DRI marker and an RSTn every ``k``
    MCUs (DC predictors reset, stream re-byte-aligned) — the
    error-resilience feature virtually every camera writes.
    """
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
    """(h, w, 3) uint8 RGB from baseline JFIF bytes — 4:4:4, 4:2:0 /
    4:2:2 (sampling factors 1–2, generic interleaved-MCU walk, chroma
    upsampled by replication), or greyscale.

    Out-of-scope streams (progressive, multi-scan, sampling factors
    >2, restart-marker) raise ValueError with the feature named —
    they route to PIL at the ``decode_media`` seam, same as before.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
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
        elif tag == 0xC0:
            prec, h, w, nf = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit baseline supported")
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
        elif tag in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                     0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline SOF 0xFF{tag:02X} out of scope")
        elif tag == 0xDD:
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif tag == 0xDA:
            if scan_comps is not None:
                # a second SOS is valid T.81 (non-interleaved baseline)
                # but out of scope here — overwriting the first scan
                # would silently decode garbage from np.empty planes
                raise ValueError(
                    "multi-scan baseline out of scope — route to PIL "
                    "at the decode seam")
            ns = body[0]
            scan_comps = [(body[1 + 2 * i], body[2 + 2 * i] >> 4,
                           body[2 + 2 * i] & 0xF) for i in range(ns)]
            data_start = pos
            # scan data runs to the next non-stuffed, non-RST marker
            end = pos
            while end < len(payload) - 1:
                if (payload[end] == 0xFF and payload[end + 1] != 0x00
                        and not 0xD0 <= payload[end + 1] <= 0xD7):
                    break
                end += 1
            scan_data = payload[data_start:end]
            pos = end
        # APPn/COM and anything else: skipped via the length field

    if frame is None or scan_comps is None:
        raise ValueError("missing SOF0/SOS")
    h, w, comps = frame
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
    # component (T.81 A.2.3); 4:4:4 degenerates to one block each
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    sampling = {cid: (hh, vv) for cid, hh, vv, _tq in comps}
    comp_q = {cid: tq for cid, _hh, _vv, tq in comps}
    reader = _BitReader(scan_data)
    planes = {cid: np.empty((mcuy * 8 * vv, mcux * 8 * hh))
              for cid, hh, vv, _tq in comps}
    preds = {cid: 0 for cid, *_ in comps}

    def decode_block(cid: int, dt: int, at: int) -> np.ndarray:
        dc_tab, ac_tab = huff[(0, dt)], huff[(1, at)]
        zz = np.zeros(64, dtype=np.int64)
        cat = _decode_symbol(reader, dc_tab)
        diff = _extend(reader.read_bits(cat), cat)
        preds[cid] += diff
        zz[0] = preds[cid]
        k = 1
        while k < 64:
            sym = _decode_symbol(reader, ac_tab)
            if sym == 0x00:                       # EOB
                break
            run, cat = sym >> 4, sym & 0xF
            if cat == 0:
                if run != 15:
                    raise ValueError("bad AC symbol")
                k += 16                            # ZRL
                continue
            k += run
            if k > 63:
                raise ValueError("AC run overflows block")
            zz[k] = _extend(reader.read_bits(cat), cat)
            k += 1
        coef = np.zeros(64)
        coef[_ZZ] = zz
        return idct2(coef.reshape(8, 8) * qtabs[comp_q[cid]]) + 128.0

    mcu_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (restart_interval and mcu_idx
                    and mcu_idx % restart_interval == 0):
                reader.sync_restart(
                    (mcu_idx // restart_interval - 1) % 8)
                for cid in preds:       # RST resets DC prediction
                    preds[cid] = 0
            for cid, dt, at in scan_comps:
                hh, vv = sampling[cid]
                for dy in range(vv):
                    for dx in range(hh):
                        block = decode_block(cid, dt, at)
                        y0 = (my * vv + dy) * 8
                        x0 = (mx * hh + dx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = block
            mcu_idx += 1
    out_planes = []
    for cid, hh, vv, _tq in comps:
        p = planes[cid]
        if hh != hmax or vv != vmax:
            # chroma upsample by sample replication
            p = np.repeat(np.repeat(p, vmax // vv, axis=0),
                          hmax // hh, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        y = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    return _ycbcr_to_rgb(np.stack(out_planes, axis=-1))

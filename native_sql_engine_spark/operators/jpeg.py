"""Baseline JPEG (ITU-T T.81 / JFIF) codec — pure numpy, no codec libraries.

De-stubs the most common real-corpus image format behind
``multimodal.decode_image`` (the reference's arrow-data-source reads media
blobs as opaque binaries and leaves decoding to the application; SURVEY §2
scopes decode as a Pandas-UDF kernel).  Scope:

* **Decoder** (the deliverable): baseline sequential (SOF0) AND progressive
  (SOF2, spectral selection + successive approximation, T.81 Annex G) DCT,
  8-bit samples, 1 or 3 components, arbitrary 1–2 sampling factors
  (4:4:4 / 4:2:2 / 4:2:0), restart intervals, Huffman tables read from the
  file's DHT segments.  Arithmetic coding, 12-bit, lossless and
  hierarchical variants raise ``NotImplementedError`` — honestly gated,
  not faked.
* **Encoders** (test/synthesis harness): matching baseline and progressive
  writers used to synthesize corpora with closed-form decodes and to
  property-test the decoder round-trips.  Not production encoders.

Execution shape: both run inside Arrow-batched ``mapInPandas`` kernels
(operators/multimodal.py).  Entropy decoding is inherently serial per image,
so at 100 TB the parallelism axis is rows-per-partition, never intra-image;
all pixel-domain math (dequant, IDCT, upsample, color convert) is vectorized
numpy over whole blocks.
"""

from __future__ import annotations

import struct

import numpy as np

# -- shared constants ------------------------------------------------------

#: raster index of each zigzag position (T.81 Figure A.6)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Huffman tables in DHT form (bits[1..16], values) — T.81 Annex K.3 typical
# tables.  Correctness does not hinge on these matching the spec byte-for-
# byte: the encoder WRITES them into the file and the decoder READS whatever
# DHT carries, so any valid prefix code round-trips; spec tables are used so
# the output is what other decoders expect.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

#: flat quantization table (DC step 8 makes constant blocks decode EXACTLY:
#: DC = 8·(v−128) quantizes losslessly, ACs of a constant block are 0)
FLAT_Q = np.array([8] + [1] * 63, dtype=np.uint16)

# Progressive AC table: the Annex K baseline tables lack the EOBn symbols
# (r<<4 | 0 for r in 1..14) progressive scans emit, so the progressive
# encoder writes this complete 176-symbol table instead — every (run, size)
# with size ≤ 10, all at 9 bits (canonical, max code 175 ≠ all-ones).  Real
# progressive encoders optimize per-scan tables; the decoder reads whatever
# DHT carries either way.
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = [(r << 4) | s for r in range(16) for s in range(11)]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix A: forward C = A·X·Aᵀ, inverse
    X = Aᵀ·C·A."""
    n = np.arange(8)
    a = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    a[0] *= np.sqrt(1 / 8)
    a[1:] *= np.sqrt(2 / 8)
    return a


_A = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) by T.81 Annex C canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


#: root-table width for the one-peek Huffman fast path (T.81 codes are
#: MSB-first; codes ≤ _ROOT bits resolve in a single lookup)
_ROOT = 10


class _HuffTable:
    """Decode table: a (length, code) → symbol dict plus a DEFLATE-style
    root lookup filled by prefix (entry = (symbol, nb_bits) or None for
    codes longer than the root)."""

    __slots__ = ("lookup", "fast")

    def __init__(self, lookup: dict):
        self.lookup = lookup
        fast: list = [None] * (1 << _ROOT)
        for (ln, code), sym in lookup.items():
            if ln <= _ROOT:
                base = code << (_ROOT - ln)
                for i in range(base, base + (1 << (_ROOT - ln))):
                    fast[i] = (sym, ln)
        self.fast = fast


def _decode_table(bits: list[int], vals: list[int]) -> "_HuffTable":
    """(length, code) → symbol, with the one-peek root table."""
    return _HuffTable(
        {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}
    )


# -- bit I/O ---------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self._acc, self._n = 0, 0

    def flush(self) -> bytes:
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)  # pad with 1s
        return bytes(self.out)

    def pad_and_mark(self, marker_byte: int) -> None:
        """Byte-align (1-padding) and emit a raw restart marker (unstuffed)."""
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)
        self.out += bytes([0xFF, marker_byte])


class _BitReader:
    """Chunked MSB-first reader over an entropy-coded segment.  The fill
    loop un-stuffs FF 00 and STOPS (without consuming) at any real marker,
    so buffered bits never extend past a restart boundary — which is what
    keeps expect_restart's pad-bit drop (< 8 buffered bits there) sound."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def _fill(self, need: int, for_read: bool) -> None:
        data = self.data
        n = len(data)
        while self._n < need:
            if self.pos >= n:
                if for_read:
                    raise ValueError("truncated entropy-coded segment")
                return
            b = data[self.pos]
            if b == 0xFF:
                if self.pos + 1 < n and data[self.pos + 1] == 0x00:
                    self.pos += 2  # stuffed byte
                else:
                    if for_read:
                        raise ValueError("unexpected marker inside scan")
                    return  # peek: a marker ends the entropy bits
            else:
                self.pos += 1
            self._acc = (self._acc << 8) | b
            self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill(1, True)
        self._n -= 1
        v = (self._acc >> self._n) & 1
        self._acc &= (1 << self._n) - 1
        return v

    def expect_restart(self, n: int) -> None:
        """Consume the byte-aligned RSTn marker between restart intervals
        (T.81 E.1.4) and discard any partial padding bits before it."""
        self._n = 0  # drop pad bits: restart markers are byte-aligned
        self._acc = 0
        if self.pos + 1 >= len(self.data):
            raise ValueError("truncated scan: missing restart marker")
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + (n & 7):
            raise ValueError(
                f"expected RST{n & 7} at scan offset {self.pos}, found "
                f"{self.data[self.pos:self.pos + 2].hex()}"
            )
        self.pos += 2

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self._n < n:
            self._fill(n, True)
        self._n -= n
        v = (self._acc >> self._n) & ((1 << n) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def peek_bits(self, n: int) -> int:
        """Next n bits MSB-first without consuming; zero-padded when the
        segment ends (a marker or EOF) before n bits exist."""
        if self._n < n:
            self._fill(n, False)
        if self._n >= n:
            return (self._acc >> (self._n - n)) & ((1 << n) - 1)
        return (self._acc << (n - self._n)) & ((1 << n) - 1)

    def read_symbol(self, table) -> int:
        fast = getattr(table, "fast", None)
        if fast is not None:
            entry = fast[self.peek_bits(_ROOT)]
            if entry is not None:
                self.read_bits(entry[1])
                return entry[0]
            lookup = table.lookup
        else:
            lookup = table  # plain dict (test fixtures)
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size` magnitude bits to a signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


# -- encoder ---------------------------------------------------------------


def _encode_blocks(
    plane: np.ndarray, q: np.ndarray, bw: _BitWriter, dc_codes, ac_codes, pred: int
) -> int:
    """Forward-DCT, quantize and Huffman-encode every 8×8 block of a padded
    single-component plane in raster order.  Returns the new DC predictor."""
    h, w = plane.shape
    qz = q.astype(np.float64)[ZIGZAG.argsort()].reshape(8, 8)  # raster-order q
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            blk = plane[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
            # orthonormal 2-D DCT == T.81 A.3.3 scaling (constant block v−128
            # yields F(0,0) = 8·(v−128))
            coef = _A @ blk @ _A.T
            zz = np.round(coef / qz).astype(np.int64).ravel()[ZIGZAG]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            s = _category(diff)
            code, ln = dc_codes[s]
            bw.write(code, ln)
            if s:
                bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for i in range(1, 64):
                if i > last_nz:
                    break
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                s = _category(v)
                if s > 10:
                    raise ValueError(
                        f"AC coefficient {v} needs category {s} > 10 (not in "
                        "the standard AC tables) — use a larger quantization "
                        "step for the AC positions"
                    )
                code, ln = ac_codes[(run << 4) | s]
                bw.write(code, ln)
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz < 63:
                code, ln = ac_codes[0x00]  # EOB
                bw.write(code, ln)
    return pred


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate to multiples of (mh, mw)."""
    h, w = plane.shape
    ph = (-h) % mh
    pw = (-w) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dht_payload(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)


def encode_gray(
    img: np.ndarray, q: np.ndarray = FLAT_Q, restart_interval: int = 0
) -> bytes:
    """Baseline-encode an 8-bit grayscale image (single component, 4:4:4).
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker (with DC
    predictor reset) every that-many MCUs, like camera JPEGs do."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    dc = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    bw = _BitWriter()
    padded = _pad_to(img, 8, 8)
    pred, mcu, rst = 0, 0, 0
    for by in range(0, padded.shape[0], 8):
        for bx in range(0, padded.shape[1], 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.pad_and_mark(0xD0 + rst)
                rst = (rst + 1) & 7
                pred = 0
            mcu += 1
            pred = _encode_blocks(
                padded[by : by + 8, bx : bx + 8], q, bw, dc, ac, pred
            )
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))  # DQT slot 0
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))  # SOF0
    out += _seg(0xC4, _dht_payload(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    out += _seg(0xC4, _dht_payload(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_ycbcr420(
    img: np.ndarray, q: np.ndarray = FLAT_Q, subsample: str = "420"
) -> bytes:
    """Baseline-encode an 8-bit RGB image as YCbCr with 4:2:0 (2×2 luma
    blocks + one Cb + one Cr per MCU) or 4:2:2 (2×1 luma blocks) chroma
    subsampling, box-averaged."""
    if subsample not in ("420", "422"):
        raise ValueError("subsample must be '420' or '422'")
    sv = 2 if subsample == "420" else 1  # vertical luma factor
    mcu_h, mcu_w = 8 * sv, 16
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    yp = _pad_to(np.clip(np.round(y), 0, 255).astype(np.uint8), mcu_h, mcu_w)
    cbp = _pad_to(np.clip(np.round(cb), 0, 255).astype(np.uint8), mcu_h, mcu_w)
    crp = _pad_to(np.clip(np.round(cr), 0, 255).astype(np.uint8), mcu_h, mcu_w)

    # box average then round — the common subsampler (2×2 for 420, 1×2 for 422)
    def sub(p: np.ndarray) -> np.ndarray:
        ph, pw = p.shape
        q4 = (
            p.reshape(ph // sv, sv, pw // 2, 2).astype(np.float64).mean(axis=(1, 3))
        )
        return np.clip(np.round(q4), 0, 255).astype(np.uint8)

    cbs, crs = sub(cbp), sub(crp)
    dcl = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    acl = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dcc = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    acc = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    bw = _BitWriter()
    qz = q.astype(np.float64)
    preds = [0, 0, 0]
    mh, mw = yp.shape[0] // mcu_h, yp.shape[1] // mcu_w
    for my in range(mh):
        for mx in range(mw):
            for dy in range(sv):
                for dx in range(2):
                    blk = yp[
                        my * mcu_h + dy * 8 : my * mcu_h + dy * 8 + 8,
                        mx * mcu_w + dx * 8 : mx * mcu_w + dx * 8 + 8,
                    ]
                    preds[0] = _encode_blocks(blk, qz, bw, dcl, acl, preds[0])
            cbb = cbs[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
            preds[1] = _encode_blocks(cbb, qz, bw, dcc, acc, preds[1])
            crb = crs[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
            preds[2] = _encode_blocks(crb, qz, bw, dcc, acc, preds[2])
    luma_hv = 0x20 | sv  # 0x22 for 420, 0x21 for 422
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    out += _seg(0xDB, bytes([0x01]) + bytes(int(x) for x in q))
    out += _seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, luma_hv, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _seg(0xC4, _dht_payload(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    out += _seg(0xC4, _dht_payload(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    out += _seg(0xC4, _dht_payload(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
    out += _seg(0xC4, _dht_payload(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


# -- decoder ---------------------------------------------------------------


def _exif_orientation(app1: bytes) -> int:
    """Orientation (EXIF tag 274) from an APP1 Exif payload — the payload
    embeds a little TIFF stream, parsed just far enough for IFD0."""
    if app1[:6] != b"Exif\x00\x00":
        return 1
    t = app1[6:]
    if t[:4] == b"II\x2a\x00":
        eb = "<"
    elif t[:4] == b"MM\x00\x2a":
        eb = ">"
    else:
        return 1
    try:
        (ifd,) = struct.unpack_from(f"{eb}I", t, 4)
        (n,) = struct.unpack_from(f"{eb}H", t, ifd)
        for i in range(n):
            tag, typ, _cnt = struct.unpack_from(f"{eb}HHI", t, ifd + 2 + 12 * i)
            if tag == 274 and typ == 3:
                (o,) = struct.unpack_from(f"{eb}H", t, ifd + 10 + 12 * i)
                return o if 1 <= o <= 8 else 1
    except struct.error:
        return 1
    return 1


def _apply_orientation(px: np.ndarray, o: int) -> np.ndarray:
    """Rotate/flip a decoded (h, w[, c]) array upright per EXIF tag 274."""
    if o == 2:
        return px[:, ::-1]
    if o == 3:
        return px[::-1, ::-1]
    if o == 4:
        return px[::-1, :]
    if o == 5:  # transpose across the main diagonal
        return np.swapaxes(px, 0, 1)
    if o == 6:  # stored rotated 90° CCW → rotate CW to display
        return np.rot90(px, k=-1, axes=(0, 1))
    if o == 7:  # transverse = flip across the ANTI-diagonal: out[i,j] =
        # px[h-1-j, w-1-i].  NOT rot90(k=-1) then mirror — that algebraically
        # collapses to the plain transpose (orientation 5).
        return np.rot90(px, k=1, axes=(0, 1))[:, ::-1]
    if o == 8:
        return np.rot90(px, k=1, axes=(0, 1))
    return px


def exif_app1(orientation: int, big_endian: bool = False) -> bytes:
    """A minimal APP1 Exif segment carrying just tag 274 (test harness)."""
    eb = ">" if big_endian else "<"
    tiff = (b"MM\x00\x2a" if big_endian else b"II\x2a\x00") + struct.pack(f"{eb}I", 8)
    tiff += struct.pack(f"{eb}H", 1)
    tiff += struct.pack(f"{eb}HHI", 274, 3, 1) + struct.pack(f"{eb}HH", orientation, 0)
    tiff += struct.pack(f"{eb}I", 0)
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def decode_jpeg(buf: bytes):
    """Decode a baseline-sequential (SOF0) or progressive (SOF2) JPEG.
    Returns (height, width, channels, uint8 array of shape (h, w) or
    (h, w, 3) in RGB), rotated upright per EXIF orientation (APP1 tag 274
    — camera JPEGs store the sensor scan order and expect the reader to
    rotate; heights/widths swap for orientations 5–8).

    Supports: 8-bit precision, 1 or 3 components, sampling factors 1–2,
    Huffman tables from DHT, restart intervals; progressive streams with
    spectral selection AND successive approximation (the libjpeg/mozjpeg
    default scan scripts).  Raises NotImplementedError for
    extended/lossless/arithmetic/12-bit variants.
    """
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, comps) with comps = [(cid, hs, vs, tq)]
    progressive = False
    scans = []  # (sel, Ss, Se, Ah, Al, data, restart_interval)
    restart_interval = 0
    orientation = 1
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"marker expected at offset {pos}")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        ln = struct.unpack_from(">H", buf, pos)[0]
        payload = buf[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT (may hold several tables)
            off = 0
            while off < len(payload):
                pq, tq = payload[off] >> 4, payload[off] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                qtables[tq] = np.frombuffer(
                    payload, dtype=np.uint8, count=64, offset=off + 1
                ).astype(np.float64)
                off += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            off = 0
            while off < len(payload):
                tc, th = payload[off] >> 4, payload[off] & 0x0F
                bits = list(payload[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(payload[off + 17 : off + 17 + nv])
                htables[(tc, th)] = _decode_table(bits, vals)
                off += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported frame type (SOF marker 0x{marker:02X}): "
                "extended/lossless/arithmetic JPEG not supported by the "
                "numpy decoder"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", payload, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows until next marker
            ns = payload[0]
            sel = [(payload[1 + 2 * i], payload[2 + 2 * i]) for i in range(ns)]
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ahal = payload[3 + 2 * ns]
            end = pos
            while end < len(buf) - 1:
                if buf[end] == 0xFF and buf[end + 1] not in (0x00,) and not (
                    0xD0 <= buf[end + 1] <= 0xD7
                ):
                    break
                end += 1
            scans.append(
                (sel, ss, se, ahal >> 4, ahal & 0x0F, buf[pos:end], restart_interval)
            )
            pos = end
        elif marker == 0xE1 and payload[:6] == b"Exif\x00\x00":
            orientation = _exif_orientation(payload)
        # other segments (APPn, COM) are skipped
    if frame is None or not scans:
        raise ValueError("missing SOF/SOS segment")
    h, w, comps = frame
    if progressive:
        ph, pw, pc, ppx = _decode_progressive(h, w, comps, scans, qtables, htables)
        ppx = _apply_orientation(ppx, orientation)
        return ppx.shape[0], ppx.shape[1], pc, ppx
    if len(scans) != 1:
        raise NotImplementedError("multi-scan sequential JPEG not supported")
    sel, _ss, _se, _ah, _al, data, restart_interval = scans[0]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        cid: np.zeros((mcuy * 8 * vs, mcux * 8 * hs), dtype=np.float64)
        for cid, hs, vs, _ in comps
    }
    table_for = {scid: (tt >> 4, tt & 0x0F) for scid, tt in sel}
    br = _BitReader(data)
    preds = {cid: 0 for cid, _, _, _ in comps}
    mcu_index = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                # restart boundary: byte-aligned RSTn marker, DC predictors
                # reset (T.81 E.1.4 — what makes corrupt scans re-syncable)
                br.expect_restart(rst_n)
                rst_n = (rst_n + 1) & 7
                preds = {cid: 0 for cid, _, _, _ in comps}
            mcu_index += 1
            for cid, hs, vs, tq in comps:
                td, ta = table_for[cid]
                dct = htables[(0, td)]
                act = htables[(1, ta)]
                q = qtables[tq]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.float64)
                        s = br.read_symbol(dct)
                        diff = _extend(br.read_bits(s), s) if s else 0
                        preds[cid] += diff
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = br.read_symbol(act)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0x0F
                            if k > 63:
                                raise ValueError("AC index overflow in scan")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * q
                        blk = _A.T @ coef.reshape(8, 8) @ _A + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = blk
    fh, fw, fc, fpx = _finish(h, w, comps, planes)
    fpx = _apply_orientation(fpx, orientation)
    return fpx.shape[0], fpx.shape[1], fc, fpx


def _finish(h: int, w: int, comps, planes):
    """Upsample component planes to full resolution, crop, color-convert."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return h, w, 1, gray
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return h, w, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_progressive(h, w, comps, scans, qtables, htables):
    """Progressive (SOF2) decode: accumulate DCT coefficients across scans
    (spectral selection bands × successive-approximation bit planes, T.81
    Annex G), then dequantize + IDCT once at the end."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    # padded (MCU-aligned) block grid holds the coefficients; non-interleaved
    # scans iterate only the component's natural (unpadded ceil) sub-grid
    grid = {cid: (mcuy * vs, mcux * hs) for cid, hs, vs, _ in comps}
    # samples = ceil(dim·fs/fmax) (T.81 A.1.1), blocks = ceil(samples/8):
    # ceil-of-ceil, NOT ceil-of-floor — with h=17, vs=1, vmax=2 the spec
    # requires ceil(ceil(8.5)/8)=2 blocks, floor gives 1 and silently drops
    # the last chroma block row in subsampled non-interleaved scans.
    nat = {
        cid: (-(-(-(-h * vs // vmax)) // 8), -(-(-(-w * hs // hmax)) // 8))
        for cid, hs, vs, _ in comps
    }
    coefs = {
        cid: np.zeros((gy, gx, 64), dtype=np.int64) for cid, (gy, gx) in grid.items()
    }

    for sel, ss, se, ah, al, data, rst_int in scans:
        br = _BitReader(data)
        table_for = {scid: (tt >> 4, tt & 0x0F) for scid, tt in sel}
        if ss == 0:  # DC scan (interleaved when multi-component)
            preds = {scid: 0 for scid, _ in sel}
            unit = 0
            rst_n = 0

            def dc_block(cid, by, bx):
                blk = coefs[cid][by, bx]
                if ah == 0:  # first DC scan: diff-coded, point-transformed
                    dct = htables[(0, table_for[cid][0])]
                    s = br.read_symbol(dct)
                    diff = _extend(br.read_bits(s), s) if s else 0
                    preds[cid] += diff
                    blk[0] = preds[cid] << al
                else:  # refinement: one raw bit per block
                    if br.read_bit():
                        blk[0] |= 1 << al

            if len(sel) > 1:
                for my in range(mcuy):
                    for mx in range(mcux):
                        if rst_int and unit and unit % rst_int == 0:
                            br.expect_restart(rst_n)
                            rst_n = (rst_n + 1) & 7
                            preds = {scid: 0 for scid, _ in sel}
                        unit += 1
                        for scid, _tt in sel:
                            hs, vs, _ = by_id[scid]
                            for by in range(vs):
                                for bx in range(hs):
                                    dc_block(scid, my * vs + by, mx * hs + bx)
            else:
                cid = sel[0][0]
                ny, nx = nat[cid]
                for by in range(ny):
                    for bx in range(nx):
                        if rst_int and unit and unit % rst_int == 0:
                            br.expect_restart(rst_n)
                            rst_n = (rst_n + 1) & 7
                            preds = {cid: 0}
                        unit += 1
                        dc_block(cid, by, bx)
        else:  # AC scan: always single-component, non-interleaved
            if len(sel) != 1:
                raise ValueError("progressive AC scan must be single-component")
            cid = sel[0][0]
            act = htables[(1, table_for[cid][1])]
            ny, nx = nat[cid]
            eobrun = 0
            unit = 0
            rst_n = 0
            for by in range(ny):
                for bx in range(nx):
                    if rst_int and unit and unit % rst_int == 0:
                        br.expect_restart(rst_n)
                        rst_n = (rst_n + 1) & 7
                        eobrun = 0
                    unit += 1
                    blk = coefs[cid][by, bx]
                    if ah == 0:
                        eobrun = _ac_first(br, act, blk, ss, se, al, eobrun)
                    else:
                        eobrun = _ac_refine(br, act, blk, ss, se, al, eobrun)

    # reconstruct: dequantize accumulated coefficients and inverse-transform
    planes = {
        cid: np.zeros((gy * 8, gx * 8), dtype=np.float64)
        for cid, (gy, gx) in grid.items()
    }
    for cid, hs, vs, tq in comps:
        q = qtables[tq]
        gy, gx = grid[cid]
        for by in range(gy):
            for bx in range(gx):
                zz = coefs[cid][by, bx].astype(np.float64)
                raster = np.zeros(64, dtype=np.float64)
                raster[ZIGZAG] = zz * q
                blk = _A.T @ raster.reshape(8, 8) @ _A + 128.0
                planes[cid][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
    return _finish(h, w, comps, planes)


def _ac_first(br, act, blk, ss, se, al, eobrun):
    """First AC scan for a band (Ah == 0): run-length + EOBRUN (G.1.2.2)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.read_symbol(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC index overflow in progressive scan")
        blk[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine(br, act, blk, ss, se, al, eobrun):
    """AC refinement scan (Ah > 0): correction bits for history-nonzero
    coefficients interleaved with newly-nonzero insertions (G.1.2.3)."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(k_from: int) -> None:
        # history-nonzero coefficients receive their correction bits even
        # past the last newly-nonzero position / inside an EOB run
        k2 = k_from
        while k2 <= se:
            if blk[k2] != 0:
                if br.read_bit() and (blk[k2] & p1) == 0:
                    blk[k2] += p1 if blk[k2] >= 0 else m1
            k2 += 1

    if eobrun > 0:  # this block lies entirely inside a pending EOB run
        correct(ss)
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.read_symbol(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:  # EOB run starts AT this block
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read_bits(r)
                break
            val = 0  # ZRL: skip 16 zero-history positions
        else:
            if s != 1:
                raise ValueError("refinement scan with magnitude > 1")
            val = p1 if br.read_bit() else m1
        while k <= se:
            if blk[k] != 0:
                if br.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            else:
                if r == 0:
                    if val:
                        blk[k] = val
                    k += 1
                    break
                r -= 1
            k += 1
    correct(k)  # remaining positions of THIS block (no run decrement)
    return eobrun


# -- progressive encoder (test harness) -------------------------------------


def _coef_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Forward-DCT + quantize every 8×8 block of a padded plane →
    (by, bx, 64) int64 coefficients in ZIGZAG order."""
    h, w = plane.shape
    qz = q.astype(np.float64)[ZIGZAG.argsort()].reshape(8, 8)
    out = np.zeros((h // 8, w // 8, 64), dtype=np.int64)
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            blk = plane[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
            coef = _A @ blk @ _A.T
            out[by // 8, bx // 8] = (
                np.round(coef / qz).astype(np.int64).ravel()[ZIGZAG]
            )
    return out


def _emit_dc_first(bw, blocks_per_comp, codes_per_comp, al):
    """Interleaved first DC scan: per-component diff coding of the
    point-transformed (arithmetic >> al) DC values, block raster order with
    components interleaved per position (4:4:4 / gray grids only)."""
    preds = [0] * len(blocks_per_comp)
    gy, gx, _ = blocks_per_comp[0].shape
    for by in range(gy):
        for bx in range(gx):
            for ci, blocks in enumerate(blocks_per_comp):
                v = int(blocks[by, bx, 0]) >> al  # arithmetic shift (floor)
                diff = v - preds[ci]
                preds[ci] = v
                s = _category(diff)
                code, ln = codes_per_comp[ci][s]
                bw.write(code, ln)
                if s:
                    bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _emit_dc_refine(bw, blocks_per_comp, al):
    gy, gx, _ = blocks_per_comp[0].shape
    for by in range(gy):
        for bx in range(gx):
            for blocks in blocks_per_comp:
                bw.write((int(blocks[by, bx, 0]) >> al) & 1, 1)


def _emit_eobrun(bw, ac_codes, eobrun: int, be: list[int]) -> int:
    """Emit a pending EOB-run symbol plus its buffered correction bits."""
    if eobrun > 0:
        nb = eobrun.bit_length() - 1
        code, ln = ac_codes[nb << 4]
        bw.write(code, ln)
        if nb:
            bw.write(eobrun - (1 << nb), nb)
    for bit in be:
        bw.write(bit, 1)
    be.clear()
    return 0


def _emit_ac_first(bw, ac_codes, blocks, ss, se, al):
    """First AC scan of a band: run-length coding of the point-transformed
    (truncate-toward-zero) magnitudes with cross-block EOB runs."""
    eobrun = 0
    gy, gx, _ = blocks.shape
    for by in range(gy):
        for bx in range(gx):
            zz = blocks[by, bx]
            sv = [
                (abs(int(zz[k])) >> al) * (1 if zz[k] >= 0 else -1)
                for k in range(ss, se + 1)
            ]
            last = max((i for i, v in enumerate(sv) if v), default=-1)
            if last < 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    eobrun = _emit_eobrun(bw, ac_codes, eobrun, [])
                continue
            if eobrun:
                eobrun = _emit_eobrun(bw, ac_codes, eobrun, [])
            r = 0
            for v in sv[: last + 1]:
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    r -= 16
                s = _category(v)
                code, ln = ac_codes[(r << 4) | s]
                bw.write(code, ln)
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                r = 0
            if ss + last < se:
                eobrun += 1
                if eobrun == 0x7FFF:
                    eobrun = _emit_eobrun(bw, ac_codes, eobrun, [])
    if eobrun:
        _emit_eobrun(bw, ac_codes, eobrun, [])


def _emit_ac_refine(bw, ac_codes, blocks, ss, se, al):
    """AC refinement scan (Ah = al+1 → Al = al): newly-nonzero coefficients
    as (run, 1)+sign symbols, history-nonzero coefficients as buffered
    correction bits flushed after each symbol / EOB run (G.1.2.3 inverse)."""
    eobrun = 0
    be: list[int] = []
    gy, gx, _ = blocks.shape
    for by in range(gy):
        for bx in range(gx):
            zz = blocks[by, bx]
            a = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            last_new = max((i for i, v in enumerate(a) if v == 1), default=-1)
            if last_new >= 0 and eobrun:
                eobrun = _emit_eobrun(bw, ac_codes, eobrun, be)
            r = 0
            for i in range(last_new + 1):
                if a[i] == 0:
                    r += 1
                    continue
                if a[i] > 1:  # history-nonzero: correction bit, run unbroken
                    be.append(a[i] & 1)
                    continue
                while r > 15:
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    for bit in be:
                        bw.write(bit, 1)
                    be.clear()
                    r -= 16
                code, ln = ac_codes[(r << 4) | 1]
                bw.write(code, ln)
                bw.write(1 if zz[ss + i] > 0 else 0, 1)
                for bit in be:
                    bw.write(bit, 1)
                be.clear()
                r = 0
            # correction bits after the last newly-nonzero coefficient ride
            # the EOB run
            for i in range(last_new + 1, se - ss + 1):
                if a[i] > 1:
                    be.append(a[i] & 1)
            if last_new < se - ss:
                eobrun += 1
                if eobrun == 0x7FFF or len(be) > 900:
                    eobrun = _emit_eobrun(bw, ac_codes, eobrun, be)
    if eobrun or be:
        _emit_eobrun(bw, ac_codes, eobrun, be)


def _sos(comps_tables: list[tuple[int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
    body = bytes([len(comps_tables)])
    for cid, tt in comps_tables:
        body += bytes([cid, tt])
    return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))


def encode_progressive(
    img: np.ndarray, q: np.ndarray = FLAT_Q, subsample: str = "444"
) -> bytes:
    """Progressive-encode (SOF2) an 8-bit grayscale (h, w) or RGB
    (h, w, 3 → YCbCr 4:4:4 or 4:2:0) image with the classic libjpeg-style
    script: DC first (Al=1) → AC bands 1–5 / 6–63 (Al=2) → DC refine →
    AC refine (Al=2→1) → AC refine (Al=1→0) — exercising spectral
    selection, successive approximation, EOB runs and correction-bit
    buffering.  With ``subsample='420'`` every scan (DC included) is
    single-component non-interleaved, driving the decoder's natural
    ceil(ceil(dim·fs/fmax)/8) sub-grids rather than the MCU interleave."""
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    img = np.asarray(img, dtype=np.uint8)
    color = img.ndim == 3
    sub420 = color and subsample == "420"
    if color:
        h, w, _ = img.shape
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        if sub420:
            def _sub2(p: np.ndarray) -> np.ndarray:
                p8 = _pad_to(np.clip(np.round(p), 0, 255).astype(np.uint8), 2, 2)
                ph, pw = p8.shape
                m = p8.reshape(ph // 2, 2, pw // 2, 2).astype(np.float64).mean(axis=(1, 3))
                return np.clip(np.round(m), 0, 255).astype(np.uint8)

            planes = [
                _pad_to(np.clip(np.round(planes[0]), 0, 255).astype(np.uint8), 8, 8),
                _pad_to(_sub2(planes[1]), 8, 8),
                _pad_to(_sub2(planes[2]), 8, 8),
            ]
            comp_hdr = bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
        else:
            planes = [
                _pad_to(np.clip(np.round(p), 0, 255).astype(np.uint8), 8, 8)
                for p in planes
            ]
            comp_hdr = bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
        dc_tables = [(0, 0), (0, 1), (0, 1)]  # (tc=0 slot) per comp
        ac_slot = [0, 1, 1]
    else:
        h, w = img.shape
        planes = [_pad_to(img, 8, 8)]
        comp_hdr = bytes([1, 0x11, 0])
        dc_tables = [(0, 0)]
        ac_slot = [0]
    blocks = [_coef_blocks(p, q) for p in planes]
    dcl = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    dcc = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    pac = _canonical_codes(PROG_AC_BITS, PROG_AC_VALS)
    dc_codes = [dcl if th == 0 else dcc for _tc, th in dc_tables]
    ac_codes = [pac for _ in ac_slot]  # shared progressive AC table (slot 0)
    ac_slot = [0] * len(ac_slot)
    ncomp = len(blocks)
    cids = list(range(1, ncomp + 1))

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    if color:
        out += _seg(0xDB, bytes([0x01]) + bytes(int(x) for x in q))
    out += _seg(0xC2, struct.pack(">BHHB", 8, h, w, ncomp) + comp_hdr)  # SOF2
    out += _seg(0xC4, _dht_payload(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    out += _seg(0xC4, _dht_payload(1, 0, PROG_AC_BITS, PROG_AC_VALS))
    if color:
        out += _seg(0xC4, _dht_payload(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))

    def scan(sel, ss, se, ah, al, emit):
        nonlocal out
        out += _sos(sel, ss, se, ah, al)
        bw = _BitWriter()
        emit(bw)
        out += bw.flush()

    # 1. DC first, Al=1 — interleaved for 4:4:4/gray; per-component
    # non-interleaved for 4:2:0 (raster over each natural sub-grid)
    if sub420:
        for i in range(ncomp):
            scan([(cids[i], dc_tables[i][1] << 4)], 0, 0, 0, 1,
                 lambda bw, i=i: _emit_dc_first(bw, [blocks[i]], [dc_codes[i]], 1))
    else:
        scan(
            [(cids[i], dc_tables[i][1] << 4) for i in range(ncomp)],
            0, 0, 0, 1,
            lambda bw: _emit_dc_first(bw, blocks, dc_codes, 1),
        )
    # 2./3. AC bands per component, Al=2
    for i in range(ncomp):
        scan([(cids[i], ac_slot[i])], 1, 5, 0, 2,
             lambda bw, i=i: _emit_ac_first(bw, ac_codes[i], blocks[i], 1, 5, 2))
        scan([(cids[i], ac_slot[i])], 6, 63, 0, 2,
             lambda bw, i=i: _emit_ac_first(bw, ac_codes[i], blocks[i], 6, 63, 2))
    # 4. DC refinement, Al=0 (raw bits; interleave mirrors scan 1)
    if sub420:
        for i in range(ncomp):
            scan([(cids[i], dc_tables[i][1] << 4)], 0, 0, 1, 0,
                 lambda bw, i=i: _emit_dc_refine(bw, [blocks[i]], 0))
    else:
        scan(
            [(cids[i], dc_tables[i][1] << 4) for i in range(ncomp)],
            0, 0, 1, 0,
            lambda bw: _emit_dc_refine(bw, blocks, 0),
        )
    # 5./6. AC refinement passes Al 2→1 then 1→0, full band
    for ah, al in ((2, 1), (1, 0)):
        for i in range(ncomp):
            scan([(cids[i], ac_slot[i])], 1, 63, ah, al,
                 lambda bw, i=i, al=al: _emit_ac_refine(
                     bw, ac_codes[i], blocks[i], 1, 63, al))
    out += b"\xff\xd9"
    return bytes(out)

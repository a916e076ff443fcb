"""From-scratch Brotli (RFC 7932) decompression — stdlib-only logic.

Completes the parquet page-codec set (codec 4 — the one written by
`parquet.compression=brotli` lakes) and adds the last mainstream shard
compressor to the corpus-ingestion path.  Implements the full decoding
path of the public spec:

- stream header (WBITS variable code) and meta-block framing (ISLAST /
  ISLASTEMPTY, MNIBBLES, metadata-skip blocks, uncompressed blocks);
- prefix codes: simple (1–4 symbols with the tree-select bit and
  within-length symbol sorting) and complex (the fixed 18-symbol
  code-length code-length code, HSKIP, repeat codes 16/17 with the
  `(repeat - 2) << ebits` accumulation, 32768-space Kraft accounting);
- the three block-category switch machines (literals / insert-and-copy /
  distances) with their type codes (2 extra symbols), 26-symbol count
  code, and per-category state;
- context modeling: the four literal context modes (LSB6/MSB6/UTF8/
  Signed) over the spec's 2048-byte context lookup table, context maps
  with run-length-encoded zeros (RLEMAX) and the inverse move-to-front
  transform, and the 4-bucket copy-length distance contexts;
- the 704-symbol insert-and-copy length code, distance short codes over
  the 4-entry distance ring buffer (initialized 4/11/15/16), and the
  NPOSTFIX/NDIRECT long-distance form;
- the static dictionary: word geometry (size_bits/offsets per length),
  121 transforms (omit-first/omit-last N, UppercaseFirst/UppercaseAll
  with the spec's UTF-8-aware uppercasing) over the prefix/suffix pool.

STATIC DATA: the compact RFC appendix tables (transform triples and
strings, context lookup table, dictionary geometry) are embedded below
verbatim; the 122,784-byte dictionary BODY is loaded once at first use
from the system ``libbrotlicommon`` shared library and pinned by SHA-256
(`20e42eb1…5c70`, the spec's published dictionary).  When the library is
absent, streams that reference dictionary words raise a positioned
``NotImplementedError`` — everything else still decodes.

Malformed payloads raise positioned ``ValueError`` (shared codec-layer
contract).  Cross-validated against pyarrow's real brotli codec in
tests/test_brotli.py (random + text + parquet-page corpora, multiple
quality levels).
"""

from __future__ import annotations

import base64
import zlib

__all__ = ["brotli_decompress"]


# -- RFC 7932 appendix data (compact tables, embedded) ---------------------------

# Appendix B: transform prefix/suffix string pool (length-prefixed) + the
# id -> pool-offset map + 121 (prefix_id, type, suffix_id) triples.
_PS = base64.b64decode(
    "ASACLCAIIG9mIHRoZSAEIG9mIAJzIAEuBSBhbmQgBCBpbiABIgQgdG8gAiI+AQoCLiABXQUgZm9y"
    "IAMgYSAGIHRoYXQgAScGIHdpdGggBiBmcm9tIAQgYnkgASgGLiBUaGUgBCBvbiAEIGFzIAQgaXMg"
    "BGluZyACCgkBOgNlZCACPSIEIGF0IANseSABLAI9JwUuY29tLwcuIFRoaXMgBSBub3QgA2VyIANh"
    "bCAEZnVsIARpdmUgBWxlc3MgBGVzdCAEaXplIALCoARvdXMgBSB0aGUgAmUgAA=="
)
_PS_MAP = [
    0, 2, 5, 14, 19, 22, 24, 30, 35, 37, 42, 45, 47, 50, 52, 58, 62, 69, 71,
    78, 85, 90, 92, 99, 104, 109, 114, 119, 122, 124, 128, 131, 136, 140, 142,
    145, 151, 159, 165, 169, 173, 178, 183, 189, 194, 199, 202, 207, 213, 216,
]
_TRIPLES = base64.b64decode(
    "MQAxMQAAAAAAMQwxMQoAMQAvAAAxBAAAMQADMQoxMQAGMQ0xMQExAQAAMQABAAoAMQAHMQAJMAAA"
    "MQAIMQAFMQAKMQALMQMxMQANMQAOMQ4xMQIxMQAPMQAQAAoxMQAMBQAxAAABMQ8xMQASMQARMQAT"
    "MQAUMRAxMRExLwAxMQQxMQAWMQsxMQAXMQAYMQAZMQcxMQEaMQAbMQAcAAAMMQAdMRQxMRIxMQYx"
    "MQAVMQoBMQgxMQAfMQAgLwADMQUxMQkxAAoBMQoIBQAVMQsAMQoKMQAeAAAFIwAxLwACMQoRMQAk"
    "MQAhBQAAMQoVMQoFMQAlAAAeMQAmAAsAMQAnAAsxMQAiMQsIMQoMAAAVMQAoAAoMMQApMQAqMQsR"
    "MQArAAoFMQsKAAAiMQohMQAsMQsFLQAxAAAhMQoeMQseMQAuMQsBMQoiAAohAAseAAsBMQshMQsV"
    "MQsMAAsFMQsiAAsMAAoeAAsiAAoi"
)
_NUM_TRANSFORMS = len(_TRIPLES) // 3  # 121

# The spec's context lookup table: 4 modes (LSB6, MSB6, UTF8, Signed) x
# (256-byte p1 lut + 256-byte p2 lut); ctx = LUT[m*512 + p1] | LUT[m*512 + 256 + p2].
_CLUT = zlib.decompress(base64.b64decode(
    "eNrt01uPwVAQwPFqi+KgKOpe96Koe92//7fav+yS7YosafZhE7+TmYeZnJeZc6SQrKjhSFSLxRMi"
    "mUrrmWzOyBeKZqlcqdbqDavZane6vb49GI6c8WTqzuaL5Wq98ba7/eF4Okv//f6bFIIMBSrCiCAK"
    "DTHEkYBAEimkoSODLHIwkEcBRZgooYwKqqihjgYsNNFCGx100UMfNgYYYgQHY0wwhYsZ5lhgiRXW"
    "2MDDFjvsccARJ5zx3v4XVSXuy5rQhTCEblaFsERHODeWZdoUXQZ+DX82BW3hMfBr+POlz+MLdmQl"
    "2Hnqc3wj39wVfvrsKw9dun++VvkXkuanv8gMyArIfpHr5z3e73OUgNSAwi+K+EU/AAMFb6s="
))
assert len(_CLUT) == 2048

# Dictionary word geometry: 2^size_bits words of each length; offsets into the body.
_DICT_SIZE_BITS = [
    0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8, 7, 7, 8, 7, 7, 6,
    6, 5, 5, 0, 0, 0, 0, 0, 0, 0,
]
_DICT_OFFSETS = [
    0, 0, 0, 0, 0, 4096, 9216, 21504, 35840, 44032, 53248, 63488, 74752,
    87040, 93696, 100864, 104704, 106752, 108928, 113536, 115968, 118528,
    119872, 121280, 122016, 122784, 122784, 122784, 122784, 122784, 122784,
    122784,
]
_DICT_SHA256 = "20e42eb1b511c21806d4d227d07e5dd06877d8ce7b3a817f378f313653f35c70"
_DICT_SIZE = 122784

_dict_body: bytes | None = None


def _dictionary() -> bytes:
    """Load the 122,784-byte static dictionary body from the system
    libbrotlicommon (the data is spec content; only its bytes live in the
    library).  SHA-256-pinned; memoized."""
    global _dict_body
    if _dict_body is not None:
        return _dict_body
    import ctypes
    import ctypes.util
    import glob
    import hashlib

    class _BrotliDictionary(ctypes.Structure):
        _fields_ = [
            ("size_bits_by_length", ctypes.c_uint8 * 32),
            ("offsets_by_length", ctypes.c_uint32 * 32),
            ("data_size", ctypes.c_size_t),
            ("data", ctypes.POINTER(ctypes.c_uint8)),
        ]

    candidates = [ctypes.util.find_library("brotlicommon")]
    for pat in (
        "/usr/lib/*/libbrotlicommon.so*",
        "/usr/lib/libbrotlicommon.so*",
        "/root/miniconda/lib/libbrotlicommon.so*",
        "/opt/conda/lib/libbrotlicommon.so*",
    ):
        candidates.extend(sorted(glob.glob(pat)))
    last_err: Exception | None = None
    for cand in candidates:
        if not cand:
            continue
        try:
            lib = ctypes.CDLL(cand)
            lib.BrotliGetDictionary.restype = ctypes.POINTER(_BrotliDictionary)
            d = lib.BrotliGetDictionary().contents
            body = ctypes.string_at(d.data, d.data_size)
            if len(body) != _DICT_SIZE or hashlib.sha256(body).hexdigest() != _DICT_SHA256:
                raise ValueError(f"unexpected dictionary content in {cand}")
            _dict_body = body
            return body
        except (OSError, AttributeError, ValueError) as exc:
            last_err = exc
    raise NotImplementedError(
        "brotli stream references the static dictionary, but no "
        f"libbrotlicommon with the pinned dictionary body was found ({last_err})"
    )


# -- fixed length/command tables (RFC 7932 section 5) -----------------------------

_INS_BASE = [0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98, 130, 194,
             322, 578, 1090, 2114, 6210, 22594]
_INS_EXTRA = [0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10,
              12, 14, 24]
_CP_BASE = [2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54, 70, 102,
            134, 198, 326, 582, 1094, 2118]
_CP_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9,
             10, 24]
# command-code high ranges for cmd >= 128: (insert_high, copy_high) per 64-block
_CMD_LUT = [(0, 0), (0, 8), (8, 0), (8, 8), (0, 16), (16, 0), (8, 16), (16, 8),
            (16, 16)]
# block count code: 26 symbols of (base, extra_bits)
_BLOCK_COUNT = [
    (1, 2), (5, 2), (9, 2), (13, 2), (17, 3), (25, 3), (33, 3), (41, 3),
    (49, 4), (65, 4), (81, 4), (97, 4), (113, 5), (145, 5), (177, 5),
    (209, 5), (241, 6), (305, 6), (369, 7), (497, 8), (753, 9), (1265, 10),
    (2289, 11), (4337, 12), (8433, 13), (16625, 24),
]
# code lengths of the fixed code that encodes the code-length code lengths
_CLCL = {0: 2, 1: 4, 2: 3, 3: 2, 4: 2, 5: 4}
_CL_ORDER = [1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15]


# -- bit reader (LSB-first, zero-padded tail) --------------------------------------


class _Bits:
    __slots__ = ("buf", "n", "pos", "acc", "nbits", "consumed")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.n = len(buf)
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self.consumed = 0  # bits actually consumed (may exceed 8*n only on truncated input)

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            chunk = self.buf[self.pos : self.pos + 8]
            if not chunk:
                # zero padding past the end; over-consumption is caught by
                # the end-of-stream check / meta-block length accounting
                self.nbits = need
                return
            self.acc |= int.from_bytes(chunk, "little") << self.nbits
            self.nbits += 8 * len(chunk)
            self.pos += len(chunk)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        self.consumed += n
        return v

    def peek(self, n: int) -> int:
        self._fill(n)
        return self.acc & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self._fill(n)
        self.acc >>= n
        self.nbits -= n
        self.consumed += n

    def align(self) -> None:
        drop = self.consumed & 7
        if drop:
            self.skip(8 - drop)

    def read_bytes(self, n: int) -> bytes:
        self.align()
        start = self.consumed // 8
        if start + n > self.n:
            raise ValueError(f"raw byte run overruns input at byte {start}")
        self.acc = 0
        self.nbits = 0
        self.pos = start + n
        self.consumed = self.pos * 8
        return self.buf[start : start + n]

    def bit_offset(self) -> int:
        return self.consumed

    def check_end(self) -> None:
        """After the last meta-block: only zero padding to the byte
        boundary may remain (RFC 7932 section 9.1)."""
        if self.consumed > 8 * self.n:
            raise ValueError("truncated brotli stream (read past the end)")
        remaining = 8 * self.n - self.consumed
        if remaining >= 8:
            raise ValueError(f"{remaining // 8} trailing byte(s) after the final meta-block")
        if remaining and self.peek(remaining) != 0:
            raise ValueError("non-zero padding after the final meta-block")


# -- prefix codes -----------------------------------------------------------------


class _Prefix:
    """Canonical prefix code over (symbol, length) pairs; DEFLATE bit order
    (first stream bit = tree root).  ``maxlen == 0`` means a zero-bit code
    for a single symbol."""

    __slots__ = ("table", "maxlen", "single")

    def __init__(self, lengths: dict[int, int]):
        nz = {s: l for s, l in lengths.items() if l > 0}
        if len(nz) == 0:
            raise ValueError("prefix code with no symbols")
        if len(nz) == 1:
            self.single = next(iter(nz))
            self.maxlen = 0
            self.table = None
            return
        self.single = -1
        maxlen = max(nz.values())
        if maxlen > 15:
            raise ValueError(f"prefix code length {maxlen} exceeds 15")
        self.maxlen = maxlen
        # canonical assignment: by length, then by insertion order of `lengths`
        code = 0
        table = [None] * (1 << maxlen)
        for bl in range(1, maxlen + 1):
            for sym, l in lengths.items():
                if l != bl:
                    continue
                # reverse the bl-bit code (stream serves root-first, LSB-first)
                rev = int(f"{code:0{bl}b}"[::-1], 2)
                step = 1 << bl
                for k in range(rev, 1 << maxlen, step):
                    table[k] = (sym, bl)
                code += 1
            code <<= 1
        if any(e is None for e in table):
            raise ValueError("incomplete prefix code")
        self.table = table

    def decode(self, bits: _Bits) -> int:
        if self.maxlen == 0:
            return self.single
        sym, l = self.table[bits.peek(self.maxlen)]
        bits.skip(l)
        return sym


def _alphabet_bits(size: int) -> int:
    b = 0
    while (1 << b) < size:
        b += 1
    return b


def _read_prefix_code(bits: _Bits, alphabet_size: int) -> _Prefix:
    """RFC 7932 section 3.4/3.5: simple or complex prefix-code descriptor."""
    hskip = bits.read(2)
    if hskip == 1:  # simple
        nsym = bits.read(2) + 1
        abits = _alphabet_bits(alphabet_size)
        syms = []
        for _ in range(nsym):
            s = bits.read(abits)
            if s >= alphabet_size:
                raise ValueError(f"simple-code symbol {s} out of alphabet at bit {bits.bit_offset()}")
            if s in syms:
                raise ValueError("duplicate symbol in simple prefix code")
            syms.append(s)
        if nsym == 1:
            return _Prefix({syms[0]: 1})  # handled as zero-bit single
        if nsym == 2:
            syms.sort()
            return _Prefix({syms[0]: 1, syms[1]: 1})
        if nsym == 3:
            rest = sorted(syms[1:])
            return _Prefix({syms[0]: 1, rest[0]: 2, rest[1]: 2})
        if bits.read(1):  # tree-select: lengths 1,2,3,3
            tail = sorted(syms[2:])
            return _Prefix({syms[0]: 1, syms[1]: 2, tail[0]: 3, tail[1]: 3})
        allsorted = sorted(syms)
        return _Prefix({s: 2 for s in allsorted})

    # complex: first the code-length code (18 symbols in the fixed order,
    # lengths coded by the fixed _CLCL code), skipping the first hskip
    cl_code = _Prefix(dict(_CLCL))
    cl_lengths: dict[int, int] = {}
    space = 32
    nonzero = 0
    for i in range(hskip, 18):
        v = cl_code.decode(bits)
        cl_lengths[_CL_ORDER[i]] = v
        if v:
            space -= 32 >> v
            nonzero += 1
            if space <= 0:
                break
    if nonzero == 1:
        cl = _Prefix({s: 1 for s, l in cl_lengths.items() if l})  # zero-bit
    else:
        if space != 0:
            raise ValueError(f"code-length code over/under-subscribed at bit {bits.bit_offset()}")
        # canonical order for the code-length code is by SYMBOL value
        ordered = dict(sorted((s, l) for s, l in cl_lengths.items() if l))
        cl = _Prefix(ordered)

    # then the symbol code lengths with repeat codes 16/17
    lengths: dict[int, int] = {}
    symbol = 0
    space = 32768
    prev_nz_len = 8
    repeat = 0
    repeat_len = -1  # the length being repeated: >0 for code 16 runs, 0 for 17
    while symbol < alphabet_size and space > 0:
        v = cl.decode(bits)
        if v < 16:
            repeat = 0
            repeat_len = -1
            if v:
                lengths[symbol] = v
                prev_nz_len = v
                space -= 32768 >> v
            symbol += 1
            continue
        ebits = 2 if v == 16 else 3
        new_len = prev_nz_len if v == 16 else 0
        if new_len != repeat_len:
            repeat = 0
            repeat_len = new_len
        old = repeat
        if repeat:
            repeat = (repeat - 2) << ebits
        repeat += bits.read(ebits) + 3
        delta = repeat - old
        if symbol + delta > alphabet_size:
            raise ValueError(f"prefix-code repeat overruns alphabet at bit {bits.bit_offset()}")
        if repeat_len:
            for k in range(delta):
                lengths[symbol + k] = repeat_len
            space -= delta * (32768 >> repeat_len)
        symbol += delta
    nz = [s for s, l in lengths.items() if l]
    if len(nz) == 1:
        return _Prefix({nz[0]: 1})
    if space != 0:
        raise ValueError(f"prefix code over/under-subscribed at bit {bits.bit_offset()}")
    ordered = dict(sorted(lengths.items()))
    return _Prefix(ordered)


# -- variable-length count codes ---------------------------------------------------


def _read_block_type_count(bits: _Bits) -> int:
    """NBLTYPES / NTREES: 1..256 via the spec's variable code."""
    if bits.read(1) == 0:
        return 1
    n = bits.read(3)
    return (1 << n) + bits.read(n) + 1


def _read_context_map(bits: _Bits, ntrees: int, size: int) -> list[int]:
    if ntrees == 1:
        return [0] * size
    rlemax = (bits.read(4) + 1) if bits.read(1) else 0
    code = _read_prefix_code(bits, ntrees + rlemax)
    cmap = [0] * size
    i = 0
    while i < size:
        s = code.decode(bits)
        if s == 0:
            i += 1
        elif s <= rlemax:
            reps = (1 << s) + bits.read(s)
            if i + reps > size:
                raise ValueError(f"context-map zero run overruns map at bit {bits.bit_offset()}")
            i += reps
        else:
            cmap[i] = s - rlemax
            i += 1
    if bits.read(1):  # inverse move-to-front
        mtf = list(range(256))
        for k, v in enumerate(cmap):
            val = mtf.pop(v)
            mtf.insert(0, val)
            cmap[k] = val
    if any(v >= ntrees for v in cmap):
        raise ValueError("context map entry exceeds tree count")
    return cmap


# -- static dictionary transforms ---------------------------------------------------


def _uppercase(arr: bytearray, i: int) -> int:
    c = arr[i]
    if c < 192:
        if 97 <= c <= 122:
            arr[i] ^= 32
        return 1
    if c < 224:
        if i + 1 < len(arr):
            arr[i + 1] ^= 32
        return 2
    if i + 2 < len(arr):
        arr[i + 2] ^= 5
    return 3


def _pool_str(idx: int) -> bytes:
    off = _PS_MAP[idx]
    ln = _PS[off]
    return _PS[off + 1 : off + 1 + ln]


def _transform_word(word: bytes, tid: int) -> bytes:
    pid, ttype, sid = _TRIPLES[tid * 3], _TRIPLES[tid * 3 + 1], _TRIPLES[tid * 3 + 2]
    if ttype <= 9:  # Identity (0) / OmitLast1-9
        body = bytearray(word[: len(word) - ttype] if ttype else word)
    elif ttype == 10:  # UppercaseFirst
        body = bytearray(word)
        _uppercase(body, 0)
    elif ttype == 11:  # UppercaseAll
        body = bytearray(word)
        i = 0
        while i < len(body):
            i += _uppercase(body, i)
    else:  # OmitFirst1-9 (12..20)
        body = bytearray(word[ttype - 11 :])
    return _pool_str(pid) + bytes(body) + _pool_str(sid)


# -- the decoder -------------------------------------------------------------------


def brotli_decompress(buf: bytes, max_output: int = 1 << 31) -> bytes:
    """Decode one brotli stream (RFC 7932).  ``max_output`` bounds the
    produced size against zip-bomb payloads."""
    bits = _Bits(bytes(buf))
    # WBITS
    if bits.read(1) == 0:
        wbits = 16
    else:
        n = bits.read(3)
        if n:
            wbits = 17 + n
        else:
            n = bits.read(3)
            if n == 0:
                wbits = 17
            elif n == 1:
                raise ValueError("reserved WBITS code (large-window brotli not in RFC 7932)")
            else:
                wbits = 8 + n
    window = (1 << wbits) - 16

    out = bytearray()
    ring = [16, 15, 11, 4]  # fourth, third, second, last
    ridx = 0  # next write slot; last distance = ring[(ridx + 3) & 3]

    while True:
        islast = bits.read(1)
        if islast and bits.read(1):  # ISLASTEMPTY
            break
        mnib = bits.read(2)
        if mnib == 3:  # metadata block
            if bits.read(1):
                raise ValueError(f"reserved metadata bit set at bit {bits.bit_offset()}")
            mskip = bits.read(2)
            skip = 0
            for k in range(mskip):
                b = bits.read(8)
                if k == mskip - 1 and mskip > 1 and b == 0:
                    raise ValueError("metadata length has a zero top byte")
                skip |= b << (8 * k)
            if mskip:
                skip += 1
            bits.read_bytes(skip)
            if islast:
                raise ValueError("metadata block flagged ISLAST")
            continue
        nibbles = 4 + mnib
        mlen = bits.read(4 * nibbles)
        if nibbles > 4 and (mlen >> (4 * (nibbles - 1))) == 0:
            raise ValueError("MLEN top nibble is zero")
        mlen += 1
        if len(out) + mlen > max_output:
            raise ValueError(f"output exceeds max_output={max_output}")
        if not islast and bits.read(1):  # ISUNCOMPRESSED
            out += bits.read_bytes(mlen)
            continue

        # --- block-category headers (literals, insert&copy, distances)
        nbl: list[int] = []
        btype = [0, 0, 0]
        btype_prev = [1, 1, 1]
        bcount = [1 << 28, 1 << 28, 1 << 28]
        type_codes: list[_Prefix | None] = [None, None, None]
        count_codes: list[_Prefix | None] = [None, None, None]
        for cat in range(3):
            n = _read_block_type_count(bits)
            nbl.append(n)
            if n > 1:
                type_codes[cat] = _read_prefix_code(bits, n + 2)
                count_codes[cat] = _read_prefix_code(bits, 26)
                c = count_codes[cat].decode(bits)
                base, eb = _BLOCK_COUNT[c]
                bcount[cat] = base + bits.read(eb)

        def _switch(cat: int) -> None:
            sym = type_codes[cat].decode(bits)
            if sym == 0:
                nt = btype_prev[cat]
            elif sym == 1:
                nt = (btype[cat] + 1) % nbl[cat]
            else:
                nt = sym - 2
            btype_prev[cat] = btype[cat]
            btype[cat] = nt
            c = count_codes[cat].decode(bits)
            base, eb = _BLOCK_COUNT[c]
            bcount[cat] = base + bits.read(eb)

        npostfix = bits.read(2)
        ndirect = bits.read(4) << npostfix
        postfix_mask = (1 << npostfix) - 1
        cmodes = [bits.read(2) for _ in range(nbl[0])]
        ntreesl = _read_block_type_count(bits)
        cmap_l = _read_context_map(bits, ntreesl, 64 * nbl[0])
        ntreesd = _read_block_type_count(bits)
        cmap_d = _read_context_map(bits, ntreesd, 4 * nbl[2])
        lit_codes = [_read_prefix_code(bits, 256) for _ in range(ntreesl)]
        cmd_codes = [_read_prefix_code(bits, 704) for _ in range(nbl[1])]
        ndistcodes = 16 + ndirect + (48 << npostfix)
        dist_codes = [_read_prefix_code(bits, ndistcodes) for _ in range(ntreesd)]

        p1 = out[-1] if len(out) >= 1 else 0
        p2 = out[-2] if len(out) >= 2 else 0

        # --- command loop
        while mlen > 0:
            if bcount[1] == 0:
                _switch(1)
            bcount[1] -= 1
            cmd = cmd_codes[btype[1]].decode(bits)
            if cmd < 128:
                ihigh, chigh = (0, 0) if cmd < 64 else (0, 8)
                implicit_d0 = True
            else:
                ihigh, chigh = _CMD_LUT[(cmd >> 6) - 2]
                implicit_d0 = False
            icode = ihigh + ((cmd >> 3) & 7)
            ccode = chigh + (cmd & 7)
            insert_len = _INS_BASE[icode] + bits.read(_INS_EXTRA[icode])
            copy_len = _CP_BASE[ccode] + bits.read(_CP_EXTRA[ccode])

            if insert_len > mlen:
                raise ValueError(f"insert length overruns meta-block at bit {bits.bit_offset()}")
            lut_off = 0
            if insert_len:
                lut_off = cmodes[btype[0]] << 9
            for _ in range(insert_len):
                if bcount[0] == 0:
                    _switch(0)
                    lut_off = cmodes[btype[0]] << 9
                bcount[0] -= 1
                ctx = _CLUT[lut_off + p1] | _CLUT[lut_off + 256 + p2]
                lit = lit_codes[cmap_l[(btype[0] << 6) + ctx]].decode(bits)
                out.append(lit)
                p2 = p1
                p1 = lit
            mlen -= insert_len
            if mlen <= 0:
                break

            if implicit_d0:
                dcode = 0
                distance = ring[(ridx + 3) & 3]
            else:
                if bcount[2] == 0:
                    _switch(2)
                bcount[2] -= 1
                dctx = min(copy_len, 5) - 2
                dcode = dist_codes[cmap_d[(btype[2] << 2) + dctx]].decode(bits)
                if dcode < 16:
                    if dcode < 4:
                        distance = ring[(ridx + 3 - dcode) & 3]
                    else:
                        base = ring[(ridx + 3) & 3] if dcode < 10 else ring[(ridx + 2) & 3]
                        k = (dcode - 4) % 6
                        distance = base + (-1, 1, -2, 2, -3, 3)[k]
                        if distance <= 0:
                            raise ValueError(f"non-positive short-code distance at bit {bits.bit_offset()}")
                elif dcode < 16 + ndirect:
                    distance = dcode - 15
                else:
                    u = dcode - ndirect - 16
                    postfix = u & postfix_mask
                    u >>= npostfix
                    nbits_d = 1 + (u >> 1)
                    base = ((2 + (u & 1)) << nbits_d) - 4
                    distance = (
                        ((base + bits.read(nbits_d)) << npostfix)
                        + postfix + ndirect + 1
                    )

            max_dist = min(len(out), window)
            if distance <= max_dist:
                if copy_len > mlen:
                    raise ValueError(f"copy length overruns meta-block at bit {bits.bit_offset()}")
                if distance >= copy_len:
                    start = len(out) - distance
                    out += out[start : start + copy_len]
                else:  # overlapping copy repeats recent bytes
                    chunk = bytes(out[-distance:])
                    out += (chunk * (copy_len // distance + 1))[:copy_len]
                mlen -= copy_len
                if dcode != 0:
                    ring[ridx & 3] = distance
                    ridx += 1
            else:
                # static dictionary reference
                if copy_len < 4 or copy_len > 24 or _DICT_SIZE_BITS[copy_len] == 0:
                    raise ValueError(
                        f"invalid dictionary word length {copy_len} at bit {bits.bit_offset()}"
                    )
                address = distance - max_dist - 1
                sbits = _DICT_SIZE_BITS[copy_len]
                word_id = address & ((1 << sbits) - 1)
                tid = address >> sbits
                if tid >= _NUM_TRANSFORMS:
                    raise ValueError(f"dictionary transform {tid} out of range at bit {bits.bit_offset()}")
                body = _dictionary()
                woff = _DICT_OFFSETS[copy_len] + word_id * copy_len
                piece = _transform_word(body[woff : woff + copy_len], tid)
                if len(piece) > mlen:
                    raise ValueError(f"dictionary word overruns meta-block at bit {bits.bit_offset()}")
                out += piece
                mlen -= len(piece)
            p1 = out[-1]
            p2 = out[-2] if len(out) >= 2 else 0

        if islast:
            break
    bits.check_end()
    return bytes(out)

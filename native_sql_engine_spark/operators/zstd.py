"""From-scratch Zstandard (RFC 8878) decompression — stdlib only.

Completes the parquet page-codec set next to snappy/gzip (parquet codec 6
is what current Spark/Arrow writers emit by default on many deployments)
and extends the corpus-decompress operator family.  Implements the full
single-threaded decoding path of the public spec:

- frame header (magic, descriptor, window descriptor, frame content size,
  dictionary-id field), skippable frames, concatenated frames;
- block framing (raw / RLE / compressed) with the 21-bit size field;
- literals section: raw / RLE / Huffman-compressed / treeless, 1-stream
  and 4-stream layouts with the jump table;
- Huffman: direct 4-bit weights and FSE-compressed weights (two
  interleaved states over a backward bitstream), canonical table build
  (rank-ordered, implied last weight completing a power of two);
- FSE: normalized-count descriptor (threshold-coded probabilities with
  zero-repeat flags), table spread (step = 5/8·size + 3, less-than-one
  symbols parked at the high end), state-machine decode;
- sequences: predefined / RLE / FSE-described / repeat modes for the
  literals-length, offset and match-length alphabets, the documented
  read order (OF→ML→LL bits, LL→ML→OF state updates), the three-slot
  repeat-offset history with the literals-length-0 shift rule;
- sequence execution with overlapping match copies over the frame window
  (per-frame windows: matches never cross a frame boundary);
- external dictionaries (RFC 8878 §5: entropy-table preload, initial
  repeat offsets, window-prefix content) via ``ZstdDict`` /
  ``zstd_decompress(buf, dictionary=...)`` — frames naming a dictionary
  that was not supplied raise ``ValueError`` stating the required id;
- XXH64 content checksum verification (pinned against the public check
  value for the empty input).

Malformed payloads raise positioned ``ValueError`` (shared codec-layer
contract).  Fixtures are cross-verified against the reference ``zstd``
CLI (including ``--train``-built dictionaries) and pyarrow's bindings in
tests/test_zstd.py.
"""

from __future__ import annotations

import struct

__all__ = ["zstd_decompress", "zstd_compress_store", "xxh64", "ZstdDict"]

_MAGIC = 0xFD2FB528
_SKIP_MAGIC_LO = 0x184D2A50  # skippable frames: 0x184D2A50..5F


# -- XXH64 (content checksum) ---------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """Public XXH64 algorithm (the zstd frame checksum)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            lanes = struct.unpack_from("<4Q", data, i)
            v1 = (_rotl((v1 + lanes[0] * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + lanes[1] * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + lanes[2] * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + lanes[3] * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _P2) & _M64, 31) * _P1) & _M64)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        k = (_rotl((k * _P2) & _M64, 31) * _P1) & _M64
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = ((_rotl(h ^ ((k * _P1) & _M64), 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h = ((_rotl(h ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64)
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# -- bitstreams ------------------------------------------------------------------


class _FwdBits:
    """Forward LSB-first bit reader (FSE normalized-count descriptors)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.data = data
        self.pos = pos_bytes * 8

    def read(self, n: int) -> int:
        p = self.pos
        if p + n > len(self.data) * 8:
            raise ValueError(f"truncated zstd descriptor at bit {p}")
        lo = p >> 3
        hi = (p + n + 7) >> 3
        v = (int.from_bytes(self.data[lo:hi], "little") >> (p & 7)) & ((1 << n) - 1)
        self.pos = p + n
        return v

    def peek(self, n: int) -> int:
        p = self.pos
        lo = p >> 3
        hi = (p + n + 7) >> 3
        return (int.from_bytes(self.data[lo:hi], "little") >> (p & 7)) & ((1 << n) - 1)

    def byte_pos(self) -> int:
        return (self.pos + 7) >> 3


class _BackBits:
    """Backward bit reader: zstd entropy payloads are written LSB-first and
    read back-to-front starting under a 1-bit sentinel in the last byte.
    Reads past the start shift in zero bits and set the overflow flag (the
    FSE interleaved-stream termination condition)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise ValueError("corrupt zstd bitstream: missing initial-bit sentinel")
        self.data = data
        self.pos = 8 * (len(data) - 1) + data[-1].bit_length() - 1

    def peek(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos - n
        if p >= 0:
            lo = p >> 3
            hi = (p + n + 7) >> 3
            return (int.from_bytes(self.data[lo:hi], "little") >> (p & 7)) & ((1 << n) - 1)
        avail = self.pos
        if avail <= 0:
            return 0
        v = int.from_bytes(self.data[: (avail + 7) >> 3], "little") & ((1 << avail) - 1)
        return v << (n - avail)

    def read(self, n: int) -> int:
        v = self.peek(n)
        self.pos -= n
        return v

    @property
    def overflowed(self) -> bool:
        return self.pos < 0


# -- FSE -------------------------------------------------------------------------


def _read_ncount(data: bytes, pos: int, max_symbol: int, max_log: int):
    """FSE normalized-count descriptor.  Returns (norm list, accuracy_log,
    next byte position).  norm[s] is the probability of symbol s; -1 marks
    a less-than-one symbol."""
    br = _FwdBits(data, pos)
    al = br.read(4) + 5
    if al > max_log:
        raise ValueError(f"FSE accuracy log {al} exceeds the format bound {max_log}")
    threshold = 1 << al
    nb_bits = al + 1
    remaining = threshold + 1
    norm: list[int] = []
    previous0 = False
    while remaining > 1:
        if len(norm) > max_symbol:
            raise ValueError("FSE descriptor exceeds the alphabet")
        if previous0:
            # runs of zero-probability symbols: 2-bit repeat flags
            while br.peek(2) == 3:
                br.read(2)
                norm.extend([0, 0, 0])
            norm.extend([0] * br.read(2))
            if len(norm) > max_symbol + 1:
                raise ValueError("FSE zero-run exceeds the alphabet")
            previous0 = False
            continue
        max_ = (2 * threshold - 1) - remaining
        if (br.peek(nb_bits) & (threshold - 1)) < max_:
            count = br.read(nb_bits - 1)
        else:
            count = br.read(nb_bits)
            if count >= threshold:
                count -= max_
        count -= 1  # -1 = less-than-one probability
        remaining -= -count if count < 0 else count
        norm.append(count)
        previous0 = count == 0
        while remaining < threshold:
            nb_bits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("FSE normalized counts do not sum to the table size")
    return norm, al, br.byte_pos()


def _build_fse_table(norm: list[int], al: int):
    """Decode table: index -> (symbol, nb_bits, new_state_base)."""
    size = 1 << al
    symbol_of = [0] * size
    high = size - 1
    nxt: dict[int, int] = {}
    for s, c in enumerate(norm):
        if c == -1:
            symbol_of[high] = s
            high -= 1
            nxt[s] = 1
        elif c:
            nxt[s] = c
    step = (size >> 1) + (size >> 3) + 3
    pos = 0
    for s, c in enumerate(norm):
        for _ in range(max(c, 0)):
            symbol_of[pos] = s
            pos = (pos + step) & (size - 1)
            while pos > high:
                pos = (pos + step) & (size - 1)
    if pos != 0:
        raise ValueError("FSE table spread did not close the cycle")
    table = []
    for i in range(size):
        s = symbol_of[i]
        x = nxt[s]
        nxt[s] = x + 1
        nb = al - (x.bit_length() - 1)
        table.append((s, nb, (x << nb) - size))
    return table


class _FseState:
    """One FSE decoding state over a backward bitstream."""

    __slots__ = ("table", "state")

    def __init__(self, table, br: _BackBits, al: int):
        self.table = table
        self.state = br.read(al)

    def symbol(self) -> int:
        return self.table[self.state][0]

    def update(self, br: _BackBits) -> None:
        _s, nb, base = self.table[self.state]
        self.state = base + br.read(nb)


class _RleState:
    """Degenerate 'table': one symbol, zero update bits (RLE mode)."""

    __slots__ = ("sym",)

    def __init__(self, sym: int):
        self.sym = sym

    def symbol(self) -> int:
        return self.sym

    def update(self, br: _BackBits) -> None:
        pass


# -- Huffman ----------------------------------------------------------------------


def _read_huf_weights(data: bytes, pos: int):
    """Huffman tree description: direct 4-bit weights (header >= 128) or
    FSE-compressed weights.  Returns (weights WITHOUT the implied last
    symbol, next position)."""
    hb = data[pos]
    pos += 1
    if hb >= 128:  # direct representation
        n = hb - 127
        nbytes = (n + 1) // 2
        raw = data[pos : pos + nbytes]
        if len(raw) < nbytes:
            raise ValueError("truncated direct Huffman weights")
        weights = []
        for i in range(n):
            b = raw[i >> 1]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return weights, pos + nbytes
    comp = data[pos : pos + hb]
    if len(comp) < hb:
        raise ValueError("truncated FSE-compressed Huffman weights")
    norm, al, np_ = _read_ncount(comp, 0, 255, 6)
    table = _build_fse_table(norm, al)
    br = _BackBits(comp[np_:])
    s1 = _FseState(table, br, al)
    s2 = _FseState(table, br, al)
    weights: list[int] = []
    for _ in range(512):  # 255 symbols max; generous runaway bound
        weights.append(s1.symbol())
        s1.update(br)
        if br.overflowed:
            weights.append(s2.symbol())
            break
        weights.append(s2.symbol())
        s2.update(br)
        if br.overflowed:
            weights.append(s1.symbol())
            break
    else:
        raise ValueError("FSE weight stream does not terminate")
    return weights, pos + hb


def _build_huf_table(weights: list[int]):
    """Canonical Huffman decode table from transmitted weights (the last
    symbol's weight is implied: it completes the sum to a power of two).
    Returns (table_log, D) with D[peek(table_log)] = (symbol, nb_bits)."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("Huffman weights are all zero")
    table_log = total.bit_length()  # total < 2^tl strictly (implied w >= 1)
    if table_log > 11:
        raise ValueError(f"Huffman code length {table_log} exceeds the 11-bit bound")
    left = (1 << table_log) - total
    if left & (left - 1):
        raise ValueError("Huffman weights do not complete a power of two")
    weights = weights + [left.bit_length()]
    # rank-ordered fill: weight w occupies 2^(w-1) consecutive cells, lowest
    # weights (longest codes) first, symbols in natural order within a rank
    rank_count = [0] * (table_log + 2)
    for w in weights:
        rank_count[w] += 1
    start = [0] * (table_log + 2)
    nxt = 0
    for w in range(1, table_log + 1):
        start[w] = nxt
        nxt += rank_count[w] << (w - 1)
    if nxt != (1 << table_log):
        raise ValueError("Huffman rank layout does not fill the table")
    D = [(0, 0)] * (1 << table_log)
    for sym, w in enumerate(weights):
        if w == 0:
            continue
        ln = 1 << (w - 1)
        nb = table_log + 1 - w
        for k in range(start[w], start[w] + ln):
            D[k] = (sym, nb)
        start[w] += ln
    return table_log, D


def _huf_decode_stream(data: bytes, table_log: int, D, n_out: int) -> bytearray:
    br = _BackBits(data)
    out = bytearray()
    for _ in range(n_out):
        sym, nb = D[br.peek(table_log)]
        br.pos -= nb
        out.append(sym)
    if br.pos != 0:
        raise ValueError(f"Huffman stream not fully consumed ({br.pos} bits left)")
    return out


# -- literals section --------------------------------------------------------------


def _decode_literals(block: bytes, pos: int, ctx: dict):
    """Returns (literals bytes, next position inside the block)."""
    b0 = block[pos]
    lit_type = b0 & 3
    size_fmt = (b0 >> 2) & 3
    if lit_type in (0, 1):  # Raw / RLE
        if size_fmt in (0, 2):  # 00/10: 5-bit size, 1-byte header
            regen = b0 >> 3
            pos += 1
        elif size_fmt == 1:
            regen = (b0 >> 4) | (block[pos + 1] << 4)
            pos += 2
        else:
            regen = (b0 >> 4) | (block[pos + 1] << 4) | (block[pos + 2] << 12)
            pos += 3
        if lit_type == 0:
            lits = block[pos : pos + regen]
            if len(lits) < regen:
                raise ValueError("raw literals overrun the block")
            return lits, pos + regen
        return bytes([block[pos]]) * regen, pos + 1
    # Compressed (2) / Treeless (3)
    if size_fmt == 0:
        n_streams = 1
        regen = (b0 >> 4) | ((block[pos + 1] & 0x3F) << 4)
        comp = (block[pos + 1] >> 6) | (block[pos + 2] << 2)
        pos += 3
    elif size_fmt == 1:
        n_streams = 4
        regen = (b0 >> 4) | ((block[pos + 1] & 0x3F) << 4)
        comp = (block[pos + 1] >> 6) | (block[pos + 2] << 2)
        pos += 3
    elif size_fmt == 2:
        n_streams = 4
        regen = (b0 >> 4) | (block[pos + 1] << 4) | ((block[pos + 2] & 3) << 12)
        comp = (block[pos + 2] >> 2) | (block[pos + 3] << 6)
        pos += 4
    else:
        n_streams = 4
        regen = (b0 >> 4) | (block[pos + 1] << 4) | ((block[pos + 2] & 0x3F) << 12)
        comp = (block[pos + 2] >> 6) | (block[pos + 3] << 2) | (block[pos + 4] << 10)
        pos += 5
    section = block[pos : pos + comp]
    if len(section) < comp:
        raise ValueError("compressed literals overrun the block")
    spos = 0
    if lit_type == 2:
        weights, spos = _read_huf_weights(section, 0)
        ctx["huf"] = _build_huf_table(weights)
    elif ctx.get("huf") is None:
        raise ValueError("treeless literals before any Huffman table in this frame")
    table_log, D = ctx["huf"]
    if n_streams == 1:
        lits = _huf_decode_stream(section[spos:], table_log, D, regen)
    else:
        s1, s2, s3 = struct.unpack_from("<3H", section, spos)
        spos += 6
        body = section[spos:]
        if s1 + s2 + s3 > len(body):
            raise ValueError("4-stream jump table overruns the literals section")
        n123 = (regen + 3) // 4
        n4 = regen - 3 * n123
        if n4 < 0:
            raise ValueError("regenerated size too small for 4 streams")
        lits = bytearray()
        bounds = [(0, s1, n123), (s1, s1 + s2, n123), (s1 + s2, s1 + s2 + s3, n123), (s1 + s2 + s3, len(body), n4)]
        for lo, hi, cnt in bounds:
            lits += _huf_decode_stream(body[lo:hi], table_log, D, cnt)
    return bytes(lits), pos + comp


# -- sequences ----------------------------------------------------------------------

# literals-length codes (RFC 8878 table): code -> (baseline, extra bits)
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048, 4096,
    8192, 16384, 32768, 65536,
]
# match-length codes: code -> (baseline, extra bits)
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
_ML_BASE = list(range(3, 35)) + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539,
]

# predefined FSE distributions (RFC 8878 §3.1.1.3.2.2)
_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2,
     2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     -1, -1, -1, -1, -1],
    5,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1,
     -1, -1, -1, -1, -1, -1],
    6,
)

_DEFAULT_TABLES: dict[str, tuple] = {}


def _default_table(cat: str):
    if cat not in _DEFAULT_TABLES:
        norm, al = {"ll": _LL_DEFAULT, "of": _OF_DEFAULT, "ml": _ML_DEFAULT}[cat]
        _DEFAULT_TABLES[cat] = (_build_fse_table(norm, al), al)
    return _DEFAULT_TABLES[cat]


_MAX_LOG = {"ll": 9, "of": 8, "ml": 9}
_MAX_SYM = {"ll": 35, "of": 31, "ml": 52}


def _read_seq_table(block: bytes, pos: int, mode: int, cat: str, ctx: dict):
    """One sequence alphabet's decoding table per its compression mode.
    Returns ((table, accuracy_log) | ('rle', symbol), next position)."""
    if mode == 0:  # predefined
        entry = ("fse", *_default_table(cat))
    elif mode == 1:  # RLE: single symbol, zero-bit states
        entry = ("rle", block[pos], 0)
        pos += 1
    elif mode == 2:  # FSE-described
        norm, al, consumed = _read_ncount(block[pos:], 0, _MAX_SYM[cat], _MAX_LOG[cat])
        entry = ("fse", _build_fse_table(norm, al), al)
        pos += consumed
    else:  # repeat: reuse the previous table of this category (same frame)
        entry = ctx.get(f"seq_{cat}")
        if entry is None:
            raise ValueError(f"repeat mode for {cat} without a previous table")
    ctx[f"seq_{cat}"] = entry
    return entry, pos


def _make_state(entry, br: _BackBits):
    kind = entry[0]
    if kind == "rle":
        return _RleState(entry[1])
    return _FseState(entry[1], br, entry[2])


def _decode_sequences(block: bytes, pos: int, ctx: dict):
    """Returns (list of (ll, ml, offset_value) triples, literals consumed
    implicitly by the executor)."""
    b0 = block[pos]
    if b0 == 0:
        return [], pos + 1
    if b0 < 128:
        n_seq = b0
        pos += 1
    elif b0 < 255:
        n_seq = ((b0 - 128) << 8) + block[pos + 1]
        pos += 2
    else:
        n_seq = block[pos + 1] + (block[pos + 2] << 8) + 0x7F00
        pos += 3
    modes = block[pos]
    pos += 1
    if modes & 3:
        raise ValueError("reserved sequence-mode bits set")
    ll_entry, pos = _read_seq_table(block, pos, modes >> 6, "ll", ctx)
    of_entry, pos = _read_seq_table(block, pos, (modes >> 4) & 3, "of", ctx)
    ml_entry, pos = _read_seq_table(block, pos, (modes >> 2) & 3, "ml", ctx)

    br = _BackBits(block[pos:])
    ll_st = _make_state(ll_entry, br)
    of_st = _make_state(of_entry, br)
    ml_st = _make_state(ml_entry, br)
    seqs = []
    for i in range(n_seq):
        of_code = of_st.symbol()
        ml_code = ml_st.symbol()
        ll_code = ll_st.symbol()
        if of_code > 31 or ml_code > 52 or ll_code > 35:
            raise ValueError("sequence code out of range")
        ofv = (1 << of_code) + br.read(of_code)
        ml = _ML_BASE[ml_code] + br.read(_ML_BITS[ml_code])
        ll = _LL_BASE[ll_code] + br.read(_LL_BITS[ll_code])
        seqs.append((ll, ml, ofv))
        if i != n_seq - 1:  # documented update order: LL, ML, OF
            ll_st.update(br)
            ml_st.update(br)
            of_st.update(br)
    if br.overflowed:
        raise ValueError("sequence bitstream overran its section")
    if br.pos != 0:
        raise ValueError(f"sequence bitstream not fully consumed ({br.pos} bits left)")
    return seqs, len(block)


def _execute(out: bytearray, literals: bytes, seqs, reps: list[int]) -> None:
    lp = 0
    for ll, ml, ofv in seqs:
        if lp + ll > len(literals):
            raise ValueError("sequence literals overrun the literals section")
        out += literals[lp : lp + ll]
        lp += ll
        if ofv > 3:
            offset = ofv - 3
            reps[2] = reps[1]
            reps[1] = reps[0]
            reps[0] = offset
        else:
            idx = ofv - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = reps[0]
            else:
                offset = reps[0] - 1 if idx == 3 else reps[idx]
                if offset == 0:
                    raise ValueError("repeat offset decayed to zero")
                if idx != 1:
                    reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
        if offset > len(out):
            raise ValueError(f"match offset {offset} exceeds window ({len(out)} bytes)")
        if ml:
            if offset >= ml:
                start = len(out) - offset
                out += out[start : start + ml]
            else:  # overlapping copy repeats the recent bytes
                chunk = bytes(out[-offset:])
                out += (chunk * (ml // offset + 1))[:ml]
    out += literals[lp:]


# -- minimal encoder ----------------------------------------------------------------


def zstd_compress_store(data: bytes, checksum: bool = True) -> bytes:
    """Minimal spec-compliant ENCODER: a single-segment frame of raw
    (store-only) blocks with frame content size and XXH64 checksum — the
    same literal-only-encoder pattern as vp8l.py: a subset every
    conformant decoder accepts, so tests and oracles get dependency-free
    fixtures (cross-validated against the reference ``zstd`` CLI in
    tests/test_zstd.py).  The DECODER is the deliverable."""
    out = bytearray(struct.pack("<I", _MAGIC))
    n = len(data)
    if n < 256:
        fhd, fcs = 0x20, struct.pack("<B", n)
    elif n < 65536 + 256:
        fhd, fcs = 0x60, struct.pack("<H", n - 256)
    elif n < 1 << 32:
        fhd, fcs = 0xA0, struct.pack("<I", n)
    else:
        fhd, fcs = 0xE0, struct.pack("<Q", n)
    if checksum:
        fhd |= 0x04
    out.append(fhd)
    out += fcs
    if n == 0:
        out += (1).to_bytes(3, "little")  # last=1, raw, size 0
    else:
        step = 65536  # within Block_Maximum_Size for any window
        for i in range(0, n, step):
            chunk = data[i : i + step]
            h = (1 if i + step >= n else 0) | (len(chunk) << 3)
            out += h.to_bytes(3, "little") + chunk
    if checksum:
        out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)


# -- frame walk ---------------------------------------------------------------------


_DICT_MAGIC = 0xEC30A437


class ZstdDict:
    """A parsed zstd dictionary (RFC 8878 §5): entropy tables to preload,
    initial repeat offsets, and the content the frame window starts with."""

    __slots__ = ("dict_id", "huf", "of", "ml", "ll", "reps", "content")

    def __init__(self, raw: bytes):
        if len(raw) < 8 or struct.unpack_from("<I", raw, 0)[0] != _DICT_MAGIC:
            raise ValueError("not a zstd dictionary (bad magic)")
        (self.dict_id,) = struct.unpack_from("<I", raw, 4)
        pos = 8
        weights, pos = _read_huf_weights(raw, pos)
        self.huf = _build_huf_table(weights)
        # FSE tables in spec order: offsets, match lengths, literals lengths
        tables = {}
        for cat in ("of", "ml", "ll"):
            norm, al, consumed = _read_ncount(raw[pos:], 0, _MAX_SYM[cat], _MAX_LOG[cat])
            tables[cat] = ("fse", _build_fse_table(norm, al), al)
            pos += consumed
        self.of, self.ml, self.ll = tables["of"], tables["ml"], tables["ll"]
        self.reps = list(struct.unpack_from("<3I", raw, pos))
        pos += 12
        self.content = raw[pos:]
        for r in self.reps:
            if r == 0 or r > len(self.content):
                raise ValueError(f"dictionary repeat offset {r} exceeds its content")


def zstd_decompress(buf: bytes, dictionary: bytes | ZstdDict | None = None) -> bytes:
    """Decode one or more concatenated zstd frames (skippable frames are
    skipped), verifying content size and XXH64 checksum when present.
    ``dictionary`` supplies the external dictionary for frames whose
    header names one (raw ``zstd --train`` output or a parsed ZstdDict)."""
    zdict = (
        ZstdDict(dictionary)
        if isinstance(dictionary, (bytes, bytearray))
        else dictionary
    )
    out = bytearray()
    pos = 0
    n = len(buf)
    while pos < n:
        if pos + 4 > n:
            raise ValueError(f"truncated frame header at byte {pos}")
        (magic,) = struct.unpack_from("<I", buf, pos)
        if (magic & 0xFFFFFFF0) == _SKIP_MAGIC_LO:
            if pos + 8 > n:
                raise ValueError(f"truncated skippable-frame size at byte {pos + 4}")
            (skip,) = struct.unpack_from("<I", buf, pos + 4)
            pos += 8 + skip
            continue
        if magic != _MAGIC:
            raise ValueError(f"bad zstd magic {magic:#x} at byte {pos}")
        try:
            pos = _decode_frame(buf, pos + 4, out, zdict)
        except (IndexError, struct.error) as ex:  # ran off the buffer mid-frame
            raise ValueError(f"truncated or malformed zstd frame: {ex}") from ex
    return bytes(out)


def _decode_frame(buf: bytes, pos: int, out: bytearray, zdict: ZstdDict | None) -> int:
    fhd = buf[pos]
    pos += 1
    if fhd & 0x08:
        raise ValueError("reserved frame-header bit set")
    single = bool(fhd & 0x20)
    checksum = bool(fhd & 0x04)
    did_flag = fhd & 3
    fcs_flag = fhd >> 6
    if not single:
        pos += 1  # window descriptor (we keep the whole frame in memory)
    did_size = (0, 1, 2, 4)[did_flag]
    use_dict = None
    if did_size:
        did = int.from_bytes(buf[pos : pos + did_size], "little")
        pos += did_size
        if did:
            if zdict is None:
                raise ValueError(
                    f"frame requires external dictionary {did}, none supplied"
                )
            if zdict.dict_id != did:
                raise ValueError(
                    f"frame requires dictionary {did}, got {zdict.dict_id}"
                )
            use_dict = zdict
    fcs = None
    fcs_size = (1 if single else 0, 2, 4, 8)[fcs_flag]
    if fcs_size:
        fcs = int.from_bytes(buf[pos : pos + fcs_size], "little")
        if fcs_size == 2:
            fcs += 256
        pos += fcs_size

    # per-frame window: dictionary content prefix, then this frame's output
    # (matches may reach into the dictionary but never into earlier frames)
    if use_dict is not None:
        win = bytearray(use_dict.content)
        ctx: dict = {
            "huf": use_dict.huf,
            "seq_of": use_dict.of,
            "seq_ml": use_dict.ml,
            "seq_ll": use_dict.ll,
        }
        reps = list(use_dict.reps)
    else:
        win = bytearray()
        ctx = {"huf": None}
        reps = [1, 4, 8]
    base = len(win)
    while True:
        if pos + 3 > len(buf):
            raise ValueError(f"truncated block header at byte {pos}")
        h = int.from_bytes(buf[pos : pos + 3], "little")
        pos += 3
        last = h & 1
        btype = (h >> 1) & 3
        bsize = h >> 3
        if btype == 0:  # raw
            win += buf[pos : pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE: one byte repeated bsize times
            win += bytes([buf[pos]]) * bsize
            pos += 1
        elif btype == 2:
            block = buf[pos : pos + bsize]
            if len(block) < bsize:
                raise ValueError(f"compressed block at byte {pos} overruns the input")
            pos += bsize
            literals, bp = _decode_literals(block, 0, ctx)
            seqs, _ = _decode_sequences(block, bp, ctx)
            _execute(win, literals, seqs, reps)
        else:
            raise ValueError("reserved block type 3")
        if last:
            break
    frame_out = bytes(win[base:])
    if fcs is not None and len(frame_out) != fcs:
        raise ValueError(
            f"frame content size mismatch: header says {fcs}, decoded {len(frame_out)}"
        )
    if checksum:
        (want,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        got = xxh64(frame_out) & 0xFFFFFFFF
        if got != want:
            raise ValueError(f"XXH64 checksum mismatch: {got:#x} != {want:#x}")
    out += frame_out
    return pos

"""From-scratch WAV + FLAC-subset audio codecs — numpy + stdlib only.

WAV: RIFF/WAVE container, PCM format 1, 8/16-bit, any channel count.

FLAC: the lossless subset real speech corpora decode with — STREAMINFO,
frame sync + CRC-8/CRC-16 verification, UTF-8-coded frame numbers,
CONSTANT / VERBATIM / FIXED(0–4) / LPC(1–32) subframes with Rice-coded
residuals (partition order 0–15, escape code 0b11111), independent
channels plus all three stereo-decorrelation modes (left/side,
right/side, mid/side — the side channel carries bits+1 per spec §9.1.3).
The encoder quantizes Levinson–Durbin LPC coefficients; lossless-ness
never depends on coefficient quality because residuals absorb the
quantization error.  Remaining honest gate: >16-bit sample depths.

CRC polynomials are pinned against published check values in
tests/test_flac.py (CRC-8 poly 0x07 of b"123456789" = 0xF4; CRC-16/BUYPASS
= 0xFEE8), so encoder and decoder cannot self-certify a wrong polynomial.
"""

from __future__ import annotations

import struct

import numpy as np

# -- CRCs (FLAC spec: CRC-8 poly x^8+x^2+x+1, CRC-16 poly x^16+x^15+x^2+1) --

_CRC8_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TABLE.append(_c)

_CRC16_TABLE = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16_TABLE.append(_c)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TABLE[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = (_CRC16_TABLE[((c >> 8) ^ b) & 0xFF] ^ (c << 8)) & 0xFFFF
    return c


# -- WAV ---------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000, bits: int = 16) -> bytes:
    """PCM WAV from (n,) or (n, channels) int samples (8-bit unsigned or
    16-bit signed per the WAV convention)."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if bits == 8:
        data = samples.astype(np.uint8).tobytes()
    elif bits == 16:
        data = samples.astype("<i2").tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes):
    """Returns (sample_rate, channels, bits, samples int32 (n, channels)).
    8-bit samples come back unsigned (0..255), 16-bit signed — the WAV
    storage conventions, unchanged."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE header)")
    try:
        return _decode_wav_body(buf)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or malformed WAV: {e}") from e


def _decode_wav_body(buf: bytes):
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, ch, rate, _br, _ba, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError(f"WAV format {audio_fmt} (non-PCM) not supported")
    if bits == 8:
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.int32)
    elif bits == 16:
        arr = np.frombuffer(data, dtype="<i2").astype(np.int32)
    else:
        raise NotImplementedError(f"{bits}-bit WAV not supported (8/16 only)")
    n = len(arr) // ch
    return rate, ch, bits, arr[: n * ch].reshape(n, ch)


# -- FLAC bit I/O --------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, nbits: int) -> int:
        # byte-chunk extraction (one int.from_bytes + shift), not per-bit
        p = (self.byte << 3) + self.bit
        end = p + nbits
        if end > len(self.data) << 3:
            raise ValueError("truncated FLAC bitstream")
        hi = (end + 7) >> 3
        chunk = int.from_bytes(self.data[p >> 3 : hi], "big")
        v = (chunk >> ((hi << 3) - end)) & ((1 << nbits) - 1)
        self.byte = end >> 3
        self.bit = end & 7
        return v

    def read_unary(self) -> int:
        # scan whole bytes for the terminating 1-bit instead of read(1) loops
        data = self.data
        n = len(data)
        byte, bit = self.byte, self.bit
        q = 0
        while True:
            if byte >= n:
                raise ValueError("truncated FLAC bitstream")
            cur = data[byte] & ((1 << (8 - bit)) - 1)  # unconsumed low bits
            if cur == 0:
                q += 8 - bit
                byte += 1
                bit = 0
                continue
            zeros = (8 - bit) - cur.bit_length()
            q += zeros
            bit += zeros + 1
            self.byte = byte + (bit >> 3)
            self.bit = bit & 7
            return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _utf8_code(n: int) -> bytes:
    """FLAC's UTF-8-style coding of frame numbers (up to 36 bits)."""
    if n < 0x80:
        return bytes([n])
    for nbytes, lead in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8), (6, 0xFC), (7, 0xFE)):
        if n < (1 << (5 * nbytes + 1)):
            out = [lead | (n >> (6 * (nbytes - 1)))]
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


def _utf8_decode(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    for i in range(7):
        if not (b0 >> (7 - i)) & 1:
            nbytes = i
            break
    v = b0 & ((1 << (7 - nbytes)) - 1)
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation in frame header")
        v = (v << 6) | (b & 0x3F)
    return v


# FIXED predictor coefficients per order (FLAC spec §9.2.2)
_FIXED = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _zigzag(v: np.ndarray) -> np.ndarray:
    return np.where(v >= 0, v * 2, -v * 2 - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _lpc_quantized(sig: np.ndarray, order: int, precision: int = 12):
    """Levinson–Durbin LPC fit, quantized to ``precision``-bit integer
    coefficients with a shift.  Returns (coefs, shift) or None when the
    signal is degenerate (constant / too short) and FIXED should be used."""
    x = sig.astype(np.float64)
    n = len(x)
    if n <= order or order < 1:
        return None
    r = np.array([float(np.dot(x[: n - k], x[k:])) for k in range(order + 1)])
    if r[0] <= 0:
        return None
    a = np.zeros(order + 1)
    a[0] = 1.0
    err = r[0]
    for i in range(1, order + 1):
        acc = float(np.dot(a[:i], r[i:0:-1]))
        if err <= 0:
            return None
        k = -acc / err
        a[: i + 1] = a[: i + 1] + k * a[i::-1][: i + 1]
        err *= 1.0 - k * k
    coefs = -a[1:]  # predictor: x[n] ≈ sum coefs[j] * x[n-1-j]
    cmax = float(np.max(np.abs(coefs)))
    if cmax == 0 or not np.isfinite(cmax):
        return None
    # shift so the largest coefficient uses the full precision-1 magnitude
    shift = precision - 1 - (int(np.floor(np.log2(cmax))) + 1)
    shift = max(0, min(15, shift))
    lim = 1 << (precision - 1)
    q = np.clip(np.round(coefs * (1 << shift)), -lim, lim - 1).astype(np.int64)
    if not q.any():
        return None
    return q, shift


def _write_residual(body: "_BitWriter", res: np.ndarray) -> None:
    """Residual coding method 0 (4-bit Rice), partition order 0."""
    body.write(0b00, 2)
    body.write(0, 4)
    mean = max(1, int(np.mean(np.abs(res))) if len(res) else 1)
    p = max(0, min(14, int(mean).bit_length()))
    body.write(p, 4)
    for u in _zigzag(res):
        q = int(u) >> p
        body.write_unary(q)
        if p:
            body.write(int(u) & ((1 << p) - 1), p)


def _write_subframe(
    body: "_BitWriter", sig: np.ndarray, sbits: int, order: int, lpc_order: int
) -> None:
    bs = len(sig)
    body.write(0, 1)  # zero padding
    lpc = _lpc_quantized(sig, lpc_order) if lpc_order else None
    if lpc is not None:
        coefs, shift = lpc
        o = lpc_order
        body.write(0b100000 | (o - 1), 6)  # LPC(o)
        body.write(0, 1)  # no wasted bits
        for k in range(o):
            body.write(int(sig[k]) & ((1 << sbits) - 1), sbits)
        prec = 12
        body.write(prec - 1, 4)
        body.write(shift, 5)
        for c in coefs:
            body.write(int(c) & ((1 << prec) - 1), prec)
        idx = np.arange(o, bs)
        pred = np.zeros(bs - o, dtype=np.int64)
        for j in range(o):
            pred += coefs[j] * sig[idx - 1 - j]
        res = sig[o:] - (pred >> shift)
        _write_residual(body, res)
        return
    o = min(order, max(0, bs - 1))
    body.write(0b001000 | o, 6)  # FIXED(o)
    body.write(0, 1)  # no wasted bits
    for k in range(o):
        body.write(int(sig[k]) & ((1 << sbits) - 1), sbits)
    res = sig.copy()
    for _ in range(o):  # o-th order difference
        res = np.diff(res)
    _write_residual(body, res)


#: channel-assignment codes for the stereo-decorrelation modes (spec §9.1.3)
_STEREO_MODES = {"left_side": 0b1000, "right_side": 0b1001, "mid_side": 0b1010}


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 16000,
    bits: int = 16,
    block_size: int = 4096,
    order: int = 2,
    mode: str = "indep",
    lpc_order: int = 0,
) -> bytes:
    """FLAC-subset encode.  ``mode`` picks the channel assignment:
    ``indep`` (any channel count) or ``left_side``/``right_side``/
    ``mid_side`` (stereo only).  ``lpc_order`` > 0 emits LPC subframes
    (quantized Levinson–Durbin, precision 12) with FIXED(order) as the
    fallback for degenerate blocks; 0 keeps the FIXED path."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if not 0 <= order <= 4:
        raise ValueError("fixed order must be 0..4")
    if not 0 <= lpc_order <= 32:
        raise ValueError("lpc order must be 0..32")
    if mode != "indep" and ch != 2:
        raise ValueError(f"stereo mode {mode!r} requires exactly 2 channels")
    if mode != "indep" and mode not in _STEREO_MODES:
        raise ValueError(f"unknown channel mode {mode!r}")

    out = bytearray(b"fLaC")
    # STREAMINFO (last-metadata flag set, type 0, length 34)
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    info = si.flush() + b"\x00" * 16  # md5 unset (all zero = unknown)
    out += bytes([0x80]) + struct.pack(">I", len(info))[1:] + info

    ca_code = (ch - 1) if mode == "indep" else _STEREO_MODES[mode]
    for fi, start in enumerate(range(0, n, block_size)):
        blk = samples[start : start + block_size]
        bs = len(blk)
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed-blocksize stream
        hdr.write(0b0111, 4)  # block size: 16-bit at end of header
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.write(ca_code, 4)
        hdr.write({8: 0b001, 16: 0b100}[bits], 3)
        hdr.write(0, 1)  # reserved
        head = hdr.flush() + _utf8_code(fi) + struct.pack(">H", bs - 1)
        head += bytes([crc8(head)])

        if mode == "indep":
            sigs = [blk[:, c] for c in range(ch)]
            sbits = [bits] * ch
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right  # fits in bits+1
            if mode == "left_side":
                sigs, sbits = [left, side], [bits, bits + 1]
            elif mode == "right_side":
                sigs, sbits = [side, right], [bits + 1, bits]
            else:  # mid_side: mid is the floored average (spec §9.1.3)
                sigs, sbits = [(left + right) >> 1, side], [bits, bits + 1]

        body = _BitWriter()
        for sig, sb in zip(sigs, sbits):
            _write_subframe(body, sig, sb, order, lpc_order)
        payload = head + body.flush()
        out += payload + struct.pack(">H", crc16(payload))
    return bytes(out)


def decode_flac(buf: bytes):
    """Decode a FLAC-subset stream.  Returns (sample_rate, channels, bits,
    samples int32 (n, channels)).  Verifies frame-header CRC-8 and frame
    CRC-16."""
    if buf[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC signature)")
    try:
        return _decode_flac_body(buf)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or malformed FLAC: {e}") from e


def _decode_flac_body(buf: bytes):
    pos = 4
    rate = ch = bits = total = None
    while True:
        hdr = buf[pos]
        btype = hdr & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + buf[pos + 1 : pos + 4])
        body = buf[pos + 4 : pos + 4 + length]
        if btype == 0:  # STREAMINFO
            br = _BitReader(body)
            br.read(16)
            br.read(16)
            br.read(24)
            br.read(24)
            rate = br.read(20)
            ch = br.read(3) + 1
            bits = br.read(5) + 1
            total = br.read(36)
        pos += 4 + length
        if hdr & 0x80:
            break
    if rate is None:
        raise ValueError("FLAC missing STREAMINFO")
    if bits not in (8, 16):
        raise NotImplementedError(f"{bits}-bit FLAC not supported (8/16 only)")

    chans: list[list[int]] = [[] for _ in range(ch)]
    while pos < len(buf):
        frame_start = pos
        br = _BitReader(buf, pos)
        if br.read(14) != 0b11111111111110:
            raise ValueError(f"bad frame sync at byte {pos}")
        br.read(1)
        br.read(1)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ca = br.read(4)
        ss_code = br.read(3)
        br.read(1)
        if ca > 0b1010:
            raise ValueError(f"reserved channel assignment {ca:#06b}")
        nch = ca + 1 if ca <= 7 else 2
        if nch != ch:
            raise ValueError("frame channel count differs from STREAMINFO")
        _utf8_decode(br)
        if bs_code == 0b0110:
            bs = br.read(8) + 1
        elif bs_code == 0b0111:
            bs = br.read(16) + 1
        elif bs_code >= 0b1000:
            bs = 256 << (bs_code - 8)
        elif 0b0010 <= bs_code <= 0b0101:
            bs = 576 << (bs_code - 2)
        elif bs_code == 0b0001:
            bs = 192
        else:
            raise ValueError(f"reserved block-size code {bs_code}")
        if sr_code == 0b1100:
            br.read(8)
        elif sr_code in (0b1101, 0b1110):
            br.read(16)
        header_end = br.byte  # CRC-8 byte position (header is byte-aligned here)
        if crc8(buf[frame_start:header_end]) != buf[header_end]:
            raise ValueError(f"frame header CRC-8 mismatch at byte {frame_start}")
        br = _BitReader(buf, header_end + 1)

        sbits = {0b001: 8, 0b100: 16, 0b000: bits}.get(ss_code)
        if sbits is None:
            raise NotImplementedError(f"sample-size code {ss_code} not supported")

        sigs: list[list[int]] = []
        for c in range(ch):
            # the side channel of a decorrelated pair carries one extra bit
            extra = 1 if (ca == 0b1000 and c == 1) or (ca == 0b1001 and c == 0) or (ca == 0b1010 and c == 1) else 0
            if br.read(1) != 0:
                raise ValueError("subframe padding bit not zero")
            stype = br.read(6)
            wasted = 0
            if br.read(1):  # wasted-bits flag: unary count follows
                wasted = br.read_unary() + 1
            eff = sbits + extra - wasted
            if stype == 0b000000:  # CONSTANT
                v = _sign_extend(br.read(eff), eff)
                sig = [v] * bs
            elif stype == 0b000001:  # VERBATIM
                sig = [_sign_extend(br.read(eff), eff) for _ in range(bs)]
            elif 0b001000 <= stype <= 0b001100:  # FIXED(0..4)
                o = stype & 0x07
                warm = [_sign_extend(br.read(eff), eff) for _ in range(o)]
                res = _read_residual(br, bs, o)
                # FIXED(o) prediction is the o-th difference operator, so
                # reconstruction is o-fold prefix-sum integration seeded by
                # the warmup's difference pyramid — fully vectorized.
                level = np.asarray(res, dtype=np.int64)
                wa = np.asarray(warm, dtype=np.int64)
                for k in range(o - 1, -1, -1):
                    seed = np.diff(wa, k) if k else wa  # diff^k of warmup
                    full = np.empty(bs - k, dtype=np.int64)
                    full[: o - k] = seed
                    full[o - k :] = seed[-1] + np.cumsum(level[o - k - 1 :])
                    level = full
                sig = level.tolist()
            elif stype >= 0b100000:  # LPC(1..32)
                o = (stype & 0x1F) + 1
                warm = [_sign_extend(br.read(eff), eff) for _ in range(o)]
                prec = br.read(4) + 1
                if prec == 16:
                    raise ValueError("invalid LPC precision code 0b1111")
                shift = _sign_extend(br.read(5), 5)
                if shift < 0:
                    raise ValueError("negative LPC shift is forbidden")
                coefs = [_sign_extend(br.read(prec), prec) for _ in range(o)]
                res = _read_residual(br, bs, o)
                sig = warm[:]
                for i in range(o, bs):
                    pred = sum(coefs[j] * sig[i - 1 - j] for j in range(o)) >> shift
                    sig.append(pred + res[i - o])
            else:
                raise ValueError(f"reserved subframe type {stype:#08b}")
            if wasted:
                sig = [s << wasted for s in sig]
            sigs.append(sig)
        if ca > 7:  # undo stereo decorrelation (spec §9.1.3)
            s0 = np.asarray(sigs[0], dtype=np.int64)
            s1 = np.asarray(sigs[1], dtype=np.int64)
            if ca == 0b1000:  # left/side
                left, right = s0, s0 - s1
            elif ca == 0b1001:  # right/side (side first, right second)
                left, right = s1 + s0, s1
            else:  # mid/side: mid lost its low bit, recovered from side's
                mid2 = (s0 << 1) | (s1 & 1)
                left, right = (mid2 + s1) >> 1, (mid2 - s1) >> 1
            sigs = [left.tolist(), right.tolist()]
        for c in range(ch):
            chans[c].extend(sigs[c])
        br.align()
        if crc16(buf[frame_start : br.byte]) != struct.unpack_from(">H", buf, br.byte)[0]:
            raise ValueError(f"frame CRC-16 mismatch at byte {frame_start}")
        pos = br.byte + 2

    n = min(len(x) for x in chans)
    if total:
        n = min(n, total)
    arr = np.array([x[:n] for x in chans], dtype=np.int32).T
    return rate, ch, bits, arr


def _sign_extend(v: int, nbits: int) -> int:
    return v - (1 << nbits) if v & (1 << (nbits - 1)) else v


def _read_residual(br: _BitReader, bs: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    out: list[int] = []
    for part in range(nparts):
        cnt = (bs >> porder) - (order if part == 0 else 0)
        if cnt < 0:
            raise ValueError("rice partition smaller than predictor order")
        p = br.read(pbits)
        if p == escape:  # unencoded: raw nbits follow
            nb = br.read(5)
            out.extend(_sign_extend(br.read(nb), nb) if nb else 0 for _ in range(cnt))
        else:
            for _ in range(cnt):
                q = br.read_unary()
                u = (q << p) | (br.read(p) if p else 0)
                out.append(_unzigzag(u))
    return out

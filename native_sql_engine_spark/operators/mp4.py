"""From-scratch ISO BMFF (MP4) container parsing — struct + stdlib only.

Parses the box (atom) tree of ISO/IEC 14496-12 media files and extracts
the metadata a large-scale video pipeline needs BEFORE committing to a
decode: brand, movie duration/timescale, per-track handler type, sample
entry (codec) fourcc, visual dimensions, sample count, and average rate.
Parsing is pure container-level work — no codec bitstream is touched, so
this is complete without ffmpeg-class code (H.264/H.265 payload decode
remains the honest gate in multimodal.py).

Also provides ``build_mp4``: a minimal writer emitting a spec-shaped
ftyp/moov/mdat tree (mvhd, trak/tkhd, mdia/mdhd/hdlr, stbl with
stsd/stts/stsc/stsz/stco) used by tests and the closed-form oracle
corpus.  Reference parity: the reference engine reads media metadata
through external libs; here the container walk itself is first-class.

Malformed payloads raise positioned ``ValueError`` (same contract as
jpeg.py/png.py/gif.py/tiff.py/flac.py).
"""

from __future__ import annotations

import struct

__all__ = ["build_mp4", "parse_mp4_meta", "iter_boxes"]

#: container boxes whose payload is a sequence of child boxes
_CONTAINERS = {
    b"moov",
    b"trak",
    b"mdia",
    b"minf",
    b"stbl",
    b"edts",
    b"udta",
    b"dinf",
    b"mvex",
    b"moof",
    b"traf",
}


def iter_boxes(buf: bytes, start: int = 0, end: int | None = None):
    """Yield (fourcc, payload_start, payload_end) for each box in
    ``buf[start:end]``.  Handles 32-bit sizes, 64-bit largesize (size==1)
    and to-end-of-file (size==0) boxes."""
    pos = start
    end = len(buf) if end is None else end
    while pos < end:
        if pos + 8 > end:
            raise ValueError(f"truncated box header at byte {pos}")
        (size,) = struct.unpack_from(">I", buf, pos)
        fourcc = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize follows
            if pos + 16 > end:
                raise ValueError(f"truncated largesize box at byte {pos}")
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            body = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"box {fourcc!r} at byte {pos} overruns its parent")
        yield fourcc, body, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, fourcc: bytes):
    for fc, b, e in iter_boxes(buf, start, end):
        if fc == fourcc:
            return b, e
    return None


def _parse_track(buf: bytes, start: int, end: int) -> dict:
    out: dict = {
        "track_id": None,
        "handler": None,
        "codec": None,
        "width": 0,
        "height": 0,
        "timescale": 0,
        "duration": 0,
        "n_samples": 0,
    }
    tkhd = _find(buf, start, end, b"tkhd")
    if tkhd:
        b, _ = tkhd
        ver = buf[b]
        # layout after version+flags: times(2×4|2×8) id(4) reserved(4)
        # duration(4|8) reserved(8) layer/group/volume/reserved(8) matrix(36)
        if ver == 1:
            out["track_id"] = struct.unpack_from(">I", buf, b + 4 + 16)[0]
            geo = b + 4 + (16 + 4 + 4 + 8) + 8 + 8 + 36
        else:
            out["track_id"] = struct.unpack_from(">I", buf, b + 4 + 8)[0]
            geo = b + 4 + (8 + 4 + 4 + 4) + 8 + 8 + 36
        w, h = struct.unpack_from(">II", buf, geo)
        out["width"], out["height"] = w >> 16, h >> 16  # 16.16 fixed point
    mdia = _find(buf, start, end, b"mdia")
    if not mdia:
        return out
    ms, me = mdia
    mdhd = _find(buf, ms, me, b"mdhd")
    if mdhd:
        b, _ = mdhd
        if buf[b] == 1:
            ts, dur = struct.unpack_from(">IQ", buf, b + 4 + 16)
        else:
            ts, dur = struct.unpack_from(">II", buf, b + 4 + 8)
        out["timescale"], out["duration"] = ts, dur
    hdlr = _find(buf, ms, me, b"hdlr")
    if hdlr:
        b, _ = hdlr
        out["handler"] = buf[b + 8 : b + 12].decode("latin1")
    minf = _find(buf, ms, me, b"minf")
    if not minf:
        return out
    stbl = _find(buf, minf[0], minf[1], b"stbl")
    if not stbl:
        return out
    ss, se = stbl
    stsd = _find(buf, ss, se, b"stsd")
    if stsd:
        b, e = stsd
        (n_entries,) = struct.unpack_from(">I", buf, b + 4)
        if n_entries and b + 16 <= e:
            out["codec"] = buf[b + 12 : b + 16].decode("latin1")
    stsz = _find(buf, ss, se, b"stsz")
    if stsz:
        b, _ = stsz
        _sample_size, count = struct.unpack_from(">II", buf, b + 4)
        out["n_samples"] = count
    elif (stts := _find(buf, ss, se, b"stts")) is not None:
        b, e = stts
        (n_ent,) = struct.unpack_from(">I", buf, b + 4)
        total = 0
        for i in range(n_ent):
            cnt, _delta = struct.unpack_from(">II", buf, b + 8 + 8 * i)
            total += cnt
        out["n_samples"] = total
    return out


def parse_mp4_meta(buf: bytes) -> dict:
    """Walk the box tree and return movie-level + per-track metadata:

    ``{"brand", "timescale", "duration", "duration_ms", "n_tracks",
    "tracks": [{"track_id", "handler", "codec", "width", "height",
    "timescale", "duration", "n_samples"}, ...]}``
    """
    if len(buf) < 12 or buf[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF payload (missing ftyp box)")
    meta: dict = {
        "brand": None,
        "timescale": 0,
        "duration": 0,
        "duration_ms": 0,
        "n_tracks": 0,
        "tracks": [],
    }
    try:
        for fc, b, e in iter_boxes(buf):
            if fc == b"ftyp":
                meta["brand"] = buf[b : b + 4].decode("latin1")
            elif fc == b"moov":
                for cfc, cb, ce in iter_boxes(buf, b, e):
                    if cfc == b"mvhd":
                        if buf[cb] == 1:
                            ts, dur = struct.unpack_from(">IQ", buf, cb + 4 + 16)
                        else:
                            ts, dur = struct.unpack_from(">II", buf, cb + 4 + 8)
                        meta["timescale"], meta["duration"] = ts, dur
                    elif cfc == b"trak":
                        meta["tracks"].append(_parse_track(buf, cb, ce))
    except struct.error as ex:
        raise ValueError(f"truncated or malformed MP4: {ex}") from ex
    meta["n_tracks"] = len(meta["tracks"])
    if meta["timescale"]:
        meta["duration_ms"] = meta["duration"] * 1000 // meta["timescale"]
    return meta


# -- minimal writer (test / oracle fixture) -----------------------------------


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B", version) + struct.pack(">I", flags)[1:] + payload)


_UNITY_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def build_mp4(
    width: int,
    height: int,
    n_frames: int,
    fps: int = 30,
    timescale: int = 1000,
    brand: bytes = b"isom",
    codec: bytes = b"avc1",
    handler: bytes = b"vide",
    mdat: bytes = b"",
) -> bytes:
    """Minimal spec-shaped single-track MP4 (ftyp + moov + mdat).  The mdat
    payload is opaque — callers exercising the parser, not a decoder."""
    delta = timescale // fps
    duration = n_frames * delta
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 512) + brand + b"avc1")

    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100)  # rate 1.0, volume 1.0
        + b"\x00" * 10
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _full(
        b"tkhd",
        0,
        7,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, timescale, duration) + struct.pack(">HH", 0x55C4, 0)
    )
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + handler + b"\x00" * 12 + b"engine\x00")
    # visual sample entry: 6 reserved + data-ref-index, then the 70-byte
    # visual fields (pre_defined/reserved, width/height, resolutions, ...)
    entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame count
        + b"\x00" * 32  # compressor name
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(codec, entry))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n_frames, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, max(n_frames, 1), 1))
    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n_frames) + b"".join(struct.pack(">I", 1) for _ in range(n_frames)),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, 0))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + moov + _box(b"mdat", mdat)

"""From-scratch AVI (RIFF) container + MJPEG video decode — stdlib only.

AVI is the one mainstream *compressed* video format this engine can decode
end-to-end without ffmpeg-class code: the container is a RIFF chunk tree
(little-endian sibling of the WAV parser in flac.py) and Motion-JPEG
frames are plain baseline JPEGs — each '00dc' chunk feeds the from-scratch
Huffman+IDCT codec in operators/jpeg.py.

Writer (`build_avi_mjpeg`) emits the spec-shaped tree — hdrl(avih,
strl(strh 'vids'/'MJPG', strf BITMAPINFOHEADER)), movi('00dc' chunks,
word-aligned), idx1 — used by tests and the closed-form oracle corpus.

Malformed payloads raise positioned ``ValueError`` (the shared codec-layer
contract); codecs other than MJPG raise ``NotImplementedError`` (honest
gate: H.264-in-AVI genuinely needs a bitstream decoder).
"""

from __future__ import annotations

import struct

__all__ = ["build_avi_mjpeg", "parse_avi", "decode_avi_frames"]


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""  # RIFF chunks are word-aligned
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(subtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", subtype + payload)


def build_avi_mjpeg(frames: list[bytes], width: int, height: int, fps: int = 25) -> bytes:
    """Minimal spec-shaped MJPEG AVI from pre-encoded JPEG frames."""
    n = len(frames)
    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 // fps,  # dwMicroSecPerFrame
            0,
            0,
            0x10,  # AVIF_HASINDEX
            n,
            0,
            1,  # one stream
            0,
            width,
            height,
            0,
            0,
            0,
            0,
        ),
    )
    strh = _chunk(
        b"strh",
        b"vids"
        + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, width, height),
    )
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII",
            40,
            width,
            height,
            1,
            24,
            b"MJPG",
            width * height * 3,
            0,
            0,
            0,
            0,
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    movi_chunks = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_chunks)
    # idx1: one entry per frame (offset is relative to 'movi' subtype start)
    idx, off = b"", 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(buf: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(f"RIFF chunk {fourcc!r} at byte {pos} overruns its parent")
        yield fourcc, body, body + size
        pos = body + size + (size & 1)


def _collect_movi_frames(buf: bytes, start: int, end: int, frames: list) -> None:
    """Collect video-frame payloads inside a movi list, recursing into
    'LIST rec ' groups (how standard interleaved AVIs nest frames)."""
    for mfc, mb, me in _iter_chunks(buf, start, end):
        if mfc == b"LIST" and buf[mb : mb + 4] == b"rec ":
            _collect_movi_frames(buf, mb + 4, me, frames)
        elif mfc[2:4] in (b"dc", b"db"):  # compressed/uncompressed video
            frames.append(buf[mb:me])


def parse_avi(buf: bytes) -> dict:
    """Parse an AVI container.  Returns ``{"width", "height", "fps",
    "n_frames", "codec", "frames": [bytes, ...]}`` (frames = raw '00dc'
    payloads, undecoded)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (missing RIFF/AVI header)")
    width = height = 0
    fps = 0
    codec = None
    frames: list[bytes] = []
    try:
        for fc, b, e in _iter_chunks(buf, 12, len(buf)):
            if fc != b"LIST":
                continue
            sub = buf[b : b + 4]
            if sub == b"hdrl":
                for hfc, hb, he in _iter_chunks(buf, b + 4, e):
                    if hfc == b"avih":
                        vals = struct.unpack_from("<14I", buf, hb)
                        width, height = vals[8], vals[9]
                        if vals[0]:
                            fps = round(1_000_000 / vals[0])
                    elif hfc == b"LIST" and buf[hb : hb + 4] == b"strl":
                        for sfc, sb, _se in _iter_chunks(buf, hb + 4, he):
                            if sfc == b"strh" and buf[sb : sb + 4] == b"vids":
                                codec = buf[sb + 4 : sb + 8].decode("latin1")
                                scale, rate = struct.unpack_from("<II", buf, sb + 20)
                                if scale:
                                    fps = round(rate / scale)
            elif sub == b"movi":
                _collect_movi_frames(buf, b + 4, e, frames)
    except struct.error as ex:
        raise ValueError(f"truncated or malformed AVI: {ex}") from ex
    return {
        "width": width,
        "height": height,
        "fps": fps,
        "n_frames": len(frames),
        "codec": codec,
        "frames": frames,
    }


def decode_avi_frames(buf: bytes):
    """Full MJPEG-AVI video decode: parse the container, then decode every
    frame with the from-scratch JPEG codec.  Returns (meta, [ndarray, ...])
    — meta as in ``parse_avi`` minus the raw frames."""
    from .jpeg import decode_jpeg

    meta = parse_avi(buf)
    if meta["codec"] and meta["codec"].upper() not in ("MJPG", "MJPEG"):
        raise NotImplementedError(
            f"AVI codec {meta['codec']!r} needs a bitstream decoder (only MJPG here)"
        )
    out = []
    for f in meta["frames"]:
        _h, _w, _c, arr = decode_jpeg(f)
        out.append(arr)
    meta = {k: v for k, v in meta.items() if k != "frames"}
    return meta, out

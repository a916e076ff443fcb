"""From-scratch WARC (ISO 28500) reader/writer — stdlib only.

WARC is how web crawls ship (CommonCrawl et al.): a stream of records,
each a header block (WARC/1.x version line + RFC-822-style named fields +
Content-Length) followed by that many payload bytes and a blank-line
separator.  CommonCrawl-style files gzip each record as its own member
and concatenate the members; both plain and per-record-gzip layouts are
supported here (member boundaries recovered via zlib's unused_data).

Response records carry an embedded HTTP/1.x message; ``parse_http``
splits status / headers / body.  Malformed streams raise positioned
``ValueError`` — the shared codec-layer contract.
"""

from __future__ import annotations

import zlib

__all__ = [
    "build_warc",
    "iter_warc_records",
    "iter_warc_records_indexed",
    "parse_http",
    "gunzip_members",
    "surt",
]

_CRLF = b"\r\n"


def build_warc(records: list[dict], gzip_per_record: bool = False) -> bytes:
    """Serialize records — each a dict with ``warc_type``, optional
    ``uri``/``date``/``record_id``/``content_type``, and ``block``
    (payload bytes).  ``gzip_per_record=True`` emits the CommonCrawl
    member-per-record layout."""
    out = bytearray()
    for i, rec in enumerate(records):
        block = rec.get("block", b"")
        hdr = bytearray(b"WARC/1.0" + _CRLF)
        hdr += b"WARC-Type: " + rec["warc_type"].encode() + _CRLF
        hdr += (
            b"WARC-Record-ID: <urn:uuid:"
            + rec.get("record_id", f"rec-{i}").encode()
            + b">"
            + _CRLF
        )
        hdr += b"WARC-Date: " + rec.get("date", "2026-01-01T00:00:00Z").encode() + _CRLF
        if "uri" in rec:
            hdr += b"WARC-Target-URI: " + rec["uri"].encode() + _CRLF
        if "content_type" in rec:
            hdr += b"Content-Type: " + rec["content_type"].encode() + _CRLF
        hdr += b"Content-Length: " + str(len(block)).encode() + _CRLF
        member = bytes(hdr) + _CRLF + block + _CRLF + _CRLF
        if gzip_per_record:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)  # gzip wrapper
            out += co.compress(member) + co.flush()
        else:
            out += member
    return bytes(out)


def gunzip_members(buf: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the CommonCrawl WARC
    layout) into one plain byte stream."""
    out = bytearray()
    pos = 0
    while pos < len(buf):
        d = zlib.decompressobj(31)
        try:
            out += d.decompress(buf[pos:])
        except zlib.error as ex:
            raise ValueError(f"bad gzip member at byte {pos}: {ex}") from ex
        if not d.eof:
            raise ValueError(f"truncated gzip member at byte {pos}")
        remaining = len(d.unused_data)
        pos = len(buf) - remaining
        if remaining and not d.unused_data.startswith(b"\x1f\x8b"):
            raise ValueError(f"trailing garbage after gzip member at byte {pos}")
    return bytes(out)


def iter_warc_records(buf: bytes):
    """Yield ``(headers: dict, block: bytes)`` per record.  Accepts plain
    or per-record-gzipped input (sniffed via the gzip magic)."""
    if buf[:2] == b"\x1f\x8b":
        buf = gunzip_members(buf)
    pos = 0
    n = len(buf)
    while pos < n:
        if buf[pos : pos + 5] != b"WARC/":
            raise ValueError(f"expected WARC version line at byte {pos}")
        try:
            hdr_end = buf.index(_CRLF + _CRLF, pos)
        except ValueError:
            raise ValueError(f"unterminated WARC header at byte {pos}") from None
        headers: dict[str, str] = {}
        lines = buf[pos:hdr_end].split(_CRLF)
        headers["WARC-Version"] = lines[0].decode("latin1")[5:]
        for line in lines[1:]:
            k, _, v = line.decode("latin1").partition(":")
            headers[k.strip()] = v.strip()
        try:
            length = int(headers["Content-Length"])
        except (KeyError, ValueError):
            raise ValueError(f"record at byte {pos} lacks a valid Content-Length") from None
        body_start = hdr_end + 4
        if body_start + length > n:
            raise ValueError(f"record at byte {pos} overruns the buffer")
        yield headers, buf[body_start : body_start + length]
        pos = body_start + length
        while buf[pos : pos + 2] == _CRLF:  # record separator(s)
            pos += 2


def _iter_gzip_members(buf: bytes):
    """Yield (offset, length, plain bytes) per gzip member — the storage
    units a CDX index points at in the CommonCrawl layout."""
    pos = 0
    n = len(buf)
    while pos < n:
        d = zlib.decompressobj(31)
        try:
            data = d.decompress(buf[pos:])
        except zlib.error as ex:
            raise ValueError(f"bad gzip member at byte {pos}: {ex}") from ex
        if not d.eof:
            raise ValueError(f"truncated gzip member at byte {pos}")
        end = n - len(d.unused_data)
        if end < n and not d.unused_data.startswith(b"\x1f\x8b"):
            raise ValueError(f"trailing garbage after gzip member at byte {end}")
        yield pos, end - pos, data
        pos = end


def iter_warc_records_indexed(buf: bytes):
    """Yield ``(headers, block, offset, length)`` per record, where
    offset/length span the record's storage unit in the ORIGINAL buffer —
    the gzip member for per-record-gzip input (what a CDX index points
    at: seek to offset, read length bytes, gunzip, get the record), the
    plain record span otherwise."""
    if buf[:2] == b"\x1f\x8b":
        for off, ln, plain in _iter_gzip_members(buf):
            for headers, block in iter_warc_records(plain):
                yield headers, block, off, ln
        return
    pos = 0
    n = len(buf)
    while pos < n:
        if buf[pos : pos + 5] != b"WARC/":
            raise ValueError(f"expected WARC version line at byte {pos}")
        try:
            hdr_end = buf.index(_CRLF + _CRLF, pos)
        except ValueError:
            raise ValueError(f"unterminated WARC header at byte {pos}") from None
        headers: dict[str, str] = {}
        lines = buf[pos:hdr_end].split(_CRLF)
        headers["WARC-Version"] = lines[0].decode("latin1")[5:]
        for line in lines[1:]:
            k, _, v = line.decode("latin1").partition(":")
            headers[k.strip()] = v.strip()
        try:
            length = int(headers["Content-Length"])
        except (KeyError, ValueError):
            raise ValueError(f"record at byte {pos} lacks a valid Content-Length") from None
        body_start = hdr_end + 4
        if body_start + length > n:
            raise ValueError(f"record at byte {pos} overruns the buffer")
        end = body_start + length
        while buf[end : end + 2] == _CRLF:
            end += 2
        yield headers, buf[body_start : body_start + length], pos, end - pos
        pos = end


_DEFAULT_PORTS = {"http": "80", "https": "443"}


def surt(url: str) -> str:
    """Sort-friendly URI Reordering Transform (the CDX key): scheme and
    userinfo dropped, host lowercased, leading 'www.' stripped, labels
    reversed and comma-joined, default ports dropped, ')/' + path, query
    parameters sorted; fragment dropped.  E.g.
    ``https://www.Example.com/b?y=2&x=1`` -> ``com,example)/b?x=1&y=2``."""
    rest = url
    scheme = ""
    if "://" in rest:
        scheme, rest = rest.split("://", 1)
        scheme = scheme.lower()
    rest = rest.split("#", 1)[0]
    if "/" in rest:
        authority, path = rest.split("/", 1)
        path = "/" + path
    else:
        authority, path = rest, "/"
    if "@" in authority:
        authority = authority.rsplit("@", 1)[1]
    authority = authority.lower()
    host, _, port = authority.partition(":")
    if host.startswith("www."):
        host = host[4:]
    key = ",".join(reversed(host.split(".")))
    if port and port != _DEFAULT_PORTS.get(scheme, ""):
        key += ":" + port
    path, _, query = path.partition("?")
    out = key + ")" + path.lower()
    if query:
        out += "?" + "&".join(sorted(query.split("&")))
    return out


def parse_http(block: bytes):
    """Split an embedded HTTP/1.x message into (status:int, headers:dict,
    body:bytes)."""
    try:
        hdr_end = block.index(_CRLF + _CRLF)
    except ValueError:
        raise ValueError("HTTP block missing header terminator") from None
    lines = block[:hdr_end].split(_CRLF)
    parts = lines[0].decode("latin1").split()
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"bad HTTP status line {lines[0]!r}")
    status = int(parts[1])
    headers = {}
    for line in lines[1:]:
        k, _, v = line.decode("latin1").partition(":")
        headers[k.strip().lower()] = v.strip()
    return status, headers, block[hdr_end + 4 :]

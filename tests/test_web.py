"""Web-crawl preprocessing (operators/web.py, operators/warc.py):
HTML→text stripping, URL canonicalization, WARC/HTTP parsing."""

from __future__ import annotations

import pytest

from native_sql_engine_spark.operators.warc import (
    build_warc,
    gunzip_members,
    iter_warc_records,
    parse_http,
)


def _records(body: bytes):
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: "
        + str(len(body)).encode()
        + b"\r\n\r\n"
        + body
    )
    return [
        {"warc_type": "warcinfo", "block": b"software: engine\r\n"},
        {"warc_type": "request", "uri": "https://x.com/a", "block": b"GET /a HTTP/1.1\r\n\r\n"},
        {
            "warc_type": "response",
            "uri": "https://x.com/a",
            "content_type": "application/http; msgtype=response",
            "block": http,
        },
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(gz):
    body = b"<html>hello &amp; bye</html>"
    buf = build_warc(_records(body), gzip_per_record=gz)
    out = list(iter_warc_records(buf))
    assert [h["WARC-Type"] for h, _ in out] == ["warcinfo", "request", "response"]
    h, blk = out[2]
    assert h["WARC-Target-URI"] == "https://x.com/a"
    status, hh, b = parse_http(blk)
    assert status == 200 and hh["content-type"] == "text/html" and b == body


def test_warc_binary_safe_blocks():
    """Content-Length framing must survive CRLF and WARC/ look-alikes
    inside the payload."""
    body = b"\r\n\r\nWARC/1.0\r\nContent-Length: 999\r\n\r\n" + bytes(range(256))
    recs = [{"warc_type": "resource", "uri": "https://x.com/b", "block": body}]
    (out,) = list(iter_warc_records(build_warc(recs)))
    assert out[1] == body


def test_warc_errors():
    with pytest.raises(ValueError, match="version line"):
        list(iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n"))
    good = build_warc(_records(b"x"))
    with pytest.raises(ValueError, match="overruns|unterminated"):
        list(iter_warc_records(good[:-20]))
    with pytest.raises(ValueError, match="gzip"):
        gunzip_members(b"\x1f\x8b\x08garbage")
    with pytest.raises(ValueError, match="status line"):
        parse_http(b"not http\r\n\r\nbody")


def test_html_to_text_edges(spark):
    from pyspark.sql import functions as F

    from native_sql_engine_spark.operators.web import html_to_text

    cases = [
        # script containing a fake tag; nested entity decodes ONE level
        ("<script>if(a<b){x='<p>'}</script>ok &amp;lt;", "ok &lt;"),
        ("<style media='x'>p{}</style><P CLASS='a'>Hi</P>", "Hi"),
        ("<!-- <b>no</b> -->a  \n\t b", "a b"),
        ("no markup at all", "no markup at all"),
        ("&quot;q&quot;&nbsp;&#39;s&#39;", "\"q\" 's'"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], ["html"])
    got = [r.t for r in df.select(html_to_text(F.col("html")).alias("t")).collect()]
    assert got == [w for _, w in cases]


def test_url_ops(spark):
    from pyspark.sql import functions as F

    from native_sql_engine_spark.operators.web import url_domain, url_normalize

    cases = [
        (
            "HTTPS://WWW.Ex.COM:443/P?utm_source=a&id=1&utm_b=c#f",
            "www.ex.com",
            "https://www.ex.com/P?id=1",
        ),
        ("http://Host.io:80/", "host.io", "http://host.io/"),
        ("http://host.io:8080/x", "host.io", "http://host.io:8080/x"),
        ("https://a.b/x?gclid=1", "a.b", "https://a.b/x"),
        ("https://a.b/x?a=1&ref=t&b=2", "a.b", "https://a.b/x?a=1&b=2"),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], ["url"])
    rows = df.select(
        url_domain(F.col("url")).alias("d"), url_normalize(F.col("url")).alias("n")
    ).collect()
    for (u, wd, wn), r in zip(cases, rows):
        assert r.d == wd, u
        assert r.n == wn, u


def test_decompress_text_dispatch(spark):
    import bz2
    import lzma
    import zlib

    import pandas as pd

    from native_sql_engine_spark.operators.web import decompress_text

    msg = "hello compressed world é中"
    raw = msg.encode()
    gz = zlib.compressobj(6, zlib.DEFLATED, 31)
    payloads = [
        gz.compress(raw) + gz.flush(),
        bz2.compress(raw),
        lzma.compress(raw, format=lzma.FORMAT_XZ),
        zlib.compress(raw),
        raw,
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(5)), "payload": [bytearray(p) for p in payloads]})
    )
    rows = decompress_text(df, "payload", "doc_id").orderBy("media_id").collect()
    assert [r.codec for r in rows] == ["gzip", "bz2", "xz", "zlib", "plain"]
    assert all(r.text == msg and r.n_bytes == len(raw) for r in rows)


def test_warc_records_operator(spark):
    from native_sql_engine_spark.operators.web import synthesize_warc_corpus, warc_records

    docs = spark.createDataFrame([(7, "alpha beta"), (8, "gamma")], ["doc_id", "text"])
    rows = (
        warc_records(synthesize_warc_corpus(docs), "payload", "doc_id")
        .orderBy("media_id", "rec_idx")
        .collect()
    )
    assert len(rows) == 6  # 3 records per doc
    resp = [r for r in rows if r.warc_type == "response"]
    assert [r.http_status for r in resp] == [200, 200]
    assert resp[0].target_uri == "https://crawl.example/doc/7"
    assert "alpha beta" in resp[0].body and resp[0].body.startswith("<html>")
    assert all(r.http_status is None for r in rows if r.warc_type != "response")


def test_surt_rules():
    from native_sql_engine_spark.operators.warc import surt

    assert surt("https://www.Example.com/b?y=2&x=1") == "com,example)/b?x=1&y=2"
    assert surt("http://a.b.co.uk:8080/P/Q#frag") == "uk,co,b,a:8080)/p/q"
    assert surt("https://Example.com:443/") == "com,example)/"
    assert surt("http://user:pw@host.net:80/x") == "net,host)/x"
    assert surt("https://crawl.example/doc/7") == "example,crawl)/doc/7"
    assert surt("example.com/plain") == "com,example)/plain"  # schemeless


def test_warc_indexed_member_spans():
    """(offset, length) must be a self-contained storage unit: slicing the
    original buffer there and re-parsing yields exactly that record — for
    BOTH the per-record-gzip and plain layouts."""
    from native_sql_engine_spark.operators.warc import (
        build_warc,
        iter_warc_records,
        iter_warc_records_indexed,
    )

    recs = [
        {"warc_type": "warcinfo", "block": b"software: engine\r\n"},
        {"warc_type": "request", "uri": "https://x.example/1", "block": b"GET / HTTP/1.1\r\n\r\n"},
        {
            "warc_type": "response",
            "uri": "https://x.example/1",
            "content_type": "application/http; msgtype=response",
            "block": b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>hi</p>",
        },
    ]
    for gz in (True, False):
        buf = build_warc(recs, gzip_per_record=gz)
        seen = list(iter_warc_records_indexed(buf))
        assert [h["WARC-Type"] for h, *_ in seen] == ["warcinfo", "request", "response"]
        for hdr, block, off, ln in seen:
            unit = buf[off : off + ln]
            reparsed = list(iter_warc_records(unit))
            assert len(reparsed) == 1
            rh, rb = reparsed[0]
            assert rh["WARC-Type"] == hdr["WARC-Type"] and rb == block
        # spans tile the buffer exactly
        assert seen[0][2] == 0
        assert seen[-1][2] + seen[-1][3] == len(buf)


def test_warc_cdx_operator(spark):
    from native_sql_engine_spark.operators.web import synthesize_warc_corpus, warc_cdx
    import base64
    import hashlib

    df = spark.createDataFrame([(3, "some page text"), (9, "άλλο κείμενο")], ["doc_id", "text"])
    rows = warc_cdx(synthesize_warc_corpus(df), "payload", "doc_id").orderBy("media_id").collect()
    assert len(rows) == 2
    r = rows[0]
    assert r.surt_key == "example,crawl)/doc/3"
    assert r.ts == "20260101000000" and r.status == 200 and r.mime == "text/html"
    body = (
        "<html><head><script>var x=1;</script></head>"
        "<body><!-- gen --><h1>T3</h1><p>some page text</p>&amp; tail</body></html>"
    ).encode()
    assert r.body_md5 == hashlib.md5(body).hexdigest()
    assert r.digest == "sha1:" + base64.b32encode(hashlib.sha1(body).digest()).decode()
    assert r.n_bytes == len(body)
    assert r.rec_length > 0 and r.rec_offset > 0  # response is the 3rd member

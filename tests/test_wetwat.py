"""WET/WAT sidecar writers (sources/wetwat.py): the verdict's roundtrip
contract — WARC → warc_documents/extract_links → WET/WAT shards →
re-read matches the frames that produced them — plus determinism and
CC-envelope shape."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.sources.wetwat import (
    read_wat,
    read_wet,
    write_wat,
    write_wet,
)

HTML = (
    b"<html><head><title>Page %s</title></head><body>"
    b"<p>body text of page %s with words</p>"
    b'<a href="http://other.example/x">x</a>'
    b'<a href="http://third.example/y">y</a>'
    b"</body></html>"
)


def _warc_bytes() -> bytes:
    out = []
    for i in (1, 2):
        body = HTML % (str(i).encode(), str(i).encode())
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        )
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n".encode()
            + f"WARC-Target-URI: http://site.example/p{i}\r\n".encode()
            + b"WARC-Date: 2024-03-05T10:00:00Z\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            + f"Content-Length: {len(http)}\r\n\r\n".encode()
        )
        out.append(head + http + b"\r\n\r\n")
    return b"".join(out)


def _docs_and_pages(spark, tmp_path):
    from evidence_datasource_parsers_spark.sources.warc import (
        read_warc,
        warc_documents,
    )

    wdir = tmp_path / "warc"
    wdir.mkdir()
    (wdir / "a.warc").write_bytes(_warc_bytes())
    docs = warc_documents(spark, str(wdir))
    from evidence_datasource_parsers_spark.functions.html import (
        extract_links,
    )

    pages = read_warc(spark, str(wdir), responses_only=True).select(
        F.col("url"),
        F.col("warc_date").alias("crawl_ts"),
        extract_links(F.col("payload").cast("string")).alias("links"),
        F.regexp_extract(
            F.col("payload").cast("string"), r"<title>([^<]*)</title>", 1
        ).alias("title"),
    )
    return docs, pages


def test_wet_roundtrip(spark, tmp_path):
    docs, _ = _docs_and_pages(spark, tmp_path)
    out = str(tmp_path / "wet")
    manifest = write_wet(
        docs, out, ts_col="crawl_ts", n_shards=2
    ).collect()
    assert sum(m["n_records"] for m in manifest) == 2
    for m in manifest:
        assert m["path"].endswith(".warc.wet.gz")
        assert os.path.getsize(m["path"]) == m["n_bytes"]
    back = read_wet(spark, out)
    want = {
        (r["url"], r["text"])
        for r in docs.select("url", "text").collect()
    }
    got = {(r["url"], r["text"]) for r in back.collect()}
    assert got == want
    assert {r["crawl_date"] for r in back.collect()} == {
        "2024-03-05T10:00:00Z"
    }


def test_wat_roundtrip(spark, tmp_path):
    _, pages = _docs_and_pages(spark, tmp_path)
    out = str(tmp_path / "wat")
    manifest = write_wat(
        pages, out, ts_col="crawl_ts", title_col="title", n_shards=2
    ).collect()
    assert sum(m["n_records"] for m in manifest) == 2
    back = read_wat(spark, out)
    want = {
        (r["url"], tuple(r["links"]), r["title"])
        for r in pages.collect()
    }
    got = {
        (r["url"], tuple(r["links"]), r["title"])
        for r in back.collect()
    }
    assert got == want


def test_wet_is_plain_warc_with_cc_headers(spark, tmp_path):
    """Byte-level contract: gzip member, leading warcinfo, conversion
    records with Content-Length framing — what external CC tooling
    actually parses."""
    docs, _ = _docs_and_pages(spark, tmp_path)
    out = str(tmp_path / "wet")
    paths = [
        m["path"]
        for m in write_wet(docs, out, n_shards=1).collect()
    ]
    assert len(paths) == 1
    raw = gzip.decompress(open(paths[0], "rb").read())
    assert raw.startswith(b"WARC/1.0\r\n")
    assert b"WARC-Type: warcinfo" in raw
    assert raw.count(b"WARC-Type: conversion") == 2
    assert b"Content-Type: text/plain" in raw
    assert b"WARC-Target-URI: http://site.example/p1" in raw


def test_wet_writes_are_deterministic(spark, tmp_path):
    docs, _ = _docs_and_pages(spark, tmp_path)
    outs = []
    for d in ("w1", "w2"):
        out = str(tmp_path / d)
        write_wet(docs, out, n_shards=1).collect()
        fname = os.listdir(out)[0]
        outs.append(open(os.path.join(out, fname), "rb").read())
    assert outs[0] == outs[1]


def test_wat_envelope_shape(spark, tmp_path):
    """The JSON payload carries the CC envelope subset (Links with
    path=A@/href, Head.Title)."""
    import json

    _, pages = _docs_and_pages(spark, tmp_path)
    out = str(tmp_path / "wat")
    paths = [
        m["path"]
        for m in write_wat(
            pages, out, title_col="title", n_shards=1
        ).collect()
    ]
    raw = gzip.decompress(open(paths[0], "rb").read())
    payload = raw.split(b"\r\n\r\n")[3]  # warcinfo body, then 1st record
    start = raw.index(b'{"Envelope"')
    env = json.loads(raw[start:].split(b"\r\n\r\n")[0])
    links = env["Envelope"]["Payload-Metadata"][
        "HTTP-Response-Metadata"]["HTML-Metadata"]["Links"]
    assert {x["path"] for x in links} == {"A@/href"}
    assert {x["url"] for x in links} == {
        "http://other.example/x", "http://third.example/y",
    }
    assert payload is not None  # framing sanity


def test_null_text_rows_skipped(spark, tmp_path):
    docs = spark.createDataFrame(
        [("http://a.example/1", "2024-01-01T00:00:00Z", "text here"),
         ("http://a.example/2", "2024-01-01T00:00:00Z", None)],
        "url string, crawl_ts string, text string",
    )
    out = str(tmp_path / "wet")
    manifest = write_wet(docs, out, n_shards=1).collect()
    assert sum(m["n_records"] for m in manifest) == 1


def test_warc_date_is_utc_in_any_session_timezone(spark):
    """WARC-Date carries a 'Z' suffix, so the rendering must be the UTC
    wall clock regardless of spark.sql.session.timeZone (date_format
    renders in session tz; the to_utc_timestamp(current_timezone())
    shift compensates).  Regression: to_utc_timestamp(c, 'UTC') is an
    identity, which emitted LOCAL wall time mislabeled 'Z' on non-UTC
    sessions."""
    from evidence_datasource_parsers_spark.sources.wetwat import _ts_col

    import calendar

    # include the DST fall-back hour: 2026-11-01 01:30 local occurs
    # TWICE in America/Los_Angeles (08:30Z as PDT, 09:30Z as PST) — a
    # tz-function round-trip resolves the ambiguous wall time to one
    # offset and mis-renders the other instant by an hour; the epoch
    # arithmetic cannot be ambiguous
    cases = [
        (1000000200, "2001-09-09T01:50:00Z"),
        (calendar.timegm((2026, 11, 1, 8, 30, 0)),
         "2026-11-01T08:30:00Z"),
        (calendar.timegm((2026, 11, 1, 9, 30, 0)),
         "2026-11-01T09:30:00Z"),
    ]
    try:
        for tz in ["UTC", "America/Los_Angeles", "Asia/Tokyo"]:
            spark.conf.set("spark.sql.session.timeZone", tz)
            for epoch, want in cases:
                inst = spark.range(1).select(
                    F.timestamp_seconds(F.lit(epoch)).alias("crawl_ts")
                )
                got = inst.select(
                    _ts_col(inst, "crawl_ts").alias("d")
                ).collect()[0].d
                assert got == want, (tz, epoch, got)
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")

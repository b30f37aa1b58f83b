"""Legacy ARC reader (sources/arc.py): record walk, malformed resync,
WARC-schema parity, and the shared documents shaping."""

from __future__ import annotations

import gzip

import pytest

from evidence_datasource_parsers_spark.sources.arc import (
    arc_documents,
    iter_arc_records,
    read_arc,
)


def _arc_record(url: str, body: bytes, mime=b"text/html",
                date=b"19970612084000", http=True) -> bytes:
    content = (
        b"HTTP/1.0 200 OK\r\nContent-Type: " + mime + b"\r\n\r\n" + body
        if http
        else body
    )
    hdr = (
        url.encode() + b" 192.168.0.1 " + date + b" " + mime + b" "
        + str(len(content)).encode() + b"\n"
    )
    return hdr + content + b"\n"


def _filedesc() -> bytes:
    body = b"1 0 InternetArchive\nURL IP-address Archive-date Content-type Archive-length\n"
    return (
        b"filedesc://ia.arc 0.0.0.0 19970612080000 text/plain "
        + str(len(body)).encode() + b"\n" + body + b"\n"
    )


def test_iter_arc_records_basic():
    raw = _filedesc() + _arc_record(
        "http://old.example/page", b"<p>ninety-six era page</p>"
    )
    recs = list(iter_arc_records(raw))
    assert [r["warc_type"] for r in recs] == ["filedesc", "response"]
    r = recs[1]
    assert r["url"] == "http://old.example/page"
    assert r["warc_date"] == "1997-06-12T08:40:00Z"
    assert r["record_id"] == (
        "arc:19970612084000:http://old.example/page"
    )
    assert r["payload"].startswith(b"HTTP/1.0 200")


def test_iter_arc_multi_member_gzip():
    raw = gzip.compress(_filedesc()) + gzip.compress(
        _arc_record("http://a.example/", b"one")
    ) + gzip.compress(_arc_record("http://b.example/", b"two"))
    urls = [
        r["url"] for r in iter_arc_records(raw)
        if r["warc_type"] == "response"
    ]
    assert urls == ["http://a.example/", "http://b.example/"]


def test_malformed_resync_and_failfast():
    good = _arc_record("http://ok.example/", b"fine")
    raw = b"not an arc header at all\n" + good
    recs = list(iter_arc_records(raw))
    assert recs[0]["warc_type"] == "__malformed__"
    assert recs[1]["url"] == "http://ok.example/"
    assert [r["warc_type"] for r in iter_arc_records(raw, mode="DROPMALFORMED")] == ["response"]
    with pytest.raises(ValueError):
        list(iter_arc_records(raw, mode="FAILFAST"))


def test_truncation_guard():
    raw = _arc_record("http://big.example/", b"x" * 1000) + _arc_record(
        "http://after.example/", b"after"
    )
    recs = list(iter_arc_records(raw, max_payload=100))
    assert recs[0]["payload_truncated"] is True
    assert len(recs[0]["payload"]) == 100
    assert recs[1]["url"] == "http://after.example/"  # fully drained


def test_read_arc_dataframe_warc_parity(spark, tmp_path):
    (tmp_path / "a.arc.gz").write_bytes(gzip.compress(
        _filedesc()
        + _arc_record("http://x.example/p", b"<p>body text</p>")
    ))
    df = read_arc(spark, str(tmp_path), responses_only=True)
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["http_status"] == 200
    assert r["http_content_type"] == "text/html"
    assert bytes(r["payload"]) == b"<p>body text</p>"
    # schema parity with read_warc
    from evidence_datasource_parsers_spark.sources.warc import WARC_SCHEMA

    assert df.schema.simpleString() is not None
    assert [f.name for f in df.schema.fields] == [
        s.split(" ")[0] for s in WARC_SCHEMA.split(", ")
    ]


def test_arc_documents_shared_shaping(spark, tmp_path):
    """The historical crawl rides the SAME shaping as WARC: charset
    sniffing and PDF extraction over 1997-era captures."""
    from evidence_datasource_parsers_spark.functions.pdf import encode_pdf

    (tmp_path / "a.arc.gz").write_bytes(gzip.compress(
        _filedesc()
        + _arc_record(
            "http://latin.example/p",
            "<p>página São — histórica</p>".encode("cp1252"),
            mime=b"text/html",
        )
        + _arc_record(
            "http://pdf.example/r.pdf",
            encode_pdf([["ancient pdf text"]]),
            mime=b"application/pdf",
        )
    ))
    docs = arc_documents(
        spark, str(tmp_path), charset="sniff", include_pdf=True
    )
    rows = {r["url"]: r for r in docs.collect()}
    assert rows["http://latin.example/p"]["text"] == (
        "página São — histórica"
    )
    assert rows["http://latin.example/p"]["charset"] == "cp1252"
    assert rows["http://pdf.example/r.pdf"]["text"] == "ancient pdf text"
    assert rows["http://latin.example/p"]["crawl_ts"] is not None


# never-raise fuzz, same contract as the WARC/CDX walks
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=512))
def test_iter_arc_never_raises_on_garbage(raw):
    assert isinstance(list(iter_arc_records(raw)), list)

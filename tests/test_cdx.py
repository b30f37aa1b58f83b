"""CDX capture index (sources/cdx.py): member walk, offset seekability,
SURT keys, revisit digests, and the digest-dedupe map."""

from __future__ import annotations

import base64
import gzip
import hashlib

from evidence_datasource_parsers_spark.sources.cdx import (
    best_capture_per_digest,
    build_cdx_records,
    iter_warc_members,
    surt_key,
    warc_cdx,
)


def _record(rid, url, body, ctype=b"text/html", wtype=b"response",
            extra=b"", date=b"2024-03-01T12:34:56Z"):
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n\r\n" + body
    )
    hdr = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + wtype + b"\r\n"
        + b"WARC-Record-ID: <urn:uuid:" + rid + b">\r\n"
        + b"WARC-Target-URI: " + url + b"\r\n"
        + b"WARC-Date: " + date + b"\r\n"
        + extra
        + b"Content-Type: application/http; msgtype=response\r\n"
        + b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
    )
    return hdr + http + b"\r\n\r\n"


def _digest(body: bytes) -> str:
    return base64.b32encode(hashlib.sha1(body).digest()).decode()


# ---------------------------------------------------------------------------
# surt / ts


def test_surt_key():
    assert surt_key("http://www.Example.COM/Path?B=2") == (
        "com,example)/path?b=2"
    )
    assert surt_key("https://a.b.example.co.uk:8443/x") == (
        "uk,co,example,b,a):8443/x"
    )
    assert surt_key("http://example.com:80/") == "com,example)/"
    assert surt_key(None) is None
    assert surt_key("not a url") is None


def test_member_walk_plain_and_gz():
    recs = _record(b"r1", b"http://a/", b"one") + _record(
        b"r2", b"http://b/", b"two"
    )
    assert list(iter_warc_members(recs)) == [(0, len(recs), recs)]
    m1 = gzip.compress(_record(b"r1", b"http://a/", b"one"))
    m2 = gzip.compress(_record(b"r2", b"http://b/", b"two"))
    got = list(iter_warc_members(m1 + m2))
    assert [(o, ln) for o, ln, _ in got] == [(0, len(m1)), (len(m1), len(m2))]
    # truncated final member: walk stops cleanly
    assert len(list(iter_warc_members(m1 + m2[: len(m2) // 2]))) == 1


# ---------------------------------------------------------------------------
# offsets are REAL: seek + decompress round trips


def test_gz_offsets_are_seekable():
    members = [
        gzip.compress(_record(b"r1", b"http://site/a", b"body-a")),
        gzip.compress(_record(b"r2", b"http://site/b", b"body-b")),
    ]
    raw = b"".join(members)
    rows = build_cdx_records(raw, "f.warc.gz")
    assert len(rows) == 2
    for row, rid in zip(rows, (b"r1", b"r2")):
        sliced = gzip.decompress(
            raw[row["offset"] : row["offset"] + row["length"]]
        )
        assert sliced.startswith(b"WARC/1.0")
        assert b"urn:uuid:" + rid in sliced


def test_plain_offsets_are_record_spans():
    raw = _record(b"r1", b"http://site/a", b"body-a") + _record(
        b"r2", b"http://site/b", b"body-b"
    )
    rows = build_cdx_records(raw, "f.warc")
    assert len(rows) == 2
    for row, rid in zip(rows, (b"r1", b"r2")):
        sliced = raw[row["offset"] : row["offset"] + row["length"]]
        assert sliced.startswith(b"WARC/1.0")
        assert b"urn:uuid:" + rid in sliced


def test_cdx_fields_and_revisit_digest():
    body = b"shared body bytes"
    raw = _record(b"o1", b"http://www.site.com/page?X=1", body) + _record(
        b"v1", b"http://mirror/page", b"",
        wtype=b"revisit",
        extra=b"WARC-Payload-Digest: sha1:" + _digest(body).encode()
        + b"\r\n",
        date=b"2024-04-02T00:00:00Z",
    )
    rows = build_cdx_records(raw, "f.warc")
    orig, rev = rows
    assert orig["urlkey"] == "com,site)/page?x=1"
    assert orig["ts"] == "20240301123456"
    assert orig["mime"] == "text/html"
    assert orig["status"] == 200
    assert orig["digest"] == _digest(body)
    assert rev["warc_type"] == "revisit"
    assert rev["digest"] == _digest(body)  # from the header, no body


# ---------------------------------------------------------------------------
# Spark surfaces


def test_warc_cdx_frame(spark, tmp_path):
    body = b"<p>indexed page</p>"
    (tmp_path / "a.warc.gz").write_bytes(
        gzip.compress(_record(b"g1", b"http://x.example/p", body))
    )
    (tmp_path / "b.warc").write_bytes(
        _record(b"p1", b"http://y.example/q", body)
    )
    cdx = warc_cdx(spark, str(tmp_path))
    rows = {r["record_id"]: r for r in cdx.collect()}
    assert len(rows) == 2
    g = rows["<urn:uuid:g1>"]
    p = rows["<urn:uuid:p1>"]
    assert g["digest"] == p["digest"] == _digest(body)
    assert g["filename"].endswith("a.warc.gz")
    assert g["urlkey"] == "example,x)/p"
    # no shuffle: index build is one narrow pass over the archive scan
    plan = cdx._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_best_capture_per_digest(spark, tmp_path):
    body = b"duplicated across crawls"
    raw = (
        _record(b"c1", b"http://a.example/", body,
                date=b"2024-05-01T00:00:00Z")
        + _record(b"c2", b"http://b.example/", body,
                  date=b"2024-01-01T00:00:00Z")
        + _record(b"v1", b"http://c.example/", b"", wtype=b"revisit",
                  extra=b"WARC-Payload-Digest: sha1:"
                  + _digest(body).encode() + b"\r\n")
        + _record(b"u1", b"http://d.example/", b"unique")
    )
    (tmp_path / "c.warc").write_bytes(raw)
    best = best_capture_per_digest(warc_cdx(spark, str(tmp_path)))
    got = {r["digest"]: r for r in best.collect()}
    dup = got[_digest(body)]
    assert dup["ts"] == "20240101000000"  # earliest capture wins
    assert dup["url"] == "http://b.example/"
    assert dup["n_captures"] == 2  # revisit row excluded
    assert got[_digest(b"unique")]["n_captures"] == 1


# ---------------------------------------------------------------------------
# robustness: index building over garbage archives must not raise

from hypothesis import given, settings
from hypothesis import strategies as st

from evidence_datasource_parsers_spark.sources.cdx import _ts14


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=512))
def test_build_cdx_never_raises_on_garbage(raw):
    rows = build_cdx_records(raw, "g.warc")
    assert isinstance(rows, list)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=2, max_size=512).map(lambda b: b"\x1f\x8b" + b))
def test_member_walk_never_raises_on_garbage_gzip(raw):
    assert isinstance(list(iter_warc_members(raw)), list)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_surt_and_ts_never_raise(s):
    k = surt_key(s)
    assert k is None or isinstance(k, str)
    t = _ts14(s)
    assert t is None or (len(t) == 14 and t.isdigit())


# ---------------------------------------------------------------------------
# review regressions (round 8): digests hash STORED bytes, truncation
# yields NULL


def test_digest_is_over_stored_bytes_not_decoded():
    stored = gzip.compress(b"the page content")
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + stored
    )
    hdr = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:enc1>\r\n"
        b"WARC-Target-URI: http://enc.example/\r\n"
        b"WARC-Date: 2024-03-01T00:00:00Z\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
    )
    raw = hdr + http + b"\r\n\r\n"
    # a crawler's revisit record declares sha1 over the STORED body
    revisit = _record(
        b"enc2", b"http://mirror.example/", b"", wtype=b"revisit",
        extra=b"WARC-Payload-Digest: sha1:" + _digest(stored).encode()
        + b"\r\n",
    )
    rows = build_cdx_records(raw + revisit, "f.warc")
    resp, rev = rows
    assert resp["digest"] == _digest(stored)  # stored bytes, not decoded
    assert resp["digest"] == rev["digest"]  # revisit resolves


def test_truncated_payload_gets_null_digest():
    raw = _record(b"big1", b"http://big.example/", b"x" * 1000)
    rows = build_cdx_records(raw, "f.warc", max_payload=100)
    assert rows[0]["digest"] is None  # partial-body hash would match nothing


def test_fetch_captures_reads_only_indexed_ranges(spark, tmp_path):
    """The read side of the index contract: select captures relationally,
    fetch exactly those records by (filename, offset, length) — gz member
    slices and plain record spans both round-trip."""
    from evidence_datasource_parsers_spark.sources.cdx import (
        fetch_captures,
    )

    (tmp_path / "a.warc.gz").write_bytes(
        gzip.compress(_record(b"g1", b"http://x.example/keep", b"keep-gz"))
        + gzip.compress(_record(b"g2", b"http://x.example/skip", b"skip"))
    )
    (tmp_path / "b.warc").write_bytes(
        _record(b"p1", b"http://y.example/keep", b"keep-plain")
        + _record(b"p2", b"http://y.example/skip", b"skip2")
    )
    cdx = warc_cdx(spark, str(tmp_path))
    wanted = cdx.where(cdx.url.endswith("/keep"))
    got = {r["record_id"]: r for r in fetch_captures(wanted).collect()}
    assert set(got) == {"<urn:uuid:g1>", "<urn:uuid:p1>"}
    assert bytes(got["<urn:uuid:g1>"]["payload"]) == b"keep-gz"
    assert bytes(got["<urn:uuid:p1>"]["payload"]) == b"keep-plain"
    assert got["<urn:uuid:g1>"]["http_status"] == 200


def test_fetch_captures_missing_archive_skips(spark, tmp_path):
    from evidence_datasource_parsers_spark.sources.cdx import (
        fetch_captures,
    )

    (tmp_path / "a.warc.gz").write_bytes(
        gzip.compress(_record(b"g1", b"http://x.example/p", b"body"))
    )
    cdx = warc_cdx(spark, str(tmp_path)).localCheckpoint(eager=True)
    (tmp_path / "a.warc.gz").unlink()  # archive gone; index stale
    assert fetch_captures(cdx).count() == 0  # skip, never fail


def test_fetch_captures_filters_multi_record_spans(spark, tmp_path):
    """A gz member packing TWO records (non-standard but legal): each
    index row must fetch back exactly ITS record, not every record in
    the shared span."""
    from evidence_datasource_parsers_spark.sources.cdx import (
        fetch_captures,
    )

    member = gzip.compress(
        _record(b"m1", b"http://x.example/a", b"first")
        + _record(b"m2", b"http://x.example/b", b"second")
    )
    (tmp_path / "multi.warc.gz").write_bytes(member)
    cdx = warc_cdx(spark, str(tmp_path))
    assert cdx.count() == 2  # two rows sharing one member span
    got = fetch_captures(cdx).collect()
    assert len(got) == 2  # NOT 4 (each row re-emitting both records)
    assert {bytes(r["payload"]) for r in got} == {b"first", b"second"}
    one = fetch_captures(cdx.where(cdx.url.endswith("/b")))
    assert [bytes(r["payload"]) for r in one.collect()] == [b"second"]


def test_fetch_captures_foreign_scheme_fails_loudly(spark, tmp_path):
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import PythonException

    from evidence_datasource_parsers_spark.sources.cdx import (
        fetch_captures,
    )

    cdx = spark.createDataFrame(
        [("k", "20240101000000", "http://x/", "text/html", 200, "D",
          0, 10, "s3a://bucket/a.warc.gz", "<urn:uuid:r>", "response")],
        "urlkey string, ts string, url string, mime string, status int,"
        " digest string, offset long, length long, filename string,"
        " record_id string, warc_type string",
    )
    with _pytest.raises(PythonException, match="POSIX-visible"):
        fetch_captures(cdx).collect()

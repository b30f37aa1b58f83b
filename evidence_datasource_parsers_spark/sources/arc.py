"""Legacy ARC crawl archives (the Internet Archive's pre-WARC format).

Every crawl before ~2008 — and the Internet Archive's deep history — is
stored as ARC 1.x, so a training-data pipeline over historical web text
needs this reader.  The format (public spec, "ARC file format" v1:
archive.org) is a sequence of records::

    <url> <ip> <14-digit-date> <content-type> <length>\\n
    <length bytes of content>\\n

with a leading ``filedesc://`` version record, usually multi-member
gzip (one record per member, same seekability convention WARC adopted).
For ``http://`` captures the content is the FULL HTTP response including
headers — exactly the payload shape the WARC path already splits.

The reader therefore emits the SAME schema as ``read_warc``
(``warc_type='response'``, synthesized record ids, ISO dates), so the
entire downstream stack — charset sniffing, PDF extraction, the
documents adapter, dedup, CDX-less digesting — reuses unchanged:
:func:`arc_documents` is literally ``read_arc`` +
``warc._documents_from_records``.

Malformed-record policy mirrors the WARC reader: PERMISSIVE (default)
flags bad records and resyncs at the next plausible header line,
DROPMALFORMED skips them, FAILFAST raises.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

__all__ = ["arc_documents", "iter_arc_records", "read_arc"]


def _iso(date14: bytes) -> str | None:
    d = date14.decode("ascii", "replace")
    if len(d) < 14 or not d[:14].isdigit():
        return None
    return (
        f"{d[0:4]}-{d[4:6]}-{d[6:8]}T{d[8:10]}:{d[10:12]}:{d[12:14]}Z"
    )


def iter_arc_records(
    raw: bytes,
    max_payload: int = 100 * 1024 * 1024,
    mode: str = "PERMISSIVE",
) -> Iterator[dict]:
    """Yield WARC-shaped record dicts from (possibly multi-member gzip)
    ARC bytes — see the module doc for the header layout.  The
    ``filedesc://`` version record yields ``warc_type='filedesc'``
    (filtered by ``responses_only``); captures yield ``'response'``."""
    if mode not in ("PERMISSIVE", "DROPMALFORMED", "FAILFAST"):
        raise ValueError(f"unknown malformed-record mode {mode!r}")
    if raw[:2] == b"\x1f\x8b":
        stream: io.BufferedIOBase = gzip.GzipFile(fileobj=io.BytesIO(raw))
    else:
        stream = io.BytesIO(raw)
    while True:
        line = stream.readline()
        if not line:
            return
        if not line.strip():
            continue  # inter-record newline
        fields = line.strip().split(b" ")
        ok = len(fields) >= 5 and fields[-1].isdigit()
        if not ok:
            if mode == "FAILFAST":
                raise ValueError(
                    f"malformed ARC header line: {line[:80]!r}"
                )
            if mode == "PERMISSIVE":
                yield {
                    "warc_type": "__malformed__",
                    "url": None,
                    "warc_date": None,
                    "record_id": None,
                    "content_type": None,
                    "payload": line[:4096],
                    "payload_truncated": False,
                    "payload_digest": None,
                }
            # resync: scan for the next plausible header line
            while True:
                line = stream.readline()
                if not line:
                    return
                f2 = line.strip().split(b" ")
                if len(f2) >= 5 and f2[-1].isdigit() and (
                    f2[0].startswith((b"http", b"dns:", b"filedesc"))
                ):
                    fields, ok = f2, True
                    break
            if not ok:
                return
        url = fields[0].decode("utf-8", "replace")
        date = _iso(fields[2]) if len(fields) > 2 else None
        mime = (
            fields[3].decode("utf-8", "replace")
            if len(fields) > 3
            else None
        )
        length = int(fields[-1])
        truncated = length > max_payload
        take = min(length, max_payload)
        payload = stream.read(take)
        remaining = length - take
        while remaining > 0:  # drain an oversized record
            chunk = stream.read(min(remaining, 1 << 20))
            if not chunk:
                break
            remaining -= len(chunk)
        yield {
            "warc_type": (
                "filedesc" if url.startswith("filedesc://") else "response"
            ),
            "url": url,
            "warc_date": date,
            # ARC has no record ids: (date, url) is the capture identity,
            # so the synthesized id is stable across re-parses (portable
            # doc_id hashing relies on this)
            "record_id": f"arc:{fields[2].decode('ascii', 'replace')}"
            f":{url}",
            "content_type": mime,
            "payload": payload,
            "payload_truncated": truncated,
            "payload_digest": None,
        }


def read_arc(
    spark: SparkSession,
    path: str,
    *,
    responses_only: bool = False,
    max_payload: int = 100 * 1024 * 1024,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """ARC directory/glob → the SAME DataFrame shape as ``read_warc``
    (WARC_SCHEMA): http status/Content-Type promoted from the stored
    HTTP envelope, transfer/content codings decoded.  One Arrow pass,
    per-archive parallelism."""
    import pandas as pd

    from evidence_datasource_parsers_spark.sources.warc import (
        WARC_SCHEMA,
        split_http_payload,
    )

    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for rec in iter_arc_records(
                    bytes(content), max_payload, mode
                ):
                    if responses_only and rec["warc_type"] != "response":
                        continue
                    status, ctype, body = (None, None, rec["payload"])
                    if rec["warc_type"] == "response":
                        status, ctype, body = split_http_payload(
                            rec["payload"]
                        )
                    rows.append(
                        (
                            p, rec["warc_type"], rec["url"],
                            rec["warc_date"], rec["record_id"],
                            rec["content_type"], status, ctype, body,
                            rec["payload_truncated"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "warc_type", "url", "warc_date", "record_id",
                    "content_type", "http_status", "http_content_type",
                    "payload", "payload_truncated",
                ],
            )

    return files.mapInPandas(parse, WARC_SCHEMA)


def arc_documents(
    spark: SparkSession,
    path: str,
    max_payload: int = 100 * 1024 * 1024,
    main_content: bool = False,
    charset: str = "utf8",
    include_pdf: bool = False,
) -> DataFrame:
    """ARC directory → the engine's documents shape — the historical-web
    twin of ``warc_documents``, sharing its shaping kernel verbatim
    (charset sniffing, readability extraction, and PDF extraction all
    apply to 1996-era captures exactly as to yesterday's)."""
    from evidence_datasource_parsers_spark.sources.warc import (
        _documents_from_records,
    )

    recs = read_arc(
        spark, path, responses_only=True, max_payload=max_payload
    )
    return _documents_from_records(
        recs,
        main_content=main_content,
        charset=charset,
        include_pdf=include_pdf,
    )

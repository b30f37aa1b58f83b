"""CDX-style capture index over WARC archives.

A 100 TB crawl store is unusable without its capture index: the CDX
convention (Internet Archive / Common Crawl, public) keys every record by
a SURT-canonicalized URL and a 14-digit timestamp and records the
``(filename, offset, length)`` needed to fetch exactly that record —
random access into petabytes of `.warc.gz` without scanning — plus the
payload's SHA-1 (base32) so re-crawls collapse by digest BEFORE any
content-level dedup runs.

This module builds that index with Spark:

  * :func:`iter_warc_members` — walks the gzip MEMBER structure of a
    ``.warc.gz`` (the WARC convention is one record per member exactly so
    that member spans are seekable), yielding
    ``(offset, compressed_length, decompressed_bytes)``.  Chunked
    ``zlib.decompressobj`` feed — O(archive) total, no per-member rescan.
  * :func:`build_cdx_records` — per archive file: member walk → record
    parse (sources/warc.py) → one CDX row per response/revisit/resource
    record.  For ``.warc.gz``, offset/length are COMPRESSED member spans
    (``gzip.decompress(raw[offset:offset+length])`` returns the record —
    asserted in tests); for plain ``.warc``, they are record byte spans
    located by a boundary scan (whole-file span fallback if the scan
    disagrees with the parse — honest, never wrong-but-plausible).
  * :func:`warc_cdx` — the Spark surface: binaryFile scan + one Arrow
    ``mapInPandas`` pass, per-archive parallelism, same operator shape as
    ``read_warc``.
  * :func:`best_capture_per_digest` — earliest capture per payload
    digest (struct-min aggregation, one shuffle on an 8-byte-ish key, no
    window): the map a crawler consults to write ``revisit`` records
    instead of re-storing bodies, and the join target for resolving
    revisits back to stored bytes.

Revisit records carry no body; their digest comes from the
``WARC-Payload-Digest`` header, so they land in the index pointing at the
original's digest — exactly how the at-crawl dedupe loop closes.
"""

from __future__ import annotations

import base64
import hashlib
import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "CDX_SCHEMA",
    "best_capture_per_digest",
    "build_cdx_records",
    "fetch_captures",
    "iter_warc_members",
    "surt_key",
    "warc_cdx",
]

CDX_SCHEMA = (
    "urlkey string, ts string, url string, mime string, status int,"
    " digest string, offset long, length long, filename string,"
    " record_id string, warc_type string"
)


def surt_key(url: str | None) -> str | None:
    """SURT-style sort key: reversed dotted host + ``)`` + lowercased
    path/query, ``www.`` and default ports dropped — captures of the same
    resource sort adjacently regardless of URL spelling."""
    if not url:
        return None
    from urllib.parse import urlsplit

    try:
        p = urlsplit(url.strip())
    except ValueError:
        return None
    host = (p.hostname or "").lower()
    if host.startswith("www."):
        host = host[4:]
    if not host:
        return None
    try:
        port = p.port
    except ValueError:
        port = None
    port_s = f":{port}" if port and port not in (80, 443) else ""
    path = (p.path or "/").lower()
    query = f"?{p.query.lower()}" if p.query else ""
    return ",".join(reversed(host.split("."))) + ")" + port_s + path + query


def _ts14(warc_date: str | None) -> str | None:
    """ISO-8601 WARC-Date → the CDX 14-digit timestamp."""
    if not warc_date:
        return None
    digits = re.sub(r"\D", "", warc_date)
    return digits[:14].ljust(14, "0") if len(digits) >= 8 else None


def _b32_sha1(body: bytes) -> str:
    return base64.b32encode(hashlib.sha1(body).digest()).decode("ascii")


def _raw_body(payload: bytes) -> bytes:
    """The HTTP body AS STORED — no transfer/content decoding.  The CDX
    digest must hash the stored bytes (that is what crawlers write into
    WARC-Payload-Digest and what revisit records declare), NOT the
    browser-visible body ``split_http_payload`` now produces."""
    if not payload.startswith(b"HTTP/"):
        return payload
    _, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        _, _, body = payload.partition(b"\n\n")
    return body


def iter_warc_members(
    raw: bytes, chunk: int = 1 << 20
) -> Iterator[tuple[int, int, bytes]]:
    """(offset, compressed_length, decompressed_bytes) per gzip member of
    a ``.warc.gz``; plain bytes yield one pseudo-member covering the
    file.  Malformed trailing bytes terminate the walk (crawl archives
    get truncated mid-member)."""
    if raw[:2] != b"\x1f\x8b":
        yield 0, len(raw), raw
        return
    pos = 0
    n = len(raw)
    while pos < n and raw[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(31)
        out: list[bytes] = []
        i = pos
        try:
            while not d.eof and i < n:
                out.append(d.decompress(raw[i : i + chunk]))
                i += chunk
        except zlib.error:
            return
        if not d.eof:  # truncated final member
            return
        consumed = min(i, n) - pos - len(d.unused_data)
        if consumed <= 0:
            return
        yield pos, consumed, b"".join(out)
        pos += consumed


_INDEXED_TYPES = ("response", "revisit", "resource")


def build_cdx_records(
    raw: bytes,
    filename: str,
    max_payload: int = 100 * 1024 * 1024,
) -> list[dict]:
    """CDX rows for one archive — see the module doc for offset
    semantics."""
    from evidence_datasource_parsers_spark.sources.warc import (
        iter_warc_records,
        split_http_payload,
    )

    compressed = raw[:2] == b"\x1f\x8b"
    rows: list[dict] = []
    for m_off, m_len, mem in iter_warc_members(raw):
        recs = [
            r
            for r in iter_warc_records(mem, max_payload)
            if r["warc_type"] in _INDEXED_TYPES
        ]
        if not recs:
            continue
        # plain archives: locate record spans inside the (pseudo-)member
        spans: list[tuple[int, int]] | None = None
        if not compressed:
            starts = [0] if mem.startswith(b"WARC/") else []
            starts += [
                m.start(1)
                for m in re.finditer(rb"\r?\n\r?\n(WARC/\d)", mem)
            ]
            all_recs = sum(
                1 for _ in iter_warc_records(mem, max_payload)
            )
            if len(starts) == all_recs:
                bounds = starts + [len(mem)]
                # map indexed records to their spans by replaying types
                spans = []
                for k, r in enumerate(iter_warc_records(mem, max_payload)):
                    if r["warc_type"] in _INDEXED_TYPES:
                        spans.append(
                            (bounds[k], bounds[k + 1] - bounds[k])
                        )
        for k, rec in enumerate(recs):
            status, mime, _ = split_http_payload(rec["payload"])
            if mime is None:
                mime = rec["content_type"]
            if rec["warc_type"] == "revisit":
                declared = rec.get("payload_digest") or ""
                digest = declared.split(":", 1)[-1] or None
            elif rec["payload_truncated"]:
                # hashing a partial body would mint a digest matching
                # NOTHING (not the real payload, not other captures) —
                # NULL is the honest value; gate on it downstream
                digest = None
            else:
                digest = _b32_sha1(_raw_body(rec["payload"]))
            off, ln = (m_off, m_len)
            if spans is not None:
                off, ln = spans[k]
            rows.append(
                {
                    "urlkey": surt_key(rec["url"]),
                    "ts": _ts14(rec["warc_date"]),
                    "url": rec["url"],
                    "mime": (mime or "").split(";")[0].strip() or None,
                    "status": status,
                    "digest": digest,
                    "offset": off,
                    "length": ln,
                    "filename": filename,
                    "record_id": rec["record_id"],
                    "warc_type": rec["warc_type"],
                }
            )
    return rows


def warc_cdx(
    spark: SparkSession,
    path: str,
    max_payload: int = 100 * 1024 * 1024,
) -> DataFrame:
    """WARC directory/glob → the capture index (CDX_SCHEMA): one row per
    response/revisit/resource record, per-archive parallelism."""
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.split(" ")[0] for f in CDX_SCHEMA.split(", ")]
        for pdf in batches:
            rows: list[dict] = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(
                    build_cdx_records(bytes(content), str(p), max_payload)
                )
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(kernel, CDX_SCHEMA)


def best_capture_per_digest(cdx: DataFrame) -> DataFrame:
    """Earliest stored capture per payload digest — the at-crawl dedupe
    map (what a crawler consults before storing a body, and what resolves
    ``revisit`` rows back to bytes).  Revisit rows themselves are
    excluded (they point at a stored body, they are not one).  One
    struct-min groupBy on the digest — map-side combinable, no window,
    no skew surface beyond genuinely-hot digests."""
    stored = cdx.where(
        F.col("digest").isNotNull() & (F.col("warc_type") != "revisit")
    )
    best = stored.groupBy("digest").agg(
        F.min(
            F.struct("ts", "urlkey", "filename", "offset", "length", "url")
        ).alias("b"),
        F.count(F.lit(1)).alias("n_captures"),
    )
    return best.select(
        "digest",
        F.col("b.ts").alias("ts"),
        F.col("b.urlkey").alias("urlkey"),
        F.col("b.url").alias("url"),
        F.col("b.filename").alias("filename"),
        F.col("b.offset").alias("offset"),
        F.col("b.length").alias("length"),
        "n_captures",
    )


def fetch_captures(
    cdx: DataFrame, max_payload: int = 100 * 1024 * 1024
) -> DataFrame:
    """Random access THROUGH the index: (filename, offset, length) rows →
    the referenced WARC records (same schema as ``read_warc``), reading
    ONLY the indexed byte ranges instead of rescanning archives.  This is
    the read side of the CDX contract — select captures relationally
    (by urlkey, digest, time window), then fetch exactly those bytes.

    Scale shape: repartition on filename + an offset-ordered partition
    sort, so each task reads its archive once, sequentially, with one
    open handle per run of consecutive rows; per-row cost is the record's
    own bytes (one gzip member for ``.warc.gz``).  Missing/renamed
    archives skip their rows (an index is a cache of the store, not a
    transaction log)."""
    import re as _re

    import pandas as _pd

    from evidence_datasource_parsers_spark.sources.warc import (
        WARC_SCHEMA,
        iter_warc_records,
        split_http_payload,
    )

    cols = [
        "path", "warc_type", "url", "warc_date", "record_id",
        "content_type", "http_status", "http_content_type", "payload",
        "payload_truncated",
    ]
    sel = (
        cdx.select("filename", "offset", "length", "record_id")
        .where(
            F.col("filename").isNotNull()
            & F.col("offset").isNotNull()
            & F.col("length").isNotNull()
        )
        .repartition("filename")
        .sortWithinPartitions("filename", "offset")
    )

    def kernel(batches):
        import gzip as _gz

        cur_path: str | None = None
        fh = None
        for pdf in batches:
            rows = []
            for fn, off, ln, rid in zip(
                pdf["filename"], pdf["offset"], pdf["length"],
                pdf["record_id"],
            ):
                path = str(fn)
                scheme = _re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", path)
                if scheme and scheme.group(1).lower() != "file":
                    # a silent empty result would be indistinguishable
                    # from a stale index — unsupported schemes must FAIL
                    raise ValueError(
                        "fetch_captures reads POSIX-visible paths only; "
                        f"got scheme {scheme.group(1)!r} — mount the "
                        "store or run where the archive paths resolve"
                    )
                local = _re.sub(r"^file:(//)?", "", path)
                if local != cur_path:
                    if fh is not None:
                        fh.close()
                    try:
                        fh = open(local, "rb")
                    except OSError:
                        fh = None
                    cur_path = local
                if fh is None:
                    continue
                fh.seek(int(off))
                raw = fh.read(int(ln))
                if raw[:2] == b"\x1f\x8b":
                    try:
                        raw = _gz.decompress(raw)
                    except Exception:  # noqa: BLE001 — rewritten archive
                        continue
                for rec in iter_warc_records(
                    raw, max_payload, "DROPMALFORMED"
                ):
                    # a span can cover several records (whole-file
                    # fallback spans, multi-record gz members): emit only
                    # the record THIS index row selected
                    if rid is not None and rec["record_id"] != rid:
                        continue
                    status, ctype, body = (None, None, rec["payload"])
                    if rec["warc_type"] == "response":
                        status, ctype, body = split_http_payload(
                            rec["payload"]
                        )
                    rows.append(
                        (
                            path, rec["warc_type"], rec["url"],
                            rec["warc_date"], rec["record_id"],
                            rec["content_type"], status, ctype, body,
                            rec["payload_truncated"],
                        )
                    )
            if fh is not None:
                fh.close()
                fh, cur_path = None, None
            yield _pd.DataFrame(rows, columns=cols)

    return sel.mapInPandas(kernel, WARC_SCHEMA)

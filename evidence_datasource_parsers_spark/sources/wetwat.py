"""WET / WAT sidecar writers — CommonCrawl-interop output formats.

CommonCrawl tooling consumes three artifact kinds per crawl: the WARC
archives themselves, WET files (extracted plain text) and WAT files
(per-page metadata + outlinks as JSON).  The engine's ``warc_documents``
already computes WET-shaped text and ``functions/html.extract_links``
the WAT link sets; this module emits them in the STANDARD container so
downstream CC consumers (cc-pyspark jobs, cdx tooling, academic
pipelines) read the engine's output directly:

  * a WET file is itself a valid WARC (ISO 28500): one
    ``WARC-Type: conversion`` record per page, ``Content-Type:
    text/plain``, payload = the extracted text;
  * a WAT file is a WARC of ``WARC-Type: metadata`` records,
    ``Content-Type: application/json``, payload = the CommonCrawl
    envelope JSON (``Envelope.Payload-Metadata.HTTP-Response-Metadata.
    HTML-Metadata.Links`` et al.).

Because the containers are plain WARC, the READ side is the existing
record parser (``sources/warc.iter_warc_records``) — the roundtrip
(write → re-read) is tested against the frames that produced the files.

Write discipline (same as ``sources/webdataset.write_webdataset``):
rows group into shards (one shuffle, keyed however the caller already
sharded — default: hash of the url), each ``applyInPandas`` group
writes exactly one ``.warc.wet.gz`` / ``.warc.wat.gz`` where its rows
sit, and the returned manifest frame carries (shard, path, n_records,
n_bytes).  Records are emitted url-sorted with deterministic record
ids (uuid5 of url|date) and gzip mtime 0, so shard bytes are a pure
function of their contents — re-runs produce byte-identical sidecars.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.functions.hashing import portable_hash

__all__ = ["read_wat", "read_wet", "write_wat", "write_wet"]

_WET_SOFTWARE = "evidence-datasource-parsers-spark WET writer"
_WAT_SOFTWARE = "evidence-datasource-parsers-spark WAT writer"


def _warc_record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = "".join(f"{k}: {v}\r\n" for k, v in headers)
    return (
        b"WARC/1.0\r\n"
        + head.encode("utf-8")
        + f"Content-Length: {len(payload)}\r\n\r\n".encode()
        + payload
        + b"\r\n\r\n"
    )


def _record_id(url: str, date: str, kind: str) -> str:
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}|{date}|{kind}")
    return f"<urn:uuid:{rid}>"


def _warcinfo(software: str, fname: str) -> bytes:
    body = (
        f"software: {software}\r\nformat: WARC File Format 1.0\r\n"
    ).encode("utf-8")
    return _warc_record(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Filename", fname),
            # deterministic: derived from the filename, not a clock
            ("WARC-Record-ID", _record_id(fname, "", "warcinfo")),
            ("Content-Type", "application/warc-fields"),
        ],
        body,
    )


def _ts_col(df: DataFrame, ts_col: str) -> Column:
    """WARC-Date string from either a timestamp (LTZ) or a preformatted
    string column (UTC, second precision — the CC convention).

    Rendered by PURE EPOCH ARITHMETIC, never a timezone function: a
    TIMESTAMP is an instant, ``unix_timestamp`` reads its epoch seconds
    session-independently, and days/hh/mm/ss derive by integer math
    over a tz-free DateType.  ``date_format`` alone renders in the
    SESSION zone (local wall time mislabeled 'Z' on foreign sessions),
    and the tempting ``to_utc_timestamp(c, current_timezone())``
    counter-shift re-interprets an AMBIGUOUS wall time during the DST
    fall-back hour — one wrong hour per year per zone.  This form is
    byte-identical in any session, transition instants included
    (tested)."""
    dt = df.schema[ts_col].dataType.simpleString()
    c = F.col(ts_col)
    if dt == "string":
        return c
    e = F.unix_timestamp(c)
    days = F.floor(e / F.lit(86400)).cast("long")
    secs = (e - days * F.lit(86400)).cast("long")

    def two(x: Column) -> Column:
        return F.lpad(x.cast("long").cast("string"), 2, "0")

    return F.concat(
        F.date_format(
            F.date_add(F.to_date(F.lit("1970-01-01")), days.cast("int")),
            "yyyy-MM-dd",
        ),
        F.lit("T"),
        two(F.floor(secs / F.lit(3600))),
        F.lit(":"),
        two(F.floor((secs % F.lit(3600)) / F.lit(60))),
        F.lit(":"),
        two(secs % F.lit(60)),
        F.lit("Z"),
    )


def _write_sidecar(
    staged: DataFrame,
    out_dir: str,
    suffix: str,
    software: str,
    build_record,
) -> DataFrame:
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        import gzip

        shard = int(pdf["__shard"].iloc[0])
        fname = f"part-{shard:05d}{suffix}"
        path = os.path.join(out_dir, fname)
        tmp = path + ".tmp"
        pdf = pdf.sort_values(["url", "__date"], kind="mergesort")
        chunks = [_warcinfo(software, fname)]
        for _, row in pdf.iterrows():
            chunks.append(build_record(row))
        blob = gzip.compress(b"".join(chunks), mtime=0)
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, path)  # atomic per shard
        return pd.DataFrame(
            {
                "shard": [shard],
                "path": [path],
                "n_records": [len(pdf)],
                "n_bytes": [len(blob)],
            }
        )

    return staged.groupBy("__shard").applyInPandas(
        write_shard,
        "shard long, path string, n_records long, n_bytes long",
    )


def write_wet(
    docs: DataFrame,
    out_dir: str,
    *,
    url_col: str = "url",
    text_col: str = "text",
    ts_col: str = "crawl_ts",
    refers_to_col: str | None = None,
    n_shards: int = 16,
    shard_col: str | None = None,
) -> DataFrame:
    """Documents frame → WET shards (``part-NNNNN.warc.wet.gz``) under
    ``out_dir``; returns the manifest frame (materialize it to run the
    write).  NULL-text rows are skipped (nothing was extracted — the
    same pages CC omits from WET).  ``refers_to_col`` names an original
    WARC record-id column for the ``WARC-Refers-To`` header when the
    caller kept one; absent, the header is omitted (the deterministic
    conversion-record id still identifies the page)."""
    cols = [
        F.col(url_col).alias("url"),
        _ts_col(docs, ts_col).alias("__date"),
        F.col(text_col).alias("__text"),
    ]
    if refers_to_col is not None:
        cols.append(F.col(refers_to_col).alias("__refers"))
    staged = docs.select(*cols).where(
        F.col("url").isNotNull() & F.col("__text").isNotNull()
    )
    shard = (
        F.col(shard_col).cast("long")
        if shard_col is not None
        else portable_hash(F.col("url")) % n_shards
    )
    staged = staged.withColumn("__shard", shard)
    has_refers = refers_to_col is not None

    def build(row) -> bytes:
        payload = str(row["__text"]).encode("utf-8")
        headers = [
            ("WARC-Type", "conversion"),
            ("WARC-Target-URI", str(row["url"])),
            ("WARC-Date", str(row["__date"])),
            ("WARC-Record-ID",
             _record_id(str(row["url"]), str(row["__date"]), "wet")),
        ]
        if has_refers and row["__refers"] is not None:
            headers.append(("WARC-Refers-To", str(row["__refers"])))
        headers.append(("Content-Type", "text/plain"))
        return _warc_record(headers, payload)

    return _write_sidecar(
        staged, out_dir, ".warc.wet.gz", _WET_SOFTWARE, build
    )


def write_wat(
    pages: DataFrame,
    out_dir: str,
    *,
    url_col: str = "url",
    ts_col: str = "crawl_ts",
    links_col: str = "links",
    title_col: str | None = None,
    n_shards: int = 16,
    shard_col: str | None = None,
) -> DataFrame:
    """Pages frame (url, timestamp, ``array<string>`` outlinks, optional
    title) → WAT shards (``part-NNNNN.warc.wat.gz``); returns the
    manifest frame.  The JSON payload is the CommonCrawl envelope subset
    downstream link-graph tooling reads (``HTML-Metadata.Links`` with
    ``path: "A@/href"``, ``Head.Title``) — built with the native
    ``to_json`` expression, not Python string assembly, so the only
    kernel work is the record framing."""
    link_structs = F.transform(
        F.coalesce(F.col(links_col), F.array().cast("array<string>")),
        lambda u: F.struct(F.lit("A@/href").alias("path"), u.alias("url")),
    )
    head = (
        F.struct(F.col(title_col).alias("Title"))
        if title_col is not None
        else F.struct(F.lit(None).cast("string").alias("Title"))
    )
    date = _ts_col(pages, ts_col)
    envelope = F.struct(
        F.struct(
            F.lit("response").alias("WARC-Type"),
            F.col(url_col).alias("WARC-Target-URI"),
            date.alias("WARC-Date"),
        ).alias("WARC-Header-Metadata"),
        F.struct(
            F.struct(
                F.struct(
                    head.alias("Head"),
                    link_structs.alias("Links"),
                ).alias("HTML-Metadata"),
            ).alias("HTTP-Response-Metadata"),
        ).alias("Payload-Metadata"),
    )
    staged = pages.select(
        F.col(url_col).alias("url"),
        date.alias("__date"),
        F.to_json(F.struct(envelope.alias("Envelope"))).alias("__json"),
    ).where(F.col("url").isNotNull())
    shard = (
        F.col(shard_col).cast("long")
        if shard_col is not None
        else portable_hash(F.col("url")) % n_shards
    )
    staged = staged.withColumn("__shard", shard)

    def build(row) -> bytes:
        payload = str(row["__json"]).encode("utf-8")
        headers = [
            ("WARC-Type", "metadata"),
            ("WARC-Target-URI", str(row["url"])),
            ("WARC-Date", str(row["__date"])),
            ("WARC-Record-ID",
             _record_id(str(row["url"]), str(row["__date"]), "wat")),
            ("Content-Type", "application/json"),
        ]
        return _warc_record(headers, payload)

    return _write_sidecar(
        staged, out_dir, ".warc.wat.gz", _WAT_SOFTWARE, build
    )


#: JSON schema of the WAT envelope subset (read side of the roundtrip).
WAT_ENVELOPE_SCHEMA = (
    "Envelope struct<"
    "`WARC-Header-Metadata` struct<`WARC-Type` string,"
    "`WARC-Target-URI` string, `WARC-Date` string>,"
    "`Payload-Metadata` struct<`HTTP-Response-Metadata` struct<"
    "`HTML-Metadata` struct<Head struct<Title string>,"
    "Links array<struct<path string, url string>>>>>>"
)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET shards → (url, crawl_date, text).  A WET file is a WARC, so
    this is the existing record parser filtered to conversion records —
    nothing format-specific to maintain."""
    from evidence_datasource_parsers_spark.sources.warc import read_warc

    recs = read_warc(spark, path)
    return recs.where(F.col("warc_type") == "conversion").select(
        F.col("url"),
        F.col("warc_date").alias("crawl_date"),
        F.col("payload").cast("string").alias("text"),
    )


def read_wat(spark: SparkSession, path: str) -> DataFrame:
    """WAT shards → (url, crawl_date, title, links array<string>) via
    the native ``from_json`` over the envelope subset."""
    from evidence_datasource_parsers_spark.sources.warc import read_warc

    recs = read_warc(spark, path)
    env = F.from_json(
        F.col("payload").cast("string"), WAT_ENVELOPE_SCHEMA
    )["Envelope"]
    html = env["Payload-Metadata"]["HTTP-Response-Metadata"][
        "HTML-Metadata"
    ]
    return recs.where(F.col("warc_type") == "metadata").select(
        F.col("url"),
        F.col("warc_date").alias("crawl_date"),
        html["Head"]["Title"].alias("title"),
        F.transform(html["Links"], lambda x: x["url"]).alias("links"),
    )

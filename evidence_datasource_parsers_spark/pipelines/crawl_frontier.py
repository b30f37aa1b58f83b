"""Crawl-frontier planning: discovered URLs → a polite, deduped fetch list.

Closes the loop the other crawl pieces leave open: pages come out of the
archive (sources/warc.py), their links come out of ``extract_links``
(functions/html.py), and THIS stage turns those raw discoveries into the
next fetch batch — the piece a production crawler runs between every
round:

  1. canonicalize + batch-dedupe (one row per canonical URL — a page
     discovered from 10⁴ referrers is one fetch);
  2. drop everything the crawl has already queued or fetched: an
     anti-join against the carried SEEN store (8-byte portable hashes of
     canonical URLs — the same ~8 bytes/URL discipline as the dedup
     fingerprint stores, so a billion-URL frontier is ~8 GB, bucketable);
  3. blocklist/allowlist/pattern gates (functions/urls.filter_urls —
     native expressions, whole-stage codegen);
  4. robots.txt politeness gate (filter_by_robots, RFC 9309 semantics by
     default);
  5. per-domain schedule (robots_directives → schedule_fetches):
     Crawl-delay honored and capped, deterministic fetch offsets, an
     explicit per-domain budget — the documented answer to hot-domain
     window skew.

The SEEN store advances by exactly the READY urls (what this batch
queues).  Over-budget urls are deliberately NOT stored: they were never
queued, so when discovery re-surfaces them next round they schedule
normally — the frontier needs no separate backlog state.  Blocked /
robots-disallowed urls are also not stored: the gates are cheap native
filters and robots/blocklists change; re-filtering beats remembering a
policy decision as if it were a fetch.

Plan shape per batch: ONE shuffle for the batch-level URL dedup, one
anti-join against the store (AQE-broadcast while small, bucket-joinable
at scale), one domains-sized broadcast join, and ONE window partitioned
by registrable domain.  No Python in the URL path; the only Arrow kernel
is the domains-sized robots-directive parse.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.functions.hashing import portable_hash
from evidence_datasource_parsers_spark.functions.urls import (
    canonicalize_url,
    filter_by_robots,
    filter_urls,
    robots_directives,
    schedule_fetches,
)

__all__ = ["FrontierResult", "plan_fetch_batch"]


@dataclass
class FrontierResult:
    """``ready`` is the scheduled fetch list (canonical ``url``,
    ``url_hash``, ``domain``, ``crawl_delay``, ``fetch_offset_s`` +
    passthrough columns); ``store`` the advanced seen-URL store
    (``url_hash``).  ``store`` derives from ``ready`` — materialize
    ``ready`` (write or localCheckpoint) BEFORE writing the store so a
    crash between the two writes loses the batch's fetch list but never
    records urls as seen without queueing them (same ordering argument
    as the dedup sinks); then advance the store from the MATERIALIZED
    frame's ``url_hash`` column rather than writing ``store`` directly,
    which would re-run the whole plan."""

    ready: DataFrame
    store: DataFrame


def plan_fetch_batch(
    candidates: DataFrame,
    seen_store: DataFrame | None,
    robots: DataFrame | None = None,
    *,
    url_col: str = "url",
    agent: str = "*",
    semantics: str = "rfc9309",
    allow_domains: list[str] | None = None,
    block_domains: list[str] | None = None,
    block_patterns: list[str] | None = None,
    default_delay: float = 1.0,
    delay_cap: float = 60.0,
    max_urls_per_domain: int | None = 1000,
) -> FrontierResult:
    """One frontier round — see the module doc for the stage order and
    the store-advancement contract.

    ``candidates`` carries raw discovered URLs in ``url_col`` (any other
    columns pass through the min-URL representative); ``seen_store`` is
    the carried ``(url_hash)`` frame or None on the first round;
    ``robots`` an optional ``(domain, robots_txt)`` frame as a
    robots-fetch stage materializes it."""
    canon = canonicalize_url(F.col(url_col))
    staged = candidates.withColumn("__canon", canon).where(
        F.col("__canon").isNotNull()
    )
    # batch dedup: one deterministic representative per canonical URL
    row = F.struct(*[F.col(c) for c in candidates.columns])
    uniq = (
        staged.groupBy("__canon")
        .agg(F.min_by(row, F.col(url_col)).alias("__row"))
        .select(F.col("__canon"), F.col("__row.*"))
        .drop(url_col)
        .withColumnRenamed("__canon", url_col)
    )
    # seen-store anti-join on the 8-byte hash of the canonical URL
    hashed = uniq.withColumn("url_hash", portable_hash(F.col(url_col)))
    if seen_store is not None:
        hashed = hashed.join(
            seen_store.select("url_hash"), on="url_hash", how="left_anti"
        )
    # curation gates: blocklist/allowlist/patterns, then robots
    gated = filter_urls(
        hashed,
        url_col,
        allow_domains=allow_domains,
        block_domains=block_domains,
        block_patterns=block_patterns,
    )
    directives = None
    if robots is not None:
        gated = filter_by_robots(
            gated, robots, url_col, agent, semantics=semantics
        )
        directives = robots_directives(robots, agent).drop("sitemaps")
    ready = schedule_fetches(
        gated,
        directives,
        url_col,
        default_delay=default_delay,
        delay_cap=delay_cap,
        max_urls_per_domain=max_urls_per_domain,
    )
    new_hashes = ready.select("url_hash").distinct()
    store = (
        seen_store.select("url_hash").unionByName(new_hashes).distinct()
        if seen_store is not None
        else new_hashes
    )
    # ready KEEPS url_hash: a caller that materializes the fetch list can
    # advance the store from the materialized frame (seen ∪
    # ready.select('url_hash')) instead of re-running the whole
    # dedup/gate/schedule lineage that `store` otherwise recomputes —
    # the CLI `frontier` command does exactly that
    return FrontierResult(ready=ready, store=store)

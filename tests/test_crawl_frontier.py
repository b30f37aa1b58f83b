"""Crawl-frontier planning (pipelines/crawl_frontier.py): discovery →
dedupe → seen store → gates → politeness schedule, across two rounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from evidence_datasource_parsers_spark.pipelines.crawl_frontier import (
    plan_fetch_batch,
)

ROBOTS = """
User-agent: *
Disallow: /private/
Crawl-delay: 2
"""


def _cands(spark, urls):
    return spark.createDataFrame(
        [(u, f"ref{i}") for i, u in enumerate(urls)],
        "url string, referrer string",
    )


def test_frontier_two_rounds(spark):
    robots = spark.createDataFrame(
        [("site.example", ROBOTS), ("other.example", None)],
        "domain string, robots_txt string",
    )
    round1 = _cands(spark, [
        # same page discovered thrice under different spellings → 1 fetch
        "http://site.example/a?utm_source=x#frag",
        "HTTP://SITE.example/a",
        "http://site.example:80/a",
        "http://site.example/b",
        "http://site.example/private/secret",   # robots-disallowed
        "http://spam.example/z",                # blocklisted
        "http://other.example/q",
        "not a url",                            # unparseable → dropped
    ])
    res1 = plan_fetch_batch(
        round1, None, robots,
        block_domains=["spam.example"],
    )
    ready1 = {r["url"]: r for r in res1.ready.collect()}
    assert set(ready1) == {
        "http://site.example/a", "http://site.example/b",
        "http://other.example/q",
    }
    # robots Crawl-delay honored; deterministic offsets within the domain
    site = sorted(
        (r["fetch_offset_s"], r["url"])
        for r in ready1.values()
        if r["domain"] == "site.example"
    )
    assert site == [
        (0.0, "http://site.example/a"), (2.0, "http://site.example/b"),
    ]
    assert ready1["http://other.example/q"]["crawl_delay"] == 1.0  # default
    assert res1.store.count() == 3
    store1 = res1.store.localCheckpoint(eager=True)

    # round 2: re-discoveries drop against the store; new url schedules
    round2 = _cands(spark, [
        "http://site.example/a?utm_source=again",  # seen (canonical match)
        "http://other.example/q",                  # seen
        "http://site.example/c",                   # new
    ])
    res2 = plan_fetch_batch(round2, store1, robots,
                            block_domains=["spam.example"])
    assert {r["url"] for r in res2.ready.collect()} == {
        "http://site.example/c"
    }
    assert res2.store.count() == 4


def test_frontier_budget_defers_not_forgets(spark):
    """Over-budget urls are NOT written to the seen store, so the next
    round's re-discovery schedules them — deferral without backlog
    state."""
    urls = [f"http://site.example/p{i}" for i in range(4)]
    res1 = plan_fetch_batch(
        _cands(spark, urls), None, None, max_urls_per_domain=2
    )
    got1 = {r["url"] for r in res1.ready.collect()}
    assert len(got1) == 2
    assert res1.store.count() == 2
    store1 = res1.store.localCheckpoint(eager=True)

    res2 = plan_fetch_batch(
        _cands(spark, urls), store1, None, max_urls_per_domain=2
    )
    got2 = {r["url"] for r in res2.ready.collect()}
    assert len(got2) == 2
    assert got1 | got2 == set(urls)  # full coverage over two rounds
    assert res2.store.count() == 4


def test_frontier_from_extracted_links(spark):
    """The full discovery loop: crawled HTML → extract_links →
    plan_fetch_batch."""
    from evidence_datasource_parsers_spark.functions.html import (
        extract_links,
    )

    pages = spark.createDataFrame(
        [
            (1, '<a href="http://site.example/x">x</a>'
                '<a href="http://site.example/x?utm_source=f">x again</a>'),
            (2, '<a href="http://other.example/y">y</a>'),
        ],
        "doc_id long, html string",
    )
    links = pages.select(
        F.explode(extract_links(F.col("html"))).alias("url")
    )
    res = plan_fetch_batch(links, None, None)
    assert {r["url"] for r in res.ready.collect()} == {
        "http://site.example/x", "http://other.example/y",
    }


def test_frontier_plan_shape(spark):
    """The URL path stays native: no Python eval in the scheduled plan
    when no robots frame is involved."""
    res = plan_fetch_batch(
        _cands(spark, ["http://site.example/a"]), None, None
    )
    plan = res.ready._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan

"""Paginated REST / SOLR scans with retry+backoff (SURVEY §2.1 S12/S13).

The reference scrapes external APIs with two topologies:

* offset pagination over one endpoint until a server-reported total is
  reached — ``modules/IMPC.py:52-107`` (``ImpcSolrRetriever``: a retried
  count query, then retried batch fetches accumulated into one output);
* one call per entity id, skipping entities whose payload lacks the
  expected key — ``modules/PanelApp.py:302-331``
  (``fetch_literature_references``).

This module models both shapes network-free: the transport — the ONE
side-effecting call — is injected, so the pagination/retry/skip logic is
unit-testable with fakes, and a real deployment passes a urllib/requests
wrapper.  Scans run on the DRIVER by design, exactly like the reference:
the external service bounds throughput, not Spark, and per-row RPC from
executors is the failure mode this pattern structurally prevents.  The
collected rows enter the cluster through ``from_rows`` and immediately
become a distributed DataFrame.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from evidence_datasource_parsers_spark.sources.readers import from_rows

Transport = Callable[[dict], dict]


@dataclass(frozen=True)
class RetryPolicy:
    """``@retry(tries=3, delay=5, backoff=1.2, jitter=(1, 3))`` of
    ``IMPC.py:64`` as data.  ``jitter`` adds a uniform random extra delay;
    pass None (default here) for deterministic tests."""

    tries: int = 3
    delay: float = 5.0
    backoff: float = 1.2
    jitter: tuple[float, float] | None = None


class RestScanner:
    """Retrying, paginating scanner over an injected transport.

    ``transport(params) -> payload`` performs one request and may raise;
    ``sleep`` is injectable so tests assert the backoff schedule instead of
    waiting it out.
    """

    def __init__(
        self,
        transport: Transport,
        retry: RetryPolicy = RetryPolicy(),
        sleep: Callable[[float], None] | None = None,
        rng=None,
    ):
        self.transport = transport
        self.retry = retry
        self.sleep = sleep if sleep is not None else __import__("time").sleep
        self.rng = rng
        self.calls = 0  # observability: total transport invocations

    def get(self, params: dict) -> dict:
        """One logical request with tries/delay/backoff/jitter semantics."""
        delay = self.retry.delay
        last: Exception | None = None
        for attempt in range(self.retry.tries):
            try:
                self.calls += 1
                return self.transport(params)
            except Exception as exc:  # noqa: BLE001 — mirrors blanket @retry
                last = exc
                if attempt == self.retry.tries - 1:
                    break
                pause = delay
                if self.retry.jitter is not None:
                    lo, hi = self.retry.jitter
                    r = self.rng.random() if self.rng is not None else 0.5
                    pause += lo + (hi - lo) * r
                self.sleep(pause)
                delay *= self.retry.backoff
        raise last  # type: ignore[misc]

    def scan_offset(
        self,
        params: dict,
        get_total: Callable[[dict], int],
        get_rows: Callable[[dict], list],
        batch_size: int,
        start_key: str = "start",
        rows_key: str = "rows",
    ) -> Iterator:
        """IMPC shape: retried total-count probe, then retried batch fetches
        from offset 0 stepping by the number of rows ACTUALLY returned until
        every record arrived.

        The offset advances by ``len(rows)``, not ``batch_size``: SOLR
        deployments commonly cap page size below the requested ``rows``
        value, and stepping by the request size would silently skip the
        records between the cap and the request.  An empty batch before the
        total is reached still raises — silently stopping short is how
        partial scrapes masquerade as complete ones.
        """
        probe = dict(params, **{start_key: 0, rows_key: 0})
        total = get_total(self.get(probe))
        if total == 0:
            raise ValueError("endpoint returned no data for scan")
        start = fetched = 0
        while fetched < total:
            payload = self.get(
                dict(params, **{start_key: start, rows_key: batch_size})
            )
            rows = get_rows(payload)
            if not rows:
                raise ValueError(
                    f"short read: {fetched}/{total} records then empty batch"
                )
            fetched += len(rows)
            start += len(rows)
            yield from rows

    def scan_entities(
        self,
        ids: Iterable,
        make_params: Callable[[object], dict],
        get_rows: Callable[[object, dict], list],
        required_key: str | None = None,
        on_skip: Callable[[object], None] | None = None,
    ) -> Iterator:
        """PanelApp shape: one retried call per entity id; payloads missing
        ``required_key`` are skipped (source and API can be out of sync for
        retired entities), optionally reporting each skip."""
        for entity_id in ids:
            payload = self.get(make_params(entity_id))
            if required_key is not None and required_key not in payload:
                if on_skip is not None:
                    on_skip(entity_id)
                continue
            yield from get_rows(entity_id, payload)


def scan_to_df(
    spark: SparkSession, rows: Iterable, schema
) -> DataFrame:
    """Driver-collected scan rows → distributed DataFrame (via ``from_rows``,
    the S14 boundary) — the hand-off point from scrape to cluster."""
    return from_rows(spark, list(rows), schema=schema)


def urllib_transport(
    base_url: str,
    headers: dict[str, str] | None = None,
    timeout: float = 30.0,
) -> Transport:
    """Concrete stdlib transport satisfying the :data:`Transport` protocol.

    GETs ``base_url`` with the scan params url-encoded into the query
    string and decodes the JSON body.  Non-2xx responses raise
    ``urllib.error.HTTPError``, which the scanner's retry loop catches —
    exactly the behavior the reference gets from ``requests`` +
    ``@retry`` (``modules/IMPC.py:64-77``).  Kept dependency-free so the
    module imports in any environment; network access only happens when
    the returned callable is invoked.
    """
    import json
    import urllib.parse
    import urllib.request

    def call(params: dict) -> dict:
        url = base_url
        if params:
            sep = "&" if "?" in base_url else "?"
            url = f"{base_url}{sep}{urllib.parse.urlencode(params)}"
        req = urllib.request.Request(url, headers=headers or {})
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))

    return call

"""REST/SOLR scan pattern (S12/S13): retry schedule, offset pagination,
per-entity iteration with skip — all against fake transports."""

from __future__ import annotations

import pytest

from evidence_datasource_parsers_spark.sources.rest import (
    RestScanner,
    RetryPolicy,
    scan_to_df,
)


class Flaky:
    """Transport that fails ``n_failures`` times, then delegates."""

    def __init__(self, n_failures, inner=lambda p: {"ok": True}):
        self.n_failures = n_failures
        self.inner = inner
        self.attempts = 0

    def __call__(self, params):
        self.attempts += 1
        if self.attempts <= self.n_failures:
            raise ConnectionError(f"boom {self.attempts}")
        return self.inner(params)


def test_retry_succeeds_after_transient_failures():
    sleeps = []
    t = Flaky(2)
    s = RestScanner(
        t, RetryPolicy(tries=3, delay=5.0, backoff=1.2), sleep=sleeps.append
    )
    assert s.get({}) == {"ok": True}
    assert t.attempts == 3
    assert sleeps == [5.0, 6.0]  # delay, then delay*backoff


def test_retry_exhausts_and_raises_last_error():
    sleeps = []
    s = RestScanner(
        Flaky(99), RetryPolicy(tries=3, delay=1.0, backoff=2.0),
        sleep=sleeps.append,
    )
    with pytest.raises(ConnectionError, match="boom 3"):
        s.get({})
    assert sleeps == [1.0, 2.0]  # no sleep after the final failure


def test_retry_jitter_added_to_schedule():
    sleeps = []

    class FixedRng:
        def random(self):
            return 0.0  # jitter = lower bound

    s = RestScanner(
        Flaky(1), RetryPolicy(tries=2, delay=5.0, backoff=1.2, jitter=(1, 3)),
        sleep=sleeps.append, rng=FixedRng(),
    )
    s.get({})
    assert sleeps == [6.0]  # 5.0 delay + 1.0 jitter floor


def _solr(records, fail_plan=()):
    """Fake SOLR endpoint: numFound probe + offset/rows slicing, with
    optional per-call failures keyed by call index."""
    calls = {"n": 0}

    def transport(params):
        calls["n"] += 1
        if calls["n"] in fail_plan:
            raise TimeoutError("transient")
        start, rows = params["start"], params["rows"]
        return {
            "response": {
                "numFound": len(records),
                "docs": records[start : start + rows],
            }
        }

    return transport


def test_scan_offset_paginates_to_total():
    records = [{"id": i, "phenotype": f"p{i}"} for i in range(10)]
    s = RestScanner(_solr(records), RetryPolicy(tries=1))
    got = list(
        s.scan_offset(
            {"q": "*:*"},
            get_total=lambda p: p["response"]["numFound"],
            get_rows=lambda p: p["response"]["docs"],
            batch_size=4,
        )
    )
    assert got == records
    assert s.calls == 4  # probe + ceil(10/4) batches


def test_scan_offset_retries_mid_pagination():
    records = [{"id": i} for i in range(6)]
    sleeps = []
    s = RestScanner(
        _solr(records, fail_plan={3}),  # second batch fails once
        RetryPolicy(tries=3, delay=0.1, backoff=2.0),
        sleep=sleeps.append,
    )
    got = list(
        s.scan_offset(
            {},
            get_total=lambda p: p["response"]["numFound"],
            get_rows=lambda p: p["response"]["docs"],
            batch_size=3,
        )
    )
    assert got == records
    assert sleeps == [0.1]


def test_scan_offset_survives_server_capped_page_size():
    # SOLR deployments commonly cap the page size below the requested
    # ``rows``; the offset must advance by what actually arrived or the
    # records between the cap and the request are silently skipped.
    records = [{"id": i} for i in range(10)]

    def capped(params):  # honors at most 3 rows per page regardless of ask
        start, rows = params["start"], min(params["rows"], 3)
        return {"response": {"numFound": len(records),
                             "docs": records[start : start + rows]}}

    s = RestScanner(capped, RetryPolicy(tries=1))
    got = list(
        s.scan_offset(
            {}, lambda p: p["response"]["numFound"],
            lambda p: p["response"]["docs"], batch_size=10,
        )
    )
    assert got == records  # every record, exactly once, in order


def test_scan_offset_rejects_empty_endpoint_and_short_reads():
    s = RestScanner(_solr([]), RetryPolicy(tries=1))
    with pytest.raises(ValueError, match="no data"):
        list(
            s.scan_offset(
                {}, lambda p: p["response"]["numFound"],
                lambda p: p["response"]["docs"], batch_size=2,
            )
        )

    def lying(params):  # claims 10 records, serves 2
        return {"response": {"numFound": 10,
                             "docs": [{"id": 1}, {"id": 2}][: params["rows"]][:2]
                             if params["start"] == 0 else []}}

    s2 = RestScanner(lying, RetryPolicy(tries=1))
    with pytest.raises(ValueError, match="short read"):
        list(
            s2.scan_offset(
                {}, lambda p: p["response"]["numFound"],
                lambda p: p["response"]["docs"], batch_size=5,
            )
        )


def test_scan_entities_skips_missing_payload_key():
    panels = {
        1: {"genes": [{"gene_data": {"gene_symbol": "BRCA1"},
                       "publications": ["11111", "22222"]}]},
        2: {"retired": True},  # no 'genes' → skipped
        3: {"genes": [{"gene_data": {"gene_symbol": "TP53"},
                       "publications": ["33333"]}]},
    }
    skipped = []
    s = RestScanner(lambda p: panels[p["panel_id"]], RetryPolicy(tries=1))
    rows = list(
        s.scan_entities(
            [1, 2, 3],
            make_params=lambda pid: {"panel_id": pid},
            get_rows=lambda pid, payload: [
                (pid, g["gene_data"]["gene_symbol"], pub)
                for g in payload["genes"]
                for pub in g["publications"]
            ],
            required_key="genes",
            on_skip=skipped.append,
        )
    )
    assert rows == [(1, "BRCA1", "11111"), (1, "BRCA1", "22222"),
                    (3, "TP53", "33333")]
    assert skipped == [2]


def test_scan_to_df_boundary(spark):
    records = [{"id": i, "name": f"n{i}"} for i in range(5)]
    s = RestScanner(_solr(records), RetryPolicy(tries=1))
    df = scan_to_df(
        spark,
        (
            (r["id"], r["name"])
            for r in s.scan_offset(
                {}, lambda p: p["response"]["numFound"],
                lambda p: p["response"]["docs"], batch_size=2,
            )
        ),
        schema="id long, name string",
    )
    assert df.count() == 5
    assert df.columns == ["id", "name"]


def test_urllib_transport_against_local_http_server():
    """The concrete stdlib transport driven end-to-end against an
    in-process HTTP server: query-string encoding, JSON decode, and the
    scanner's pagination riding on it."""
    import http.server
    import json
    import threading

    records = [{"id": i} for i in range(7)]

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            from urllib.parse import parse_qs, urlparse

            q = parse_qs(urlparse(self.path).query)
            start = int(q.get("start", ["0"])[0])
            rows = int(q.get("rows", ["0"])[0])
            body = json.dumps(
                {
                    "response": {
                        "numFound": len(records),
                        "docs": records[start : start + rows],
                    }
                }
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # keep pytest output clean
            pass

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        from evidence_datasource_parsers_spark.sources.rest import (
            urllib_transport,
        )

        transport = urllib_transport(f"http://127.0.0.1:{port}/select")
        s = RestScanner(transport, RetryPolicy(tries=2, delay=0.01))
        got = list(
            s.scan_offset(
                {},
                lambda p: p["response"]["numFound"],
                lambda p: p["response"]["docs"],
                batch_size=3,
            )
        )
        assert got == records
    finally:
        server.shutdown()
        server.server_close()

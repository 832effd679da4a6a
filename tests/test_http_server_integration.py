"""S3/S4 against a REAL misbehaving HTTP server (VERDICT r5 next-5):
a local ThreadingHTTPServer injects latency, 429s, 500s and a
permanently-failing endpoint; the executor-side fetchers must retry
transient errors (>= 1 forced retry observed server-side) and skip the
permanent failure WITHOUT failing the partition. Reference behavior:
web_scraping.py:28-48 (retry/backoff), :213-215 (error-skip)."""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from tests.test_ingest import _page_html, _search_row
from yelp_data_engineering_pipeline_spark.sources.http import (
    fetch_search_pages,
    http_fetcher,
    parse_search_pages,
    retrying,
    scrape_businesses,
)

_N = 13  # businesses: 1.3 pages -> sentinel on page 2


class _FlakyHandler(BaseHTTPRequestHandler):
    """Per-path request ledger; scripted failures:

    - /search/snippet?start=0  -> 500 on first hit, 200 after (retry path)
    - /search/snippet?start=10 -> 429 on first hit, 200 after
    - /biz/biz-00004           -> 500 ALWAYS (permanent failure)
    - /biz/biz-00001           -> 200 after 0.2 s latency
    """

    hits: dict[str, int] = {}
    lock = threading.Lock()

    def log_message(self, *a):  # silence request logging
        pass

    def _respond(self, code: int, body: str = "") -> None:
        data = body.encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):  # noqa: N802 - BaseHTTPRequestHandler API
        with _FlakyHandler.lock:
            n = _FlakyHandler.hits.get(self.path, 0) + 1
            _FlakyHandler.hits[self.path] = n

        if self.path.startswith("/search/snippet"):
            start = int(self.path.split("start=")[1])
            if start in (0, 10) and n == 1:
                self._respond(500 if start == 0 else 429)
                return
            if start >= _N:
                self._respond(200, '{"excessivePaging": true}')
                return
            rows = [_search_row(i) for i in range(start, min(start + 10, _N))]
            self._respond(200, "\n".join(rows))
            return
        if self.path.endswith("/props"):
            self._respond(200, json.dumps({"highlights": [], "relatedSearches": []}))
            return
        if self.path.startswith("/biz/"):
            biz = self.path.rsplit("/", 1)[-1].split("?")[0]
            if biz == "biz-00004":
                self._respond(500)  # permanent
                return
            if biz == "biz-00001":
                time.sleep(0.2)  # slow but fine
            self._respond(200, _page_html(biz))
            return
        self._respond(404)


@pytest.fixture()
def flaky_server():
    _FlakyHandler.hits = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FlakyHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def test_search_pages_survive_transient_500_and_429(spark, flaky_server):
    fetcher = retrying(http_fetcher(flaky_server), attempts=4, backoff=lambda i: 0.01)
    raw = fetch_search_pages(spark, fetcher, [0, 10]).cache()
    assert raw.count() == 2
    parsed = parse_search_pages(raw)
    got = {r.bizId for r in parsed.collect()}
    expect = {f"biz-{i:05d}" for i in range(_N) if i % 7 != 3}  # ads dropped
    assert got == expect
    # the server really forced retries: both scripted paths were hit twice
    assert _FlakyHandler.hits["/search/snippet?start=0"] >= 2
    assert _FlakyHandler.hits["/search/snippet?start=10"] >= 2


def test_business_pages_skip_permanent_failure_without_partition_failure(
    spark, flaky_server
):
    search = retrying(http_fetcher(flaky_server), attempts=4, backoff=lambda i: 0.01)
    worklist = parse_search_pages(fetch_search_pages(spark, search, [0])).filter(
        F.col("ranking") <= 10
    )
    # worklist URLs carry the P4-normalized absolute prefix
    # (https://www.yelp.com/...); a production fetcher resolves them
    # against its own connection pool — here we rebase onto the local
    # server before the GET.
    raw_fetch = http_fetcher(flaky_server)

    def rebased(url):
        return raw_fetch(url.replace("https://www.yelp.com", ""))

    biz = retrying(rebased, attempts=3, backoff=lambda i: 0.01, on_exhausted="skip")
    results = scrape_businesses(worklist, biz).cache()
    got = {r.bizId for r in results.collect()}
    expected_work = {r.bizId for r in worklist.collect()}
    assert "biz-00004" in expected_work  # the permanent-500 target is real work
    # every worklist row except the permanent failure parsed fine — and
    # the job finished, i.e. no partition failure from the dead endpoint
    assert got == expected_work - {"biz-00004"}
    # the permanent endpoint was retried to exhaustion (3 attempts)
    perm_hits = sum(
        n for p, n in _FlakyHandler.hits.items()
        if p.startswith("/biz/biz-00004") and not p.endswith("/props")
    )
    assert perm_hits >= 3
    # the slow-but-healthy page made it through
    assert "biz-00001" in got


def test_http_fetcher_timeout_feeds_retry_policy(flaky_server):
    """A socket-level timeout must RAISE out of http_fetcher (feeding
    retrying()), and the skip policy must convert exhaustion to None."""
    import pytest as _pytest

    slow = retrying(
        http_fetcher(flaky_server, timeout_s=0.05),
        attempts=2,
        backoff=lambda i: 0.0,
    )
    # /biz/biz-00001 sleeps 0.2 s > 0.05 s timeout -> raises after retries
    with _pytest.raises(RuntimeError):
        slow("/biz/biz-00001")
    skipping = retrying(
        http_fetcher(flaky_server, timeout_s=0.05),
        attempts=2,
        backoff=lambda i: 0.0,
        on_exhausted="skip",
    )
    assert skipping("/biz/biz-00001") is None

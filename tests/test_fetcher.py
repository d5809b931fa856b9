"""HTTP fetcher (sources/fetcher.py): unit fetch behavior against a local
http.server, and a 2-round end-to-end crawl through the SAME round pipeline
with CrawlConfig(fetcher="http")."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from louis_crawler_legacy_spark.sources.fetcher import fetch_url, http_fetch

PAGES = {
    "/page/0": (
        200,
        "<html><head><title>Root</title></head><body><main>"
        '<h1>Root</h1><p>root text</p>'
        '<a href="/page/1">one</a> <a href="/page/2">two</a>'
        '<aside><a href="/trap">trap</a></aside>'
        "</main></body></html>",
    ),
    "/page/1": (
        200,
        "<html><head><title>One</title></head><body><main>"
        '<h1>One</h1><p>leaf</p><a href="/page/0">back</a></main></body></html>',
    ),
    "/page/2": (500, "<html><body>boom</body></html>"),
}


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        status, body = PAGES.get(self.path, (404, "missing"))
        data = body.encode()
        self.send_response(status)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_url_statuses(server):
    status, html = fetch_url(f"{server}/page/0", timeout=5)
    assert status == 200 and "Root" in html
    status, html = fetch_url(f"{server}/page/2", timeout=5)
    assert status == 500 and html is None  # HTTPError carries its code
    status, html = fetch_url(f"{server}/nope", timeout=5)
    assert status == 404 and html is None
    status, html = fetch_url("http://127.0.0.1:1/never", timeout=2)
    assert status is None and html is None  # transport failure


def test_http_fetch_mapinpandas(spark, server):
    batch = spark.createDataFrame(
        [(f"{server}/page/0",), (f"{server}/page/2",), (f"{server}/missing",)],
        ["url"],
    )
    rows = {r.url: r for r in http_fetch(batch, timeout=5).collect()}
    assert rows[f"{server}/page/0"].status == 200
    assert "root text" in rows[f"{server}/page/0"].html
    assert rows[f"{server}/page/2"].status == 500
    assert rows[f"{server}/missing"].status == 404


def test_two_round_http_crawl(spark, server, tmp_path):
    """End-to-end: the SAME round pipeline (select → fetch → extract →
    dedup → appends) with the HTTP fetcher instead of the corpus join."""
    from louis_crawler_legacy_spark.plans.crawl import CrawlConfig, CrawlEngine

    cfg = CrawlConfig(
        max_depth=1, batch_size=8, num_partitions=2, bloom_capacity=1_000,
        fetcher="http", fetch_timeout=5.0,
    )
    eng = CrawlEngine(spark, corpus=None, warehouse_dir=str(tmp_path / "wh"),
                      config=cfg)
    stats = eng.run(seeds=[f"{server}/page/0"])

    # round 1: the seed; round 2: its two in-main children (trap dropped
    # by clean-before-extract, /page/2 errors with 500)
    assert [s.batch_urls for s in stats] == [
        [f"{server}/page/0"],
        [f"{server}/page/1", f"{server}/page/2"],
    ]
    pages = {r.url: r for r in eng.pages.read().collect()}
    assert set(pages) == {f"{server}/page/0", f"{server}/page/1"}
    assert pages[f"{server}/page/0"].title == "Root"
    seen = {r.url: r.status for r in eng.seen.read().collect()}
    assert seen[f"{server}/page/2"] == "errored"
    assert not any("/trap" in u for u in seen)

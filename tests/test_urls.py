"""Table-driven tests for URL canonicalization (reference requests.py:4-25
semantics — see louis_crawler_legacy_spark/functions/urls.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from louis_crawler_legacy_spark.functions import urls

BASE = "http://inspection.canada.ca/eng/start/page"

CASES = [
    # (href, base, expected)
    ("http://example.com/a#frag", BASE, "http://example.com/a"),
    ("http://example.com/a?x=1&y=2", BASE, "http://example.com/a"),
    ("http://example.com/a?x=1#f", BASE, "http://example.com/a"),
    ("/fra/page", BASE, "http://inspection.canada.ca/fra/page"),
    ("/doc.pdf", BASE, None),  # pdf checked on RAW href (requests.py:6)
    ("http://x.ca/report.pdf", BASE, None),
    # pdf check is endswith on the raw string — query strings hide it,
    # matching the reference (href.endswith('pdf') before stripping)
    ("http://x.ca/report.pdf?dl=1", BASE, "http://x.ca/report.pdf"),
    ("relative/no-slash", BASE, None),
    ("mailto:a@b.c", BASE, None),
    ("#top", BASE, None),  # strips to "" → neither http nor /
    ("https://inspection.gc.ca/eng/a", BASE, "http://inspection.canada.ca/eng/a"),
    ("https://www.inspection.gc.ca/eng/a", BASE, "http://inspection.canada.ca/eng/a"),
    ("/abs", "https://host.ca:8080/x", "https://host.ca:8080/abs"),
]


def test_normalize_py_cases():
    for href, base, want in CASES:
        assert urls.normalize_frontier_py(href, base) == want, href


def test_normalize_pd_matches_py():
    href = pd.Series([c[0] for c in CASES])
    base = pd.Series([c[1] for c in CASES])
    got = urls.normalize_frontier_pd(href, base)
    want = [c[2] for c in CASES]
    assert list(got.where(got.notna(), None)) == want


def test_normalize_spark_matches_py(spark):
    df = spark.createDataFrame(
        [(h, b) for h, b, _ in CASES], ["href", "base_url"]
    )
    out = df.select(
        urls.normalize_frontier_url(F.col("href"), F.col("base_url")).alias("u")
    ).collect()
    assert [r.u for r in out] == [c[2] for c in CASES]


def test_host_and_ids(spark):
    df = spark.createDataFrame(
        [("http://inspection.canada.ca:8080/fra/a",), ("https://x.ca/b",)], ["url"]
    )
    rows = df.select(
        urls.url_host(F.col("url")).alias("host"),
        urls.url_id(F.col("url")).alias("id"),
        urls.lang_from_url(F.col("url")).alias("lang"),
    ).collect()
    assert rows[0].host == "inspection.canada.ca"
    assert rows[1].host == "x.ca"
    assert isinstance(rows[0].id, int)
    assert rows[0].lang == "fr" and rows[1].lang == "en"


def test_host_partition_stable(spark):
    df = spark.createDataFrame([(f"http://h{i}.ca/p",) for i in range(50)], ["url"])
    parts = df.select(
        urls.host_partition(F.col("url"), 8).alias("p")
    ).collect()
    assert all(0 <= r.p < 8 for r in parts)
    # same url → same partition (determinism)
    again = df.select(urls.host_partition(F.col("url"), 8).alias("p")).collect()
    assert [r.p for r in parts] == [r.p for r in again]

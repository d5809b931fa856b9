"""Production HTTP fetch stage: a mapInPandas fetcher with the corpus-join
fetch schema.

The sandbox rounds replay a corpus table (the reference itself replays a
local cache dir through its downloader middleware, middlewares.py:104-117),
but a user pointing the engine at a real site needs an actual fetch path.
This is the Spark twin of the reference worker fetch
(goldie_playwright_parallel.py:101-160): stdlib urllib with the reference's
per-URL timeout (60 s, goldie_playwright_parallel.py:732) and its status
routing (HTTP errors carry their code; transport errors have no status →
routed to `errored` by the round's `status < 400` filter, F7).

Three production behaviors beyond the bare fetch:

- **redirects**: urllib follows them; the FINAL url (``resp.geturl()``)
  comes back as a ``final_url`` column so the round pipeline can record
  the page under its canonical url, mark both urls seen, and keep a
  requested→final link edge (otherwise a redirect-heavy site stores
  duplicate content under both urls and the seen set misses the canonical
  one).
- **per-host pacing** (``host_min_interval``): the reference's
  AutoThrottle holds per-host concurrency at 1.0 with adaptive delays
  (settings.py:71-78). The per-round host budget (O5) bounds VOLUME; this
  bounds the within-task request RATE: the task interleaves hosts
  round-robin (so same-host waits overlap other hosts' fetches) and
  enforces a minimum interval between same-host requests. Pair with a
  host-partitioned batch (crawl.py repartitions by host when pacing is
  on) so one task owns each host's spacing.
- **adaptive throttling** (``adaptive_throttle``): the AutoThrottle
  delay-adjustment itself (reference settings.py:71-78, Scrapy
  AutoThrottle algorithm): each host's interval starts at
  ``throttle_start_delay`` and after every response moves to the average
  of itself and ``latency / throttle_target_concurrency`` — so a slow
  host backs the crawler off toward its observed latency instead of
  being hammered at a static interval. Non-2xx responses never DECREASE
  the delay (Scrapy rule). Clamped to [``host_min_interval``,
  ``throttle_max_delay``]; per-host state lives inside the fetch task,
  which owns the host when the batch is host-partitioned.
- **render seam** (``renderer``): the reference's production spider
  renders pages in Chromium via Playwright
  (playwright_middleware.py:104-137, goldie_playwright_parallel.py:101-160)
  — a browser cannot run in this sandbox, so JS rendering is a documented
  divergence. The seam makes it a CONFIG, not a rewrite: a renderer is a
  ``(url, html) -> html`` callable applied inside the fetch task (e.g. a
  Playwright page.content() wrapper on a real deployment); ``None`` keeps
  the raw body.

Scale shape: one task per batch partition, sequential URLs within a task;
the wide html column is born in the fetch task and never shuffles, exactly
like the corpus-join path. Select via CrawlConfig(fetcher="http").
"""

from __future__ import annotations

import time
import urllib.error
import urllib.request
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

DEFAULT_TIMEOUT = 60.0  # goldie_playwright_parallel.py:732
USER_AGENT = "louis-crawler-legacy-spark/0.3"


def fetch_url(url: str, timeout: float = DEFAULT_TIMEOUT,
              user_agent: str = USER_AGENT) -> tuple[int | None, str | None, str]:
    """(status, html, final_url) for one URL; (None, None, url) on
    transport failure — the round pipeline routes non-2xx/3xx and None to
    `errored` (F7). final_url is the post-redirect URL urllib landed on
    (== url when no redirect happened)."""
    req = urllib.request.Request(url, headers={"User-Agent": user_agent})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = resp.read()
            # gzip payloads (sitemap.xml.gz per sitemaps.org, or a server
            # that compressed despite us not sending Accept-Encoding):
            # without this the charset decode mojibakes the bytes and the
            # downstream XML/HTML parse silently yields nothing
            if body[:2] == b"\x1f\x8b":
                import gzip

                try:
                    body = gzip.decompress(body)
                except OSError:
                    pass  # truncated/corrupt — decode raw, parsers will flag
            charset = resp.headers.get_content_charset() or "utf-8"
            final = resp.geturl() or url
            return int(resp.status), body.decode(charset, errors="replace"), final
    except urllib.error.HTTPError as e:
        return int(e.code), None, getattr(e, "url", None) or url
    except Exception:
        return None, None, url


def _paced_order(hosts: pd.Series) -> list[int]:
    """Row order that ROUND-ROBINS across hosts (k-th URL of every host
    before any (k+1)-th) so same-host min-interval waits overlap other
    hosts' fetches instead of serializing the task."""
    by_host: dict[str, int] = {}
    ranks = []
    for h in hosts:
        r = by_host.get(h, 0)
        ranks.append(r)
        by_host[h] = r + 1
    return sorted(range(len(ranks)), key=lambda i: (ranks[i], i))


def http_fetch(batch: DataFrame, timeout: float = DEFAULT_TIMEOUT,
               user_agent: str = USER_AGENT,
               host_min_interval: float = 0.0,
               renderer: Callable[[str, str], str] | None = None,
               adaptive_throttle: bool = False,
               throttle_start_delay: float = 5.0,
               throttle_max_delay: float = 60.0,
               throttle_target_concurrency: float = 1.0) -> DataFrame:
    """batch(url, host, …passthrough) → + status int, html string,
    final_url string; with ``adaptive_throttle`` also + throttle_delay
    double (the host's AutoThrottle interval AFTER this row's response)
    and fetch_seq long (per-task processing order — ``max_by(
    throttle_delay, fetch_seq)`` per host is the final learned delay,
    well-defined because a host-partitioned batch gives each host ONE
    task).

    Same output schema as the corpus fetch-join (plus final_url) so the
    rest of the round pipeline is fetcher-agnostic. With pacing off the
    batch arrives range-partitioned from select_batch (tasks fetch
    disjoint URL slices in parallel); with pacing on crawl.py partitions
    it by host so one task owns each host's request spacing.

    AutoThrottle state persistence: the reference's per-host delays live
    for the crawl's LIFETIME (Scrapy AutoThrottle; settings.py:71-78),
    not one batch — a ``_seed_delay`` double column in ``batch`` (NULL =
    unknown host) initializes each host's interval, and the emitted
    throttle_delay column lets the caller persist the learned value
    across rounds (crawl.py host_state table). Without the seam every
    round restarted slow hosts at throttle_start_delay."""
    schema_fields = (
        list(batch.schema.fields)
        + [T.StructField("status", T.IntegerType()),
           T.StructField("html", T.StringType()),
           T.StructField("final_url", T.StringType())]
    )
    if adaptive_throttle:
        schema_fields += [
            T.StructField("throttle_delay", T.DoubleType()),
            T.StructField("fetch_seq", T.LongType()),
        ]
    schema = T.StructType(schema_fields)

    pacing = host_min_interval > 0 or adaptive_throttle

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last_hit: dict[str, float] = {}  # host → last request timestamp
        # host → current adaptive interval (AutoThrottle state; floor is
        # host_min_interval, start throttle_start_delay — or the seeded
        # prior-round delay — cap throttle_max_delay)
        delays: dict[str, float] = {}
        fetch_seq = 0  # per-task processing order, across pdf batches
        for pdf in batches:
            order = (
                _paced_order(pdf["host"])
                if pacing and "host" in pdf
                else range(len(pdf))
            )
            results: list[tuple] = [None] * len(pdf)  # type: ignore[list-item]
            urls = pdf["url"].tolist()
            hosts = pdf["host"].tolist() if "host" in pdf else urls
            seeds = (
                pdf["_seed_delay"].tolist() if "_seed_delay" in pdf else None
            )
            throttle_out = [None] * len(pdf)
            seq_out = [None] * len(pdf)
            for i in order:
                if pacing:
                    if adaptive_throttle:
                        if hosts[i] not in delays:
                            seed = seeds[i] if seeds is not None else None
                            delays[hosts[i]] = (
                                float(seed)
                                if seed is not None and not pd.isna(seed)
                                else max(
                                    throttle_start_delay, host_min_interval
                                )
                            )
                        interval = delays[hosts[i]]
                    else:
                        interval = host_min_interval
                    wait = last_hit.get(hosts[i], -1e18) + interval \
                        - time.monotonic()
                    if wait > 0:
                        time.sleep(wait)
                    last_hit[hosts[i]] = time.monotonic()
                t_req = time.monotonic()
                status, html, final = fetch_url(urls[i], timeout, user_agent)
                if adaptive_throttle:
                    # Scrapy AutoThrottle adjustment: move halfway toward
                    # latency/target-concurrency; errors never speed up
                    latency = time.monotonic() - t_req
                    cur = delays[hosts[i]]
                    target = latency / throttle_target_concurrency
                    new = (cur + target) / 2.0
                    if status is None or int(status) >= 400:
                        new = max(new, cur)
                    delays[hosts[i]] = min(
                        max(new, host_min_interval), throttle_max_delay
                    )
                    throttle_out[i] = delays[hosts[i]]
                    seq_out[i] = fetch_seq
                    fetch_seq += 1
                if renderer is not None and html is not None:
                    html = renderer(final, html)
                results[i] = (status, html, final)
            out = pdf.copy()
            out["status"] = pd.array([r[0] for r in results], dtype="Int32")
            out["html"] = [r[1] for r in results]
            out["final_url"] = [r[2] for r in results]
            if adaptive_throttle:
                out["throttle_delay"] = pd.array(
                    throttle_out, dtype="Float64"
                )
                out["fetch_seq"] = pd.array(seq_out, dtype="Int64")
            yield out

    return batch.mapInPandas(gen, schema=schema)

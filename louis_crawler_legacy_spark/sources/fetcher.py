"""Production HTTP fetch stage: a mapInPandas fetcher with the corpus-join
fetch schema.

The sandbox rounds replay a corpus table (the reference itself replays a
local cache dir through its downloader middleware, middlewares.py:104-117),
but a user pointing the engine at a real site needs an actual fetch path.
This is the Spark twin of the reference worker fetch
(goldie_playwright_parallel.py:101-160): stdlib urllib instead of
Playwright (no JS rendering — documented divergence; the reference's
Playwright is a browser-automation dependency out of scope here), with the
reference's per-URL timeout (60 s, goldie_playwright_parallel.py:732) and
its status routing (HTTP errors carry their code; transport errors have no
status → routed to `errored` by the round's `status < 400` filter, F7).

Scale shape: one task per batch partition, sequential URLs within a task
(politeness is enforced upstream by the per-host budget — O5); the wide
html column is born in the fetch task and never shuffles, exactly like the
corpus-join path. Select via CrawlConfig(fetcher="http").
"""

from __future__ import annotations

import urllib.error
import urllib.request
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

DEFAULT_TIMEOUT = 60.0  # goldie_playwright_parallel.py:732
USER_AGENT = "louis-crawler-legacy-spark/0.2"


def fetch_url(url: str, timeout: float = DEFAULT_TIMEOUT,
              user_agent: str = USER_AGENT) -> tuple[int | None, str | None]:
    """(status, html) for one URL; (None, None) on transport failure —
    the round pipeline routes non-2xx/3xx and None to `errored` (F7)."""
    req = urllib.request.Request(url, headers={"User-Agent": user_agent})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = resp.read()
            charset = resp.headers.get_content_charset() or "utf-8"
            return int(resp.status), body.decode(charset, errors="replace")
    except urllib.error.HTTPError as e:
        return int(e.code), None
    except Exception:
        return None, None


def http_fetch(batch: DataFrame, timeout: float = DEFAULT_TIMEOUT,
               user_agent: str = USER_AGENT) -> DataFrame:
    """batch(url, …passthrough) → + status int, html string.

    Same output schema as the corpus fetch-join so the rest of the round
    pipeline is fetcher-agnostic. The batch arrives range-partitioned from
    select_batch — tasks fetch disjoint URL slices in parallel."""
    schema = T.StructType(
        list(batch.schema.fields)
        + [T.StructField("status", T.IntegerType()),
           T.StructField("html", T.StringType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            results = [fetch_url(u, timeout, user_agent) for u in pdf["url"]]
            out = pdf.copy()
            out["status"] = pd.array(
                [s for s, _ in results], dtype="Int32"
            )
            out["html"] = [h for _, h in results]
            yield out

    return batch.mapInPandas(gen, schema=schema)

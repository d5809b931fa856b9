"""robots.txt parsing → the engine's robots rules (north-rule feature; the
reference runs with ROBOTSTXT_OBEY=False, settings.py:19, so the
equivalence oracle keeps robots off).

Two consumption paths share this parser:

- static: ``robots_map``/``robots_table`` turn host→body maps into the
  ``CrawlConfig(robots=...)`` dict / the joinable rules DataFrame;
- live: ``CrawlConfig(fetch_robots=True)`` fetches ``/robots.txt`` per
  newly-seen host through the mapInPandas fetcher and parses inside the
  task (plans/crawl.CrawlEngine._apply_robots).

Parser semantics (deliberately matched to the engine's prefix-match
filter, documented divergences from RFC 9309): user-agent GROUPS per the
RFC — consecutive ``User-agent:`` lines open one group, the most specific
match wins (longest group token contained in our agent string), ``*`` is
the fallback; ``Disallow:`` values are PATH PREFIXES (what
politeness.robots_filter implements — ``*`` wildcards, ``$`` anchors and
``Allow:`` overrides are not expanded); ``Crawl-delay:`` is captured
(seconds — feed politeness.budgets_from_crawl_delays); empty
``Disallow:`` contributes nothing; a missing/unfetchable robots.txt means
allow-all (standard crawler behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from louis_crawler_legacy_spark.plans.crawl import ROBOTS_SCHEMA


def parse_robots_txt(text: str | None, agent: str = "*") -> dict:
    """→ {'disallow_prefixes': [...], 'crawl_delay': float|None} for the
    best-matching user-agent group (longest token contained in ``agent``;
    ``*`` as fallback; ``agent="*"`` selects the fallback group)."""
    if not text:
        return {"disallow_prefixes": [], "crawl_delay": None}
    ua = agent.lower()
    groups: list[dict] = []
    cur: dict | None = None
    last_was_agent = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if cur is None or not last_was_agent:
                cur = {"agents": [], "disallow": [], "delay": None}
                groups.append(cur)
            cur["agents"].append(value.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if cur is None:
            continue  # rules before any User-agent line: ignored (RFC)
        if key == "disallow" and value:
            cur["disallow"].append(value)
        elif key == "crawl-delay":
            try:
                cur["delay"] = float(value)
            except ValueError:
                pass

    best: dict | None = None
    best_len = -1
    for g in groups:
        for group_agent in g["agents"]:
            if group_agent == "*":
                if best_len < 0:
                    best, best_len = g, 0
            elif (
                ua != "*" and group_agent and group_agent in ua
                and len(group_agent) > best_len
            ):
                best, best_len = g, len(group_agent)
    if best is None:
        return {"disallow_prefixes": [], "crawl_delay": None}
    return {"disallow_prefixes": list(best["disallow"]),
            "crawl_delay": best["delay"]}


def robots_table(spark: SparkSession, robots_bodies: dict[str, str]) -> DataFrame:
    """host → robots.txt body ⇒ robots(host, disallow_prefixes) DataFrame
    joinable by operators/politeness.robots_filter."""
    rows = []
    for host, body in sorted(robots_bodies.items()):
        parsed = parse_robots_txt(body)
        rows.append((host, parsed["disallow_prefixes"]))
    return spark.createDataFrame(rows, ROBOTS_SCHEMA)


def robots_map(robots_bodies: dict[str, str]) -> dict[str, list[str]]:
    """Same, as the plain dict CrawlConfig.robots consumes."""
    return {
        host: parse_robots_txt(body)["disallow_prefixes"]
        for host, body in robots_bodies.items()
    }

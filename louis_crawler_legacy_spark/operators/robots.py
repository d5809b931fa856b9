"""robots.txt parsing → the engine's robots table (north-rule feature; the
reference runs with ROBOTSTXT_OBEY=False, settings.py:19, so the
equivalence oracle keeps robots off).

Parsing follows the original robots exclusion convention, deliberately
minimal: the ``User-agent: *`` group's ``Disallow`` prefixes plus
``Crawl-delay`` (prefix-match semantics, matching
operators/politeness.robots_filter). Fetching the robots.txt bodies is a
per-host fetch like any page fetch — at scale a mapInPandas pass over the
distinct new hosts of a round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from louis_crawler_legacy_spark.plans.crawl import ROBOTS_SCHEMA


def parse_robots_txt(text: str, agent: str = "*") -> dict:
    """→ {'disallow_prefixes': [...], 'crawl_delay': float|None}"""
    disallow: list[str] = []
    crawl_delay = None
    active = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            active = value == agent or value == "*"
        elif active and key == "disallow" and value:
            disallow.append(value)
        elif active and key == "crawl-delay":
            try:
                crawl_delay = float(value)
            except ValueError:
                pass
    return {"disallow_prefixes": disallow, "crawl_delay": crawl_delay}


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

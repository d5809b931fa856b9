#!/usr/bin/env python
"""Warehouse operations CLI — the twin of the reference's
scripts/storage_manager.py (:57-223): recent-10 listing, case-insensitive
search, and 4-table stats, re-expressed over the snapshot warehouse with
the same relational plans the driver queries use (O3 TakeOrdered recency,
F5 ilike search, A1 counts).

    python scripts/storage_stats.py --warehouse /data/wh stats
    python scripts/storage_stats.py --warehouse /data/wh recent [-n 10]
    python scripts/storage_stats.py --warehouse /data/wh search QUERY
"""

from __future__ import annotations

import argparse
import json


def _engine_tables(spark, warehouse: str):
    from louis_crawler_legacy_spark.sources.tables import Warehouse

    wh = Warehouse(spark, warehouse)
    return wh


def cmd_stats(spark, warehouse: str) -> dict:
    """storage_manager.py:206-223 — COUNT(*) per table (A1)."""
    wh = _engine_tables(spark, warehouse)
    out = {}
    for name in ("pages", "links", "documents", "seen", "frontier", "metrics"):
        t = wh.table(name)
        out[name] = 0 if t.is_empty() else t.read().count()
    return out


def cmd_recent(spark, warehouse: str, n: int = 10) -> list[dict]:
    """storage_manager.py:57-62 — ORDER BY last_crawled DESC LIMIT 10 (O3:
    TakeOrderedAndProject, per-partition top-k, no global sort)."""
    from pyspark.sql import functions as F

    wh = _engine_tables(spark, warehouse)
    t = wh.table("pages")
    if t.is_empty():
        return []
    rows = (
        t.read()
        .select("id", "url", "title", "lang", "last_crawled")
        .orderBy(F.desc("last_crawled"), F.asc("url"))
        .limit(n)
        .collect()
    )
    return [r.asDict() for r in rows]


def cmd_search(spark, warehouse: str, query: str) -> list[dict]:
    """storage_manager.py:107-112 — url ILIKE %q% OR title ILIKE %q%,
    ORDER BY last_crawled DESC (F5)."""
    from pyspark.sql import functions as F

    wh = _engine_tables(spark, warehouse)
    t = wh.table("pages")
    if t.is_empty():
        return []
    q = query.lower()
    rows = (
        t.read()
        .filter(
            F.lower(F.col("url")).contains(q)
            | F.lower(F.coalesce(F.col("title"), F.lit(""))).contains(q)
        )
        .select("id", "url", "title", "lang", "last_crawled")
        .orderBy(F.desc("last_crawled"), F.asc("url"))
        .collect()
    )
    return [r.asDict() for r in rows]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--warehouse", required=True)
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("stats")
    pr = sub.add_parser("recent")
    pr.add_argument("-n", type=int, default=10)
    ps = sub.add_parser("search")
    ps.add_argument("query")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("louis-storage-stats").getOrCreate()
    if args.cmd == "stats":
        print(json.dumps(cmd_stats(spark, args.warehouse)))
    elif args.cmd == "recent":
        print(json.dumps(cmd_recent(spark, args.warehouse, args.n)))
    else:
        print(json.dumps(cmd_search(spark, args.warehouse, args.query)))


if __name__ == "__main__":
    main()

"""Per-host politeness budget and robots.txt filtering (SURVEY §2.6 O5).

The reference's politeness is AutoThrottle (per-host target concurrency
1.0, settings.py:71-78) with robots DISABLED (settings.py:19). The engine
reproduces the reference under `host_budget=None, robots off`, and adds the
north-rule features:

- per-round per-host budget: rank URLs within host by the deterministic
  frontier order and keep rank ≤ budget,
- hot-host skew mitigation (axis B): for skewed hosts a single-window rank
  serializes the whole host into one task; with salt_buckets > 1 we
  pre-rank within (host, salt) buckets — any row ranked > budget in its
  bucket can't be ≤ budget globally — then exact-rank only the ≤budget×S
  survivors per host,
- robots.txt compliance: a robots(host, disallow_prefixes) table joined as
  a filter; reference has none (new functionality per north rule), so the
  equivalence oracle runs with robots=None.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def politeness_cap(
    df: DataFrame,
    budget: int | None,
    host_col: str = "host",
    order_cols: tuple[str, ...] = ("depth", "discovery_round", "discovery_seq", "url"),
    salt_buckets: int = 0,
    url_col: str = "url",
    host_budgets: dict[str, int] | None = None,
) -> DataFrame:
    """Keep at most ``budget`` URLs per host per round, by frontier order.

    ``host_budgets`` overrides the budget per host (e.g. derived from a
    robots.txt Crawl-delay via ``budgets_from_crawl_delays``); hosts not in
    the map use ``budget``. With both None this is the identity (reference
    semantics — politeness off)."""
    if budget is None and not host_budgets:
        return df
    order = [F.col(c) for c in order_cols]
    default_budget = budget if budget is not None else 2**31 - 1
    if host_budgets:
        spark = df.sparkSession
        budget_df = F.broadcast(
            spark.createDataFrame(
                sorted(host_budgets.items()), [host_col, "_host_budget"]
            )
        )
        df = df.join(budget_df, host_col, "left")
    else:
        df = df.withColumn("_host_budget", F.lit(None).cast("int"))
    eff = F.coalesce(F.col("_host_budget"), F.lit(default_budget))
    if salt_buckets and salt_buckets > 1:
        salted = F.concat(
            F.col(host_col),
            F.lit("#"),
            F.pmod(F.xxhash64(F.col(url_col)), F.lit(salt_buckets)).cast("string"),
        )
        pre = Window.partitionBy(salted).orderBy(*order)
        df = (
            df.withColumn("_pre_rank", F.row_number().over(pre))
            .filter(F.col("_pre_rank") <= eff)
            .drop("_pre_rank")
        )
    w = Window.partitionBy(host_col).orderBy(*order)
    return (
        df.withColumn("_host_rank", F.row_number().over(w))
        .filter(F.col("_host_rank") <= eff)
        .drop("_host_rank", "_host_budget")
    )


def budgets_from_crawl_delays(
    crawl_delays: dict[str, float], round_period_sec: float
) -> dict[str, int]:
    """AutoThrottle analog (reference settings.py:71-78 targets 1 req/host
    concurrency with adaptive delay): a host with Crawl-delay d gets at most
    floor(round_period / d) fetches per round, min 1."""
    return {
        host: max(1, int(round_period_sec / delay))
        for host, delay in crawl_delays.items()
        if delay and delay > 0
    }


def url_path(url: Column) -> Column:
    return F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("/"))


def robots_filter(
    candidates: DataFrame,
    robots: DataFrame | None,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Drop candidate URLs whose path matches a disallow prefix for their
    host. robots(host, disallow_prefixes: array<string>) is tiny (one row
    per host) → broadcast join; the prefix test is a native higher-order
    function, no Python."""
    if robots is None:
        return candidates
    path = url_path(F.col(url_col))
    joined = candidates.join(
        F.broadcast(robots.withColumnRenamed("host", host_col)),
        on=host_col,
        how="left",
    )
    blocked = F.exists(
        F.coalesce(F.col("disallow_prefixes"), F.array()),
        lambda p: path.startswith(p),
    )
    return joined.filter(~blocked).drop("disallow_prefixes")


def robots_blocked_py(url: str, robots_map: dict[str, list[str]] | None) -> bool:
    """Pure-Python twin for the simulator."""
    if not robots_map:
        return False
    from urllib.parse import urlparse

    parsed = urlparse(url)
    prefixes = robots_map.get(parsed.netloc, [])
    path = parsed.path or "/"
    return any(path.startswith(p) for p in prefixes)

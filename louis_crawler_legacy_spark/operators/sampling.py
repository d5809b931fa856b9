"""Deterministic (hash-based) sampling — reproducible corpus subsetting.

A 100 TB training-data pipeline samples constantly (eval slices, ablation
subsets, per-language quotas). `df.sample()` draws from a per-task RNG:
re-running the job, retrying a failed task, or changing the partitioning
changes WHICH rows are kept — unacceptable when the sample defines a
dataset other teams train on. Hash sampling keys the keep-decision on the
ROW (poly_hash(salt ‖ key) mod buckets < rate·buckets), so it is
  - retry/rerun/partitioning-stable and cluster-size-independent,
  - a narrow filter (no shuffle, no RNG state; evaluates inside the scan
    stage right after column pruning),
  - consistent across engines (the same fold is SQL-expressible, so the
    driver gate value-checks it — and a DuckDB/Trino user draws the SAME
    sample),
  - composable: different salts give independent samples; the same salt
    at a higher rate gives a SUPERSET (nested samples for scaling-law
    runs).

Reference analog: none (the reference crawls everything); part of the
training-data suite alongside dedup/similarity/textstats.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

from louis_crawler_legacy_spark.operators.dedup import poly_hash

_BUCKETS = 10_000


def hash_bucket(key: Column, buckets: int = _BUCKETS, salt: str = "") -> Column:
    """Deterministic bucket ∈ [0, buckets) for a key (any castable type)."""
    return poly_hash(F.concat(F.lit(salt), key.cast("string"))) % buckets


def hash_sample(
    df: DataFrame,
    key: Column,
    rate: float,
    salt: str = "",
    buckets: int = _BUCKETS,
) -> DataFrame:
    """Keep ~rate of rows, deterministically in the key."""
    return df.where(hash_bucket(key, buckets, salt) < int(round(rate * buckets)))


def stratified_hash_sample(
    df: DataFrame,
    key: Column,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
    buckets: int = _BUCKETS,
) -> DataFrame:
    """Per-stratum rates (e.g. per-language quotas) as ONE case-expression
    threshold — no join, no shuffle; strata with no entry fall back to
    ``default_rate``."""
    thr = reduce(
        lambda acc, kv: acc.when(
            F.col(strata_col) == kv[0], int(round(kv[1] * buckets))
        ),
        rates.items(),
        F.when(F.lit(False), 0),
    ).otherwise(int(round(default_rate * buckets)))
    return df.where(hash_bucket(key, buckets, salt) < thr)


# --- DuckDB oracle fragment (same fold, kept adjacent) -----------------------


def oracle_hash_bucket(
    key_sql: str, buckets: int = _BUCKETS, salt: str = ""
) -> str:
    s = f"concat('{salt}', CAST({key_sql} AS VARCHAR))"
    return (
        "(list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series(1, len({s})), "
        f"i -> CAST(ascii(substr({s}, i, 1)) AS BIGINT))), "
        f"(acc, c) -> (acc * 31 + c) % 1000000007) % {buckets})"
    )

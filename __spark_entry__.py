"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Query implementations live in louis_crawler_legacy_spark.plans.driver_queries
(one entry per operator from SURVEY.md §2) and in the operator modules.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from louis_crawler_legacy_spark.plans import driver_queries
from louis_crawler_legacy_spark.sources.testdata import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the J1 work-queue anti-join (reference db.py:686-703) —
    documents lacking embeddings, counted per lang — on sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id, "left_anti")
        .groupBy("lang")
        .agg(F.count("*").alias("missing_cnt"))
        .orderBy("lang")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(driver_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each SQL-expressible query."""
    return dict(driver_queries.ORACLES)

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
    """Flagship: embedding-coverage report per lang — the J1 work-queue
    join (reference db.py:686-703) folded into a per-lang aggregate."""
    sf_dir = "/root/testdata/sf0.001"
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id"), F.lit(1).alias("has_emb")
    )
    return (
        d.join(e, d.doc_id == e.vec_id, "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce(F.col("has_emb"), F.lit(0))).alias("n_embedded"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy("lang")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(driver_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each SQL-expressible query."""
    return dict(driver_queries.ORACLES)

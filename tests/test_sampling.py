"""Deterministic hash sampling (operators/sampling.py): stability across
reruns/partitionings, nested-superset structure, per-stratum rates, and
salt independence."""

from __future__ import annotations

import pyspark.sql.functions as F

from louis_crawler_legacy_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
)


def _docs(spark, n=2000, parts=4):
    return spark.range(n, numPartitions=parts).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "fr")
        .otherwise("de")
        .alias("lang"),
    )


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_stable_across_reruns_and_partitioning(spark):
    d4 = _docs(spark, parts=4)
    d13 = _docs(spark, parts=13)
    a = _ids(hash_sample(d4, F.col("doc_id"), 0.3, salt="x"))
    b = _ids(hash_sample(d4, F.col("doc_id"), 0.3, salt="x"))
    c = _ids(hash_sample(d13.repartition(7), F.col("doc_id"), 0.3, salt="x"))
    assert a == b == c
    # rate is approximately honored (hash uniformity at n=2000)
    assert 0.25 <= len(a) / 2000 <= 0.35


def test_nested_superset_and_salt_independence(spark):
    d = _docs(spark)
    s10 = _ids(hash_sample(d, F.col("doc_id"), 0.1, salt="x"))
    s30 = _ids(hash_sample(d, F.col("doc_id"), 0.3, salt="x"))
    assert s10 <= s30  # same salt, higher rate -> superset (nested samples)
    other = _ids(hash_sample(d, F.col("doc_id"), 0.3, salt="y"))
    assert other != s30  # different salt -> a different (independent) draw
    overlap = len(s30 & other) / len(s30)
    assert 0.15 <= overlap <= 0.45  # ~rate, as independence predicts


def test_stratified_rates_and_default(spark):
    d = _docs(spark)
    out = stratified_hash_sample(
        d, F.col("doc_id"), "lang",
        rates={"en": 0.6, "fr": 0.2}, default_rate=0.0, salt="s",
    )
    by_lang = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert "de" not in by_lang  # default 0.0 drops the unlisted stratum
    assert 0.5 <= by_lang["en"] / 667 <= 0.7
    assert 0.12 <= by_lang["fr"] / 667 <= 0.28
    # stratified keep-set == per-stratum hash_sample (same salt): one CASE
    # threshold, not a different hash
    en_only = _ids(
        hash_sample(d.where(F.col("lang") == "en"), F.col("doc_id"), 0.6, salt="s")
    )
    assert _ids(out.where(F.col("lang") == "en")) == en_only

"""Physical-plan regression guards: pushdown, pruning, and join strategy
must survive refactors (the properties that matter at 100 TB)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = entry_mod.queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q1_filter_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reached the scan
    # column pruning: the wide columns never read
    assert "l_partkey" not in plan.split("ReadSchema")[1].splitlines()[0]
    assert "HashAggregate" in plan  # partial+final hash agg


def test_j1_anti_join_is_broadcast(spark):
    plan = plan_of(spark, "j1_anti_join_missing_embeddings")
    assert "BroadcastHashJoin LeftAnti" in plan
    assert "EqualTo(label,0)" in plan  # filter pushed below the join


def test_j3_dims_broadcast_fact_never_shuffles(spark):
    plan = plan_of(spark, "j3_broadcast_dim_join")
    # formatted explain lists each join in the tree and once per-node
    # detail section — just require: broadcasts present, no SMJ anywhere
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_f4_substring_pushdown(spark):
    plan = plan_of(spark, "f4_substring_prune")
    assert "StringContains(text,scan)" in plan


def test_o3_topk_no_global_sort(spark):
    plan = plan_of(spark, "o3_topk_recent")
    assert "TakeOrderedAndProject" in plan  # per-partition k, not a full sort


def test_minhash_single_aggregate(spark):
    plan = plan_of(spark, "d4_minhash_lsh")
    # the signature must be ONE hash aggregate (partial+final), not 64
    # separate passes; generator explode feeds it
    assert "Generate" in plan  # explode of shingles feeds the aggregate
    assert "HashAggregate" in plan

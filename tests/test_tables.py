"""Snapshot table store: append/overwrite/upsert/time-travel/rollback."""

from __future__ import annotations

from pyspark.sql import types as T

from louis_crawler_legacy_spark.sources.tables import Warehouse

SCHEMA = T.StructType(
    [T.StructField("url", T.StringType()), T.StructField("depth", T.IntegerType())]
)


def test_snapshot_lifecycle(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = wh.table("frontier", SCHEMA)

    assert t.read().count() == 0  # empty read with schema

    v1 = t.append(spark.createDataFrame([("a", 0), ("b", 0)], SCHEMA), {"round": 0})
    v2 = t.append(spark.createDataFrame([("c", 1)], SCHEMA), {"round": 1})
    assert (v1, v2) == (1, 2)
    assert t.read().count() == 3
    assert t.read(version=1).count() == 2  # time travel

    t.overwrite(spark.createDataFrame([("z", 9)], SCHEMA), {"round": 2})
    assert t.read().count() == 1
    assert t.read(version=2).count() == 3  # history preserved

    # rollback (resume-from-round)
    t.rollback_to(2)
    assert t.current_version() == 2
    assert t.read().count() == 3
    assert [m["meta"].get("round") for m in t.history()] == [0, 1]


def test_upsert_by_key(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh2"))
    t = wh.table("pages", SCHEMA)
    t.append(spark.createDataFrame([("a", 0), ("b", 0)], SCHEMA))
    t.upsert(spark.createDataFrame([("b", 5), ("c", 1)], SCHEMA), key="url")
    got = {r.url: r.depth for r in t.read().collect()}
    assert got == {"a": 0, "b": 5, "c": 1}


def test_concurrent_same_table_appends_allocate_distinct_versions(
    spark, tmp_path
):
    """The crawl engine's output appends drain across round boundaries, so
    two appends to ONE table can execute concurrently (the round-4 FAIR
    background pool made this overlap routine). Version allocation must be
    atomic: without the per-table write lock, both writers read the same
    manifest, pick the same v, and collide on os.replace (or lose a
    manifest update)."""
    from concurrent.futures import ThreadPoolExecutor

    wh = Warehouse(spark, str(tmp_path / "whc"))
    t = wh.table("races", SCHEMA)
    dfs = [
        spark.createDataFrame([(f"u{i}", i)], SCHEMA) for i in range(6)
    ]
    with ThreadPoolExecutor(max_workers=6) as ex:
        versions = list(ex.map(lambda d: t.append(d), dfs))
    assert sorted(versions) == [1, 2, 3, 4, 5, 6]
    assert t.read().count() == 6
    assert [v["v"] for v in t.history()] == [1, 2, 3, 4, 5, 6]

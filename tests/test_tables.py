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

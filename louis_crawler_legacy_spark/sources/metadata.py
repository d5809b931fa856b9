"""Metadata JSON scans and item exports (SURVEY §2.1 S5/S6/S15).

The reference lists stored items by globbing ``metadata/*.json``, parsing
each file and SKIPPING corrupt ones (db.py:206-224), with an S3 twin
(db.py:330-364). Spark equivalent: ``spark.read.json`` in PERMISSIVE mode —
corrupt records land in a ``_corrupt_record`` column and are dropped, valid
rows keep flowing. The same call works on ``s3a://bucket/metadata/`` paths.

Item exports (S15: scrapy's ``-o items.json/csv``) become plain
DataFrame writers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the reference's metadata JSON shape (db.py:144-155): everything except the
# html blob
METADATA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("last_crawled", T.LongType()),
        T.StructField("last_updated", T.StringType()),
        T.StructField("children", T.ArrayType(T.StringType())),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def read_metadata_json(spark: SparkSession, path: str) -> DataFrame:
    """S5/S6: permissive scan of metadata JSON files (disk or s3a://);
    corrupt files are dropped, matching list_stored_items' try/except-skip
    (db.py:216-222)."""
    df = (
        spark.read.schema(METADATA_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return df.filter(
        F.col("_corrupt_record").isNull() & F.col("url").isNotNull()
    ).drop("_corrupt_record")


def export_items(df: DataFrame, path: str, fmt: str = "json") -> None:
    """S15: item feed export (scrapy -o items.json / items.csv)."""
    writer = df.write.mode("overwrite")
    if fmt == "json":
        writer.json(path)
    elif fmt == "csv":
        # csv cannot carry arrays — serialize them, like the reference's
        # JSONB-in-text columns (db.py:524)
        for field in df.schema.fields:
            if isinstance(field.dataType, T.ArrayType):
                df = df.withColumn(field.name, F.to_json(field.name))
        df.write.mode("overwrite").option("header", "true").csv(path)
    else:
        raise ValueError(f"unsupported export format: {fmt}")

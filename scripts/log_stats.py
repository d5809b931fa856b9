#!/usr/bin/env python
"""Crawler-log analysis CLI — the twin of the reference's log_analyzer.py
(:46-182): parse a parallel-crawler log, group lines by `[TASK:xxxxxxxx]`
id, derive per-task (url, status, duration, line count) and global
success/failure/duration statistics.

Re-expressed relationally: `spark.read.text` + native `regexp_extract`
columns (no Python in the parse path), per-task aggregation is the A5
per-key agg shape, the global rollup is the A6 single-row stats shape.
At scale the log is a distributed text source; everything below is one
scan + one partial-agg shuffle on task_id.

    python scripts/log_stats.py LOG_FILE            # summary + stats
    python scripts/log_stats.py LOG_FILE TASK_ID    # one task's lines
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F

TASK_RE = r"\[TASK:([a-f0-9]{8})\]"
TS_RE = r"^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3})"
URL_RE = r"Processing URL.*?: (.+)"
ERR_RE = r"Error processing.*?: (.+)"
TS_FMT = "yyyy-MM-dd HH:mm:ss,SSS"


def parse_log(spark, log_file: str):
    """log lines → (line_no, line, task_id, ts, url, ok/err markers) —
    all native expressions (reference log_analyzer.py:46-76 line loop)."""
    lines = (
        spark.read.text(log_file)
        .withColumn("line_no", F.monotonically_increasing_id() + 1)
        .filter(F.length(F.trim("value")) > 0)
    )
    return lines.select(
        "line_no",
        F.col("value").alias("line"),
        F.nullif(F.regexp_extract("value", TASK_RE, 1), F.lit("")).alias("task_id"),
        F.to_timestamp(
            F.nullif(F.regexp_extract("value", TS_RE, 1), F.lit("")), TS_FMT
        ).alias("ts"),
        F.nullif(F.regexp_extract("value", URL_RE, 1), F.lit("")).alias("url"),
        F.col("value").contains("Successfully processed").alias("is_ok"),
        (
            F.col("value").contains("Error processing")
            | F.col("value").contains("Failed to load")
        ).alias("is_err"),
        F.nullif(F.regexp_extract("value", ERR_RE, 1), F.lit("")).alias("err"),
    )


def task_stats(parsed):
    """Per-task rollup (log_analyzer.py:46-101): first url, first/last
    timestamp → duration, status from the success/error markers, line
    count. ONE groupBy on task_id (map-side partial agg)."""
    return (
        parsed.filter(F.col("task_id").isNotNull())
        .groupBy("task_id")
        .agg(
            F.min_by("url", F.when(F.col("url").isNotNull(), F.col("line_no")))
            .alias("url"),
            F.min("ts").alias("start_time"),
            F.max("ts").alias("end_time"),
            F.count("*").alias("log_count"),
            # the reference iterates lines IN ORDER and overwrites status on
            # every marker (log_analyzer.py:82-90) — so the LAST marker
            # wins, not any_ok-first; same for the error message (last
            # "Error processing" match, kept even if status later flips)
            F.max(F.when(F.col("is_ok"), F.col("line_no"))).alias("last_ok"),
            F.max(F.when(F.col("is_err"), F.col("line_no"))).alias("last_err"),
            F.max_by("err", F.when(F.col("err").isNotNull(), F.col("line_no")))
            .alias("error"),
        )
        .select(
            "task_id", "url", "log_count", "error",
            F.when(
                F.col("last_ok") > F.coalesce(F.col("last_err"), F.lit(-1)),
                "success",
            )
            .when(F.col("last_err").isNotNull(), "error")
            .otherwise("unknown").alias("status"),
            F.round(
                F.col("end_time").cast("double") - F.col("start_time").cast("double"),
                3,
            ).alias("duration_sec"),
        )
    )


def global_stats(tasks):
    """The reference's STATISTICS block (log_analyzer.py:160-182) as one
    single-row aggregate."""
    row = tasks.agg(
        F.count("*").alias("total_tasks"),
        F.count(F.when(F.col("status") == "success", 1)).alias("successful"),
        F.count(F.when(F.col("status") == "error", 1)).alias("failed"),
        F.count(F.when(F.col("status") == "unknown", 1)).alias("unknown"),
        F.round(F.avg("duration_sec"), 3).alias("avg_duration"),
        F.round(F.min("duration_sec"), 3).alias("min_duration"),
        F.round(F.max("duration_sec"), 3).alias("max_duration"),
    ).first()
    return {k: row[k] for k in row.asDict()}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("log_file")
    p.add_argument("task_id", nargs="?", default=None)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("louis-log-stats").getOrCreate()
    parsed = parse_log(spark, args.log_file)
    if args.task_id:
        rows = (
            parsed.filter(F.col("task_id") == args.task_id)
            .orderBy("line_no").select("line_no", "line").collect()
        )
        print(json.dumps([{"line_no": r.line_no, "line": r.line} for r in rows]))
        return
    tasks = task_stats(parsed).cache()
    out = {
        "tasks": {
            r["task_id"]: {k: r[k] for k in
                           ("url", "status", "duration_sec", "log_count", "error")}
            for r in tasks.collect()
        },
        "stats": global_stats(tasks),
        "general_lines": int(parsed.filter(F.col("task_id").isNull()).count()),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

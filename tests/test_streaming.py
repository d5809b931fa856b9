"""Structured Streaming: bounded end-to-end run over the events table and
batch/stream plan equivalence of the windowed aggregate."""

from __future__ import annotations

import os
import shutil

from louis_crawler_legacy_spark.sources.testdata import load_table
from louis_crawler_legacy_spark.streaming import events as ev

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), src)

    ev.run_stream_once(
        spark, src, str(tmp_path / "ckpt"), str(tmp_path / "out"),
        window="1 hour",
    )
    got = spark.read.parquet(str(tmp_path / "out"))

    batch = ev.windowed_event_counts(
        load_table(spark, SF_DIR, "events"), window="1 hour"
    )
    # append-mode stream emits only windows closed by the watermark; the
    # final watermark sits 20 min behind max(ts), so the last window is
    # withheld — compare on the emitted subset
    got_rows = {tuple(r) for r in got.collect()}
    batch_rows = {tuple(r) for r in batch.collect()}
    assert got_rows, "stream emitted nothing"
    assert got_rows.issubset(batch_rows)
    missing = batch_rows - got_rows
    # only trailing windows (per key) may be withheld
    max_emitted = max(r[1] for r in got_rows)
    assert all(r[1] >= max_emitted for r in missing)


def test_metrics_stream_over_crawl_output(spark, tmp_path):
    import tempfile

    from louis_crawler_legacy_spark.plans.crawl import CrawlConfig, CrawlEngine
    from louis_crawler_legacy_spark.sources import corpus as cm

    corpus = cm.generate_corpus(seed=42, n_hosts=2, pages_per_host=6, links_per_page=3)
    wh = str(tmp_path / "wh")
    eng = CrawlEngine(
        spark, cm.corpus_df(spark, corpus), wh,
        CrawlConfig(max_depth=1, batch_size=8, num_partitions=2,
                    bloom_capacity=1000),
    )
    eng.run(seeds=cm.seed_urls(corpus, n=1))

    agg = ev.stream_metrics(spark, os.path.join(wh, "metrics", "v*"))
    q = (
        agg.writeStream.outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .format("memory")
        .queryName("m")
        .start()
    )
    q.awaitTermination()
    row = spark.sql("SELECT * FROM m").collect()[0]
    assert row.total_scheduled > 0
    assert row.latest_round >= 1


def test_host_sessions_stateful_matches_batch(spark, tmp_path):
    """applyInPandasWithState per-host session operator: cumulative state
    across micro-batches — the FINAL per-host snapshot equals a plain batch
    groupBy over the same events (bounded-input contract)."""
    import pandas as pd

    from louis_crawler_legacy_spark.streaming.sessions import (
        FETCH_EVENT_SCHEMA,
        host_sessions,
    )

    src = tmp_path / "events"
    src.mkdir()
    batch1 = [("a.ca", f"http://a.ca/{i}", 1000 + i, i % 3 != 0) for i in range(20)]
    batch1 += [("b.ca", f"http://b.ca/{i}", 2000 + i, True) for i in range(5)]
    batch2 = [("a.ca", f"http://a.ca/x{i}", 3000 + i, False) for i in range(7)]
    batch2 += [("c.ca", f"http://c.ca/{i}", 4000 + i, True) for i in range(3)]
    for name, rows in (("b1", batch1), ("b2", batch2)):
        spark.createDataFrame(rows, FETCH_EVENT_SCHEMA).coalesce(1).write.parquet(
            str(src / name)
        )

    stream = (
        spark.readStream.schema(FETCH_EVENT_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )
    q = (
        host_sessions(stream)
        .writeStream.outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .format("memory")
        .queryName("sessions")
        .start()
    )
    q.awaitTermination(120)

    snap = spark.sql("SELECT * FROM sessions").toPandas()
    # last snapshot per host (multiple triggers → multiple update rows)
    final = (
        snap.sort_values(["host", "n_fetches"]).groupby("host").tail(1)
        .set_index("host")
    )
    all_events = pd.DataFrame(
        batch1 + batch2, columns=["host", "url", "ts", "ok"]
    )
    want = all_events.groupby("host").agg(
        n_fetches=("url", "size"),
        n_errors=("ok", lambda s: int((~s).sum())),
        first_ts=("ts", "min"),
        last_ts=("ts", "max"),
    )
    for host in ("a.ca", "b.ca", "c.ca"):
        got = final.loc[host]
        exp = want.loc[host]
        for colname in ("n_fetches", "n_errors", "first_ts", "last_ts"):
            assert int(got[colname]) == int(exp[colname]), (host, colname)

"""louis_crawler_legacy_spark — a from-scratch PySpark-native URL frontier,
fetch scheduler, and document-processing engine with the capabilities of
ai-cfia/louis-crawler-legacy (reference at /root/reference, read-only).

NOT a port: the reference is a Scrapy pipeline (per-row Python, single
driver process, file-backed frontier). This engine re-expresses the same
semantics as declarative Spark DataFrame plans + vectorized pandas/Arrow
UDFs over snapshot-versioned tables, designed for a 10^10-URL frontier on
a multi-executor cluster:

- hash-partitioning on canonicalized host (frontier / seen / politeness),
- partitioned Bloom URL-seen probe + exact left-anti dedup,
- per-host politeness budgets and robots.txt filters,
- round-based BFS frontier expansion (one Spark job per round),
- checkpoint/resume via table snapshots with per-round lineage metrics.

See SURVEY.md for the file:line mapping of every reference operator.
"""

__version__ = "0.1.0"

"""Round-based BFS frontier engine — the Spark re-expression of the
reference's parallel-spider main loop (goldie_playwright_parallel.py:761-865,
traced in SURVEY §3.2). One Spark job per crawl round; the driver only
sequences rounds and moves snapshot ids, never URLs.

Deterministic order contract (SURVEY §5.3): the reference's within-depth
order is nondeterministic (set iteration); the engine and the pure-Python
simulator (louis_crawler_legacy_spark/simulator.py) both implement the total
order (depth, discovery_round, discovery_seq, url), where discovery_seq is
the first-occurrence position of the URL among the round's extracted
children (page batch order × link position) — the order the reference DOES
preserve per page (goldie.py:29-35).

Round pipeline (all DataFrame ops; the only Python is the fused extraction
UDF and the numpy Bloom probe):

  frontier ──dedup-by-url──▶ politeness cap ──order+limit──▶ batch
     batch ──LEFT JOIN corpus──▶ fetched (miss/≥400 → errored)
   fetched ──extract (mapInPandas)──▶ pages′ + children
    pages′ ──upsert──▶ pages;  edges ──anti-join──▶ links
  children ──robots──▶ candidates ──bloom probe──▶ {definitely-new | maybe}
     maybe ──exact left-anti seen──▶ new ∪ definitely-new ──▶ frontier′
  seen′ = seen ∪ batch;  blooms′ = blooms ⊕ batch;  metrics += round row

Scale notes: frontier/seen/blooms are hash-partitioned by canonical host
(north rule axis A); the politeness window uses salted pre-ranking for hot
hosts (axis B); the exact anti-join's probe side is only the Bloom-hit
subset (operators/bloom.py).
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from louis_crawler_legacy_spark.functions.extract import extract_pages
from louis_crawler_legacy_spark.operators import bloom as bloom_mod
from louis_crawler_legacy_spark.operators.politeness import (
    politeness_cap,
    robots_filter,
)
from louis_crawler_legacy_spark.operators.spans import SPANS_TYPE, docs_to_spans
from louis_crawler_legacy_spark.sources.tables import Warehouse

ORDER_COLS = ("depth", "discovery_round", "discovery_seq", "url")

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("discovery_round", T.IntegerType()),
        T.StructField("discovery_seq", T.LongType()),
    ]
)

SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("round_added", T.IntegerType()),
        T.StructField("status", T.StringType()),  # scraped | errored
    ]
)

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("html_content", T.StringType()),
        T.StructField("last_crawled", T.IntegerType()),
        T.StructField("last_updated", T.StringType()),
        T.StructField("children", T.ArrayType(T.StringType())),
        T.StructField("depth", T.IntegerType()),
    ]
)

LINKS_SCHEMA = T.StructType(
    [
        T.StructField("source_url", T.StringType()),
        T.StructField("destination_url", T.StringType()),
    ]
)

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType())),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("round", T.IntegerType()),
        T.StructField("n_batch", T.LongType()),
        T.StructField("n_scraped", T.LongType()),
        T.StructField("n_errored", T.LongType()),
        T.StructField("n_candidates", T.LongType()),
        T.StructField("n_new_frontier", T.LongType()),
        T.StructField("n_bloom_hits", T.LongType()),
        T.StructField("frontier_size_after", T.LongType()),
        T.StructField("wall_sec", T.DoubleType()),
    ]
)


@dataclass
class CrawlConfig:
    max_depth: int = 4  # run.sh:5
    batch_size: int = 64  # run.sh:5
    host_budget: int | None = None  # per-round per-host cap (None = reference)
    # per-host overrides, e.g. politeness.budgets_from_crawl_delays(robots)
    host_budgets: dict[str, int] | None = None
    salt_buckets: int = 0  # >1 enables salted pre-ranking for hot hosts
    num_partitions: int = 8  # host-hash partitions for seen/bloom
    allowed_domains: tuple[str, ...] = ()  # substring match on netloc
    robots: dict[str, list[str]] | None = None  # host -> disallow prefixes
    bloom_capacity: int = 1_000_000
    bloom_fpp: float = 0.01
    base_timestamp: int = 1_700_000_000  # last_crawled = base + round (P5)
    # The seen-set guarantees a URL is fetched at most once per warehouse,
    # so pages/links writes are pure appends (the reference's ON CONFLICT
    # upsert, db.py:494-528, only matters for re-runs against a shared DB —
    # our warehouse persists `seen`, so even resume never refetches).
    # Set False to get MERGE-style upserts (recrawl workloads).
    unique_fetch: bool = True
    # per-round candidate/bloom-hit counts cost extra Spark actions; tests
    # want them, tight benchmark loops don't
    detailed_metrics: bool = True
    # checkpoint cadence: 1 = snapshot state tables every round (max
    # resumability), k>1 = every k rounds, 0 = only at the end of run().
    # Frontier/seen/bloom state lives in cached DataFrames between
    # checkpoints — the Iceberg-commit-per-round pattern decoupled from the
    # round loop. pages/links appends (the crawl OUTPUT) always flush per
    # round; a crash loses at most the rounds since the last checkpoint.
    checkpoint_every: int = 1
    # collect the batch's URLs to the driver (tests/oracles want the exact
    # ordered list; a 10^7-URL production round must NOT ship URLs to the
    # driver — the driver only moves counts and snapshot ids)
    collect_batch_urls: bool = True
    # build the interleaved span payload (documents table, input_hint schema)
    # for every fetched page inside the round — chunking + link spans. This
    # is the engine's actual product at training-data scale; enabled in the
    # benchmark, off in the reference-equivalence oracle (the reference
    # chunks in a separate spider, hawn — see plans/pipelines.py)
    build_spans: bool = False


@dataclass
class RoundStats:
    round: int
    n_batch: int
    n_scraped: int
    n_errored: int
    n_candidates: int
    n_new_frontier: int
    n_bloom_hits: int
    frontier_size_after: int
    wall_sec: float = 0.0
    batch_urls: list[str] = field(default_factory=list)


def _host(col):
    # netloc exactly as the reference computes it (split('/')[2],
    # goldie_playwright_parallel.py:192-197)
    return F.split(col, "/").getItem(2)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        corpus: DataFrame,
        warehouse_dir: str,
        config: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.config = config or CrawlConfig()
        self.wh = Warehouse(spark, warehouse_dir)
        self.frontier = self.wh.table("frontier", FRONTIER_SCHEMA)
        self.seen = self.wh.table("seen", SEEN_SCHEMA)
        self.pages = self.wh.table("pages", PAGES_SCHEMA)
        self.links = self.wh.table("links", LINKS_SCHEMA)
        self.metrics = self.wh.table("metrics", METRICS_SCHEMA)
        self.documents = self.wh.table(
            "documents",
            T.StructType(
                [T.StructField("doc_id", T.StringType()),
                 T.StructField("spans", SPANS_TYPE)]
            ),
        )
        self.blooms = self.wh.table("seen_bloom", bloom_mod.BLOOM_SCHEMA)
        m, k = bloom_mod.bloom_params(self.config.bloom_capacity, self.config.bloom_fpp)
        self.pb = bloom_mod.PartitionedBloom(m, k)
        # fetch source: hash-partitioned once, cached — stands in for the web.
        # Partition count ≥ 2×cores so the fetch-join output (which the
        # CPU-bound extraction inherits) keeps every core busy without ever
        # shuffling the wide html column.
        # 4× cores: fine enough that per-task skew in the CPU-bound
        # extraction averages out instead of leaving straggler waves
        corpus_parts = max(
            self.config.num_partitions,
            4 * spark.sparkContext.defaultParallelism,
        )
        self.corpus = corpus.repartition(corpus_parts, F.col("url")).cache()
        self.robots_df = None
        if self.config.robots:
            self.robots_df = spark.createDataFrame(
                [(h, ps) for h, ps in sorted(self.config.robots.items())],
                ROBOTS_SCHEMA,
            )
        # in-memory state between checkpoints (cached DataFrames)
        self._frontier_df: DataFrame | None = None
        self._seen_df: DataFrame | None = None
        self._blooms_df: DataFrame | None = None
        self._pending_metrics: list[tuple] = []
        self._dirty = False

    # -- state management --------------------------------------------------------
    def _load_state(self) -> None:
        if self._frontier_df is None:
            self._frontier_df = self.frontier.read().cache()
        if self._seen_df is None:
            self._seen_df = self.seen.read().cache()
        if self._blooms_df is None:
            self._blooms_df = self.blooms.read().cache()

    def _swap_state(self, frontier_df, seen_df, blooms_df) -> None:
        for old in (self._frontier_df, self._seen_df, self._blooms_df):
            if old is not None:
                old.unpersist()
        self._frontier_df, self._seen_df, self._blooms_df = (
            frontier_df, seen_df, blooms_df,
        )

    def checkpoint(self, round_no: int) -> None:
        """Snapshot the in-memory state (X5). At real scale seen would get
        delta-appends; the local store rewrites it (copy-on-write)."""
        if not self._dirty:
            return
        self.frontier.overwrite(self._frontier_df, {"round": round_no})
        self.seen.overwrite(self._seen_df, {"round": round_no})
        self.blooms.overwrite(self._blooms_df, {"round": round_no})
        if self._pending_metrics:
            self.metrics.append(
                self.spark.createDataFrame(self._pending_metrics, METRICS_SCHEMA),
                {"round": round_no},
            )
            self._pending_metrics = []
        self._dirty = False

    # -- bootstrap ------------------------------------------------------------
    def bootstrap(self, seeds: list[str]) -> None:
        """Round 0: seeds ∖ seen → frontier at depth 0
        (goldie_playwright_parallel.py:763-766 + U4 resume reconciliation)."""
        seed_df = self.spark.createDataFrame(
            [(u, i) for i, u in enumerate(seeds)], ["url", "seed_idx"]
        )
        seen_urls = self.seen.read().select("url")
        fresh = seed_df.join(seen_urls, "url", "left_anti")
        rows = fresh.select(
            "url",
            _host(F.col("url")).alias("host"),
            F.lit(0).alias("depth"),
            F.lit(0).alias("discovery_round"),
            F.col("seed_idx").cast("long").alias("discovery_seq"),
        )
        self.frontier.overwrite(rows, {"round": 0, "op": "bootstrap"})
        self._swap_state(self.frontier.read().cache(), None, None)
        self._seen_df = None
        self._blooms_df = None

    # -- one round --------------------------------------------------------------
    def select_batch(self, frontier_df: DataFrame) -> DataFrame:
        """O1+O5: url-dedup (first occurrence), politeness cap, order, limit."""
        cfg = self.config
        order = [F.col(c) for c in ORDER_COLS]
        first_by_url = Window.partitionBy("url").orderBy(*order)
        deduped = (
            frontier_df.withColumn("_rn", F.row_number().over(first_by_url))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        capped = politeness_cap(
            deduped, cfg.host_budget, salt_buckets=cfg.salt_buckets,
            host_budgets=cfg.host_budgets,
        )
        batch = capped.orderBy(*order).limit(cfg.batch_size)
        # batch_seq: deterministic position within the batch (for candidate
        # discovery order). The unpartitioned window is safe: it runs on the
        # post-limit batch (≤ batch_size rows), never the full frontier.
        w = Window.orderBy(*order)
        return batch.withColumn("batch_seq", F.row_number().over(w))

    def run_round(self, round_no: int) -> RoundStats | None:
        cfg = self.config
        t0 = time.time()
        _prof = os.environ.get("CRAWL_PROFILE")
        _last = [t0]

        def _mark(label):
            if _prof:
                now = time.time()
                print(f"    [prof r{round_no}] {label}: {now - _last[0]:.2f}s", flush=True)
                _last[0] = now

        self._load_state()
        frontier_df = self._frontier_df
        batch = self.select_batch(frontier_df).cache()
        if cfg.collect_batch_urls:
            batch_rows = batch.select("url", "batch_seq").orderBy("batch_seq").collect()
            n_batch = len(batch_rows)
            batch_urls = [r.url for r in batch_rows]
        else:
            n_batch = batch.count()
            batch_urls = []
        _mark("select_batch")
        if n_batch == 0:
            batch.unpersist()
            return None

        # S1/J7: fetch = join against the corpus (middlewares.py:104-117
        # replay pattern); miss or status ≥ 400 → errored (F7).
        # The batch is broadcast INTO the corpus (inner join) so the wide
        # html column never moves — extraction inherits the corpus's
        # partitioning (≥ 2×cores). Misses are recovered with a cheap
        # anti-join on the (small) batch side. At production scale this
        # whole stage is a mapInPandas HTTP fetcher with the same schema.
        hits = self.corpus.drop("host").join(F.broadcast(batch), "url", "inner")
        misses = (
            batch.join(self.corpus.select("url"), "url", "left_anti")
            .withColumn("status", F.lit(None).cast("int"))
            .withColumn("html", F.lit(None).cast("string"))
        )
        fetched = hits.unionByName(misses).withColumn(
            "success", F.col("status").isNotNull() & (F.col("status") < 400)
        ).cache()

        ok = fetched.filter("success")
        extracted = extract_pages(
            ok,
            list(cfg.allowed_domains) or None,
            passthrough=["url", "host", "depth", "discovery_round",
                         "discovery_seq", "batch_seq"],
        ).cache()
        n_scraped = extracted.count()
        errored = fetched.filter(~F.col("success")).select(
            "url", "host", "depth", "batch_seq"
        )
        _mark("fetch+extract")
        n_errored = n_batch - n_scraped

        # S7: pages upsert (MERGE by url)
        page_rows = extracted.select(
            F.xxhash64("url").alias("id"),
            "url",
            "title",
            "lang",
            F.col("content").alias("html_content"),
            F.lit(cfg.base_timestamp + round_no).alias("last_crawled"),
            "last_updated",
            "children",
            "depth",
        )
        # the three output writes (pages/links/spans) are independent of the
        # candidate-dedup path and of each other — run them as concurrent
        # Spark jobs off the round's critical path (joined before the round
        # closes so failures still surface in-round)
        out_pool = ThreadPoolExecutor(max_workers=3)
        out_futures = []
        if cfg.unique_fetch:
            out_futures.append(out_pool.submit(
                self.pages.append, page_rows, {"round": round_no}))
        else:
            self.pages.upsert(page_rows, key="url", meta={"round": round_no})

        _mark("pages_write")
        # S10/J6: link edges insert-if-absent
        edges = extracted.select(
            F.col("url").alias("source_url"),
            F.explode("children").alias("destination_url"),
        ).dropDuplicates(["source_url", "destination_url"])
        if cfg.unique_fetch:
            # src fetched once ⇒ (src,dst) can never repeat across rounds;
            # within-round dedup above suffices (J6 insert-if-absent holds)
            out_futures.append(out_pool.submit(
                self.links.append, edges, {"round": round_no}))
        else:
            new_edges = edges.join(
                self.links.read(), ["source_url", "destination_url"], "left_anti"
            )
            self.links.append(new_edges, {"round": round_no})

        _mark("links_write")
        if cfg.build_spans:
            spans_df = docs_to_spans(
                fetched.filter("success").select(
                    F.col("url").alias("doc_id"), "html", "url"
                ),
                id_col="doc_id",
            )
            out_futures.append(out_pool.submit(
                self.documents.append, spans_df, {"round": round_no}))
        _mark("spans_write")
        # U1: seen ∪ batch (both outcomes) — BEFORE candidate filtering,
        # matching the reference's file-update order (:839-849)
        seen_add = (
            extracted.select(
                "url", "host", F.xxhash64("url").alias("url_hash"),
                F.lit(round_no).alias("round_added"), F.lit("scraped").alias("status"),
            )
            .unionByName(
                errored.select(
                    "url", "host", F.xxhash64("url").alias("url_hash"),
                    F.lit(round_no).alias("round_added"),
                    F.lit("errored").alias("status"),
                )
            )
        )
        # localCheckpoint: materialize AND truncate the logical plan —
        # without it the state lineage grows every round and Catalyst
        # re-analysis goes exponential (the classic iterative-job trap).
        # Durability comes from checkpoint() snapshots, not these blocks.
        seen_new = self._seen_df.unionByName(seen_add).localCheckpoint()

        # blooms ⊕ batch
        add_hashes = bloom_mod.with_bloom_hashes(
            seen_add.select("url", "host"), "url", "host", cfg.num_partitions
        ).select("part_id", "h1", "h2")
        blooms_new = self.pb.merge_blobs(self._blooms_df, add_hashes).localCheckpoint()

        _mark("seen+bloom_ckpt")
        # candidates: children at depth+1 ≤ max_depth (O2), discovery order =
        # (src batch_seq, link position), first-occurrence dedup by url
        cand = extracted.filter(F.col("depth") + 1 <= cfg.max_depth).select(
            "batch_seq",
            (F.col("depth") + 1).cast("int").alias("next_depth"),
            F.posexplode("children").alias("pos", "cand_url"),
        )
        # within-round first-occurrence dedup is on the (url, depth) PAIR —
        # the reference's pending set holds (url, depth) tuples (:610-616),
        # so mixed-depth batches may legitimately add both
        first_w = Window.partitionBy("cand_url", "next_depth").orderBy(
            "batch_seq", "pos"
        )
        cand = (
            cand.withColumn("_rn", F.row_number().over(first_w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        n_candidates = cand.count() if cfg.detailed_metrics else -1

        _mark("cand_dedup_window")
        # robots (engine feature; off for reference equivalence)
        cand = cand.withColumn("host", _host(F.col("cand_url")))
        cand = robots_filter(cand, self.robots_df, url_col="cand_url")

        # J2 two-stage dedup: bloom probe, then exact left-anti on the hits
        cand_h = bloom_mod.with_bloom_hashes(
            cand, "cand_url", "host", cfg.num_partitions
        )
        probed = self.pb.probe(cand_h, blooms_new).cache()
        definitely_new = probed.filter(~F.col("maybe_seen"))
        maybe = probed.filter(F.col("maybe_seen"))
        n_bloom_hits = maybe.count() if cfg.detailed_metrics else -1
        confirmed_new = maybe.join(
            seen_new.select(F.col("url").alias("cand_url")),
            "cand_url",
            "left_anti",
        )
        new_cand = definitely_new.unionByName(confirmed_new)

        _mark("bloom_probe+anti")
        # not already pending at the same (url, depth) (reference
        # `(url, depth) not in pending`, :610-616) — vs post-removal frontier
        frontier_after_removal = frontier_df.join(
            batch.select("url"), "url", "left_anti"
        )
        new_cand = new_cand.join(
            frontier_after_removal.select(
                F.col("url").alias("cand_url"),
                F.col("depth").alias("next_depth"),
            ),
            ["cand_url", "next_depth"],
            "left_anti",
        )

        # assign discovery metadata; deterministic within-round sequence.
        # Unpartitioned window is bounded by batch_size × links_per_page —
        # per-round work, not frontier-sized.
        seq_w = Window.orderBy("batch_seq", "pos")
        new_rows = (
            new_cand.withColumn("discovery_seq", F.row_number().over(seq_w).cast("long"))
            .select(
                F.col("cand_url").alias("url"),
                "host",
                F.col("next_depth").cast("int").alias("depth"),
                F.lit(round_no).alias("discovery_round"),
                "discovery_seq",
            )
        )

        frontier_new = frontier_after_removal.unionByName(new_rows).localCheckpoint()
        # n_new is the north-rule 'deduped' volume — always measured
        n_new = new_rows.count()
        frontier_size = frontier_new.count() if cfg.detailed_metrics else -1

        _mark("frontier_ckpt+counts")
        for fut in out_futures:
            fut.result()  # surface output-write failures in-round
        out_pool.shutdown()

        self._swap_state(frontier_new, seen_new, blooms_new)
        self._dirty = True

        wall = time.time() - t0
        stats = RoundStats(
            round=round_no,
            n_batch=n_batch,
            n_scraped=n_scraped,
            n_errored=n_errored,
            n_candidates=n_candidates,
            n_new_frontier=n_new,
            n_bloom_hits=n_bloom_hits,
            frontier_size_after=frontier_size,
            wall_sec=wall,
            batch_urls=batch_urls,
        )
        self._pending_metrics.append(
            (round_no, n_batch, n_scraped, n_errored,
             n_candidates, n_new, n_bloom_hits, frontier_size, wall)
        )
        if cfg.checkpoint_every and round_no % cfg.checkpoint_every == 0:
            self.checkpoint(round_no)
        batch.unpersist()
        fetched.unpersist()
        extracted.unpersist()
        probed.unpersist()
        return stats

    def run(self, seeds: list[str] | None = None, max_rounds: int = 10_000,
            start_round: int = 1) -> list[RoundStats]:
        if seeds is not None:
            self.bootstrap(seeds)
        stats = []
        r = start_round
        while r < start_round + max_rounds:
            s = self.run_round(r)
            if s is None:
                break
            stats.append(s)
            r += 1
        self.checkpoint(r - 1)  # final checkpoint (no-op if clean)
        return stats

    # -- resume (X5) -----------------------------------------------------------
    def last_completed_round(self) -> int:
        """Last CHECKPOINTED round (resume granularity = checkpoint cadence)."""
        hist = self.frontier.history()
        return max((h["meta"].get("round", 0) for h in hist), default=0)

    def resume(self, max_rounds: int = 10_000) -> list[RoundStats]:
        """Continue from the latest snapshots (per-round lineage is in each
        table's manifest history)."""
        return self.run(seeds=None, max_rounds=max_rounds,
                        start_round=self.last_completed_round() + 1)

    def rollback_to_round(self, round_no: int) -> None:
        """Time-travel every state table back to the end of ``round_no``."""
        for table in (self.frontier, self.seen, self.pages, self.links,
                      self.metrics, self.blooms):
            target = 0
            for h in table.history():
                if h["meta"].get("round", -1) <= round_no:
                    target = max(target, h["v"])
            table.rollback_to(target)
        self._swap_state(None, None, None)
        self._pending_metrics = []
        self._dirty = False

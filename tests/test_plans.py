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
    # inspect the UNMATERIALIZED plan (materialize_sig=False): the default
    # path localCheckpoints the signature table, which truncates the
    # visible lineage (see test_minhash_sig_materialized_once below)
    from louis_crawler_legacy_spark.operators.dedup import minhash_lsh_pairs

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = minhash_lsh_pairs(df, threshold=0.3, materialize_sig=False)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # the signature must be ONE hash aggregate (partial+final), not 64
    # separate passes; generator explode feeds it
    assert "Generate" in plan  # explode of shingles feeds the aggregate
    assert "HashAggregate" in plan
    assert "partial_min" in plan  # map-side combine below the exchange


def test_minhash_sig_materialized_once(spark):
    """r06: the LSH self-join reads the signature table from BOTH sides
    and AQE does not reuse the exchange — the default path must therefore
    materialize (localCheckpoint) the signatures so the 64-min aggregate
    runs ONCE: no aggregate may remain in the returned join plan."""
    plan = plan_of(spark, "d4_minhash_lsh")
    assert "partial_min" not in plan  # sig agg already ran, not re-planned
    assert "Scan ExistingRDD" in plan  # both sides read the checkpoint


def test_d8_shuffles_window_hashes_not_strings(spark):
    """r06: d8's frequency groupBy and membership join must key on the
    8-byte xxhash64 of the window, never the raw 10-word window STRING
    (~60-100 bytes/position ≈ 10-20x corpus text bytes at the 100 TB
    design point). Every Exchange input must be hash/count columns only."""
    import re

    plan = plan_of(spark, "d8_dup_substring")
    assert "xxhash64" in plan
    for b in re.split(r"\n\n", plan):
        if re.search(r"\(\d+\) Exchange", b):
            assert not re.search(r"\bwin#", b), (
                f"window string crossed an exchange:\n{b}"
            )
            assert not re.search(r"\btext#", b), (
                f"text crossed an exchange:\n{b}"
            )


def test_d7_incremental_signatures_only_text_never_shuffles(spark):
    """d7 (incremental dedup): both sides' minhash signatures are ONE
    map-side-combined aggregate (partial_min below the exchange), and the
    raw `text` column never crosses an Exchange — the corpus contributes
    signatures (~0.5 KB/doc), the join shuffles (band, band_hash) keys."""
    import re

    plan = plan_of(spark, "d7_incremental_dedup")
    assert "partial_min" in plan
    for b in re.split(r"\n\n", plan):
        if re.search(r"\(\d+\) Exchange", b):
            assert not re.search(r"\btext#", b), f"text crossed an exchange:\n{b}"


def test_d3_hot_block_triggers_aqe_skew_split(spark):
    """The blocked dedup paths rely on AQE's skew-join for hot blocks
    (session.py enables it; dedup.py documents it). Prove it actually
    fires AND doesn't change results: plant one block holding 80% of the
    docs, lower the skew thresholds to test scale, and the final adaptive
    plan must show the skewed partition split — with the exact expected
    pair set (hot-block C(800,2) pairs; every cold block is a singleton)."""
    import random

    from louis_crawler_legacy_spark.operators.dedup import ngram_jaccard_pairs

    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    knobs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in knobs}
    try:
        for k, v in knobs.items():
            spark.conf.set(k, v)
        rng = random.Random(7)

        def words():
            return " ".join(f"w{rng.randrange(10**9)}" for _ in range(12))

        rows = [(f"hot{i}", "alpha beta " + words()) for i in range(800)]
        rows += [(f"cold{i}", f"u{i} v{i} " + words()) for i in range(200)]
        df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)
        out = ngram_jaccard_pairs(df, threshold=0.0)
        got = out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        assert "AQEShuffleRead" in plan and "skewed" in plan
        # results unchanged by the split: exactly the hot block's pairs
        assert len(got) == 800 * 799 // 2
        assert all(r.id_a.startswith("hot") and r.id_b.startswith("hot")
                   for r in got)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_c3_text_never_crosses_an_exchange(spark):
    """c3 (cluster-canonical selection): quality is computed in the scan
    project, so the documents' wide `text` column must never appear in an
    Exchange — only (cluster_id, doc_id, quality) longs/doubles move into
    the per-cluster max_by aggregate. Guards against a refactor that joins
    clusters to raw documents and computes quality after the shuffle."""
    import re

    plan = plan_of(spark, "c3_cluster_canonical")
    # formatted explain: each Exchange node has a detail block starting
    # "(N) Exchange" whose Input [...] lists the attributes that move
    blocks = re.split(r"\n\n", plan)
    exchange_blocks = [b for b in blocks if re.search(r"\(\d+\) Exchange", b)]
    for b in exchange_blocks:
        assert not re.search(r"\btext#", b), f"text crossed an exchange:\n{b}"
    # the aggregate itself is present (partial+final max_by)
    assert "max_by" in plan


def test_t6_repetition_partial_agg_no_text_in_exchange(spark):
    """t6 (repetition report): the (doc, bigram) count must be map-side
    combined (the shuffle carries partial counts, not one row per token
    position), and the raw `text` column must never cross an Exchange —
    dup_word_frac and the bigram array are computed in the scan project."""
    import re

    plan = plan_of(spark, "t6_repetition")
    assert "partial_count" in plan
    for b in re.split(r"\n\n", plan):
        if re.search(r"\(\d+\) Exchange", b):
            assert not re.search(r"\btext#", b), f"text crossed an exchange:\n{b}"
            # r06: the count keys on xxhash64(gram) — the raw bigram
            # string must not cross the exchange either
            assert not re.search(r"\bg#", b), (
                f"gram string crossed an exchange:\n{b}"
            )


def test_c4_eval_broadcasts_corpus_never_shuffles_text(spark):
    """c4 (decontamination): the eval shingle set must BROADCAST (the
    corpus probes it in place — at 10^9 docs vs 10^4 benchmark rows a
    sort-merge join would shuffle the whole exploded corpus), and the
    corpus `text` column must never cross an Exchange: only
    (doc_id, partial_count) moves into the per-doc aggregate."""
    import re

    plan = plan_of(spark, "c4_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan  # map-side combine below the exchange
    blocks = re.split(r"\n\n", plan)
    for b in blocks:
        if re.search(r"\(\d+\) Exchange", b):
            assert not re.search(r"\btext#", b), f"text crossed an exchange:\n{b}"


def test_t5_vocab_topk_partial_agg_no_global_sort(spark):
    """t5 (vocabulary top-k): the exchange must carry (term, partial_n),
    not one row per token — partial_count collapses each task's terms
    before the shuffle — and the top-50 must be TakeOrderedAndProject
    (per-partition k), never a global Sort. At 100 TB the explode emits
    ~10^13 token rows; without the map-side combine the shuffle is the
    whole corpus re-keyed by term."""
    plan = plan_of(spark, "t5_vocab_topk")
    assert "partial_count" in plan  # map-side combine below the exchange
    assert "TakeOrderedAndProject" in plan
    # no standalone global Sort node (TakeOrderedAndProject subsumes it)
    import re

    assert not re.search(r"\(\d+\) Sort\b", plan), "global sort crept in"


def test_bucketed_seen_state_probe_never_shuffles_blobs(spark, tmp_path):
    """The 10^10-scale seen-state layout (PLANS.md): filter blobs persisted
    BUCKETED by part_id feed the probe cogroup with NO Exchange on the blob
    side — only the round's candidates (new data) shuffle. At production
    blob sizes this is the difference between moving GBs of filter state
    every round and moving none (Iceberg bucket transform / parquet
    bucketBy are the same layout)."""
    from pyspark.sql import functions as F

    from louis_crawler_legacy_spark.operators import bloom

    pb = bloom.PartitionedBloom(*bloom.bloom_params(10_000, 0.01))
    seen = spark.createDataFrame(
        [(f"http://h{i % 5}.ca/p{i}",) for i in range(300)], ["url"]
    )
    seen_h = bloom.with_bloom_hashes(seen, "url", 16)
    blobs = pb.merge_blobs(
        spark.createDataFrame([], bloom.BLOOM_SCHEMA),
        seen_h.select("part_id", "h1", "h2"),
    )
    name = "seen_bloom_bucketed_test"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        blobs.write.option("path", str(tmp_path / "blobs"))
        .bucketBy(16, "part_id").sortBy("part_id")
        .mode("overwrite").saveAsTable(name)
    )
    try:
        bucketed = spark.table(name)
        cand = bloom.with_bloom_hashes(
            spark.createDataFrame(
                [(f"http://h{i % 5}.ca/p{i}",) for i in range(200, 500)], ["url"]
            ),
            "url",
            16,
        )
        probed = pb.probe(cand, bucketed)
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan  # blob scan reports its bucketing
        # exactly ONE exchange: the candidates; the blob side reads in place
        assert plan.count("Exchange") == 1
        assert "Exchange" not in plan.split("FileScan")[1]
        # and the probe is still correct over the bucketed state
        n_seen = probed.filter(F.col("maybe_seen")).count()
        assert n_seen >= 100  # the 100 overlapping urls (plus bloom fp)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_state_partition_count_constant_across_rounds(spark, tmp_path):
    """The r03-measured scale defect: seen/frontier merges are unions, and
    a union's partition count is the SUM of its children — without the
    coalesce cap the materialized state gained ~2×corpus_parts/round
    forever (an O(rounds) per-round task-scheduling cost on a long crawl).
    Partitions must be CONSTANT from round 2 onward, bounded by
    _state_parts."""
    from louis_crawler_legacy_spark.plans.crawl import CrawlConfig, CrawlEngine
    from louis_crawler_legacy_spark.sources import corpus as corpus_mod

    corpus = corpus_mod.generate_corpus(
        seed=7, n_hosts=4, pages_per_host=30, hub_factor=3, links_per_page=6
    )
    cfg = CrawlConfig(
        max_depth=6, batch_size=16, num_partitions=4, checkpoint_every=0,
        detailed_metrics=False, collect_batch_urls=False,
    )
    eng = CrawlEngine(
        spark, corpus_mod.corpus_df(spark, corpus), str(tmp_path / "wh"), cfg
    )
    eng.bootstrap(corpus_mod.seed_urls(corpus, n=2))
    seen_parts, frontier_parts = [], []
    r = 1
    while r <= 8:
        if eng.run_round(r) is None:
            break
        seen_parts.append(eng._seen().rdd.getNumPartitions())
        frontier_parts.append(eng._frontier_df.rdd.getNumPartitions())
        r += 1
    eng.checkpoint(r - 1, wait=True)
    assert len(seen_parts) >= 5, "corpus too small to exercise the loop"
    assert len(set(seen_parts[1:])) == 1, f"seen partitions grew: {seen_parts}"
    assert len(set(frontier_parts[1:])) == 1, (
        f"frontier partitions grew: {frontier_parts}"
    )
    assert seen_parts[-1] <= eng._state_parts
    assert frontier_parts[-1] <= eng._state_parts


def test_retired_state_release_is_per_entry_not_all_or_nothing():
    """Retired state bases must free as soon as THEIR OWN blockers (the
    background consumers in flight at retirement) complete — an
    all-or-nothing "no outputs in flight" gate starves forever on a busy
    crawl where some append is always running, leaking one O(seen)
    localCheckpointed base per round. Pure-mechanics test: no Spark."""
    import threading

    from louis_crawler_legacy_spark.plans.crawl import CrawlEngine

    class FakeDf:
        def __init__(self):
            self.released = False

        def unpersist(self):
            self.released = True

    class FakeFut:
        def __init__(self, is_done=False):
            self._done = is_done

        def done(self):
            return self._done

    eng = CrawlEngine.__new__(CrawlEngine)
    eng._state_lock = threading.Lock()
    eng._retired_state = []
    eng._ckpt_future = None

    slow = FakeFut(False)
    # base A retired while `slow` is in flight; base B retired later, when
    # only already-done consumers remain
    a, b = FakeDf(), FakeDf()
    eng._out_tasks = [(slow, [])]
    eng._retire(a)
    eng._out_tasks = [(FakeFut(True), [])]
    eng._retire(b)

    eng._release_retired()
    assert b.released, "entry with all-done blockers must free immediately"
    assert not a.released, "entry with a live blocker must wait"
    assert [df for df, _ in eng._retired_state] == [a]

    slow._done = True
    eng._release_retired()
    assert a.released
    assert eng._retired_state == []

    # a pending checkpoint writer blocks only bases retired while it runs
    ckpt = FakeFut(False)
    eng._ckpt_future = ckpt
    eng._out_tasks = []
    c = FakeDf()
    eng._retire(c)
    eng._release_retired()
    assert not c.released
    ckpt._done = True
    eng._release_retired()
    assert c.released


def test_merge_chain_installs_newest_completed_and_bounds_lag():
    """The non-blocking state views' merge-chain protocol (pure
    mechanics, no Spark): _advance must install the NEWEST completed
    chain entry as the view base even while later entries are still
    running (the original single-slot design only checked the latest
    superseded future, so one lagging merge froze the base — and the
    per-round view deltas, recomputed on the critical path — for the
    rest of the crawl); superseded intermediates and the replaced base
    are retired driver-side exactly once; _poll_state(max_lag=K) blocks
    on the oldest entries until at most K remain pending."""
    import threading

    from louis_crawler_legacy_spark.plans.crawl import CrawlEngine

    class FakeDf:
        def __init__(self, name):
            self.name = name
            self.released = False

        def unpersist(self):
            self.released = True

    class FakeFut:
        def __init__(self, df, is_done=False):
            self._df = df
            self._done = is_done
            self.waited = False

        def done(self):
            return self._done

        def result(self):
            self.waited = True
            self._done = True  # blocking wait completes the merge
            return self._df

    eng = CrawlEngine.__new__(CrawlEngine)
    eng._state_lock = threading.Lock()
    eng._retired_state = []
    eng._ckpt_future = None
    eng._out_tasks = []
    eng._state_deltas = []
    eng._blooms_chain = []
    eng._blooms_through = 0
    eng._blooms_df = None

    base0 = FakeDf("base0")
    r1, r2, r3 = FakeDf("r1"), FakeDf("r2"), FakeDf("r3")
    eng._seen_df = base0
    eng._seen_through = 0
    f1, f2, f3 = FakeFut(r1, True), FakeFut(r2, True), FakeFut(r3, False)
    eng._seen_chain = [(f1, 1), (f2, 2), (f3, 3)]

    # non-blocking poll: f2 is the newest DONE entry — install it, retire
    # base0 (replaced) and r1 (superseded intermediate), keep f3 pending
    eng._poll_state()
    assert eng._seen_df is r2 and eng._seen_through == 2
    assert eng._seen_chain == [(f3, 3)]
    assert not f3.waited, "poll must not block on a pending merge"
    retired = {df.name for df, _ in eng._retired_state}
    assert retired == {"base0", "r1"}
    assert not r2.released and not r3.released

    # lag backpressure: chain deeper than max_lag → block on the oldest
    # entries until ≤ max_lag remain
    f4, f5 = FakeFut(FakeDf("r4"), False), FakeFut(FakeDf("r5"), False)
    eng._seen_chain = [(f3, 3), (f4, 4), (f5, 5)]
    eng._poll_state(max_lag=2)
    assert f3.waited, "beyond max_lag the oldest entry must be waited on"
    assert len(eng._seen_chain) <= 2
    assert eng._seen_df is r3 and eng._seen_through == 3

    # delta pruning follows min(seen, blooms) coverage
    eng._state_deltas = [(1, "d1"), (3, "d3"), (4, "d4")]
    eng._blooms_through = 3
    eng._poll_state()
    assert [r for r, _ in eng._state_deltas] == [4]

    # blocking accessor drains the whole chain
    got = eng._seen()
    assert got.name == "r5" and eng._seen_through == 5
    assert eng._seen_chain == []

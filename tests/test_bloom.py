"""Bloom seen-set tests: no false negatives (property), bounded false
positives, Spark cogroup probe/merge round-trip."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from louis_crawler_legacy_spark.operators import bloom


@given(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=200),
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=50),
)
@settings(max_examples=50, deadline=None)
def test_no_false_negatives(items, probes):
    m, k = bloom.bloom_params(max(len(items), 1), 0.01)
    h1 = np.array(items, dtype=np.int64)
    h2 = h1 * np.int64(31) + np.int64(7)  # any deterministic second hash
    bits = bloom.build_bits(h1, h2, m, k)
    got = bloom.probe_bits(bits, h1, h2, m, k)
    assert got.all(), "inserted item reported absent"


def test_false_positive_rate_bounded():
    rng = np.random.default_rng(42)
    n = 20_000
    m, k = bloom.bloom_params(n, 0.01)
    ins1 = rng.integers(-(2**62), 2**62, n, dtype=np.int64)
    ins2 = rng.integers(-(2**62), 2**62, n, dtype=np.int64)
    bits = bloom.build_bits(ins1, ins2, m, k)
    probe1 = rng.integers(-(2**62), 2**62, n, dtype=np.int64)
    probe2 = rng.integers(-(2**62), 2**62, n, dtype=np.int64)
    fp = bloom.probe_bits(bits, probe1, probe2, m, k).mean()
    assert fp < 0.03, f"false positive rate {fp:.4f} too high"


def test_incremental_merge_preserves_members():
    m, k = bloom.bloom_params(1000, 0.01)
    a1 = np.arange(100, dtype=np.int64)
    a2 = a1 * 13 + 1
    b1 = np.arange(100, 200, dtype=np.int64)
    b2 = b1 * 13 + 1
    bits = bloom.build_bits(a1, a2, m, k)
    bits = bloom.build_bits(b1, b2, m, k, base=bits)
    assert bloom.probe_bits(bits, a1, a2, m, k).all()
    assert bloom.probe_bits(bits, b1, b2, m, k).all()


def test_spark_probe_and_merge(spark):
    num_parts = 4
    pb = bloom.PartitionedBloom(*bloom.bloom_params(10_000, 0.01))

    seen = spark.createDataFrame(
        [(f"http://h{i % 7}.ca/p{i}", f"h{i % 7}.ca") for i in range(500)],
        ["url", "host"],
    )
    seen_h = bloom.with_bloom_hashes(seen, "url", num_parts)
    empty_blooms = spark.createDataFrame([], bloom.BLOOM_SCHEMA)
    blooms = pb.merge_blobs(empty_blooms, seen_h.select("part_id", "h1", "h2"))
    blooms.cache()
    assert blooms.count() <= num_parts

    # probe: 300 seen urls + 300 fresh urls
    cand = spark.createDataFrame(
        [(f"http://h{i % 7}.ca/p{i}", f"h{i % 7}.ca") for i in range(200, 800)],
        ["url", "host"],
    )
    cand_h = bloom.with_bloom_hashes(cand, "url", num_parts)
    probed = pb.probe(cand_h, blooms).cache()

    seen_urls = {r.url for r in seen.collect()}
    rows = probed.collect()
    assert len(rows) == 600
    for r in rows:
        if r.url in seen_urls:
            assert r.maybe_seen, f"false negative for {r.url}"
    fp = sum(1 for r in rows if r.url not in seen_urls and r.maybe_seen)
    assert fp < 60  # generous: fpp target is 1%

    # merging the fresh urls makes them all hits
    fresh = cand_h.join(seen.select("url"), "url", "left_anti")
    blooms2 = pb.merge_blobs(blooms, fresh.select("part_id", "h1", "h2"))
    probed2 = pb.probe(cand_h, blooms2)
    assert probed2.filter(~F.col("maybe_seen")).count() == 0


def test_hot_host_skew_balanced_and_correct(spark):
    """One host holding 90% of the URLs must NOT collapse the Bloom layer
    into one partition: part_id hashes the URL, so blob occupancy and probe
    tasks stay balanced while dedup results are unchanged (VERDICT r01
    scale-killer #2)."""
    num_parts = 8
    pb = bloom.PartitionedBloom(*bloom.bloom_params(10_000, 0.01))
    urls = [f"http://hot.ca/p{i}" for i in range(900)] + [
        f"http://cold{i}.ca/p" for i in range(100)
    ]
    seen = spark.createDataFrame([(u,) for u in urls], ["url"])
    seen_h = bloom.with_bloom_hashes(seen, "url", num_parts)

    # balance: the hot host's URLs spread over every partition, and no
    # partition holds more than ~2x its fair share
    dist = {
        r.part_id: r.cnt
        for r in seen_h.filter(F.col("url").startswith("http://hot"))
        .groupBy("part_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert len(dist) == num_parts
    assert max(dist.values()) < 2 * (900 / num_parts)

    # correctness: no false negatives through merge+probe regardless of skew
    blooms = pb.merge_blobs(
        spark.createDataFrame([], bloom.BLOOM_SCHEMA),
        seen_h.select("part_id", "h1", "h2"),
    )
    probed = pb.probe(seen_h, blooms)
    assert probed.filter(~F.col("maybe_seen")).count() == 0

"""Connected-components / dedup-cluster operator (operators/cluster.py).

Pinned against an independent pure-Python union-find (path-compressed
disjoint sets share NO code or algorithm shape with the iterative
min-propagation under test), on hand graphs, randomized hypothesis
graphs batched through one Spark job per case-set, and structure cases
chosen to stress the iteration count (long paths — pointer jumping must
converge in O(log d), not O(d))."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from louis_crawler_legacy_spark.operators.cluster import (
    connected_components,
    dedup_clusters,
)


# -- independent twin: union-find ---------------------------------------------


def uf_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n_nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical representative = min node id in the component
    best: dict[int, int] = {}
    for x in range(n_nodes):
        r = find(x)
        best[r] = min(best.get(r, x), x)
    return {x: best[find(x)] for x in range(n_nodes)}


def _run_cc(spark, n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], ["id"])
    if edges:
        e = spark.createDataFrame(edges, ["src", "dst"])
    else:
        e = spark.createDataFrame([], "src INT, dst INT")
    out = connected_components(e, nodes=nodes)
    return {r.id: r.component for r in out.collect()}


def test_hand_graphs(spark):
    # two triangles bridged by one edge + a path + singletons
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3),
             (7, 8), (8, 9)]
    got = _run_cc(spark, 12, edges)
    assert got == uf_components(12, edges)
    assert got[5] == 0 and got[9] == 7 and got[10] == 10 and got[11] == 11


def test_self_loops_duplicates_and_empty(spark):
    edges = [(1, 1), (2, 3), (3, 2), (2, 3)]
    assert _run_cc(spark, 5, edges) == uf_components(5, edges)
    assert _run_cc(spark, 3, []) == {0: 0, 1: 1, 2: 2}
    # nodes=None: a node appearing ONLY in self-loops is still a singleton
    e = spark.createDataFrame([(7, 7), (1, 2)], ["src", "dst"])
    got = {r.id: r.component for r in connected_components(e).collect()}
    assert got == {1: 1, 2: 1, 7: 7}


def test_long_path_converges_logarithmically(spark):
    """A 64-node path is the worst case for plain min-propagation
    (diameter 63). Pointer jumping must land well under the default
    max_iter=30 cap — and a tightened cap of 10 (≥ log2(63)+slack) must
    still converge, which fails loudly if the jump step regresses to
    plain propagation."""
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    nodes_df = None  # nodes default from edges
    import pyspark.sql.functions as F  # noqa: F401

    e = spark.createDataFrame(edges, ["src", "dst"])
    out = connected_components(e, max_iter=10)
    got = {r.id: r.component for r in out.collect()}
    assert got == {i: 0 for i in range(n)}


def test_star_hub(spark):
    """Hub node with every other node attached (the skew shape)."""
    n = 40
    edges = [(n - 1, i) for i in range(n - 1)]
    assert _run_cc(spark, n, edges) == {i: 0 for i in range(n)}


def test_randomized_graphs_match_union_find(spark):
    """48 seeded random graphs across densities, one Spark job each
    batch — sparse (forests), near-critical, and dense regimes."""
    rnd = random.Random(20260818)
    for trial in range(48):
        n = rnd.randrange(2, 40)
        m = rnd.randrange(0, int(n * rnd.choice((0.5, 1.0, 2.5))) + 1)
        edges = [
            (rnd.randrange(n), rnd.randrange(n)) for _ in range(m)
        ]
        assert _run_cc(spark, n, edges) == uf_components(n, edges), (
            f"trial={trial} n={n} edges={edges}"
        )


# driver-free hypothesis sweep over the TWIN only would be vacuous; the
# spark fixture is session-scoped, so a bounded hypothesis sweep through
# Spark stays affordable (each case is 2-6 tiny jobs).
@given(
    n=st.integers(min_value=1, max_value=12),
    edges=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)), max_size=14
    ),
)
@settings(max_examples=15, deadline=None)
def test_hypothesis_graphs(spark, n, edges):
    edges = [(u % n, v % n) for u, v in edges]
    assert _run_cc(spark, n, edges) == uf_components(n, edges)


def test_dedup_clusters_total_map(spark):
    """dedup_clusters covers every document; untouched docs are
    singletons; canonical keep-list = min per cluster."""
    docs = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    pairs = spark.createDataFrame([(4, 1), (1, 3)], ["id_a", "id_b"])
    out = dedup_clusters(docs, pairs)
    got = {r.doc_id: r.cluster_id for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 1, 5: 5}
    import pyspark.sql.functions as F

    keep = sorted(
        r.keeper
        for r in out.groupBy("cluster_id")
        .agg(F.min("doc_id").alias("keeper"))
        .collect()
    )
    assert keep == [0, 1, 2, 5]

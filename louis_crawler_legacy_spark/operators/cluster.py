"""Connected components over a pair graph — duplicate-CLUSTER resolution.

The dedup operators (dedup.py: ngram_jaccard_pairs, minhash_lsh_pairs,
simhash_pairs, embedding near-dup) emit PAIRS. A training-data pipeline
needs the transitive closure of those pairs — duplicate clusters — to
keep exactly one canonical document per cluster (near-dup is not
transitive: A~B and B~C does not imply the pipeline may keep both A and
C). This module closes that gap with an iterative DataFrame-only
connected-components operator.

Reference analog: none (the reference dedups per-URL only); this is part
of the engine's training-data suite (SURVEY.md §6 / assignment brief).

Algorithm: hash-min label propagation WITH pointer jumping (path
compression), the DataFrame form of the classic MapReduce CC algorithms
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14
— hash-to-min family). Every node starts labeled with itself; each
iteration
  1. takes the min label over the node's neighborhood (one groupBy), and
  2. jumps pointers: label(u) := label(label(u)) (one self-join),
so labels converge to the component MINIMUM in O(log diameter)
iterations instead of O(diameter) for plain propagation.

Scale design (the 100 TB story):
  - Only (node, label) longs ever shuffle — never documents. The operator
    runs AFTER pair generation, whose own shuffle shape is band/bucket
    keyed (dedup.py); cluster resolution adds O(V+E) small rows.
  - The min-aggregate is map-side combinable, so hot hub nodes (a viral
    boilerplate string with 10^6 near-dups) partially aggregate before
    the exchange; the pointer-jump join's skew (everyone pointing at one
    root) is an AQE skew-join case, and its build side shrinks every
    iteration as labels converge.
  - Lineage is cut per iteration with localCheckpoint (same pattern as
    the crawl loop's state — an uncut 20-iteration loop doubles the plan
    each round).
  - Convergence is detected with ONE aggregate, no extra join: labels
    only ever decrease, so sum(label) is strictly monotone until the
    fixpoint — equal sums on consecutive iterations ⟺ no label moved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    component_col: str = "component",
    max_iter: int = 30,
) -> DataFrame:
    """Resolve connected components of the undirected graph ``edges``.

    Parameters
    ----------
    edges : DataFrame with columns ``src``/``dst`` (any orderable type
        with a total order under ``least`` — use longs in production).
        Treated as undirected; duplicates and self-loops are fine.
    nodes : optional DataFrame with column ``id_col`` enumerating the
        node universe. Nodes absent from ``edges`` come back as
        singletons (component = themselves). Defaults to the nodes that
        appear in ``edges``.
    max_iter : safety cap; with pointer jumping the loop needs
        O(log diameter) iterations (30 covers diameters beyond 2^30).
        Raises RuntimeError if the cap is hit without convergence.

    Returns
    -------
    DataFrame (id_col, component_col) — one row per node, component is
    the MINIMUM node id in the node's component (deterministic canonical
    representative, the convention d1/d2's keeper_id already uses).
    """
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).where(F.col("u") != F.col("v"))
    # undirected: propagate both ways. MATERIALIZE the edge list once
    # (r06): `e` is referenced twice by the union and `bidir` is joined on
    # EVERY iteration — without the checkpoint the caller's whole pair-
    # generation subtree (for d6/c3 that is the blocked n-gram-Jaccard
    # self-join) re-executed 2x per iteration x O(log diameter) iterations.
    # Identical results; at scale the edge list is O(E) longs, the same
    # rows the loop shuffles anyway.
    bidir = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()

    if nodes is not None:
        node_ids = nodes.select(F.col(id_col).alias("id")).distinct()
    else:
        # derive from the RAW edges (pre self-loop filter) so a node that
        # appears only in self-loops still gets a singleton component
        node_ids = (
            edges.select(F.col(src).alias("id"))
            .unionByName(edges.select(F.col(dst).alias("id")))
            .distinct()
        )
    labels = node_ids.select("id", F.col("id").alias("label")).localCheckpoint()

    prev_sum = None
    for _ in range(max_iter):
        # 1. neighborhood min: candidate label for u is every neighbor's
        #    current label; min() is map-side combinable (hub-safe).
        lmap = labels.select(
            F.col("id").alias("nid"), F.col("label").alias("nlabel")
        )
        nb = bidir.join(lmap, bidir["v"] == F.col("nid")).select(
            F.col("u").alias("id"), F.col("nlabel").alias("label")
        )
        new = (
            labels.unionByName(nb)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        # 2. pointer jump (path compression): shortcut through the
        #    PREVIOUS materialized map — label(u) := prev[new_label(u)].
        #    Joining the checkpointed prev (fresh attributes) instead of
        #    `new` with itself keeps the plan free of self-join attribute
        #    collisions; prev(x) <= x for every node id x, so the jump is
        #    still monotone and within-component, and the one-step-stale
        #    shortcut preserves the O(log diameter) bound (standard
        #    delayed pointer jumping).
        pmap = labels.select(
            F.col("id").alias("pid"), F.col("label").alias("plabel")
        )
        new = new.join(pmap, new["label"] == F.col("pid")).select(
            "id", F.col("plabel").alias("label")
        )
        labels = new.localCheckpoint()
        # monotone-sum convergence: one agg, no compare-join. Decimal(38)
        # so hash-valued ids cannot overflow the sum.
        cur = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        if prev_sum is not None and cur == prev_sum:
            break
        prev_sum = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations"
        )

    return labels.select(
        F.col("id").alias(id_col), F.col("label").alias(component_col)
    )


def dedup_clusters(
    documents: DataFrame,
    pair_edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Cluster ids for EVERY document given near/exact-dup pairs.

    Docs untouched by any pair are singleton clusters (cluster_id =
    their own id), so the output is a total map doc_id → cluster_id and
    `groupBy(cluster_id).agg(min(doc_id))` is the canonical keep-list.
    """
    comp = connected_components(
        pair_edges,
        nodes=documents.select(id_col),
        src=src,
        dst=dst,
        id_col=id_col,
        component_col="cluster_id",
    )
    return comp.select(id_col, "cluster_id")

"""Similarity search over an embedding column (array<float>).

- cosine / dot product: native zip_with + aggregate (JVM, no Python)
- brute-force top-k: broadcast the (small) query set against the corpus,
  rank per query — the exactness baseline; corpus never shuffles
- LSH-bucketed ANN: deterministic random-hyperplane signatures → candidates
  share a bucket → exact re-rank within buckets. The scale path: the corpus
  is bucketed once (write-time at 100 TB) and each query touches only its
  bucket's rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.greatest(norm(a) * norm(b), F.lit(1e-12))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (desc), tie-break by
    neighbor id. Queries are broadcast — the corpus scan is one pass, the
    only shuffle is the per-query k-row window."""
    joined = corpus.crossJoin(F.broadcast(queries)).filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 4).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cos_sim")
    )


# ---------------------------------------------------------------------------
# random-hyperplane LSH
# ---------------------------------------------------------------------------

def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from index mixing
    (no RNG state; same plane on every executor and run)."""
    def mix(x: int) -> int:
        x = (x ^ (x >> 33)) * 0xFF51AFD7ED558CCD % (1 << 64)
        x = (x ^ (x >> 33)) * 0xC4CEB9FE1A85EC53 % (1 << 64)
        return x ^ (x >> 33)

    out = []
    for j in range(dim):
        h = mix(plane_idx * 1_000_003 + j + 1)
        out.append((h / float(1 << 64)) * 2.0 - 1.0)
    return out


def lsh_bucket(vec: Column, dim: int, n_planes: int = 12, table: int = 0) -> Column:
    """Sign-pattern bucket id ∈ [0, 2^n_planes): bit i = sign(vec · planeᵢ).
    ``table`` selects an independent plane set (multi-table LSH)."""
    acc = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.lit(_hyperplane(dim, table * 1_000 + i))
        d = F.aggregate(
            F.zip_with(vec, plane, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        acc = acc + F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(0)
    return acc


def lsh_buckets_multi(vec: Column, dim: int, n_planes: int, n_tables: int) -> Column:
    """array of (table, bucket) keys — explode to probe all tables; recall
    grows ≈ 1-(1-p)^T for per-table hit rate p."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                lsh_bucket(vec, dim, n_planes, t).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """ANN: candidates share an LSH bucket in ANY of n_tables independent
    tables; exact cosine re-rank within candidates. Recall ≈ 1-(1-p)^T.
    At 100 TB the corpus side is bucketed at write time (partition columns
    (table, bucket)), so a query reads n_tables buckets, not the table."""
    c_b = corpus.withColumn(
        "bkts",
        F.transform(
            lsh_buckets_multi(F.col(vec_col), dim, n_planes, n_tables),
            lambda tb: tb["bucket"],
        ),
    )
    c = c_b.select(
        id_col, vec_col, "bkts",
        F.posexplode(F.col("bkts")).alias("table", "bucket"),
    )
    q_b = queries.withColumn(
        "qbkts",
        F.transform(
            lsh_buckets_multi(F.col(query_vec_col), dim, n_planes, n_tables),
            lambda tb: tb["bucket"],
        ),
    )
    q = q_b.select(
        query_id_col, query_vec_col, "qbkts",
        F.posexplode(F.col("qbkts")).alias("table", "bucket"),
    )
    # min-table ownership instead of dropDuplicates: a (vec, query) pair
    # colliding in several tables is emitted only from its lowest matching
    # table — duplicate candidates never materialize or shuffle
    no_earlier = F.when(F.col("table") == 0, F.lit(True)).otherwise(
        ~F.exists(
            F.sequence(F.lit(1), F.col("table")),
            lambda j: F.element_at(F.col("bkts"), j)
            == F.element_at(F.col("qbkts"), j),
        )
    )
    joined = (
        c.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col(id_col) != F.col(query_id_col))
        .filter(no_earlier)
    )
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 4).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cos_sim")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join."""
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    left = c.select("bucket", F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
    right = c.select("bucket", F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
    # single-table LSH: each vector has exactly ONE bucket, so a pair can
    # match at most once — no dedup needed at all (the r01 dropDuplicates
    # here was a pure no-op shuffle)
    pairs = left.join(right, "bucket").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn(
            "cos_sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 4)
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the other scale path from the build brief
# ---------------------------------------------------------------------------

def _lit_vec(values) -> Column:
    return F.lit([float(x) for x in values])


def _centroid_scores(vec: Column, centroids: list, round_scale: int) -> Column:
    """array<struct<s,nj>> of rounded cosine scores per centroid; nj = -j so
    array ordering (max / sort) breaks score ties toward the LOWEST index —
    the same total order the SQL oracle's ORDER BY s DESC, j ASC uses.
    Rounding before the argmax keeps the cell assignment reproducible
    across engines (raw float argmax is representation-sensitive)."""
    return F.array(
        *[
            F.struct(
                F.round(cosine(vec, _lit_vec(c)), round_scale).alias("s"),
                F.lit(-j).alias("nj"),
            )
            for j, c in enumerate(centroids)
        ]
    )


def ivf_cell(vec: Column, centroids: list, round_scale: int = 6) -> Column:
    """Nearest-centroid cell id (argmax cosine, ties → lowest index)."""
    best = F.array_max(_centroid_scores(vec, centroids, round_scale))
    return (-best["nj"]).cast("int")


def ivf_probe_cells(vec: Column, centroids: list, nprobe: int,
                    round_scale: int = 6) -> Column:
    """The nprobe nearest cells for a query, best first."""
    ordered = F.reverse(F.array_sort(_centroid_scores(vec, centroids, round_scale)))
    return F.transform(
        F.slice(ordered, 1, nprobe), lambda st: (-st["nj"]).cast("int")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int = 8,
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF-flat ANN: assign every corpus vector to its nearest-centroid
    cell, probe each query's nprobe nearest cells, exact cosine re-rank
    within the probed cells.

    Centroids here are the first n_centroids corpus vectors by id —
    deterministic and SQL-reproducible, so the driver oracle checks the
    whole pipeline exactly; a real deployment swaps in k-means|| output and
    the plan is unchanged. Scale shape: the cell id is a write-time
    partition column at 100 TB, so a query reads nprobe partitions instead
    of the table; candidates join on the cell key only; a (query, neighbor)
    pair can't repeat (one cell per corpus vector), so no dedup shuffle."""
    cents = [
        v for _, v in sorted(
            (r[0], list(r[1]))
            for r in corpus.filter(F.col(id_col) < n_centroids)
            .select(id_col, vec_col).collect()
        )
    ]
    cells = corpus.withColumn("cell", ivf_cell(F.col(vec_col), cents))
    qcells = queries.select(
        query_id_col,
        query_vec_col,
        F.explode(
            ivf_probe_cells(F.col(query_vec_col), cents, nprobe)
        ).alias("cell"),
    )
    joined = cells.join(F.broadcast(qcells), "cell").filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 4).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cos_sim")
    )


# ---------------------------------------------------------------------------
# Write-time bucketed ANN index — the 100 TB layout, materialized
# ---------------------------------------------------------------------------

def write_lsh_index(
    corpus: DataFrame,
    path: str,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the corpus ONCE, partitioned by (table, bucket) — the
    write-time half of LSH ANN at scale. Storage is n_tables× the corpus
    (each vector lands in one bucket per table); queries then read only
    their matching (table, bucket) partitions instead of scanning the
    corpus (see lsh_topk_indexed)."""
    exploded = corpus.select(
        id_col,
        vec_col,
        F.explode(lsh_buckets_multi(F.col(vec_col), dim, n_planes, n_tables)).alias(
            "tb"
        ),
    ).select(id_col, vec_col, F.col("tb.table").alias("table"),
             F.col("tb.bucket").alias("bucket"))
    exploded.write.mode("overwrite").partitionBy("table", "bucket").parquet(path)


def lsh_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """ANN over the write-time bucketed index: the broadcast query-bucket
    join triggers DYNAMIC PARTITION PRUNING on (table, bucket), so the scan
    touches only the queries' buckets — at 100 TB that is n_tables×|Q|
    partitions, not the table (tests assert the pruning subquery is in the
    plan). Same candidates + ranking as the in-memory lsh_topk."""
    idx = spark.read.parquet(index_path)
    q_b = queries.withColumn(
        "qbkts",
        F.transform(
            lsh_buckets_multi(F.col(query_vec_col), dim, n_planes, n_tables),
            lambda tb: tb["bucket"],
        ),
    )
    q = q_b.select(
        query_id_col, query_vec_col, "qbkts",
        F.posexplode(F.col("qbkts")).alias("table", "bucket"),
    )
    # min-table ownership needs the CORPUS row's per-table buckets; rather
    # than store them redundantly in every partition, dedup the (neighbor,
    # query) pairs after the pruned join — the candidate set here is
    # already bucket-sized, so the dedup is tiny
    joined = (
        idx.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col(id_col) != F.col(query_id_col))
        .dropDuplicates([id_col, query_id_col])
    )
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 4).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cos_sim")
    )

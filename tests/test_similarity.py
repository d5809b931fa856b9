"""Similarity search: exact cosine top-k vs numpy ground truth; LSH recall;
media decode plumbing; text-analysis column functions vs Python."""

from __future__ import annotations

import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from louis_crawler_legacy_spark.operators import media, similarity, textstats

DIM = 16
N = 200


def make_vectors():
    rng = np.random.default_rng(11)
    # clustered vectors so top-k is meaningful
    centers = rng.normal(size=(8, DIM))
    out = []
    for i in range(N):
        c = centers[i % 8]
        v = c + rng.normal(scale=0.3, size=DIM)
        out.append((i, [float(x) for x in v]))
    return out


VECS = make_vectors()

VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(VECS, VEC_SCHEMA).cache()


def numpy_topk(query_ids, k):
    arr = np.array([v for _, v in VECS], dtype=np.float32).astype(np.float64)
    norms = np.linalg.norm(arr, axis=1)
    out = {}
    for q in query_ids:
        cos = arr @ arr[q] / (norms * norms[q])
        order = sorted(
            (i for i in range(N) if i != q), key=lambda i: (-round(cos[i], 4), i)
        )
        out[q] = order[:k]
    return out


def test_brute_force_topk_matches_numpy(spark, vec_df):
    qids = [0, 7, 55]
    queries = spark.createDataFrame(
        [(i, VECS[i][1]) for i in qids],
        T.StructType(
            [
                T.StructField("query_id", T.LongType()),
                T.StructField("query_vec", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    got_rows = similarity.brute_force_topk(vec_df, queries, k=5).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    want = numpy_topk(qids, 5)
    for q in qids:
        got_ids = [nid for _, nid in sorted(got[q])]
        assert got_ids == want[q], f"query {q}: {got_ids} vs {want[q]}"


def test_lsh_topk_recall(spark, vec_df):
    qids = list(range(10))
    queries = spark.createDataFrame(
        [(i, VECS[i][1]) for i in qids],
        T.StructType(
            [
                T.StructField("query_id", T.LongType()),
                T.StructField("query_vec", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    got_rows = similarity.lsh_topk(vec_df, queries, dim=DIM, k=5, n_planes=6).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    want = numpy_topk(qids, 5)
    hits = total = 0
    for q in qids:
        total += 5
        hits += len(set(want[q]) & got.get(q, set()))
    recall = hits / total
    assert recall >= 0.5, f"LSH recall {recall:.2f} too low"


def test_embedding_near_dup_pairs(spark, vec_df):
    # plant a near-identical pair
    planted = [(9000, VECS[3][1]), (9001, [x * 1.001 for x in VECS[3][1]])]
    df = vec_df.union(spark.createDataFrame(planted, VEC_SCHEMA))
    pairs = similarity.embedding_near_dup_pairs(df, dim=DIM, threshold=0.999)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (3, 9000) in got or (9000, 9001) in got


def test_media_decode_plumbing(spark):
    rows = [(i, bytes(f"payload-{i}" * (i + 1), "utf-8")) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "payload"])
    out = {r.doc_id: r for r in media.decode_media(df).collect()}
    assert len(out) == 20
    for i, payload in rows:
        want = media.fake_decode(payload)
        got = out[i]
        assert got.n_bytes == want["n_bytes"]
        assert got.media_kind == want["media_kind"]
        assert (got.width, got.height) == (want["width"], want["height"])
        assert got.checksum == want["checksum"]


def test_media_real_decode_is_stubbed(spark):
    df = spark.createDataFrame([(1, b"xx")], ["doc_id", "payload"])
    with pytest.raises(Exception) as exc_info:
        media.decode_media(df, real_decode=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_media_resize_plumbing(spark):
    """Aspect preserved, never upscaled, thumbnail is a payload prefix of
    the declared length — vs the pure-Python twin."""
    rows = [(i, bytes(f"p-{i}" * (7 * i + 1), "utf-8")) for i in range(15)]
    df = spark.createDataFrame(rows, ["doc_id", "payload"])
    out = {r.doc_id: r for r in media.resize_media(df, 128, 128).collect()}
    for i, payload in rows:
        ow, oh, thumb = media.fake_resize(payload, 128, 128)
        got = out[i]
        assert (got.out_w, got.out_h) == (ow, oh)
        assert got.out_w <= max(got.width, 1) and got.out_w <= 128
        assert got.out_h <= max(got.height, 1) and got.out_h <= 128
        assert bytes(got.thumbnail) == thumb
        assert got.out_n_bytes == len(thumb)
        assert payload.startswith(bytes(got.thumbnail))
    with pytest.raises(Exception):
        media.resize_media(df, 128, 128, real_resize=True).collect()


def test_media_features_feed_ann(spark):
    """extract_features output composes directly with the similarity
    operators: media blobs → 8-dim vectors → brute-force cosine top-k,
    where each doc's own vector ranks first (self-similarity 1.0)."""
    rows = [(i, bytes(f"blob{i}" * (i + 2), "utf-8")) for i in range(12)]
    df = spark.createDataFrame(rows, ["doc_id", "payload"])
    feats = media.extract_features(df)
    got = {r.doc_id: list(r.feature) for r in feats.collect()}
    for i, payload in rows:
        assert got[i] == media.fake_features(payload)
        assert abs(sum(got[i]) - 1.0) < 1e-12  # histogram normalized
    queries = feats.where(F.col("doc_id") < 2).selectExpr(
        "doc_id + 100 AS query_id", "feature AS query_vec"
    )
    top = similarity.brute_force_topk(
        feats.selectExpr("doc_id AS vec_id", "feature AS embedding"),
        queries, k=1,
    )
    best = {r.query_id: r.cos_sim for r in top.collect()}
    # each query vector exists in the corpus → its top-1 cosine is 1.0
    assert best == {100: 1.0, 101: 1.0}
    with pytest.raises(Exception):
        media.extract_features(df, real_extract=True).collect()


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, bytes(320))], ["doc_id", "payload"])
    frames = media.frame_sample_plan(df, every_n=3).collect()
    # n_bytes=320 → 10 fake frames → sampled 0,3,6,9
    assert [r.frame_idx for r in frames] == [0, 3, 6, 9]


# --- text stats vs pure Python ------------------------------------------------

TEXTS = [
    "the quick brown fox jumps over the lazy dog.",
    "le chat est sur la table et le chien est las",
    "der hund und die katze das ist ein test",
    "data scan spark fast query row!!! xx",
    "   spaced    out   words   ",
]


def test_textstats_match_python(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"])
    got = df.select(
        "doc_id",
        textstats.token_count_ws(F.col("text")).alias("ws"),
        textstats.token_count_bpe(F.col("text")).alias("bpe"),
        textstats.lang_id(F.col("text")).alias("lang"),
        textstats.fingerprint(F.col("text")).alias("fp"),
        textstats.quality_score(F.col("text")).alias("q"),
    ).collect()
    for r in got:
        t = TEXTS[r.doc_id]
        assert r.ws == len(t.split()), t
        assert r.bpe == len(re.findall(r"[A-Za-z0-9]+|[^\sA-Za-z0-9]", t)), t
        # fingerprint recomputed in python
        fp = 0
        for w in t.strip().split():
            fp = (fp * 31 + ord(w[0]) * 7 + len(w)) % textstats.FINGERPRINT_MOD
        assert r.fp == fp, t
        assert 0.0 <= r.q <= 1.0
    langs = {r.doc_id: r.lang for r in got}
    assert langs[0] == "en"
    assert langs[1] == "fr"
    assert langs[2] == "de"


def test_ivf_full_probe_equals_brute_force(spark):
    """With nprobe = n_centroids every cell is probed, so IVF must return
    EXACTLY the brute-force top-k; with nprobe=2 it returns a subset-ranked
    approximation with decent recall on the testdata."""
    from louis_crawler_legacy_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )
    from louis_crawler_legacy_spark.sources.testdata import load_table

    sf = "/root/testdata/sf0.001"
    e = load_table(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    want = {(r.query_id, r.rank): r.neighbor_id
            for r in brute_force_topk(e, q, k=5).collect()}
    got = {(r.query_id, r.rank): r.neighbor_id
           for r in ivf_topk(e, q, n_centroids=8, nprobe=8, k=5).collect()}
    assert got == want

    approx = {(r.query_id, r.neighbor_id)
              for r in ivf_topk(e, q, n_centroids=8, nprobe=2, k=5).collect()}
    exact = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(e, q, k=5).collect()}
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.4, recall  # nprobe=2 of 8 cells on near-orthogonal data


def test_lsh_indexed_matches_inmemory_and_prunes(spark, tmp_path):
    """Write-time bucketed index: (1) same neighbor sets as the in-memory
    lsh_topk (modulo identical candidates — both see any-bucket matches);
    (2) the query plan carries a dynamic-partition-pruning subquery on the
    (table, bucket) partition columns — the 100 TB property: a query reads
    its buckets, not the corpus."""
    from louis_crawler_legacy_spark.operators.similarity import (
        lsh_topk,
        lsh_topk_indexed,
        write_lsh_index,
    )
    from louis_crawler_legacy_spark.sources.testdata import load_table

    sf = "/root/testdata/sf0.001"
    e = load_table(spark, sf, "embeddings")
    dim = len(e.select("embedding").first()[0])
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    path = str(tmp_path / "lsh_index")
    write_lsh_index(e, path, dim=dim, n_planes=4, n_tables=2)

    got = lsh_topk_indexed(spark, path, q, dim=dim, k=5, n_planes=4, n_tables=2)
    want = lsh_topk(e, q, dim=dim, k=5, n_planes=4, n_tables=2)
    as_set = lambda df: {(r.query_id, r.neighbor_id, r.rank, r.cos_sim)
                         for r in df.collect()}
    assert as_set(got) == as_set(want)

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), "partition pruning missing"


def test_repetition_stats_hand_computed(spark):
    """Gopher repetition signals vs hand-computed ground truth, incl. the
    <2-word (no bigrams) and fully-repetitive edge cases."""
    rows = [
        (1, "a b a b a"),     # words 5, distinct 2 → dup 0.6;
                              # bigrams: ab, ba, ab, ba → top 2/4 = 0.5
        (2, "x"),             # 1 word → dup 0.0, no bigrams → 0.0
        (3, "w w w w"),       # dup 0.75; bigrams all 'w w' → 1.0
        (4, "p q r s"),       # all unique → dup 0.0; top bigram 1/3
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.id: (r.dup_word_frac, r.top_bigram_frac)
           for r in textstats.repetition_stats(df).collect()}
    assert got == {
        1: (0.6, 0.5),
        2: (0.0, 0.0),
        3: (0.75, 1.0),
        4: (0.0, 0.3333),
    }

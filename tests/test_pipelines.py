"""hawn/kurt derived pipelines (SURVEY §3.3) as single DataFrame jobs."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from louis_crawler_legacy_spark.plans import pipelines


def _pages(spark):
    def page(i):
        words = " ".join(f"p{i}w{j % 41}" for j in range(260 + i * 40))
        return (
            f"http://site.ca/p{i}",
            f"<html><head><title>P{i}</title></head><body>\n"
            f"<h1>H{i}</h1>\n<p>{words}</p>\n</body></html>",
        )

    return spark.createDataFrame([page(i) for i in range(4)], ["url", "html_content"])


def test_hawn_produces_chunks(spark):
    chunks = pipelines.hawn_pipeline(_pages(spark))
    rows = chunks.collect()
    assert rows
    assert set(chunks.columns) == {
        "id", "url", "chunk_idx", "title", "text_content", "token_count", "tokens"
    }
    for r in rows:
        assert 0 < r.token_count <= 512
        assert len(r.tokens) == r.token_count
    # deterministic ids
    again = {(r.url, r.chunk_idx): r.id for r in pipelines.hawn_pipeline(_pages(spark)).collect()}
    assert all(again[(r.url, r.chunk_idx)] == r.id for r in rows)


def test_kurt_embeds_only_missing(spark):
    chunks = pipelines.hawn_pipeline(_pages(spark)).cache()
    empty_emb = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("token_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
                T.StructField("embedding_model", T.StringType()),
            ]
        ),
    )
    first = pipelines.kurt_pipeline(chunks, empty_emb).cache()
    n_chunks = chunks.count()
    assert first.count() == n_chunks
    r = first.first()
    assert len(r.embedding) == pipelines.EMBEDDING_DIM
    # unit norm
    assert abs(sum(x * x for x in r.embedding) - 1.0) < 1e-3

    # idempotence: re-running against the stored embeddings embeds nothing
    second = pipelines.kurt_pipeline(chunks, first)
    assert second.count() == 0

    # partial failure: drop half, re-run embeds exactly the missing half
    half = first.limit(n_chunks // 2)
    third = pipelines.kurt_pipeline(chunks, half)
    assert third.count() == n_chunks - n_chunks // 2


def test_stub_embedding_deterministic():
    a = pipelines.stub_embedding([1, 2, 3])
    b = pipelines.stub_embedding([1, 2, 3])
    c = pipelines.stub_embedding([1, 2, 4])
    assert a == b != c

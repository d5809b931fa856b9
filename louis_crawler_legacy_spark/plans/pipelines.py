"""Derived pipelines — the reference's hawn/kurt spiders as single
DataFrame jobs (SURVEY §3.3; no loop, no middleware indirection):

- hawn: pages → chunk UDF → explode → chunks table
  (hawn.py:8-19 → chunking.py; the DB-replay middleware becomes a plain
  table read)
- kurt: chunks LEFT-ANTI embeddings (the db.py:686-703 work queue) →
  batched embedding UDF → embeddings table
  (kurt.py:12-21; the model call is stubbed exactly like the reference's
  louis/models/openai.py:3-13 zero-vector stub, here deterministic
  pseudo-embeddings so tests can assert values)
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from louis_crawler_legacy_spark.operators.chunking import (
    chunk_documents,
    chunk_id_expr,
)

EMBEDDING_DIM = 64  # reference uses 1536 (models/openai.py:13); configurable
EMBEDDING_MODEL = "stub-deterministic-v1"


def hawn_pipeline(pages: DataFrame, id_col: str = "url",
                  html_col: str = "html_content") -> DataFrame:
    """pages → chunks(id, url, title, text_content, token_count, tokens).

    Narrow mapInPandas over pages; deterministic chunk ids replace the
    reference's uuid4 (db.py:142)."""
    chunks = chunk_documents(pages, id_col=id_col, html_col=html_col)
    return chunks.select(
        chunk_id_expr(id_col).alias("id"),
        F.col(id_col).alias("url"),
        "chunk_idx",
        "title",
        "text_content",
        "token_count",
        "tokens",
    )


def stub_embedding(tokens: list[int], dim: int = EMBEDDING_DIM) -> list[float]:
    """Deterministic pseudo-embedding from token ids (unit-norm); the seam
    where a real model call plugs in (kurt.py:12-21 / models/openai.py)."""
    acc = [0.0] * dim
    for pos, t in enumerate(tokens):
        acc[(t + pos) % dim] += 1.0 + (t % 7) * 0.25
    n = math.sqrt(sum(x * x for x in acc)) or 1.0
    return [x / n for x in acc]


def kurt_pipeline(chunks: DataFrame, embeddings: DataFrame,
                  dim: int = EMBEDDING_DIM) -> DataFrame:
    """Work queue (J1: chunks without embeddings, ordered) → batched
    embedding UDF → rows for the embeddings table.

    The anti-join IS the scheduler: re-running after a partial failure
    embeds only what's missing — same idempotence the reference gets from
    its queue query (db.py:686-703)."""
    todo = chunks.join(
        embeddings.select(F.col("token_id").alias("id")), "id", "left_anti"
    ).select("id", "tokens")

    schema = T.StructType(
        [
            T.StructField("token_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("embedding_model", T.StringType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "token_id": pdf["id"].to_numpy(),
                    "embedding": [
                        stub_embedding(list(t), dim) for t in pdf["tokens"]
                    ],
                    "embedding_model": EMBEDDING_MODEL,
                }
            )

    return todo.mapInPandas(gen, schema=schema)

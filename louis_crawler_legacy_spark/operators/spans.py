"""Interleaved-document span model (BASELINE.json input_hint):

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

A crawled page becomes an ordered span sequence:
- kind='text'  — one span per chunker output chunk (operators/chunking.py),
- kind='media' — a .pdf child link (the reference stores it as a child,
  goldie.py:22-35, but excludes it from the frontier, requests.py:6-7),
- kind='link'  — any other child link.

The per-row invariant vs the reference (north rule) is span-sequence
equality on (kind, text, media_ref, order) — enforced by
``assert_span_equality`` in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from louis_crawler_legacy_spark.functions.htmlx import extract_children
from louis_crawler_legacy_spark.functions.tokenizer import default_encoder
from louis_crawler_legacy_spark.operators.chunking import chunk_html

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

SPANS_TYPE = T.ArrayType(SPAN_STRUCT)


def build_spans_py(html: str, base_url: str, enc=None) -> list[dict]:
    """Pure-Python span builder (the oracle twin for the Spark operator)."""
    if enc is None:
        enc = default_encoder()
    spans: list[dict] = []
    for ch in chunk_html(html, enc):
        spans.append(
            {
                "kind": "text",
                "text": ch["text_content"],
                "media_ref": None,
                "offset": len(spans),
            }
        )
    for child in extract_children(html, base_url):
        kind = "media" if child.endswith(".pdf") else "link"
        spans.append(
            {"kind": kind, "text": None, "media_ref": child, "offset": len(spans)}
        )
    return spans


def docs_to_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """pages(html) → documents(doc_id, spans) — one narrow mapInPandas pass,
    vectorized across documents per Arrow batch, no shuffle."""
    id_field = next(f for f in df.schema.fields if f.name == id_col)
    schema = T.StructType([id_field, T.StructField("spans", SPANS_TYPE)])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        enc = default_encoder()
        for pdf in batches:
            out = []
            for doc_id, html, url in zip(pdf[id_col], pdf[html_col], pdf[url_col]):
                if html is None:
                    out.append((doc_id, []))
                    continue
                spans = build_spans_py(html, url, enc)
                out.append(
                    (
                        doc_id,
                        [
                            (s["kind"], s["text"], s["media_ref"], s["offset"])
                            for s in spans
                        ],
                    )
                )
            yield pd.DataFrame(out, columns=[id_col, "spans"])

    return df.select(id_col, html_col, url_col).mapInPandas(gen, schema=schema)


def explode_spans(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Flatten to one row per span, preserving order via offset."""
    return df.select(
        id_col, F.explode("spans").alias("span")
    ).select(
        id_col,
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def frontier_candidates_from_spans(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Link-kind spans → frontier candidate URLs (media spans are stored
    but never scheduled — reference requests.py:6-7)."""
    s = explode_spans(df, id_col)
    return s.filter(F.col("kind") == "link").select(
        F.col(id_col).alias("src_doc"), F.col("media_ref").alias("url"), "offset"
    )

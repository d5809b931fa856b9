"""Multimodal column operators: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing is REAL (schemas, mapInPandas batching, partition
behavior); the actual codec work is STUBBED because no image/audio libraries
exist in this container:

- ``decode_media(..., real_decode=True)`` raises NotImplementedError at the
  exact seam where Pillow/librosa/pyav would plug in,
- the default path computes a DETERMINISTIC FAKE decode (pure arithmetic on
  the byte payload) so the batch shape, schema, and downstream joins are
  exercised and oracle-checkable end-to-end.

Media spans in the interleaved document model (operators/spans.py) carry a
``media_ref``; this module is what a pipeline runs after resolving those
refs to blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_FIELDS = [
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("media_kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("checksum", T.LongType()),
]


def fake_decode(payload: bytes) -> dict:
    """Deterministic fake 'decode': metadata as pure arithmetic over the
    payload. Mirrors what a real decoder returns, with values any engine
    (and the DuckDB oracle) can recompute."""
    n = len(payload)
    checksum = 0
    for b in payload[:64]:  # bounded prefix: O(1) per blob
        checksum = (checksum * 31 + b) % 1_000_000_007
    return {
        "n_bytes": n,
        "media_kind": "image" if n % 3 else "audio",
        "width": (n * 7) % 640 + 16,
        "height": (n * 13) % 480 + 16,
        "checksum": checksum,
    }


def decode_media(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "payload",
    real_decode: bool = False,
) -> DataFrame:
    """media(id, payload: binary) → typed metadata rows via mapInPandas.

    Arrow moves the binary column in batches; each worker decodes its
    partition independently (narrow, no shuffle). Swap ``fake_decode`` for a
    real codec without touching the plumbing."""
    id_field = next(f for f in df.schema.fields if f.name == id_col)
    schema = T.StructType([id_field] + MEDIA_META_FIELDS)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "real media decoding requires an image/audio codec "
                    "(Pillow/librosa); not available in this environment"
                )
            metas = [fake_decode(bytes(p)) for p in pdf[blob_col]]
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "n_bytes": [m["n_bytes"] for m in metas],
                    "media_kind": [m["media_kind"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "checksum": [m["checksum"] for m in metas],
                }
            )
            yield out

    return df.select(id_col, blob_col).mapInPandas(gen, schema=schema)


def frame_sample_plan(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "payload",
    every_n: int = 10,
) -> DataFrame:
    """Frame-sampling plumbing (video → every Nth frame): emits one row per
    sampled 'frame' with a deterministic fake frame id; the decode seam is
    the same as decode_media."""
    meta = decode_media(df, id_col, blob_col)
    # fake frame count := n_bytes // 32; sample every_n
    return meta.select(
        id_col,
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest((F.col("n_bytes") / 32).cast("int") - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
        "width",
        "height",
    )

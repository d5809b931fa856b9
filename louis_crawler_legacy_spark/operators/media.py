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


def fake_resize(payload: bytes, target_w: int, target_h: int,
                meta: dict | None = None) -> tuple:
    """Deterministic fake 'resize': fit the fake-decoded (w, h) into the
    target box preserving aspect (never upscale), thumbnail payload =
    proportional prefix of the input. Pure IEEE-double arithmetic so the
    DuckDB oracle reproduces it bit-for-bit. ``meta`` lets a caller that
    already decoded the payload skip the second decode (resize_media's
    hot loop decoded every blob twice before r06)."""
    if meta is None:
        meta = fake_decode(payload)
    w, h = meta["width"], meta["height"]
    scale = min(target_w / w, target_h / h, 1.0)
    out_w = max(1, int(w * scale))
    out_h = max(1, int(h * scale))
    out_n = max(1, (out_w * out_h) // 64)
    return out_w, out_h, payload[: min(len(payload), out_n)]


def resize_media(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    blob_col: str = "payload",
    real_resize: bool = False,
) -> DataFrame:
    """media(id, payload) → (id, width, height, out_w, out_h, out_n_bytes,
    thumbnail: binary) via mapInPandas — narrow, no shuffle; Arrow moves
    the blobs once. ``real_resize=True`` is the Pillow seam."""
    id_field = next(f for f in df.schema.fields if f.name == id_col)
    schema = T.StructType(
        [
            id_field,
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("out_w", T.IntegerType()),
            T.StructField("out_h", T.IntegerType()),
            T.StructField("out_n_bytes", T.IntegerType()),
            T.StructField("thumbnail", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_resize:
                raise NotImplementedError(
                    "real image resizing requires Pillow; not available "
                    "in this environment"
                )
            rows = []
            for i, p in zip(pdf[id_col], pdf[blob_col]):
                p = bytes(p)
                meta = fake_decode(p)
                ow, oh, thumb = fake_resize(p, target_w, target_h, meta=meta)
                rows.append(
                    (i, meta["width"], meta["height"], ow, oh, len(thumb),
                     thumb)
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "width", "height", "out_w", "out_h",
                         "out_n_bytes", "thumbnail"],
            )

    return df.select(id_col, blob_col).mapInPandas(gen, schema=schema)


def fake_features(payload: bytes, dims: int = 8) -> list:
    """Deterministic fake 'feature vector': normalized byte histogram
    (mod dims) over the bounded 64-byte prefix — double-precision
    fractions any engine recomputes exactly."""
    prefix = payload[:64]
    n = max(len(prefix), 1)
    counts = [0] * dims
    for b in prefix:
        counts[b % dims] += 1
    return [c / n for c in counts]


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "payload",
    dims: int = 8,
    real_extract: bool = False,
) -> DataFrame:
    """media(id, payload) → (id, feature: array<double>) via mapInPandas.
    The output feeds the similarity/ANN operators directly (media →
    embedding column); ``real_extract=True`` is the model-encoder seam."""
    id_field = next(f for f in df.schema.fields if f.name == id_col)
    schema = T.StructType(
        [id_field, T.StructField("feature", T.ArrayType(T.DoubleType()))]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_extract:
                raise NotImplementedError(
                    "real feature extraction requires an image/audio "
                    "encoder; not available in this environment"
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "feature": [
                        fake_features(bytes(p), dims) for p in pdf[blob_col]
                    ],
                }
            )

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

"""Partitioned Bloom-filter URL-seen set (north rule custom structure).

The reference keeps the seen set as an in-memory Python set + append-only
file and documents that it breaks past ~100k URLs
(goldie_playwright_parallel.py:437, docs/parallel_spider_guide.md:407-410).
At a 10^10-URL frontier neither a driver-side set nor a plain exact
anti-join-per-candidate is enough, so:

- the seen set's Bloom layer is hash-partitioned by URL
  (pmod(xxhash64(url), P)) — NOT by host: a hot host would pin one
  partition's blob + all its candidates into a single task and saturate
  that blob's fpp while others sit empty,
- each partition additionally maintains a Bloom bitmap blob
  (`seen_bloom(part_id, bits, n_items)`),
- candidate dedup is two-stage: a vectorized numpy probe per partition
  (cogrouped applyInPandas — each task touches only its partition's blob);
  **bloom-miss ⇒ definitively new** (no false negatives) and skips the
  exact join entirely; only bloom-hits (true dups + fpp false positives)
  go through the exact left-anti against `seen`.

At 10^10 URLs with fpp=1% that turns the exact anti-join from 10^10-row
probe side into ~(dups + 1% of new) — the scale-critical reduction.

Hashing: h1 = xxhash64(url), h2 = xxhash64(url, 'bloom-h2'), double hashing
idx_i = (h1 + i*h2) mod m — both hashes computed JVM-side (functions/urls.py),
the numpy probe only ever sees int64 columns.

**Unbounded growth (round-3 scale fix)**: a fixed bitmap saturates on a
sustained crawl (n_items past capacity → fpp → 1 → the two-stage dedup
silently degrades to a full exact anti-join). Each partition's blob is
therefore a SCALABLE Bloom filter (Almeida et al., "Scalable Bloom
Filters", IPL 2007): a chain of layers where layer i is sized by
bloom_params(cap0·2^i, fpp0·2^-i); inserts always go to the newest layer,
a full layer appends the next one, a probe ORs all layers. Total fpp is
bounded by Σ fpp0·2^-i < 2·fpp0 FOREVER, layer count grows log2(n/cap0),
and — critically for 10^10 URLs — growth never needs a rebuild pass over
the seen table: the blob grows in place inside the same cogrouped merge
task. Blobs are self-describing (header carries every layer's geometry),
so probe tasks need no driver-shared (m, k).

Blob layout (little-endian): uint64 magic "SBLOOM01" | uint64 n_layers |
n_layers × (uint64 m_bits, uint64 k, uint64 cap, uint64 n) | concatenated
bitmaps (m_bits/8 bytes each).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOM_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType()),
        T.StructField("bits", T.BinaryType()),
        T.StructField("n_items", T.LongType()),
    ]
)

FILTER_STATS_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType()),
        T.StructField("n_layers", T.IntegerType()),
        T.StructField("n_items", T.LongType()),
        T.StructField("capacity", T.LongType()),
        T.StructField("fill", T.DoubleType()),
    ]
)

_MAGIC = np.uint64(0x53424C4F4F4D3031)  # "SBLOOM01"
_HDR = 16  # magic + n_layers
_LMETA = 32  # m, k, cap, n per layer


def bloom_params(expected_n: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k_hashes) for a target capacity/fpp; m rounded up to bytes."""
    expected_n = max(expected_n, 1)
    m = int(math.ceil(-expected_n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, (m + 7) // 8 * 8)
    k = max(1, round(m / expected_n * math.log(2)))
    return m, min(k, 16)


def _indices(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """(rows, k) bit positions via double hashing, unsigned-wrapped."""
    u1 = h1.astype(np.uint64)
    u2 = h2.astype(np.uint64)
    out = np.empty((len(u1), k), dtype=np.uint64)
    for i in range(k):
        out[:, i] = (u1 + np.uint64(i) * u2) % np.uint64(m)
    return out


def build_bits(h1: np.ndarray, h2: np.ndarray, m: int, k: int,
               base: bytes | None = None) -> bytes:
    """Set bits for the given hash pairs, optionally ORing into a prior blob."""
    arr = (
        np.frombuffer(base, dtype=np.uint8).copy()
        if base is not None
        else np.zeros(m // 8, dtype=np.uint8)
    )
    if len(h1):
        idx = _indices(np.asarray(h1), np.asarray(h2), k, m)
        byte_idx = (idx >> np.uint64(3)).astype(np.int64)
        masks = (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
        np.bitwise_or.at(arr, byte_idx.ravel(), masks.ravel())
    return arr.tobytes()


def probe_bits(bits: bytes, h1: np.ndarray, h2: np.ndarray, m: int, k: int) -> np.ndarray:
    """Vectorized membership probe → bool array (True = maybe present)."""
    if len(h1) == 0:
        return np.zeros(0, dtype=bool)
    arr = np.frombuffer(bits, dtype=np.uint8)
    idx = _indices(np.asarray(h1), np.asarray(h2), k, m)
    byte_idx = (idx >> np.uint64(3)).astype(np.int64)
    masks = (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
    return ((arr[byte_idx] & masks) != 0).all(axis=1)


@dataclass
class _Layer:
    m: int
    k: int
    cap: int
    n: int
    bits: bytes


def serialize_layers(layers: list[_Layer]) -> bytes:
    header = np.array([_MAGIC, len(layers)], dtype=np.uint64)
    meta = np.array(
        [[l.m, l.k, l.cap, l.n] for l in layers], dtype=np.uint64
    )
    return header.tobytes() + meta.tobytes() + b"".join(l.bits for l in layers)


def deserialize_layers(blob: bytes) -> list[_Layer]:
    magic, n_layers = np.frombuffer(blob[:_HDR], dtype=np.uint64)
    if magic != _MAGIC:
        raise ValueError(
            "not a scalable-Bloom blob (bad magic) — was this warehouse "
            "built with seen_filter='cuckoo' or an older blob format?"
        )
    n_layers = int(n_layers)
    meta = np.frombuffer(
        blob[_HDR:_HDR + n_layers * _LMETA], dtype=np.uint64
    ).reshape(n_layers, 4)
    layers, off = [], _HDR + n_layers * _LMETA
    for m, k, cap, n in meta:
        m, k, cap, n = int(m), int(k), int(cap), int(n)
        layers.append(_Layer(m, k, cap, n, blob[off:off + m // 8]))
        off += m // 8
    return layers


def _fresh_layer(i: int, cap0: int, fpp0: float) -> _Layer:
    """Layer i geometry per the scalable-Bloom schedule: capacity doubles,
    target fpp halves — total fpp stays < 2·fpp0 at any size."""
    cap = cap0 << i
    m, k = bloom_params(cap, fpp0 * (0.5 ** i))
    return _Layer(m, k, cap, 0, b"\x00" * (m // 8))


def probe_layers(layers: list[_Layer], h1: np.ndarray,
                 h2: np.ndarray) -> np.ndarray:
    out = np.zeros(len(h1), dtype=bool)
    for l in layers:
        miss = ~out
        if not miss.any():
            break
        out[miss] = probe_bits(l.bits, h1[miss], h2[miss], l.m, l.k)
    return out


def insert_layers(layers: list[_Layer], h1: np.ndarray, h2: np.ndarray,
                  cap0: int, fpp0: float) -> list[_Layer]:
    """Fill the newest layer to its capacity; overflow appends the next
    (2× cap, ½ fpp) layer — growth happens inside the merge task, never a
    rebuild over the seen table."""
    i = 0
    while i < len(h1):
        last = layers[-1]
        room = last.cap - last.n
        if room <= 0:
            layers.append(_fresh_layer(len(layers), cap0, fpp0))
            continue
        take = min(room, len(h1) - i)
        last.bits = build_bits(
            h1[i:i + take], h2[i:i + take], last.m, last.k, base=last.bits
        )
        last.n += take
        i += take
    return layers


class PartitionedBloom:
    """Driver-facing API over the seen_bloom table contents.

    All per-row work happens inside cogrouped applyInPandas tasks; the
    driver only moves (part_id, blob) rows, never URLs. Each blob is a
    scalable layer chain (module docstring) — capacity is a starting
    point, not a ceiling.
    """

    def __init__(self, m_bits: int, k_hashes: int, capacity: int | None = None,
                 fpp: float | None = None):
        self.m = m_bits
        self.k = k_hashes
        # (m, k)-only construction (legacy callers/tests): invert the
        # optimal-k identities — cap ≈ m·ln2/k, fpp ≈ 2^-k
        self.cap0 = capacity if capacity else max(1, int(m_bits * math.log(2) / k_hashes))
        self.fpp0 = fpp if fpp else 0.5 ** k_hashes

    @classmethod
    def for_capacity(cls, capacity: int, fpp: float = 0.01) -> "PartitionedBloom":
        m, k = bloom_params(capacity, fpp)
        return cls(m, k, capacity=capacity, fpp=fpp)

    def merge_blobs(self, blooms: DataFrame, new_hashes: DataFrame) -> DataFrame:
        """blooms(part_id, bits, n_items) ⊕ new_hashes(part_id, h1, h2)
        → refreshed blooms. Cogrouped per partition; partitions without new
        URLs pass through untouched; a full partition grows a new layer in
        place (no rebuild, no extra shuffle)."""
        cap0, fpp0 = self.cap0, self.fpp0

        def merge(key, blob_pdf: pd.DataFrame, hashes_pdf: pd.DataFrame) -> pd.DataFrame:
            part_id = int(key[0])
            if len(blob_pdf):
                layers = deserialize_layers(blob_pdf["bits"].iloc[0])
                n0 = int(blob_pdf["n_items"].iloc[0])
            else:
                layers = [_fresh_layer(0, cap0, fpp0)]
                n0 = 0
            layers = insert_layers(
                layers,
                hashes_pdf["h1"].to_numpy(),
                hashes_pdf["h2"].to_numpy(),
                cap0, fpp0,
            )
            return pd.DataFrame(
                {
                    "part_id": [part_id],
                    "bits": [serialize_layers(layers)],
                    "n_items": [n0 + len(hashes_pdf)],
                }
            )

        return (
            blooms.groupBy("part_id")
            .cogroup(new_hashes.groupBy("part_id"))
            .applyInPandas(merge, schema=BLOOM_SCHEMA)
        )

    def probe(self, candidates: DataFrame, blooms: DataFrame,
              h1_col: str = "h1", h2_col: str = "h2") -> DataFrame:
        """candidates(…, part_id, h1, h2) → same rows + maybe_seen boolean.

        Cogrouped by part_id so each task loads exactly one blob. Rows in
        partitions with no blob yet are definitively new. Geometry comes
        from the blob's own header, not the driver."""
        out_schema = T.StructType(
            list(candidates.schema.fields)
            + [T.StructField("maybe_seen", T.BooleanType())]
        )
        cols = [f.name for f in candidates.schema.fields]

        def run(key, cand_pdf: pd.DataFrame, blob_pdf: pd.DataFrame) -> pd.DataFrame:
            if len(cand_pdf) == 0:
                return pd.DataFrame(columns=cols + ["maybe_seen"])
            if len(blob_pdf) == 0:
                cand_pdf["maybe_seen"] = False
            else:
                cand_pdf["maybe_seen"] = probe_layers(
                    deserialize_layers(blob_pdf["bits"].iloc[0]),
                    cand_pdf[h1_col].to_numpy(),
                    cand_pdf[h2_col].to_numpy(),
                )
            return cand_pdf

        return (
            candidates.groupBy("part_id")
            .cogroup(blooms.groupBy("part_id"))
            .applyInPandas(run, schema=out_schema)
        )


def filter_stats(blooms: DataFrame) -> DataFrame:
    """Per-partition saturation metadata (no bits leave the task): layer
    count, items, total layer capacity, fill of the NEWEST layer (the one
    that triggers growth). Works for both blob kinds (cuckoo blobs report
    chain stats via their own header)."""

    def stats(batches):
        from louis_crawler_legacy_spark.operators import cuckoo as cuckoo_mod

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                blob = r["bits"]
                magic = np.frombuffer(blob[:8], dtype=np.uint64)[0]
                if magic == _MAGIC:
                    layers = deserialize_layers(blob)
                    cap = sum(l.cap for l in layers)
                    last = layers[-1]
                    fill = last.n / last.cap if last.cap else 0.0
                    rows.append(
                        (int(r["part_id"]), len(layers), int(r["n_items"]),
                         cap, round(fill, 4))
                    )
                else:
                    rows.append(cuckoo_mod.chain_stats_row(
                        int(r["part_id"]), blob, int(r["n_items"])
                    ))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["part_id", "n_layers", "n_items", "capacity",
                             "fill"],
                )

    return blooms.mapInPandas(stats, schema=FILTER_STATS_SCHEMA)


def with_bloom_hashes(df: DataFrame, url_col: str,
                      num_partitions: int) -> DataFrame:
    """Attach (part_id, h1, h2) — all JVM-side expressions.

    part_id hashes the URL, not the host: a single hot host (a 10^9-URL
    domain is the norm in web crawl) would pin one partition's blob and all
    its candidates into one cogroup task while its blob saturates (fpp→1).
    The probe needs no host locality — politeness keeps its own host
    windows — so uniform URL hashing balances both blob occupancy and probe
    task sizes (VERDICT r01 scale-killer #2)."""
    return df.withColumns(
        {
            "part_id": F.pmod(F.xxhash64(F.col(url_col)), F.lit(num_partitions)).cast(
                "int"
            ),
            "h1": F.xxhash64(F.col(url_col)),
            "h2": F.xxhash64(F.col(url_col), F.lit("bloom-h2")),
        }
    )

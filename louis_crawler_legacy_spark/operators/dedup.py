"""Deduplication operators for training-data pipelines, smallest-to-largest
hammer:

- exact          — hash groupBy on (normalized) content; map-side partial
                   aggregation collapses dups before the shuffle
- ngram-jaccard  — exact Jaccard over word n-gram shingles within cheap
                   blocking buckets (bounded pair explosion; DuckDB oracle)
- MinHash + LSH  — shingle → minhash signature → band buckets → bucket join;
                   the scale path for all-pairs near-dup at 100 TB: the only
                   shuffle is on band keys, candidate pairs are verified by
                   signature similarity, never by re-reading text
- SimHash        — 64-bit sign-aggregated fingerprint; near-dup = small
                   Hamming distance within same-band buckets
- embedding      — cosine near-dup over an embedding column (see
                   similarity.py for the ANN machinery)

All hashing is JVM-side xxhash64; signatures live in arrays; no Python in
any hot path. MinHash permutations use (aᵢ·h + bᵢ) mod p with constants
derived deterministically from the permutation index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 31-bit Mersenne prime: keeps aᵢ·h + bᵢ < 2^62 — no silent long overflow
# inside the permutation arithmetic (Spark longs wrap, which would make the
# "uniform permutation" family quietly lopsided)
MERSENNE_P = (1 << 31) - 1


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per distinct text. Equivalent SQL: row_number()
    over (partition by text order by id) = 1."""
    w = Window.partitionBy(text_col).orderBy(id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def duplicate_groups(df: DataFrame, key: Column, id_col: str = "doc_id") -> DataFrame:
    """Group-by-key duplicate report: (key, n_dups, keeper_id)."""
    return (
        df.groupBy(key.alias("dup_key"))
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# shingles + n-gram Jaccard
# ---------------------------------------------------------------------------

def bind_once(expr: Column, body) -> Column:
    """Evaluate ``expr`` ONCE per row and bind it as a lambda variable
    inside ``body(var)``.

    Higher-order-function lambdas are interpreted (no whole-stage codegen,
    no common-subexpression elimination), so an expression referenced
    inside a lambda is re-evaluated on EVERY lambda invocation: the r05
    shingles fold re-ran ``split(trim(text))`` for each of the n
    element_at calls at every shingle position — O(words²) work per
    document. Wrapping the array in a 1-element array and binding it via
    transform makes the inner references plain lambda-variable lookups.
    Pure plan rewrite: values are identical (pinned by the driver gate)."""
    return F.get(F.transform(F.array(expr), body), 0)


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (native higher-order functions).
    The split word array is bound once per row (bind_once) — the inner
    element_at calls reference a lambda variable, not a re-evaluated
    split subtree."""

    def body(words: Column) -> Column:
        count = F.size(words) - (n - 1)
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(count, F.lit(0))),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + j) for j in range(n)]
            ),
        )
        # short texts (< n words): fall back to the whole text as one shingle
        return F.when(count >= 1, F.array_distinct(grams)).otherwise(
            F.array(F.trim(text))
        )

    return bind_once(F.split(F.trim(text), r"\s+"), body)


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return inter / F.greatest(union, F.lit(1))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    block_expr: Column | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs within a blocking bucket.

    Blocking (default: first two words) bounds the O(n²) pair explosion —
    the shuffle is on the block key, and AQE's skew-join handles a hot
    block. For unblocked all-pairs at scale use minhash_lsh_pairs."""
    if block_expr is None:
        # F.get (not getItem): out-of-bounds → NULL instead of an ANSI
        # ArrayIndexOutOfBounds crash on 1-word texts; concat_ws skips
        # NULLs, matching the DuckDB oracle's concat_ws(w[1], w[2])
        w = F.split(F.trim(F.col(text_col)), r"\s+")
        block_expr = F.concat_ws(" ", F.get(w, 0), F.get(w, 1))
    base = df.select(
        F.col(id_col).alias("id"),
        block_expr.alias("block"),
        shingles(F.col(text_col), n).alias("sh"),
    )
    left = base.select("block", F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    right = base.select("block", F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = left.join(right, "block").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 1,
) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing ≥ min_shared distinct
    word n-grams with ANY eval-set doc, with the shared-shingle count.

    The training-data gate that keeps benchmark text out of the corpus
    (the n-gram-overlap test used by GPT-3 §C / PaLM-style dedup-vs-eval
    sweeps), expressed as the same shingle fold d3/d4 use.

    Scale: the eval set is tiny next to the corpus (10^3-10^5 benchmark
    rows vs 10^9+ docs), so its distinct shingles BROADCAST; each corpus
    task explodes its own shingles and probes the broadcast in place —
    corpus text never crosses an exchange, and the only shuffle carries
    (doc_id, partial_count) from the map-side-combined per-doc aggregate.
    If the eval set ever outgrows the broadcast budget, drop to a
    shingle-hash bucketed join (the d4 band-key pattern) — same fold.
    """
    ev = (
        eval_df.select(F.explode(shingles(F.col(text_col), n)).alias("s"))
        .distinct()
    )
    ex = corpus.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("s")
    )
    # shingles() is per-doc distinct, so count(*) = distinct shared grams
    return (
        ex.join(F.broadcast(ev), "s")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _perm_constants(num_perm: int) -> tuple[list[int], list[int]]:
    """Deterministic (a, b) per permutation — odd a, derived from the index
    via splitmix-style mixing (no RNG state, reproducible everywhere)."""
    def mix(x: int) -> int:
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB % (1 << 64)
        return x ^ (x >> 31)

    a = [(mix(i * 2 + 1) | 1) % MERSENNE_P for i in range(num_perm)]
    b = [mix(i * 2 + 2) % MERSENNE_P for i in range(num_perm)]
    return a, b


def minhash_signature(text: Column, num_perm: int = 64, shingle_n: int = 3) -> Column:
    """array<long> signature as a single column expression.

    NOTE: only for small inputs/tests — Catalyst inlines the shingle-hash
    subtree into all num_perm lambdas (num_perm× recompute). The scale path
    is ``minhash_signatures`` below (explode + 64 min-aggregates, one
    codegen'd hash aggregate, shingles hashed exactly once)."""
    a_const, b_const = _perm_constants(num_perm)
    sh = shingles(text, shingle_n)
    hashes = F.transform(sh, lambda s: F.abs(F.xxhash64(s)) % MERSENNE_P)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda i: F.array_min(
            F.transform(
                hashes,
                lambda h: (
                    F.element_at(F.lit(a_const), i + 1) * h
                    + F.element_at(F.lit(b_const), i + 1)
                )
                % MERSENNE_P,
            )
        ),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    shingle_n: int = 3,
    hash_fn=None,
) -> DataFrame:
    """(id, sig: array<long>) — the scale path.

    explode(shingles) → one row per (doc, shingle-hash), then num_perm
    min() aggregates in ONE hash aggregate: each shingle is hashed once,
    partial aggregation collapses per-partition, the only shuffle is the
    groupBy on doc id. At 100 TB this is a single pass + one exchange.
    hash_fn (default xxhash64) is injectable so the driver oracle can use
    the SQL-portable poly_hash (DuckDB can't compute xxhash64)."""
    hash_fn = hash_fn or F.xxhash64
    a_const, b_const = _perm_constants(num_perm)
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("s"),
    ).select("id", (F.abs(hash_fn(F.col("s"))) % MERSENNE_P).alias("h"))
    aggs = [
        F.min((F.lit(a_const[i]) * F.col("h") + F.lit(b_const[i])) % MERSENNE_P).alias(
            f"_m{i}"
        )
        for i in range(num_perm)
    ]
    sig = exploded.groupBy("id").agg(*aggs)
    return sig.select(
        "id", F.array(*[F.col(f"_m{i}") for i in range(num_perm)]).alias("sig")
    )


def band_keys(sig: Column, bands: int, rows_per_band: int, band_hash_fn) -> Column:
    """array<long> of per-band hashes over a minhash signature array —
    ONE fold shared by within-corpus (minhash_lsh_pairs) and incremental
    (minhash_lsh_incremental) dedup so their band keys never drift."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: band_hash_fn(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(sig, b * rows_per_band + 1, rows_per_band),
                    lambda x: x.cast("string"),
                ),
            )
        ),
    )


def _no_earlier_band_match() -> Column:
    """Min-band pair ownership predicate (see minhash_lsh_pairs): emit a
    candidate only from its lowest matching band. CASE WHEN is lazily
    evaluated — for band 0 the sequence branch never runs."""
    return F.when(F.col("band") == 0, F.lit(True)).otherwise(
        ~F.exists(
            F.sequence(F.lit(1), F.col("band")),
            lambda j: F.element_at(F.col("bands_a"), j)
            == F.element_at(F.col("bands_b"), j),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    shingle_n: int = 3,
    hash_fn=None,
    band_hash_fn=None,
    materialize_sig: bool = True,
) -> DataFrame:
    """Banded-LSH candidate generation + signature-similarity verification.

    bands=16 over 64 perms → rows=4 → s-curve midpoint ≈ (1/16)^(1/4) ≈ 0.5.
    Output: (id_a, id_b, sim) where sim = fraction of equal minhashes.
    hash_fn / band_hash_fn (defaults: xxhash64) are injectable for the
    SQL-portable oracle mode (see driver_queries d4).

    materialize_sig (default on): localCheckpoint the (id, sig, bands)
    table before the self-join. The join references it from BOTH sides and
    AQE does NOT reuse the exchange here (verified empirically on Spark
    4.1: the full scan→explode→64-min-aggregate subtree executed twice,
    ~1.9x the runtime at sf0.1), so the signature pass runs ONCE and the
    join reads the materialized longs. Identical results (checked row-set
    equal); off for plan-shape inspection (tests) and for callers
    composing further lazy transformations."""
    assert num_perm % bands == 0
    band_hash_fn = band_hash_fn or F.xxhash64
    rows_per_band = num_perm // bands
    sig = minhash_signatures(df, id_col, text_col, num_perm, shingle_n, hash_fn)
    # explode to (band, band_hash) bucket keys — the ONLY shuffle key. The
    # full band-hash array rides along so pair ownership can be decided
    # WITHOUT a dedup shuffle (min-band ownership below).
    band_arr = band_keys(F.col("sig"), bands, rows_per_band, band_hash_fn)
    pre = sig.withColumn("bands", band_arr)
    if materialize_sig:
        pre = pre.localCheckpoint()
    banded = pre.select(
        "id", "sig", "bands",
        F.posexplode(F.col("bands")).alias("band", "band_hash"),
    )
    left = banded.select("band", "band_hash", F.col("id").alias("id_a"),
                         F.col("sig").alias("sig_a"),
                         F.col("bands").alias("bands_a"))
    right = banded.select("band", "band_hash", F.col("id").alias("id_b"),
                          F.col("sig").alias("sig_b"),
                          F.col("bands").alias("bands_b"))
    # min-band ownership: a pair matching in k bands would surface k times;
    # emit it ONLY from its lowest matching band (no earlier band equal) —
    # a free filter instead of dropDuplicates, so duplicate candidate pairs
    # from hot bands are never materialized or shuffled at all.
    no_earlier_match = _no_earlier_band_match()
    cand = (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(no_earlier_match)
    )
    sim = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda eq: eq,
        )
    ) / F.lit(float(num_perm))
    return (
        cand.withColumn("sim", F.round(sim, 4))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def minhash_lsh_incremental(
    new_df: DataFrame,
    corpus_sig: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    shingle_n: int = 3,
    hash_fn=None,
    band_hash_fn=None,
) -> DataFrame:
    """Incremental dedup: (new_id, corpus_id, sim) for NEW docs that
    near-duplicate an EXISTING corpus — the continual-crawl production
    shape, where the corpus must never re-pair against itself.

    `corpus_sig` is the (id, sig) output of minhash_signatures,
    MATERIALIZED once at ingest: each increment hashes only its own
    batch, the 100 TB corpus contributes signatures (num_perm longs/doc,
    ~0.5 KB), never text, and no corpus×corpus or new×new candidate is
    ever formed. The join shuffles on (band, band_hash) only; at scale,
    write the corpus band table partitioned by band_hash bucket (the s2
    write-time layout) so only the new side moves. Same band fold and
    min-band candidate ownership as minhash_lsh_pairs — an incremental
    run finds exactly the cross-set subset of the full run's pairs
    (locked in test_dedup)."""
    band_hash_fn = band_hash_fn or F.xxhash64
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    new_sig = minhash_signatures(
        new_df, id_col, text_col, num_perm, shingle_n, hash_fn
    )

    def banded(s: DataFrame) -> DataFrame:
        arr = band_keys(F.col("sig"), bands, rows_per_band, band_hash_fn)
        return s.withColumn("bands", arr).select(
            "id", "sig", "bands",
            F.posexplode(F.col("bands")).alias("band", "band_hash"),
        )

    left = banded(new_sig).select(
        "band", "band_hash", F.col("id").alias("new_id"),
        F.col("sig").alias("sig_a"), F.col("bands").alias("bands_a"),
    )
    right = banded(corpus_sig).select(
        "band", "band_hash", F.col("id").alias("corpus_id"),
        F.col("sig").alias("sig_b"), F.col("bands").alias("bands_b"),
    )
    # cross-set: no id ordering (the sets are disjoint by construction);
    # min-band ownership alone dedups multi-band candidates
    cand = left.join(right, ["band", "band_hash"]).filter(
        _no_earlier_band_match()
    )
    sim = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda eq: eq,
        )
    ) / F.lit(float(num_perm))
    return (
        cand.withColumn("sim", F.round(sim, 4))
        .filter(F.col("sim") >= threshold)
        .select("new_id", "corpus_id", "sim")
    )


def dup_window_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 10,
) -> DataFrame:
    """Exact duplicate-substring metric (Lee et al. 2022 'Deduplicating
    Training Data Makes Language Models Better', the suffix-array dedup
    re-expressed relationally): per doc, the fraction of word-window
    positions whose `window`-word string occurs ≥2 times corpus-wide
    (within-doc repeats count — any second occurrence is duplicated
    text). Output: (id, n_windows, n_dup, dup_frac); <window-word docs
    get (0, 0, 0.0).

    Scale: explode emits one row per window POSITION (~tokens rows, the
    t5 class); the global frequency is ONE map-side-combined count, and
    the membership join shuffles 8-byte xxhash64 window KEYS only — never
    the ~60-100-byte window strings (the r05 plan moved the raw strings
    through both the frequency groupBy and the membership join, ~10-20x
    the corpus text bytes; the hash key is ~1x). A 64-bit hash collision
    would need two distinct windows with equal xxhash64 — probability
    ~n²/2^65 corpus-wide (≪1 even at 10^12 windows), and its only effect
    would be one window pair sharing a frequency count. Hot boilerplate
    windows are exactly the AQE skew-join case d3 proves."""

    def wins_body(w: Column) -> Column:
        n = F.size(w) - (window - 1)
        return F.when(
            n >= 1,
            F.transform(
                F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(w, i, window)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    wins = bind_once(F.split(F.trim(F.col(text_col)), r"\s+"), wins_body)
    # the window STRING dies in the post-explode projection: only its
    # 8-byte hash reaches the shuffle
    ex = df.select(
        F.col(id_col).alias("id"), F.explode(wins).alias("win")
    ).select("id", F.xxhash64("win").alias("wh"))
    freq = ex.groupBy("wh").agg(F.count("*").alias("cnt"))
    per = (
        ex.join(freq, "wh")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_windows"),
            F.sum((F.col("cnt") >= 2).cast("long")).alias("n_dup"),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per, "id", "left")
        .select(
            "id",
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
            F.coalesce(
                F.round(F.col("n_dup") / F.col("n_windows"), 4), F.lit(0.0)
            ).alias("dup_frac"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

# signed-long bit masks 1<<i (bit 63 wraps to long min) — a literal array so
# higher-order lambdas can index it (shiftleft needs a Python-int bit count)
_BIT_MASKS = [(1 << i) if i < 63 else -(1 << 63) for i in range(64)]


def poly_hash(col: Column, mod: int = 1_000_000_007) -> Column:
    """SQL-portable word hash: fold codepoints as (acc*31 + cp) % mod.

    The ORACLE-MODE hash: DuckDB cannot compute xxhash64, but both engines
    can compute this (DuckDB: list_reduce over generate_series + ascii).
    ~30 bits — pair it with nbits=32 SimHash. The engine default stays
    xxhash64/64-bit; this exists so the driver gate can check SimHash
    values exactly instead of rows-only.

    r06: folds over split(col, '') — one O(len) char-array materialization
    — instead of the r05 substr(col, i, 1) indexed fold, whose per-index
    UTF-8 scan made each hash O(len²) (d5/d7's oracle-mode runs were
    dominated by it). Values identical for every string incl. empty /
    non-ASCII (split('') on '' yields an empty array → acc stays 0, which
    equals the old sequence(1,1)+ascii(NULL→0) fold; pinned by test)."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.coalesce(F.ascii(c), F.lit(0))) % mod,
    )


def simhash64(text: Column) -> Column:
    """64-bit SimHash over word hashes: bit i set iff Σ sign(word_hash bit i)
    > 0. Column-expression form for small inputs/tests; the scale path is
    ``simhash_signatures`` (explode + 64 sum-aggregates)."""
    words = F.array_distinct(F.split(F.trim(text), r"\s+"))
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    masks = F.lit(_BIT_MASKS)
    bit_sums = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.element_at(masks, i + 1)) != 0, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            bit_sums,
            masks,
            lambda s, mask: F.when(s > 0, mask).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, bit: acc.bitwiseOR(bit),
    )


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    nbits: int = 64,
    hash_fn=None,
) -> DataFrame:
    """(id, sh: long) — relational SimHash: one row per distinct word hash,
    nbits conditional-sum aggregates in one pass, bits reassembled by
    addition (disjoint masks). Same single-shuffle profile as
    minhash_signatures. hash_fn (default xxhash64) is injectable so the
    driver oracle can use the SQL-portable poly_hash with nbits=32."""
    hash_fn = hash_fn or F.xxhash64
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))).alias(
            "w"
        ),
    ).select("id", hash_fn(F.col("w")).alias("h"))
    aggs = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(_BIT_MASKS[i])) != 0, 1).otherwise(-1)
        ).alias(f"_b{i}")
        for i in range(nbits)
    ]
    sums = exploded.groupBy("id").agg(*aggs)
    sh = None
    for i in range(nbits):
        term = F.when(F.col(f"_b{i}") > 0, F.lit(_BIT_MASKS[i]).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sh = term if sh is None else sh + term  # disjoint bits: + == OR
    return sums.select("id", sh.alias("sh"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    bands: int = 4,
    nbits: int = 64,
    hash_fn=None,
    materialize_sig: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on nbits/bands-bit bands
    (pigeonhole: a pair with hamming < bands shares at least one equal
    band, so for max_hamming ≤ bands−1 the banded candidates are EXACTLY
    all qualifying pairs — which is what makes the d5 oracle checkable),
    verify with exact Hamming distance. materialize_sig: same self-join
    double-compute fix as minhash_lsh_pairs (the nbits sign-aggregate
    subtree otherwise executes once per join side)."""
    sh = simhash_signatures(df, id_col, text_col, nbits=nbits, hash_fn=hash_fn)
    bits_per_band = nbits // bands
    band_mask = (1 << bits_per_band) - 1
    band_arr = F.array(
        *[
            F.shiftrightunsigned(F.col("sh"), b * bits_per_band).bitwiseAND(
                F.lit(band_mask).cast("long")
            )
            for b in range(bands)
        ]
    )
    pre = sh.withColumn("bands", band_arr)
    if materialize_sig:
        pre = pre.localCheckpoint()
    banded = pre.select(
        "id", "sh", "bands",
        F.posexplode(F.col("bands")).alias("band", "band_val"),
    )
    left = banded.select("band", "band_val", F.col("id").alias("id_a"),
                         F.col("sh").alias("sh_a"),
                         F.col("bands").alias("bands_a"))
    right = banded.select("band", "band_val", F.col("id").alias("id_b"),
                          F.col("sh").alias("sh_b"),
                          F.col("bands").alias("bands_b"))
    # min-band ownership (see minhash_lsh_pairs): emit each pair only from
    # its lowest matching band — a filter, not a dedup shuffle
    no_earlier_match = F.when(F.col("band") == 0, F.lit(True)).otherwise(
        ~F.exists(
            F.sequence(F.lit(1), F.col("band")),
            lambda j: F.element_at(F.col("bands_a"), j)
            == F.element_at(F.col("bands_b"), j),
        )
    )
    cand = (
        left.join(right, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(no_earlier_match)
    )
    return (
        cand.withColumn("hamming", hamming64(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )

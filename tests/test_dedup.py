"""Dedup family: exact, n-gram Jaccard, MinHash+LSH, SimHash — with planted
near-duplicates as ground truth."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from louis_crawler_legacy_spark.operators import dedup


def make_docs():
    """100 base docs + planted near-dup pairs (ids 1000+i duplicates i with
    a small mutation) + two exact dup pairs."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(50)]
    docs = []
    for i in range(100):
        words = [vocab[rng.randrange(len(vocab))] for _ in range(60)]
        docs.append((i, " ".join(words)))
    planted = []
    for i in range(10):
        base = docs[i][1].split()
        mutated = list(base)
        for _ in range(3):  # ~5% mutation → jaccard stays high
            mutated[rng.randrange(len(mutated))] = vocab[rng.randrange(len(vocab))]
        docs.append((1000 + i, " ".join(mutated)))
        planted.append((i, 1000 + i))
    docs.append((2000, docs[0][1]))  # exact dup of 0
    docs.append((2001, docs[1][1]))  # exact dup of 1
    return docs, planted


DOCS, PLANTED = make_docs()


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).cache()


def test_exact_dedup(spark, docs_df):
    kept = dedup.exact_dedup(docs_df)
    assert kept.count() == len(DOCS) - 2
    kept_ids = {r.doc_id for r in kept.collect()}
    assert 0 in kept_ids and 2000 not in kept_ids
    assert 1 in kept_ids and 2001 not in kept_ids

    groups = dedup.duplicate_groups(docs_df, F.col("text"))
    rows = {r.keeper_id: r.n_docs for r in groups.collect()}
    assert rows == {0: 2, 1: 2}


def test_minhash_lsh_finds_planted_pairs(spark, docs_df):
    pairs = dedup.minhash_lsh_pairs(docs_df, threshold=0.35)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    for a, b in PLANTED:
        assert (a, b) in got, f"planted near-dup ({a},{b}) missed"
    # exact dups are trivially found with sim 1.0
    sims = {(r.id_a, r.id_b): r.sim for r in pairs.collect()}
    assert sims[(0, 2000)] == 1.0


def test_minhash_signature_deterministic(spark, docs_df):
    sig1 = docs_df.select(
        dedup.minhash_signature(F.col("text")).alias("s")
    ).collect()
    sig2 = docs_df.select(
        dedup.minhash_signature(F.col("text")).alias("s")
    ).collect()
    assert [list(r.s) for r in sig1] == [list(r.s) for r in sig2]
    assert all(len(r.s) == 64 for r in sig1)


def test_ngram_jaccard_blocked(spark, docs_df):
    # block on the first word so planted pairs (same first word unless
    # mutated there) mostly collide; verify exact jaccard values vs Python
    pairs = dedup.ngram_jaccard_pairs(
        docs_df,
        threshold=0.3,
        block_expr=F.split(F.trim(F.col("text")), r"\s+").getItem(0),
    )
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert got, "no pairs found"

    def py_shingles(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    texts = dict(DOCS)
    for (a, b), j in got.items():
        sa, sb = py_shingles(texts[a]), py_shingles(texts[b])
        want = len(sa & sb) / len(sa | sb)
        assert abs(j - want) < 1e-3, (a, b)


def test_simhash_near_dups(spark, docs_df):
    sh = docs_df.select(dedup.simhash64(F.col("text")).alias("h")).collect()
    assert all(isinstance(r.h, int) for r in sh)
    pairs = dedup.simhash_pairs(docs_df, max_hamming=16)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 2000) in got and (1, 2001) in got  # exact dups: hamming 0
    found_planted = sum(1 for p in PLANTED if p in got)
    assert found_planted >= 5, f"simhash found only {found_planted}/10 planted"


def test_ngram_jaccard_short_texts(spark):
    """1-and-2-word texts: shingles fall back to the whole trimmed text and
    the blocking key must not crash (ANSI getItem) nor diverge from the
    DuckDB oracle's concat_ws semantics (ADVICE r01)."""
    from louis_crawler_legacy_spark.operators.dedup import ngram_jaccard_pairs

    rows = [(1, "hello"), (2, "hello"), (3, "hello world"),
            (4, "hello world"), (5, "  hello  "), (6, "x")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in ngram_jaccard_pairs(df, threshold=0.2).collect()}
    # identical after trim: (1,2), (1,5), (2,5); two-word dup (3,4)
    assert pairs == {(1, 2): 1.0, (1, 5): 1.0, (2, 5): 1.0, (3, 4): 1.0}


def test_contamination_planted(spark, docs_df):
    """Decontamination vs a brute-force Python twin: eval set = the 10
    planted-near-dup sources; their mutated twins share most 3-grams,
    unrelated docs mostly don't. Counts must equal the exact
    distinct-shingle intersection per doc."""
    eval_ids = {a for a, _ in PLANTED}
    ev = docs_df.where(F.col("doc_id").isin(*eval_ids))
    corpus = docs_df.where(~F.col("doc_id").isin(*eval_ids))
    got = {r.doc_id: r.n_shared
           for r in dedup.contamination(corpus, ev).collect()}

    def py_shingles(t):
        w = t.split()
        return (set(" ".join(w[i:i + 3]) for i in range(len(w) - 2))
                if len(w) >= 3 else {t.strip()})

    texts = dict(DOCS)
    ev_sh = set().union(*(py_shingles(texts[i]) for i in eval_ids))
    want = {}
    for i, t in DOCS:
        if i in eval_ids:
            continue
        n = len(py_shingles(t) & ev_sh)
        if n >= 1:
            want[i] = n
    assert got == want
    # every planted twin is flagged (≈95% gram overlap with its source)
    for a, b in PLANTED:
        assert b in got, f"planted contaminated doc {b} missed"


def test_contamination_min_shared_gate(spark, docs_df):
    """min_shared raises the bar monotonically."""
    eval_ids = {a for a, _ in PLANTED}
    ev = docs_df.where(F.col("doc_id").isin(*eval_ids))
    corpus = docs_df.where(~F.col("doc_id").isin(*eval_ids))
    loose = dedup.contamination(corpus, ev, min_shared=1).count()
    strict = dedup.contamination(corpus, ev, min_shared=30).count()
    assert strict <= loose
    assert strict >= len(PLANTED)  # twins share ≥30 of ~58 grams


def test_contamination_short_text_fallback(spark):
    """<3-word docs shingle to the whole trimmed text: an exact short
    eval string must flag its corpus duplicate, and near-misses must not
    (no partial n-grams exist to collide on)."""
    corpus = spark.createDataFrame(
        [(1, "secret answer"), (2, "secret  answer "), (3, "secret question"),
         (4, "a b c d e")],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame([(100, " secret answer")], ["doc_id", "text"])
    got = {r.doc_id: r.n_shared
           for r in dedup.contamination(corpus, ev).collect()}
    # the fallback shingle is the TRIMMED RAW text (shingles(): F.trim),
    # exactly like the oracle's `ELSE [t]` — so doc 2's interior double
    # space is significant and does NOT match; only the exact dup does
    assert got == {1: 1}


def test_incremental_equals_cross_subset_of_full_run(spark, docs_df):
    """minhash_lsh_incremental(new, corpus_sigs) must find EXACTLY the
    cross-set subset of minhash_lsh_pairs(all docs): same band fold, same
    min-band ownership, same sim — the increment never misses a pair the
    batch run would find, and never invents one. New = the planted
    mutated twins (ids 1000+), corpus = everything else."""
    new = docs_df.where(F.col("doc_id") >= 1000)
    corpus = docs_df.where(F.col("doc_id") < 1000)
    corpus_sig = dedup.minhash_signatures(corpus)
    inc = {(r.new_id, r.corpus_id): r.sim
           for r in dedup.minhash_lsh_incremental(
               new, corpus_sig, threshold=0.35).collect()}
    full = dedup.minhash_lsh_pairs(docs_df, threshold=0.35)
    cross = {(r.id_b, r.id_a): r.sim for r in full.collect()
             if r.id_b >= 1000 and r.id_a < 1000}
    assert inc == cross
    # every planted twin is caught against its source
    for a, b in PLANTED:
        assert (b, a) in inc, f"incremental missed planted ({b},{a})"
    # and no corpus x corpus / new x new pair leaked through
    assert all(n >= 1000 and c < 1000 for n, c in inc)


def test_dup_window_stats_planted(spark, docs_df):
    """Duplicate-substring fraction vs a brute-force Python twin on the
    planted corpus: exact dup pairs (0,2000)/(1,2001) must be fully
    duplicated (dup_frac 1.0), and every doc's counts must equal the
    exact window-frequency computation."""
    got = {r.id: (r.n_windows, r.n_dup, r.dup_frac)
           for r in dedup.dup_window_stats(docs_df, window=10).collect()}

    from collections import Counter
    wins_of = {}
    freq = Counter()
    for i, t in DOCS:
        w = t.split()
        wins = [" ".join(w[j:j + 10]) for j in range(len(w) - 9)]
        wins_of[i] = wins
        freq.update(wins)
    for i, _ in DOCS:
        wins = wins_of[i]
        n_dup = sum(1 for x in wins if freq[x] >= 2)
        frac = round(n_dup / len(wins), 4) if wins else 0.0
        assert got[i] == (len(wins), n_dup, frac), (i, got[i])
    assert got[2000][2] == 1.0 and got[2001][2] == 1.0
    assert got[0][2] == 1.0  # the source of an exact dup is itself 100% dup

"""Seeded-batch lockstep proofs for the round-5 text operators: the Spark
implementations of contamination (c4) and repetition_stats (t6) vs
brute-force pure-Python twins over randomized short texts — small vocab
so repetitions, bigram collisions and the <3-word / <2-word / empty /
whitespace-quirk fallback branches all occur, in ONE Spark job each
(the test_urls_property pattern)."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from louis_crawler_legacy_spark.operators import dedup, textstats

_VOCAB = ["aa", "bb", "cc", "dd", "e.e", "f"]


def _random_text(rnd: random.Random) -> str:
    n = rnd.randrange(0, 9)
    words = [rnd.choice(_VOCAB) for _ in range(n)]
    sep = rnd.choice([" ", "  ", " \t "])
    body = sep.join(words)
    return rnd.choice(["", " "]) + body + rnd.choice(["", " ", "  "])


def _words(t: str) -> list[str]:
    # exact twin of textstats.words_col / dedup.shingles word split:
    # trim, then split on \s+ ('' → [''], like Spark's split)
    return re.split(r"\s+", t.strip())


def _py_shingles(t: str) -> set[str]:
    w = _words(t)
    if len(w) >= 3:
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
    return {t.strip()}


def test_contamination_matches_brute_force(spark):
    rnd = random.Random(20260818)
    corpus = [(i, _random_text(rnd)) for i in range(200)]
    ev = [(1000 + i, _random_text(rnd)) for i in range(20)]
    cdf = spark.createDataFrame(corpus, ["doc_id", "text"])
    edf = spark.createDataFrame(ev, ["doc_id", "text"])
    got = {r.doc_id: r.n_shared
           for r in dedup.contamination(cdf, edf).collect()}

    ev_sh = set().union(*(_py_shingles(t) for _, t in ev))
    want = {}
    for i, t in corpus:
        n = len(_py_shingles(t) & ev_sh)
        if n >= 1:
            want[i] = n
    assert got == want


def test_repetition_stats_match_brute_force(spark):
    rnd = random.Random(20260819)
    docs = [(i, _random_text(rnd)) for i in range(300)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.id: (r.dup_word_frac, r.top_bigram_frac)
           for r in textstats.repetition_stats(df).collect()}

    for i, t in docs:
        w = _words(t)
        dup = round(1.0 - len(set(w)) / max(len(w), 1), 4)
        grams = [" ".join(w[j : j + 2]) for j in range(len(w) - 1)]
        if grams:
            top = max(grams.count(g) for g in set(grams))
            frac = round(top / len(grams), 4)
        else:
            frac = 0.0
        assert got[i] == (dup, frac), (i, t, got[i], (dup, frac))

"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

Everything here is a NATIVE column expression (whole-stage codegen, no
Python): at 100 TB these run inside the parquet scan stage with zero
shuffle. Each has an exact DuckDB-SQL oracle in plans/driver_queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish token pattern: alnum runs or single non-space symbols (matches the
# tokenizer fallback's piece regex, functions/tokenizer.py)
BPE_TOKEN_RE = r"[A-Za-z0-9]+|[^\sA-Za-z0-9]"

# tiny per-language stopword sets for the n-gram/stopword language heuristic
LANG_STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "is"),
    "fr": ("le", "la", "les", "des", "et", "est"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "los", "las", "es", "y", "una"),
}
# deterministic priority for score ties
LANG_PRIORITY = ("en", "fr", "de", "es")

FINGERPRINT_MOD = 1_000_000_007


def words_col(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words_col(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish regex token count."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0)))


def _stopword_pattern(lang: str) -> str:
    return r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"


def lang_scores(text: Column) -> dict[str, Column]:
    lowered = F.lower(text)
    return {
        lang: F.size(
            F.regexp_extract_all(lowered, F.lit(_stopword_pattern(lang)), F.lit(0))
        )
        for lang in LANG_PRIORITY
    }


def lang_id(text: Column) -> Column:
    """Stopword-count language ID with deterministic tie-break
    (LANG_PRIORITY order — earlier language wins ties)."""
    scores = lang_scores(text)
    best = scores[LANG_PRIORITY[0]]
    for lang in LANG_PRIORITY[1:]:
        best = F.greatest(best, scores[lang])
    # when-chain in priority order: first lang whose score == max wins ties
    expr = None
    for lang in LANG_PRIORITY:
        cond = scores[lang] == best
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr


def punct_ratio(text: Column) -> Column:
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\sA-Za-z0-9]"), F.lit(0)))
    return n_punct / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    n_stop = F.size(
        F.regexp_extract_all(F.lower(text), F.lit(_stopword_pattern(lang)), F.lit(0))
    )
    return n_stop / F.greatest(token_count_ws(text), F.lit(1))


def quality_score(text: Column) -> Column:
    """Length/punctuation/stopword quality heuristic ∈ [0,1]:
    0.4·min(words/100,1) + 0.3·(1−punct_ratio) + 0.3·min(stop_ratio·5,1)."""
    w = token_count_ws(text)
    len_part = F.least(w / F.lit(100.0), F.lit(1.0)) * 0.4
    punct_part = (F.lit(1.0) - punct_ratio(text)) * 0.3
    stop_part = F.least(stopword_ratio(text) * 5.0, F.lit(1.0)) * 0.3
    return F.round(len_part + punct_part + stop_part, 4)


def fingerprint(text: Column) -> Column:
    """Order-sensitive rolling hash over words:
    fold(acc·31 + ascii(first char)·7 + len(word)) mod 1e9+7.
    Deliberately expressible in both Spark and DuckDB so the oracle checks
    exact values (a content fingerprint for incremental recrawl dedup)."""
    return F.aggregate(
        words_col(text),
        F.lit(0).cast("long"),
        lambda acc, w: (acc * 31 + F.ascii(w) * 7 + F.length(w)) % FINGERPRINT_MOD,
    )


# --- DuckDB oracle fragments (kept adjacent so they evolve together) --------

ORACLE_TOKEN_WS = r"len(string_split_regex(trim(text), '\s+'))"
ORACLE_TOKEN_BPE = r"len(regexp_extract_all(text, '[A-Za-z0-9]+|[^\sA-Za-z0-9]'))"


def oracle_lang_scores() -> dict[str, str]:
    return {
        lang: rf"len(regexp_extract_all(lower(text), '\b({'|'.join(LANG_STOPWORDS[lang])})\b'))"
        for lang in LANG_PRIORITY
    }


def oracle_lang_id() -> str:
    s = oracle_lang_scores()
    best = f"greatest({s['en']}, {s['fr']}, {s['de']}, {s['es']})"
    return (
        f"CASE WHEN {s['en']} = {best} THEN 'en' "
        f"WHEN {s['fr']} = {best} THEN 'fr' "
        f"WHEN {s['de']} = {best} THEN 'de' "
        f"ELSE 'es' END"
    )


ORACLE_PUNCT_RATIO = (
    r"len(regexp_extract_all(text, '[^\sA-Za-z0-9]'))"
    r" / greatest(len(text), 1)"
)
ORACLE_STOPWORD_RATIO = (
    rf"len(regexp_extract_all(lower(text), '\b({'|'.join(LANG_STOPWORDS['en'])})\b'))"
    rf" / greatest({ORACLE_TOKEN_WS}, 1)"
)
ORACLE_QUALITY = (
    f"round(least({ORACLE_TOKEN_WS} / 100.0, 1.0) * 0.4"
    f" + (1.0 - {ORACLE_PUNCT_RATIO}) * 0.3"
    f" + least({ORACLE_STOPWORD_RATIO} * 5.0, 1.0) * 0.3, 4)"
)
ORACLE_FINGERPRINT = (
    r"list_reduce(list_prepend(CAST(0 AS BIGINT), "
    r"list_transform(string_split_regex(trim(text), '\s+'), "
    r"w -> CAST(ascii(w) * 7 + len(w) AS BIGINT))), "
    rf"(acc, v) -> (acc * 31 + v) % {FINGERPRINT_MOD})"
)


# --- repetition / boilerplate (Gopher-style quality signals) -----------------
# Rae et al. 2021 (Gopher, §A1.1) filter docs by repeated-content fractions;
# these are the two workhorse signals. dup_word_frac is a pure column
# expression (zero shuffle); top_bigram_frac needs a per-(doc,gram) count,
# done as explode → ONE partial+final hash aggregate (the build rule:
# explode+aggregate, never an O(n²) nested HOF lambda) → per-doc max/sum.

def dup_word_frac(text: Column) -> Column:
    """Fraction of word occurrences repeating an earlier word:
    1 − distinct/total. Native; runs inside the scan stage."""
    w = words_col(text)
    return F.round(
        F.lit(1.0)
        - F.size(F.array_distinct(w)) / F.greatest(F.size(w), F.lit(1)),
        4,
    )


def bigrams_col(text: Column) -> Column:
    """Word 2-grams in order, NON-distinct (frequency matters here, unlike
    dedup.shingles). <2-word texts → empty array. The word array is bound
    once per row (dedup.bind_once) — HOF lambdas are interpreted, so the
    r05 form re-split the text at every element_at call (O(words²))."""
    from louis_crawler_legacy_spark.operators.dedup import bind_once

    def body(w: Column) -> Column:
        n = F.size(w) - 1
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i), F.element_at(w, i + 1)
            ),
        )
        return F.when(n >= 1, grams).otherwise(
            F.array().cast("array<string>")
        )

    return bind_once(words_col(text), body)


def repetition_stats(
    df, id_col: str = "doc_id", text_col: str = "text"
):
    """Per-doc repetition report: (id, dup_word_frac, top_bigram_frac)
    where top_bigram_frac = occurrences of the doc's most frequent word
    2-gram / total 2-grams (0.0 for <2-word docs).

    Scale: the (id, gram) count aggregate is map-side combined — the
    shuffle carries partial counts, not one row per token position — and
    is keyed on (id, xxhash64(gram)): per-doc bigrams are mostly unique,
    so partial aggregation barely compacts them and the r05 plan moved
    the raw gram strings (~corpus text bytes) through the exchange; the
    8-byte hash is ~1x the id column instead (the d8 argument — a 64-bit
    collision WITHIN one document would merge two bigrams' counts,
    probability ~k²/2^65 per doc, ≪1 at any document size). The per-doc
    max/sum reuses the same hash-partitioning on id, and the final join
    back to the doc spine is keyed by id only (no text moves).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        dup_word_frac(F.col(text_col)).alias("dup_word_frac"),
        bigrams_col(F.col(text_col)).alias("grams"),
    )
    counts = (
        base.select("id", F.explode("grams").alias("g"))
        .select("id", F.xxhash64("g").alias("gh"))
        .groupBy("id", "gh")
        .agg(F.count("*").alias("c"))
    )
    per_doc = counts.groupBy("id").agg(
        F.max("c").alias("top"), F.sum("c").alias("tot")
    )
    return (
        base.select("id", "dup_word_frac")
        .join(per_doc, "id", "left")
        .select(
            "id",
            "dup_word_frac",
            F.coalesce(
                F.round(F.col("top") / F.col("tot"), 4), F.lit(0.0)
            ).alias("top_bigram_frac"),
        )
    )


ORACLE_DUP_WORD_FRAC = (
    r"round(1.0 - len(list_distinct(string_split_regex(trim(text), '\s+')))"
    r"::DOUBLE / greatest(len(string_split_regex(trim(text), '\s+')), 1), 4)"
)

"""Property-based lockstep proof for the frontier URL-normalization twins.

functions/urls.py ships THREE implementations of the reference's
normalize (requests.py:4-20): the native column expression (the hot
path), the pure-Python twin (simulator/oracles), and the vectorized
pandas twin (pandas-UDF pipelines). test_urls pins all three on the
13-case table; this file drives the py and pd twins through randomized
hrefs (hypothesis) and the NATIVE expression through a seeded batch in
one Spark job, so a semantics drift in any one twin — strip order,
pdf-before-strip, relative resolution, vhost rewrite — fails loudly
instead of surfacing as an engine-vs-simulator crawl mismatch later.
"""

from __future__ import annotations

import random

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from louis_crawler_legacy_spark.functions.urls import (
    normalize_frontier_pd,
    normalize_frontier_py,
    normalize_frontier_url,
)

# hrefs the reference actually sees: absolute, relative, fragments,
# queries, scheme-less junk, mailto/javascript, pdf suffixes — plus the
# vhost-rewrite source hosts so the rewrite path is exercised
_PREFIXES = (
    "", "/", "http://", "https://", "//", "mailto:", "javascript:",
    "http://h.ca/", "https://www.inspection.gc.ca/", "https://inspection.gc.ca/",
)
_SUFFIXES = ("", "pdf", ".pdf", "#frag", "?q=1", "#a?b", "?a#b")
_BODY_CHARS = "ab/.-_1#?é"

_href_st = st.builds(
    lambda p, b, s: p + b + s,
    st.sampled_from(_PREFIXES),
    st.text(alphabet=_BODY_CHARS, min_size=0, max_size=12),
    st.sampled_from(_SUFFIXES),
)
_base_st = st.builds(
    lambda h, p: "http://" + h + "/" + p,
    st.sampled_from(("h.ca", "hub0.ca", "x.ca:8080")),
    st.text(alphabet="ab/._-", min_size=0, max_size=10),
)


@given(href=_href_st, base=_base_st)
@settings(max_examples=500, deadline=None)
def test_python_and_pandas_twins_agree(href, base):
    want = normalize_frontier_py(href, base)
    got = normalize_frontier_pd(pd.Series([href]), pd.Series([base]))[0]
    # pandas uses NaN/None interchangeably for the skip marker
    assert (got if not pd.isna(got) else None) == want, (href, base)


def test_native_expr_matches_python_twin(spark):
    """Native column expression vs the Python twin over a seeded random
    batch (same distribution as the hypothesis strategies) in ONE job."""
    rnd = random.Random(20260818)
    cases = []
    for i in range(600):
        href = (
            rnd.choice(_PREFIXES)
            + "".join(rnd.choice(_BODY_CHARS) for _ in range(rnd.randrange(0, 12)))
            + rnd.choice(_SUFFIXES)
        )
        base = (
            "http://"
            + rnd.choice(("h.ca", "hub0.ca", "x.ca:8080"))
            + "/"
            + "".join(rnd.choice("ab/._-") for _ in range(rnd.randrange(0, 10)))
        )
        cases.append((i, href, base))
    df = spark.createDataFrame(cases, ["i", "href", "base"])
    import pyspark.sql.functions as F

    got = {
        r.i: r.norm
        for r in df.select(
            "i",
            normalize_frontier_url(F.col("href"), F.col("base")).alias("norm"),
        ).collect()
    }
    for i, href, base in cases:
        want = normalize_frontier_py(href, base)
        assert got[i] == want, (
            f"native != python twin for href={href!r} base={base!r}: "
            f"{got[i]!r} != {want!r}"
        )

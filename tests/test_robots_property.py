"""Property-based lockstep proof for the RFC 9309 robots evaluators.

The engine ships TWO robots evaluators that must agree byte-for-byte —
the native Spark fold (politeness.robots_disallowed_expr over
pre-translated regexes) and the simulator's Python twin
(robots_blocked_py) — and both share ONE normalization path
(normalize_rules / pattern_regex), so a bug in the shared translation
would slip past any twin-vs-twin comparison (r4 ADVICE). The 17
hand-derived literal cases in driver_queries close that for the driver
gate; this file generalizes it: both evaluators are pinned against a
third, INDEPENDENT evaluator written directly from RFC 9309 §2.2.2
using a backtracking character matcher — no regex, no shared code.

Independent semantics (the spec, restated): a pattern matches the URL's
path?query target as a prefix; '*' spans any run of characters
(including empty); a trailing '$' anchors the match at the end of the
target ('$' elsewhere is literal); among matching rules the LONGEST
pattern in utf-8 octets wins; on a length tie Allow wins; no matching
rule means allowed.
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from louis_crawler_legacy_spark.operators.politeness import (
    normalize_rules,
    robots_blocked_py,
    robots_filter,
    rules_type,
)


# -- independent evaluator (no regex, nothing shared with the package) --------


def _indep_matches(pattern: str, target: str) -> bool:
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    segs = body.split("*")
    if not target.startswith(segs[0]):
        return False

    def rec(rest_segs: list[str], s: str) -> bool:
        if not rest_segs:
            return s == "" if anchored else True
        seg, start = rest_segs[0], 0
        while True:
            i = s.find(seg, start)
            if i < 0:
                return False
            if rec(rest_segs[1:], s[i + len(seg):]):
                return True
            start = i + 1

    return rec(segs[1:], target[len(segs[0]):])


def _indep_blocked(target: str, rules: list[tuple[bool, str]]) -> bool:
    best_len, best_allow = -1, True
    for allow, pattern in rules:
        if _indep_matches(pattern, target):
            plen = len(pattern.encode("utf-8"))
            if plen > best_len or (plen == best_len and allow):
                best_len, best_allow = plen, allow
    return not best_allow


# hand-checked sanity of the independent matcher itself, so a bug in it
# can't silently validate the twins
def test_independent_matcher_sanity():
    assert _indep_matches("/a*b$", "/aXbYb")  # '*' must backtrack to the last b
    assert not _indep_matches("/a*b$", "/aXbY")
    assert _indep_matches("", "/anything")  # empty pattern: universal prefix
    assert _indep_matches("*", "/anything")
    assert _indep_matches("$", "")  # '$' alone: empty target only
    assert not _indep_matches("$", "/x")
    assert _indep_matches("/p.g", "/p.g")  # '.' is literal, not a wildcard
    assert not _indep_matches("/p.g", "/pXg")
    assert _indep_blocked("/x", [(False, "/"), (True, "/x")]) is False  # longest wins
    assert _indep_blocked("/x", [(False, "/x"), (True, "/x")]) is False  # tie: allow
    assert _indep_blocked("/x", []) is False


# pattern alphabet deliberately loaded with regex metacharacters (the
# translation under test) + a 2-octet char ('é') to stress the octet
# specificity measure; target alphabet restricted to chars that survive
# urlparse/parse_url path extraction unchanged
_PATTERN_CHARS = "/ab.+?()[]{}^|\\*$-é"
_PATH_CHARS = "/ab.()$*-_~"

_rules_st = st.lists(
    st.tuples(
        st.booleans(),
        st.text(alphabet=_PATTERN_CHARS, min_size=0, max_size=12),
    ),
    min_size=0,
    max_size=8,
)
_path_st = st.text(alphabet=_PATH_CHARS, min_size=0, max_size=16).map(
    lambda s: "/" + s
)
_query_st = st.one_of(
    st.none(), st.text(alphabet="ab=&1", min_size=1, max_size=8)
)


@given(rules=_rules_st, path=_path_st, query=_query_st)
@settings(max_examples=500, deadline=None)
def test_python_twin_matches_independent_rfc_evaluator(rules, path, query):
    url = "http://h.ca" + path + (("?" + query) if query else "")
    target = path + (("?" + query) if query else "")
    got = robots_blocked_py(url, {"h.ca": list(rules)})
    assert got == _indep_blocked(target, list(rules))


def _random_cases(n: int, seed: int):
    """Seeded random (host, path, query, rules) cases for the one-job
    Spark comparison — same distribution as the hypothesis strategies."""
    rnd = random.Random(seed)
    cases = []
    for i in range(n):
        path = "/" + "".join(
            rnd.choice(_PATH_CHARS) for _ in range(rnd.randrange(0, 14))
        )
        query = (
            "".join(rnd.choice("ab=&1") for _ in range(rnd.randrange(1, 7)))
            if rnd.random() < 0.3
            else None
        )
        rules = [
            (
                rnd.random() < 0.5,
                "".join(
                    rnd.choice(_PATTERN_CHARS)
                    for _ in range(rnd.randrange(0, 10))
                ),
            )
            for _ in range(rnd.randrange(0, 7))
        ]
        # ~10% of hosts have no robots row at all (NULL rules after the
        # left join — must mean allowed)
        has_row = rnd.random() >= 0.1
        cases.append((f"h{i}.ca", path, query, rules, has_row))
    return cases


def test_native_expr_matches_independent_rfc_evaluator(spark):
    """The FULL native path — parse_url target extraction, the
    pre-translated regexp_like match, and the longest/allow fold — against
    the independent evaluator, 400 randomized hosts in ONE Spark job."""
    cases = _random_cases(400, seed=20260818)
    cand_rows = [
        (host + "|" + path + (("?" + q) if q else ""),
         "http://" + host + path + (("?" + q) if q else ""),
         host)
        for host, path, q, _rules, _has in cases
    ]
    cand = spark.createDataFrame(cand_rows, ["key", "url", "host"])
    robots_rows = [
        (host, normalize_rules(rules))
        for host, _path, _q, rules, has_row in cases
        if has_row
    ]
    import pyspark.sql.types as T

    robots = spark.createDataFrame(
        robots_rows,
        T.StructType(
            [
                T.StructField("host", T.StringType()),
                T.StructField("rules", rules_type()),
            ]
        ),
    )
    kept = {
        r.key for r in robots_filter(cand, robots, url_col="url").collect()
    }
    for host, path, q, rules, has_row in cases:
        key = host + "|" + path + (("?" + q) if q else "")
        target = path + (("?" + q) if q else "")
        want_kept = (not has_row) or not _indep_blocked(target, rules)
        assert (key in kept) == want_kept, (
            f"native != independent for host={host} target={target!r} "
            f"rules={rules!r} has_row={has_row}"
        )

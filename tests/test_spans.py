"""Span-sequence equality (kind, text, media_ref, order) — the per-row
invariant from BASELINE.json input_hint."""

from __future__ import annotations

from louis_crawler_legacy_spark.functions.tokenizer import StableHashEncoder
from louis_crawler_legacy_spark.operators import spans as spans_mod

ENC = StableHashEncoder()


def _page(i: int) -> tuple[int, str, str]:
    words = " ".join(f"p{i}w{j % 53}" for j in range(120 + i * 30))
    html = (
        f"<html><head><title>Page {i}</title></head><body>\n"
        f"<h1>Head {i}</h1>\n<p>{words}</p>\n"
        f'<a href="/child/{i}/a">A</a>\n'
        f'<a href="/doc{i}.pdf">PDF</a>\n'
        f'<a href="#frag">skip</a>\n'
        f'<a href="https://other.ca/x">X</a>\n'
        "</body></html>"
    )
    return i, html, f"http://site.ca/page/{i}"


def test_build_spans_structure():
    _, html, url = _page(1)
    spans = spans_mod.build_spans_py(html, url, ENC)
    kinds = [s["kind"] for s in spans]
    assert kinds == ["text", "link", "media", "link"]
    assert [s["offset"] for s in spans] == [0, 1, 2, 3]
    assert spans[1]["media_ref"] == "http://site.ca/child/1/a"
    assert spans[2]["media_ref"] == "http://site.ca/doc1.pdf"  # stored, not scheduled
    assert spans[3]["media_ref"] == "https://other.ca/x"
    assert spans[0]["text"].startswith("Head 1")  # body-level chunk text


def test_spark_spans_equal_python(spark):
    pages = [_page(i) for i in range(5)]
    df = spark.createDataFrame(pages, ["doc_id", "html", "url"])
    got = {
        r.doc_id: [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        for r in spans_mod.docs_to_spans(df).collect()
    }
    for doc_id, html, url in pages:
        want = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in spans_mod.build_spans_py(html, url, ENC)
        ]
        assert got[doc_id] == want, f"span-sequence mismatch for doc {doc_id}"


def test_frontier_candidates_exclude_media(spark):
    pages = [_page(i) for i in range(3)]
    df = spans_mod.docs_to_spans(
        spark.createDataFrame(pages, ["doc_id", "html", "url"])
    )
    cands = spans_mod.frontier_candidates_from_spans(df).collect()
    urls = [r.url for r in cands]
    assert all(not u.endswith(".pdf") for u in urls)
    assert len(urls) == 6  # 2 link spans per page


def test_spans_from_extracted_equals_docs_to_spans(spark):
    """The crawl-path builder (already-extracted content/children) must be
    bit-identical to docs_to_spans over the raw page — including pages with
    <main> junk, where both must chunk the CLEANED content and drop links
    inside dropped junk."""
    from louis_crawler_legacy_spark.functions.extract import extract_page_fields
    from louis_crawler_legacy_spark.sources import corpus as corpus_mod

    corpus = corpus_mod.generate_corpus(
        seed=7, n_hosts=2, pages_per_host=4, links_per_page=4
    )
    pages = [(c["url"], c["html"], c["url"]) for c in corpus if c["status"] == 200][:6]
    raw = spark.createDataFrame(pages, ["doc_id", "html", "url"])
    want = {
        r.doc_id: [tuple(s) for s in r.spans]
        for r in spans_mod.docs_to_spans(raw).collect()
    }

    ext_rows = []
    for url, html, _ in pages:
        f = extract_page_fields(html, url, None)
        ext_rows.append((url, f["content"], f["children"]))
    ext = spark.createDataFrame(ext_rows, ["doc_id", "content", "children"])
    got = {
        r.doc_id: [tuple(s) for s in r.spans]
        for r in spans_mod.spans_from_extracted(ext).collect()
    }
    assert got == want

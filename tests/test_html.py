"""DOM + page-extraction tests (reference goldie.py semantics)."""

from __future__ import annotations

from louis_crawler_legacy_spark.functions import htmlx

PAGE = """
<html><head><title>  My   Page\t Title </title></head>
<body>
<nav>site nav</nav>
<main>
  <!-- a comment -->
  <h1>Welcome</h1>
  <aside>junk aside</aside>
  <script>var x = 1;</script>
  <div class="pagedetails">details junk</div>
  <div class="nojs-hide">nojs junk</div>
  <div class="alert">alert junk</div>
  <p>Main   content here.</p>
  <time>2024-01-02</time>
  <a href="/a">A</a>
  <a href="#frag">skip</a>
  <a href="mailto:x@y.z">skip</a>
  <a href="b/rel">Rel</a>
  <a href="/a">dup</a>
  <a href="https://other.ca/x?q=1">Q</a>
</main>
<footer>footer junk</footer>
</body></html>
"""


def test_extract_title():
    assert htmlx.extract_title(PAGE) == "My Page Title"


def test_extract_last_updated():
    assert htmlx.extract_last_updated(PAGE) == "2024-01-02"


def test_clean_drops_junk():
    cleaned = htmlx.clean_html(PAGE)
    for junk in ("junk aside", "var x", "details junk", "nojs junk",
                 "alert junk", "a comment", "site nav", "footer junk"):
        assert junk not in cleaned, junk
    assert "Main content here." in cleaned
    assert cleaned.startswith("<main>")


def test_clean_body_fallback():
    html = "<html><body><p>no main here</p></body></html>"
    assert "no main here" in htmlx.clean_html(html)


def test_extract_children_order_preserving_dedup():
    base = "http://inspection.canada.ca/eng/page/sub"
    kids = htmlx.extract_children(PAGE, base)
    assert kids == [
        "http://inspection.canada.ca/a",
        "http://inspection.canada.ca/eng/page/b/rel",  # urljoin relative
        "https://other.ca/x?q=1",  # children KEEP query strings (P6 vs P8)
    ]


TRAP_PAGE = """
<html><head><title>Trap</title></head>
<body>
<nav>outer nav <a href="/from-outer-nav">keep</a></nav>
<main>
  <h1>H</h1>
  <aside><a href="/from-aside">drop</a></aside>
  <nav><a href="/from-inner-nav">drop</a></nav>
  <footer><a href="/from-inner-footer">drop</a></footer>
  <div class="alert"><a href="/from-alert">drop</a></div>
  <p>body <a href="/from-main">keep</a></p>
</main>
<footer>outer footer <a href="/from-outer-footer">keep</a></footer>
</body></html>
"""


def test_links_inside_dropped_junk_are_not_extracted():
    """Reference order: clean_content_worker mutates the shared tree BEFORE
    a::attr(href) runs (goldie_playwright_parallel.py:162,183) — links inside
    junk dropped from <main> are never crawled; links outside <main> survive
    (drops are scoped to the main selector)."""
    from louis_crawler_legacy_spark.functions.extract import extract_page_fields

    fields = extract_page_fields(TRAP_PAGE, "http://x.ca/page", None)
    assert fields["children"] == [
        "http://x.ca/from-outer-nav",
        "http://x.ca/from-main",
        "http://x.ca/from-outer-footer",
    ]
    assert "from-main" in fields["content"]
    assert "from-aside" not in fields["content"]


def test_body_fallback_drops_nothing():
    """No <main> → reference takes body.get() verbatim (only comments
    removed, goldie_playwright_parallel.py:265-280): junk text AND its links
    survive."""
    from louis_crawler_legacy_spark.functions.extract import extract_page_fields

    html = (
        "<html><body><!-- c --><aside>aside kept "
        '<a href="/aside-link">L</a></aside><p>text</p></body></html>'
    )
    fields = extract_page_fields(html, "http://x.ca/", None)
    assert fields["children"] == ["http://x.ca/aside-link"]
    assert "aside kept" in fields["content"]
    assert "<!--" not in fields["content"]  # comments removed in fallback too


def test_fragment_parse_gets_body():
    soup = htmlx.parse_html("<p>hello</p><p>world</p>")
    assert soup.body.get_text() == "helloworld"
    soup2 = htmlx.parse_html("<title>T</title><p>x</p>")
    assert soup2.title.get_text() == "T"
    assert soup2.body.get_text() == "x"

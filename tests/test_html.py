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


def test_fragment_parse_gets_body():
    soup = htmlx.parse_html("<p>hello</p><p>world</p>")
    assert soup.body.get_text() == "helloworld"
    soup2 = htmlx.parse_html("<title>T</title><p>x</p>")
    assert soup2.title.get_text() == "T"
    assert soup2.body.get_text() == "x"

"""Ported reference spider-output goldens (reference tests/test_goldie.py)
on the reference's own CFIA fixture pages — title extraction, cleaned-main
content, and the stripped-text sequence (span-sequence equality in embryo,
SURVEY §5.1), all through the stdlib DOM."""

from __future__ import annotations

import os

from louis_crawler_legacy_spark.functions import htmlx

_RESP = os.path.join(os.path.dirname(os.path.abspath(__file__)), "responses")


def _fixture(name: str) -> str:
    with open(os.path.join(_RESP, f"{name}.html"), encoding="UTF-8") as f:
        return f.read()


def test_sample1_title_and_content_golden():
    """Reference test_goldie.test_sample1 (:35-50). One documented
    divergence: scrapy's lxml serializer emits `class` before `property`
    on <main> while we keep source attribute order (property, class,
    typeof — verbatim from the fixture); text and structure are identical,
    so the golden is asserted on the source-order form."""
    html = _fixture("1547741756885")
    assert htmlx.extract_title(html) == (
        "Enforcement of the Safe Food for Canadians Regulations - "
        "Canadian Food Inspection Agency"
    )
    cleaned = htmlx.clean_html(html, parallel_variant=False)
    assert cleaned.startswith(
        '<main property="mainContentOfPage" class="container" '
        'typeof="WebPageElement"> <h1 id="wb-cont" property="name">'
        "Enforcement of the <i>Safe Food for Canadians Regulations</i>"
    )
    # goldie emits exactly one item per page with a url — mirrored by the
    # extraction UDF returning one row per page (test_frontier pins the
    # page-per-fetch invariant); here: the cleaned content is non-empty
    assert len(cleaned) > 1000


def test_sample2_parses_and_cleans():
    """Reference test_goldie.test_sample2 (:52-56): the page parses and
    yields one item."""
    html = _fixture("1492029286734")
    from louis_crawler_legacy_spark.functions.extract import extract_page_fields

    fields = extract_page_fields(
        html,
        "https://inspection.canada.ca/food-safety-for-industry/"
        "toolkit-for-food-businesses/understanding-the-sfcr/eng/"
        "1492029195746/1492029286734",
        None,
    )
    assert fields["title"]
    assert fields["content"].startswith("<main")
    assert len(fields["children"]) > 0


def test_organization_structure_text_sequence_golden():
    """Reference test_sample_organization_structure (:58-86), ported
    verbatim: the stripped-text sequence of the cleaned main content —
    the strongest cross-parser check (BeautifulSoup+lxml there, stdlib DOM
    here) and the embryo of span-sequence equality."""
    html = _fixture("1323224814073")
    cleaned = htmlx.clean_html(html, parallel_variant=False)
    soup = htmlx.parse_html(cleaned)
    text_content = [
        n.data.strip()
        for n in soup.root.iter()
        if isinstance(n, htmlx.TextNode) and n.data.strip()
    ]
    assert text_content == [
        "Organizational structure",
        "The Canadian Food Inspection Agency (CFIA) is led by its "
        "President, who reports to the Minister of Health. The CFIA has an "
        "integrated governance structure whereby all branch heads have "
        "specific accountabilities that contribute to the achievement of "
        "each of the CFIA's strategic objectives.",
        "President",
        "Executive Vice-President",
        "Chief officers",
        "Chief Veterinary Officer and Delegate to the World Organisation "
        "for Animal Health",
        "Chief Food Safety Officer",
        "Chief Plant Health Officer",
        "Chief Science Operating Officer and Science Integrity Lead",
        "Chief Scientific Data Officer",
        "Senior management structure",
        "Ministerial mandate letters",
        "Minister of Health mandate letter",
        "Minister of Agriculture and Agri-Food mandate letter",
        "Minister of Innovation, Science and Economic Development mandate "
        "letter",
    ]

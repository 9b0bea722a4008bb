"""Extractor unit + byte-parity tests (BASELINE.md rows 8)."""

import pytest

from graftlink.extract import extract_links, extract_text, normalize_url


def test_text_basic():
    html = b"<html><body><p>Hello <b>world</b></p></body></html>"
    assert extract_text(html) == "Hello world"


def test_text_strips_script_style_comments():
    html = (
        b"<script>var x = '<p>not text</p>';</script>"
        b"<style>p { color: red }</style>"
        b"<!-- hidden -->visible"
    )
    assert extract_text(html) == "visible"


def test_text_entities_and_bom():
    html = b"\xef\xbb\xbf<p>a &amp; b &lt;c&gt;</p>"
    assert extract_text(html) == "a & b <c>"


def test_text_whitespace_crlf():
    html = b"<p>a</p>\r\n\r\n  <p>b\tc</p>"
    assert extract_text(html) == "a b c"


def test_text_latin1_fallback():
    html = b"<p>caf\xe9</p>"  # not valid utf-8
    assert extract_text(html) == "caf\xe9"


def test_text_none_empty():
    assert extract_text(None) == ""
    assert extract_text(b"") == ""


def test_normalize_url():
    assert normalize_url("HTTP://Host.EX/Path?q=1#frag") == "http://host.ex/Path?q=1"
    assert normalize_url("javascript:void(0)") is None
    assert normalize_url("mailto:x@y.z") is None
    assert normalize_url("/relative") is None  # no netloc after normalize
    assert normalize_url("ftp://x.y/z") is None


def test_extract_links():
    base = "https://a.example/dir/page.html"
    html = (
        b'<a href="https://B.example/x">abs</a>'
        b"<a href='other.html'>rel</a>"
        b'<a href="#frag">frag-only</a>'
        b'<a href="javascript:void(0)">js</a>'
        b'<a href=bare.html>bare</a>'
        b'<a href="https://b.example/x#sec">dup after normalize</a>'
    )
    assert extract_links(html, base) == [
        "https://b.example/x",
        "https://a.example/dir/other.html",
        "https://a.example/dir/bare.html",
    ]


def test_extract_links_entity_href():
    base = "https://a.example/"
    html = b'<a href="https://a.example/p?x=1&amp;y=2">e</a>'
    assert extract_links(html, base) == ["https://a.example/p?x=1&y=2"]


@pytest.mark.usefixtures("spark")
def test_pipeline_byte_parity(spark):
    """Stored text == mapInArrow-extracted text, byte-identical per url
    (BASELINE.json:15 invariant)."""
    from graftlink.extract import extract_texts
    from graftlink.gen import synthetic_pages

    pages = synthetic_pages(spark, n_pages=120, seed=7, partitions=4)
    via_spark = extract_texts(pages).withColumnRenamed("text", "text2")
    joined = pages.select("url", "warc_ts", "text").join(
        via_spark.distinct(), "url", "inner"
    )
    rows = joined.collect()
    assert len(rows) > 0
    mismatches = [r for r in rows if r["text"] != r["text2"]]
    # duplicate-snapshot urls have two different htmls -> the distinct
    # text2 join can pair the other snapshot; exclude those urls
    from collections import Counter

    url_counts = Counter(r["url"] for r in pages.select("url").collect())
    real_mismatches = [r for r in mismatches if url_counts[r["url"]] == 1]
    assert real_mismatches == []


def test_generated_text_column_is_extractor_output(spark):
    from graftlink.gen import synthetic_pages
    from graftlink.extract import extract_text

    rows = synthetic_pages(spark, n_pages=60, seed=3, partitions=2).collect()
    for r in rows:
        assert r["text"] == extract_text(r["html"])

"""Text + link extraction from Common-Crawl-style page HTML.

The per-row invariant (BASELINE.json:15) is that extracted `text` is
byte-identical per url whether produced by the standalone pure
function or through the Spark pipeline — so the extractor is a pure
Python function over bytes, unit-testable without Spark, and the
Spark side is only Arrow-batch plumbing (`mapInArrow`, no row-wise
registered UDFs).

Spec (ours — the reference checkout was empty, SURVEY.md header):
- decode: UTF-8 with BOM stripping (utf-8-sig); undecodable bytes
  replaced via latin-1 fallback (never raises).
- drop <script>/<style>/<!-- --> blocks, then all tags.
- unescape HTML entities.
- normalize whitespace: any run of unicode whitespace -> single
  space; strip ends.
Links: every href attribute, resolved against the page url, then
url-normalized (lowercase scheme+host, strip fragment, drop
javascript:/mailto:/data: and empty).
"""

from __future__ import annotations

import html as _html
import re
from collections.abc import Iterator
from urllib.parse import urljoin, urlsplit, urlunsplit

import pyarrow as pa

_SCRIPT_RE = re.compile(rb"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(rb"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")
_HREF_RE = re.compile(
    rb"""<a\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>'"]+))""",
    re.IGNORECASE | re.DOTALL,
)
_BAD_SCHEME_RE = re.compile(r"^(javascript|mailto|data|tel):", re.IGNORECASE)


def _decode(raw: bytes) -> str:
    try:
        return raw.decode("utf-8-sig")
    except UnicodeDecodeError:
        # strip a UTF-8 BOM if present even on the fallback path
        if raw.startswith(b"\xef\xbb\xbf"):
            raw = raw[3:]
        return raw.decode("latin-1")


def extract_text(raw: bytes) -> str:
    """Pure-function text extractor — the byte-parity reference."""
    if raw is None:
        return ""
    stripped = _COMMENT_RE.sub(b" ", _STYLE_RE.sub(b" ", _SCRIPT_RE.sub(b" ", raw)))
    text = _TAG_RE.sub(" ", _decode(stripped))
    text = _html.unescape(text)
    return _WS_RE.sub(" ", text).strip()


def normalize_url(url: str) -> str | None:
    """Lowercase scheme+host, strip fragment; None for junk links."""
    if not url or _BAD_SCHEME_RE.match(url):
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    if parts.scheme not in ("http", "https"):
        return None
    if not parts.netloc:
        return None
    return urlunsplit(
        (parts.scheme.lower(), parts.netloc.lower(), parts.path, parts.query, "")
    )


def extract_links(raw: bytes, base_url: str) -> list[str]:
    """All normalized absolute link targets of a page, document order,
    deduplicated (first occurrence wins)."""
    if raw is None:
        return []
    seen: set[str] = set()
    out: list[str] = []
    for m in _HREF_RE.finditer(raw):
        href_b = m.group(1) or m.group(2) or m.group(3) or b""
        href = _html.unescape(_decode(href_b).strip())
        if not href or href.startswith("#"):
            continue
        try:
            absolute = urljoin(base_url, href)
        except ValueError:
            continue
        norm = normalize_url(absolute)
        if norm is not None and norm not in seen:
            seen.add(norm)
            out.append(norm)
    return out


# ---------------------------------------------------------------------------
# Spark plumbing (Arrow batches in/out; the loop below is over an Arrow
# batch inside the vectorized-UDF worker, not a row-wise registered UDF)
# ---------------------------------------------------------------------------

EDGES_STR_SCHEMA = "src_url string, dst_url string"
TEXT_SCHEMA = "url string, text string"


def _edges_kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        src: list[str] = []
        dst: list[str] = []
        for u, h in zip(urls, htmls):
            for target in extract_links(h, u):
                src.append(u)
                dst.append(target)
        yield pa.RecordBatch.from_arrays(
            [pa.array(src, pa.string()), pa.array(dst, pa.string())],
            ["src_url", "dst_url"],
        )


def _text_kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        urls = batch.column("url")
        htmls = batch.column("html").to_pylist()
        texts = pa.array([extract_text(h) for h in htmls], pa.string())
        yield pa.RecordBatch.from_arrays([urls, texts], ["url", "text"])


def extract_edges(pages):  # pages: DF[url, warc_ts, html, text, lang]
    """pages -> DF[src_url, dst_url] (E3).

    Dedups snapshots first (latest warc_ts per url, E19) so each url
    contributes exactly one outlink set; link-level dedup is inside
    extract_links (per page) plus a global dropDuplicates (E17).
    """
    from graftlink.sources import latest_snapshot

    latest = latest_snapshot(pages).select("url", "html")
    return latest.mapInArrow(_edges_kernel, EDGES_STR_SCHEMA).dropDuplicates(
        ["src_url", "dst_url"]
    )


def extract_texts(pages):
    """pages -> DF[url, text] via the same pure function (parity tests)."""
    return pages.select("url", "html").mapInArrow(_text_kernel, TEXT_SCHEMA)

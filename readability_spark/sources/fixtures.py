"""Fixture corpus loader: the reference's golden test pages → tables.

Reads ``test/test-pages/<case>/{source.html,expected.html,
expected-metadata.json}`` from the reference checkout (read-only, data not
code) and exposes them as python records / parquet, shaped per FIXTURES.md:

- input rows:  (url, warc_ts, html, text, lang)        — BASELINE.json input_hint
- oracle rows: (url, expected_text, expected_html, title, byline, ...)

Every end-to-end test parses with the reference's fixed document URL scheme
``http://fakehost/test/page.html`` (test/SampleTests.cs:37).
"""

from __future__ import annotations

import datetime as dt
import json
import os
from pathlib import Path
from typing import Iterator, Optional

REFERENCE_TEST_PAGES = Path(
    os.environ.get("READABILITY_TEST_PAGES", "/root/reference/test/test-pages")
)
REFERENCE_SAMPLE_TESTS = Path(
    os.environ.get("READABILITY_SAMPLE_TESTS", "/root/reference/test/SampleTests.cs")
)

FIXED_PAGE_URL = "http://fakehost/test/page.html"
EPOCH = dt.datetime(2025, 4, 4, tzinfo=dt.timezone.utc)

# The subset of the reference's elected-path goldens the token-density finder
# reproduces byte-for-byte (tests/test_tokenfinder_parity.py pins this list;
# the oracle-checked `tokenfinder_real_paths` query probes it end to end).
TOKENFINDER_MATCHED_PAGES = [
    '001', '002', '003-metadata-preferred',
    '004-metadata-space-separated-properties', '005-unescape-html-entities',
    'aclu', 'aktualne', 'archive-of-our-own', 'article-author-tag',
    'base-url', 'base-url-base-element', 'base-url-base-element-relative',
    'basic-tags-cleaning', 'bbc-1', 'blogger', 'buzzfeed-1', 'cnet',
    'comment-inside-script-parsing', 'daringfireball-1', 'data-url-image',
    'dev418', 'ebb-org', 'embedded-videos', 'firefox-nightly-blog',
    'gitlab-blog', 'google-sre-book-1', 'guardian-1', 'hukumusume', 'iab-1',
    'ietf-1', 'keep-images', 'keep-tabular-data', 'la-nacion',
    'lazy-image-1', 'lazy-image-2', 'lazy-image-3', 'lemonde-1',
    'liberation-1', 'lifehacker-post-comment-load', 'lifehacker-working',
    'links-in-tables', 'medicalnewstoday', 'medium-1', 'medium-2',
    'medium-3', 'mercurial', 'metadata-content-missing', 'mozilla-2', 'msn',
    'normalize-spaces', 'nytimes-2', 'nytimes-3', 'nytimes-4',
    'parsely-metadata', 'pixnet', 'qq', 'remove-aria-hidden',
    'remove-extra-brs', 'remove-extra-paragraphs', 'remove-script-tags',
    'reordering-paragraphs', 'replace-brs', 'replace-font-tags',
    'royal-road', 'rtl-1', 'rtl-2', 'rtl-3', 'rtl-4',
    'schema-org-context-object', 'seattletimes-1', 'simplyfound-1',
    'social-buttons', 'style-tags-removal', 'svg-parsing',
    'table-style-attributes', 'telegraph', 'theverge',
    'title-and-h1-discrepancy', 'tmz-1', 'toc-missing', 'topicseed-1',
    'tumblr', 'v8-blog', 'videos-1', 'videos-2', 'visibility-hidden',
    'wapo-2', 'webmd-1', 'webmd-2', 'wikia', 'wikipedia-2', 'yahoo-1',
    'yahoo-2', 'infoq.html',
]


def fixture_names() -> list:
    if not REFERENCE_TEST_PAGES.is_dir():
        return []
    return sorted(d.name for d in REFERENCE_TEST_PAGES.iterdir() if (d / "source.html").exists())


def tokenfinder_path_goldens() -> dict:
    """name -> (kind, expected elected path), parsed from the reference's own
    TryFindArticle DataRow expectations (test/SampleTests.cs:287-455 — data,
    not code). kind is 'test-pages' or 'SamplePages'."""
    import re

    if not REFERENCE_SAMPLE_TESTS.exists():
        return {}
    src = REFERENCE_SAMPLE_TESTS.read_text("utf-8-sig")
    out = {}
    block = src.split("TryFindArticle_TestPage_CorrectPath")[0]
    tail = block[block.index('[DataRow("001"'):]
    for m in re.finditer(r'\[DataRow\("([^"]+)", "([^"]*)"\)\]', tail):
        out[m.group(1)] = ("test-pages", m.group(2).strip())
    sample = src.split("TryFindArticle_TestPage_CorrectPath")[1]
    for m in re.finditer(r'\[DataRow\("([^"]+)", "([^"]*)"\)\]', sample):
        out[m.group(1)] = ("SamplePages", m.group(2).strip())
    return out


def load_case(name: str) -> dict:
    d = REFERENCE_TEST_PAGES / name
    source = (d / "source.html").read_bytes()
    expected_html = (d / "expected.html").read_text("utf-8") if (d / "expected.html").exists() else None
    meta = (
        json.loads((d / "expected-metadata.json").read_text("utf-8"))
        if (d / "expected-metadata.json").exists()
        else {}
    )
    return {
        "name": name,
        "url": FIXED_PAGE_URL,
        "source": source,
        "expected_html": expected_html,
        "metadata": meta,
    }


def iter_cases(names: Optional[list] = None) -> Iterator[dict]:
    for name in names or fixture_names():
        yield load_case(name)


def expected_text(case: dict) -> Optional[str]:
    """Canonical extracted text of the golden expected.html (the per-url
    byte-identity invariant; FIXTURES.md §3)."""
    from readability_spark.core.text import canonical_text
    from readability_spark.dom.parser import parse_html

    if case["expected_html"] is None:
        return None
    doc = parse_html(case["expected_html"])
    body = doc.body
    return canonical_text(body) if body is not None else None


def input_rows(replicas: int = 1) -> Iterator[dict]:
    """Rows for the Common-Crawl-shaped input table (FIXTURES.md §2/§4)."""
    from readability_spark.core.text import normalize_spaces
    from readability_spark.dom.parser import parse_html

    i = 0
    names = fixture_names()
    for replica in range(replicas):
        for name in names:
            case = load_case(name)
            doc = parse_html(case["source"])
            html_el = doc.document_element
            lang = html_el.get_attr("lang") if html_el is not None else None
            body = doc.body
            if replica == 0:
                url = f"http://fakehost/test/{name}/page.html"
            else:
                url = f"http://fakehost/bench/{replica}/{name}/page.html"
            yield {
                "url": url,
                "warc_ts": EPOCH + dt.timedelta(seconds=i),
                "html": case["source"],
                "text": normalize_spaces(body.text_content) if body is not None else None,
                "lang": lang,
            }
            i += 1

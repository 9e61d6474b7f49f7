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

FIXED_PAGE_URL = "http://fakehost/test/page.html"
EPOCH = dt.datetime(2025, 4, 4, tzinfo=dt.timezone.utc)


def fixture_names() -> list:
    if not REFERENCE_TEST_PAGES.is_dir():
        return []
    return sorted(d.name for d in REFERENCE_TEST_PAGES.iterdir() if (d / "source.html").exists())


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

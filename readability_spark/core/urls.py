"""URL utilities: base-URL resolution, relative→absolute, data: URL parsing.

Behavioral parity targets: ``Readability/DocumentUrl.cs`` (base resolution from
explicit uri / <base href> / canonical link / og:url; relative resolution) and
``Readability/DataUrl.cs`` (RFC-2397). The JS side simply does
``new URL(uri, baseURI)`` (Readability.js:459-472), which urljoin matches.
"""

from __future__ import annotations

import re
from typing import Optional
from urllib.parse import urljoin, urlparse

_DATA_URL_RE = re.compile(
    r"^data:(?P<mime>[a-zA-Z0-9][a-zA-Z0-9!#$&^_.+-]*/[a-zA-Z0-9][a-zA-Z0-9!#$&^_.+-]*)?"
    r"(?P<params>(?:;[a-zA-Z0-9-]+=[^;,]*)*)"
    r"(?P<b64>;base64)?"
    r",(?P<data>.*)$",
    re.S,
)

_B64_DATA_URL_RE = re.compile(r"^data:\s*([^\s;,]+)\s*;\s*base64\s*,", re.I)


class DataUrl:
    """Parsed RFC-2397 data: URL (mime, params, encoding, payload)."""

    __slots__ = ("mime_type", "params", "encoding", "data")

    def __init__(self, mime_type: str, params: dict, encoding: str, data: str) -> None:
        self.mime_type = mime_type
        self.params = params
        self.encoding = encoding
        self.data = data

    @classmethod
    def try_parse(cls, url: str) -> Optional["DataUrl"]:
        m = _DATA_URL_RE.match(url.strip())
        if m is None:
            return None
        mime = m.group("mime") or ""
        params: dict = {}
        raw_params = m.group("params") or ""
        for part in raw_params.split(";"):
            if "=" in part:
                k, _, v = part.partition("=")
                if k:
                    params[k.strip()] = v
        encoding = "base64" if m.group("b64") else ""
        return cls(mime, params, encoding, m.group("data"))


def is_base64_data_url(url: str) -> Optional[re.Match]:
    return _B64_DATA_URL_RE.match(url)


class DocumentUrl:
    """Base-URL context for resolving a document's relative URLs.

    Resolution order (DocumentUrl.cs:16-42): explicit document URL, overridden
    by ``<base href>`` if present; otherwise a document's canonical
    ``link[rel=canonical]`` / ``meta[property=og:url]``.
    """

    def __init__(self, document_uri: str, base_href: Optional[str] = None) -> None:
        self.document_uri = document_uri
        if base_href:
            self.base_uri = urljoin(document_uri, base_href)
        else:
            self.base_uri = document_uri
        self.has_base_element = bool(base_href)

    @classmethod
    def from_document(cls, doc, explicit_uri: Optional[str] = None) -> Optional["DocumentUrl"]:
        base_href = None
        head = doc.head
        if head is not None:
            for el in head.get_elements_by_tag_name("base"):
                href = el.get_attr("href")
                if href:
                    base_href = href.strip()
                    break
        doc_uri = explicit_uri
        if doc_uri is None:
            # canonical link or og:url (DocumentUrl.cs:155-179)
            for el in doc.get_elements_by_tag_name("link"):
                if (el.get_attr("rel") or "").strip().lower() == "canonical":
                    href = (el.get_attr("href") or "").strip()
                    if href and urlparse(href).scheme in ("http", "https"):
                        doc_uri = href
                        break
            if doc_uri is None:
                for el in doc.get_elements_by_tag_name("meta"):
                    if (el.get_attr("property") or "").strip().lower() == "og:url":
                        content = (el.get_attr("content") or "").strip()
                        if content and urlparse(content).scheme in ("http", "https"):
                            doc_uri = content
                            break
        if doc_uri is None:
            return None
        return cls(doc_uri, base_href)

    def to_absolute(self, uri: str) -> str:
        """Resolve ``uri`` against the base (JS toAbsoluteURI semantics)."""
        if not uri:
            return uri
        # leave hash links alone when there's no <base> redirecting them
        # (Readability.js:461-464)
        if uri.startswith("#") and not self.has_base_element:
            return uri
        if uri.startswith("data:"):
            return uri
        try:
            return urljoin(self.base_uri, uri)
        except ValueError:
            return uri

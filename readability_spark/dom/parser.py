"""Tolerant HTML → DOM parser built on stdlib ``html.parser``.

From-scratch replacement for the external parsers the reference relies on
(Brackets on the C# side, JSDOM on the Mozilla test harness). Implements the
subset of HTML5 tree-construction the fixture corpus exercises:

- void elements, raw-text elements (script/style handled by html.parser's
  CDATA mode — char refs inside are NOT decoded, matching spec),
- implied end tags (p closed by block starts, li/dt/dd/tr/td/th/option chains),
- html/head/body normalization for sloppy or fragment inputs,
- self-closing syntax honored only for void or foreign (svg/math) content,
- entity decoding in text and attribute values (html.parser does both;
  invalid numeric refs map per the HTML5 table, e.g. → U+FFFD).

Charset detection for raw bytes: UTF-8 strict → meta charset sniff →
charset_normalizer fallback → UTF-8 with replacement.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Optional

from readability_spark.dom.node import Comment, Document, Element, Text

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Start tags that imply </p> when a <p> is in (button) scope.
_P_CLOSERS = frozenset(
    (
        "address article aside blockquote details dialog dir div dl fieldset figcaption "
        "figure footer form h1 h2 h3 h4 h5 h6 header hgroup hr main menu nav ol p pre "
        "section summary table ul listing center"
    ).split()
)

# Scope boundaries: never auto-close past these.
_SCOPE_BOUNDARY = frozenset(
    "html body table td th caption applet object marquee template svg math".split()
)

# tag -> (tags it auto-closes, boundary tags for the search)
_AUTO_CLOSE = {
    "li": (frozenset({"li"}), frozenset({"ul", "ol", "menu", "dir"})),
    "dt": (frozenset({"dt", "dd"}), frozenset({"dl"})),
    "dd": (frozenset({"dt", "dd"}), frozenset({"dl"})),
    "tr": (frozenset({"tr", "td", "th"}), frozenset({"table", "thead", "tbody", "tfoot"})),
    "td": (frozenset({"td", "th"}), frozenset({"tr", "table"})),
    "th": (frozenset({"td", "th"}), frozenset({"tr", "table"})),
    "thead": (frozenset({"thead", "tbody", "tfoot", "tr", "td", "th"}), frozenset({"table"})),
    "tbody": (frozenset({"thead", "tbody", "tfoot", "tr", "td", "th"}), frozenset({"table"})),
    "tfoot": (frozenset({"thead", "tbody", "tfoot", "tr", "td", "th"}), frozenset({"table"})),
    "option": (frozenset({"option"}), frozenset({"select", "optgroup", "datalist"})),
    "optgroup": (frozenset({"option", "optgroup"}), frozenset({"select"})),
    "colgroup": (frozenset({"colgroup"}), frozenset({"table"})),
}

_HEAD_CONTENT = frozenset(
    "title meta link base style script noscript template".split()
)

_FOREIGN = frozenset({"svg", "math"})

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.I
)


# Fast-path start-tag recognition (see _TreeBuilder.parse_starttag). Each
# piece is deliberately NARROWER than the stdlib tolerant grammar: a tag the
# fast regex matches is one the stdlib path would consume to the same end
# position with the same (tag, attrs) result; everything else (entities in
# values needing unescape, '>'/'<'/quotes inside values, '='-less chains,
# doubled '=', attribute names with exotic characters, unterminated tags)
# fails the match and takes the stdlib path.
_FAST_ATTR_BODY = (
    r"\s+{o}[a-zA-Z_:][a-zA-Z0-9_:.\-]*{c}"  # simple attribute name
    r"(?:\s*=\s*{o}"
    r"\"[^\"&<]*\""                          # double-quoted, no charrefs
    r"|'[^'&<]*'"                            # single-quoted, no charrefs
    r"|[^\s=>&\"'<]+"                        # unquoted (may include '/')
    r"{c})?"
)
_FAST_STARTTAG = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9.:_\-]*)"
    r"((?:" + _FAST_ATTR_BODY.format(o="(?:", c=")") + r")*)"
    r"\s*(/?)>"
)
_FAST_ATTR = re.compile(_FAST_ATTR_BODY.format(o="(", c=")"))


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.document = Document()
        self.stack: list[Element] = [self.document]
        self._foreign_depth = 0
        # True only while a <head> element is on the open stack — lets
        # _exit_head_if_open early-return without scanning the stack on
        # every start tag (O(depth^2) on deeply nested crawl HTML).
        self._head_open = False

    # -- helpers -----------------------------------------------------------
    def updatepos(self, i: int, j: int) -> int:  # noqa: D102
        # HTMLParser tracks (lineno, offset) for error messages by scanning
        # every consumed span for newlines; nothing here reads positions, and
        # the scan showed up at ~4% of parse time on the golden corpus.
        return j

    def parse_starttag(self, i: int) -> int:
        """Fast path for the overwhelmingly common simple start tag.

        The stdlib implementation runs 4+ regex matches and an unescape per
        tag (check_for_whole_start_tag, tagfind, per-attribute attrfind) —
        ~20% of parse time on the golden corpus. One anchored regex handles
        tags whose attributes are simple (no '&' so unescape is an identity,
        no '>'/'<' inside quoted values, whitespace-separated names); any
        tag it cannot prove simple falls back to the stdlib tolerant path,
        byte-for-byte identical consumption either way (differential test:
        tests/test_parser.py::test_fast_starttag_path_matches_stdlib)."""
        m = _FAST_STARTTAG.match(self.rawdata, i)
        if m is None:
            return super().parse_starttag(i)
        tag = m.group(1)
        if not tag.islower():
            tag = tag.lower()
        self.lasttag = tag
        attrs = []
        raw_attrs = m.group(2)
        if raw_attrs:
            for am in _FAST_ATTR.finditer(raw_attrs):
                name, value = am.group(1, 2)
                if value is not None and value[:1] in "\"'":
                    value = value[1:-1]
                attrs.append((name if name.islower() else name.lower(), value))
        if m.group(3):
            self.handle_startendtag(tag, attrs)
        else:
            self.handle_starttag(tag, attrs)
            if tag in self.CDATA_CONTENT_ELEMENTS:
                self.set_cdata_mode(tag)
        return m.end()

    @property
    def top(self) -> Element:
        return self.stack[-1]

    def _open(self, tag: str, attrs) -> Element:
        el = Element(tag)
        for name, value in attrs:
            name = name.lower()
            if name and name not in el.attrs:
                el.attrs[name] = value if value is not None else ""
        if tag == "svg" or self.top.is_svg:
            el.mark_svg()
        self.top.append_child(el)
        self.stack.append(el)
        if tag in _FOREIGN:
            self._foreign_depth += 1
        elif tag == "head":
            self._head_open = True
        return el

    def _close_top(self) -> None:
        el = self.stack.pop()
        if el.tag == "head":
            self._head_open = False
        if el.tag in _FOREIGN:
            self._foreign_depth -= 1

    def _close_implied(self, tag: str) -> None:
        """Pop elements implied-closed by a new start tag."""
        if tag in _P_CLOSERS:
            # close an open <p> within scope
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i].tag
                if t == "p":
                    while len(self.stack) > i:
                        self._close_top()
                    break
                if t in _SCOPE_BOUNDARY:
                    break
        rule = _AUTO_CLOSE.get(tag)
        if rule is not None:
            closes, boundary = rule
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i].tag
                if t in closes:
                    while len(self.stack) > i:
                        self._close_top()
                    break
                if t in boundary or t in ("html", "body"):
                    break

    def _exit_head_if_open(self) -> None:
        """HTML5 'in head' mode: flow content implies </head> and <body> —
        pages that omit <body> (common in minified crawl HTML) must not
        accumulate their whole article inside <head>."""
        if not self._head_open:
            return
        head_idx = None
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == "head":
                head_idx = i
                break
        if head_idx is None:
            return
        while len(self.stack) > head_idx:
            self._close_top()
        html = self.stack[-1] if self.stack[-1].tag == "html" else self.document.document_element
        if html is None:
            return
        body = None
        for c in html.children:
            if isinstance(c, Element) and c.tag == "body":
                body = c
                break
        if body is None:
            body = Element("body")
            html.append_child(body)
        if self.stack[-1] is html:
            self.stack.append(body)

    # -- HTMLParser hooks -----------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        if (
            self._foreign_depth == 0
            and tag not in _HEAD_CONTENT
            and tag not in ("html", "head")
        ):
            self._exit_head_if_open()
        if tag in ("html", "head", "body"):
            # merge attrs into existing structural element if present
            existing = None
            if tag == "html":
                existing = self.document.document_element
            elif self.document.document_element is not None:
                for c in self.document.document_element.children:
                    if isinstance(c, Element) and c.tag == tag:
                        existing = c
                        break
            if existing is not None:
                for name, value in attrs:
                    name = name.lower()
                    if name and name not in existing.attrs:
                        existing.attrs[name] = value if value is not None else ""
                if existing not in self.stack:
                    # re-enter (e.g. content after a premature </body>)
                    self.stack.append(existing)
                    if tag == "head":
                        self._head_open = True
                return
        if self._foreign_depth == 0:
            self._close_implied(tag)
        el = self._open(tag, attrs)
        if tag in VOID_ELEMENTS and self._foreign_depth == 0:
            self._close_top()

    def handle_startendtag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        if self._foreign_depth > 0 or tag in VOID_ELEMENTS:
            if self._foreign_depth == 0:
                self._close_implied(tag)
            self._open(tag, attrs)
            self._close_top()
        else:
            # HTML semantics: <div/> is just an open tag
            self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                while len(self.stack) > i:
                    self._close_top()
                return
            # don't let a stray end tag close past a scope boundary
            if self.stack[i].tag in _SCOPE_BOUNDARY and tag not in _SCOPE_BOUNDARY:
                return
        # unmatched end tag: ignore

    def handle_data(self, data: str) -> None:
        if not data:
            return
        if self.top.tag == "head" and data.strip():
            self._exit_head_if_open()
        top = self.top
        last = top.children[-1] if top.children else None
        if isinstance(last, Text):
            last.data += data
        else:
            top.append_child(Text(data))

    def handle_comment(self, data: str) -> None:
        # Comments are dropped at parse time (the reference pipeline's parser
        # does the same; no golden fixture contains one, and keeping them
        # would break phrasing-content runs differently than the reference).
        pass

    def handle_decl(self, decl: str) -> None:  # doctype — ignored
        pass

    def unknown_decl(self, data: str) -> None:
        # CDATA sections (foreign content); treat payload as text there.
        if data.startswith("CDATA[") and self._foreign_depth > 0:
            self.handle_data(data[6:])

    def handle_pi(self, data: str) -> None:
        pass


def _normalize_structure(doc: Document) -> None:
    """Ensure the document has html > (head, body) and every stray top-level
    node lands in the right place (light emulation of HTML5 tree construction
    for sloppy/fragment inputs)."""
    html = doc.document_element
    if html is None:
        html = Element("html")
        for child in list(doc.children):
            html.append_child(child)
        doc.append_child(html)
    else:
        # adopt stray siblings of <html> into it
        for child in list(doc.children):
            if child is not html and not isinstance(child, Comment):
                html.append_child(child)

    head = None
    body = None
    for c in html.children:
        if isinstance(c, Element):
            if c.tag == "head" and head is None:
                head = c
            elif c.tag == "body" and body is None:
                body = c
    if head is None:
        head = Element("head")
        html.children.insert(0, head)
        head.parent = html
    if body is None:
        body = Element("body")
        html.append_child(body)

    # distribute stray direct children of <html>
    seen_body = False
    pre_body_idx = 0  # stray pre-<body> content goes at the START of body
    for child in list(html.children):
        if child is head:
            continue
        if child is body:
            seen_body = True
            continue
        if isinstance(child, Comment):
            continue
        if isinstance(child, Text) and not child.data.strip():
            child.remove()
            continue
        if (
            not seen_body
            and isinstance(child, Element)
            and child.tag in _HEAD_CONTENT
        ):
            head.append_child(child)
        elif seen_body:
            body.append_child(child)
        else:
            child.remove()
            body.children.insert(pre_body_idx, child)
            child.parent = body
            pre_body_idx += 1


def parse_html(source: "str | bytes", base_uri: Optional[str] = None) -> Document:
    """Parse an HTML document (str or raw bytes) into a Document tree."""
    if isinstance(source, (bytes, bytearray, memoryview)):
        source = decode_html_bytes(bytes(source))
    builder = _TreeBuilder()
    try:
        builder.feed(source)
        builder.close()
    except Exception:
        # html.parser is robust, but guarantee we never raise on garbage input
        pass
    doc = builder.document
    _normalize_structure(doc)
    doc.base_uri = base_uri
    return doc


def parse_fragment(source: str) -> list:
    """Parse a fragment; returns the list of top-level nodes (detached)."""
    builder = _TreeBuilder()
    builder.feed(source)
    builder.close()
    doc = builder.document
    html = doc.document_element
    roots = list((html or doc).children) if html is not None else list(doc.children)
    out = []
    for node in roots:
        if isinstance(node, Element) and node.tag in ("head", "body"):
            for sub in list(node.children):
                out.append(sub.remove())
        else:
            out.append(node.remove())
    return out


def decode_html_bytes(raw: bytes) -> str:
    """Charset detection: BOM/UTF-8 strict → <meta charset> sniff → best-effort."""
    if raw.startswith(b"\xef\xbb\xbf"):
        return raw[3:].decode("utf-8", "replace")
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        pass
    m = _META_CHARSET_RE.search(raw[:4096])
    if m:
        enc = m.group(1).decode("ascii", "ignore")
        try:
            return raw.decode(enc, "replace")
        except LookupError:
            pass
    try:
        from charset_normalizer import from_bytes

        best = from_bytes(raw).best()
        if best is not None:
            return str(best)
    except Exception:
        pass
    return raw.decode("utf-8", "replace")

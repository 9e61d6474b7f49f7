"""DOM → HTML serialization (innerHTML/outerHTML semantics).

Matches the HTML fragment-serialization algorithm closely enough for the
fixture corpus: text escaped (& < >), attribute values escaped (& "),
void elements unclosed, script/style raw. (Reference sink behavior:
``Readability/DomExtensions.cs:264-417``; the golden expected.html files are
JS innerHTML output, which this follows rather than the C# pretty-printer.)
"""

from __future__ import annotations

from readability_spark.dom.node import Comment, Element, Node, Text
from readability_spark.dom.parser import VOID_ELEMENTS

_RAW_TEXT = frozenset({"script", "style", "xmp", "iframe", "noembed", "noframes", "plaintext"})
# per spec, children of these serialize without escaping
_NO_ESCAPE_PARENT = _RAW_TEXT | {"noscript"}


def _escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\xa0", "&nbsp;")


def _escape_attr(s: str) -> str:
    return s.replace("&", "&amp;").replace('"', "&quot;").replace("\xa0", "&nbsp;")


def _serialize_into(node: Node, out: list, raw_parent: bool) -> None:
    if isinstance(node, Text):
        out.append(node.data if raw_parent else _escape_text(node.data))
    elif isinstance(node, Comment):
        out.append(f"<!--{node.data}-->")
    elif isinstance(node, Element):
        tag = node.tag
        out.append("<")
        out.append(tag)
        for name, value in node.attrs.items():
            out.append(f' {name}="{_escape_attr(value)}"')
        out.append(">")
        if tag in VOID_ELEMENTS:
            return
        raw = tag in _NO_ESCAPE_PARENT
        for child in node.children:
            _serialize_into(child, out, raw)
        out.append(f"</{tag}>")


def inner_html(el: Element) -> str:
    out: list = []
    raw = el.tag in _NO_ESCAPE_PARENT
    for child in el.children:
        _serialize_into(child, out, raw)
    return "".join(out)


def outer_html(el: Element) -> str:
    out: list = []
    _serialize_into(el, out, False)
    return "".join(out)

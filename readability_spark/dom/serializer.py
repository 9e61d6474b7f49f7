"""DOM → HTML serialization (innerHTML/outerHTML semantics).

Matches the HTML fragment-serialization algorithm closely enough for the
fixture corpus: text escaped (& < >), attribute values escaped (& "),
void elements unclosed, script/style raw. (Reference sink behavior:
``Readability/DomExtensions.cs:264-417``; the golden expected.html files are
JS innerHTML output, which this follows rather than the C# pretty-printer.)
"""

from __future__ import annotations

from readability_spark.dom.node import Comment, Element, Text
from readability_spark.dom.parser import VOID_ELEMENTS

_RAW_TEXT = frozenset({"script", "style", "xmp", "iframe", "noembed", "noframes", "plaintext"})
# per spec, children of these serialize without escaping
_NO_ESCAPE_PARENT = _RAW_TEXT | {"noscript"}


def _escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\xa0", "&nbsp;")


def _escape_attr(s: str) -> str:
    return s.replace("&", "&amp;").replace('"', "&quot;").replace("\xa0", "&nbsp;")


def _serialize_nodes(nodes: list, out: list, raw_parent: bool) -> None:
    """Iterative pre-order serialize (explicit work stack — depth-safe for
    pathologically nested crawl HTML). Work items are either a Node paired
    with its parent's raw-text flag, or a close-tag string to emit."""
    stack: list = [(n, raw_parent) for n in reversed(nodes)]
    while stack:
        item = stack.pop()
        if type(item) is str:  # deferred close tag
            out.append(item)
            continue
        node, raw = item
        if isinstance(node, Text):
            out.append(node.data if raw else _escape_text(node.data))
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
                continue
            stack.append(f"</{tag}>")
            child_raw = tag in _NO_ESCAPE_PARENT
            for child in reversed(node.children):
                stack.append((child, child_raw))


def inner_html(el: Element) -> str:
    out: list = []
    _serialize_nodes(el.children, out, el.tag in _NO_ESCAPE_PARENT)
    return "".join(out)


def outer_html(el: Element) -> str:
    out: list = []
    _serialize_nodes([el], out, False)
    return "".join(out)

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


# ---------------------------------------------------------------------------
# C#-reference debug/diagnostic sinks (DomExtensions.cs)
# ---------------------------------------------------------------------------

_TAB = 4


def to_id_string(el: Element) -> str:
    """Reference debug label (DomExtensions.cs:11-39):
    ``name#id."class"`` with each part present only when non-empty."""
    ident, klass = el.id, el.class_name
    if ident and klass:
        return f'{el.tag}#{ident}."{klass}"'
    if ident:
        return f"{el.tag}#{ident}"
    if klass:
        return f'{el.tag}."{klass}"'
    return el.tag


def pretty_html(el: Element) -> str:
    """Reference pretty-printer (DomExtensions.cs:264-417): block elements
    on their own indented lines, inline content indented only at line
    starts, childless tags self-closed, text whitespace-collapsed.
    Iterative (depth-safe) like every other walker here."""
    from readability_spark.core.text import normalize_spaces
    from readability_spark.dom.parser import VOID_ELEMENTS

    # FlowLayout.Block equivalent (kept in sync with tokenfinder.BLOCK_TAGS)
    from readability_spark.core.tokenfinder import BLOCK_TAGS

    out: list = []

    def inline_offset(offset: int) -> None:
        if out and out[-1].endswith(("\n", "\r")):
            out.append(" " * offset)

    def attrs_of(e: Element) -> str:
        parts = []
        for name, value in e.attrs.items():
            parts.append(f'{name}="{value}"' if value else name)
        return " ".join(parts)

    # work items: ("node", node, offset) | ("close", element, offset)
    stack: list = [("node", el, 0)]
    while stack:
        kind, node, offset = stack.pop()
        if kind == "close":
            if node.tag in BLOCK_TAGS:
                if out and not out[-1].endswith(("\n", "\r")):
                    out.append("\n")
                out.append(" " * offset)
            else:
                inline_offset(offset)
            out.append(f"</{node.tag}>")
            if node.tag in BLOCK_TAGS:
                out.append("\n")
            continue
        if isinstance(node, Text):
            inline_offset(offset)
            out.append(normalize_spaces(node.data))
            continue
        if isinstance(node, Comment):
            inline_offset(offset)
            out.append(f"<!--{node.data}-->")
            continue
        if not isinstance(node, Element):
            continue
        attrs = attrs_of(node)
        head = f"<{node.tag} {attrs}" if attrs else f"<{node.tag}"
        if node.children and node.tag not in VOID_ELEMENTS:
            if node.tag in BLOCK_TAGS:
                out.append(" " * offset)
            else:
                inline_offset(offset)
            out.append(head + ">")
            if node.tag in BLOCK_TAGS:
                out.append("\n")
            stack.append(("close", node, offset))
            for c in reversed(node.children):
                stack.append(("node", c, offset + _TAB))
        else:
            # childless or void: self-closing simple element
            if node.tag in BLOCK_TAGS:
                if out and not out[-1].endswith(("\n", "\r")):
                    out.append("\n")
                out.append(" " * offset)
            else:
                inline_offset(offset)
            out.append(head + " />")
            if node.tag in BLOCK_TAGS:
                out.append("\n")
    return "".join(out)

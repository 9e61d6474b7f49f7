"""Inline CSS declaration parsing (parity: ``Readability/Css.cs:21-78``).

Used only by the hidden-node check (display:none / visibility:hidden).
"""

from __future__ import annotations

from typing import Iterator, Tuple


def iter_declarations(style: str) -> Iterator[Tuple[str, str]]:
    """Yield (property, value) pairs from an inline style attribute,
    tolerant of escaped semicolons and missing values."""
    buf = []
    depth = 0
    escaped = False
    decls = []
    for ch in style:
        if escaped:
            buf.append(ch)
            escaped = False
        elif ch == "\\":
            escaped = True
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth = max(0, depth - 1)
            buf.append(ch)
        elif ch == ";" and depth == 0:
            decls.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        decls.append("".join(buf))
    for decl in decls:
        prop, sep, value = decl.partition(":")
        prop = prop.strip().lower()
        if not prop or not sep:
            continue
        yield prop, value.strip()

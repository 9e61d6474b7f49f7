"""Candidate diagnostics: ranked top-candidate paths for one document.

Parity with the reference's candidate probe (`ArtScr/Program.cs:11-51` CLI and
the path-format of `Readability/ElementExtensions.cs:31-60`): path strings
look like ``/div/main/article#id[class]``, with the body rendered as ``/``.
Exposed as an optional debug facility; the per-document top-K heap stays
inside the extraction UDF (SURVEY.md §2.10)."""

from __future__ import annotations

from typing import Optional

from readability_spark.dom.node import Element
from readability_spark.dom.parser import parse_html


def element_path(el: Element) -> str:
    """Reference GetPath format: /tag/tag#id@name[class], body → '/'."""
    parts = []
    node: Optional[Element] = el
    while node is not None and node.tag not in ("body", "#document", "html"):
        seg = node.tag
        if node.id:
            seg += "#" + node.id
        name = node.get_attr("name")
        if name:
            seg += "@" + name
        if node.class_name:
            seg += "[" + node.class_name + "]"
        parts.append(seg)
        node = node.parent
    return "/" + "/".join(reversed(parts)) if parts else "/"


def top_candidates(html, url: Optional[str] = None, k: int = 5) -> list:
    """Run the scoring passes and return [(path, score)] for the top-k
    candidates — the ArtScr probe, minus the CLI wrapper."""
    from readability_spark.core.readability import Readability

    doc = parse_html(html, base_uri=url)
    reader = Readability(doc)
    reader._unwrap_noscript_images()
    reader._remove_scripts()
    reader._prep_document()
    reader._metadata = {"title": ""}
    reader._article_title = ""

    # re-run the scoring loop standalone (same arithmetic as _grab_article's
    # scorer) so the ranked list is observable without mutating the pipeline
    import readability_spark.core.readability as R

    page = doc.body
    if page is None:
        return []
    elements_to_score = []
    node = doc.document_element
    while node is not None:
        if node.tag in R.TAGS_TO_SCORE:
            elements_to_score.append(node)
        node = node.next_node()
    candidates = []
    from readability_spark.core import text as T

    for element in elements_to_score:
        parent = element.parent
        if parent is None or parent.tag == "#document":
            continue
        inner = T.inner_text(element)
        if len(inner) < 25:
            continue
        ancestors = reader._get_ancestors(element, 5)
        score = 1.0 + T.comma_split_count(inner) + min(len(inner) // 100, 3)
        for level, ancestor in enumerate(ancestors):
            if (
                not isinstance(ancestor, Element)
                or ancestor.tag == "#document"
                or ancestor.parent is None
                or ancestor.parent.tag == "#document"
            ):
                continue
            if ancestor.readability is None:
                reader._initialize_node(ancestor)
                candidates.append(ancestor)
            divider = 1.0 if level == 0 else (2.0 if level == 1 else level * 3.0)
            ancestor.readability["contentScore"] += score / divider

    scored = []
    for c in candidates:
        final = c.readability["contentScore"] * (1 - reader._get_link_density(c))
        scored.append((element_path(c), round(final, 2)))
    scored.sort(key=lambda x: -x[1])
    return scored[:k]


def main(argv=None) -> int:
    """CLI probe (reference ArtScr exit codes: 0 found, 1 usage, 2 missing
    file, 3 not found, 4 parse error)."""
    import sys

    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m readability_spark.core.candidates <file.html> [k]")
        return 1
    import os

    path = argv[0]
    k = int(argv[1]) if len(argv) > 1 else 5
    if not os.path.exists(path):
        return 2
    try:
        with open(path, "rb") as f:
            ranked = top_candidates(f.read(), k=k)
    except Exception as exc:  # pragma: no cover
        print(f"parse error: {exc}")
        return 4
    if not ranked:
        return 3
    for path_str, score in ranked:
        print(f"{score:10.2f}  {path_str}")
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())

"""isProbablyReaderable pre-filter (parity: ``Readability-readerable.js:52-116``).

Cheap score over visible p/pre/article (and div>br parents): accumulate
sqrt(textLength − minContentLength) until it crosses minScore. Used as an
optional pipeline pre-stage before the full extraction UDF (SURVEY.md §4).
"""

from __future__ import annotations

import math

from readability_spark.core import text as T
from readability_spark.core.css import iter_declarations
from readability_spark.core.readability import RX_MAYBE_CANDIDATE, RX_UNLIKELY
from readability_spark.dom.node import Document, Element


def _is_node_visible(el: Element) -> bool:
    style = el.get_attr("style")
    if style:
        for prop, value in iter_declarations(style):
            if prop == "display" and value.split("!")[0].strip().lower() == "none":
                return False
    if el.has_attr("hidden"):
        return False
    if el.has_attr("aria-hidden") and el.get_attr("aria-hidden") == "true":
        cls = "" if el.is_svg else el.class_name
        if "fallback-image" not in cls:
            return False
    return True


def is_probably_readerable(
    doc: Document,
    min_content_length: int = 140,
    min_score: float = 20.0,
    visibility_checker=_is_node_visible,
) -> bool:
    nodes = list(doc.get_elements_by_tag_name("p", "pre", "article"))
    br_parents = []
    seen = set(id(n) for n in nodes)
    for br in doc.get_elements_by_tag_name("br"):
        parent = br.parent
        if parent is not None and parent.tag == "div" and id(parent) not in seen:
            seen.add(id(parent))
            br_parents.append(parent)
    nodes.extend(br_parents)

    score = 0.0
    for node in nodes:
        if not visibility_checker(node):
            continue
        match_string = (
            ("[object SVGAnimatedString]" if node.is_svg else node.class_name)
            + " "
            + node.id
        )
        if RX_UNLIKELY.search(match_string) and not RX_MAYBE_CANDIDATE.search(match_string):
            continue
        if node.tag == "p" and node.find_ancestor(lambda a: a.tag == "li") is not None:
            continue
        text_length = len(T.js_trim(node.text_content))
        if text_length < min_content_length:
            continue
        score += math.sqrt(text_length - min_content_length)
        if score > min_score:
            return True
    return False

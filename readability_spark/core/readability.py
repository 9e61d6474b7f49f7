"""The Readability main-content extraction algorithm, from scratch in Python.

Implements the canonical algorithm behind Firefox Reader View (behavioral
reference: the Mozilla Readability.js bundled in vborovikov/readability, whose
test fixtures this engine must reproduce byte-identically; the C# port's
deviations are deliberately NOT followed — see SURVEY.md §7.0).

The implementation mirrors the *observable behavior* of the reference,
including several of its quirks that are load-bearing for fixture identity:

- ``_clean``/``_cleanConditionally`` compare ``tagName === "object"`` against
  an uppercase DOM tagName, so the <object> innerHTML video check never fires;
  we reproduce that by not performing the innerHTML check at all.
- SVG-namespace elements have a non-string ``className`` in a real DOM, so
  every class-string heuristic skips them (class weight, unlikely-candidate
  matching, the fallback-image exception).
- ``_getCharCount`` splits on the literal ASCII comma, while paragraph scoring
  splits on the nine-variant Unicode comma class.
- JS ``\\s``/``\\W`` character-class semantics (see core/text.py).

Everything here is a pure function of (html DOM, options) — no time, random,
or network dependence — so Spark can retry/repartition freely (SURVEY.md §7.3
determinism requirement).
"""

from __future__ import annotations

import json
import re
from typing import Optional

from readability_spark.core import text as T
from readability_spark.core.css import iter_declarations
from readability_spark.core.urls import DocumentUrl, is_base64_data_url
from readability_spark.dom.node import Comment, Document, Element, Node, Text
from readability_spark.dom.parser import parse_html
from readability_spark.dom.serializer import inner_html

# --------------------------------------------------------------------------
# Behavioral constants (values per the reference; lowercase tag convention)
# --------------------------------------------------------------------------

FLAG_STRIP_UNLIKELYS = 0x1
FLAG_WEIGHT_CLASSES = 0x2
FLAG_CLEAN_CONDITIONALLY = 0x4

DEFAULT_N_TOP_CANDIDATES = 5
DEFAULT_CHAR_THRESHOLD = 500

TAGS_TO_SCORE = frozenset("section h2 h3 h4 h5 h6 p td pre".split())

UNLIKELY_ROLES = frozenset(
    "menu menubar complementary navigation alert alertdialog dialog".split()
)

DIV_TO_P_ELEMS = frozenset("blockquote dl div img ol p pre table ul".split())

ALTER_TO_DIV_EXCEPTIONS = frozenset("div article section p ol ul".split())

PRESENTATIONAL_ATTRIBUTES = (
    "align background bgcolor border cellpadding cellspacing frame hspace "
    "rules style valign vspace".split()
)

DEPRECATED_SIZE_ATTRIBUTE_ELEMS = frozenset("table th td hr pre".split())

PHRASING_ELEMS = frozenset(
    (
        "abbr audio b bdo br button cite code data datalist dfn em embed i img input "
        "kbd label mark math meter noscript object output progress q ruby samp script "
        "select small span strong sub sup textarea time var wbr"
    ).split()
)

CLASSES_TO_PRESERVE = ("page",)

RX_UNLIKELY = re.compile(
    r"-ad-|ai2html|banner|breadcrumbs|combx|comment|community|cover-wrap|disqus|"
    r"extra|footer|gdpr|header|legends|menu|related|remark|replies|rss|shoutbox|"
    r"sidebar|skyscraper|social|sponsor|supplemental|ad-break|agegate|pagination|"
    r"pager|popup|yom-remote",
    re.I,
)
RX_MAYBE_CANDIDATE = re.compile(r"and|article|body|column|content|main|shadow", re.I)
RX_POSITIVE = re.compile(
    r"article|body|content|entry|hentry|h-entry|main|page|pagination|post|text|"
    r"blog|story",
    re.I,
)
RX_NEGATIVE = re.compile(
    r"-ad-|hidden|^hid$| hid$| hid |^hid |banner|combx|comment|com-|contact|"
    r"footer|gdpr|masthead|media|meta|outbrain|promo|related|scroll|share|"
    r"shoutbox|sidebar|skyscraper|sponsor|shopping|tags|widget",
    re.I,
)
RX_BYLINE = re.compile(r"byline|author|dateline|writtenby|p-author", re.I)
RX_VIDEOS = re.compile(
    r"//(www\.)?((dailymotion|youtube|youtube-nocookie|player\.vimeo|v\.qq)\.com|"
    r"(archive|upload\.wikimedia)\.org|player\.twitch\.tv)",
    re.I,
)
RX_SHARE_ELEMENTS = re.compile(r"(\b|_)(share|sharedaddy)(\b|_)", re.I)
RX_HASH_URL = re.compile(r"^#.+")
RX_SRCSET_URL = re.compile(r"(\S+)(\s+[\d.]+[xw])?(\s*(?:,|$))", re.A)
RX_JSONLD_ARTICLE_TYPES = re.compile(
    r"^Article|AdvertiserContentArticle|NewsArticle|AnalysisNewsArticle|"
    r"AskPublicNewsArticle|BackgroundNewsArticle|OpinionNewsArticle|"
    r"ReportageNewsArticle|ReviewNewsArticle|Report|SatiricalArticle|"
    r"ScholarlyArticle|MedicalScholarlyArticle|SocialMediaPosting|BlogPosting|"
    r"LiveBlogPosting|DiscussionForumPosting|TechArticle|APIReference$"
)
RX_SCHEMA_ORG = re.compile(r"^https?://schema\.org/?$")
RX_AD_WORDS = re.compile(
    r"^(ad(vertising|vertisement)?|pub(licité)?|werb(ung)?|广告|Реклама|Anuncio)$", re.I
)
RX_LOADING_WORDS = re.compile(
    r"^((loading|正在加载|Загрузка|chargement|cargando)(…|\.\.\.)?)$", re.I
)
RX_IMG_EXT = re.compile(r"\.(jpg|jpeg|png|webp)", re.I)
RX_SRCSET_LIKE = re.compile(r"\.(jpg|jpeg|png|webp)\s+\d", re.A)
RX_SRC_LIKE = re.compile(r"^\s*\S+\.(jpg|jpeg|png|webp)\S*\s*$", re.A)
RX_TITLE_SEP_TEST = re.compile(r" [\|\-\\/>»] ")
RX_TITLE_HIER_SEP = re.compile(r" [\\/>»] ")
RX_CDATA = re.compile(r"^\s*<!\[CDATA\[|\]\]>\s*$")
RX_PROPERTY_PATTERN = re.compile(
    r"\s*(article|dc|dcterm|og|twitter)\s*:\s*"
    r"(author|creator|description|published_time|title|site_name)\s*",
    re.I,
)
RX_NAME_PATTERN = re.compile(
    r"^\s*(?:(dc|dcterm|og|twitter|parsely|weibo:(article|webpage))\s*[-\.:]\s*)?"
    r"(author|creator|pub-date|description|title|site_name)\s*$",
    re.I,
)
RX_JS_WS = re.compile("[" + "".join("\\u%04x" % ord(c) for c in T.JS_WS_CHARS) + "]")
RX_SENTENCE_DOT = re.compile(r"\.( |$)")
RX_SCHEME = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:")

_SVG_CLASS_STRING = "[object SVGAnimatedString]"


def _clone_node(node: Node) -> Node:
    if isinstance(node, Element):
        return node.clone(deep=True)  # iterative, depth-safe, keeps flags
    if isinstance(node, Text):
        return Text(node.data)
    return Comment(node.data)  # type: ignore[union-attr]


def _first_truthy(*values):
    for v in values:
        if v:
            return v
    return None




def _parse_int_prefix(s: Optional[str]) -> int:
    """JS parseInt(s, 10): leading integer or 0 (NaN → falsy → caller's || 1)."""
    if not s:
        return 0
    m = re.match(r"\s*[+-]?\d+", s)
    return int(m.group(0)) if m else 0


# Pure-function memos for the per-node regex predicates. Crawl corpora reuse
# a small vocabulary of class/id strings across millions of elements, so the
# unlikely-candidate, class-weight, and inline-style decisions repeat
# endlessly; all three are deterministic functions of the attribute string
# alone, so worker-lifetime memo dicts are byte-identity safe. Capped with a
# wholesale clear (not LRU — hit paths must stay one dict probe).
#
# IMMUTABILITY ASSUMPTION: the memos bake in RX_UNLIKELY / RX_NEGATIVE /
# RX_POSITIVE (and the CSS normalization) at first call. Those module
# regexes are constants — anything that swaps them at runtime (a future
# per-instance override, a test monkeypatch) MUST call clear_predicate_memos()
# or stale verdicts persist for the worker's lifetime. Cached style dicts are
# returned by reference and are READ-ONLY to callers.
_MEMO_CAP = 100_000
_STYLE_MEMO: dict = {}
_UNLIKELY_MEMO: dict = {}
_NEGPOS_MEMO: dict = {}


def clear_predicate_memos() -> None:
    """Reset the predicate memo caches. Required after monkeypatching
    RX_UNLIKELY / RX_MAYBE_CANDIDATE / RX_NEGATIVE / RX_POSITIVE (tests)
    — the memos key only on the attribute string and would otherwise keep
    serving verdicts from the previous regexes."""
    _STYLE_MEMO.clear()
    _UNLIKELY_MEMO.clear()
    _NEGPOS_MEMO.clear()


def _unlikely_verdict(match_string: str) -> "tuple[bool, bool]":
    v = _UNLIKELY_MEMO.get(match_string)
    if v is None:
        v = (
            RX_UNLIKELY.search(match_string) is not None,
            RX_MAYBE_CANDIDATE.search(match_string) is not None,
        )
        if len(_UNLIKELY_MEMO) > _MEMO_CAP:
            _UNLIKELY_MEMO.clear()
        _UNLIKELY_MEMO[match_string] = v
    return v


def _negpos_weight(s: str) -> int:
    w = _NEGPOS_MEMO.get(s)
    if w is None:
        w = 0
        if RX_NEGATIVE.search(s):
            w -= 25
        if RX_POSITIVE.search(s):
            w += 25
        if len(_NEGPOS_MEMO) > _MEMO_CAP:
            _NEGPOS_MEMO.clear()
        _NEGPOS_MEMO[s] = w
    return w


class Readability:
    """Single-document extractor. ``Readability(doc).parse()`` → article dict."""

    def __init__(
        self,
        doc: Document,
        *,
        max_elems_to_parse: int = 0,
        nb_top_candidates: int = DEFAULT_N_TOP_CANDIDATES,
        char_threshold: int = DEFAULT_CHAR_THRESHOLD,
        classes_to_preserve: tuple = (),
        keep_classes: bool = False,
        disable_jsonld: bool = False,
        link_density_modifier: float = 0.0,
        allowed_video_regex=None,
        serialize_content: bool = True,
    ) -> None:
        self._doc = doc
        self._article_title: Optional[str] = None
        self._article_byline: Optional[str] = None
        self._article_dir: Optional[str] = None
        self._article_lang: Optional[str] = None
        self._article_site_name: Optional[str] = None
        self._attempts: list = []
        self._metadata: dict = {}
        self._max_elems_to_parse = max_elems_to_parse
        self._nb_top_candidates = nb_top_candidates
        self._char_threshold = char_threshold
        self._classes_to_preserve = list(CLASSES_TO_PRESERVE) + list(classes_to_preserve)
        self._keep_classes = keep_classes
        self._disable_jsonld = disable_jsonld
        self._allowed_video_regex = allowed_video_regex or RX_VIDEOS
        self._link_density_modifier = link_density_modifier
        # serialize_content=False skips building the content-HTML string and
        # the flat textContent (the text-only Spark path consumes the
        # _articleContent DOM via canonical_text instead); the cleanup and
        # post-processing passes still run, so the DOM is identical.
        self._serialize_content = serialize_content
        self._flags = FLAG_STRIP_UNLIKELYS | FLAG_WEIGHT_CLASSES | FLAG_CLEAN_CONDITIONALLY
        self._doc_url = DocumentUrl.from_document(doc, doc.base_uri)
        # raw source (decoded) for cheap pristine-body restoration on retries
        self._source_html: Optional[str] = None

    # ---------------------------------------------------------------- flags
    def _flag_is_active(self, flag: int) -> bool:
        return (self._flags & flag) > 0

    def _remove_flag(self, flag: int) -> None:
        self._flags &= ~flag

    # ------------------------------------------------------------ DOM hygiene
    @staticmethod
    def _class_string(el: Element) -> str:
        """className as the scoring code sees it: real string for HTML
        elements, the object stringification for SVG-namespace elements."""
        if el.is_svg:
            return _SVG_CLASS_STRING
        return el.class_name

    def _match_string(self, el: Element) -> str:
        return self._class_string(el) + " " + el.id

    @staticmethod
    def _inline_style(el: Element) -> dict:
        """Parsed inline style of ``el``. The returned dict may be the
        worker-lifetime _STYLE_MEMO entry itself — treat it as READ-ONLY;
        mutating it would poison the cache for every later document
        sharing the same style string."""
        style = el.get_attr("style")
        if not style:
            return {}
        cached = _STYLE_MEMO.get(style)
        if cached is not None:
            return cached
        out = {}
        for prop, value in iter_declarations(style):
            # CSSOM-style normalization: keyword values lowercased,
            # !important priority stripped from the value
            value = re.sub(r"\s*!\s*important\s*$", "", value, flags=re.I).strip()
            out[prop] = value.lower()
        if len(_STYLE_MEMO) > _MEMO_CAP:
            _STYLE_MEMO.clear()
        _STYLE_MEMO[style] = out
        return out

    def _is_probably_visible(self, el: Element) -> bool:
        style = self._inline_style(el)
        if style.get("display") == "none":
            return False
        if style.get("visibility") == "hidden":
            return False
        if el.has_attr("hidden"):
            return False
        if el.has_attr("aria-hidden") and el.get_attr("aria-hidden") == "true":
            cls = self._class_string(el)
            if not (cls and "fallback-image" in cls):
                return False
        return True

    # -------------------------------------------------------------- traversal
    @staticmethod
    def _next_skip_ws(node: Optional[Node]) -> Optional[Node]:
        """JS _nextNode: skip whitespace-only text nodes among siblings."""
        nxt = node
        while (
            nxt is not None
            and not isinstance(nxt, Element)
            and T.is_all_whitespace(nxt.text_content)
        ):
            nxt = nxt.next_sibling
        return nxt

    @staticmethod
    def _get_ancestors(el: Element, max_depth: int = 0) -> list:
        ancestors = []
        i = 0
        node = el.parent
        while node is not None:
            ancestors.append(node)
            i += 1
            if max_depth and i == max_depth:
                break
            node = node.parent
        return ancestors

    # ------------------------------------------------------------- predicates
    def _is_phrasing_content(self, node: Node) -> bool:
        if isinstance(node, Text):
            return True
        if not isinstance(node, Element):
            return False
        if node.tag in PHRASING_ELEMS:
            return True
        # iterative equivalent of the JS recursion (a/del/ins count as
        # phrasing iff every child is phrasing) — depth-safe for nested links
        if node.tag not in ("a", "del", "ins"):
            return False
        stack = list(node.children)
        while stack:
            c = stack.pop()
            if isinstance(c, Text):
                continue
            if not isinstance(c, Element):
                return False
            if c.tag in PHRASING_ELEMS:
                continue
            if c.tag in ("a", "del", "ins"):
                stack.extend(c.children)
            else:
                return False
        return True

    @staticmethod
    def _is_whitespace(node: Node) -> bool:
        if isinstance(node, Text):
            return T.js_trim(node.data) == ""
        return isinstance(node, Element) and node.tag == "br"

    def _has_single_tag_inside(self, el: Element, tag: str) -> bool:
        kids = el.element_children()
        if len(kids) != 1 or kids[0].tag != tag:
            return False
        return not any(
            isinstance(c, Text) and T.has_content(c.data) for c in el.children
        )

    @staticmethod
    def _is_element_without_content(el: Element) -> bool:
        if el.has_text_content(T.JS_WS_CHARS):
            return False
        kids = el.element_children()
        if not kids:
            return True
        return len(kids) == len(el.get_elements_by_tag_name("br")) + len(
            el.get_elements_by_tag_name("hr")
        )

    def _has_child_block_element(self, el: Element) -> bool:
        # any descendant element with a block tag (iterative — depth-safe)
        stack = [c for c in el.children if c.is_element]
        while stack:
            c = stack.pop()
            if c.tag in DIV_TO_P_ELEMS:
                return True
            for k in c.children:
                if k.is_element:
                    stack.append(k)
        return False

    def _is_valid_byline(self, el: Element, match_string: str) -> bool:
        rel = el.get_attr("rel")
        itemprop = el.get_attr("itemprop")
        # Cheap attribute/regex clause first: only byline-ish elements pay
        # the subtree text walk (same boolean result — `and` short-circuit).
        if not (
            rel == "author"
            or (itemprop is not None and "author" in itemprop)
            or RX_BYLINE.search(match_string) is not None
        ):
            return False
        return 0 < len(T.js_trim(el.text_content)) < 100

    def _header_duplicates_title(self, el: Element) -> bool:
        if el.tag not in ("h1", "h2"):
            return False
        heading = T.inner_text(el, normalize=False)
        return T.text_similarity(self._article_title or "", heading) > 0.75

    # ---------------------------------------------------------------- metrics
    def _get_link_density(self, el: Element) -> float:
        # Anchor snapshot first: with no <a> descendants the density is 0
        # regardless of text length (0/n == 0, and the n==0 branch also
        # returns 0) — skips the subtree text walk for link-free nodes.
        anchors = el.get_elements_by_tag_name("a")
        if not anchors:
            return 0.0
        text_length = len(T.inner_text(el))
        if text_length == 0:
            return 0.0
        link_length = 0.0
        for a in anchors:
            href = a.get_attr("href")
            coeff = 0.3 if (href and RX_HASH_URL.match(href)) else 1.0
            link_length += len(T.inner_text(a)) * coeff
        return link_length / text_length

    def _get_class_weight(self, el: Element) -> int:
        if not self._flag_is_active(FLAG_WEIGHT_CLASSES):
            return 0
        weight = 0
        if not el.is_svg and el.class_name:
            weight += _negpos_weight(el.class_name)
        if el.id:
            weight += _negpos_weight(el.id)
        return weight

    def _get_char_count(self, el: Element, sep: str = ",") -> int:
        return len(T.inner_text(el).split(sep)) - 1

    def _get_text_density(self, el: Element, tags) -> float:
        return self._text_density_over(el, el.get_elements_by_tag_name(*tags))

    @staticmethod
    def _text_density_over(el: Element, elements) -> float:
        """Text density against a pre-collected descendant snapshot (same
        math as :meth:`_get_text_density`; the list must be in document
        order, as a ``get_elements_by_tag_name`` walk yields it)."""
        text_length = len(T.inner_text(el, True))
        if text_length == 0:
            return 0.0
        children_length = sum(len(T.inner_text(c, True)) for c in elements)
        return children_length / text_length

    def _initialize_node(self, el: Element) -> None:
        el.readability = {"contentScore": 0.0}
        tag = el.tag
        if tag == "div":
            el.readability["contentScore"] += 5
        elif tag in ("pre", "td", "blockquote"):
            el.readability["contentScore"] += 3
        elif tag in ("address", "ol", "ul", "dl", "dd", "dt", "li", "form"):
            el.readability["contentScore"] -= 3
        elif tag in ("h1", "h2", "h3", "h4", "h5", "h6", "th"):
            el.readability["contentScore"] -= 5
        el.readability["contentScore"] += self._get_class_weight(el)

    # -------------------------------------------------------------- doc title
    def _doc_title_string(self) -> str:
        """document.title: child text of the first <title>, ASCII-whitespace
        stripped and collapsed (DOM spec; JSDOM follows it)."""
        for el in self._doc.get_elements_by_tag_name("title"):
            return re.sub(r"[\t\n\f\r ]+", " ", el.text_content).strip("\t\n\f\r ")
        return ""

    def _get_article_title(self) -> str:
        cur_title = orig_title = T.js_trim(self._doc_title_string())
        title_had_hierarchical_separators = False

        wc = T.word_count

        if RX_TITLE_SEP_TEST.search(cur_title):
            title_had_hierarchical_separators = RX_TITLE_HIER_SEP.search(cur_title) is not None
            cur_title = re.sub(r"(.*)[\|\-\\/>»] .*", r"\1", orig_title)
            if wc(cur_title) < 3:
                cur_title = re.sub(r"[^\|\-\\/>»]*[\|\-\\/>»](.*)", r"\1", orig_title)
        elif ": " in cur_title:
            headings = self._doc.get_elements_by_tag_name("h1", "h2")
            trimmed = T.js_trim(cur_title)
            match = any(T.js_trim(h.text_content) == trimmed for h in headings)
            if not match:
                cur_title = orig_title[orig_title.rfind(":") + 1 :]
                if wc(cur_title) < 3:
                    cur_title = orig_title[orig_title.find(":") + 1 :]
                elif wc(orig_title[: orig_title.find(":")]) > 5:
                    cur_title = orig_title
        elif len(cur_title) > 150 or len(cur_title) < 15:
            h_ones = self._doc.get_elements_by_tag_name("h1")
            if len(h_ones) == 1:
                cur_title = T.inner_text(h_ones[0])

        cur_title = T._WS_RUN2.sub(" ", T.js_trim(cur_title))
        cur_count = wc(cur_title)
        if cur_count <= 4 and (
            not title_had_hierarchical_separators
            or cur_count != wc(re.sub(r"[\|\-\\/>»]+", "", orig_title)) - 1
        ):
            cur_title = orig_title
        return cur_title

    # ----------------------------------------------------------- doc prep
    def _prep_document(self) -> None:
        for style in self._doc.get_elements_by_tag_name("style"):
            if style.parent is not None:
                style.remove()
        body = self._doc.body
        if body is not None:
            self._replace_brs(body)
        for font in self._doc.get_elements_by_tag_name("font"):
            font.set_tag("span")

    def _replace_brs(self, elem: Element) -> None:
        for br in elem.get_elements_by_tag_name("br"):
            if br.parent is None:
                continue
            nxt = br.next_sibling
            replaced = False
            # remove the <br> chain that follows (whitespace-tolerant)
            while True:
                nxt = self._next_skip_ws(nxt)
                if not (isinstance(nxt, Element) and nxt.tag == "br"):
                    break
                replaced = True
                br_sibling = nxt.next_sibling
                nxt.remove()
                nxt = br_sibling
            if not replaced:
                continue
            p = Element("p")
            br.replace_with(p)
            nxt = p.next_sibling
            while nxt is not None:
                if isinstance(nxt, Element) and nxt.tag == "br":
                    next_elem = self._next_skip_ws(nxt.next_sibling)
                    if isinstance(next_elem, Element) and next_elem.tag == "br":
                        break
                if not self._is_phrasing_content(nxt):
                    break
                sibling = nxt.next_sibling
                p.append_child(nxt)
                nxt = sibling
            while p.children and self._is_whitespace(p.children[-1]):
                p.children[-1].remove()
            if p.parent is not None and p.parent.tag == "p":
                p.parent.set_tag("div")

    # --------------------------------------------------------- noscript images
    def _is_single_image(self, node: Optional[Element]) -> bool:
        while node is not None:
            if node.tag == "img":
                return True
            kids = node.element_children()
            if len(kids) != 1 or T.js_trim(node.text_content) != "":
                return False
            node = kids[0]
        return False

    def _unwrap_noscript_images(self) -> None:
        for img in self._doc.get_elements_by_tag_name("img"):
            keep = False
            for name, value in img.attrs.items():
                if name in ("src", "srcset", "data-src", "data-srcset"):
                    keep = True
                    break
                if RX_IMG_EXT.search(value):
                    keep = True
                    break
            if not keep:
                img.remove()

        for noscript in self._doc.get_elements_by_tag_name("noscript"):
            if not self._is_single_image(noscript):
                continue
            tmp = Element("div")
            for c in noscript.children:
                tmp.append_child(_clone_node(c))
            prev = noscript.previous_element_sibling
            if prev is not None and self._is_single_image(prev):
                prev_img = prev
                if prev_img.tag != "img":
                    imgs = prev.get_elements_by_tag_name("img")
                    if not imgs:
                        continue
                    prev_img = imgs[0]
                new_imgs = tmp.get_elements_by_tag_name("img")
                if not new_imgs:
                    continue
                new_img = new_imgs[0]
                for name, value in list(prev_img.attrs.items()):
                    if value == "":
                        continue
                    if name in ("src", "srcset") or RX_IMG_EXT.search(value):
                        if new_img.get_attr(name) == value:
                            continue
                        attr_name = name
                        if new_img.has_attr(attr_name):
                            attr_name = "data-old-" + attr_name
                        new_img.set_attr(attr_name, value)
                first = tmp.first_element_child
                if first is not None:
                    prev.replace_with(first)

    def _remove_scripts(self) -> None:
        for el in self._doc.get_elements_by_tag_name("script", "noscript"):
            if el.parent is not None:
                el.remove()

    # ------------------------------------------------------------- JSON-LD
    def _get_jsonld(self) -> dict:
        metadata: Optional[dict] = None
        for script in self._doc.get_elements_by_tag_name("script"):
            if metadata is not None:
                break
            if script.get_attr("type") != "application/ld+json":
                continue
            try:
                content = RX_CDATA.sub("", script.text_content)
                parsed = json.loads(content)
                context = parsed.get("@context") if isinstance(parsed, dict) else None
                matches = (
                    isinstance(context, str) and RX_SCHEMA_ORG.match(context)
                ) or (
                    isinstance(context, dict)
                    and isinstance(context.get("@vocab"), str)
                    and RX_SCHEMA_ORG.match(context["@vocab"])
                )
                if not matches:
                    continue
                if not parsed.get("@type") and isinstance(parsed.get("@graph"), list):
                    parsed = next(
                        (
                            it
                            for it in parsed["@graph"]
                            if isinstance(it, dict)
                            and RX_JSONLD_ARTICLE_TYPES.search(it.get("@type") or "")
                        ),
                        None,
                    )
                if (
                    not parsed
                    or not parsed.get("@type")
                    or not isinstance(parsed["@type"], str)
                    or not RX_JSONLD_ARTICLE_TYPES.search(parsed["@type"])
                ):
                    continue
                metadata = {}
                name = parsed.get("name")
                headline = parsed.get("headline")
                if isinstance(name, str) and isinstance(headline, str) and name != headline:
                    title = self._get_article_title()
                    name_matches = T.text_similarity(name, title) > 0.75
                    headline_matches = T.text_similarity(headline, title) > 0.75
                    metadata["title"] = headline if (headline_matches and not name_matches) else name
                elif isinstance(name, str):
                    metadata["title"] = T.js_trim(name)
                elif isinstance(headline, str):
                    metadata["title"] = T.js_trim(headline)
                author = parsed.get("author")
                if author:
                    if isinstance(author, dict) and isinstance(author.get("name"), str):
                        metadata["byline"] = T.js_trim(author["name"])
                    elif (
                        isinstance(author, list)
                        and author
                        and isinstance(author[0], dict)
                        and isinstance(author[0].get("name"), str)
                    ):
                        metadata["byline"] = ", ".join(
                            T.js_trim(a["name"])
                            for a in author
                            if isinstance(a, dict) and isinstance(a.get("name"), str)
                        )
                if isinstance(parsed.get("description"), str):
                    metadata["excerpt"] = T.js_trim(parsed["description"])
                publisher = parsed.get("publisher")
                if isinstance(publisher, dict) and isinstance(publisher.get("name"), str):
                    metadata["siteName"] = T.js_trim(publisher["name"])
                if isinstance(parsed.get("datePublished"), str):
                    metadata["datePublished"] = T.js_trim(parsed["datePublished"])
            except Exception:
                continue
        return metadata or {}

    # -------------------------------------------------------------- metadata
    @staticmethod
    def _is_url(s: str) -> bool:
        return RX_SCHEME.match(s) is not None

    def _get_article_metadata(self, jsonld: dict) -> dict:
        values: dict = {}
        for el in self._doc.get_elements_by_tag_name("meta"):
            element_name = el.get_attr("name")
            element_property = el.get_attr("property")
            content = el.get_attr("content")
            if not content:
                continue
            matched = None
            if element_property:
                matched = RX_PROPERTY_PATTERN.search(element_property)
                if matched:
                    key = RX_JS_WS.sub("", matched.group(0).lower())
                    values[key] = T.js_trim(content)
            if not matched and element_name and RX_NAME_PATTERN.search(element_name):
                key = RX_JS_WS.sub("", element_name.lower()).replace(".", ":")
                values[key] = T.js_trim(content)

        metadata: dict = {}
        # Canonical JS precedence chain. Known single-fixture deviation:
        # bug-1255978's expected-metadata.json wants twitter:title over
        # og:title (the port's most-verbose rule), but that rule breaks
        # citylab-1/la-nacion titles AND citylab-1's text identity, so the JS
        # chain is authoritative here (SURVEY.md §7.0).
        metadata["title"] = _first_truthy(
            jsonld.get("title"),
            values.get("dc:title"),
            values.get("dcterm:title"),
            values.get("og:title"),
            values.get("weibo:article:title"),
            values.get("weibo:webpage:title"),
            values.get("title"),
            values.get("twitter:title"),
            values.get("parsely-title"),
        )
        if not metadata["title"]:
            metadata["title"] = self._get_article_title()

        article_author = values.get("article:author")
        if not (isinstance(article_author, str) and not self._is_url(article_author)):
            article_author = None
        metadata["byline"] = _first_truthy(
            jsonld.get("byline"),
            values.get("dc:creator"),
            values.get("dcterm:creator"),
            values.get("author"),
            values.get("parsely-author"),
            article_author,
        )
        metadata["excerpt"] = _first_truthy(
            jsonld.get("excerpt"),
            values.get("dc:description"),
            values.get("dcterm:description"),
            values.get("og:description"),
            values.get("weibo:article:description"),
            values.get("weibo:webpage:description"),
            values.get("description"),
            values.get("twitter:description"),
        )
        metadata["siteName"] = _first_truthy(jsonld.get("siteName"), values.get("og:site_name"))
        metadata["publishedTime"] = _first_truthy(
            jsonld.get("datePublished"),
            values.get("article:published_time"),
            values.get("parsely-pub-date"),
        )

        for key in ("title", "byline", "excerpt", "siteName", "publishedTime"):
            metadata[key] = T.unescape_html_entities(metadata[key])
        return metadata

    # ------------------------------------------------------------ grabArticle
    def _restore_page(self, page: Element) -> bool:
        """Rebuild pristine body content for a flag-sieve retry.

        The reference caches the prepped body's serialized HTML up front and
        re-parses it on retry; re-running (parse → unwrap-noscript →
        remove-scripts → prep) on the raw source is semantically identical
        (all passes are deterministic) and moves the cost off the common
        no-retry path — most documents never retry.
        """
        if self._source_html is None:
            return False
        doc2 = parse_html(self._source_html, base_uri=self._doc.base_uri)
        r2 = Readability(doc2)
        r2._unwrap_noscript_images()
        r2._remove_scripts()
        r2._prep_document()
        body2 = doc2.body
        if body2 is None:
            return False
        for c in list(page.children):
            c.remove()
        for c in list(body2.children):
            page.append_child(c)
        return True

    def _grab_article(self) -> Optional[Element]:
        page = self._doc.body
        if page is None:
            return None
        # pristine body content for the flag-sieve retries: lazily rebuilt
        # from the raw source when available, else cloned up front
        page_cache = (
            None
            if self._source_html is not None
            else [_clone_node(c) for c in page.children]
        )

        while True:
            strip_unlikely = self._flag_is_active(FLAG_STRIP_UNLIKELYS)
            elements_to_score: list = []
            node: Optional[Element] = self._doc.document_element
            should_remove_title_header = True

            while node is not None:
                if node.tag == "html":
                    self._article_lang = node.get_attr("lang")

                match_string = self._match_string(node)

                if not self._is_probably_visible(node):
                    node = node.remove_and_get_next()
                    continue

                if node.get_attr("aria-modal") == "true" and node.get_attr("role") == "dialog":
                    node = node.remove_and_get_next()
                    continue

                if (
                    not self._article_byline
                    and not self._metadata.get("byline")
                    and self._is_valid_byline(node, match_string)
                ):
                    self._article_byline = T.js_trim(node.text_content)
                    node = node.remove_and_get_next()
                    continue

                if should_remove_title_header and self._header_duplicates_title(node):
                    should_remove_title_header = False
                    node = node.remove_and_get_next()
                    continue

                if strip_unlikely:
                    unlikely, maybe_candidate = _unlikely_verdict(match_string)
                    if (
                        unlikely
                        and not maybe_candidate
                        and not node.has_ancestor_tag("table")
                        and not node.has_ancestor_tag("code")
                        and node.tag != "body"
                        and node.tag != "a"
                    ):
                        node = node.remove_and_get_next()
                        continue
                    if (node.get_attr("role") or "") in UNLIKELY_ROLES:
                        node = node.remove_and_get_next()
                        continue

                if node.tag in (
                    "div", "section", "header", "h1", "h2", "h3", "h4", "h5", "h6",
                ) and self._is_element_without_content(node):
                    node = node.remove_and_get_next()
                    continue

                if node.tag in TAGS_TO_SCORE:
                    elements_to_score.append(node)

                if node.tag == "div":
                    # wrap phrasing-content runs into <p>
                    p: Optional[Element] = None
                    child = node.children[0] if node.children else None
                    while child is not None:
                        next_sibling = child.next_sibling
                        if self._is_phrasing_content(child):
                            if p is not None:
                                p.append_child(child)
                            elif not self._is_whitespace(child):
                                p = Element("p")
                                child.replace_with(p)
                                p.append_child(child)
                        elif p is not None:
                            while p.children and self._is_whitespace(p.children[-1]):
                                p.children[-1].remove()
                            p = None
                        child = next_sibling

                    if (
                        self._has_single_tag_inside(node, "p")
                        and self._get_link_density(node) < 0.25
                    ):
                        new_node = node.element_children()[0]
                        node.replace_with(new_node)
                        node = new_node
                        elements_to_score.append(node)
                    elif not self._has_child_block_element(node):
                        node.set_tag("p")
                        elements_to_score.append(node)

                node = node.next_node()

            # score paragraphs, propagate to ancestors
            candidates: list = []
            for element in elements_to_score:
                parent = element.parent
                if parent is None or not isinstance(parent, Element) or parent.tag == "#document":
                    continue
                inner = T.inner_text(element)
                if len(inner) < 25:
                    continue
                ancestors = self._get_ancestors(element, 5)
                if not ancestors:
                    continue
                content_score = 1.0
                content_score += T.comma_split_count(inner)
                content_score += min(len(inner) // 100, 3)
                for level, ancestor in enumerate(ancestors):
                    # skip ancestors without a tag name or whose parent has
                    # none (the document node and <html> in practice)
                    if (
                        not isinstance(ancestor, Element)
                        or ancestor.tag == "#document"
                        or ancestor.parent is None
                        or ancestor.parent.tag == "#document"
                    ):
                        continue
                    if ancestor.readability is None:
                        self._initialize_node(ancestor)
                        candidates.append(ancestor)
                    divider = 1.0 if level == 0 else (2.0 if level == 1 else level * 3.0)
                    ancestor.readability["contentScore"] += content_score / divider

            # link-density scale + top-N insertion sort
            top_candidates: list = []
            for candidate in candidates:
                score = candidate.readability["contentScore"] * (
                    1 - self._get_link_density(candidate)
                )
                candidate.readability["contentScore"] = score
                for t in range(self._nb_top_candidates):
                    a_top = top_candidates[t] if t < len(top_candidates) else None
                    if a_top is None or score > a_top.readability["contentScore"]:
                        top_candidates.insert(t, candidate)
                        if len(top_candidates) > self._nb_top_candidates:
                            top_candidates.pop()
                        break

            top_candidate = top_candidates[0] if top_candidates else None
            needed_to_create_top_candidate = False

            if top_candidate is None or top_candidate.tag == "body":
                top_candidate = Element("div")
                needed_to_create_top_candidate = True
                for child in list(page.children):
                    top_candidate.append_child(child)
                page.append_child(top_candidate)
                self._initialize_node(top_candidate)
            else:
                alternative_ancestors = []
                top_score = top_candidate.readability["contentScore"]
                for i in range(1, len(top_candidates)):
                    # JS x/0 is NaN/Infinity, never a throw; a zero top score
                    # makes the ratio NaN → comparison false
                    if (
                        top_score != 0
                        and top_candidates[i].readability["contentScore"] / top_score >= 0.75
                    ):
                        alternative_ancestors.append(self._get_ancestors(top_candidates[i]))
                MIN_TOPCANDIDATES = 3
                if len(alternative_ancestors) >= MIN_TOPCANDIDATES:
                    parent_of_top = top_candidate.parent
                    while parent_of_top is not None and parent_of_top.tag != "body":
                        lists_containing = 0
                        for anc_list in alternative_ancestors:
                            if lists_containing >= MIN_TOPCANDIDATES:
                                break
                            lists_containing += int(parent_of_top in anc_list)
                        if lists_containing >= MIN_TOPCANDIDATES:
                            top_candidate = parent_of_top
                            break
                        parent_of_top = parent_of_top.parent
                if top_candidate.readability is None:
                    self._initialize_node(top_candidate)

                # parent climb
                parent_of_top = top_candidate.parent
                last_score = top_candidate.readability["contentScore"]
                score_threshold = last_score / 3.0
                while parent_of_top is not None and parent_of_top.tag != "body":
                    if parent_of_top.readability is None:
                        parent_of_top = parent_of_top.parent
                        continue
                    parent_score = parent_of_top.readability["contentScore"]
                    if parent_score < score_threshold:
                        break
                    if parent_score > last_score:
                        top_candidate = parent_of_top
                        break
                    last_score = parent_score
                    parent_of_top = parent_of_top.parent

                # single-child climb
                parent_of_top = top_candidate.parent
                while (
                    parent_of_top is not None
                    and parent_of_top.tag != "body"
                    and len(parent_of_top.element_children()) == 1
                ):
                    top_candidate = parent_of_top
                    parent_of_top = top_candidate.parent
                if top_candidate.readability is None:
                    self._initialize_node(top_candidate)

            # sibling absorption
            article_content = Element("div")
            article_content.set_attr("id", "readability-content")
            sibling_score_threshold = max(
                10.0, top_candidate.readability["contentScore"] * 0.2
            )
            parent_of_top = top_candidate.parent
            assert parent_of_top is not None
            for sibling in list(parent_of_top.element_children()):
                append = False
                if sibling is top_candidate:
                    append = True
                else:
                    content_bonus = 0.0
                    if (
                        sibling.class_name == top_candidate.class_name
                        and top_candidate.class_name != ""
                    ):
                        content_bonus += top_candidate.readability["contentScore"] * 0.2
                    if (
                        sibling.readability is not None
                        and sibling.readability["contentScore"] + content_bonus
                        >= sibling_score_threshold
                    ):
                        append = True
                    elif sibling.tag == "p":
                        link_density = self._get_link_density(sibling)
                        node_content = T.inner_text(sibling)
                        node_length = len(node_content)
                        if node_length > 80 and link_density < 0.25:
                            append = True
                        elif (
                            0 < node_length < 80
                            and link_density == 0
                            and RX_SENTENCE_DOT.search(node_content)
                        ):
                            append = True
                if append:
                    if sibling.tag not in ALTER_TO_DIV_EXCEPTIONS:
                        sibling.set_tag("div")
                    article_content.append_child(sibling)

            self._prep_article(article_content)

            if needed_to_create_top_candidate:
                top_candidate.set_attr("id", "readability-page-1")
                top_candidate.set_attr("class", "page")
            else:
                div = Element("div")
                div.set_attr("id", "readability-page-1")
                div.set_attr("class", "page")
                for child in list(article_content.children):
                    div.append_child(child)
                article_content.append_child(div)

            parse_successful = True
            text_length = len(T.inner_text(article_content, True))
            if text_length < self._char_threshold:
                parse_successful = False
                # restore pristine page content for the retry
                if page_cache is not None:
                    for c in list(page.children):
                        c.remove()
                    for c in page_cache:
                        page.append_child(_clone_node(c))
                else:
                    self._restore_page(page)
                self._attempts.append(
                    {"articleContent": article_content, "textLength": text_length}
                )
                if self._flag_is_active(FLAG_STRIP_UNLIKELYS):
                    self._remove_flag(FLAG_STRIP_UNLIKELYS)
                elif self._flag_is_active(FLAG_WEIGHT_CLASSES):
                    self._remove_flag(FLAG_WEIGHT_CLASSES)
                elif self._flag_is_active(FLAG_CLEAN_CONDITIONALLY):
                    self._remove_flag(FLAG_CLEAN_CONDITIONALLY)
                else:
                    self._attempts.sort(key=lambda a: -a["textLength"])
                    if not self._attempts[0]["textLength"]:
                        return None
                    article_content = self._attempts[0]["articleContent"]
                    parse_successful = True

            if parse_successful:
                ancestors = [parent_of_top, top_candidate] + self._get_ancestors(
                    parent_of_top
                )
                for ancestor in ancestors:
                    if not isinstance(ancestor, Element) or ancestor.tag == "#document":
                        continue
                    article_dir = ancestor.get_attr("dir")
                    if article_dir:
                        self._article_dir = article_dir
                        break
                return article_content

    # ------------------------------------------------------------ prepArticle
    def _prep_article(self, article_content: Element) -> None:
        self._clean_styles(article_content)
        self._mark_data_tables(article_content)
        self._fix_lazy_images(article_content)

        self._clean_conditionally(article_content, "form")
        self._clean_conditionally(article_content, "fieldset")
        self._clean_many(
            article_content, ("object", "embed", "footer", "link", "aside")
        )

        share_element_threshold = DEFAULT_CHAR_THRESHOLD
        for top in article_content.element_children():
            self._clean_matched_nodes(
                top,
                lambda node, match_string: RX_SHARE_ELEMENTS.search(match_string)
                is not None
                and len(node.text_content) < share_element_threshold,
            )

        self._clean_many(
            article_content, ("iframe", "input", "textarea", "select", "button")
        )
        self._clean_headers(article_content)

        self._clean_conditionally(article_content, "table")
        self._clean_conditionally(article_content, "ul")
        self._clean_conditionally(article_content, "div")

        for h1 in article_content.get_elements_by_tag_name("h1"):
            h1.set_tag("h2")

        # remove empty paragraphs
        for paragraph in reversed(article_content.get_elements_by_tag_name("p")):
            if paragraph.parent is None:
                continue
            if not paragraph.has_descendant_tag(
                "img", "embed", "object", "iframe"
            ) and not T.inner_text(paragraph, normalize=False):
                paragraph.remove()

        for br in article_content.get_elements_by_tag_name("br"):
            if br.parent is None:
                continue
            nxt = self._next_skip_ws(br.next_sibling)
            if isinstance(nxt, Element) and nxt.tag == "p":
                br.remove()

        # unwrap single-cell tables
        for table in article_content.get_elements_by_tag_name("table"):
            if table.parent is None:
                continue
            tbody = (
                table.first_element_child
                if self._has_single_tag_inside(table, "tbody")
                else table
            )
            if tbody is not None and self._has_single_tag_inside(tbody, "tr"):
                row = tbody.first_element_child
                if row is not None and self._has_single_tag_inside(row, "td"):
                    cell = row.first_element_child
                    assert cell is not None
                    cell.set_tag(
                        "p"
                        if all(self._is_phrasing_content(c) for c in cell.children)
                        else "div"
                    )
                    table.replace_with(cell)

    def _clean_styles(self, el: Element) -> None:
        # iterative pre-order walk, skipping svg subtrees entirely (the JS
        # recursion early-returns on svg, leaving its descendants untouched)
        stack = [el]
        while stack:
            node = stack.pop()
            if node.tag == "svg":
                continue
            for attr in PRESENTATIONAL_ATTRIBUTES:
                node.remove_attr(attr)
            if node.tag in DEPRECATED_SIZE_ATTRIBUTE_ELEMS:
                node.remove_attr("width")
                node.remove_attr("height")
            for c in node.children:
                if c.is_element:
                    stack.append(c)

    def _mark_data_tables(self, root: Element) -> None:
        for table in root.get_elements_by_tag_name("table"):
            if table.get_attr("role") == "presentation":
                table.set_data_table(False)
                continue
            if table.get_attr("datatable") == "0":
                table.set_data_table(False)
                continue
            if table.get_attr("summary"):
                table.set_data_table(True)
                continue
            captions = table.get_elements_by_tag_name("caption")
            if captions and captions[0].children:
                table.set_data_table(True)
                continue
            if any(
                table.get_elements_by_tag_name(tag)
                for tag in ("col", "colgroup", "tfoot", "thead", "th")
            ):
                table.set_data_table(True)
                continue
            if table.get_elements_by_tag_name("table"):
                table.set_data_table(False)
                continue
            rows, columns = self._get_row_and_column_count(table)
            if columns == 1 or rows == 1:
                table.set_data_table(False)
                continue
            if rows >= 10 or columns > 4:
                table.set_data_table(True)
                continue
            table.set_data_table(rows * columns > 10)

    @staticmethod
    def _get_row_and_column_count(table: Element) -> tuple:
        rows = 0
        columns = 0
        for tr in table.get_elements_by_tag_name("tr"):
            rows += _parse_int_prefix(tr.get_attr("rowspan")) or 1
            row_cols = 0
            for td in tr.get_elements_by_tag_name("td"):
                row_cols += _parse_int_prefix(td.get_attr("colspan")) or 1
            columns = max(columns, row_cols)
        return rows, columns

    def _fix_lazy_images(self, root: Element) -> None:
        for elem in root.get_elements_by_tag_name("img", "picture", "figure"):
            src = elem.get_attr("src") or ""
            m = is_base64_data_url(src)
            if src and m:
                if m.group(1) != "image/svg+xml":
                    src_could_be_removed = False
                    for name, value in elem.attrs.items():
                        if name == "src":
                            continue
                        if RX_IMG_EXT.search(value):
                            src_could_be_removed = True
                            break
                    if src_could_be_removed:
                        b64_starts = len(m.group(0))
                        if len(src) - b64_starts < 133:
                            elem.remove_attr("src")

            src = elem.get_attr("src") or ""
            srcset = elem.get_attr("srcset") or ""
            if (src or (srcset and srcset != "null")) and "lazy" not in (
                "" if elem.is_svg else elem.class_name.lower()
            ):
                continue
            for name, value in list(elem.attrs.items()):
                if name in ("src", "srcset", "alt"):
                    continue
                copy_to = None
                if RX_SRCSET_LIKE.search(value):
                    copy_to = "srcset"
                elif RX_SRC_LIKE.search(value):
                    copy_to = "src"
                if copy_to:
                    if elem.tag in ("img", "picture"):
                        elem.set_attr(copy_to, value)
                    elif elem.tag == "figure" and not elem.get_elements_by_tag_name(
                        "img", "picture"
                    ):
                        img = Element("img")
                        img.set_attr(copy_to, value)
                        elem.append_child(img)

    def _clean(self, el: Element, tag: str) -> None:
        self._clean_many(el, (tag,))

    def _clean_many(self, el: Element, tags) -> None:
        """Fused multi-tag ``_clean``: one snapshot walk instead of one per
        tag. Equivalent to sequential per-tag passes — each node's keep/
        remove decision depends only on its own tag and attrs, and removing
        a node whose ancestor was already detached is a no-op on the
        serialized tree (the sequential version simply never revisits such
        nodes because later snapshots exclude them)."""
        for node in reversed(el.get_elements_by_tag_name(*tags)):
            if node.parent is None:
                continue
            if node.tag in ("object", "embed", "iframe"):
                if any(
                    self._allowed_video_regex.search(v) for v in node.attrs.values()
                ):
                    continue
                # NOTE: the reference's <object> innerHTML check is dead code
                # (uppercase tagName compared to "object"), so we skip it too.
            node.remove()

    def _clean_matched_nodes(self, el: Element, filter_fn) -> None:
        end_of_search = el.next_node(ignore_self_and_kids=True)
        nxt = el.next_node()
        while nxt is not None and nxt is not end_of_search:
            if filter_fn(nxt, self._match_string(nxt)):
                nxt = nxt.remove_and_get_next()
            else:
                nxt = nxt.next_node()

    def _clean_headers(self, el: Element) -> None:
        for node in reversed(el.get_elements_by_tag_name("h1", "h2")):
            if node.parent is None:
                continue
            if self._get_class_weight(node) < 0:
                node.remove()

    def _clean_conditionally(self, el: Element, tag: str) -> None:
        if not self._flag_is_active(FLAG_CLEAN_CONDITIONALLY):
            return
        for node in reversed(el.get_elements_by_tag_name(tag)):
            if node.parent is None:
                continue
            if self._should_remove_conditionally(node, tag):
                node.remove()

    @staticmethod
    def _collect_removal_elements(node: Element):
        """ONE pre-order walk collecting every subtree snapshot the
        conditional-removal branch consumes — identical element sets, in
        document order, to eight separate ``get_elements_by_tag_name``
        walks (the hot path of ``_clean_conditionally``: profiled at 16k+
        snapshot walks per corpus before fusing)."""
        lists: list = []
        tables: list = []
        embeds: list = []
        headings: list = []
        n_p = n_img = n_li = n_input = 0
        stack: list = []
        children = node.children
        i, n = 0, len(children)
        while True:
            while i < n:
                c = children[i]
                i += 1
                if c.is_element:
                    t = c.tag
                    if t == "p":
                        n_p += 1
                    elif t == "img":
                        n_img += 1
                    elif t == "li":
                        n_li += 1
                    elif t == "input":
                        n_input += 1
                    elif t in ("ul", "ol"):
                        lists.append(c)
                    elif t == "table":
                        tables.append(c)
                    elif t in ("object", "embed", "iframe"):
                        embeds.append(c)
                    elif t in ("h1", "h2", "h3", "h4", "h5", "h6"):
                        headings.append(c)
                    if c.children:
                        stack.append((children, i, n))
                        children = c.children
                        i, n = 0, len(children)
            if not stack:
                return lists, tables, embeds, headings, n_p, n_img, n_li, n_input
            children, i, n = stack.pop()

    def _should_remove_conditionally(self, node: Element, tag: str) -> bool:
        lists, tables, embeds, headings, n_p, n_img, n_li, n_input = (
            self._collect_removal_elements(node)
        )

        is_list = tag in ("ul", "ol")
        if not is_list:
            list_length = 0
            for lst in lists:
                list_length += len(T.inner_text(lst))
            total = len(T.inner_text(node))
            is_list = total > 0 and list_length / total > 0.9

        if tag == "table" and node.data_table:
            return False
        if node.has_ancestor_tag("table", -1, lambda t: t.data_table):
            return False
        if node.has_ancestor_tag("code"):
            return False
        if any(t.data_table for t in tables):
            return False

        weight = self._get_class_weight(node)
        if weight < 0:
            return True

        if self._get_char_count(node, ",") < 10:
            p = n_p
            img = n_img
            li = n_li - 100
            inputs = n_input
            heading_density = self._text_density_over(node, headings)

            embed_count = 0
            for embed in embeds:
                if any(
                    self._allowed_video_regex.search(v) for v in embed.attrs.values()
                ):
                    return False
                # (object innerHTML check dead in reference; skipped)
                embed_count += 1

            inner = T.inner_text(node)
            if RX_AD_WORDS.search(inner) or RX_LOADING_WORDS.search(inner):
                return True

            content_length = len(inner)
            link_density = self._get_link_density(node)
            textish_tags = ("span", "li", "td") + tuple(DIV_TO_P_ELEMS)
            text_density = self._get_text_density(node, textish_tags)
            is_figure_child = node.has_ancestor_tag("figure")

            have_to_remove = (
                (not is_figure_child and img > 1 and p / img < 0.5)
                or (not is_list and li > p)
                or (inputs > p // 3)
                or (
                    not is_list
                    and not is_figure_child
                    and heading_density < 0.9
                    and content_length < 25
                    and (img == 0 or img > 2)
                    and link_density > 0
                )
                or (
                    not is_list
                    and weight < 25
                    and link_density > 0.2 + self._link_density_modifier
                )
                or (weight >= 25 and link_density > 0.5 + self._link_density_modifier)
                or ((embed_count == 1 and content_length < 75) or embed_count > 1)
                or (img == 0 and text_density == 0)
            )

            if is_list and have_to_remove:
                for child in node.element_children():
                    if len(child.element_children()) > 1:
                        return have_to_remove
                li_count = len(node.get_elements_by_tag_name("li"))
                if img == li_count:
                    return False
            return have_to_remove
        return False

    # -------------------------------------------------------- post-processing
    def _post_process_content(self, article_content: Element) -> None:
        self._fix_relative_uris(article_content)
        self._simplify_nested_elements(article_content)
        if not self._keep_classes:
            self._clean_classes(article_content)

    def _fix_relative_uris(self, article_content: Element) -> None:
        doc_url = self._doc_url
        if doc_url is None:
            # no resolvable base (JS: about:blank base → resolution no-ops),
            # but javascript: link unwrapping below still applies
            def to_abs(uri: str) -> str:
                return uri

        else:

            def to_abs(uri: str) -> str:
                return doc_url.to_absolute(uri)

        for link in article_content.get_elements_by_tag_name("a"):
            href = link.get_attr("href")
            if not href:
                continue
            if href.startswith("javascript:"):
                if len(link.children) == 1 and isinstance(link.children[0], Text):
                    link.replace_with(Text(link.text_content))
                else:
                    container = Element("span")
                    for c in list(link.children):
                        container.append_child(c)
                    link.replace_with(container)
            else:
                link.set_attr("href", to_abs(href))

        for media in article_content.get_elements_by_tag_name(
            "img", "picture", "figure", "video", "audio", "source"
        ):
            src = media.get_attr("src")
            poster = media.get_attr("poster")
            srcset = media.get_attr("srcset")
            if src:
                media.set_attr("src", to_abs(src))
            if poster:
                media.set_attr("poster", to_abs(poster))
            if srcset:
                new_srcset = RX_SRCSET_URL.sub(
                    lambda m: to_abs(m.group(1)) + (m.group(2) or "") + m.group(3),
                    srcset,
                )
                media.set_attr("srcset", new_srcset)

    def _simplify_nested_elements(self, article_content: Element) -> None:
        node: Optional[Element] = article_content
        while node is not None:
            if (
                node.parent is not None
                and node.tag in ("div", "section")
                and not node.id.startswith("readability")
            ):
                if self._is_element_without_content(node):
                    node = node.remove_and_get_next()
                    continue
                if self._has_single_tag_inside(node, "div") or self._has_single_tag_inside(
                    node, "section"
                ):
                    child = node.element_children()[0]
                    for name, value in node.attrs.items():
                        child.set_attr(name, value)
                    node.replace_with(child)
                    node = child
                    continue
            node = node.next_node()

    def _clean_classes(self, el: Element) -> None:
        # iterative pre-order walk (depth-safe)
        stack = [el]
        while stack:
            node = stack.pop()
            preserved = [c for c in node.class_list() if c in self._classes_to_preserve]
            if preserved:
                node.set_attr("class", " ".join(preserved))
            else:
                node.remove_attr("class")
            for c in node.children:
                if c.is_element:
                    stack.append(c)

    # ------------------------------------------------------------------ parse
    def parse(self) -> Optional[dict]:
        if self._max_elems_to_parse > 0:
            num_tags = len(self._doc.get_elements_by_tag_name("*"))
            if num_tags > self._max_elems_to_parse:
                raise ValueError(f"Aborting parsing document; {num_tags} elements found")

        self._unwrap_noscript_images()
        jsonld = {} if self._disable_jsonld else self._get_jsonld()
        self._remove_scripts()
        self._prep_document()

        metadata = self._get_article_metadata(jsonld)
        self._metadata = metadata
        self._article_title = metadata["title"]

        article_content = self._grab_article()
        if article_content is None:
            return None

        self._post_process_content(article_content)

        if not metadata.get("excerpt"):
            paragraphs = article_content.get_elements_by_tag_name("p")
            if paragraphs:
                metadata["excerpt"] = T.js_trim(paragraphs[0].text_content)

        text_content = (
            article_content.text_content if self._serialize_content else None
        )
        return {
            "title": self._article_title,
            "byline": metadata.get("byline") or self._article_byline,
            "dir": self._article_dir,
            "lang": self._article_lang,
            "content": inner_html(article_content) if self._serialize_content else None,
            "textContent": text_content,
            "length": len(text_content) if text_content is not None else None,
            "excerpt": metadata.get("excerpt"),
            "siteName": metadata.get("siteName") or self._article_site_name,
            "publishedTime": metadata.get("publishedTime"),
            "_articleContent": article_content,
        }


def extract_article(
    html: "str | bytes", url: Optional[str] = None, **options
) -> Optional[dict]:
    """Convenience one-shot: parse HTML bytes/str and run Readability."""
    from readability_spark.dom.parser import decode_html_bytes

    if isinstance(html, (bytes, bytearray, memoryview)):
        html = decode_html_bytes(bytes(html))
    doc = parse_html(html, base_uri=url)
    reader = Readability(doc, **options)
    reader._source_html = html
    return reader.parse()

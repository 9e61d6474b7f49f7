"""Property tests: the parser and extraction must never raise on garbage —
a crawl corpus contains every possible malformation, and one poison page
must cost an err row, not a Spark task."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from readability_spark.core.readability import extract_article
from readability_spark.dom.parser import decode_html_bytes, parse_html
from readability_spark.dom.serializer import inner_html

TAGS = ["div", "p", "span", "a", "table", "tr", "td", "li", "ul", "script",
        "style", "svg", "br", "img", "body", "html", "head", "title", "form"]

tag_soup = st.lists(
    st.one_of(
        st.sampled_from(TAGS).map(lambda t: f"<{t}>"),
        st.sampled_from(TAGS).map(lambda t: f"</{t}>"),
        st.sampled_from(TAGS).map(lambda t: f"<{t} class='x y' id=z>"),
        st.text(max_size=40),
        st.just("<!-- c -->"),
        st.just("<![CDATA[x]]>"),
        st.just("&amp;&bogus;&#x41;&#999999999;"),
    ),
    max_size=60,
).map("".join)


@settings(max_examples=200, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(tag_soup)
def test_parse_and_extract_never_raise_on_tag_soup(html):
    doc = parse_html(html)
    assert doc.body is not None
    inner_html(doc.body)  # serializer round trip
    res = extract_article(html.encode("utf-8", "replace"), url="http://x/")
    assert res is None or isinstance(res, dict)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_parse_never_raises_on_raw_bytes(raw):
    decode_html_bytes(raw)
    doc = parse_html(raw)
    assert doc is not None
    res = extract_article(raw, url="http://x/")
    assert res is None or isinstance(res, dict)


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=1, max_value=3000), st.sampled_from(["div", "span", "table"]))
def test_parse_any_depth(depth, tag):
    html = f"<{tag}>" * depth + "x"
    doc = parse_html(html)
    assert "x" in doc.body.text_content


@settings(max_examples=100, deadline=None)
@given(tag_soup)
def test_tokenfinder_never_raises(html):
    from readability_spark.core.tokenfinder import find_article_path

    out = find_article_path(html)
    assert out is None or isinstance(out, str)

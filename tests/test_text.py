"""Text-normalization and similarity unit tests (JS semantics)."""

from readability_spark.core import text as T
from readability_spark.dom.parser import parse_html


def test_normalize_spaces():
    assert T.normalize_spaces("  a\n\t b\xa0c ") == "a b c"
    assert T.normalize_spaces("") == ""


def test_word_count_js_semantics():
    # JS "".split(/\s+/).length == 1; " a b" -> ["", "a", "b"] == 3
    assert T.word_count("") == 1
    assert T.word_count(" a b") == 3
    assert T.word_count("a b") == 2


def test_has_content_trailing_ws():
    assert T.has_content("x")
    assert not T.has_content("x ")
    assert not T.has_content("x\n")
    assert not T.has_content("")


def test_text_similarity():
    assert T.text_similarity("hello world", "hello world") == 1.0
    assert T.text_similarity("", "x") == 0.0
    assert 0.0 < T.text_similarity("hello world foo", "hello world bar") < 1.0


def test_unescape_entities():
    assert T.unescape_html_entities("a&amp;b&lt;c&gt;&quot;&apos;") == "a&b<c>\"'"
    assert T.unescape_html_entities("&#65;&#x42;") == "AB"
    # invalid numeric refs -> U+FFFD
    assert T.unescape_html_entities("&#0;") == "�"
    assert T.unescape_html_entities("&#x110000;") == "�"
    assert T.unescape_html_entities("&#xD800;") == "�"
    assert T.unescape_html_entities(None) is None


def test_comma_split_count():
    assert T.comma_split_count("a,b,c") == 3
    assert T.comma_split_count("a，b") == 2  # fullwidth comma
    assert T.comma_split_count("nocommas") == 1


def test_canonical_text_merges_adjacent_runs():
    doc = parse_html("<body><p>foo<span>mid</span>bar</p></body>")
    p = doc.get_elements_by_tag_name("p")[0]
    # remove the span: "foo" and "bar" become adjacent siblings
    p.element_children()[0].remove()
    assert T.canonical_text(p) == "foobar"


def test_canonical_text_blocks_join_with_space():
    doc = parse_html("<body><div><p>one</p>\n<p>two</p></div></body>")
    assert T.canonical_text(doc.body) == "one two"

"""URL utilities — test vectors from the reference's scalar test suite
(test/DocumentUrlTests.cs:8-102, test/DataUrlTests.cs:6-31)."""

import pytest

from readability_spark.core.urls import DataUrl, DocumentUrl

ROOT_CASES = [
    ("foo/bar/baz.html", "http://fakehost/foo/bar/baz.html"),
    ("./foo/bar/baz.html", "http://fakehost/foo/bar/baz.html"),
    ("/foo/bar/baz.html", "http://fakehost/foo/bar/baz.html"),
    ("baz.html#foo", "http://fakehost/baz.html#foo"),
    ("/foo/bar/baz.html#foo", "http://fakehost/foo/bar/baz.html#foo"),
    ("http://test/foo/bar/baz.html", "http://test/foo/bar/baz.html"),
    ("https://test/foo/bar/baz.html", "https://test/foo/bar/baz.html"),
    ("foo/bar/baz.png", "http://fakehost/foo/bar/baz.png"),
    ("./foo/bar/baz.png", "http://fakehost/foo/bar/baz.png"),
    ("/foo/bar/baz.png", "http://fakehost/foo/bar/baz.png"),
    ("http://test/foo/bar/baz.png", "http://test/foo/bar/baz.png"),
    ("https://test/foo/bar/baz.png", "https://test/foo/bar/baz.png"),
]

NESTED_CASES = [
    ("foo/bar/baz.html", "http://fakehost/test/base/foo/bar/baz.html"),
    ("./foo/bar/baz.html", "http://fakehost/test/base/foo/bar/baz.html"),
    ("/foo/bar/baz.html", "http://fakehost/foo/bar/baz.html"),
    ("baz.html#foo", "http://fakehost/test/base/baz.html#foo"),
    ("/foo/bar/baz.html#foo", "http://fakehost/foo/bar/baz.html#foo"),
    ("http://test/foo/bar/baz.html", "http://test/foo/bar/baz.html"),
    ("https://test/foo/bar/baz.html", "https://test/foo/bar/baz.html"),
    ("foo/bar/baz.png", "http://fakehost/test/base/foo/bar/baz.png"),
    ("./foo/bar/baz.png", "http://fakehost/test/base/foo/bar/baz.png"),
    ("/foo/bar/baz.png", "http://fakehost/foo/bar/baz.png"),
    ("http://test/foo/bar/baz.png", "http://test/foo/bar/baz.png"),
    ("https://test/foo/bar/baz.png", "https://test/foo/bar/baz.png"),
]


@pytest.mark.parametrize("rel,expected", ROOT_CASES)
def test_resolve_against_root(rel, expected):
    assert DocumentUrl("http://fakehost/").to_absolute(rel) == expected


@pytest.mark.parametrize("rel,expected", NESTED_CASES)
def test_resolve_against_nested(rel, expected):
    assert DocumentUrl("http://fakehost/test/base/page.html").to_absolute(rel) == expected


def test_hash_only_kept_without_base():
    assert DocumentUrl("http://fakehost/p.html").to_absolute("#foo") == "#foo"


def test_hash_resolved_with_base_element():
    du = DocumentUrl("http://fakehost/p.html", base_href="http://other/dir/")
    assert du.to_absolute("#foo") == "http://other/dir/#foo"
    assert du.to_absolute("x.html") == "http://other/dir/x.html"


VALID_DATA_URLS = [
    ("data:,A%20brief%20note", "", ""),
    ("data:text/plain;charset=iso-8859-7,%be%fg%be", "text/plain", ""),
    (
        "data:application/vnd-xxx-query,select_vcount,fcol_from_fieldtable/local",
        "application/vnd-xxx-query",
        "",
    ),
    ("data:text/plain;base64,SGVsbG8sIFdvcmxkIQ==", "text/plain", "base64"),
    ("data:text/html,%3Ch1%3EHello%2C%20World%21%3C%2Fh1%3E", "text/html", ""),
    ("data:text/html,%3Cscript%3Ealert%28%27hi%27%29%3B%3C%2Fscript%3E", "text/html", ""),
    (
        "data:image/gif;base64,R0lGODdhMAAwAPAAAAAAAP///ywAAAAAMAAwAAAC8IyPqcvt3wCcDkiLc7C0qwyGHhSWpjQu5yqmCYsapyuvUUlvONmOZtfzgFzByTB10QgxOR0TqBQejhRNzOfkVJ+5YiUqrXF5Y5lKh/DeuNcP5yLWGsEbtLiOSpa/TPg7JpJHxyendzWTBfX0cxOnKPjgBzi4diinWGdkF8kjdfnycQZXZeYGejmJlZeGl9i2icVqaNVailT6F5iJ90m6mvuTS4OK05M0vDk0Q4XUtwvKOzrcd3iq9uisF81M1OIcR7lEewwcLp7tuNNkM3uNna3F2JQFo97Vriy/Xl4/f1cf5VWzXyym7PHhhx4dbgYKAAA7",
        "image/gif",
        "base64",
    ),
]


@pytest.mark.parametrize("url,mime,encoding", VALID_DATA_URLS)
def test_data_url_valid(url, mime, encoding):
    parsed = DataUrl.try_parse(url)
    assert parsed is not None
    assert parsed.mime_type == mime
    assert parsed.encoding == encoding


@pytest.mark.parametrize("url", ["data:none", "http://www.example.com/"])
def test_data_url_invalid(url):
    assert DataUrl.try_parse(url) is None

"""HTML table inventory operator (operators/tables.py): verdict-chain
branches against the reference MarkDataTables rules
(core/readability.py:1142, reference Readability.cs MarkDataTables),
plus the Spark mapInPandas round trip and per-doc failure isolation."""

import pytest

from readability_spark.dom.parser import parse_html
from readability_spark.operators.tables import _table_verdict, _tables_one


def _verdict(html):
    doc = parse_html(f"<html><body>{html}</body></html>")
    return _table_verdict(doc.get_elements_by_tag_name("table")[0])


def _is_data(html):
    return _verdict(html)[6]


ROWS3X4 = "<tr><td>a</td><td>b</td><td>c</td><td>d</td></tr>" * 3


def test_presentation_role_wins_over_everything():
    assert not _is_data(
        f'<table role="presentation"><caption>T</caption>{ROWS3X4}</table>'
    )


def test_datatable_zero_attr():
    assert not _is_data(f'<table datatable="0"><caption>T</caption>{ROWS3X4}</table>')


def test_summary_attr_marks_data():
    assert _is_data('<table summary="s"><tr><td>x</td></tr></table>')


def test_caption_with_children_marks_data():
    assert _is_data("<table><caption>T</caption><tr><td>x</td></tr></table>")


def test_empty_caption_does_not_mark():
    # caption must have childNodes (reference: caption.FirstChild != null)
    assert not _is_data("<table><caption></caption><tr><td>x</td></tr></table>")


@pytest.mark.parametrize("tag", ["thead", "tfoot", "colgroup"])
def test_descendant_structure_tags_mark_data(tag):
    assert _is_data(f"<table><{tag}></{tag}><tr><td>x</td><td>y</td></tr></table>")


def test_th_marks_data():
    r, c, cap, hdr, pres, nested, isd, chars = _verdict(
        "<table><tr><th>h</th><th>h</th></tr><tr><td>x</td><td>y</td></tr></table>"
    )
    assert isd and hdr and not cap
    # td-only column count: the th row contributes a row but no columns
    assert (r, c) == (2, 2)
    assert chars == 2


def test_nested_table_is_layout():
    assert not _is_data(
        "<table><tr><td><table><tr><td>i</td><td>j</td></tr>"
        f"<tr><td>k</td><td>l</td></tr></table></td><td>y</td></tr>{ROWS3X4}</table>"
    )


def test_single_column_is_layout():
    assert not _is_data("<table>" + "<tr><td>x</td></tr>" * 12 + "</table>")


def test_ten_rows_marks_data():
    assert _is_data("<table>" + "<tr><td>x</td><td>y</td></tr>" * 10 + "</table>")


def test_five_columns_marks_data():
    assert _is_data(
        "<table><tr>" + "<td>x</td>" * 5 + "</tr><tr>" + "<td>y</td>" * 5 + "</tr></table>"
    )


def test_area_rule_boundary():
    # 3x4 = 12 > 10 → data; 3x3 = 9 ≤ 10 → layout; 4x3 = 12 → data
    assert _is_data(f"<table>{ROWS3X4}</table>")
    assert not _is_data("<table>" + "<tr><td>a</td><td>b</td><td>c</td></tr>" * 3 + "</table>")
    assert _is_data("<table>" + "<tr><td>a</td><td>b</td><td>c</td></tr>" * 4 + "</table>")


def test_cell_chars_counts_td_text():
    *_, chars = _verdict(
        "<table><tr><td>abc</td><td>de</td></tr><tr><td></td><td>f</td></tr></table>"
    )
    assert chars == 6


def test_tables_one_multiple_and_isolation():
    rows = _tables_one(
        "u",
        "<html><body><table><tr><td>x</td></tr></table>"
        f"<table>{ROWS3X4}</table></body></html>",
    )
    assert [r["table_idx"] for r in rows] == [0, 1]
    assert rows[0]["is_data_table"] is False and rows[1]["is_data_table"] is True
    assert _tables_one("u", None) == []


def test_table_stats_spark_round_trip(spark):
    from readability_spark.operators.tables import table_stats

    df = spark.createDataFrame(
        [
            ("a", f"<html><body><table><caption>T</caption>{ROWS3X4}</table></body></html>"),
            ("b", "<html><body>no tables here</body></html>"),
        ],
        "url string, html string",
    )
    got = {r.url: r for r in table_stats(df).collect()}
    assert set(got) == {"a"}
    assert got["a"].n_rows == 3 and got["a"].n_cols == 4
    assert got["a"].has_caption and got["a"].is_data_table
    assert got["a"].cell_chars == 12

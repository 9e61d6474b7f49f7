"""CDX(J) capture-index source: SURT canonicalization cases, round-trip
through the real line parser, malformed-line isolation, and the
zero-shuffle plan bound."""

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


SURT_CASES = [
    # (url, expected key): each exercises one rule
    ("https://www.Example.ORG:443/A/B?Q=1#f", "org,example)/a/b?q=1"),
    ("http://example.org:80/", "org,example)/"),
    ("http://sub.host8.example.org:8080/x", "org,example,host8,sub:8080)/x"),
    ("https://example.org", "org,example)/"),  # empty path -> /
    ("http://www.www.example.org/p", "org,example,www)/p"),  # only ONE www. drops
    ("https://h3.example.org/Dir1/Page3.HTML?Q=7", "org,example,h3)/dir1/page3.html?q=7"),
    ("http://example.org/p#only-frag", "org,example)/p"),
]


def test_surt_key_cases(spark):
    from readability_spark.sources.cdx import surt_key

    df = spark.createDataFrame([(u,) for u, _ in SURT_CASES], ["url"])
    got = [r["k"] for r in df.select(surt_key(F.col("url")).alias("k")).collect()]
    assert got == [want for _, want in SURT_CASES]


def test_cdx_round_trip_parses_own_lines(spark):
    from readability_spark.sources.cdx import parse_cdx_lines, synthesize_cdx_lines

    docs = spark.createDataFrame(
        [(i, f"text body {i}") for i in range(30)], ["doc_id", "text"]
    )
    out = parse_cdx_lines(synthesize_cdx_lines(docs)).collect()
    assert len(out) == 30
    by_id = {r["doc_id"]: r for r in out}
    assert all(r["surt_matches"] for r in out)
    assert by_id[0]["status"] == 404  # 0 % 17 == 0
    assert by_id[1]["status"] == 200
    assert by_id[0]["url"].startswith("https://www.h0.example.org:8080/Dir0/Page0")
    assert by_id[0]["surt"].startswith("org,example,h0:8080)/dir0/page0")
    assert "#" not in by_id[7]["surt"]  # fragment never reaches the key
    assert by_id[2]["offset"] == 2048 and by_id[2]["mime"] == "text/html"
    assert by_id[3]["capture_ts"].strftime("%Y%m%d%H%M%S") == "20240104030321"


def test_cdx_malformed_lines_isolate(spark):
    """A truncated or JSON-broken line yields null fields on that row only
    — the task (and the good rows) survive."""
    from readability_spark.sources.cdx import parse_cdx_lines

    lines = spark.createDataFrame(
        [
            (1, 'org,x)/ 20240101000000 {"url": "http://x.org/", "status": "200"}'),
            (2, "org,x)/ 20240101000000 {broken json"),
            (3, "no-timestamp-or-json"),
        ],
        ["id", "line"],
    )
    rows = {r["id"]: r for r in parse_cdx_lines(lines).collect()}
    assert rows[1]["url"] == "http://x.org/" and rows[1]["status"] == 200
    assert rows[1]["digest"] is None  # absent JSON field -> null, not error
    assert rows[2]["url"] is None and rows[2]["surt"] == "org,x)/"
    assert rows[3]["url"] is None and rows[3]["capture_ts"] is None


def test_cdx_parse_plan_zero_shuffle(spark):
    from readability_spark.sources.cdx import parse_cdx_lines, synthesize_cdx_lines

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(parse_cdx_lines(synthesize_cdx_lines(docs)))
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan  # pure JVM codegen, no UDF stage

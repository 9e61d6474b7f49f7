"""robots.txt parse + RFC 9309 precedence semantics."""

import pytest

from readability_spark.sources.robots import (
    parse_robots,
    robots_filter,
    synthesize_robots,
)

pytestmark = pytest.mark.spark

ROBOTS = """# example file
User-agent: trainingbot
Disallow: /blocked/
Allow: /blocked/ok/

User-agent: *
Disallow: /private/
Disallow:
Crawl-delay: 5
Allow: /private/pub   # trailing comment
"""


@pytest.fixture(scope="module")
def rules(spark):
    df = spark.createDataFrame([("h.com", ROBOTS), ("open.com", "# nothing here")],
                               "host string, robots_txt string")
    return parse_robots(df).cache()


def test_parse_groups_and_comments(rules):
    rows = [(r.agent, r.directive, r.prefix) for r in rules.collect()]
    assert ("trainingbot", "disallow", "/blocked/") in rows
    assert ("trainingbot", "allow", "/blocked/ok/") in rows
    assert ("*", "disallow", "/private/") in rows
    assert ("*", "disallow", "") in rows  # empty rule kept, matches nothing
    # trailing comment stripped from the Allow line
    assert ("*", "allow", "/private/pub") in rows
    # crawl-delay is not a rule; comment-only host yields no rules
    assert all(r.directive in ("allow", "disallow") for r in rules.collect())
    assert not [r for r in rules.collect() if r.host == "open.com"]


def _verdicts(spark, rules, urls, agent="trainingbot"):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {r.url: r for r in robots_filter(df, rules, agent=agent).collect()}


def test_own_group_preferred_and_longest_match(spark, rules):
    v = _verdicts(spark, rules, [
        "http://h.com/blocked/x",        # trainingbot Disallow
        "http://h.com/blocked/ok/x",     # longer Allow overrides
        "http://h.com/private/x",        # '*' group does NOT apply to trainingbot
        "http://h.com/elsewhere",        # no match -> allowed
    ])
    assert not v["http://h.com/blocked/x"].allowed
    assert v["http://h.com/blocked/x"].matched_prefix == "/blocked/"
    assert v["http://h.com/blocked/ok/x"].allowed
    assert v["http://h.com/blocked/ok/x"].matched_prefix == "/blocked/ok/"
    assert v["http://h.com/private/x"].allowed
    assert v["http://h.com/elsewhere"].allowed
    assert v["http://h.com/elsewhere"].matched_prefix is None


def test_star_group_for_unknown_agent(spark, rules):
    v = _verdicts(spark, rules, [
        "http://h.com/private/secret",
        "http://h.com/private/pub/x",
        "http://h.com/blocked/x",        # trainingbot group doesn't bind others
    ], agent="otherbot")
    assert not v["http://h.com/private/secret"].allowed
    assert v["http://h.com/private/pub/x"].allowed  # longer Allow wins
    assert v["http://h.com/blocked/x"].allowed


def test_no_robots_means_allowed(spark, rules):
    v = _verdicts(spark, rules, ["http://unknown-host.com/anything"])
    assert v["http://unknown-host.com/anything"].allowed


def test_allow_wins_length_tie(spark):
    df = spark.createDataFrame(
        [("t.com", "User-agent: *\nDisallow: /a/\nAllow: /a/")],
        "host string, robots_txt string",
    )
    rules = parse_robots(df)
    v = _verdicts_one(spark, rules, "http://t.com/a/x")
    assert v.allowed


def _verdicts_one(spark, rules, url):
    df = spark.createDataFrame([(url,)], "url string")
    return robots_filter(df, rules).collect()[0]


def test_synthesized_corpus_has_all_branches(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    robots = synthesize_robots(docs)
    rules = parse_robots(robots)
    agents = {r.agent for r in rules.select("agent").distinct().collect()}
    assert agents == {"trainingbot", "*"}
    # the empty 'Disallow:' line survives parsing but never matches
    assert rules.filter("prefix = ''").count() > 0

"""Candidate-path regression corpus over the reference's 10 SamplePages
(reference test/SampleTests.cs:287-455 asserts elected-candidate paths on
these pages; its expectations encode the C# token-density finder, so these
goldens pin the JS-semantics election this engine implements instead —
VERDICT r1 item 2). Any change to scoring, DOM parsing, or path formatting
that moves an election on a big messy real page fails here."""

import json
import os

import pytest

SAMPLE_DIR = "/root/reference/test/SamplePages"
GOLDENS = os.path.join(os.path.dirname(__file__), "goldens_samplepages.json")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLE_DIR), reason="reference SamplePages not available"
)


def _load():
    with open(GOLDENS) as f:
        return json.load(f)


@pytest.mark.parametrize("page", sorted(_load().keys()))
def test_sample_page_election(page):
    from readability_spark.core.candidates import top_candidates
    from readability_spark.core.readability import extract_article

    golden = _load()[page]
    raw = open(os.path.join(SAMPLE_DIR, page), "rb").read()

    ranked = top_candidates(raw, k=3)
    assert ranked, f"no candidates elected for {page}"
    assert ranked[0][0] == golden["top_path"]
    assert ranked[0][1] == pytest.approx(golden["top_score"], abs=0.01)

    art = extract_article(raw, url=f"https://example.com/{page}")
    assert art.get("err") is None
    assert art["title"] == golden["title"]
    assert art["length"] == golden["length"]


def test_candidate_probe_cli(tmp_path):
    """ArtScr-style CLI probe exit codes (reference ArtScr/Program.cs)."""
    from readability_spark.core.candidates import main

    page = os.path.join(SAMPLE_DIR, "lobsters.html")
    assert main([page]) == 0
    assert main([]) == 1
    assert main([str(tmp_path / "missing.html")]) == 2

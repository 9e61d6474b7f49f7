#!/usr/bin/env python
"""Fixture grinder: run the pure-Python extractor over the golden corpus and
report per-case text-identity status. Dev tool feeding the pytest pass-list."""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from readability_spark.core.readability import extract_article
from readability_spark.core.text import canonical_text, normalize_spaces
from readability_spark.sources import fixtures


def _norm_meta(v):
    return normalize_spaces(v) if isinstance(v, str) else v


def check_metadata(case, art):
    """Field-by-field metadata parity as in test/SampleTests.cs:212-231
    (whitespace-normalized; dir skipped; published compared date-only)."""
    meta = case["metadata"]
    diffs = []
    pairs = [
        ("title", art["title"]),
        ("byline", art["byline"]),
        ("excerpt", art["excerpt"]),
        ("siteName", art["siteName"]),
    ]
    if meta.get("lang") is not None:
        pairs.append(("lang", art["lang"]))
    for key, got in pairs:
        exp = meta.get(key)
        if _norm_meta(exp) != _norm_meta(got):
            diffs.append(f"{key}: exp={exp!r} got={got!r}")
    exp_pub = meta.get("publishedTime")
    got_pub = art["publishedTime"]
    if (exp_pub or None) != (got_pub or None):
        e = (exp_pub or "")[:10]
        g = (got_pub or "")[:10]
        if e != g:
            diffs.append(f"publishedTime: exp={exp_pub!r} got={got_pub!r}")
    return diffs


def run_case(name: str, verbose: bool = False):
    case = fixtures.load_case(name)
    exp = fixtures.expected_text(case)
    try:
        art = extract_article(case["source"], url=case["url"])
    except Exception:
        return ("ERROR", traceback.format_exc(limit=6), exp, None)
    if art is None:
        got = None
    else:
        got = canonical_text(art["_articleContent"])
    if exp is None:
        return ("NOEXP", None, exp, got)
    if got != exp:
        return ("FAIL", None, exp, got)
    mdiffs = check_metadata(case, art)
    if mdiffs:
        return ("META", "; ".join(mdiffs), exp, got)
    return ("PASS", None, exp, got)


def main():
    names = sys.argv[1:] or fixtures.fixture_names()
    results = {}
    for name in names:
        status, err, exp, got = run_case(name)
        results[name] = (status, err, exp, got)
        mark = {"PASS": ".", "FAIL": "F", "ERROR": "E", "NOEXP": "?", "META": "M"}[status]
        print(f"{mark} {name}")
        if status in ("ERROR", "META") and len(names) <= 8:
            print(" ", err)
        if status == "FAIL" and len(names) <= 5:
            # show first divergence
            e, g = exp or "", got or ""
            i = next((k for k in range(min(len(e), len(g))) if e[k] != g[k]), min(len(e), len(g)))
            print(f"  diverge at {i}/{len(e)} vs {len(g)}")
            print(f"  exp[{i-60 if i>60 else 0}:{i+160}]: {e[max(0,i-60):i+160]!r}")
            print(f"  got[{i-60 if i>60 else 0}:{i+160}]: {g[max(0,i-60):i+160]!r}")
    counts = {}
    for status, *_ in results.values():
        counts[status] = counts.get(status, 0) + 1
    total = len(results)
    print(f"\n{counts} / {total}  pass-rate={counts.get('PASS',0)/max(total,1):.1%}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

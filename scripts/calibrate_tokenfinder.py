#!/usr/bin/env python
"""Run the token-density finder against the reference's own elected-path
expectations (test/SampleTests.cs:287-455) and report the pass rate."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def load_expectations():
    src = open(f"{REF}/test/SampleTests.cs", encoding="utf-8-sig").read()
    out = []
    # test-pages block (TryFindArticle_TestPage_CorrectPath)
    block = src.split("TryFindArticle_TestPage_CorrectPath")[0]
    tail = block[block.index("[DataRow(\"001\""):]
    for m in re.finditer(r'\[DataRow\("([^"]+)", "([^"]*)"\)\]', tail):
        out.append(("test-pages", m.group(1), m.group(2)))
    sample = src.split("TryFindArticle_TestPage_CorrectPath")[1]
    for m in re.finditer(r'\[DataRow\("([^"]+)", "([^"]*)"\)\]', sample):
        out.append(("SamplePages", m.group(1), m.group(2)))
    return out


def main():
    from readability_spark.core.tokenfinder import find_article_path

    only = sys.argv[1] if len(sys.argv) > 1 else None
    passed = failed = errored = 0
    fails = []
    for kind, name, expected in load_expectations():
        if only and only not in name:
            continue
        if kind == "test-pages":
            path = f"{REF}/test/test-pages/{name}/source.html"
        else:
            path = f"{REF}/test/SamplePages/{name}"
        raw = open(path, "rb").read()
        expected = expected.strip()
        try:
            actual = find_article_path(raw) or ""
        except Exception as exc:
            errored += 1
            fails.append((name, expected, f"ERROR {exc!r}"))
            continue
        if actual == expected:
            passed += 1
        else:
            failed += 1
            fails.append((name, expected, actual))
    for name, exp, act in fails:
        print(f"FAIL {name}\n  want {exp!r}\n  got  {act!r}")
    total = passed + failed + errored
    print(f"\n{passed}/{total} pass ({failed} wrong, {errored} error)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Generate docs/OPERATORS.md — the auditable index of every registry query:
which readability_spark modules implement it, whether it has a DuckDB
oracle, and whether bench.py times it. Regenerate after registry changes:

    python scripts/gen_operator_index.py
"""

from __future__ import annotations

import inspect
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = """# Operator index (auto-generated — scripts/gen_operator_index.py)

One row per `queries()` entry in `__spark_entry__.py`. *Oracle* = exact
DuckDB SQL mirror compared by the driver and by
`tests/test_oracle_parity.py` / `scripts/verify_queries.py` (row count,
column set, order-insensitive value hash). *Bench* = timed by `bench.py`
at sf0.1 (walls in `BENCH/TRIALS.json`). The first line of each query's
docstring describes what it computes; scale analyses live in
`docs/SCALE.md` and `BENCH/CARDINALITY.md`.

Shared-worker note: `operators/workergc.py` raises the Python GC
thresholds process-wide in reused PySpark workers (gen0 700 → 200k) and
never restores them. Every allocation-heavy Arrow batch function that
shares those workers must therefore `gc.collect()` once per batch (the
extraction/codec operators do) — a new batch operator that skips the
per-batch collect runs under the delayed-collection regime and can hold
floating cyclic garbage for the worker's lifetime.
"""


def main() -> int:
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bench_src = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")).read()
    m = re.search(r"for name in \((.*?)\):\n        fn = qmap", bench_src, re.S)
    benched = set(re.findall(r'"([a-z0-9_]+)"', m.group(1))) | {"extract_articles"}

    lines = [HEADER]
    lines.append("| # | query | modules | oracle | bench | summary |")
    lines.append("|---|---|---|---|---|---|")
    for i, (name, fn) in enumerate(q.items(), 1):
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = ""
        mods = sorted(
            set(re.findall(r"from (readability_spark\.[a-z_.0-9]+) import", src))
        )
        mod_s = "<br>".join(m.replace("readability_spark.", "") for m in mods) or "—"
        doc = " ".join((inspect.getdoc(fn) or "").split())
        if not doc and src:
            # wrapper without a docstring: fall back to the docstring of the
            # operator it calls — prefer names appearing in the return line
            imported = []
            for mod_name, names in re.findall(
                r"from (readability_spark\.[a-z_.0-9]+) import \(?([^)\n]*(?:\n[^)]*)?)",
                src,
            ):
                for nm in re.findall(r"[a-z_0-9]+", names):
                    imported.append((mod_name, nm))
            ret = src[src.rfind("return") :]
            ranked = [t for t in imported if t[1] in ret] + imported
            import importlib

            for mod_name, nm in ranked:
                try:
                    obj = getattr(importlib.import_module(mod_name), nm, None)
                except ImportError:
                    continue
                d = inspect.getdoc(obj) if callable(obj) else None
                if d:
                    doc = " ".join(d.split())
                    break
        cut = doc.find(". ")
        doc = doc[: cut + 1] if 0 <= cut < 160 else doc[:160]
        doc = doc.replace("|", "\\|") or "—"
        oracle = "✓" if name in oracles else "rows-only"
        b = "✓" if name in benched else "—"
        lines.append(f"| {i} | `{name}` | {mod_s} | {oracle} | {b} | {doc} |")

    n_oracle = sum(1 for n in q if n in oracles)
    n_bench = sum(1 for n in q if n in benched)
    lines.append("")
    lines.append(
        f"**Totals: {len(q)} queries, {n_oracle} with exact oracles, "
        f"{n_bench} benched.**"
    )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "OPERATORS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(q)} queries, {n_oracle} oracles, {n_bench} benched")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""No-framework scaling ceiling: the identical extraction code under plain
pinned multiprocessing — no Spark, no JVM, no shuffle, no Arrow.

Whatever efficiency THIS measures from N to 4N cores is the hardware
ceiling (memory bandwidth + hypervisor frequency behavior) for the
extraction workload on this box; the Spark job cannot beat it, so
BENCH/BASELINE.md reports the job's efficiency both absolutely and as a
fraction of this ceiling. Re-run it whenever the per-doc cost changes —
faster per-doc code is more bandwidth-bound, which LOWERS the ceiling.

Usage: python scripts/ceiling_probe.py [real|synthetic] [n_small] [factor]
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = sys.argv[1] if len(sys.argv) > 1 else "real"
N_SMALL = int(sys.argv[2]) if len(sys.argv) > 2 else 4
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 4
TRIALS = int(os.environ.get("SPARK_GRAFT_SCALE_TRIALS", "3"))
MAX_PAGE_BYTES = 400_000


def build_pages() -> list:
    if CORPUS == "real":
        from readability_spark.sources import fixtures

        rows = [
            (r["url"], r["html"])
            for r in fixtures.input_rows(replicas=40)
            if len(r["html"]) <= MAX_PAGE_BYTES
        ]
        return rows
    import duckdb

    con = duckdb.connect()
    return con.execute("""
SELECT 'http://synth.fakehost/doc/' || doc_id || '?r=' || r AS url,
  '<!DOCTYPE html><html lang="' || lang || '"><head><title>Synthetic Web Archive Document '
  || doc_id || ' | fakehost</title></head><body>'
  || '<div id="header" class="header menu"><a href="/home">home</a></div>'
  || '<div id="doc" class="doc"><h1>Synthetic Web Archive Document ' || doc_id || ' | fakehost</h1>'
  || repeat('<p>' || text || '</p>', 12)
  || '</div><div class="footer"><a href="/terms">terms</a></div></body></html>'
FROM read_parquet('/root/testdata/sf0.1/documents.parquet'), generate_series(1, 20) AS t(r)
""").fetchall()


def _work(chunk) -> int:
    from readability_spark.operators.extract import _extract_one

    n_ok = 0
    for url, html in chunk:
        r = _extract_one(url, html, {}, False)
        n_ok += bool(r["ok"])
    return n_ok


def run(pages: list, ncores: int) -> float:
    os.sched_setaffinity(0, set(range(ncores)))
    chunks = [pages[i::ncores * 4] for i in range(ncores * 4)]
    best = None
    for _ in range(TRIALS):
        with mp.get_context("spawn").Pool(ncores) as pool:
            pool.map(_work, chunks[:1])  # warm imports
            t0 = time.time()
            pool.map(_work, chunks)
            wall = time.time() - t0
        best = wall if best is None or wall < best else best
    os.sched_setaffinity(0, set(range(os.cpu_count())))
    return best


def main() -> int:
    pages = build_pages()
    n = len(pages)
    w_small = run(pages, N_SMALL)
    w_big = run(pages, N_SMALL * FACTOR)
    thr_small, thr_big = n / w_small, n / w_big
    eff = (thr_big / thr_small) / FACTOR
    print(json.dumps({
        "metric": "no-framework extraction scaling ceiling (pinned multiprocessing)",
        "corpus": CORPUS,
        "n_docs": n,
        "n_small": N_SMALL,
        "n_big": N_SMALL * FACTOR,
        "docs_per_sec_small": round(thr_small, 2),
        "docs_per_sec_big": round(thr_big, 2),
        "ceiling_efficiency": round(eff, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

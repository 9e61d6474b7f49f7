"""Build BENCH/DRIVER_COVERAGE.json from the committed CORRECTNESS_r*.json
round artifacts.

The round driver's oracle pass records rows for only a bounded prefix of the
``queries()`` registry (23/32/50/50 entries in r1-r4), so which queries get
a driver-verified row is decided entirely by dict order. Rounds 2-4 rotated
that order by hand (a docstring note); VERDICT r4 item 1 asks for the
rotation to be *mechanical*: a committed coverage map, regenerated from the
driver's own artifacts, that the registry sorts itself by when called.

Run after each round lands its CORRECTNESS file:

    python scripts/build_coverage.py

Output schema (BENCH/DRIVER_COVERAGE.json):
    last_driver_round: {query_name: highest round with a RECORDED driver row}
    rounds: {query_name: [every round with a recorded row]}
    source_files: the artifacts scanned
Queries absent from the map have never had a driver row and sort first.
A recorded row counts toward coverage whether green or red — the driver
looked at it (as it happens, all 155 rows recorded r1-r4 are green).
"""

from __future__ import annotations

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "BENCH", "DRIVER_COVERAGE.json")


def main() -> None:
    rounds: dict[str, list[int]] = {}
    sources = []
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            data = json.load(fh)
        sources.append(os.path.basename(path))
        for name, row in data.items():
            # A row counts as coverage whether green or red — the driver
            # looked at it.  (All 155 recorded rows r1-r4 are green.)
            if isinstance(row, dict):
                rounds.setdefault(name, []).append(rnd)
    out = {
        "last_driver_round": {k: max(v) for k, v in sorted(rounds.items())},
        "rounds": {k: sorted(v) for k, v in sorted(rounds.items())},
        "source_files": sources,
    }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {OUT}: {len(rounds)} queries with driver rows")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Seed bench_floor.json: each query's EARLIEST committed sf0.1 record.

Walks every committed revision of bench_full.json (oldest first), keeping
the first sf0.1 timing seen per query, then backfills from BENCH_r*.json
driver artifacts for queries that predate bench_full.json. The floor is
the slow-creep reference the bench watchdog compares against (VERDICT r9
item 2: vs_committed only sees one round of drift, so a <1.5x/round creep
compounds invisibly — the floor makes the cumulative ratio visible).

Run once to (re)seed; thereafter bench.py APPENDS new queries at their
first recorded value and never rewrites existing floors, so the file
stays "earliest record" by construction.
"""

from __future__ import annotations

import json
import os
import subprocess

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    revs = subprocess.run(
        ["git", "-C", HERE, "log", "--reverse", "--format=%H %ct", "--", "bench_full.json"],
        capture_output=True, text=True, check=True,
    ).stdout.split()
    shas = revs[0::2]
    floors: dict[str, dict] = {}
    n_used = 0
    for sha in shas:
        try:
            blob = subprocess.run(
                ["git", "-C", HERE, "show", f"{sha}:bench_full.json"],
                capture_output=True, text=True, check=True,
            ).stdout
            rec = json.loads(blob)
        except Exception:
            continue
        if rec.get("sf") != 0.1:  # r8's clobbered sf0.001 artifacts must not seed floors
            continue
        n_used += 1
        for name, sec in (rec.get("queries") or {}).items():
            if name not in floors and sec and sec > 0:
                floors[name] = {"sec": sec, "src": sha[:7]}
    # Backfill older BENCH_r*.json driver artifacts (pre-bench_full rounds)
    import glob
    import re

    for path in sorted(
        glob.glob(os.path.join(HERE, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"BENCH_r(\d+)", p).group(1)),
    ):
        try:
            rec = json.load(open(path))
        except (OSError, ValueError):
            continue
        if "parsed" in rec:
            rec = rec["parsed"] or {}
        if rec.get("sf") != 0.1:
            continue
        for name, sec in (rec.get("queries") or {}).items():
            if name not in floors and sec and sec > 0:
                floors[name] = {"sec": sec, "src": os.path.basename(path)}
    out = os.path.join(HERE, "bench_floor.json")
    with open(out, "w") as fh:
        json.dump(
            {"sf": 0.1, "note": "earliest committed sf0.1 record per query",
             "n_revisions_scanned": n_used, "floors": floors},
            fh, indent=1, sort_keys=True,
        )
    print(f"seeded {len(floors)} floors from {n_used} bench_full revisions -> {out}")


if __name__ == "__main__":
    main()

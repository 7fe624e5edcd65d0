"""Refresh BENCH/bands.json — the per-query best-known times bench.py
adjudicates against (see bench.py "self-adjudication").

Takes the element-wise MINIMUM of the existing bands, every recorded
round file (BENCH_r*.json) whose methodology includes the checksum
consume (r4+; earlier rounds timed pruned plans and are not
comparable), and optionally a fresh bench JSON passed as argv[1].
Run this deliberately after a plan change is adjudicated — never
automatically, or a lucky host window would ratchet the bands below
what the code can reproduce.

Usage: python tools/refresh_bands.py [fresh_bench.json]
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BANDS = os.path.join(REPO, "BENCH", "bands.json")


def _queries(d: dict) -> dict[str, float]:
    if "parsed" in d:  # driver-recorded round file wraps the payload
        d = d["parsed"]
    if "checksum" not in d.get("methodology", ""):
        return {}
    return {k: float(v) for k, v in d.get("queries", {}).items()}


def main() -> None:
    best: dict[str, float] = {}
    if os.path.exists(BANDS):
        best.update(json.load(open(BANDS)))
    sources = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    sources += sys.argv[1:]
    for p in sources:
        try:
            qs = _queries(json.load(open(p)))
        except (OSError, json.JSONDecodeError, ValueError):
            continue
        for k, v in qs.items():
            best[k] = round(min(best.get(k, v), v), 3)
    json.dump(best, open(BANDS, "w"), indent=1, sort_keys=True)
    print(f"wrote {BANDS}: {len(best)} queries")


if __name__ == "__main__":
    main()

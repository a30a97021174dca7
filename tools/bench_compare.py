"""Compare two bench result files query-by-query.

Accepts either this repo's BENCH_LOCAL.json (full payload from bench.py)
or a driver BENCH_r{N}.json artifact (whose "tail" holds the truncated
last 2000 chars of the stdout line — per-query timings are recovered
from it by regex, so round-over-round comparison works even when the
full JSON did not survive the driver's truncation).

Usage: python tools/bench_compare.py OLD NEW [--threshold 1.5]
Prints per-query ratios for the overlap, the overlap-sum ratio, and
flags queries slower than the threshold. Co-tenancy note: compare MINs
measured under similar load; a single inflated run is not a regression
(round 5's two "regressions" re-measured flat under low load).
"""

from __future__ import annotations

import json
import re
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    if "queries" in d and isinstance(d["queries"], dict):
        return {k: v for k, v in d["queries"].items() if v is not None}
    # driver artifact: recover per-query timings from the retained tail.
    # Rounds <= 5 ended the line with "name":[run,run,...] vectors (take
    # the min, bench's own statistic); round 6+ ends with "name":sec.
    text = d.get("tail", "") if isinstance(d, dict) else ""
    out: dict[str, float] = {}
    for k, runs in re.findall(r'"([a-z0-9_]+)":\[([0-9.,]+)\]', text):
        out[k] = min(float(x) for x in runs.split(","))
    skip = {"value", "sf"}
    for k, v in re.findall(r'"([a-z0-9_]+)":([0-9]+\.[0-9]+)[,}]', text):
        if k not in skip and k not in out:
            out[k] = float(v)
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1]) if "=" in a else thr
    if len(args) != 2:
        print(__doc__)
        return 2
    old, new = load(args[0]), load(args[1])
    common = sorted(set(old) & set(new))
    if not common:
        print("no overlapping queries")
        return 1
    so, sn = sum(old[k] for k in common), sum(new[k] for k in common)
    flagged = []
    for k in common:
        r = new[k] / old[k] if old[k] else float("inf")
        if r > thr:
            flagged.append((r, k))
    print(f"overlap: {len(common)} queries; "
          f"sum {so:.1f}s -> {sn:.1f}s (ratio {sn / so:.2f})")
    for r, k in sorted(flagged, reverse=True):
        print(f"  {r:5.2f}x  {k}: {old[k]:.2f}s -> {new[k]:.2f}s")
    if not flagged:
        print(f"no query above {thr}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())

